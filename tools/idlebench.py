#!/usr/bin/env python3
"""Idle re-bench: reconcile a driver BENCH artifact against idle-box truth.

The driver benches under whatever load the round machine happens to carry,
and a uniformly-contended window can inflate entries 5-30x with no spread
for Bench's self-defense to read (r11 shipped four such phantoms). This
tool re-runs the slowest entries of an artifact once the box is actually
idle and prints artifact-vs-idle ratios, so builder and judge reconcile
numbers without a manual re-bench.

Usage: python3 tools/idlebench.py [artifact.json] [--top N] [--sf DIR]
  artifact defaults to the newest BENCH_r*.json in the repo root.
Exit 0 always (diagnostic tool); entries >1.5x their idle value are
flagged PHANTOM? in the table.
"""
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_artifact():
    arts = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not arts:
        sys.exit("no BENCH_r*.json artifact in repo root")
    return arts[-1]


def load_queries(path):
    """Accepts Bench stdout (one or two one-line JSON objects), a raw
    capture, or the driver's wrapper format ({"tail": "...",
    "parsed": {...}}); returns the richest `queries` map found."""
    best = {}

    def consider(obj):
        nonlocal best
        if isinstance(obj, dict):
            q = obj.get("queries")
            if isinstance(q, dict) and len(q) > len(best):
                best = q
            for v in obj.values():  # driver wrapper: nested objects
                if isinstance(v, dict):
                    consider(v)
                elif isinstance(v, str):
                    scan(v)

    def scan(text):
        for m in re.finditer(r'\{"metric".*?"queries".*?\}(?=\n|$)', text):
            try:
                consider(json.loads(m.group(0)))
            except json.JSONDecodeError:
                pass

    raw = open(path).read()
    try:
        consider(json.loads(raw))
    except json.JSONDecodeError:
        pass
    for line in raw.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                consider(json.loads(line))
            except json.JSONDecodeError:
                scan(line)
    scan(raw)
    if not best:
        sys.exit(f"no 'queries' map found in {path}")
    return best


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def wait_idle(threshold, timeout_s=600):
    t0 = time.time()
    while loadavg() > threshold:
        if time.time() - t0 > timeout_s:
            print(f"WARNING: load still {loadavg():.1f} after "
                  f"{timeout_s}s — benching anyway (numbers suspect)")
            return False
        print(f"waiting for idle: load {loadavg():.1f} > "
              f"{threshold:.1f} ...")
        time.sleep(15)
    return True


def main():
    args = sys.argv[1:]
    top = 20
    sf_dir = "/root/testdata/sf0.1"
    artifact = None
    i = 0
    while i < len(args):
        if args[i] == "--top":
            top = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            artifact = args[i]; i += 1
    artifact = artifact or newest_artifact()
    queries = load_queries(artifact)
    # jobs re-generate fixtures per rep — slow but honest; keep them out
    # of the quick idle pass (they were never the phantom class)
    cand = {k: v for k, v in queries.items() if not k.startswith("job_")}
    slowest = sorted(cand.items(), key=lambda kv: -kv[1])[:top]
    names = [k for k, _ in slowest]
    print(f"artifact: {artifact}")
    print(f"re-benching top {len(names)} entries at {sf_dir}\n")
    cpus = os.cpu_count() or 4
    wait_idle(cpus / 4.0)
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(min(8, cpus)),
               SPARK_GRAFT_ONLY=",".join(names),
               SPARK_GRAFT_REPS="3",
               SPARK_GRAFT_JOBS="0")
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=REPO, env=env, capture_output=True, text=True)
    idle = None
    for line in out.stdout.splitlines():
        m = re.search(r'\{"metric".*\}', line)
        if m:
            try:
                obj = json.loads(m.group(0))
                if "queries" in obj:
                    idle = obj["queries"]
                    break  # first (full-precision) line is enough
            except json.JSONDecodeError:
                pass
    if idle is None:
        print(out.stdout[-3000:])
        print(out.stderr[-2000:])
        sys.exit("bench run produced no parseable JSON line")
    print(f"{'query':34s} {'artifact':>9s} {'idle':>9s} {'ratio':>7s}")
    for name, art_t in slowest:
        it = idle.get(name)
        if it is None:
            print(f"{name:34s} {art_t:9.2f} {'ERROR':>9s}")
            continue
        ratio = art_t / it if it > 0 else float("inf")
        flag = "  PHANTOM?" if ratio > 1.5 and art_t - it > 0.3 else ""
        print(f"{name:34s} {art_t:9.2f} {it:9.2f} {ratio:6.1f}x{flag}")


if __name__ == "__main__":
    main()
