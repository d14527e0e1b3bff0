#!/usr/bin/env python3
"""Resolve a BENCH artifact's suspect_vs_prev entries to idle truth.

The r14 verdict's prescription #5: `needs_idle_recheck:true` used to ask
a human; this tool IS the recheck. It re-runs exactly the artifact's
`suspect_vs_prev` entries (plus anything in `contended`) once the box is
idle, MIN-MERGES the idle times into the artifact file in place (every
`"name":value` occurrence, so both the full-precision and compact lines
update), records the driver-vs-idle pair in a `RECHECK_<artifact>` sidecar
for audit, and rewrites `suspect_vs_prev` to only the entries still >1.5x
their idle truth (there should be none — an entry that stays inflated on
an idle box is a real regression, not contention).

Usage: python3 tools/idlerecheck.py [artifact.json] [--sf DIR] [--dry]
  artifact defaults to the newest BENCH_r*.json in the repo root.
Exit 0 when no suspects remain; exit 1 if any entry is still >1.5x idle.
"""
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RATIO = 1.5


def newest_artifact():
    arts = glob.glob(os.path.join(REPO, "BENCH_r*.json"))
    if not arts:
        sys.exit("no BENCH_r*.json artifact in repo root")
    def rnum(p):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1
    return max(arts, key=rnum)


def collect(raw):
    """Union of suspect_vs_prev + contended names and the queries map,
    scanned over every JSON object embedded in the file (driver wrapper,
    full line, compact line)."""
    names, queries = set(), {}

    def consider(obj):
        if not isinstance(obj, dict):
            return
        for key in ("suspect_vs_prev", "contended"):
            v = obj.get(key)
            if isinstance(v, list):
                names.update(x for x in v if isinstance(x, str))
        q = obj.get("queries")
        if isinstance(q, dict):
            for k, v in q.items():
                if isinstance(v, (int, float)):
                    queries[k] = min(queries.get(k, float("inf")), v)
        for v in obj.values():
            if isinstance(v, dict):
                consider(v)
            elif isinstance(v, str):
                scan(v)

    def scan(text):
        for m in re.finditer(r'\{"metric".*?\}(?=\n|$)', text):
            try:
                consider(json.loads(m.group(0)))
            except json.JSONDecodeError:
                pass

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
    return names, queries


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def wait_idle(threshold, timeout_s=600):
    t0 = time.time()
    while loadavg() > threshold:
        if time.time() - t0 > timeout_s:
            print(f"WARNING: load still {loadavg():.1f} after {timeout_s}s"
                  " — measuring anyway (numbers remain suspect)")
            return False
        print(f"waiting for idle: load {loadavg():.1f} > {threshold:.1f}")
        time.sleep(15)
    return True


def main():
    args = sys.argv[1:]
    sf_dir, artifact, dry = "/root/testdata/sf0.1", None, False
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--dry":
            dry = True; i += 1
        else:
            artifact = args[i]; i += 1
    artifact = artifact or newest_artifact()
    raw = open(artifact).read()
    names, queries = collect(raw)
    names = {n for n in names if n in queries}
    if not names:
        print(f"{artifact}: no suspect_vs_prev/contended entries — "
              "nothing to recheck")
        return 0
    ordered = sorted(names, key=lambda n: -queries[n])
    print(f"artifact: {artifact}")
    print(f"rechecking {len(ordered)} suspects at {sf_dir}: "
          f"{', '.join(ordered)}\n")
    cpus = os.cpu_count() or 4
    wait_idle(cpus / 4.0)
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(min(8, cpus)),
               SPARK_GRAFT_ONLY=",".join(ordered),
               SPARK_GRAFT_REPS="3",
               SPARK_GRAFT_JOBS="0" if not any(
                   n.startswith("job_") for n in ordered) else "1")
    out = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                         cwd=REPO, env=env, capture_output=True, text=True)
    idle = {}
    for line in out.stdout.splitlines():
        m = re.search(r'\{"metric".*\}', line)
        if m:
            try:
                obj = json.loads(m.group(0))
                if isinstance(obj.get("queries"), dict):
                    for k, v in obj["queries"].items():
                        if isinstance(v, (int, float)):
                            idle[k] = min(idle.get(k, float("inf")), v)
            except json.JSONDecodeError:
                pass
    missing = [n for n in ordered if n not in idle]
    if missing:
        print(out.stdout[-3000:])
        sys.exit(f"idle bench produced no time for: {', '.join(missing)}")
    # prior truth = min over the PREVIOUS round's driver artifact and the
    # newest committed idle bench (the same two sources Bench.scala
    # min-merges) — an entry whose idle-remeasured time is STILL >1.5x
    # this prior is a real regression, not contention, and must stay
    # flagged rather than be laundered by the merge
    prior = {}
    cur = os.path.basename(artifact)
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")) + \
            glob.glob(os.path.join(REPO, "BENCH_idle_r*.json")):
        if os.path.basename(p) == cur:
            continue
        _, q = collect(open(p).read())
        for k, v in q.items():
            prior[k] = min(prior.get(k, float("inf")), v)
    still = []
    pairs = {}
    new_raw = raw
    for n in ordered:
        drv, idl = queries[n], idle[n]
        best = min(drv, idl)
        pairs[n] = {"driver": drv, "idle": idl}
        p = prior.get(n)
        flag = ""
        if p and p > 0.05 and best > 1.0 and best / p > RATIO:
            still.append(n)
            flag = f"  STILL {best / p:.2f}x prior {p:.3f}s — real regression"
        elif drv > best:
            flag = "  (driver was contention-inflated; idle merged)"
        print(f"  {n}: driver {drv:.3f}s  idle {idl:.3f}s  -> {best:.3f}s"
              f"{flag}")
        # replace every "name":<number> occurrence with the merged min
        new_raw = re.sub(
            r'("%s":)([0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)' % re.escape(n),
            lambda m: m.group(1) + f"{best:.6f}", new_raw)
    # resolved entries leave suspect_vs_prev; anything unresolvable stays
    def prune(m):
        try:
            lst = json.loads(m.group(2))
        except json.JSONDecodeError:
            return m.group(0)
        kept = [x for x in lst if x in still]
        return m.group(1) + json.dumps(kept)
    new_raw = re.sub(r'("suspect_vs_prev":)(\[[^\]]*\])', prune, new_raw)
    new_raw = re.sub(r'("needs_idle_recheck":)(true|false)',
                     lambda m: m.group(1) + ("true" if still else "false"),
                     new_raw)
    side = os.path.join(os.path.dirname(artifact),
                        "RECHECK_" + os.path.basename(artifact))
    if dry:
        print("\n--dry: not writing files")
    else:
        with open(side, "w") as f:
            json.dump({"sf": sf_dir, "ratio_flag": RATIO, "pairs": pairs},
                      f, indent=1, sort_keys=True)
        with open(artifact, "w") as f:
            f.write(new_raw)
        print(f"\nmerged idle truths into {artifact}; audit pairs in {side}")
    return 1 if still else 0


if __name__ == "__main__":
    sys.exit(main())
