#!/usr/bin/env python3
"""Empirical scale check: does each query's runtime survive a 10x data
scale-up?

Runs the selected queries through graft.Bench at sf0.01 and sf0.1 and
reports T(sf0.1)/T(sf0.01). On 10x data, a scan/agg/join-shaped plan
should land well under ~12x (linear plus fixed overheads amortizing);
a ratio far above that is the empirical smell of a quadratic pair
blow-up, a one-task window, or a driver-side loop — the things the
plan audit can miss when they hide behind data-dependent fan-out.

Usage: python3 tools/scalecheck.py [--top N | --longkey [N] | q1,q2,...]
  default: the top 15 entries by time from the newest BENCH_r*.json.
Sub-second sf0.01 entries are dominated by fixed overheads; their
ratios print for reference but are never flagged.

--longkey: the per-key DEPTH tier (r13 verdict). The 10x row sweep
grows key cardinality with row count, so per-key series stay shallow —
an operator quadratic in KEY DEPTH (the smoother-fold class) passes it
and dies on one years-deep sensor key. This tier drives
graft.LongKeyCheck: ONE key at depth N then 10N through every per-key
sequential/fold operator; a linear fold lands near ~10x, a per-key
quadratic near ~100x. Flags ratio > 30 when the small run is >= 0.5s.
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from idlebench import load_queries, newest_artifact  # noqa: E402


def bench(sf_dir, names):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(min(8, os.cpu_count() or 4)),
               SPARK_GRAFT_ONLY=",".join(names),
               SPARK_GRAFT_REPS="2",
               SPARK_GRAFT_JOBS="0")
    out = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                         cwd=REPO, env=env, capture_output=True, text=True)
    for line in out.stdout.splitlines():
        m = re.search(r'\{"metric".*\}', line)
        if m:
            try:
                obj = json.loads(m.group(0))
                if "queries" in obj:
                    return obj["queries"]
            except json.JSONDecodeError:
                pass
    print(out.stdout[-3000:])
    sys.exit(f"no bench JSON from {sf_dir}")


def longkey(n):
    env = dict(os.environ,
               SPARK_GRAFT_LONGKEY_N=str(n),
               SPARK_GRAFT_CPUS=str(min(8, os.cpu_count() or 4)))
    out = subprocess.run(["sbt", "-batch", "runMain graft.LongKeyCheck"],
                         cwd=REPO, env=env, capture_output=True, text=True)
    # multi-line JSON: from the first {"n" to the last }}
    obj = None
    s = out.stdout
    i0 = s.find('{"n"')
    i1 = s.rfind("}}")
    if i0 >= 0 and i1 > i0:
        try:
            obj = json.loads(s[i0:i1 + 2])
        except json.JSONDecodeError:
            pass
    if obj is None:
        print(s[-3000:])
        sys.exit("no longkey JSON from graft.LongKeyCheck")
    print(f"long-key depth tier: one key, {obj['n']} -> {10 * obj['n']} "
          "observations (10x depth)\n")
    print(f"{'operator':22s} {'small':>8s} {'big':>8s} {'ratio':>7s}")
    flagged = []
    for name, r in obj["ops"].items():
        a, b, ratio = r["small"], r["big"], r["ratio"]
        flag = ""
        if a >= 0.5 and ratio > 30:
            flag = "  QUADRATIC-IN-DEPTH?"
            flagged.append(name)
        note = " (fixed-overhead regime)" if a < 0.5 else ""
        print(f"{name:22s} {a:8.2f} {b:8.2f} {ratio:6.1f}x{flag}{note}")
    print()
    if flagged:
        print("FLAGGED superlinear in key depth: " + ", ".join(flagged))
        sys.exit(1)
    print("no per-key-depth superlinear operators at 10x depth")
    sys.exit(0)


def main():
    args = sys.argv[1:]
    top = 15
    names = None
    i = 0
    while i < len(args):
        if args[i] == "--top":
            top = int(args[i + 1]); i += 2
        elif args[i] == "--longkey":
            n = 20000
            if i + 1 < len(args) and args[i + 1].isdigit():
                n = int(args[i + 1])
            longkey(n)
        else:
            names = [n.strip() for n in args[i].split(",")]; i += 1
    if names is None:
        art = load_queries(newest_artifact())
        cand = {k: v for k, v in art.items() if not k.startswith("job_")}
        names = [k for k, _ in
                 sorted(cand.items(), key=lambda kv: -kv[1])[:top]]
    print(f"scale-checking {len(names)} queries: sf0.01 -> sf0.1 (10x)\n")
    small = bench("/root/testdata/sf0.01", names)
    big = bench("/root/testdata/sf0.1", names)
    print(f"{'query':34s} {'sf0.01':>8s} {'sf0.1':>8s} {'ratio':>7s}")
    flagged = []
    for n in names:
        a, b = small.get(n), big.get(n)
        if a is None or b is None:
            print(f"{n:34s} ERROR")
            continue
        ratio = b / a if a > 0 else float("inf")
        flag = ""
        if a >= 1.0 and ratio > 12:
            flag = "  SUPERLINEAR?"
            flagged.append(n)
        note = " (fixed-overhead regime)" if a < 1.0 else ""
        print(f"{n:34s} {a:8.2f} {b:8.2f} {ratio:6.1f}x{flag}{note}")
    print()
    if flagged:
        print("FLAGGED superlinear at 10x: " + ", ".join(flagged))
        sys.exit(1)
    print("no superlinear entries at 10x")


if __name__ == "__main__":
    main()
