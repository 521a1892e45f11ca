#!/usr/bin/env python3
"""Two-SF scaling sweep: run graft.Bench at a base and a scaled SF dir,
join the per-query medians, and print a ratio table (worst first).

Usage: python3 tools/sweep.py [baseDir] [scaledDir] [runs]
Defaults: /root/testdata/sf0.1  /tmp/sf1  2

The scaled corpus is generated with `sbt "runMain graft.tools.ScaleUp
<base> <scaled> 10"` if the directory is missing. Output doubles as the
PLANS.md evidence table — a query whose ratio exceeds the data ratio is
a superlinear suspect (unless its OUTPUT grows superlinearly; check
row counts before blaming the plan).
"""
import json, os, subprocess, sys

base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
scaled = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
runs = sys.argv[3] if len(sys.argv) > 3 else "2"
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if not os.path.isdir(scaled):
    print(f"[sweep] generating scaled corpus at {scaled}", flush=True)
    subprocess.run(["sbt", "-batch", f"runMain graft.tools.ScaleUp {base} {scaled} 10"],
                   cwd=repo, check=True, capture_output=True)

def bench(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_BENCH_RUNS=runs)
    print(f"[sweep] benching {sf_dir} (runs={runs})", flush=True)
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                   cwd=repo, env=env, check=True, capture_output=True)
    with open(os.path.join(repo, "bench.json")) as f:
        return json.load(f)

b, s = bench(base), bench(scaled)
rows = []
for q, tb in b["queries"].items():
    ts = s["queries"].get(q)
    if ts is None or tb <= 0 or ts <= 0:
        rows.append((float("inf"), q, tb, ts))
    else:
        rows.append((ts / tb, q, tb, ts))
rows.sort(reverse=True)
print(f"\n{'query':34} {'base_s':>8} {'scaled_s':>9} {'ratio':>7}")
for r, q, tb, ts in rows:
    print(f"{q:34} {tb:8.2f} {ts if ts else -1:9.2f} {r:7.1f}x")
print(f"\ntotal: {b['value']:.1f}s -> {s['value']:.1f}s "
      f"= {s['value'] / b['value']:.2f}x wall-clock at 10x data "
      f"({len(rows)} queries)")
