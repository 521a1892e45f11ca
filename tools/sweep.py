#!/usr/bin/env python3
"""Two-SF scaling sweep: run graft.Bench at a base and a scaled SF dir,
join the per-query medians, and print a ratio table (worst first).

Usage: python3 tools/sweep.py [baseDir] [scaledDir] [runs] [factor]
Defaults: /root/testdata/sf0.1  /tmp/sf1  2  10

The scaled corpus is generated with `sbt "runMain graft.tools.ScaleUp
<base> <scaled> <factor>"` if the directory is missing. At 100x
(sf10) export SPARK_DRIVER_MEM=48g: the embedding-heavy queries
(semantic dedup's trained codebook in particular) exhaust the default
8g driver heap - the JVM dies on GCLocker starvation with exit 52
mid-suite, which sweep reports as -1.0 entries. Output doubles as
the PLANS.md evidence table — a query whose ratio exceeds the data ratio
is a superlinear suspect (unless its OUTPUT grows superlinearly; check
row counts before blaming the plan).
"""
import json, os, subprocess, sys

base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
scaled = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
runs = sys.argv[3] if len(sys.argv) > 3 else "2"
factor = sys.argv[4] if len(sys.argv) > 4 else "10"
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
artifact = os.path.join(repo, "bench.json")


def run(cmd, env=None):
    """check=True with diagnostics: captured output is PRINTED on failure
    (an OOM 45 minutes in must not reduce to 'exit status 1')."""
    p = subprocess.run(cmd, cwd=repo, env=env, capture_output=True, text=True)
    if p.returncode != 0:
        sys.stderr.write(p.stdout[-4000:] + "\n" + p.stderr[-4000:] + "\n")
        raise SystemExit(f"[sweep] FAILED: {' '.join(cmd)}")
    return p


if not os.path.isdir(scaled):
    print(f"[sweep] generating {factor}x corpus at {scaled}", flush=True)
    run(["sbt", "-batch", f"runMain graft.tools.ScaleUp {base} {scaled} {factor}"])


def bench(sf_dir):
    # remove the artifact first: Bench swallows its own write failure, and
    # a stale file would silently make every ratio 1.0x
    if os.path.exists(artifact):
        os.remove(artifact)
    # frame cache OFF by default: scaling sweeps measure true per-query
    # compute, and a cache hit would hide a regression in the cached
    # stage (export GRAFT_NO_FRAME_CACHE=0 to sweep the cached regime)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_BENCH_RUNS=runs,
               GRAFT_NO_FRAME_CACHE=os.environ.get("GRAFT_NO_FRAME_CACHE", "1"))
    print(f"[sweep] benching {sf_dir} (runs={runs})", flush=True)
    run(["sbt", "-batch", "runMain graft.Bench"], env=env)
    if not os.path.exists(artifact):
        raise SystemExit(f"[sweep] bench.json missing after {sf_dir} run "
                         "(Bench's file write failed — see its stderr)")
    with open(artifact) as f:
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
      f"= {s['value'] / b['value']:.2f}x wall-clock at {factor}x data "
      f"({len(rows)} queries)")
