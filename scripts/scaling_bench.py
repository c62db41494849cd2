"""Two-parallelism scaling benchmark (sandbox proxy for the north rule's
N -> 4N executor criterion): run the headline sketch-build at local[8] and
local[32] on identical input and report throughput + scaling efficiency.

Writes/updates BENCH/BASELINE.md. Each level runs in its own subprocess
(one JVM per master setting); reported value is the min of ``--reps`` runs
to damp sandbox noise from co-tenants.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = str({cpus})
from exaloglog_paper_spark.session import get_spark
from exaloglog_paper_spark.ops.agg import ExaLogLogSpec, token_array_values, with_estimate
from exaloglog_paper_spark.ops.source import scan_sketch_agg
spark = get_spark(app_name="scaling-{cpus}", shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
path = {path!r}
spec = ExaLogLogSpec(2, 20, 10)
# warm: page cache + python workers + codegen
scan_sketch_agg(spark, path, ExaLogLogSpec(2, 20, 6), token_array_values("tokens")).collect()
best = None
n_tokens = 0
for _ in range({reps}):
    t0 = time.monotonic()
    row = scan_sketch_agg(spark, path, spec, token_array_values("tokens")).collect()[0]
    dt = time.monotonic() - t0
    n_tokens = row.n_values
    best = dt if best is None else min(best, dt)
print("RESULT " + json.dumps({{"cpus": {cpus}, "seconds": best, "tokens": n_tokens}}))
spark.stop()
"""


def run_level(cpus: int, path: str, reps: int) -> dict:
    code = RUNNER.format(repo=REPO, cpus=cpus, path=path, reps=reps)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=900
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no result for cpus={cpus}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--levels", default="8,32")
    args = ap.parse_args()

    path = f"/tmp/exaloglog_bench/{args.sf}/tokens.parquet"
    if not os.path.exists(path + "/_SUCCESS"):
        # materialize via bench helper
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=f"/root/testdata/{args.sf}")
        subprocess.run(
            [sys.executable, "-c",
             f"import sys; sys.path.insert(0, {REPO!r}); "
             "import bench; from exaloglog_paper_spark.session import get_spark; "
             f"s = get_spark(); bench.materialize_token_table(s, {args.sf!r}); s.stop()"],
            env=env, check=True, timeout=900,
        )

    levels = [int(x) for x in args.levels.split(",")]
    results = [run_level(c, path, args.reps) for c in levels]
    lo, hi = results[0], results[-1]
    speedup = lo["seconds"] / hi["seconds"]
    ratio = hi["cpus"] / lo["cpus"]
    efficiency = speedup / ratio
    report = {
        "metric": "scaling_efficiency",
        "sf": args.sf,
        "tokens": hi["tokens"],
        "levels": [
            {
                "cpus": r["cpus"],
                "seconds": round(r["seconds"], 3),
                "tokens_per_sec": round(r["tokens"] / r["seconds"], 1),
            }
            for r in results
        ],
        "speedup": round(speedup, 3),
        "core_ratio": ratio,
        "efficiency": round(efficiency, 3),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(report))
    _update_bench_md(report)


def _update_bench_md(report: dict) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "SCALING.md")
    rows = "\n".join(
        f"| local[{r['cpus']}] | {r['seconds']} s | {r['tokens_per_sec']:,.0f} tokens/s |"
        for r in report["levels"]
    )
    content = f"""# BENCH baseline — scaling evidence ({report['timestamp']})

Headline job: global ExaLogLog(2,20,10) distinct-token sketch build over the
{report['sf']} synthetic token table ({report['tokens']:,} tokens; parquet scan ->
vectorized partial sketches -> tree merge -> ML estimate), identical input at
two parallelism levels (sandbox proxy for N -> 4N executors; min of repeated
runs to damp co-tenant noise).

| parallelism | wall time | throughput |
|---|---|---|
{rows}

- speedup {report['levels'][0]['cpus']} -> {report['levels'][-1]['cpus']} cores: **{report['speedup']}x**
  (core ratio {report['core_ratio']}x)
- **scaling efficiency: {report['efficiency']}** (north-rule target >= 0.8)

Reference single-thread baseline (BASELINE.md): 25.4 ns/element insert
(~39M elements/s, in-memory pre-hashed JMH loop, c5.metal). Our per-core
end-to-end rate includes parquet decode + Arrow transfer + hashing; the
distributed design trades per-core constant factors for horizontal scale
and merge exactness.
"""
    with open(md, "w") as f:
        f.write(content)


if __name__ == "__main__":
    main()
