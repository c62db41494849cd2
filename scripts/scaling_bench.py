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
from bench import calibrate_ns_per_element
from exaloglog_paper_spark.session import get_spark
from exaloglog_paper_spark.ops.agg import ExaLogLogSpec, token_array_values, with_estimate
from exaloglog_paper_spark.ops.source import scan_sketch_agg
from exaloglog_paper_spark.ops.profile import scan_profile
calib_before = calibrate_ns_per_element()
spark = get_spark(app_name="scaling-{cpus}", shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
path = {path!r}
job = {job!r}
if job == "build":
    spec = ExaLogLogSpec(2, 20, 10)
    # warm: page cache + python workers + codegen
    scan_sketch_agg(spark, path, ExaLogLogSpec(2, 20, 6), token_array_values("tokens")).collect()
    def run_once():
        row = scan_sketch_agg(spark, path, spec, token_array_values("tokens")).collect()[0]
        return row.n_values
else:  # profile: the one-pass ANALYZE over the pyarrow scan
    scan_profile(spark, path, mg_k=64)  # warm
    def run_once():
        profs = scan_profile(spark, path)
        return sum(p.n_tokens for p in profs.values())
times = []
n_tokens = 0
for _ in range({reps}):
    t0 = time.monotonic()
    n_tokens = run_once()
    dt = time.monotonic() - t0
    times.append(dt)
print("RESULT " + json.dumps({{"cpus": {cpus}, "seconds": min(times), "times": times, "tokens": n_tokens, "calib_ns": [calib_before, calibrate_ns_per_element()]}}))
spark.stop()
"""


def run_level(cpus: int, path: str, reps: int, job: str = "build") -> dict:
    code = RUNNER.format(repo=REPO, cpus=cpus, path=path, reps=reps, job=job)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
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
    ap.add_argument("--cooldown", type=int, default=0,
                    help="seconds to idle between levels — the sandbox "
                         "hypervisor throttles sustained multi-minute load, "
                         "so back-to-back levels bias against whichever runs "
                         "later (measured: identical 32-core reps degrade "
                         "41->78->101 s under sustained load)")
    ap.add_argument("--job", default="build", choices=["build", "profile"],
                    help="which job to scale: the headline sketch build "
                         "(default) or the one-pass ANALYZE profile "
                         "(scan_profile)")
    ap.add_argument("--no-interleave", action="store_true",
                    help="run each level's reps back-to-back (one subprocess "
                         "per level) instead of the default level-interleaved "
                         "rounds. Interleaving exposes every level to the "
                         "same co-tenant bursts so a burst during one level "
                         "cannot skew efficiency directionally; it costs one "
                         "JVM startup per (level x round).")
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
            env=env, check=True, timeout=3600,
        )

    levels = [int(x) for x in args.levels.split(",")]
    if args.no_interleave:
        results = []
        for i, c in enumerate(levels):
            if i and args.cooldown:
                time.sleep(args.cooldown)
            results.append(run_level(c, path, args.reps, args.job))
    else:
        # Level-interleaved rounds: (2, 8), (2, 8), ... — a co-tenant burst
        # lands on BOTH levels of a round instead of poisoning one level's
        # entire rep block, and per-level minima across rounds heal it.
        acc: dict[int, dict] = {}
        for rnd in range(args.reps):
            for i, c in enumerate(levels):
                if (rnd or i) and args.cooldown:
                    time.sleep(args.cooldown)
                r = run_level(c, path, 1, args.job)
                if c not in acc:
                    acc[c] = {"cpus": c, "times": [], "tokens": r["tokens"], "calib_ns": []}
                acc[c]["times"].extend(r["times"])
                acc[c]["calib_ns"].extend(r["calib_ns"])
        results = []
        for c in levels:
            a = acc[c]
            a["seconds"] = min(a["times"])
            results.append(a)
    pairs = []
    for lo, hi in zip(results, results[1:]):
        speedup = lo["seconds"] / hi["seconds"]
        ratio = hi["cpus"] / lo["cpus"]
        pairs.append(
            {
                "from_cpus": lo["cpus"],
                "to_cpus": hi["cpus"],
                "speedup": round(speedup, 3),
                "core_ratio": ratio,
                "efficiency": round(speedup / ratio, 3),
            }
        )
    report = {
        "metric": "scaling_efficiency",
        "job": args.job,
        "sf": args.sf,
        "tokens": results[-1]["tokens"],
        "levels": [
            {
                "cpus": r["cpus"],
                "seconds": round(r["seconds"], 3),
                "spread": [round(min(r["times"]), 3), round(max(r["times"]), 3)],
                "tokens_per_sec": round(r["tokens"] / r["seconds"], 1),
                "calibration_ns_per_element": r.get("calib_ns"),
            }
            for r in results
        ],
        "pairs": pairs,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(report))
    _update_bench_md(report)


def _update_bench_md(report: dict) -> None:
    """APPEND a run section to BENCH/SCALING.md (never overwrite: the file
    is a curated multi-experiment record — an earlier overwrite here once
    clobbered the 2->8 evidence; git restored it)."""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "SCALING.md")
    rows = "\n".join(
        f"| local[{r['cpus']}] | {r['seconds']} s | [{r['spread'][0]}, {r['spread'][1]}] s "
        f"| {r['tokens_per_sec']:,.0f} tokens/s | {r.get('calibration_ns_per_element')} |"
        for r in report["levels"]
    )
    pair_lines = "\n".join(
        f"- {pr['from_cpus']} -> {pr['to_cpus']} cores: speedup **{pr['speedup']}x** "
        f"(core ratio {pr['core_ratio']}x) -> **efficiency {pr['efficiency']}** "
        "(north-rule target >= 0.8)"
        for pr in report["pairs"]
    )
    section = f"""

## Run {report['timestamp']} — job={report.get('job', 'build')}, {report['sf']} ({report['tokens']:,} tokens), levels {[r['cpus'] for r in report['levels']]}

| parallelism | wall time (min of reps) | spread | throughput | calib ns/el [pre, post] |
|---|---|---|---|---|
{rows}

{pair_lines}
"""
    if not os.path.exists(md):
        section = "# BENCH baseline — scaling evidence\n" + section
    with open(md, "a") as f:
        f.write(section)


if __name__ == "__main__":
    main()
