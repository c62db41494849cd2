"""Produce the repo's estimation-error artifacts at the reference's OWN
fidelity: the +5% ladder from 1 to 1e21 (961 rungs), exact inserts to 1e6
(large-scale simulation mode beyond), and BOTH estimators' bias/rmse per
rung with the reference's 10-column CSV header
(≙ ExaLogLogEstimationErrorSimulation.java + results/error/*.csv).

Usage:
  python scripts/run_error_simulation.py --t 2 --d 20 --p 8 --cycles 100000
  python scripts/run_error_simulation.py --grid --cycles 10000 \
      --headline-cycles 100000     # all 16 published configs; the headline
                                   # (2,20,8) at full 100k-cycle fidelity

Writes artifacts/estimation-error-t{t}-d{d}-p{p}.csv. The metadata line
records the actual num_cycles, so coarser non-headline runs are
self-documenting.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exaloglog_paper_spark.experiments.replay import (  # noqa: E402
    full_error_summary,
    reference_ladder,
    simulate_errors_full,
    write_full_csv,
)
from exaloglog_paper_spark.session import get_spark  # noqa: E402

# the reference's published grid (results/error/ + java/build.gradle)
GRID = [
    (t, d, p)
    for (t, d) in [(1, 9), (2, 16), (2, 20), (2, 24)]
    for p in [4, 6, 8, 10]
]
HEADLINE = (2, 20, 8)


def run_config(spark, t, d, p, cycles, exact_limit, ladder, outdir="artifacts"):
    t0 = time.time()
    partials = simulate_errors_full(
        spark, t, d, p,
        num_cycles=cycles, ladder=ladder, seed=42, exact_limit=exact_limit,
    )
    pdf = full_error_summary(partials, t, d, p).toPandas()
    os.makedirs(outdir, exist_ok=True)
    out = f"{outdir}/estimation-error-t{t:02d}-d{d:02d}-p{p:02d}.csv"
    write_full_csv(pdf, out, t, d, p, num_cycles=cycles, exact_limit=exact_limit)
    print(
        f"wrote {out}: {len(pdf)} rungs, {cycles} cycles, "
        f"{time.time() - t0:.0f}s", flush=True,
    )
    return pdf


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=10_000)
    ap.add_argument("--headline-cycles", type=int, default=100_000)
    ap.add_argument("--t", type=int, default=2)
    ap.add_argument("--d", type=int, default=20)
    ap.add_argument("--p", type=int, default=8)
    ap.add_argument("--max-n", type=float, default=1e21)
    ap.add_argument("--exact-limit", type=int, default=1_000_000)
    ap.add_argument("--grid", action="store_true",
                    help="run all 16 published configs")
    ap.add_argument("--configs", type=str, default=None,
                    help="subset as 't,d,p;t,d,p;...' (overrides --grid list)")
    ap.add_argument("--skip-current", action="store_true",
                    help="skip configs whose artifact already records the "
                         "target num_cycles (resumable grid runs)")
    ap.add_argument("--outdir", type=str, default="artifacts",
                    help="artifact output directory")
    ap.add_argument("--jobs", type=int, default=1,
                    help="configs to run CONCURRENTLY through one "
                         "SparkSession (Spark schedules multiple jobs from "
                         "multiple driver threads; a config's driver-side "
                         "tail — summary toPandas + CSV write — overlaps "
                         "the next config's executor work instead of "
                         "leaving the box idle)")
    args = ap.parse_args()

    ladder = reference_ladder(args.max_n)
    spark = get_spark(
        app_name="error-sim",
        scheduler_mode="FAIR" if args.jobs > 1 else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.grid or args.configs:
        grid = GRID
        if args.configs:
            grid = [
                tuple(int(x) for x in c.split(","))
                for c in args.configs.split(";") if c.strip()
            ]
        # cheapest first (cost ~ 2^p), so a budget-truncated run still
        # lands the most configs
        todo = []
        for (t, d, p) in sorted(grid, key=lambda c: (c[2], c[0], c[1])):
            cycles = (
                args.headline_cycles if (t, d, p) == HEADLINE else args.cycles
            )
            if args.skip_current:
                out = f"{args.outdir}/estimation-error-t{t:02d}-d{d:02d}-p{p:02d}.csv"
                if os.path.exists(out):
                    with open(out) as f:
                        head = f.readline()
                    if f"num_cycles={cycles};" in head or f"num_cycles={cycles}\n" in head:
                        print(f"skip {out}: already at {cycles} cycles", flush=True)
                        continue
            todo.append((t, d, p, cycles))
        if args.jobs <= 1:
            for (t, d, p, cycles) in todo:
                run_config(spark, t, d, p, cycles, args.exact_limit, ladder,
                           outdir=args.outdir)
        else:
            from concurrent.futures import ThreadPoolExecutor

            def one(cfg):
                t, d, p, cycles = cfg
                # per-thread FAIR pool so concurrent configs share executor
                # slots instead of FIFO head-of-line blocking
                spark.sparkContext.setLocalProperty(
                    "spark.scheduler.pool", f"errsim-{t}-{d}-{p}"
                )
                return run_config(spark, t, d, p, cycles, args.exact_limit,
                                  ladder, outdir=args.outdir)

            with ThreadPoolExecutor(max_workers=args.jobs) as ex:
                list(ex.map(one, todo))
    else:
        pdf = run_config(
            spark, args.t, args.d, args.p, args.cycles, args.exact_limit,
            ladder, outdir=args.outdir,
        )
        print(pdf.head(20).to_string(index=False))
    spark.stop()


if __name__ == "__main__":
    main()
