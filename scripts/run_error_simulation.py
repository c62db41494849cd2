"""Produce the repo's estimation-error artifact (reference-style CSV):
bias/rmse vs theoretical RSE across a geometric cardinality ladder to 1e12.

Usage: python scripts/run_error_simulation.py [--cycles 2000] [--t 2 --d 20 --p 8]
Writes artifacts/estimation-error-t{t}-d{d}-p{p}.csv
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exaloglog_paper_spark.experiments.error_simulation import (  # noqa: E402
    error_summary,
    simulate_errors,
    write_reference_style_csv,
)
from exaloglog_paper_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=2000)
    ap.add_argument("--t", type=int, default=2)
    ap.add_argument("--d", type=int, default=20)
    ap.add_argument("--p", type=int, default=8)
    ap.add_argument("--max-n", type=float, default=1e12)
    ap.add_argument("--ratio", type=float, default=2.0)
    args = ap.parse_args()

    ladder = []
    n = 1.0
    while n <= args.max_n:
        ladder.append(float(round(n)) if n < 1e15 else n)
        n *= args.ratio
    spark = get_spark(app_name="error-sim")
    spark.sparkContext.setLogLevel("ERROR")
    errors = simulate_errors(
        spark, args.t, args.d, args.p,
        num_cycles=args.cycles, ladder=ladder, seed=42, exact_limit=100_000,
    )
    pdf = error_summary(errors, args.t, args.d, args.p).toPandas()
    os.makedirs("artifacts", exist_ok=True)
    out = f"artifacts/estimation-error-t{args.t:02d}-d{args.d:02d}-p{args.p:02d}.csv"
    write_reference_style_csv(pdf, out, args.t, args.d, args.p)
    print("wrote", out)
    print(pdf.to_string(index=False))
    spark.stop()


if __name__ == "__main__":
    main()
