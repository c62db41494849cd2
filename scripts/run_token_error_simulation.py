"""Produce token-estimation-error artifacts (reference CSV shape):
bias/rmse + Newton-iteration stats of the sketch-free token-stream
estimator per v, across a geometric cardinality ladder to 1e5.

Usage: python scripts/run_token_error_simulation.py [--cycles 1000] [--v 26]
Writes artifacts/token-estimation-error-v{v}.csv
(≙ TokenEstimationErrorSimulation.java + results/error/token-estimation-error-{v}.csv)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exaloglog_paper_spark.experiments.error_simulation import (  # noqa: E402
    simulate_token_errors,
    token_error_summary,
    write_token_csv,
)
from exaloglog_paper_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=1000)
    ap.add_argument("--v", type=int, default=26)
    args = ap.parse_args()

    spark = get_spark(app_name="token-error-sim")
    spark.sparkContext.setLogLevel("ERROR")
    errors = simulate_token_errors(spark, v=args.v, num_cycles=args.cycles)
    pdf = token_error_summary(errors).toPandas()
    os.makedirs("artifacts", exist_ok=True)
    out = f"artifacts/token-estimation-error-v{args.v:02d}.csv"
    write_token_csv(pdf, out, args.v, args.cycles)
    print("wrote", out)
    print(pdf.to_string(index=False))
    spark.stop()


if __name__ == "__main__":
    main()
