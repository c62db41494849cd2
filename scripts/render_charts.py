"""Render the reference's evaluation charts (H9) from artifacts/*.csv as
dependency-free SVG. Usage: python scripts/render_charts.py [--out-dir artifacts]"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exaloglog_paper_spark.experiments.charts import (  # noqa: E402
    render_estimation_error_grid,
    render_token_error_grid,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap.add_argument("--artifact-dir", default=os.path.join(repo, "artifacts"))
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()
    out_dir = args.out_dir or args.artifact_dir
    print(
        render_estimation_error_grid(
            args.artifact_dir, os.path.join(out_dir, "estimation-error.svg")
        )
    )
    print(
        render_token_error_grid(
            args.artifact_dir, os.path.join(out_dir, "token-estimation-error.svg")
        )
    )


if __name__ == "__main__":
    main()
