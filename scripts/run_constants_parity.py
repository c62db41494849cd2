"""Full-table parity sweep: every cell of the reference's four published
constants tables (results/constants/*.txt — the machine-generated tables
the repo replaces with mpmath closed forms, sketchlib/constants.py) vs
this repo's functions, to 1e-11 relative.

The tables are triangular (row t has entries d = 0..58-t; register bits
bounded). 4 x 1,770 = 7,080 cells; the compressed-MVP table costs ~3 min
(entropy/Fisher quadrature per cell), the other three ~5 s total.
Verified in full on 2026-08-18: 7,080/7,080 OK. Run:

    python scripts/run_constants_parity.py [--skip-compressed]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exaloglog_paper_spark.sketchlib import constants as C

REF_DIR = "/root/reference/results/constants"

TABLES = [
    ("ml_bias_correction_constants", C.ml_bias_correction, False),
    ("ml_theoretical_relative_standard_error_constants", C.ml_rse_constant, False),
    (
        "martingale_theoretical_relative_standard_error_constants",
        C.martingale_rse_constant,
        False,
    ),
    ("ml_compressed_mvp_constants", C.ml_compressed_mvp, True),
]


def load(name: str) -> list[list[float]]:
    txt = open(f"{REF_DIR}/{name}.txt").read()
    return [
        [float(x) for x in r.split(",")]
        for r in re.findall(r"\{([\d\.,\sEe+-]+)\}", txt)
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-compressed", action="store_true")
    ap.add_argument("--rtol", type=float, default=1e-11)
    args = ap.parse_args()

    total_bad = 0
    for name, fn, slow in TABLES:
        if slow and args.skip_compressed:
            print(f"{name}: SKIPPED (--skip-compressed)")
            continue
        rows = load(name)
        t0 = time.perf_counter()
        bad = n = 0
        for t in range(len(rows)):
            for d in range(len(rows[t])):
                n += 1
                v = fn(t, d)
                if abs(v / rows[t][d] - 1) > args.rtol:
                    bad += 1
                    if bad <= 3:
                        print(f"  MISMATCH {name} t={t} d={d}: {v} != {rows[t][d]}")
        status = "OK" if not bad else f"{bad} BAD"
        print(f"{name}: {n} cells {status} ({time.perf_counter() - t0:.1f} s)")
        total_bad += bad
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
