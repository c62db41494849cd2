"""Reproduce the reference's ENTIRE small-cardinality test-limit tables from
our exact enumeration (sketchlib/enumerate.py): for every (n, p) cell of
testDistinctCountEqual{One,Two,Three}MLEstimator
(AbstractSpecificExaLogLogTest.java:996-1023), apply the reference's
ceil_4dp(|value|*1.01) limit formula to our analytically exact bias/rmse
and compare with the published constant.

Writes artifacts/enumeration-limits.txt. Usage:
    python scripts/run_enumeration_parity.py
"""

from __future__ import annotations

import os
import sys
import time
from decimal import Decimal, ROUND_CEILING

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exaloglog_paper_spark.sketchlib.constants import theoretical_rse_ml  # noqa: E402
from exaloglog_paper_spark.sketchlib.enumerate import (  # noqa: E402
    enumerate_error_n1,
    enumerate_error_n2,
    enumerate_error_n3,
)

T, D = 2, 20

PUBLISHED = {
    1: (range(2, 19),
        [0.0623, 0.0466, 0.0338, 0.0242, 0.0172, 0.0122, 0.0087, 0.0062,
         0.0044, 0.0031, 0.0022, 0.0016, 0.0011, 8.0e-4, 6.0e-4, 4.0e-4, 3.0e-4],
        [0.1691, 0.1106, 0.0757, 0.0527, 0.037, 0.0261, 0.0185, 0.0131,
         0.0092, 0.0065, 0.0046, 0.0033, 0.0023, 0.0017, 0.0012, 9.0e-4, 6.0e-4]),
    2: (range(2, 11),
        [0.0614, 0.0463, 0.0337, 0.0242, 0.0172, 0.0122, 0.0087, 0.0062, 0.0044],
        [0.4974, 0.48, 0.4729, 0.4697, 0.4681, 0.4674, 0.467, 0.4668, 0.4667]),
    3: (range(2, 8),
        [0.0606, 0.046, 0.0336, 0.0241, 0.0172, 0.0122],
        [0.5681, 0.5515, 0.5448, 0.5417, 0.5402, 0.5395]),
}
FNS = {1: enumerate_error_n1, 2: enumerate_error_n2, 3: enumerate_error_n3}


def ceil4(x: float) -> float:
    return float(Decimal(abs(x) * 1.01).quantize(Decimal("0.0001"), rounding=ROUND_CEILING))


def main() -> None:
    os.makedirs("artifacts", exist_ok=True)
    out = "artifacts/enumeration-limits.txt"
    n_cells = n_match = 0
    with open(out, "w") as f:
        f.write(
            "# Exact small-cardinality enumeration vs the reference's published\n"
            "# test-limit tables (AbstractSpecificExaLogLogTest.java:996-1023),\n"
            f"# ExaLogLog(t={T}, d={D}); limit formula ceil_4dp(|value|*1.01).\n"
            "n; p; bias/RSE (exact); rmse/RSE (exact); "
            "bias limit (ours -> published); rmse limit (ours -> published); match\n"
        )
        for n, (ps, pub_bias, pub_rmse) in PUBLISHED.items():
            for p, pb, pr in zip(ps, pub_bias, pub_rmse):
                t0 = time.time()
                bias, rmse = FNS[n](T, D, p)
                rse = theoretical_rse_ml(T, D, p)
                rb, rr = abs(bias) / rse, rmse / rse
                ok = ceil4(rb) == pb and ceil4(rr) == pr
                n_cells += 1
                n_match += ok
                f.write(
                    f"{n}; {p}; {rb!r}; {rr!r}; "
                    f"{ceil4(rb)} -> {pb}; {ceil4(rr)} -> {pr}; "
                    f"{'EXACT' if ok else 'MISMATCH'}\n"
                )
                print(f"n={n} p={p}: {'EXACT' if ok else 'MISMATCH'} ({time.time()-t0:.1f}s)")
        f.write(f"# {n_match}/{n_cells} cells reproduce the published limits exactly\n")
    print(f"wrote {out}: {n_match}/{n_cells} exact")
    sys.exit(0 if n_match == n_cells else 1)


if __name__ == "__main__":
    main()
