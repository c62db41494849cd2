"""Per-config parity report: this repo's estimation-error artifacts vs the
reference's published CSVs (results/error/exaloglog-estimation-error-*.csv).

For every (t, d, p) config present in both places, verifies the ladder
matches rung-for-rung and reports the median ML / martingale rmse ratio
plus the worst per-rung |deviation| (rungs with distinct count >= 100 —
below that, rmse is dominated by the deterministic near-exact regime and
ratios are 0/0-ish). Independent Monte-Carlo streams agree statistically,
not textually: at matched 100k cycles the medians land within ~0.1% and
per-rung deviations within ~1-2% (two independent 100k-cycle estimates of
the same rmse differ by ~sqrt(2/cycles) ~ 0.45% one sigma).

Writes artifacts/PARITY.md and prints the table.
"""

from __future__ import annotations

import glob
import os

import numpy as np

REF_DIR = "/root/reference/results/error"


def _load(path):
    with open(path) as f:
        meta = f.readline()
        hdr = f.readline().strip().split("; ")
        rows = [ln.strip().split("; ") for ln in f if ln.strip()]
    cols = {h: i for i, h in enumerate(hdr)}

    def col(name):
        i = cols[name]
        return np.array(
            [
                float(r[i])
                if r[i] not in ("Infinity", "-Infinity", "NaN")
                else np.nan
                for r in rows
            ]
        )

    return (
        col("distinct count"),
        col("relative rmse maximum likelihood"),
        col("relative rmse martingale"),
        meta,
    )


def main() -> None:
    lines = [
        "# Estimation-error artifact parity vs published reference CSVs",
        "",
        "| config | cycles (repo / ref 100k) | median rmse ratio ML |"
        " median rmse ratio martingale | worst per-rung dev (ML) |",
        "|---|---|---|---|---|",
    ]
    print(f"{'config':14s} {'cycles':>7s} {'medML':>7s} {'medMart':>8s} {'worstML':>8s}")
    for mine in sorted(glob.glob("artifacts/estimation-error-*.csv")):
        base = os.path.basename(mine).replace(
            "estimation-error", "exaloglog-estimation-error"
        )
        ref = os.path.join(REF_DIR, base)
        if not os.path.exists(ref):
            continue
        dc, ml, mart, meta = _load(mine)
        rdc, rml, rmart, _ = _load(ref)
        assert np.allclose(dc, rdc), f"ladder mismatch: {base}"
        cyc = meta.split("num_cycles=")[1].split(";")[0]
        sel = (dc >= 100) & np.isfinite(ml) & np.isfinite(rml) & (rml > 0)
        ratml = ml[sel] / rml[sel]
        selm = (dc >= 100) & np.isfinite(mart) & np.isfinite(rmart) & (rmart > 0)
        ratmart = mart[selm] / rmart[selm]
        worst = float(np.max(np.abs(ratml - 1)))
        name = base.replace("exaloglog-estimation-error-", "").replace(".csv", "")
        print(
            f"{name:14s} {cyc:>7s} {np.median(ratml):7.4f} "
            f"{np.median(ratmart):8.4f} {worst:7.1%}"
        )
        lines.append(
            f"| {name} | {cyc} | {np.median(ratml):.4f} "
            f"| {np.median(ratmart):.4f} | {worst:.1%} |"
        )
    lines += [
        "",
        "Regenerate any config with "
        "`python scripts/run_error_simulation.py --configs 't,d,p' "
        "--cycles 100000`; refresh this file with "
        "`python scripts/artifact_parity_report.py`.",
        "",
    ]
    with open("artifacts/PARITY.md", "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
