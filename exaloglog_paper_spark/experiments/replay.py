"""Vectorized full-stream replay: reference-fidelity error simulation.

Reproduces the reference's headline experiment at its OWN fidelity
(``ExaLogLogEstimationErrorSimulation.java:75-233``): a +5% geometric
ladder from 1 to 1e21 (961 rungs, ``TestUtils.getDistinctCountValues``
semantics replicated bit-for-bit including the double-rounding of
``BigInt.ceil(asDouble·factor)``), exact inserts from a real hash stream up
to ``large_scale_simulation_mode_distinct_count_limit`` (1e6), sampled
first-hit transitions beyond (``TestUtils.generateTransitions`` with the
distinct-count offset), and BOTH estimators per rung: ML (with Newton
iteration stats) and the sequential martingale.

The reference replays each cycle element-by-element through
``sketch.add(hash, martingaleEstimator)``. That loop cannot be ported
per-element (Python), but it doesn't need to be: a register's state can
only change at the FIRST arrival of each (update value k, register idx)
pair — duplicates are provably no-ops (u only grows; history bits are set
at most once per value). So the whole sequential trajectory, including
every martingale decrement, is a function of the per-pair first-hit
cardinalities:

- exact phase: first-hit positions extracted from the real splitmix64
  stream with one vectorized reverse fancy-assignment (last write wins →
  first occurrence), giving TRUE small-n statistics — at n=1 the
  martingale error is exactly 0, as the reference's CSV row 1 shows;
- beyond the limit: per-pair geometric first hits offset by the limit
  (memorylessness makes this exactly the reference's model);
- per-register replay: one vectorized pass over the K events in count
  order (running max + history bitfield per the add semantics);
- martingale: each state change decrements the global change probability
  P by an EXACT uint64-scaled amount (the register's contribution delta,
  Algorithm 3 terms via lookup tables). P before event i is recovered as
  ``(A_final + Σ_{j≥i} dec_j) · 2^-64`` — an exact integer tail sum, so
  the replay avoids the catastrophic 1-minus-cumsum cancellation that a
  naive vectorization would hit at P ~ 1e-15, while matching the
  reference's sequential-subtraction semantics to within one ulp of P.

Statistical equivalence to the reference's per-element loop is pinned by
tests (byte-identical registers + matching martingale estimates vs the
sequential ``add_hashes_martingale`` on the same stream), and the output
CSVs carry the reference's exact 10-column header
(``ExaLogLogEstimationErrorSimulation.java:187-197``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sketchlib.bitops import splitmix64_stream
from ..sketchlib.constants import theoretical_rse_martingale, theoretical_rse_ml
from ..sketchlib.exaloglog import estimate_from_coefficients, hash_to_idx_k
from ..sketchlib.replay import (  # noqa: F401  (re-exported for harness users)
    _a_scaled,
    _event_luts,
    _u64_to_f64,
    martingale_curve,
    replay_first_hits,
)


def reference_ladder(max_n: float = 1e21, rel: float = 0.05) -> list[float]:
    """The reference's target-distinct-count grid, value-for-value
    (≙ TestUtils.getDistinctCountValues(double, double): BigInt descent
    ``c = min(c-1, ceil(double(c)·1/(1+rel)))`` — 961 rungs for (1e21,
    0.05), verified equal to the published CSVs' first column)."""
    factor = 1.0 / (1.0 + rel)
    c = math.ceil(max_n)
    out = []
    while c > 0:
        out.append(c)
        c = min(c - 1, math.ceil(float(c) * factor))
    out.reverse()
    return [float(x) for x in out]


def replay_cycle_batch(
    cycle_ids,
    t: int,
    d: int,
    p: int,
    rungs: np.ndarray,
    seed: int,
    exact_limit: int,
    luts=None,
    estimate_chunk: int = 4096,
):
    """Full simulation of a batch of cycles. Returns per-(cycle, rung)
    arrays: ``err_ml``, ``err_mart`` (relative errors; ML is +inf at
    saturation like the reference's Infinity rows) and ``iters`` (Newton
    iteration counts; 0 where the solver never ran)."""
    from ..sketchlib.mlsolver import solve_ml_equation_batch  # noqa: F401  (via estimate)

    if luts is None:
        luts = _event_luts(t, d, p)
    k_max, pw, om, factor = luts
    m = 1 << p
    C = len(cycle_ids)
    R = C * m
    K = k_max
    NR = len(rungs)
    rungs = np.asarray(rungs, np.float64)

    # ---- first-hit cardinalities: real stream below the limit, sampled
    # geometric (offset by the limit) beyond — ≙ the reference's exact
    # phase + generateTransitions(distinctCountOffset=limit)
    counts = np.empty((C, m, K), np.float64)
    pos_plus1 = np.arange(1, exact_limit + 1, dtype=np.float64)
    for ci, cyc in enumerate(cycle_ids):
        hseed = int(splitmix64_stream((seed << 32) | 0x5EED, 1, offset=int(cyc))[0])
        h = splitmix64_stream(hseed, exact_limit)
        idx, k = hash_to_idx_k(h, t, p)
        key = idx.astype(np.int64) * K + (k.astype(np.int64) - 1)
        first = np.zeros(m * K, np.float64)
        # reversed fancy assignment: last write wins -> first occurrence
        first[key[::-1]] = pos_plus1[::-1]
        rseed = int(splitmix64_stream((seed << 32) | 0xA11CE, 1, offset=int(cyc))[0])
        rng = np.random.default_rng(rseed)
        samp = exact_limit + np.floor(rng.exponential(size=(K, m)) * factor[1:, None]) + 1.0
        fm = first.reshape(m, K)
        counts[ci] = np.where(fm > 0, fm, samp.T)

    cs, u_traj, b_traj, dec, (drow, dcnt, dcell, dwgt) = replay_first_hits(
        counts.reshape(R, K), t, d, p, luts, collect_b_deltas=True
    )

    # ---- martingale: per-cycle global event order + exact P tail sums
    gorder = np.argsort(cs.reshape(C, m * K), axis=1, kind="stable")
    gcnt = np.take_along_axis(cs.reshape(C, m * K), gorder, axis=1)
    gdec = np.take_along_axis(dec.reshape(C, m * K), gorder, axis=1)
    u_fin = u_traj[:, -1].astype(np.int64)
    b_fin = b_traj[:, -1]
    a_fin = _a_scaled(u_fin, b_fin, pw, om, d)
    a_final_sum = a_fin.reshape(C, m).sum(axis=1, dtype=np.uint64)
    mart_cum = martingale_curve(gcnt, gdec, a_final_sum)
    err_mart = np.empty((C, NR), np.float64)
    for c in range(C):
        jj = np.searchsorted(gcnt[c], rungs, side="right") - 1
        est = np.where(jj >= 0, mart_cum[c, np.clip(jj, 0, None)], 0.0)
        err_mart[c] = est / rungs - 1.0

    # ---- ML coefficients at every rung from the SPARSE event deltas —
    # O(events) bookkeeping instead of materializing (R, NR) registers and
    # contribute-scanning m registers per (cycle, rung). Both inputs of
    # estimate_from_coefficients are recovered exactly (verified
    # cell-for-cell vs contribute_vec_batch, tests/test_error_simulation):
    #  * agg(c) telescopes off the SAME uint64 decrements the martingale
    #    uses: agg = a_final_sum + Σ dec over events with cnt > rung;
    #  * b-hist(c) = integer sum of deltas with cnt <= rung (cumsum of a
    #    (rung-bin, cell) bincount along the rung axis).
    with np.errstate(over="ignore"):  # deliberate mod-2^64 wraparound
        tail = np.zeros((C, m * K + 1), np.uint64)
        np.cumsum(gdec[:, ::-1], axis=1, out=tail[:, 1:])
        agg = np.empty((C, NR), np.uint64)
        for c in range(C):
            # tail of decs over events with cnt > rung: tail[E - j] where
            # j = #events with cnt <= rung
            j = np.searchsorted(gcnt[c], rungs, side="right")
            agg[c] = a_final_sum[c] + tail[c, ::-1][j]
    cyc = drow // m
    rbin = np.searchsorted(rungs, dcnt, side="left")  # == NR beyond last rung
    hist = np.bincount(
        (cyc * (NR + 1) + rbin) * 64 + dcell.astype(np.int64),
        weights=dwgt.astype(np.float64),
        minlength=C * (NR + 1) * 64,
    ).reshape(C, NR + 1, 64)
    bhist = np.cumsum(hist[:, :NR, :], axis=1).astype(np.int64).reshape(C * NR, 64)
    agg = agg.reshape(C * NR)

    est_ml = np.empty(C * NR, np.float64)
    iters = np.zeros(C * NR, np.int64)
    for lo in range(0, C * NR, estimate_chunk):
        hi = min(lo + estimate_chunk, C * NR)
        it = np.zeros(hi - lo, np.int64)
        est_ml[lo:hi] = estimate_from_coefficients(
            agg[lo:hi], bhist[lo:hi], t, d, p, iters_out=it
        )
        iters[lo:hi] = it
    err_ml = est_ml.reshape(C, NR) / rungs[None, :] - 1.0
    return err_ml, err_mart, iters.reshape(C, NR)


def simulate_errors_full(
    spark: SparkSession,
    t: int = 2,
    d: int = 20,
    p: int = 8,
    num_cycles: int = 1000,
    ladder: list[float] | None = None,
    seed: int = 42,
    exact_limit: int = 1_000_000,
    cycles_per_chunk: int = 16,
) -> DataFrame:
    """Distributed reference-fidelity simulation. Emits per-rung PARTIAL
    moment rows per task (961 rows per chunk, never the 1e8 per-(cycle,
    rung) stream — the map-side-combine shape), to be finished by
    :func:`full_error_summary`."""
    if ladder is None:
        ladder = reference_ladder()
    rungs = np.asarray(sorted(ladder), np.float64)
    nr = len(rungs)

    def run(iterator):
        luts = _event_luts(t, d, p)
        for pdf in iterator:
            ids = pdf["id"].tolist()
            agg = {
                "n": np.zeros(nr, np.int64),
                "s_ml": np.zeros(nr), "s2_ml": np.zeros(nr),
                "s_mart": np.zeros(nr), "s2_mart": np.zeros(nr),
                "min_it": np.full(nr, np.iinfo(np.int64).max),
                "s_it": np.zeros(nr, np.int64),
                "max_it": np.zeros(nr, np.int64),
            }
            for lo in range(0, len(ids), cycles_per_chunk):
                chunk = ids[lo : lo + cycles_per_chunk]
                err_ml, err_mart, iters = replay_cycle_batch(
                    chunk, t, d, p, rungs, seed, exact_limit, luts
                )
                agg["n"] += len(chunk)
                agg["s_ml"] += err_ml.sum(axis=0)
                agg["s2_ml"] += (err_ml * err_ml).sum(axis=0)
                agg["s_mart"] += err_mart.sum(axis=0)
                agg["s2_mart"] += (err_mart * err_mart).sum(axis=0)
                agg["min_it"] = np.minimum(agg["min_it"], iters.min(axis=0))
                agg["s_it"] += iters.sum(axis=0)
                agg["max_it"] = np.maximum(agg["max_it"], iters.max(axis=0))
            yield pd.DataFrame(
                {
                    "rung": rungs,
                    "cycles": agg["n"],
                    "s_ml": agg["s_ml"], "s2_ml": agg["s2_ml"],
                    "s_mart": agg["s_mart"], "s2_mart": agg["s2_mart"],
                    "min_it": agg["min_it"], "s_it": agg["s_it"],
                    "max_it": agg["max_it"],
                }
            )

    par = max(spark.sparkContext.defaultParallelism, 4)
    return spark.range(0, num_cycles, 1, par).mapInPandas(
        run,
        "rung double, cycles long, s_ml double, s2_ml double, "
        "s_mart double, s2_mart double, min_it long, s_it long, max_it long",
    )


def full_error_summary(partials: DataFrame, t: int, d: int, p: int) -> DataFrame:
    """Reduce partial moments to the reference's per-rung CSV columns."""
    rse_ml = theoretical_rse_ml(t, d, p)
    rse_mart = theoretical_rse_martingale(t, d, p)
    g = (
        partials.groupBy("rung")
        .agg(
            F.sum("cycles").alias("cycles"),
            F.sum("s_ml").alias("s_ml"), F.sum("s2_ml").alias("s2_ml"),
            F.sum("s_mart").alias("s_mart"), F.sum("s2_mart").alias("s2_mart"),
            F.min("min_it").alias("min_iterations"),
            F.sum("s_it").alias("s_it"),
            F.max("max_it").alias("max_iterations"),
        )
        .select(
            "rung", "cycles",
            (F.col("s_ml") / F.col("cycles")).alias("bias_ml"),
            F.sqrt(F.col("s2_ml") / F.col("cycles")).alias("rmse_ml"),
            F.lit(rse_ml).alias("rse_ml"),
            (F.col("s_mart") / F.col("cycles")).alias("bias_martingale"),
            F.sqrt(F.col("s2_mart") / F.col("cycles")).alias("rmse_martingale"),
            F.lit(rse_mart).alias("rse_martingale"),
            "min_iterations",
            (F.col("s_it") / F.col("cycles")).alias("mean_iterations"),
            "max_iterations",
        )
        .orderBy("rung")
    )
    return g


def _jdouble(x: float) -> str:
    """Java-double-style rendering for the CSV (Infinity / NaN literals)."""
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    if math.isnan(x):
        return "NaN"
    return repr(float(x))


def write_full_csv(
    summary_pdf: pd.DataFrame,
    path: str,
    t: int,
    d: int,
    p: int,
    num_cycles: int,
    exact_limit: int = 1_000_000,
    sketch_name: str = "exaloglog",
) -> None:
    """The reference's exact 10-column semicolon CSV
    (≙ ExaLogLogEstimationErrorSimulation.java:172-233, incl. the metadata
    line and per-estimator bias/rmse/theoretical-RSE columns)."""
    with open(path, "w") as f:
        f.write(
            f"sketch_name={sketch_name}; t={t}; d={d}; p={p}; "
            f"num_cycles={num_cycles}; "
            f"large_scale_simulation_mode_distinct_count_limit={exact_limit}\n"
        )
        f.write(
            "distinct count; relative bias maximum likelihood; "
            "relative rmse maximum likelihood; "
            "theoretical relative standard error maximum likelihood; "
            "relative bias martingale; relative rmse martingale; "
            "theoretical relative standard error martingale; "
            "min num iterations; mean num iterations; max num iterations\n"
        )
        for _, r in summary_pdf.iterrows():
            f.write(
                "; ".join(
                    [
                        _jdouble(r["rung"]),
                        _jdouble(r["bias_ml"]),
                        _jdouble(r["rmse_ml"]),
                        _jdouble(r["rse_ml"]),
                        _jdouble(r["bias_martingale"]),
                        _jdouble(r["rmse_martingale"]),
                        _jdouble(r["rse_martingale"]),
                        str(int(r["min_iterations"])),
                        _jdouble(r["mean_iterations"]),
                        str(int(r["max_iterations"])),
                    ]
                )
                + "\n"
            )
