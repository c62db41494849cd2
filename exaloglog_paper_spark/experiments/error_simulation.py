"""Monte-Carlo estimation-error simulation as a Spark pipeline.

Two generations live here and in ``replay.py``:

- ``replay.simulate_errors_full`` (experiments/replay.py) is the
  REFERENCE-FIDELITY pipeline — full 961-rung ladder to 1e21, exact
  inserts to 1e6, ML + martingale columns, 10-column CSV parity. It is
  what regenerates ``artifacts/estimation-error-*.csv``.
- the functions below are the lighter general-purpose harness (arbitrary
  ladders, ML-only summaries) kept for quick statistical acceptance tests,
  plus the TOKEN-stream error simulation at reference fidelity.

The Spark-native equivalent of the reference's headline experiment
(``ExaLogLogEstimationErrorSimulation.java:84-233``): fan out seeded cycles
(there: ForkJoinPool + ThreadLocal; here: ``spark.range(cycles)`` +
``mapInPandas``), per cycle walk a geometric cardinality ladder recording
the ML estimate at each rung, then aggregate per-rung moments with plain
Spark SQL (bias = mean(err), rmse = sqrt(mean(err²)), both relative —
≙ TestUtils.calculateBias/calculateRmse) and compare with the theoretical
RSE ``C_ml[t][d]/√2^p``.

Rungs up to ``exact_limit`` are built by exact incremental inserts from a
per-cycle splitmix64 stream; larger rungs use transition replay
(sketchlib/simulate.generate_transitions ≙ TestUtils.java:134-153): one
sampled first-hit cardinality per (update value, register) reconstructs the
state at any rung with exact within-cycle continuity — the same technique
the reference uses to reach 1e21 without 1e21 inserts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sketchlib.bitops import splitmix64_stream
from ..sketchlib.constants import theoretical_rse_ml
from ..sketchlib.exaloglog import ExaLogLog
from ..sketchlib.simulate import generate_transitions, state_at_cardinality


def geometric_ladder(max_n: float, ratio: float = 1.6, min_n: int = 1) -> list[float]:
    """Geometric grid of target cardinalities (≙ TestUtils.java:54-77)."""
    rungs = [float(max_n)]
    while rungs[-1] / ratio >= min_n:
        rungs.append(rungs[-1] / ratio)
    out = sorted(set(round(r) if r < 1e15 else r for r in rungs))
    return [float(r) for r in out if r >= min_n]


def simulate_errors(
    spark: SparkSession,
    t: int = 2,
    d: int = 20,
    p: int = 8,
    num_cycles: int = 1000,
    ladder: list[float] | None = None,
    seed: int = 42,
    exact_limit: float = 100_000.0,
) -> DataFrame:
    """Returns (rung double, err double) — one row per cycle x rung."""
    if ladder is None:
        ladder = geometric_ladder(100_000)
    ladder = sorted(ladder)

    def run(iterator):
        for pdf in iterator:
            rows_rung, rows_err, rows_iters = [], [], []
            for cycle in pdf["id"].tolist():
                rng = np.random.default_rng((seed << 20) ^ cycle)
                # per-cycle hash seed must be decorrelated: consecutive-int
                # seeds would make cycles' hash sets near-identical shifted
                # copies of one stream (correlated errors across cycles)
                cycle_seed = int(
                    splitmix64_stream((seed << 32) | 0x5EED, 1, offset=cycle)[0]
                )
                sk = ExaLogLog.create(t, d, p)
                inserted = 0
                transitions = None
                for n in ladder:
                    st = {}
                    if n <= exact_limit and float(n).is_integer():
                        todo = int(n) - inserted
                        if todo > 0:
                            h = splitmix64_stream(cycle_seed, todo, offset=inserted)
                            sk.add_hashes(h)
                            inserted = int(n)
                        est = sk.estimate(stats=st)
                    else:
                        if transitions is None:
                            transitions = generate_transitions(t, d, p, rng)
                        est = state_at_cardinality(transitions, n, t, d, p).estimate(stats=st)
                    rows_rung.append(float(n))
                    rows_err.append(est / n - 1.0)
                    rows_iters.append(st.get("iterations", 0))
            yield pd.DataFrame(
                {"rung": rows_rung, "err": rows_err, "iters": rows_iters}
            )

    par = max(spark.sparkContext.defaultParallelism, 4)
    return spark.range(0, num_cycles, 1, par).mapInPandas(
        run, "rung double, err double, iters long"
    )


def _moment_summary(errors: DataFrame) -> DataFrame:
    """Shared per-rung moments + solver stats (reference CSV cols 8-10,
    ExaLogLogEstimationErrorSimulation.java:153-159,187-197) — ONE
    definition for both the sketch and the token error CSVs."""
    return (
        errors.groupBy("rung")
        .agg(
            F.count(F.lit(1)).alias("cycles"),
            F.avg("err").alias("bias"),
            F.sqrt(F.avg(F.col("err") * F.col("err"))).alias("rmse"),
            F.min("iters").alias("min_iterations"),
            F.avg("iters").alias("mean_iterations"),
            F.max("iters").alias("max_iterations"),
        )
        .orderBy("rung")
    )


def error_summary(errors: DataFrame, t: int, d: int, p: int) -> DataFrame:
    """Per-rung moments vs the published bound (plain Spark aggregates)."""
    rse = theoretical_rse_ml(t, d, p)
    return (
        _moment_summary(errors)
        .withColumn("rse_theory", F.lit(rse))
        .withColumn("rmse_over_rse", F.col("rmse") / F.lit(rse))
        .orderBy("rung")
    )


def write_reference_style_csv(summary_pdf: pd.DataFrame, path: str, t: int, d: int, p: int) -> None:
    """Semicolon-CSV with a key=value metadata header line — the reference's
    result-table contract (≙ ExaLogLogEstimationErrorSimulation.java:172-233)."""
    with open(path, "w") as f:
        f.write(
            f"sketch_name=ExaLogLog; t={t}; d={d}; p={p}; "
            f"theoretical_rse={theoretical_rse_ml(t, d, p)}\n"
        )
        cols = [
            "rung",
            "cycles",
            "bias",
            "rmse",
            "rse_theory",
            "rmse_over_rse",
            "min_iterations",
            "mean_iterations",
            "max_iterations",
        ]
        f.write(";".join(cols) + "\n")
        for _, r in summary_pdf.iterrows():
            f.write(";".join(repr(float(r[c])) for c in cols) + "\n")


# ---------------------------------------------------------------------------
# token-stream estimator error simulation
# (≙ TokenEstimationErrorSimulation.java:71-233; CSV format of
#  results/error/token-estimation-error-{v}.csv)
# ---------------------------------------------------------------------------


def reference_token_ladder(max_n: int = 100_000, rel: float = 0.05) -> list[float]:
    """≙ TestUtils.getDistinctCountValues(1, maxDistinctCount, 0.05) — the
    long-typed +5% descent used by TokenEstimationErrorSimulation.java:79
    (206 rungs for 1e5; verified value-for-value against the published
    token CSVs' first column)."""
    import math

    factor = 1.0 / (1.0 + rel)
    c = int(max_n)
    out = []
    while c >= 1:
        out.append(c)
        c = min(c - 1, int(math.ceil(c * factor)))
    out.reverse()
    return [float(x) for x in out]


def simulate_token_errors(
    spark: SparkSession,
    v: int = 26,
    num_cycles: int = 1000,
    ladder: list[float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """(rung, err, iters) rows for the sketch-free token-stream estimator:
    per cycle, a growing prefix of a splitmix64 hash stream is tokenized
    (computeToken) and estimated at each ladder rung — the same
    incremental-prefix structure as the reference's per-cycle token arrays.

    All rungs of a cycle are evaluated in ONE pass (row-for-row equal to
    calling estimate_distinct_from_tokens per prefix — pinned in tests):
    the prefix's distinct-token set is exactly the tokens whose FIRST
    occurrence lands in the prefix, so one np.unique(return_index) plus a
    per-rung cumulative nlz histogram reconstructs every (a, b) coefficient
    system, batch-solved with per-rung iteration counts. This is what lets
    the artifacts carry the reference's own 206-rung x 100k-cycle fidelity
    (~8 ms/cycle instead of ~0.6 s/cycle for per-prefix re-sorting)."""
    import math

    from ..sketchlib.bitops import ZERO, U64
    from ..sketchlib.exaloglog import compute_token
    from ..sketchlib.mlsolver import solve_ml_equation_batch
    from ..sketchlib.replay import _u64_to_f64

    if ladder is None:
        ladder = reference_token_ladder()
    rungs = np.asarray(sorted(int(n) for n in ladder), np.int64)
    max_n = int(rungs[-1])
    nr = len(rungs)
    max_nlz_m1 = 63 - v
    zvec = np.uint64(1 << max_nlz_m1) >> np.arange(64, dtype=np.uint64)
    rungs_f = rungs.astype(np.float64)

    def run(iterator):
        for pdf in iterator:
            rows_rung, rows_err, rows_iters = [], [], []
            for cycle in pdf["id"].tolist():
                cycle_seed = int(
                    splitmix64_stream((seed << 32) | 0x70CE, 1, offset=cycle)[0]
                )
                hashes = splitmix64_stream(cycle_seed, max_n)
                tokens = compute_token(hashes, v)
                utok, first_idx = np.unique(tokens, return_index=True)
                jj = np.minimum(utok & U64(63), U64(max_nlz_m1)).astype(np.int64)
                ev_bin = np.searchsorted(rungs, first_idx + 1, side="left")
                b = (
                    np.bincount(ev_bin * 64 + jj, minlength=nr * 64)
                    .reshape(nr, 64)
                    .cumsum(axis=0)
                )
                with np.errstate(over="ignore"):  # 0 ≡ 2^64 wraparound convention
                    a_int = ZERO - (
                        b.astype(np.uint64) * zvec[None, :]
                    ).sum(axis=1, dtype=np.uint64)
                a = _u64_to_f64(a_int) * math.ldexp(1.0, -max_nlz_m1)
                its = np.zeros(nr, np.int64)
                x = solve_ml_equation_batch(a, b, max_nlz_m1, iters_out=its)
                est = x * math.ldexp(1.0, v + 1)
                rows_rung.extend(rungs_f.tolist())
                rows_err.extend((est / rungs_f - 1.0).tolist())
                rows_iters.extend(its.tolist())
            yield pd.DataFrame(
                {"rung": rows_rung, "err": rows_err, "iters": rows_iters}
            )

    par = max(spark.sparkContext.defaultParallelism, 4)
    return spark.range(0, num_cycles, 1, par).mapInPandas(
        run, "rung double, err double, iters long"
    )


def token_error_summary(errors: DataFrame) -> DataFrame:
    """Per-rung moments + solver stats (reference token-CSV columns)."""
    return _moment_summary(errors)


def write_token_csv(summary_pdf: pd.DataFrame, path: str, v: int, num_cycles: int) -> None:
    """Reference token-error CSV shape: metadata line + semicolon columns
    (distinct count; relative bias; relative rmse; min/mean/max num
    iterations) — results/error/token-estimation-error-{v}.csv."""
    with open(path, "w") as f:
        f.write(f"token_parameter={v}; num_cycles={num_cycles}\n")
        f.write(
            "distinct count; relative bias; relative rmse; "
            "min num iterations; mean num iterations; max num iterations\n"
        )
        for _, r in summary_pdf.iterrows():
            f.write(
                f"{float(r['rung'])!r}; {float(r['bias'])!r}; {float(r['rmse'])!r}; "
                f"{int(r['min_iterations'])}; {float(r['mean_iterations'])!r}; "
                f"{int(r['max_iterations'])}\n"
            )
