"""Empirical MVP reproduces the paper's published values (BASELINE.md):
ELL(2,20,8) -> 3.691 @ 896 B; HLL(11) -> 6.459 @ 1536 B."""

import pytest

from exaloglog_paper_spark.experiments.mvp import empirical_mvp


def test_compressed_mvp_constants_pinned():
    from exaloglog_paper_spark.sketchlib.constants import ml_compressed_mvp

    # results/constants/ml_compressed_mvp_constants.txt rows t=2/d=20, t=0/d=0
    assert ml_compressed_mvp(2, 20) == pytest.approx(2.206010257671874, rel=1e-9)
    assert ml_compressed_mvp(0, 0) == pytest.approx(3.0436599734226086, rel=1e-9)


def test_compressed_state_economics():
    """Deflate-compressed state bits x variance stays within 1.5x the
    theoretical compressed MVP (≙ AbstractSpecificExaLogLogTest.java:247-293)."""
    import zlib

    import numpy as np

    from exaloglog_paper_spark.sketchlib.constants import ml_compressed_mvp
    from exaloglog_paper_spark.sketchlib.simulate import generate_exaloglog_poisson

    t, d, p = 2, 20, 8
    n = 1_000_000.0
    rng = np.random.default_rng(4)
    errs, sizes = [], []
    for _ in range(200):
        sk = generate_exaloglog_poisson(n, t, d, p, rng)
        errs.append(sk.estimate() / n - 1)
        sizes.append(len(zlib.compress(sk.serialize(), 9)))
    errs = np.array(errs)
    mvp_emp = 8 * float(np.mean(sizes)) * float(np.mean(errs**2))
    assert mvp_emp <= 1.5 * ml_compressed_mvp(t, d), (mvp_emp, ml_compressed_mvp(t, d))


def test_exaloglog_mvp_matches_published(spark):
    """Pinned at statistical power that detects a real estimator drift:
    10k cycles puts the MVP's Monte-Carlo rel-sd at ~1.4% (mse sampling),
    so the 5% tolerance is ~3.5 sigma — a few-percent regression fails,
    where the old 400-cycle/20% pin could not tell noise from damage.
    Runtime ~15 s on 8 cores (Poisson state sampling, ~1 ms/cycle)."""
    r = empirical_mvp(spark, 2, 20, 8, n=1_000_000.0, num_cycles=10_000, seed=1)
    assert r["state_bytes"] == 896
    assert r["mvp"] == pytest.approx(3.691, rel=0.05), r
    assert abs(r["bias"]) < 5 * r["rmse"] / 100  # bias ~ 0 at 10k cycles


def test_exaloglog_2_24_8_mvp_matches_published(spark):
    """The second reproducible ELL config from the paper's empirical-MVP
    grid (results/comparison-empirical-mvp/'ExaLogLog (t = 2, d = 24,
    p = 8).csv' last row): MVP 3.787 at 32-bit registers -> 1024 B.
    Same 10k-cycle / 5% power as the headline pin — tight enough to
    distinguish 3.787 from the (2,20,8) config's 3.691."""
    r = empirical_mvp(spark, 2, 24, 8, n=1_000_000.0, num_cycles=10_000, seed=5)
    assert r["state_bytes"] == 1024
    assert r["mvp"] == pytest.approx(3.787, rel=0.05), r


def test_hll_mvp_matches_published_and_worse_than_ell(spark):
    # HLL = t=0, d=0 shared kernel; p=11 -> 6-bit registers, 1536 B
    r = empirical_mvp(spark, 0, 0, 11, n=1_000_000.0, num_cycles=10_000, seed=2)
    assert r["state_bytes"] == 1536
    assert r["mvp"] == pytest.approx(6.459, rel=0.05), r
    # the paper's headline: ExaLogLog needs ~43% less space at equal error
    # (theoretical mvp ratio 3.673/6.449 = 0.57; 10k-cycle noise ~2%)
    ell = empirical_mvp(spark, 2, 20, 8, n=1_000_000.0, num_cycles=10_000, seed=3)
    assert ell["mvp"] < 0.65 * r["mvp"], (ell["mvp"], r["mvp"])


def test_ultraloglog_point_of_the_kernel_matches_published(spark):
    """UltraLogLog IS the (t=0, d=2) point of the generalized kernel
    (Ertl's unified parametrization: q=6 exponent bits, d=2 history bits,
    base 2 — mvp.txt row 'q=6, d=2, b=2'): at p=10 the state is the
    published 1024 bytes, the THEORETICAL ML MVP reproduces the published
    constant to every digit, and the EMPIRICAL MVP matches the paper's
    'Hash4j UltraLogLog (p = 10)' comparison row (4.639, rmse 0.02380) —
    completing the paper's 4-way empirical-MVP table (ELL(2,20,8) 3.691 /
    ELL(2,24,8) 3.787 / HLL11 6.459 / ULL10 4.639) with no separate
    UltraLogLog implementation needed."""
    from exaloglog_paper_spark.sketchlib.exaloglog import ExaLogLogConfig

    cfg = ExaLogLogConfig(0, 2, 10)
    assert cfg.state_num_bytes == 1024
    assert cfg.state_num_bytes * 8 * cfg.theoretical_rse_ml() ** 2 == pytest.approx(
        4.63128908504886, rel=1e-12  # results/constants/mvp.txt q=6,d=2 row
    )
    r = empirical_mvp(spark, 0, 2, 10, n=1_000_000.0, num_cycles=10_000, seed=3)
    assert r["state_bytes"] == 1024
    assert r["mvp"] == pytest.approx(4.639, rel=0.05), r
    assert r["rmse"] == pytest.approx(0.02380, rel=0.05), r


def test_intermediate_history_constant_pinned():
    """The q=6, d=1 row of mvp.txt (the 7-bit-register point between HLL
    and UltraLogLog) — theoretical ML MVP to every digit."""
    from exaloglog_paper_spark.sketchlib.exaloglog import ExaLogLogConfig

    cfg = ExaLogLogConfig(0, 1, 10)
    assert cfg.state_num_bytes * 8 * cfg.theoretical_rse_ml() ** 2 == pytest.approx(
        5.190435218372929, rel=1e-12
    )
