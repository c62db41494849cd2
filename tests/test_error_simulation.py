"""Statistical acceptance: the distributed Monte-Carlo pipeline reproduces
the paper's error behavior — empirical rmse ≈ theoretical RSE and bias ≈ 0
(threshold style of AbstractSpecificExaLogLogTest.java:1052-1061), including
huge-cardinality rungs via Poisson state sampling."""

import math

import numpy as np
import pytest

from exaloglog_paper_spark.sketchlib.bitops import splitmix64_stream
from exaloglog_paper_spark.experiments.error_simulation import (
    error_summary,
    geometric_ladder,
    simulate_errors,
)
from exaloglog_paper_spark.sketchlib.constants import theoretical_rse_ml
from exaloglog_paper_spark.sketchlib.exaloglog import ExaLogLog
from exaloglog_paper_spark.sketchlib.simulate import (
    generate_exaloglog_poisson,
    generate_hash_for_update,
)


def test_generate_hash_for_update_roundtrip():
    from exaloglog_paper_spark.sketchlib.exaloglog import hash_to_idx_k

    t, p = 2, 8
    for k in [1, 2, 7, 64, 150, (65 - p - t) << t]:
        for idx in [0, 1, 37, 255]:
            h = np.array([generate_hash_for_update(k, idx, p, t)], dtype=np.uint64)
            got_idx, got_k = hash_to_idx_k(h, t, p)
            assert int(got_idx[0]) == idx and int(got_k[0]) == k, (k, idx)


def test_poisson_state_distribution_matches_exact_inserts():
    """At moderate n the Poisson-sampled states must estimate with the same
    accuracy as exact-insert states (same marginal distribution)."""
    t, d, p = 2, 20, 8
    n = 50_000
    rse = theoretical_rse_ml(t, d, p)
    rng = np.random.default_rng(1)
    errs = []
    for _ in range(120):
        est = generate_exaloglog_poisson(n, t, d, p, rng).estimate()
        errs.append(est / n - 1)
    errs = np.array(errs)
    rmse = float(np.sqrt((errs**2).mean()))
    assert 0.6 * rse < rmse < 1.4 * rse, (rmse, rse)
    assert abs(errs.mean()) < 5 * rse / math.sqrt(len(errs))


def test_transition_replay_continuity_and_accuracy():
    """Transition replay: monotone states across rungs (same cycle) and
    rmse within the published band at large n."""
    from exaloglog_paper_spark.sketchlib.simulate import (
        generate_transitions,
        state_at_cardinality,
    )

    t, d, p = 2, 20, 8
    rse = theoretical_rse_ml(t, d, p)
    rng = np.random.default_rng(9)
    errs = []
    for _ in range(100):
        tr = generate_transitions(t, d, p, rng)
        prev_u = None
        for n in [1e7, 1e9, 1e11]:
            sk = state_at_cardinality(tr, n, t, d, p)
            u = (sk.regs >> np.uint64(d)).astype(np.int64)
            if prev_u is not None:
                assert np.all(u >= prev_u)  # within-cycle continuity
            prev_u = u
            if n == 1e9:
                errs.append(sk.estimate() / n - 1)
    errs = np.array(errs)
    rmse = float(np.sqrt((errs**2).mean()))
    assert 0.5 * rse < rmse < 1.5 * rse, (rmse, rse)


def test_spark_error_simulation_bounds(spark):
    t, d, p = 2, 20, 8
    ladder = [100.0, 3000.0, 50_000.0, 1e9, 1e12]  # last two via Poisson states
    errors = simulate_errors(
        spark, t, d, p, num_cycles=250, ladder=ladder, seed=7, exact_limit=60_000
    )
    summary = {r.rung: r for r in error_summary(errors, t, d, p).collect()}
    assert set(summary) == set(ladder)
    for n in ladder:
        r = summary[n]
        assert r.cycles == 250
        # rmse never exceeds the published bound (1.45x slack at 250 cycles);
        # the two-sided asymptotic check |rmse/RSE - 1| small applies only at
        # large n (small-n sketches are sub-RSE because the d history bits
        # retain nearly full information at low fill — same shape as the
        # reference's results/error CSVs)
        assert r.rmse < 1.45 * r.rse_theory, (n, r.rmse_over_rse)
        if n >= 1e9:
            assert 0.55 < r.rmse_over_rse < 1.45, (n, r.rmse_over_rse)
        assert abs(r.bias) < 5 * r.rse_theory / math.sqrt(250), (n, r.bias)


def test_exact_enumeration_n1_matches_reference_empirical():
    """Exhaustive single-insert enumeration (≙ AbstractSpecificExaLogLog
    Test.java:640-868): the *analytically exact* expected bias/rmse at n=1
    must agree with the reference's published 100k-cycle empirical values
    (CSV row n=1: bias -1.9309e-4, rmse 4.1363e-4) within their Monte-Carlo
    error — this pins contribute + solver + bias-correction end to end."""
    from exaloglog_paper_spark.sketchlib.simulate import (
        generate_hash_for_update,
        phi,
    )

    t, d, p = 2, 20, 8
    kmax = (65 - p - t) << t
    ks = np.arange(1, kmax + 1)
    probs = np.ldexp(1.0, -phi(ks, p, t))
    assert probs.sum() == 1.0  # exact outcome partition
    E = 0.0
    E2 = 0.0
    for k, pr in zip(ks.tolist(), probs.tolist()):
        sk = ExaLogLog.create(t, d, p)
        sk.add_hashes(np.array([generate_hash_for_update(k, 0, p, t)], dtype=np.uint64))
        est = sk.estimate()
        E += pr * est
        E2 += pr * (est - 1.0) ** 2
    bias = E - 1.0
    rmse = math.sqrt(E2)
    # reference empirical sigma: rmse/sqrt(1e5) ~ 1.3e-6 for bias,
    # ~rmse/sqrt(2e5) ~ 9e-7 for rmse; allow 5 sigma
    assert abs(bias - (-1.9308568953875014e-4)) < 7e-6, bias
    assert abs(rmse - 4.136276370522179e-4) < 7e-6, rmse


def test_martingale_rse_matches_published():
    """Martingale (HIP) estimator rmse ≈ published RSE 0.019858 at
    ELL(2,20,8) (BASELINE.md); sequential per-cycle streams."""
    from exaloglog_paper_spark.sketchlib.constants import martingale_rse_constant
    from exaloglog_paper_spark.sketchlib.martingale import (
        MartingaleEstimator,
        add_hashes_martingale,
    )

    t, d, p = 2, 20, 8
    rse = martingale_rse_constant(t, d) / math.sqrt(1 << p)
    n = 10_000
    errs = []
    for c in range(80):
        seed = int(splitmix64_stream(0xFACE, 1, offset=c)[0])
        sk = ExaLogLog.create(t, d, p)
        est = MartingaleEstimator()
        add_hashes_martingale(sk, splitmix64_stream(seed, n), est)
        errs.append(est.distinct_count_estimate / n - 1)
    errs = np.array(errs)
    rmse = float(np.sqrt((errs**2).mean()))
    assert 0.6 * rse < rmse < 1.4 * rse, (rmse, rse)
    assert abs(errs.mean()) < 5 * rse / math.sqrt(80)
    # martingale is more efficient than ML at equal state (the paper's
    # efficiency claim, mvp.txt martingale section)
    ml_rse = theoretical_rse_ml(t, d, p)
    assert rse < ml_rse


# published empirical (bias, rmse) at the n=100,000 rung of the reference's
# own token-error CSVs (results/error/token-estimation-error-{v}.csv, 100k
# cycles) — the FULL production v grid incl. v=26, the production token width
# (TokenEstimationErrorSimulation.java:76-97; java/build.gradle:134-155)
_TOKEN_PUBLISHED = {
    6: (0.004331009121376007, 0.08204744548201154),
    8: (0.0010074870996202164, 0.04045585210008861),
    10: (1.8393035878039036e-4, 0.02004633756759846),
    12: (7.540853098038906e-5, 0.009621977914882732),
    18: (-1.1239267423904792e-6, 8.120060924486249e-4),
    26: (-1.792273666849287e-7, 4.975376357199079e-5),
}


@pytest.mark.parametrize("v", [6, 8, 10, 12, 18, 26])
def test_token_estimator_matches_published_rmse(v):
    """Token-stream estimator rmse at n=100k matches the reference's OWN
    published empirical rmse per v (see _TOKEN_PUBLISHED above). At large v
    the published rmse sits legitimately BELOW the asymptotic RSE
    0.6491/√2^v (low-occupancy regime), so pinning against the published
    value is strictly stronger than the theory-ratio check."""
    import math

    from exaloglog_paper_spark.sketchlib.exaloglog import (
        compute_token,
        estimate_distinct_from_tokens,
    )

    pub_bias, pub_rmse = _TOKEN_PUBLISHED[v]
    n = 100_000
    cycles = 150
    errs = []
    for c in range(cycles):
        seed = int(splitmix64_stream(0xBEEF ^ v, 1, offset=c)[0])
        hashes = splitmix64_stream(seed, n)
        est = estimate_distinct_from_tokens(compute_token(hashes, v), v)
        errs.append(est / n - 1)
    errs = np.array(errs)
    rmse = float(np.sqrt((errs**2).mean()))
    # rmse of `cycles` squared errors has ~1/sqrt(2*cycles) ≈ 5.8% rel sd;
    # allow 4 sigma
    assert abs(rmse / pub_rmse - 1) < 0.25, (v, rmse, pub_rmse)
    # bias is tiny relative to rmse; assert it within Monte-Carlo noise of
    # the published bias
    assert abs(errs.mean() - pub_bias) < 5 * pub_rmse / math.sqrt(cycles), (
        v,
        errs.mean(),
        pub_bias,
    )


def test_reference_style_csv(tmp_path, spark):
    import pandas as pd

    from exaloglog_paper_spark.experiments.error_simulation import (
        write_reference_style_csv,
    )

    errors = simulate_errors(spark, 2, 20, 6, num_cycles=50, ladder=[100.0, 1000.0], seed=3)
    pdf = error_summary(errors, 2, 20, 6).toPandas()
    out = str(tmp_path / "err.csv")
    write_reference_style_csv(pdf, out, 2, 20, 6)
    with open(out) as f:
        header = f.readline()
        assert header.startswith("sketch_name=ExaLogLog; t=2; d=20; p=6;")
        cols = f.readline().strip().split(";")
        assert cols[0] == "rung"
        # solver-health columns (reference CSV cols 8-10)
        assert cols[-3:] == ["min_iterations", "mean_iterations", "max_iterations"]
        back = pd.read_csv(out, sep=";", skiprows=1)
        assert len(back) == 2
        assert (back["max_iterations"] >= back["min_iterations"]).all()


def test_solver_iteration_stats_match_reference(spark):
    """Mean Newton iterations at (t=2,d=20,p=10), n=10 matches the
    reference's published solver stats: mean 2.34991, min 0, max 4
    (results/error/exaloglog-estimation-error-t02-d20-p10.csv row n=10)."""
    errors = simulate_errors(spark, 2, 20, 10, num_cycles=400, ladder=[10.0], seed=11)
    r = error_summary(errors, 2, 20, 10).collect()[0]
    assert abs(r.mean_iterations - 2.34991) < 0.25, r.mean_iterations
    assert r.min_iterations >= 0 and r.max_iterations <= 5


def test_martingale_saturated_estimator_returns_infinity():
    """Java 1.0/0.0 == +Infinity: a clamped (p=0) estimator must yield an
    infinite estimate, not ZeroDivisionError (MartingaleEstimator.java)."""
    import math

    from exaloglog_paper_spark.sketchlib.martingale import MartingaleEstimator

    est = MartingaleEstimator(42.0, 1e-300)
    est.decrement_state_change_probability(1e-300)  # clamps p to 0.0
    assert est.state_change_probability == 0.0
    est.decrement_state_change_probability(0.0)
    assert math.isinf(est.distinct_count_estimate)


def test_token_error_simulation_pipeline_and_csv(tmp_path, spark):
    """Spark token-error pipeline: rmse at the 1e5-ish rung within
    Monte-Carlo noise of the reference's published CSV value for v=12, and
    the CSV artifact carries the reference's column set."""
    import pandas as pd

    from exaloglog_paper_spark.experiments.error_simulation import (
        simulate_token_errors,
        token_error_summary,
        write_token_csv,
    )

    v = 12
    errors = simulate_token_errors(
        spark, v=v, num_cycles=150, ladder=[1000.0, 100_000.0], seed=5
    )
    pdf = token_error_summary(errors).toPandas()
    row = pdf[pdf.rung == 100_000.0].iloc[0]
    _, pub_rmse = _TOKEN_PUBLISHED[v]
    assert abs(row.rmse / pub_rmse - 1) < 0.25, row.rmse
    assert 1 <= row.mean_iterations <= 10
    out = str(tmp_path / "tok.csv")
    write_token_csv(pdf, out, v, 150)
    with open(out) as f:
        assert f.readline().startswith(f"token_parameter={v}; num_cycles=150")
        cols = f.readline().strip().split("; ")
        assert cols == [
            "distinct count", "relative bias", "relative rmse",
            "min num iterations", "mean num iterations", "max num iterations",
        ]
        back = pd.read_csv(out, sep=";", skiprows=1)
        assert len(back) == 2
