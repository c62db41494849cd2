"""Companion sketches through the distributed sketch_agg pipeline."""

import numpy as np
import pytest

from exaloglog_paper_spark.ops import tokens as tok
from exaloglog_paper_spark.ops.agg import float_values, sketch_agg
from exaloglog_paper_spark.ops.specs import (
    BloomSpec,
    KLLSpec,
    TDigestSpec,
    cms_heavy_hitters,
    token_array_ids,
)

N_ROWS = 400
SEED = 42


@pytest.fixture(scope="module")
def tdf(spark):
    return tok.token_table(spark, N_ROWS, seed=SEED, num_partitions=7).cache()


@pytest.fixture(scope="module")
def truth():
    return tok.exact_ground_truth(N_ROWS, seed=SEED)


def test_cms_heavy_hitters_match_exact_topk(spark, tdf, truth):
    hh = cms_heavy_hitters(tdf, token_array_ids("tokens"), k=20)
    exact_top = dict(truth["top_tokens"][:20])
    got_ids = [t for t, _ in hh]
    # approximate top-20 must contain the exact top-10 (zipf gap is large)
    for tid, _ in truth["top_tokens"][:10]:
        assert tid in got_ids
    # estimates overcount only, within eps*N
    n = truth["total_tokens"]
    eps = np.e / 8192
    for tid, est in hh:
        if tid in exact_top:
            assert est >= exact_top[tid]
            assert est - exact_top[tid] <= 2 * eps * n


def test_kll_ntok_quantiles(spark, tdf, truth):
    spec = KLLSpec(k=200)
    row = sketch_agg(tdf, spec, float_values("n_tok")).collect()[0]
    sk = spec.deserialize(bytes(row.sketch))
    # exact n_tok quantiles from ground truth at 10/50/90
    q10, q25, q50, q75, q90, q99 = truth["n_tok_quantiles"]
    assert sk.n == N_ROWS
    est = sk.quantile(np.array([0.1, 0.5, 0.9]))
    for e, exact in zip(est, [q10, q50, q90]):
        assert abs(e - exact) / exact < 0.15, (e, exact)


def test_tdigest_ntok_quantiles(spark, tdf, truth):
    spec = TDigestSpec(delta=200)
    row = sketch_agg(tdf, spec, float_values("n_tok")).collect()[0]
    td = spec.deserialize(bytes(row.sketch))
    q10, q25, q50, q75, q90, q99 = truth["n_tok_quantiles"]
    est = td.quantile(np.array([0.25, 0.5, 0.75]))
    for e, exact in zip(est, [q25, q50, q75]):
        assert abs(e - exact) / exact < 0.1, (e, exact)


def test_kll_cross_check_vs_spark_percentile_approx(spark, tdf):
    """KLL and Spark's built-in percentile_approx agree within rank
    tolerance of the exact quantiles (SURVEY §2.3 cross-check)."""
    from pyspark.sql import functions as F

    spec = KLLSpec(k=200)
    row = sketch_agg(tdf, spec, float_values("n_tok")).collect()[0]
    sk = spec.deserialize(bytes(row.sketch))
    spark_q = tdf.select(
        F.percentile_approx("n_tok", [0.25, 0.5, 0.75], 10000).alias("q")
    ).collect()[0].q
    exact = tdf.select(F.expr("percentile(n_tok, array(0.25, 0.5, 0.75))").alias("q")).collect()[0].q
    kll_q = sk.quantile(np.array([0.25, 0.5, 0.75]))
    for k_est, s_est, ex in zip(kll_q, spark_q, exact):
        assert abs(k_est - ex) / ex < 0.1
        assert abs(float(s_est) - ex) / ex < 0.1


def test_companion_merge_properties():
    """Hypothesis-style split/merge equality for CMS and Bloom (order and
    partitioning never change the state)."""
    import numpy as np

    from exaloglog_paper_spark.sketchlib.bitops import splitmix64_stream
    from exaloglog_paper_spark.sketchlib.bloom import BloomConfig, BloomFilter
    from exaloglog_paper_spark.sketchlib.countmin import CountMin, CountMinConfig

    h = splitmix64_stream(77, 30_000)
    for cuts in [[0], [1, 2], [100, 20_000], [29_999], [7_000, 14_000, 21_000]]:
        parts = np.split(h, sorted(cuts))
        cm_cfg = CountMinConfig(512, 4)
        cm_full = CountMin(cm_cfg).add_hashes(h)
        cm_acc = CountMin(cm_cfg)
        for part in reversed(parts):
            cm_acc.merge_(CountMin(cm_cfg).add_hashes(part))
        assert np.array_equal(cm_acc.table, cm_full.table)
        bf_cfg = BloomConfig(1 << 14, 5)
        bf_full = BloomFilter(bf_cfg).add_hashes(h)
        bf_acc = BloomFilter(bf_cfg)
        for part in parts:
            bf_acc.merge_(BloomFilter(bf_cfg).add_hashes(part))
        assert np.array_equal(bf_acc.bits, bf_full.bits)


def test_bloom_membership_distributed(spark, tdf):
    from pyspark.sql import functions as F
    from exaloglog_paper_spark.ops.agg import hash64_values
    from exaloglog_paper_spark.sketchlib.bitops import splitmix64

    spec = BloomSpec(num_bits=1 << 18, num_hashes=7)
    hashed = tdf.select(F.xxhash64("doc_id").alias("h"))
    row = sketch_agg(hashed, spec, hash64_values("h")).collect()[0]
    bf = spec.deserialize(bytes(row.sketch))
    # no false negatives: every inserted doc_id hash must be found
    local = [r.h for r in hashed.collect()]
    assert bf.contains_hashes(np.array(local, dtype=np.int64).view(np.uint64)).all()
    # false-positive rate near formula
    probe = splitmix64(np.arange(10_000, dtype=np.uint64) + np.uint64(999_999_937))
    fpr = bf.contains_hashes(probe).mean()
    assert fpr < 3 * spec.cfg.expected_fpr(N_ROWS) + 0.001
