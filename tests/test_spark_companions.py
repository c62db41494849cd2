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
