"""Sparse/dense hybrid ExaLogLog spec (reference sparse-mode semantics)."""

import numpy as np
import pytest

from exaloglog_paper_spark.ops import tokens as tok
from exaloglog_paper_spark.ops.agg import (
    ExaLogLogSpec,
    SparseExaLogLogSpec,
    sketch_agg,
    token_array_values,
    with_estimate,
)
from exaloglog_paper_spark.sketchlib.bitops import splitmix64_stream
from exaloglog_paper_spark.sketchlib.exaloglog import ExaLogLog


def test_sparse_exact_at_low_cardinality():
    spec = SparseExaLogLogSpec(2, 20, 10)
    h = splitmix64_stream(1, 200)
    st = spec.add(spec.empty(), h)
    assert isinstance(st, np.ndarray)  # still sparse
    # near-exact estimate from deduplicated tokens
    assert spec.finalize(st) == pytest.approx(200, rel=0.01)
    # dedup: re-adding changes nothing
    st2 = spec.add(st, h[:50])
    assert np.array_equal(st2, st)
    # serialization roundtrip keeps form + answer
    back = spec.deserialize(spec.serialize(st))
    assert np.array_equal(back, st)


def test_sparse_densify_matches_direct_dense_build():
    spec = SparseExaLogLogSpec(2, 20, 8)
    dense_spec = ExaLogLogSpec(2, 20, 8)
    n = spec.max_sparse * 3
    h = splitmix64_stream(5, n)
    st = spec.add(spec.empty(), h)
    assert isinstance(st, ExaLogLog)  # densified
    direct = dense_spec.add(dense_spec.empty(), h)
    assert st.serialize() == direct.serialize()  # byte-equal


def test_sparse_merge_all_combinations():
    spec = SparseExaLogLogSpec(2, 20, 8, max_sparse=500)
    h = splitmix64_stream(9, 2000)
    small_a = spec.add(spec.empty(), h[:100])
    small_b = spec.add(spec.empty(), h[100:200])
    big_a = spec.add(spec.empty(), h[:1500])
    big_b = spec.add(spec.empty(), h[500:])
    # sparse+sparse stays sparse (<=500) and dedups
    ss = spec.merge(spec.deserialize(spec.serialize(small_a)), small_b)
    assert isinstance(ss, np.ndarray) and len(ss) <= 200
    # all mixtures converge to the same dense state as one full build
    full = ExaLogLog.create(2, 20, 8).add_hashes(h)
    m1 = spec.merge(spec.deserialize(spec.serialize(big_a)), spec.deserialize(spec.serialize(big_b)))
    m1 = spec.merge(m1, spec.deserialize(spec.serialize(small_b)))
    m1 = spec.merge(m1, small_a)
    assert isinstance(m1, ExaLogLog)
    assert np.array_equal(m1.regs, full.regs)


def test_sparse_spec_distributed(spark):
    spec = SparseExaLogLogSpec(2, 20, 10, max_sparse=10_000)
    tdf = tok.token_table(spark, 100, num_partitions=5)
    truth = tok.exact_ground_truth(100)
    row = with_estimate(sketch_agg(tdf, spec, token_array_values("tokens")), spec).collect()[0]
    # token-level estimate is near-exact at this scale (sparse path)
    assert row.estimate == pytest.approx(truth["distinct_tokens"], rel=0.01)
