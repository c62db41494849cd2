"""Exact tail order-statistics sketch: byte-identical multiset-truncation
merge algebra under any partitioning, exact rank values vs numpy ground
truth, the pre-truncation fast path, and the honest OutOfTailError."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from exaloglog_paper_spark.ops.agg import float_values, sketch_agg
from exaloglog_paper_spark.ops.specs import TailQuantileSpec
from exaloglog_paper_spark.sketchlib.tailquantile import (
    OutOfTailError,
    TailQuantile,
    TailQuantileConfig,
)


def _vals(n, seed):
    rng = np.random.default_rng(seed)
    # duplicates on purpose: multiset semantics must hold through merges
    return rng.integers(8, 4096, size=n).astype(np.float64)


def test_merge_equals_single_build_byte_identity():
    spec = TailQuantileSpec(m=64)
    v = _vals(20_000, 1)
    single = spec.add(spec.empty(), v)
    for n_chunks in (2, 5, 17):
        parts = [spec.add(spec.empty(), c) for c in np.array_split(v, n_chunks)]
        acc = parts[-1]
        for p in reversed(parts[:-1]):
            acc = spec.merge(acc, p)
        assert spec.serialize(acc) == spec.serialize(single)


def test_exact_ranks_match_numpy_and_out_of_tail_raises():
    cfg = TailQuantileConfig(m=50)
    v = _vals(5_000, 2)
    tq = TailQuantile(cfg).add_values(v)
    s = np.sort(v)
    assert tq.n == 5_000
    assert tq.min == s[0] and tq.max == s[-1]
    for q in (0.0, 0.0001, 0.005, 0.999, 0.9999, 1.0):
        rank = max(1, min(5_000, int(np.ceil(q * 5_000))))
        assert tq.quantile_disc(q) == s[rank - 1], q
    with pytest.raises(OutOfTailError):
        tq.quantile_disc(0.5)  # rank 2500, both tails only cover 50


def test_pretruncated_huge_batch_equals_chunked():
    cfg = TailQuantileConfig(m=32)
    v = _vals(100_000, 3)  # > 2m triggers the partition fast path
    a = TailQuantile(cfg).add_values(v)
    b = TailQuantile(cfg)
    for c in np.array_split(v, 400):  # small batches take the plain path
        b.add_values(c)
    assert a.serialize() == b.serialize()


def test_serialization_roundtrip_and_empty():
    cfg = TailQuantileConfig(m=16)
    tq = TailQuantile(cfg).add_values(_vals(100, 4))
    back = TailQuantile.deserialize(cfg, tq.serialize())
    assert back.n == tq.n
    assert (back.lo == tq.lo).all() and (back.hi == tq.hi).all()
    empty = TailQuantile.deserialize(cfg, TailQuantile(cfg).serialize())
    assert empty.n == 0
    with pytest.raises(OutOfTailError):
        empty.quantile_disc(0.5)


def test_partitioning_invariance_through_sketch_agg(spark):
    spec = TailQuantileSpec(m=128)
    df = spark.range(30_000).select(
        (F.pmod(F.xxhash64("id"), F.lit(5000)) + 8).cast("double").alias("v")
    )
    states = {}
    for parts in (2, 32):
        row = sketch_agg(df.repartition(parts), spec, float_values("v")).collect()[0]
        states[parts] = bytes(row.sketch)
    assert states[2] == states[32]
    tq = spec.deserialize(states[2])
    exact = np.sort(np.array([r.v for r in df.collect()]))
    assert tq.n == 30_000
    for q in (0.0001, 0.001, 0.999, 1.0):
        rank = max(1, min(tq.n, int(np.ceil(q * tq.n))))
        assert tq.quantile_disc(q) == exact[rank - 1]


def test_empty_min_max_raise_out_of_tail():
    tq = TailQuantile(TailQuantileConfig(m=4))
    with pytest.raises(OutOfTailError):
        _ = tq.min
    with pytest.raises(OutOfTailError):
        _ = tq.max
