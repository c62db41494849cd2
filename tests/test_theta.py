"""Theta/KMV sketch: merge algebra byte-identity (the distributed
correctness contract), partitioning invariance through sketch_agg,
estimator accuracy vs RSE 1/sqrt(k-2), and native set-op estimates."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from exaloglog_paper_spark.ops.agg import hash64_values, sketch_agg
from exaloglog_paper_spark.ops.specs import ThetaSpec
from exaloglog_paper_spark.sketchlib import theta as th
from exaloglog_paper_spark.sketchlib.bitops import splitmix64


def _hashes(n, seed):
    rng = np.random.default_rng(seed)
    return splitmix64(rng.integers(0, 2**63, size=n, dtype=np.int64).view(np.uint64))


def test_merge_equals_single_build_byte_identity():
    spec = ThetaSpec(k=256)
    h = _hashes(50_000, 1)
    single = spec.add(spec.empty(), h)
    for n_chunks in (2, 3, 7, 16):
        parts = [
            spec.add(spec.empty(), c) for c in np.array_split(h, n_chunks)
        ]
        folded = spec.merge_many(parts)
        assert spec.serialize(folded) == spec.serialize(single)
        # pairwise fold in reversed order — same bytes (assoc + comm)
        acc = parts[-1]
        for p in reversed(parts[:-1]):
            acc = spec.merge(acc, p)
        assert spec.serialize(acc) == spec.serialize(single)


def test_chunked_update_order_free():
    spec = ThetaSpec(k=128)
    h = _hashes(10_000, 2)
    a = spec.add(spec.empty(), h)
    rng = np.random.default_rng(3)
    sh = h[rng.permutation(len(h))]
    b = spec.empty()
    for c in np.array_split(sh, 13):
        b = spec.add(b, c)
    assert spec.serialize(a) == spec.serialize(b)


def test_exact_mode_below_k():
    spec = ThetaSpec(k=1024)
    h = np.unique(_hashes(500, 4))
    st = spec.add(spec.empty(), np.concatenate([h, h]))  # duplicates ignored
    assert spec.finalize(st) == float(len(h))
    assert th.theta_of(st, spec.k) == 1.0


def test_estimator_within_rse():
    spec = ThetaSpec(k=4096)
    rse = spec.theoretical_rse()
    for seed, n in [(5, 100_000), (6, 1_000_000)]:
        st = spec.add(spec.empty(), _hashes(n, seed))
        assert abs(spec.finalize(st) / n - 1) < 5 * rse, (n, spec.finalize(st))


def test_estimator_rmse_matches_theory():
    """Across many seeds the empirical rmse tracks 1/sqrt(k-2) (reference
    test style: rmse <= 1.45x RSE; small-cycle noise bounded)."""
    spec = ThetaSpec(k=1024)
    n = 50_000
    errs = [
        spec.finalize(spec.add(spec.empty(), _hashes(n, 100 + i))) / n - 1
        for i in range(60)
    ]
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse <= 1.45 * spec.theoretical_rse(), rmse
    assert rmse >= 0.5 * spec.theoretical_rse(), rmse


def test_set_ops_accuracy():
    spec = ThetaSpec(k=4096)
    rng = np.random.default_rng(7)
    universe = splitmix64(
        rng.integers(0, 2**63, size=300_000, dtype=np.int64).view(np.uint64)
    )
    universe = np.unique(universe)
    # membership must be independent of hash magnitude (np.unique sorts):
    # assign set membership by a shuffled order, as real keys would be
    universe = universe[rng.permutation(len(universe))]
    a_vals, common, b_vals = np.split(universe, [120_000, 150_000])
    a = spec.add(spec.empty(), np.concatenate([a_vals, common]))
    b = spec.add(spec.empty(), np.concatenate([common, b_vals]))
    ops = spec.set_ops(spec.serialize(a), spec.serialize(b))
    n_common, n_only_a = len(common), len(a_vals)
    assert abs(ops["intersection"] - n_common) <= 5 * ops["intersection_sigma"]
    assert abs(ops["difference"] - n_only_a) <= 5 * ops["difference_sigma"]
    # intersection error scales with the INTERSECTION, not the union: the
    # sigma itself must be far below what union-level I-E error would be
    assert ops["intersection_sigma"] < 0.15 * n_common


def test_set_ops_exact_mode():
    spec = ThetaSpec(k=4096)
    a = spec.add(spec.empty(), np.arange(100, 300, dtype=np.uint64))
    b = spec.add(spec.empty(), np.arange(200, 500, dtype=np.uint64))
    ops = spec.set_ops(spec.serialize(a), spec.serialize(b))
    assert ops["theta"] == 1.0
    assert ops["intersection"] == 100.0 and ops["intersection_sigma"] == 0.0
    assert ops["difference"] == 100.0


def test_partitioning_invariance_through_sketch_agg(spark):
    """The north-rule contract: the merged distributed state is
    byte-identical under any partition layout."""
    spec = ThetaSpec(k=512)
    df = (
        spark.range(20_000)
        .withColumn("h", F.xxhash64((F.col("id") % 7000).cast("string")))
        .withColumn("g", (F.col("id") % 3).cast("string"))
    )
    states = {}
    for parts in (2, 32):
        rows = sketch_agg(
            df.repartition(parts), spec, hash64_values("h"), by=["g"]
        ).collect()
        states[parts] = {r.g: bytes(r.sketch) for r in rows}
    assert states[2] == states[32]
    # grouped estimates are near-exact here (n per group < k would be exact;
    # with k=512 and ~7000 distinct, within 5 RSE)
    for g, st in states[2].items():
        est = spec.finalize(spec.deserialize(st))
        exact = df.filter(F.col("g") == g).select("h").distinct().count()
        assert abs(est / exact - 1) < 5 * spec.theoretical_rse()
