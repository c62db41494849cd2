"""Weighted priority sampling (DLT): kernel properties, exact merge
algebra, estimator bound, and Spark partitioning invariance."""

import numpy as np
import pytest

from exaloglog_paper_spark.ops import tokens as tok
from exaloglog_paper_spark.ops.agg import sketch_agg
from exaloglog_paper_spark.ops.specs import PrioritySampleSpec, keyed_weight_values
from exaloglog_paper_spark.sketchlib.prioritysample import (
    PrioritySample,
    PrioritySampleConfig,
    priorities,
)


def _rand_pairs(n, seed):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 2**64, n, dtype=np.uint64)
    w = rng.integers(8, 4097, n).astype(np.int64)
    return keys, w


def test_state_is_exact_topk_by_priority():
    keys, w = _rand_pairs(5000, 7)
    cfg = PrioritySampleConfig(64)
    st = PrioritySample(cfg).add_pairs(keys, w)
    q = priorities(keys, w)
    order = np.lexsort((keys, -q))[:65]
    assert np.array_equal(st.keys, keys[order])
    assert np.array_equal(st.weights, w[order])
    assert st.n == 5000 and st.sum_w == int(w.sum())


def test_merge_byte_identity_any_partitioning():
    keys, w = _rand_pairs(4000, 11)
    cfg = PrioritySampleConfig(32)
    full = PrioritySample(cfg).add_pairs(keys, w).serialize()
    for seed in range(6):
        rng = np.random.default_rng(seed)
        parts = np.array_split(rng.permutation(4000), rng.integers(2, 17))
        states = [PrioritySample(cfg).add_pairs(keys[p], w[p]) for p in parts]
        # both fold directions + a tree shape
        acc = states[0]
        for s in states[1:]:
            acc = acc.merge_(s)
        assert acc.serialize() == full
    # serialization roundtrip
    back = PrioritySample.deserialize(cfg, full)
    assert back.serialize() == full


def test_estimator_unbiased_and_within_szegedy_bound():
    keys, w = _rand_pairs(3000, 3)
    W = float(w.sum())
    ests = []
    for seed in range(150):
        k2 = np.random.default_rng(seed).integers(0, 2**64, 3000, dtype=np.uint64)
        ests.append(PrioritySample(PrioritySampleConfig(64)).add_pairs(k2, w).estimate_total())
    ests = np.array(ests)
    assert abs(ests.mean() / W - 1) < 0.05  # unbiased to MC noise
    # Szegedy: Var <= W^2/(k-1). Near-uniform weights sit close to the
    # worst case, and a 150-trial sample std carries ~6% relative noise
    # (sigma/sqrt(2*150)) — allow the same MC slack the statistical suite
    # uses for rmse-vs-RSE pins.
    assert ests.std() <= 1.15 * W / np.sqrt(63)


def test_exact_mode_below_k():
    keys, w = _rand_pairs(10, 1)
    st = PrioritySample(PrioritySampleConfig(64)).add_pairs(keys, w)
    assert st.tau == 0.0
    assert st.estimate_total() == float(w.sum())
    _, sw, w_hat = st.sample()
    assert np.array_equal(sw.astype(np.float64), w_hat)


def test_spark_partitioning_invariance(spark):
    """The sketch_agg state is byte-identical at any parallelism — the
    distributed-correctness contract for new sketch ops (CLAUDE.md)."""
    from pyspark.sql import functions as F

    states = []
    for nparts in (3, 13):
        df = tok.token_table(spark, 400, num_partitions=nparts)
        dig = F.md5(F.col("doc_id"))
        keyed = df.select(
            "n_tok",
            F.conv(F.substring(dig, 1, 8), 16, 10).cast("long").alias("prio_hi"),
            F.conv(F.substring(dig, 9, 8), 16, 10).cast("long").alias("prio_lo"),
        )
        spec = PrioritySampleSpec(k=16)
        row = sketch_agg(keyed, spec, keyed_weight_values("n_tok")).collect()[0]
        states.append(bytes(row.sketch))
        assert row.n_values == 400
    assert states[0] == states[1]
    # cross-check vs a local single-threaded build of the same table
    pdf = tok.generate_rows(np.arange(400, dtype=np.uint64))
    import hashlib

    hx = [hashlib.md5(d.encode()).hexdigest()[:16] for d in pdf["doc_id"]]
    keys = np.array([int(h, 16) for h in hx], dtype=np.uint64)
    local = PrioritySample(PrioritySampleConfig(16)).add_pairs(
        keys, pdf["n_tok"].to_numpy(np.int64)
    )
    assert local.serialize() == states[0]
