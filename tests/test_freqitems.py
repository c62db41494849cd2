"""Misra-Gries frequent items: the deterministic bracket guarantee
``est(x) <= true(x) <= est(x) + err_bound`` with ``err_bound <= n/(k+1)``
under ANY chunking / merge schedule (the mergeable-summaries contract —
the counter SET is order-dependent, the guarantee is not), plus the
bottom-k priority sample's exact KMV merge algebra through sketch_agg."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from exaloglog_paper_spark.ops.agg import sketch_agg
from exaloglog_paper_spark.ops.specs import (
    BottomKSampleSpec,
    MisraGriesSpec,
    md5_priority_values,
    token_array_ids,
)
from exaloglog_paper_spark.sketchlib.freqitems import FreqItemsConfig, MisraGries


def _zipf_stream(n, seed, vocab=5000, s=1.1):
    rng = np.random.default_rng(seed)
    w = 1.0 / np.power(np.arange(1, vocab + 1, dtype=np.float64), s)
    cdf = np.cumsum(w / w.sum())
    return np.searchsorted(cdf, rng.random(n), side="right").astype(np.int64)


def _assert_guarantee(mg: MisraGries, stream: np.ndarray):
    k = mg.cfg.k
    assert mg.n == len(stream)
    assert len(mg.ids) <= k
    assert (mg.counts > 0).all()
    assert 0 <= mg.err_bound <= mg.n / (k + 1)
    true_ids, true_cnt = np.unique(stream, return_counts=True)
    est = mg.estimate(true_ids)
    assert (est <= true_cnt).all(), "MG must never overcount"
    assert (true_cnt - est <= mg.err_bound + 1e-9).all(), "undercount exceeds bound"
    # absent items: estimate 0, true count must be <= err_bound
    absent = np.setdiff1d(true_ids, mg.ids)
    if len(absent):
        a_cnt = true_cnt[np.searchsorted(true_ids, absent)]
        assert (a_cnt <= mg.err_bound + 1e-9).all()
    # guaranteed presence of items with freq > n/(k+1)
    heavy = true_ids[true_cnt > mg.n / (k + 1)]
    assert np.isin(heavy, mg.ids).all()


def test_single_stream_guarantee():
    stream = _zipf_stream(200_000, seed=1)
    mg = MisraGries(FreqItemsConfig(k=64)).add_ids(stream)
    _assert_guarantee(mg, stream)


def test_exact_mode_small_universe():
    stream = np.repeat(np.arange(10, dtype=np.int64), 100)
    mg = MisraGries(FreqItemsConfig(k=32)).add_ids(stream)
    assert mg.err_bound == 0.0
    assert (mg.estimate(np.arange(10)) == 100).all()


def test_guarantee_under_arbitrary_chunking_and_merge_trees():
    stream = _zipf_stream(300_000, seed=2)
    rng = np.random.default_rng(3)
    for n_chunks in (2, 7, 33):
        cuts = np.sort(rng.choice(len(stream) - 1, size=n_chunks - 1, replace=False)) + 1
        parts = [
            MisraGries(FreqItemsConfig(k=64)).add_ids(c)
            for c in np.split(stream, cuts)
        ]
        # pairwise left fold
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.merge_(p)
        _assert_guarantee(acc, stream)
    # k-way fold (single trim) — same guarantee
    parts = [
        MisraGries(FreqItemsConfig(k=64)).add_ids(c)
        for c in np.array_split(stream, 16)
    ]
    kway = parts[0].merge_many_(parts[1:])
    _assert_guarantee(kway, stream)


def test_serialization_roundtrip():
    cfg = FreqItemsConfig(k=48)
    mg = MisraGries(cfg).add_ids(_zipf_stream(50_000, seed=4))
    back = MisraGries.deserialize(cfg, mg.serialize())
    assert back.n == mg.n
    assert (back.ids == mg.ids).all()
    assert (back.counts == mg.counts).all()
    # empty state
    e = MisraGries.deserialize(cfg, MisraGries(cfg).serialize())
    assert e.n == 0 and len(e.ids) == 0 and e.err_bound == 0.0


def test_top_items_deterministic_order():
    mg = MisraGries(FreqItemsConfig(k=16))
    mg._combine(np.array([5, 3, 9], dtype=np.int64), np.array([7, 7, 2], dtype=np.int64))
    assert mg.top_items(3) == [(3, 7), (5, 7), (9, 2)]


def test_mg_spark_partitioning_invariant_guarantee(spark):
    """Through the distributed sketch_agg at two partition layouts, the
    deterministic bracket holds for every token of the exact histogram."""
    from exaloglog_paper_spark.ops import tokens as tok

    df = tok.token_table(spark, 2_000)
    exact = {
        r.t: r.c
        for r in df.select(F.explode("tokens").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n_total = sum(exact.values())
    spec = MisraGriesSpec(k=128)
    for parts in (2, 16):
        row = sketch_agg(
            df.repartition(parts), spec, token_array_ids("tokens")
        ).collect()[0]
        mg = spec.deserialize(bytes(row.sketch))
        assert mg.n == n_total == int(row.n_values)
        assert mg.err_bound <= n_total / (spec.cfg.k + 1)
        ids = np.array(sorted(exact), dtype=np.int64)
        cnt = np.array([exact[i] for i in ids], dtype=np.int64)
        est = mg.estimate(ids)
        assert (est <= cnt).all()
        assert (cnt - est <= mg.err_bound + 1e-9).all()


def test_bottomk_sample_byte_identity_and_ground_truth(spark):
    """Bottom-k sample states are byte-identical under partitioning (KMV
    algebra) and equal the numpy ground truth of the md5 priorities."""
    import hashlib

    n = 3_000
    spec = BottomKSampleSpec(k=16)
    dig = F.md5(F.col("id").cast("string"))
    df = spark.range(n).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.conv(F.substring(dig, 1, 8), 16, 10).cast("long").alias("prio_hi"),
        F.conv(F.substring(dig, 9, 8), 16, 10).cast("long").alias("prio_lo"),
    )
    states = {}
    for parts in (2, 32):
        rows = sketch_agg(
            df.repartition(parts), spec, md5_priority_values(), by=["g"]
        ).collect()
        states[parts] = {r.g: bytes(r.sketch) for r in rows}
    assert states[2] == states[32]
    # numpy ground truth: k smallest u64 prefixes of md5(str(i)) per group
    prios = {str(g): [] for g in range(4)}
    for i in range(n):
        h = hashlib.md5(str(i).encode()).hexdigest()
        prios[str(i % 4)].append(int(h[:16], 16))
    for g, lst in prios.items():
        want = np.array(sorted(lst)[:16], dtype=np.uint64)
        got = spec.deserialize(states[2][g])
        assert (got == want).all()


def test_streaming_heavy_hitters_guarantee(spark, tmp_path):
    """availableNow micro-batch stream: the final per-source MG output
    brackets the exact counts of every emitted item, and the guaranteed
    n/(k+1) presence threshold holds (micro-batches are just another
    merge schedule)."""
    from exaloglog_paper_spark.ops import tokens as tok
    from exaloglog_paper_spark.streaming.stateful import streaming_heavy_hitters

    src = str(tmp_path / "hh_src")
    tdf = tok.token_table(spark, 300, num_partitions=6)
    tdf.write.parquet(src)

    spec = MisraGriesSpec(k=64)
    stream = (
        spark.readStream.schema(tok.TOKEN_TABLE_SCHEMA)
        .parquet(src)
        .selectExpr("source AS key", "tokens")
        .groupBy("key")
    )
    out = streaming_heavy_hitters(stream, spec, topn=5)
    q = (
        out.writeStream.format("memory")
        .queryName("stream_hh")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select key, item, est, err_bound, n_values from ("
        "  select *, row_number() over "
        "  (partition by key, item order by n_values desc) as rn from stream_hh"
        ") where rn = 1"
    ).collect()
    assert rows
    exact = {
        (r.source, r.t): r.c
        for r in tdf.select("source", F.explode("tokens").alias("t"))
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n_per_key = {}
    for r in rows:
        n_per_key[r.key] = max(n_per_key.get(r.key, 0), r.n_values)
    for r in rows:
        if r.n_values < n_per_key[r.key]:
            continue  # superseded update in the memory sink
        true_c = exact[(r.key, r.item)]
        assert r.est <= true_c <= r.est + r.err_bound + 1e-9, (r.key, r.item)


def test_property_bracket_under_random_chunking():
    """Hypothesis: for arbitrary streams, capacities, and chunk layouts,
    the merged Misra-Gries summary brackets every item's true count."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        k=st.integers(1, 40),
        n=st.integers(0, 4000),
        vocab=st.integers(1, 200),
        n_chunks=st.integers(1, 9),
    )
    def run(seed, k, n, vocab, n_chunks):
        rng = np.random.default_rng(seed)
        stream = rng.integers(0, vocab, size=n).astype(np.int64)
        parts = [
            MisraGries(FreqItemsConfig(k)).add_ids(c)
            for c in np.array_split(stream, n_chunks)
        ]
        acc = parts[0].merge_many_(parts[1:])
        _assert_guarantee(acc, stream)

    run()


def test_weighted_add_equals_expanded_repeats():
    """Folding (id, weight) histograms is byte-identical to folding the
    expanded repeat stream batch-for-batch."""
    rng = np.random.default_rng(7)
    ids = rng.integers(0, 300, size=500).astype(np.int64)
    w = rng.integers(1, 9, size=500).astype(np.int64)
    a = MisraGries(FreqItemsConfig(k=32))
    b = MisraGries(FreqItemsConfig(k=32))
    for lo in range(0, 500, 100):
        a.add_ids(ids[lo : lo + 100], w[lo : lo + 100])
        b.add_ids(np.repeat(ids[lo : lo + 100], w[lo : lo + 100]))
    assert a.n == b.n
    assert (a.ids == b.ids).all() and (a.counts == b.counts).all()
    _assert_guarantee(a, np.repeat(ids, w))


def test_mg_through_salted_skew_path(spark):
    """Misra-Gries under sketch_agg_salted (the hot-source skew
    mitigation): per-group guarantee holds after the per-(group, salt)
    build + tree merge."""
    from exaloglog_paper_spark.ops import tokens as tok
    from exaloglog_paper_spark.ops.agg import sketch_agg_salted

    df = tok.token_table(spark, 1_500)
    spec = MisraGriesSpec(k=96)
    rows = sketch_agg_salted(
        df, spec, token_array_ids("tokens"), by=["source"], salt_col="doc_id",
        n_salts=8,
    ).collect()
    exact = {
        (r.source, r.t): r.c
        for r in df.select("source", F.explode("tokens").alias("t"))
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n_by_src = {}
    for (s, _t), c in exact.items():
        n_by_src[s] = n_by_src.get(s, 0) + c
    assert rows
    for r in rows:
        mg = spec.deserialize(bytes(r.sketch))
        assert mg.n == n_by_src[r.source]
        ids = np.array(
            sorted(t for (s, t) in exact if s == r.source), dtype=np.int64
        )
        cnt = np.array([exact[(r.source, t)] for t in ids], dtype=np.int64)
        est = mg.estimate(ids)
        assert (est <= cnt).all()
        assert (cnt - est <= mg.err_bound + 1e-9).all()


def test_streaming_layer_is_spec_generic_theta(spark, tmp_path):
    """streaming_distinct_sketch with the theta/KMV spec: the streaming
    per-key state equals the batch sketch_agg state byte-for-byte (KMV
    merges are exact), proving the stateful layer is spec-generic."""
    from exaloglog_paper_spark.ops import tokens as tok
    from exaloglog_paper_spark.ops.agg import sketch_agg, token_array_values
    from exaloglog_paper_spark.ops.specs import ThetaSpec
    from exaloglog_paper_spark.streaming.stateful import streaming_distinct_sketch

    src = str(tmp_path / "theta_src")
    tdf = tok.token_table(spark, 250, num_partitions=5)
    tdf.write.parquet(src)

    spec = ThetaSpec(k=512)
    stream = (
        spark.readStream.schema(tok.TOKEN_TABLE_SCHEMA)
        .parquet(src)
        .selectExpr("source AS key", "tokens")
        .groupBy("key")
    )
    out = streaming_distinct_sketch(stream, spec)
    q = (
        out.writeStream.format("memory")
        .queryName("stream_theta")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.key: r.estimate
        for r in spark.sql(
            "select key, estimate, n_values from ("
            "  select *, row_number() over "
            "  (partition by key order by n_values desc) rn from stream_theta"
            ") where rn = 1"
        ).collect()
    }
    batch = {
        r.source: spec.finalize(spec.deserialize(bytes(r.sketch)))
        for r in sketch_agg(
            tdf, spec, token_array_values("tokens"), by=["source"]
        ).collect()
    }
    assert got == batch
