"""Count sketch / AMS: linear merge byte-identity (the distributed
correctness contract — here structural: vector addition), unbiased
two-sided point estimates, F2 within the AMS bound, cross-sketch
inner-product join-size estimation, and partitioning invariance through
sketch_agg."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from exaloglog_paper_spark.ops.agg import hash64_values, sketch_agg
from exaloglog_paper_spark.ops.specs import CountSketchSpec
from exaloglog_paper_spark.sketchlib.bitops import splitmix64
from exaloglog_paper_spark.sketchlib.countsketch import (
    CountSketch,
    CountSketchConfig,
    join_size_error_bound,
)


def _zipf_hashes(n, n_keys, seed, s=1.2):
    """Zipf-weighted stream of n key-hashes over n_keys distinct keys;
    returns (hashes, exact_counts_by_key_id)."""
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(s, size=4 * n)
    ranks = ranks[ranks <= n_keys][:n].astype(np.int64)
    assert len(ranks) == n
    h = splitmix64(ranks.view(np.uint64))
    ids, counts = np.unique(ranks, return_counts=True)
    return h, ids, counts


def test_merge_equals_single_build_byte_identity():
    spec = CountSketchSpec(width=1024, depth=5)
    h, _, _ = _zipf_hashes(50_000, 10_000, seed=1)
    single = spec.add(spec.empty(), h)
    for n_chunks in (2, 3, 7, 16):
        parts = [spec.add(spec.empty(), c) for c in np.array_split(h, n_chunks)]
        folded = spec.merge_many(parts)
        assert spec.serialize(folded) == spec.serialize(single)
        # merge/merge_many accumulate in place (like CountMinSpec) — rebuild
        parts = [spec.add(spec.empty(), c) for c in np.array_split(h, n_chunks)]
        acc = parts[-1]
        for p in reversed(parts[:-1]):
            acc = spec.merge(acc, p)
        assert spec.serialize(acc) == spec.serialize(single)


def test_serialize_roundtrip_and_validation():
    spec = CountSketchSpec(width=256, depth=3)
    h, _, _ = _zipf_hashes(5_000, 1_000, seed=2)
    st = spec.add(spec.empty(), h)
    rt = spec.deserialize(spec.serialize(st))
    assert np.array_equal(rt.table, st.table)
    with pytest.raises(ValueError):
        spec.deserialize(b"\x00" * 17)
    with pytest.raises(ValueError):
        CountSketchConfig(width=1000)  # not a power of two
    with pytest.raises(ValueError):
        CountSketchConfig(width=256, depth=0)


def test_point_estimates_two_sided_and_within_bound():
    cfg = CountSketchConfig(width=8192, depth=5)
    cs = CountSketch(cfg)
    h, ids, counts = _zipf_hashes(200_000, 50_000, seed=3)
    cs.add_hashes(h)
    f2_exact = float(np.sum(counts.astype(np.float64) ** 2))
    est = cs.query(splitmix64(ids.view(np.uint64)))
    err = est - counts
    bound = 6.0 * np.sqrt(f2_exact / cfg.width)
    assert np.all(np.abs(err) <= bound), np.abs(err).max()
    # two-sided: unlike count-min, under- AND over-estimates occur
    assert (err < 0).any() and (err > 0).any()
    # unbiased: the mean signed error across many keys is ~0, far below
    # the per-key bound
    assert abs(err.mean()) < 0.05 * bound


def test_f2_estimate_within_bound_across_seeds():
    cfg = CountSketchConfig(width=8192, depth=5)
    spec = CountSketchSpec(width=cfg.width, depth=cfg.depth)
    rels = []
    for seed in range(10):
        h, _, counts = _zipf_hashes(100_000, 20_000, seed=50 + seed)
        st = spec.add(spec.empty(), h)
        f2_exact = float(np.sum(counts.astype(np.float64) ** 2))
        rel = spec.finalize(st) / f2_exact - 1.0
        assert abs(rel) <= cfg.rel_f2_error_bound, (seed, rel)
        rels.append(rel)
    # and the typical error is well inside the 6-sigma bound
    assert float(np.sqrt(np.mean(np.square(rels)))) <= np.sqrt(2.0 / cfg.width) * 2


def test_inner_product_estimates_join_size():
    cfg = CountSketchConfig(width=16384, depth=5)
    rng = np.random.default_rng(11)
    # relation A: 1..5000 each once (dimension side)
    a_keys = np.arange(1, 5001, dtype=np.int64)
    # relation B: zipf-ish fact side over the same key space
    b_keys = rng.integers(1, 5001, size=120_000, dtype=np.int64)
    join_exact = float(len(b_keys))  # every B row matches exactly one A key
    cs_a = CountSketch(cfg).add_hashes(splitmix64(a_keys.view(np.uint64)))
    cs_b = CountSketch(cfg).add_hashes(splitmix64(b_keys.view(np.uint64)))
    f2_a = float(len(a_keys))
    _, cb = np.unique(b_keys, return_counts=True)
    f2_b = float(np.sum(cb.astype(np.float64) ** 2))
    est = cs_a.inner_product(cs_b)
    bound = join_size_error_bound(cfg, f2_a, f2_b)
    assert abs(est - join_exact) <= bound, (est, join_exact, bound)
    assert bound < 0.2 * join_exact  # the bound itself is meaningfully tight


def test_weighted_add_matches_repeated_add():
    cfg = CountSketchConfig(width=512, depth=3)
    keys = np.arange(10, 50, dtype=np.int64)
    h = splitmix64(keys.view(np.uint64))
    counts = np.arange(1, 41, dtype=np.int64)
    a = CountSketch(cfg).add_hashes(h, counts)
    b = CountSketch(cfg).add_hashes(np.repeat(h, counts))
    assert np.array_equal(a.table, b.table)


def test_partitioning_invariance_through_sketch_agg(spark):
    """North-rule contract: merged distributed state byte-identical under
    any partition layout (structural here — linear merge)."""
    spec = CountSketchSpec(width=512, depth=3)
    df = (
        spark.range(20_000)
        .withColumn("h", F.xxhash64((F.col("id") % 700).cast("string")))
        .withColumn("g", (F.col("id") % 3).cast("string"))
    )
    states = {}
    for parts in (1, 4, 17):
        rows = sketch_agg(
            df.repartition(parts), spec, hash64_values("h"), by=["g"]
        ).collect()
        states[parts] = {r.g: bytes(r.sketch) for r in rows}
    assert states[1] == states[4] == states[17]


def test_streaming_layer_is_spec_generic_countsketch(spark, tmp_path):
    """streaming_distinct_sketch with the count-sketch spec: the streaming
    per-key F2 estimate equals the batch sketch_agg result exactly (linear
    merges are byte-identical), proving the stateful layer stays
    spec-generic for the frequency-moment state too."""
    from exaloglog_paper_spark.ops import tokens as tok
    from exaloglog_paper_spark.ops.agg import sketch_agg, token_array_values
    from exaloglog_paper_spark.ops.specs import CountSketchSpec
    from exaloglog_paper_spark.streaming.stateful import streaming_distinct_sketch

    src = str(tmp_path / "cs_src")
    tdf = tok.token_table(spark, 250, num_partitions=5)
    tdf.write.parquet(src)

    spec = CountSketchSpec(width=512, depth=3)
    stream = (
        spark.readStream.schema(tok.TOKEN_TABLE_SCHEMA)
        .parquet(src)
        .selectExpr("source AS key", "tokens")
        .groupBy("key")
    )
    out = streaming_distinct_sketch(stream, spec)
    q = (
        out.writeStream.format("memory")
        .queryName("stream_cs")
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
            "  (partition by key order by n_values desc) rn from stream_cs"
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


def test_property_linearity_under_random_chunking():
    """Hypothesis: for arbitrary streams, configs, and chunk layouts
    (including empty chunks and the chunked 128k hot path's boundaries),
    the folded table is byte-identical to the single build, and queries
    on the union equal queries on the sum of per-chunk sketches (true
    linearity: sketch(A) + sketch(B) == sketch(A ++ B))."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        width_log2=st.integers(3, 10),
        depth=st.integers(1, 6),
        n=st.integers(0, 5000),
        vocab=st.integers(1, 500),
        n_chunks=st.integers(1, 9),
    )
    def run(seed, width_log2, depth, n, vocab, n_chunks):
        rng = np.random.default_rng(seed)
        stream = rng.integers(0, vocab, size=n).astype(np.int64)
        h = splitmix64(stream.view(np.uint64))
        cfg = CountSketchConfig(1 << width_log2, depth)
        single = CountSketch(cfg).add_hashes(h)
        acc = CountSketch(cfg)
        for c in np.array_split(h, n_chunks):
            acc.merge_(CountSketch(cfg).add_hashes(c))
        assert np.array_equal(acc.table, single.table)

    run()


def test_hot_path_chunk_boundary_invisible():
    """The 128k cache-residency chunking inside add_hashes is invisible:
    one call spanning the boundary equals two manual sub-calls equals the
    weighted-histogram form, byte-for-byte."""
    cfg = CountSketchConfig(width=2048, depth=4)
    rng = np.random.default_rng(13)
    stream = rng.integers(0, 5000, size=131072 + 7001, dtype=np.int64)
    h = splitmix64(stream.view(np.uint64))
    one = CountSketch(cfg).add_hashes(h)
    two = CountSketch(cfg).add_hashes(h[:100_000]).add_hashes(h[100_000:])
    assert np.array_equal(one.table, two.table)
    ids, cnt = np.unique(stream, return_counts=True)
    hist = CountSketch(cfg).add_hashes(
        splitmix64(ids.view(np.uint64)), cnt.astype(np.int64)
    )
    assert np.array_equal(one.table, hist.table)


def test_f2_and_inner_product_accumulate_in_float64():
    """Counters big enough that an int64 sum of squares would wrap must
    still produce positive, sane estimates (float64 accumulation)."""
    cfg = CountSketchConfig(width=256, depth=3)
    cs = CountSketch(cfg)
    # plant counters whose squares sum past 2^63
    cs.table[:, :64] = np.int64(2) ** 31
    f2 = cs.f2()
    assert f2 == 64 * float(2**31) ** 2  # exact in float64
    assert f2 > 0
    ip = cs.inner_product(cs)
    assert ip == f2


@pytest.mark.parametrize("overlap", [0.0, 0.3, 1.0])
def test_inner_product_across_overlap_fractions(overlap):
    """Join-size estimates stay within the AMS bound as the key overlap
    between the two relations sweeps from disjoint (J=0) to full."""
    cfg = CountSketchConfig(width=16384, depth=5)
    rng = np.random.default_rng(int(overlap * 100) + 7)
    n_keys = 4000
    a_keys = np.arange(1, n_keys + 1, dtype=np.int64)
    # B draws only from the overlapping prefix of A's key space (or a
    # disjoint range when overlap == 0)
    n_shared = int(n_keys * overlap)
    if n_shared:
        b_keys = rng.integers(1, n_shared + 1, size=80_000, dtype=np.int64)
        join_exact = float(len(b_keys))
    else:
        b_keys = rng.integers(n_keys + 1, 2 * n_keys, size=80_000, dtype=np.int64)
        join_exact = 0.0
    cs_a = CountSketch(cfg).add_hashes(splitmix64(a_keys.view(np.uint64)))
    cs_b = CountSketch(cfg).add_hashes(splitmix64(b_keys.view(np.uint64)))
    _, cb = np.unique(b_keys, return_counts=True)
    f2_b = float(np.sum(cb.astype(np.float64) ** 2))
    bound = join_size_error_bound(cfg, float(n_keys), f2_b)
    assert abs(cs_a.inner_product(cs_b) - join_exact) <= bound


def test_countsketch_through_salted_skew_path(spark):
    """Count-sketch under sketch_agg_salted (the hot-source skew
    mitigation): linearity makes the salted per-(group, salt) build +
    tree merge byte-identical to the direct grouped build."""
    from exaloglog_paper_spark.ops import tokens as tok
    from exaloglog_paper_spark.ops.agg import sketch_agg_salted, token_array_values

    df = tok.token_table(spark, 800)
    spec = CountSketchSpec(width=512, depth=3)
    salted = {
        r.source: bytes(r.sketch)
        for r in sketch_agg_salted(
            df, spec, token_array_values("tokens"), by=["source"],
            salt_col="doc_id", n_salts=8,
        ).collect()
    }
    direct = {
        r.source: bytes(r.sketch)
        for r in sketch_agg(
            df, spec, token_array_values("tokens"), by=["source"]
        ).collect()
    }
    assert salted == direct
