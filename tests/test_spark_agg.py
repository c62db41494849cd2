"""Distributed sketch aggregation tests: partitioning invariance (the key
distributed-correctness property — state equality no matter how rows are
split), grouped aggregation, salted path, estimate accuracy vs exact."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from exaloglog_paper_spark.ops import tokens as tok
from exaloglog_paper_spark.ops.agg import (
    ExaLogLogSpec,
    HyperLogLogSpec,
    hash64_values,
    sketch_agg,
    sketch_agg_salted,
    token_array_values,
    with_estimate,
)
from exaloglog_paper_spark.sketchlib.bitops import splitmix64
from exaloglog_paper_spark.sketchlib.exaloglog import ExaLogLog

N_ROWS = 400
SEED = 42


@pytest.fixture(scope="module")
def tdf(spark):
    return tok.token_table(spark, N_ROWS, seed=SEED, num_partitions=7).cache()


@pytest.fixture(scope="module")
def truth():
    return tok.exact_ground_truth(N_ROWS, seed=SEED)


def test_token_table_deterministic_under_partitioning(spark):
    a = tok.token_table(spark, 100, num_partitions=1).orderBy("doc_id").collect()
    b = tok.token_table(spark, 100, num_partitions=13).orderBy("doc_id").collect()
    assert a == b
    # n_tok invariant (FIXTURES.md F1) and pass-through bit-identity vs the
    # local generator (the per-row invariant from BASELINE.json input_hint)
    import numpy as np

    local = tok.generate_rows(np.arange(100, dtype=np.uint64))
    for row, (_, lrow) in zip(a, local.iterrows()):
        assert row.n_tok == len(row.tokens) == lrow.n_tok
        assert list(row.tokens) == list(lrow.tokens)
        assert row.doc_id == lrow.doc_id and row.source == lrow.source


def test_global_sketch_state_equals_local_build(spark, tdf, truth):
    """Distributed build (7 partitions, tree merge) must produce the exact
    register state of a single local build over the same values."""
    spec = ExaLogLogSpec(2, 20, 8)
    row = sketch_agg(tdf, spec, token_array_values("tokens")).collect()[0]
    # local reference build
    pdf = tok.generate_rows(np.arange(N_ROWS, dtype=np.uint64))
    flat = np.concatenate(pdf["tokens"].to_list()).astype(np.int64)
    local = ExaLogLog.create(2, 20, 8).add_hashes(splitmix64(flat.view(np.uint64)))
    assert bytes(row.sketch) == local.serialize()
    assert row.n_values == truth["total_tokens"]
    est = spec.finalize(spec.deserialize(bytes(row.sketch)))
    rse = spec.theoretical_rse()
    assert abs(est / truth["distinct_tokens"] - 1) < 3 * rse


def test_partitioning_invariance(spark):
    """Same data, different partition counts -> byte-identical sketch."""
    spec = ExaLogLogSpec(2, 20, 6)
    states = []
    for parts in [1, 3, 11]:
        df = tok.token_table(spark, 150, num_partitions=parts)
        row = sketch_agg(df, spec, token_array_values("tokens"), fanin=4).collect()[0]
        states.append(bytes(row.sketch))
    assert states[0] == states[1] == states[2]


def test_grouped_sketch_agg_per_source(spark, tdf, truth):
    spec = ExaLogLogSpec(2, 20, 8)
    out = sketch_agg(tdf, spec, token_array_values("tokens"), by=["source"])
    rows = {r.source: r for r in with_estimate(out, spec).collect()}
    assert set(rows) == set(truth["per_source"])
    rse = spec.theoretical_rse()
    for src, info in truth["per_source"].items():
        assert rows[src].n_values == info["total_tokens"]
        assert abs(rows[src].estimate / info["distinct_tokens"] - 1) < 4 * rse, src


def test_salted_agg_matches_mapside_agg(spark, tdf):
    """Salted shuffle path and map-side partial path give identical states."""
    spec = ExaLogLogSpec(2, 20, 8)
    a = {
        r.source: bytes(r.sketch)
        for r in sketch_agg(
            tdf, spec, token_array_values("tokens"), by=["source"]
        ).collect()
    }
    b = {
        r.source: bytes(r.sketch)
        for r in sketch_agg_salted(
            tdf, spec, token_array_values("tokens"), by=["source"],
            salt_col="doc_id", n_salts=5,
        ).collect()
    }
    assert a == b


def test_distinct_docs_via_jvm_xxhash(spark, tdf):
    """doc_id distinct count with hashing kept JVM-side (xxhash64 in codegen)."""
    spec = ExaLogLogSpec(2, 20, 10)
    hashed = tdf.select(F.xxhash64("doc_id").alias("h"))
    row = with_estimate(
        sketch_agg(hashed, spec, hash64_values("h")), spec
    ).collect()[0]
    assert abs(row.estimate / N_ROWS - 1) < 3 * spec.theoretical_rse()


def test_mixed_precision_union(spark, tdf):
    """Sketch tables built at different precisions combine via downsize +
    merge into exactly the state of a direct low-precision build (the
    reference's heterogeneous-merge semantics, distributed)."""
    from exaloglog_paper_spark.ops import functions as fx
    from exaloglog_paper_spark.ops.rollup import rollup_level

    half_a = tdf.filter(F.col("n_tok") % 2 == 0)
    half_b = tdf.filter(F.col("n_tok") % 2 == 1)
    hi = sketch_agg(half_a, ExaLogLogSpec(2, 20, 10), token_array_values("tokens"))
    lo = sketch_agg(half_b, ExaLogLogSpec(2, 20, 8), token_array_values("tokens"))
    hi_down = hi.select(
        fx.ell_downsize(F.col("sketch"), 2, 20, to_d=20, to_p=8).alias("sketch"),
        "n_values",
    )
    spec8 = ExaLogLogSpec(2, 20, 8)
    combined = rollup_level(
        hi_down.unionByName(lo.select("sketch", "n_values")), spec8, ()
    ).collect()[0]
    direct = sketch_agg(tdf, spec8, token_array_values("tokens")).collect()[0]
    assert bytes(combined.sketch) == bytes(direct.sketch)
    assert combined.n_values == direct.n_values


def test_facade_helpers(spark, tdf, truth):
    from exaloglog_paper_spark.ops import (
        approx_distinct,
        approx_distinct_tokens,
        approx_quantiles,
    )

    rows = {r.source: r for r in approx_distinct_tokens(tdf, by=["source"]).collect()}
    rse = ExaLogLogSpec(2, 20, 10).theoretical_rse()
    for src, info in truth["per_source"].items():
        assert abs(rows[src].estimate / info["distinct_tokens"] - 1) < 4 * rse
    g = approx_distinct(tdf, "doc_id").collect()[0]
    assert abs(g.estimate / N_ROWS - 1) < 3 * rse
    q = approx_quantiles(tdf, "n_tok", [0.25, 0.5, 0.75])
    assert q == sorted(q) and all(v > 0 for v in q)


def test_hll_spec_shares_kernel(spark, tdf, truth):
    spec = HyperLogLogSpec(p=10)
    assert (spec.cfg.t, spec.cfg.d) == (0, 0)
    row = with_estimate(
        sketch_agg(tdf, spec, token_array_values("tokens")), spec
    ).collect()[0]
    assert abs(row.estimate / truth["distinct_tokens"] - 1) < 3 * spec.theoretical_rse()


def test_null_group_keys_form_their_own_group(spark):
    """Null by-column values must group together (SQL semantics), not crash
    the Arrow dictionary-encode path or corrupt indexing (ADVICE r1)."""
    rows = [("a", 1), (None, 2), ("a", 3), (None, 4), ("b", 2), (None, 2)]
    df = spark.createDataFrame(rows, "k string, v long")
    out = sketch_agg(df, ExaLogLogSpec(2, 8, 8), hash64_values("v"), by=["k"]).collect()
    got = {r.k: r.n_values for r in out}
    assert got == {"a": 2, "b": 1, None: 3}
    # multi-column key path (pandas factorize) with nulls in either column
    df2 = spark.createDataFrame(
        [("a", None, 1), ("a", None, 2), (None, 5, 3), (None, 5, 3), ("a", 5, 9)],
        "k1 string, k2 int, v long",
    )
    out2 = sketch_agg(
        df2, ExaLogLogSpec(2, 8, 8), hash64_values("v"), by=["k1", "k2"]
    ).collect()
    got2 = {(r.k1, r.k2): r.n_values for r in out2}
    assert got2 == {("a", None): 2, (None, 5): 2, ("a", 5): 1}


def test_finalize_batch_matches_per_row(spark, tdf):
    """ExaLogLogSpec.finalize_batch (unpackbits + batched contribute +
    vectorized ML solve) must match per-row deserialize+estimate exactly."""
    spec = ExaLogLogSpec(2, 20, 8)
    rows = sketch_agg(tdf, spec, token_array_values("tokens"), by=["source"]).collect()
    states = [bytes(r.sketch) for r in rows]
    batch = spec.finalize_batch(states)
    per_row = [spec.finalize(spec.deserialize(s)) for s in states]
    np.testing.assert_allclose(batch, per_row, rtol=1e-12)
    # with_estimate must route through the batch path and agree too
    df = sketch_agg(tdf, spec, token_array_values("tokens"), by=["source"])
    got = {r.source: r.estimate for r in with_estimate(df, spec).collect()}
    want = {r.source: spec.finalize(spec.deserialize(bytes(r.sketch))) for r in rows}
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-9 * max(1.0, abs(want[k]))


def test_read_tokens_parquet_and_iceberg_gating(spark):
    """read_tokens: parquet path works and auto-detects; the Iceberg path
    (no jars in this sandbox) raises an actionable error, not a bare
    ClassNotFound."""
    import pytest as _pytest

    from exaloglog_paper_spark.ops import tokens as tok
    from exaloglog_paper_spark.ops.source import read_tokens

    path = tok.materialize_token_table("sf0.001")
    df = read_tokens(spark, path)  # auto -> parquet
    assert set(df.columns) >= {"doc_id", "tokens", "n_tok", "source"}
    assert df.count() > 0
    with _pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_tokens(spark, "catalog.db.tokens", fmt="iceberg")
    # 'auto' rule: only the catalog.db.table two-dot shape means Iceberg —
    # a single-dot relative name that doesn't exist yet is a parquet path
    # (so its error talks about the path, not a phantom catalog)
    from exaloglog_paper_spark.ops.source import resolve_format

    assert resolve_format("catalog.db.tokens") == "iceberg"
    assert resolve_format("tokens.v2") == "parquet"
    assert resolve_format("data/not_yet_written.parquet") == "parquet"
    assert resolve_format("tokens.v2", fmt="iceberg") == "iceberg"
    assert resolve_format("data/tokens.orc") == "orc"


def test_read_tokens_orc_roundtrip(spark, tmp_path):
    """ORC source: same table through read_tokens(fmt auto-detected) gives
    byte-identical sketch states to the parquet route (format-agnostic
    DataFrame path)."""
    from exaloglog_paper_spark.ops import tokens as tok
    from exaloglog_paper_spark.ops.agg import (
        ExaLogLogSpec,
        sketch_agg,
        token_array_values,
    )
    from exaloglog_paper_spark.ops.source import read_tokens

    ppath = tok.materialize_token_table("sf0.001")
    opath = str(tmp_path / "tokens.orc")
    spark.read.parquet(ppath).write.orc(opath)
    spec = ExaLogLogSpec(2, 20, 8)
    a = sketch_agg(read_tokens(spark, opath), spec, token_array_values("tokens")).collect()
    b = sketch_agg(read_tokens(spark, ppath), spec, token_array_values("tokens")).collect()
    assert bytes(a[0].sketch) == bytes(b[0].sketch)
    assert a[0].n_values == b[0].n_values


def test_partial_flush_is_byte_identical(spark, tdf):
    """Map-side memory bound: flushing the partial-state dict mid-task
    (flush_groups tiny) must produce byte-identical final states — early
    partials for a group merge exactly like partials from other tasks.

    The direct-builder phase feeds MULTIPLE Arrow batches with recurring
    groups so one 'task' genuinely emits several partials containing the
    SAME group (the flush check runs per input batch — a single-batch task
    never flushes mid-group and would leave the invariant unexercised)."""
    import pyarrow as pa

    from exaloglog_paper_spark.ops.agg import (
        _build_partials_batches,
        hash64_values,
        tree_merge,
    )

    spec = ExaLogLogSpec(2, 20, 8)

    # phase 1: direct builder, same group across many flushed emits
    ext = hash64_values("h")

    def mk(keys, vals):
        return pa.record_batch(
            {"k": pa.array(keys, pa.string()), "h": pa.array(vals, pa.int64())}
        )

    batches = [
        mk(["a", "b", "c"], [1, 2, 3]),
        mk(["a", "d"], [4, 5]),
        mk(["a", "b", "e"], [6, 7, 8]),
        mk(["f", "a"], [9, 10]),
    ]

    def collect(flush):
        out = {}
        emits = 0
        stamps = set()
        for rb in _build_partials_batches(
            iter(batches), spec, ext, ["k"], flush_groups=flush, num_partitions=4
        ):
            emits += 1
            for i in range(rb.num_rows):
                k = rb.column("k")[i].as_py()
                st = spec.deserialize(rb.column("sketch")[i].as_py())
                prev = out.get(k)
                out[k] = spec.merge(prev, st) if prev is not None else st
                stamps.add(rb.column("partition_id")[i].as_py())
        return (
            {k: spec.serialize(v) for k, v in out.items()},
            emits,
            stamps,
        )

    flushed, n_emits, stamps = collect(1)
    single, n_single, _ = collect(10**9)
    assert n_emits >= 4 and n_single == 1  # group 'a' spans several emits
    assert flushed == single  # byte-identical after merging
    # every emit carries a DISTINCT partition_id stamp so the tree merge's
    # pmod bucketing spreads a hot group's flushed partials across reducers
    assert len(stamps) == n_emits

    # phase 2: end-to-end through Spark + tree merge
    ext2 = token_array_values("tokens")

    def run(flush):
        def fn(bs):
            yield from _build_partials_batches(
                bs, spec, ext2, ["source"], flush_groups=flush, num_partitions=8
            )

        partials = tdf.mapInArrow(
            fn,
            schema="source string, sketch binary, n_values long, partition_id long, build_secs double",
        )
        out = tree_merge(partials, spec, by=["source"], num_partials=8)
        return {r.source: (bytes(r.sketch), r.n_values) for r in out.collect()}

    assert run(2) == run(65536)


def test_incremental_sketch_table_equals_full_rebuild(spark, tdf, tmp_path):
    """The versioned sketch table maintained by two incremental updates is
    byte-identical to a one-shot build over the union — per group and
    globally. This is the daily-increment production pattern: history is
    never rescanned (each update's input is only the increment's states)."""
    from exaloglog_paper_spark.ops.sketch_table import (
        latest_version,
        read_sketch_table,
        update_sketch_table,
    )

    spec = ExaLogLogSpec(2, 20, 8)
    day1 = tdf.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    day2 = tdf.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 1)
    for by in ([], ["source"]):
        tdir = str(tmp_path / f"sketches_{len(by)}")
        inc1 = sketch_agg(day1, spec, token_array_values("tokens"), by=by)
        update_sketch_table(spark, tdir, inc1, spec, by=by)
        inc2 = sketch_agg(day2, spec, token_array_values("tokens"), by=by)
        update_sketch_table(spark, tdir, inc2, spec, by=by)
        assert latest_version(tdir) == 2
        got = {
            tuple(r[c] for c in by): bytes(r.sketch)
            for r in read_sketch_table(spark, tdir).collect()
        }
        want = {
            tuple(r[c] for c in by): bytes(r.sketch)
            for r in sketch_agg(tdf, spec, token_array_values("tokens"), by=by).collect()
        }
        assert got == want, by


def test_sketch_table_prune_versions(spark, tdf, tmp_path):
    from exaloglog_paper_spark.ops.sketch_table import (
        latest_version,
        prune_versions,
        read_sketch_table,
        update_sketch_table,
    )

    spec = ExaLogLogSpec(2, 20, 8)
    tdir = str(tmp_path / "sk")
    for i in range(3):
        inc = sketch_agg(
            tdf.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i),
            spec, token_array_values("tokens"), by=["source"],
        )
        update_sketch_table(spark, tdir, inc, spec, by=["source"])
    assert latest_version(tdir) == 3
    before = {r.source: bytes(r.sketch) for r in read_sketch_table(spark, tdir).collect()}
    assert prune_versions(tdir, keep=1) == [1, 2]
    assert latest_version(tdir) == 3
    after = {r.source: bytes(r.sketch) for r in read_sketch_table(spark, tdir).collect()}
    assert before == after


def test_merge_state_tables_beyond_fanin_byte_identical(spark, tdf):
    """Folding MORE state tables than the tree fanin (the multi-day
    backfill shape) must stay byte-identical to a one-shot build — and the
    per-table partition stamps must spread first-level buckets (a constant
    stamp would funnel every state through one reducer). fanin=2 with 6
    tables exercises 3 tree levels cheaply."""
    from exaloglog_paper_spark.ops.sketch_table import merge_state_tables

    spec = ExaLogLogSpec(2, 20, 8)
    parts = [
        sketch_agg(
            tdf.filter(F.pmod(F.xxhash64("doc_id"), F.lit(6)) == i),
            spec, token_array_values("tokens"), by=["source"],
        )
        for i in range(6)
    ]
    got = {
        r.source: (bytes(r.sketch), r.n_values)
        for r in merge_state_tables(parts, spec, by=["source"], fanin=2).collect()
    }
    want = {
        r.source: (bytes(r.sketch), r.n_values)
        for r in sketch_agg(tdf, spec, token_array_values("tokens"), by=["source"]).collect()
    }
    assert got == want


def test_prune_versions_cleans_stale_scratch_dirs(spark, tdf, tmp_path):
    """A crashed partial write (v=N dir without _SUCCESS) below the newest
    complete version is a leftover no retry will overwrite — prune_versions
    must delete it, while an in-flight scratch dir NEWER than the latest
    complete version is left alone."""
    import os

    from exaloglog_paper_spark.ops.sketch_table import (
        latest_version,
        prune_versions,
        update_sketch_table,
    )

    spec = ExaLogLogSpec(2, 20, 8)
    tdir = str(tmp_path / "sk")
    for i in range(2):
        inc = sketch_agg(
            tdf.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == i),
            spec, token_array_values("tokens"), by=["source"],
        )
        update_sketch_table(spark, tdir, inc, spec, by=["source"])
    assert latest_version(tdir) == 2
    os.makedirs(os.path.join(tdir, "v=1.5crash", ), exist_ok=True)  # not vN-shaped: ignored
    os.rmdir(os.path.join(tdir, "v=1.5crash"))
    stale = os.path.join(tdir, "v=1")  # complete; will be pruned by keep=1
    crashed_old = os.path.join(tdir, "v=0")
    os.makedirs(crashed_old, exist_ok=True)  # incomplete below newest
    inflight = os.path.join(tdir, "v=3")
    os.makedirs(inflight, exist_ok=True)  # incomplete ABOVE newest: keep
    prune_versions(tdir, keep=1)
    assert not os.path.exists(stale)
    assert not os.path.exists(crashed_old)
    assert os.path.exists(inflight)
    assert latest_version(tdir) == 2


def test_sliding_window_state_fanout_equals_direct_window_build(spark):
    """The sliding-window query derives each window's sketch by MERGING the
    covering per-hour states (queries.sliding_window_distinct_users_bound).
    The merge algebra makes that derivation exact: for every window, the
    merged state must be byte-identical to a sketch built directly from
    that window's raw rows."""
    import pyspark.sql.functions as F

    from exaloglog_paper_spark.ops.agg import (
        ExaLogLogSpec,
        hash64_values,
        sketch_agg,
        tree_merge,
    )

    spec = ExaLogLogSpec(2, 20, 8)
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hour"),
            "user_id",
        )
        .withColumn("h", F.xxhash64("user_id"))
    )
    hour_states = sketch_agg(ev, spec, hash64_values("h"), by=["hour"])
    fanned = (
        hour_states.select(
            "hour", "sketch", "n_values", "build_secs",
            F.explode(F.sequence(F.lit(0), F.lit(5))).alias("k"),
        )
        .select(
            F.expr("timestampadd(HOUR, -k, hour)").alias("window_start"),
            "sketch", "n_values",
            F.col("k").cast("long").alias("partition_id"), "build_secs",
        )
    )
    merged = {
        r.window_start: bytes(r.sketch)
        for r in tree_merge(fanned, spec, by=["window_start"], num_partials=6).collect()
    }
    direct = (
        ev.select(
            "h", F.explode(F.sequence(F.lit(0), F.lit(5))).alias("k"), "hour"
        )
        .select(F.expr("timestampadd(HOUR, -k, hour)").alias("window_start"), "h")
    )
    direct_states = {
        r.window_start: bytes(r.sketch)
        for r in sketch_agg(direct, spec, hash64_values("h"), by=["window_start"]).collect()
    }
    assert merged.keys() == direct_states.keys() and len(merged) > 10
    assert all(merged[w] == direct_states[w] for w in merged)


def test_token_trigram_extractor_windows_and_order():
    """Sliding 3-token windows: never cross row boundaries, short rows
    contribute nothing, counts are exact, and the hash is order-sensitive
    (permuted trigrams get different hashes)."""
    import pyarrow as pa

    from exaloglog_paper_spark.ops.agg import token_trigram_values

    ex = token_trigram_values("tokens")
    batch = pa.record_batch(
        {
            "tokens": pa.array(
                [[1, 2, 3, 4], [5, 6], [], [7, 8, 9], [2, 1, 3]],
                pa.list_(pa.int32()),
            )
        }
    )
    tri, lengths = ex(batch)
    # rows contribute max(len-2, 0) windows: 2 + 0 + 0 + 1 + 1
    assert list(lengths) == [2, 0, 0, 1, 1]
    assert len(tri) == 4
    # (1,2,3) vs (2,1,3): same multiset, different order -> different hash
    assert tri[0] != tri[3]
    # all four windows distinct here
    assert len(np.unique(tri)) == 4
    # batch-splitting invariance: same rows in two batches, same hashes
    b1 = pa.record_batch({"tokens": pa.array([[1, 2, 3, 4]], pa.list_(pa.int32()))})
    tri1, _ = ex(b1)
    assert list(tri1) == list(tri[:2])


def test_property_trigram_extractor_matches_reference():
    """Hypothesis: for arbitrary ragged token tables the vectorized
    window extraction equals a per-row Python reference — same hashes,
    same per-row counts, any batch slicing."""
    import pyarrow as pa
    from hypothesis import given, settings, strategies as st

    from exaloglog_paper_spark.ops.agg import token_trigram_values
    from exaloglog_paper_spark.sketchlib.bitops import splitmix64

    def ref_hashes(rows):
        out = []
        for row in rows:
            h = splitmix64(np.asarray(row, dtype=np.int64).view(np.uint64))
            for i in range(max(len(row) - 2, 0)):
                acc = splitmix64(np.array([h[i]], dtype=np.uint64))
                acc = splitmix64(acc ^ h[i + 1])
                acc = splitmix64(acc ^ h[i + 2])
                out.append(int(acc[0]))
        return out

    @settings(max_examples=40, deadline=None)
    @given(
        rows=st.lists(
            st.lists(st.integers(0, 2**31 - 1), min_size=0, max_size=12),
            min_size=0,
            max_size=25,
        )
    )
    def run(rows):
        ex = token_trigram_values("tokens")
        batch = pa.record_batch({"tokens": pa.array(rows, pa.list_(pa.int32()))})
        tri, lengths = ex(batch)
        assert list(lengths) == [max(len(r) - 2, 0) for r in rows]
        assert [int(x) for x in tri] == ref_hashes(rows)

    run()
