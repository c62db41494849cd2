"""Round-6 optimization equivalence pins.

The r6 rewrites must be RESULT-IDENTICAL to the formulations they
replaced (the driver hashes query output against the frozen DuckDB
oracles). These tests pin each rewrite against an inline reference
implementation of the OLD form on data that exercises the tricky cases
(hex prefixes with the top bit set, oversized buckets, payload columns).
"""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from exaloglog_paper_spark.ops.dedup import (
    _cap_bucket_size,
    minhash_signatures,
)


def _words_df(spark, n_docs=60, words_per_doc=25):
    # deterministic synthetic words; multi-word docs exercise the min,
    # single-word docs pin the raw hash (a ~50% draw of top-bit-set hex
    # prefixes, where unflipped signed order would diverge from string
    # order)
    rows = [
        (d, f"w{(d * 7 + i * 13) % 97}")
        for d in range(n_docs)
        for i in range(words_per_doc)
    ]
    rows += [(1000 + d, f"solo{d}") for d in range(40)]
    return spark.createDataFrame(rows, "doc_id long, word string")


def test_minhash_int64_min_equals_string_min(spark):
    """min() over the sign-flipped int64 hex value must select the same
    word's hash as min() over the hex string — incl. values >= 2^63
    (top hex digit 8-f), where unflipped signed order would diverge."""
    words = _words_df(spark)
    fast = {r.doc_id: tuple(r)[1:] for r in minhash_signatures(words).collect()}
    # the pre-r6 string-min reference formulation
    mins = [
        F.min(
            F.substring(F.md5(F.concat(F.lit(f"{i}|"), F.col("word"))), 1, 16)
        ).alias(f"mh_{i}")
        for i in range(8)
    ]
    ref = {r.doc_id: tuple(r)[1:] for r in words.groupBy("doc_id").agg(*mins).collect()}
    assert fast == ref
    # sanity: the data actually exercises the sign-flip (some minima >= 2^63)
    assert any(any(int(h, 16) >= 1 << 63 for h in t) for t in ref.values())
    assert any(any(int(h, 16) < 1 << 63 for h in t) for t in ref.values())


def test_cap_bucket_size_matches_window_reference(spark):
    """The broadcast-join cap must keep the same rows and emit the same
    hub-star edges (incl. payload columns) as the pre-r6 window form."""
    rows = []
    # bucket A oversized (7 members), bucket B exactly at cap, C below
    for i in range(7):
        rows.append((100 + i, 0, "A", 10 + i))
    for i in range(3):
        rows.append((200 + i, 0, "B", 20 + i))
    rows.append((300, 1, "C", 30))
    ex = spark.createDataFrame(rows, "doc_id long, band int, bucket string, payload int")
    kept, star = _cap_bucket_size(
        ex, 3, ("band", "bucket"), "doc_id", ("payload",)
    )
    # reference: the old window formulation
    w = Window.partitionBy("band", "bucket")
    wo = Window.partitionBy("band", "bucket").orderBy("doc_id")
    sized = ex.withColumn("__bsz", F.count(F.lit(1)).over(w))
    ref_kept = sized.filter(F.col("__bsz") <= 3).drop("__bsz")
    ref_star = (
        sized.filter(F.col("__bsz") > 3)
        .select(
            F.first("doc_id").over(wo).alias("id_a"),
            F.col("doc_id").alias("id_b"),
            F.first("payload").over(wo).alias("a_payload"),
            F.col("payload").alias("b_payload"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    assert sorted(map(tuple, kept.collect())) == sorted(map(tuple, ref_kept.collect()))
    assert sorted(map(tuple, star.collect())) == sorted(map(tuple, ref_star.collect()))
    assert star.count() == 6  # |B|-1 star edges for the oversized bucket


def _cap_rows(spark):
    rows = []
    for i in range(7):
        rows.append((100 + i, 0, "A", 10 + i))
    for i in range(3):
        rows.append((200 + i, 0, "B", 20 + i))
    rows.append((300, 1, "C", 30))
    return spark.createDataFrame(
        rows, "doc_id long, band int, bucket string, payload int"
    )


def test_cap_bucket_size_empty_probe_skips_join(spark):
    """When no bucket exceeds the cap, the probe must return the input
    unchanged (identity kept, no star branch) — the scaffolding-skip fast
    path all four near-dup pipelines hit on cap-free data."""
    ex = _cap_rows(spark)
    kept, star = _cap_bucket_size(ex, 100, ("band", "bucket"), "doc_id", ("payload",))
    assert star is None
    assert kept is ex  # identity, not just equal rows: zero added plan nodes


def test_cap_bucket_size_probe_limit_fallback_matches(spark):
    """Above probe_limit the lazy shared-left-outer path runs; its rows must
    match the LocalRelation anti/inner path bit-for-bit."""
    ex = _cap_rows(spark)
    fast = _cap_bucket_size(ex, 3, ("band", "bucket"), "doc_id", ("payload",))
    lazy = _cap_bucket_size(
        ex, 3, ("band", "bucket"), "doc_id", ("payload",), probe_limit=0
    )
    for f, l in zip(fast, lazy):
        assert f.columns == l.columns
        assert sorted(map(tuple, f.collect())) == sorted(map(tuple, l.collect()))


def test_jaccard_verify_checkpoint_matches_persist_reference(spark):
    """The eager-localCheckpoint form of jaccard_verified_pairs (plan
    truncation for the three verification joins) must be row-identical to
    the pre-r6 persist formulation on data with real near-dup pairs."""
    from exaloglog_paper_spark.ops.dedup import jaccard_verified_pairs

    rows = []
    for d in range(30):
        base = [f"w{(d // 3) * 10 + k}" for k in range(10)]
        if d % 3 == 1:
            base[-1] = f"x{d}"  # near-dup of its group head (J = 9/11)
        if d % 3 == 2:
            base = [f"y{d}_{k}" for k in range(10)]  # unrelated
        rows += [(d, w) for w in base]
    words = spark.createDataFrame(rows, "doc_id long, word string")
    cands = spark.createDataFrame(
        [(a, b) for a in range(30) for b in range(a + 1, 30)],
        "id_a long, id_b long",
    )
    fast = sorted(
        map(tuple, jaccard_verified_pairs(words, cands, threshold=0.6).collect())
    )

    # pre-r6 reference: identical expressions, persist() boundaries
    cand_ids = (
        cands.select(F.col("id_a").alias("doc_id"))
        .unionByName(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    ws = (
        words.join(F.broadcast(cand_ids), "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.expr("collect_set(word) AS wset"))
        .withColumn("sz", F.expr("size(wset)"))
        .persist()
    )
    a = ws.selectExpr("doc_id AS id_a", "wset AS ws_a", "sz AS sz_a")
    b = ws.selectExpr("doc_id AS id_b", "wset AS ws_b", "sz AS sz_b")
    joined = cands.persist().join(a, "id_a").join(b, "id_b").filter(
        (F.col("sz_a") >= 0.6 * F.col("sz_b"))
        & (F.col("sz_b") >= 0.6 * F.col("sz_a"))
    )
    ref = sorted(
        map(
            tuple,
            joined.withColumn("inter", F.expr("size(array_intersect(ws_a, ws_b))"))
            .withColumn(
                "jaccard",
                F.round(
                    F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
                ),
            )
            .filter(F.col("jaccard") >= 0.6)
            .select("id_a", "id_b", "jaccard")
            .collect(),
        )
    )
    assert fast == ref and len(ref) > 0
