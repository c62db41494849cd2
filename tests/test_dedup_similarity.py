"""Dedup and similarity operators: LSH recall, Jaccard verification,
exact-dedup behavior (engine-level; SQL parity is covered by the oracle
checker / driver)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # inject known exact + near duplicates
    dup = base.filter(F.col("doc_id") < 5).withColumn("doc_id", F.col("doc_id") + 100000)
    near = (
        base.filter((F.col("doc_id") >= 5) & (F.col("doc_id") < 10))
        .withColumn("doc_id", F.col("doc_id") + 200000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" extra tail words")))
    )
    return base.unionByName(dup).unionByName(near).cache()


def _words(df):
    return df.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("word"),
    ).filter(F.col("word") != "")


def test_exact_dedup_keeps_min_id(spark, docs):
    from exaloglog_paper_spark.ops.dedup import dedup_exact, exact_duplicate_groups

    groups = exact_duplicate_groups(docs).collect()
    assert len(groups) >= 5  # the 5 injected exact dups
    for g in groups:
        assert g.dup_count >= 2
    deduped = dedup_exact(docs)
    assert deduped.count() == docs.count() - sum(g.dup_count - 1 for g in groups)
    # keeper is the min doc_id: injected copies (id+100000) must be gone
    kept = {r.doc_id for r in deduped.select("doc_id").collect()}
    assert not any(i + 100000 in kept for i in range(5))


def test_minhash_lsh_finds_injected_duplicates(spark, docs):
    from exaloglog_paper_spark.ops.dedup import (
        jaccard_verified_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    words = _words(docs)
    sigs = minhash_signatures(words)
    cands = lsh_candidate_pairs(sigs)
    pairs = {(r.id_a, r.id_b) for r in cands.collect()}
    # exact duplicates always share every band
    for i in range(5):
        assert (i, i + 100000) in pairs, i
    # near duplicates (tiny tail appended -> high word-set jaccard)
    near_hits = sum((i, i + 200000) in pairs for i in range(5, 10))
    assert near_hits >= 3
    verified = jaccard_verified_pairs(words, cands, threshold=0.9)
    vp = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    for i in range(5):
        assert vp.get((i, i + 100000)) == 1.0


def test_simhash_hamming_on_injected(spark, docs):
    from exaloglog_paper_spark.ops.dedup import simhash_near_pairs, simhash_signatures

    sigs = simhash_signatures(_words(docs))
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_pairs(sigs).collect()}
    for i in range(5):
        assert pairs.get((i, i + 100000)) == 0  # identical word sets


def test_ivf_ann_recall_vs_bruteforce(spark):
    from exaloglog_paper_spark.ops.similarity import (
        cosine_topk,
        ivf_cosine_topk,
        train_ivf_centroids,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .cache()
    )
    queries = emb.filter(F.col("vec_id") < 5)
    cent = train_ivf_centroids(emb, n_centroids=16)
    assert cent.shape[1] == 64
    exact = cosine_topk(emb, queries, k=10)
    approx = ivf_cosine_topk(emb, queries, k=10, centroids=cent, nprobe=6)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, recall
    # determinism: retrain gives identical centroids
    cent2 = train_ivf_centroids(emb, n_centroids=16)
    assert (cent == cent2).all()


def test_lsh_ann_recall_vs_bruteforce(spark):
    from exaloglog_paper_spark.ops.similarity import cosine_topk, lsh_cosine_topk

    emb = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .cache()
    )
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=10)
    approx = lsh_cosine_topk(emb, queries, k=10, nbits=8, probe_hamming=3, dim=64)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, recall  # multi-probe sign-LSH @ 64d random vectors
    # scoring is identical where both return the same pair
    exact_sim = {(r.query_id, r.neighbor_id): r.cosine for r in exact.collect()}
    for r in approx.collect():
        if (r.query_id, r.neighbor_id) in exact_sim:
            assert exact_sim[(r.query_id, r.neighbor_id)] == r.cosine


def test_bucket_size_cap_bounds_degenerate_corpus(spark):
    """10k identical docs share every band bucket: uncapped, the band
    self-join would emit ~50M pairs x 4 bands. The max_bucket_size cap must
    bound output LINEARLY (hub-star edges, keeping the duplicate cluster
    connected) and bound runtime (VERDICT r1 item 4)."""
    import time

    from exaloglog_paper_spark.ops.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        simhash_near_pairs,
        simhash_signatures,
    )

    n = 10_000
    degen = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("the same exact document text").alias("text")
    )
    words = degen.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("word"),
    ).filter(F.col("word") != "")

    t0 = time.time()
    capped = lsh_candidate_pairs(minhash_signatures(words), max_bucket_size=100)
    rows = capped.collect()
    # linear star: hub (min id 0) -> every other member, NOT 50M pairs
    assert len(rows) == n - 1
    assert all(r.id_a == 0 for r in rows)
    elapsed = time.time() - t0
    assert elapsed < 60, f"degenerate corpus took {elapsed:.1f}s"

    sim_capped = simhash_near_pairs(simhash_signatures(words), max_bucket_size=100)
    sim_rows = sim_capped.collect()
    assert len(sim_rows) == n - 1  # identical docs: hamming 0 <= 3
    assert all(r.hamming == 0 for r in sim_rows)

    # sanity: a small NON-degenerate bucket still pairs under the same cap
    ok = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("another duplicate body").alias("text")
    )
    ok_words = ok.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("word"),
    ).filter(F.col("word") != "")
    pairs = lsh_candidate_pairs(minhash_signatures(ok_words), max_bucket_size=100)
    assert pairs.count() == 3  # C(3,2)


def test_capped_oracle_matches_engine_when_cap_binds(spark):
    """The DuckDB oracle models the bucket cap's hub-star semantics, so it
    must match the engine ON A CORPUS WHERE THE CAP ACTUALLY FIRES (the
    sf0.01 gate never exercises it — no bucket exceeds 2000 there)."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from exaloglog_paper_spark.ops.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = [(i, "the same mass duplicate body text") for i in range(120)]
    docs += [(200 + i, f"unique document number {i} with words w{i} x{i} y{i}") for i in range(20)]
    # a small near-dup pair that must survive via the normal (capped) join
    docs += [(400, "alpha beta gamma delta epsilon"), (401, "alpha beta gamma delta zeta")]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    pdf["source"] = "srcT"  # WORD_CTE selects it
    sdf = spark.createDataFrame(pdf)

    cap = 50
    words = sdf.select(
        "doc_id",
        __import__("pyspark.sql.functions", fromlist=["explode"]).explode(
            __import__("pyspark.sql.functions", fromlist=["split"]).split(
                __import__("pyspark.sql.functions", fromlist=["lower"]).lower(
                    __import__("pyspark.sql.functions", fromlist=["col"]).col("text")
                ),
                "[^a-z0-9]+",
            )
        ).alias("word"),
    ).filter("word != ''")
    got = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(
            minhash_signatures(words), max_bucket_size=cap
        ).collect()
    }

    con = duckdb.connect()
    con.register("documents", pdf)
    sql = f"""
        WITH {entry.WORD_CTE},
        {entry._MINHASH_SIG_CTES},
        {entry._capped_cand_ctes(cap)}
        SELECT id_a, id_b FROM cand
    """
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want
    # the mass-dup cluster arrives as a linear star, not 120*119/2 pairs
    star_edges = {p for p in got if p[0] == 0}
    assert len(star_edges) == 119
    assert (400, 401) in got  # normal candidates unaffected by the cap


def test_connected_components_chain_and_stars(spark):
    """Min-label propagation: a 6-hop chain (needs several rounds), two
    separate stars, and an isolated pair all resolve to min-id components."""
    from exaloglog_paper_spark.ops.dedup import connected_components

    edges = (
        [(f"c{i}", f"c{i+1}") for i in range(6)]         # chain c0..c6
        + [("s0", f"s{i}") for i in range(1, 5)]          # star at s0
        + [("t5", "t9"), ("t5", "t7")]                    # star at t5
        + [("x1", "x2")]
    )
    pairs = spark.createDataFrame(edges, "id_a string, id_b string")
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert all(comp[f"c{i}"] == "c0" for i in range(7))
    assert all(comp[f"s{i}"] == "s0" for i in range(5))
    assert comp["t5"] == comp["t7"] == comp["t9"] == "t5"
    assert comp["x1"] == comp["x2"] == "x1"
    # idempotence: rerunning on the same graph gives the same labels
    comp2 = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == comp2


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir path (durable parquet spill per round — the real-
    cluster mode where an executor loss must not kill the iteration) gives
    byte-identical components to the localCheckpoint default."""
    import os

    from exaloglog_paper_spark.ops.dedup import connected_components

    edges = [(f"c{i}", f"c{i+1}") for i in range(6)] + [("x1", "x2")]
    pairs = spark.createDataFrame(edges, "id_a string, id_b string")
    local = {r.id: r.component for r in connected_components(pairs).collect()}
    ckdir = str(tmp_path / "cc")
    durable = {
        r.id: r.component
        for r in connected_components(pairs, checkpoint_dir=ckdir).collect()
    }
    assert local == durable
    # the durable path really spilled its rounds to disk
    assert any(n.startswith("cc_round_") for n in os.listdir(ckdir))


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 64-hop chain: plain neighbor min-propagation needs ~64 rounds;
    pointer jumping (label-of-label shortcut) resolves distance 2^k-1 by
    round k, so 10 rounds suffice with margin."""
    from exaloglog_paper_spark.ops.dedup import connected_components

    edges = [(f"v{i:03d}", f"v{i+1:03d}") for i in range(64)]
    pairs = spark.createDataFrame(edges, "id_a string, id_b string")
    comp = {
        r.id: r.component
        for r in connected_components(pairs, max_iterations=10).collect()
    }
    assert set(comp.values()) == {"v000"}
    assert len(comp) == 65


def test_connected_components_nonconvergence_raises(spark):
    """A split component must never be returned silently (ADVICE r2): when
    the label table still changes at max_iterations, raise."""
    from exaloglog_paper_spark.ops.dedup import connected_components

    edges = [(f"v{i:03d}", f"v{i+1:03d}") for i in range(40)]
    pairs = spark.createDataFrame(edges, "id_a string, id_b string")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=1)


def test_jaccard_size_prefilter_is_result_preserving(spark, docs):
    """The min_sz >= t*max_sz prefilter in jaccard_verified_pairs is a
    necessary condition of J >= t, so enabling it must never change the
    output — checked against threshold=0 (prefilter disabled) on a corpus
    whose LSH candidates include size-dissimilar pairs the filter prunes."""
    from exaloglog_paper_spark.ops.dedup import (
        jaccard_verified_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    words = _words(docs)
    cands = lsh_candidate_pairs(minhash_signatures(words))
    t = 0.9
    filtered = jaccard_verified_pairs(words, cands, threshold=t)
    unfiltered = (
        jaccard_verified_pairs(words, cands, threshold=0.0)
        .filter(F.col("jaccard") >= t)
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in filtered.collect()}
    want = {(r.id_a, r.id_b): r.jaccard for r in unfiltered.collect()}
    assert got == want and len(got) >= 5
