"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` maps every
implemented operator to a (spark, sf_dir) callable; ``oracle_sql()`` gives
DuckDB-equivalent ANSI SQL for each oracle-checkable query (sketch estimates
are verified via in-query published-error-bound flags the oracle asserts —
see exaloglog_paper_spark/ops/queries.py docstring).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from exaloglog_paper_spark.ops import queries as Q  # noqa: E402
from exaloglog_paper_spark.ops import tokens as _tok  # noqa: E402

# The synthetic pre-tokenized table (BASELINE.json input_hint) is a pure
# function of the row index; materializing it to parquet lets DuckDB read the
# exact same rows and verify the token-pipeline queries independently.
TOKENS_PQ = _tok.materialized_table_path("sf0.01")

from exaloglog_paper_spark.ops import multimodal as _mm  # noqa: E402

_MEDIA_PQ = _mm.materialized_media_path()

WORD_CTE = """
words AS (
    SELECT doc_id, source, w AS word
    FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(w)
    WHERE w <> ''
)
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-source ExaLogLog distinct-token estimates on the
    synthetic pre-tokenized sequence table at sf0.001."""
    return Q.ell_distinct_tokens_per_source(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_distinct_words_per_source": Q.exact_distinct_words_per_source,
        "q1_pricing_summary": Q.q1_pricing_summary,
        "heavy_hitters_words_exact": Q.heavy_hitters_words_exact,
        "rollup_distinct_words": Q.rollup_distinct_words,
        "ell_distinct_words_per_source_bound": Q.ell_distinct_words_per_source_bound,
        "hll_distinct_words_global_bound": Q.hll_distinct_words_global_bound,
        "ell_distinct_tokens_per_source": Q.ell_distinct_tokens_per_source,
        "martingale_distinct_tokens_bound": Q.martingale_distinct_tokens_bound,
        "martingale_partition_stream_bound": Q.martingale_partition_stream_bound,
        "token_passthrough_invariant": Q.token_passthrough_invariant,
        "salted_vs_mapside_consistency": Q.salted_vs_mapside_consistency,
        "sketch_rollup_tokens": Q.sketch_rollup_tokens,
        "sketch_cube_words": Q.sketch_cube_words,
        "sparse_distinct_tokens_per_doc_sample": Q.sparse_distinct_tokens_per_doc_sample,
        "hourly_event_stats": Q.hourly_event_stats,
        "sliding_window_distinct_users_bound": Q.sliding_window_distinct_users_bound,
        "intersection_distinct_words_bound": Q.intersection_distinct_words_bound,
        "top_customers_by_revenue": Q.top_customers_by_revenue,
        "user_sessionization": Q.user_sessionization,
        "kll_nchars_quantiles_bound": Q.kll_nchars_quantiles_bound,
        "tdigest_nchars_quantiles_bound": Q.tdigest_nchars_quantiles_bound,
        "cms_heavy_hitters_bound": Q.cms_heavy_hitters_bound,
        "bloom_membership_bound": Q.bloom_membership_bound,
        "dedup_exact_summary": Q.dedup_exact_summary,
        "minhash_lsh_candidates": Q.minhash_lsh_candidates,
        "mass_duplicate_clusters": Q.mass_duplicate_clusters,
        "simhash_near_duplicates": Q.simhash_near_duplicates,
        "jaccard_near_duplicates": Q.jaccard_near_duplicates,
        "near_duplicate_groups": Q.near_duplicate_groups,
        "near_duplicate_keep_list": Q.near_duplicate_keep_list,
        "ngram_jaccard_near_duplicates": Q.ngram_jaccard_near_duplicates,
        "token_count_summary": Q.token_count_summary,
        "embedding_near_duplicates": Q.embedding_near_duplicates,
        "ann_cosine_topk": Q.ann_cosine_topk,
        "ivf_ann_recall_bound": Q.ivf_ann_recall_bound,
        "lsh_ann_recall_bound": Q.lsh_ann_recall_bound,
        "multimodal_media_stats": Q.multimodal_media_stats,
        "streaming_batch_parity": Q.streaming_batch_parity,
        "checkpoint_resume_invariant": Q.checkpoint_resume_invariant,
        "incremental_update_invariant": Q.incremental_update_invariant,
        "snapshot_time_travel_invariant": Q.snapshot_time_travel_invariant,
        "text_quality_by_source": Q.text_quality_by_source,
        "lang_id_confusion": Q.lang_id_confusion,
        "doc_fingerprints": Q.doc_fingerprints,
        "source_overlap_matrix_bound": Q.source_overlap_matrix_bound,
        "contamination_ngram_overlap": Q.contamination_ngram_overlap,
        "stable_sample_digest": Q.stable_sample_digest,
        "mg_heavy_hitter_tokens_bound": Q.mg_heavy_hitter_tokens_bound,
        "kll_ntok_quantiles_by_source_bound": Q.kll_ntok_quantiles_by_source_bound,
        "bottomk_doc_sample": Q.bottomk_doc_sample,
        "priority_sample_docs_bound": Q.priority_sample_docs_bound,
        "bloom_join_parity": Q.bloom_join_parity,
        "tail_exact_ntok_quantiles": Q.tail_exact_ntok_quantiles,
        "theta_set_ops_words_bound": Q.theta_set_ops_words_bound,
        "countsketch_hh_tokens_bound": Q.countsketch_hh_tokens_bound,
        "countsketch_f2_tokens_bound": Q.countsketch_f2_tokens_bound,
        "join_size_estimate_bound": Q.join_size_estimate_bound,
        "token_profile_by_source": Q.token_profile_by_source,
        "trigram_novelty_bound": Q.trigram_novelty_bound,
        "f2_rollup_tokens_bound": Q.f2_rollup_tokens_bound,
        "sliding_window_heavy_users_bound": Q.sliding_window_heavy_users_bound,
    }


def _simhash_oracle_sql(cap: int | None = None) -> str:
    """DuckDB twin of ops/dedup.simhash_signatures + simhash_near_pairs
    INCLUDING the bucket-size cap's hub-star edges: bit b of h(word) =
    bit (b % 4), LSB-first, of md5 hex nibble (b // 4)."""
    if cap is None:
        from exaloglog_paper_spark.ops.dedup import MAX_BUCKET_SIZE as cap
    nib = "strpos('0123456789abcdef', substr(md5(word), {p}, 1)) - 1"
    sums = ",\n                ".join(
        f"sum(CASE WHEN (({nib.format(p=b // 4 + 1)}) >> {b % 4}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) AS s{b}"
        for b in range(64)
    )
    chunk_exprs = ",\n                ".join(
        " + ".join(
            f"(CASE WHEN s{16 * c + j} > 0 THEN 1 ELSE 0 END << {j})" for j in range(16)
        )
        + f" AS chunk_{c}"
        for c in range(4)
    )
    hamming = " + ".join(f"bit_count(xor(ca_{i}, cb_{i}))" for i in range(4))
    return f"""
        WITH {WORD_CTE},
        sums AS (
            SELECT doc_id,
                {sums}
            FROM words GROUP BY doc_id
        ),
        chunks AS (
            SELECT doc_id,
                {chunk_exprs}
            FROM sums
        ),
        bands AS (
            SELECT doc_id, chunk_0, chunk_1, chunk_2, chunk_3, band,
                   CASE band WHEN 0 THEN chunk_0 WHEN 1 THEN chunk_1
                             WHEN 2 THEN chunk_2 ELSE chunk_3 END AS chunk
            FROM chunks, unnest([0, 1, 2, 3]) AS t(band)
        ),
        sized AS (
            SELECT *, count(*) OVER (PARTITION BY band, chunk) AS bsz FROM bands
        ),
        kept AS (SELECT * FROM sized WHERE bsz <= {cap}),
        over_b AS (SELECT * FROM sized WHERE bsz > {cap}),
        hubs AS (
            SELECT band, chunk, min(doc_id) AS hub FROM over_b GROUP BY band, chunk
        ),
        hubrows AS (
            SELECT o.band, o.chunk, o.doc_id AS hub,
                   o.chunk_0 AS h0, o.chunk_1 AS h1, o.chunk_2 AS h2, o.chunk_3 AS h3
            FROM over_b o JOIN hubs h
              ON o.band = h.band AND o.chunk = h.chunk AND o.doc_id = h.hub
        ),
        star AS (
            SELECT hr.hub AS id_a, o.doc_id AS id_b,
                   hr.h0 AS ca_0, hr.h1 AS ca_1, hr.h2 AS ca_2, hr.h3 AS ca_3,
                   o.chunk_0 AS cb_0, o.chunk_1 AS cb_1,
                   o.chunk_2 AS cb_2, o.chunk_3 AS cb_3
            FROM over_b o JOIN hubrows hr ON o.band = hr.band AND o.chunk = hr.chunk
            WHERE o.doc_id <> hr.hub
        ),
        cand AS (
            SELECT DISTINCT * FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.chunk_0 AS ca_0, a.chunk_1 AS ca_1,
                       a.chunk_2 AS ca_2, a.chunk_3 AS ca_3,
                       b.chunk_0 AS cb_0, b.chunk_1 AS cb_1,
                       b.chunk_2 AS cb_2, b.chunk_3 AS cb_3
                FROM kept a JOIN kept b
                  ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
                UNION ALL SELECT * FROM star
            )
        )
        SELECT id_a, id_b, ({hamming})::BIGINT AS hamming
        FROM cand WHERE ({hamming}) <= 3
    """



# shared DuckDB CTE fragments for the MinHash/LSH oracles — including the
# bucket-size cap + hub-star edges, so the oracles model the ENGINE'S
# semantics at any scale, not just scales where no bucket exceeds the cap
from exaloglog_paper_spark.ops.dedup import MAX_BUCKET_SIZE as _LSH_CAP  # noqa: E402

_MINHASH_SIG_CTES = """mh AS (
                SELECT doc_id, i,
                       min(substr(md5(i::VARCHAR || '|' || word), 1, 16)) AS h
                FROM words CROSS JOIN range(8) t(i)
                GROUP BY doc_id, i
            ),
            sig AS (
                SELECT doc_id,
                       max(CASE WHEN i = 0 THEN h END) AS mh_0,
                       max(CASE WHEN i = 1 THEN h END) AS mh_1,
                       max(CASE WHEN i = 2 THEN h END) AS mh_2,
                       max(CASE WHEN i = 3 THEN h END) AS mh_3,
                       max(CASE WHEN i = 4 THEN h END) AS mh_4,
                       max(CASE WHEN i = 5 THEN h END) AS mh_5,
                       max(CASE WHEN i = 6 THEN h END) AS mh_6,
                       max(CASE WHEN i = 7 THEN h END) AS mh_7
                FROM mh GROUP BY doc_id
            ),
            bands AS (
                SELECT doc_id, 0 AS band, md5(mh_0 || ',' || mh_1) AS bucket FROM sig
                UNION ALL SELECT doc_id, 1, md5(mh_2 || ',' || mh_3) FROM sig
                UNION ALL SELECT doc_id, 2, md5(mh_4 || ',' || mh_5) FROM sig
                UNION ALL SELECT doc_id, 3, md5(mh_6 || ',' || mh_7) FROM sig
            )"""


def _capped_cand_ctes(cap: int = _LSH_CAP) -> str:
    """bands -> cand: all-pairs within buckets <= cap, hub-star edges for
    oversized buckets (mirrors ops/dedup._cap_bucket_size exactly)."""
    return f"""sized AS (
                SELECT doc_id, band, bucket,
                       count(*) OVER (PARTITION BY band, bucket) AS bsz
                FROM bands
            ),
            kept AS (SELECT doc_id, band, bucket FROM sized WHERE bsz <= {cap}),
            over_b AS (SELECT doc_id, band, bucket FROM sized WHERE bsz > {cap}),
            hubs AS (
                SELECT band, bucket, min(doc_id) AS hub
                FROM over_b GROUP BY band, bucket
            ),
            star AS (
                SELECT h.hub AS id_a, o.doc_id AS id_b
                FROM over_b o JOIN hubs h USING (band, bucket)
                WHERE o.doc_id <> h.hub
            ),
            cand AS (
                SELECT DISTINCT id_a, id_b FROM (
                    SELECT a.doc_id AS id_a, b.doc_id AS id_b
                    FROM kept a JOIN kept b
                      ON a.band = b.band AND a.bucket = b.bucket
                     AND a.doc_id < b.doc_id
                    UNION ALL SELECT id_a, id_b FROM star
                )
            )"""


_JACCARD_TAIL = """wsets AS (SELECT DISTINCT doc_id, word FROM words),
            sizes AS (SELECT doc_id, count(*) AS sz FROM wsets GROUP BY doc_id),
            inter AS (
                SELECT c.id_a, c.id_b, count(*) AS i
                FROM cand c
                JOIN wsets wa ON wa.doc_id = c.id_a
                JOIN wsets wb ON wb.doc_id = c.id_b AND wb.word = wa.word
                GROUP BY c.id_a, c.id_b
            )
            SELECT i2.id_a, i2.id_b,
                   round(i2.i / (sa.sz + sb.sz - i2.i), 6) AS jaccard
            FROM inter i2
            JOIN sizes sa ON sa.doc_id = i2.id_a
            JOIN sizes sb ON sb.doc_id = i2.id_b
            WHERE round(i2.i / (sa.sz + sb.sz - i2.i), 6) >= 0.8"""

# same verification as _JACCARD_TAIL but packaged as a `pairs` CTE for
# downstream graph queries (connected components)
_JACCARD_PAIRS_CTE = """wsets AS (SELECT DISTINCT doc_id, word FROM words),
            sizes AS (SELECT doc_id, count(*) AS sz FROM wsets GROUP BY doc_id),
            inter AS (
                SELECT c.id_a, c.id_b, count(*) AS i
                FROM cand c
                JOIN wsets wa ON wa.doc_id = c.id_a
                JOIN wsets wb ON wb.doc_id = c.id_b AND wb.word = wa.word
                GROUP BY c.id_a, c.id_b
            ),
            pairs AS (
                SELECT i2.id_a, i2.id_b
                FROM inter i2
                JOIN sizes sa ON sa.doc_id = i2.id_a
                JOIN sizes sb ON sb.doc_id = i2.id_b
                WHERE round(i2.i / (sa.sz + sb.sz - i2.i), 6) >= 0.8
            )"""

_SHINGLE_CTE = """doc_ws AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   w -> w <> '') AS ws
                FROM documents
            ),
            words AS (
                SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS word
                FROM doc_ws, unnest(range(1, len(ws) - 1)) AS t(i)
                WHERE len(ws) >= 3
            )"""


def oracle_sql() -> dict[str, str]:
    # ensure the parquet twin exists even if the driver evaluates oracles
    # before (or without) running the Spark queries
    _tok.materialize_token_table("sf0.01")
    _mm.materialize_media_table()
    return {
        "simhash_near_duplicates": _simhash_oracle_sql(),
        "ell_distinct_tokens_per_source": f"""
            WITH tt AS (SELECT * FROM read_parquet('{TOKENS_PQ}')),
            ex AS (
                SELECT source, count(DISTINCT t) AS exact_distinct_tokens
                FROM (SELECT source, unnest(tokens) AS t FROM tt) GROUP BY source
            ),
            tot AS (
                SELECT source, sum(n_tok)::BIGINT AS total_tokens FROM tt GROUP BY source
            )
            SELECT tot.source AS source, total_tokens, exact_distinct_tokens,
                   TRUE AS within_bound
            FROM tot JOIN ex USING (source)
        """,
        "martingale_distinct_tokens_bound": f"""
            WITH tt AS (SELECT * FROM read_parquet('{TOKENS_PQ}')),
            ex AS (
                SELECT source, count(DISTINCT t) AS exact_distinct_tokens
                FROM (SELECT source, unnest(tokens) AS t FROM tt) GROUP BY source
            ),
            tot AS (
                SELECT source, sum(n_tok)::BIGINT AS total_tokens FROM tt GROUP BY source
            )
            SELECT tot.source AS source, total_tokens, exact_distinct_tokens,
                   TRUE AS martingale_within_bound
            FROM tot JOIN ex USING (source)
            ORDER BY source
        """,
        "martingale_partition_stream_bound": f"""
            WITH tt AS (
                SELECT *,
                       ((strpos('0123456789abcdef', substr(md5(doc_id), 1, 1))
                         - 1) % 8)::INTEGER AS bucket
                FROM read_parquet('{TOKENS_PQ}')
            ),
            ex AS (
                SELECT bucket, count(DISTINCT t) AS exact_distinct_tokens
                FROM (SELECT bucket, unnest(tokens) AS t FROM tt) GROUP BY bucket
            ),
            tot AS (
                SELECT bucket, sum(n_tok)::BIGINT AS total_tokens
                FROM tt GROUP BY bucket
            )
            SELECT tot.bucket AS bucket, total_tokens, exact_distinct_tokens,
                   TRUE AS martingale_within_bound
            FROM tot JOIN ex USING (bucket)
            ORDER BY bucket
        """,
        "sketch_rollup_tokens": f"""
            WITH tt AS (SELECT * FROM read_parquet('{TOKENS_PQ}')),
            ex AS (
                SELECT source, grouping(source)::INT AS level,
                       count(DISTINCT t) AS exact_distinct_tokens
                FROM (SELECT source, unnest(tokens) AS t FROM tt)
                GROUP BY ROLLUP(source)
            ),
            tot AS (
                SELECT source, grouping(source)::INT AS level,
                       sum(n_tok)::BIGINT AS total_tokens
                FROM tt GROUP BY ROLLUP(source)
            )
            SELECT tot.source AS source, tot.level AS level, total_tokens,
                   exact_distinct_tokens, TRUE AS within_bound
            FROM tot JOIN ex
              ON tot.source IS NOT DISTINCT FROM ex.source AND tot.level = ex.level
        """,
        "sketch_cube_words": f"""
            WITH words AS (
                SELECT source, lang, w AS word
                FROM documents,
                     unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(w)
                WHERE w <> ''
            )
            SELECT source, lang, grouping(source, lang)::INT AS gid,
                   count(word) AS total_words,
                   count(DISTINCT word) AS exact_distinct_words,
                   TRUE AS within_bound
            FROM words GROUP BY CUBE(source, lang)
        """,
        "salted_vs_mapside_consistency": f"""
            SELECT count(DISTINCT source)::BIGINT AS sources,
                   TRUE AS states_identical
            FROM read_parquet('{TOKENS_PQ}')
        """,
        "sparse_distinct_tokens_per_doc_sample": f"""
            SELECT count(*) AS "rows", 0::BIGINT AS rows_outside_2pct
            FROM read_parquet('{TOKENS_PQ}')
            WHERE doc_id < 'doc-0000000200'
        """,
        "token_passthrough_invariant": f"""
            SELECT count(*) AS "rows",
                   sum(CASE WHEN n_tok <> len(tokens) THEN 1 ELSE 0 END)::BIGINT AS bad_len,
                   0::BIGINT AS bad_tokens
            FROM read_parquet('{TOKENS_PQ}')
        """,
        "exact_distinct_words_per_source": f"""
            WITH {WORD_CTE}
            SELECT source,
                   count(DISTINCT word) AS distinct_words,
                   count(word) AS total_words
            FROM words GROUP BY source
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 3) AS sum_qty,
                   round(sum(l_extendedprice), 3) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 3) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "heavy_hitters_words_exact": f"""
            WITH {WORD_CTE}
            SELECT word, count(*) AS cnt
            FROM words GROUP BY word
            ORDER BY cnt DESC, word ASC LIMIT 20
        """,
        "rollup_distinct_words": """
            WITH words AS (
                SELECT doc_id, source, lang, w AS word
                FROM documents,
                     unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(w)
                WHERE w <> ''
            )
            SELECT source, lang,
                   count(DISTINCT word) AS distinct_words,
                   count(DISTINCT doc_id) AS docs
            FROM words GROUP BY ROLLUP(source, lang)
        """,
        "ell_distinct_words_per_source_bound": f"""
            WITH {WORD_CTE}
            SELECT source,
                   count(DISTINCT word) AS distinct_words,
                   TRUE AS within_bound
            FROM words GROUP BY source
        """,
        "hll_distinct_words_global_bound": f"""
            WITH {WORD_CTE}
            SELECT count(DISTINCT word) AS distinct_words,
                   TRUE AS within_bound
            FROM words
        """,
        "hourly_event_stats": """
            SELECT date_trunc('hour', ts) AS hour,
                   event_type,
                   count(*) AS events,
                   count(DISTINCT user_id) AS users,
                   round(sum(value), 3) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "sliding_window_distinct_users_bound": """
            WITH ev AS (
                SELECT date_trunc('hour', ts) AS hour, user_id FROM events
            ),
            wins AS (
                SELECT hour - k * INTERVAL 1 HOUR AS window_start, user_id
                FROM ev, range(0, 24) t(k)
            )
            SELECT window_start,
                   count(DISTINCT user_id) AS exact_users,
                   TRUE AS within_bound
            FROM wins GROUP BY window_start
        """,
        "intersection_distinct_words_bound": f"""
            WITH {WORD_CTE}
            SELECT count(*) AS exact_common_words, TRUE AS within_bound
            FROM (
                SELECT word FROM words WHERE source = 'src0'
                INTERSECT
                SELECT word FROM words WHERE source = 'src1'
            )
        """,
        "top_customers_by_revenue": """
            WITH rev AS (
                SELECT o_custkey, round(sum(o_totalprice), 3) AS revenue
                FROM orders GROUP BY o_custkey
            ),
            j AS (
                SELECT c_mktsegment, c_custkey, revenue
                FROM rev JOIN customer ON o_custkey = c_custkey
            ),
            r AS (
                SELECT c_mktsegment, c_custkey, revenue,
                       row_number() OVER (
                           PARTITION BY c_mktsegment
                           ORDER BY revenue DESC, c_custkey ASC) AS rank
                FROM j
            )
            SELECT c_mktsegment, rank, c_custkey, revenue FROM r WHERE rank <= 10
        """,
        "user_sessionization": """
            WITH marked AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR CAST(epoch(ts) AS BIGINT)
                                    - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            sess AS (
                SELECT user_id,
                       sum(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
                FROM marked
            ),
            per_session AS (
                SELECT user_id, session_id, count(*) AS events
                FROM sess GROUP BY user_id, session_id
            )
            SELECT user_id, count(*) AS sessions,
                   round(avg(events), 6) AS avg_events_per_session
            FROM per_session GROUP BY user_id
        """,
        "kll_nchars_quantiles_bound": """
            SELECT CAST(0.10 AS DOUBLE) AS q, round(quantile_cont(n_chars, 0.10), 6) AS exact_quantile, TRUE AS within_rank_tol FROM documents
            UNION ALL SELECT 0.25, round(quantile_cont(n_chars, 0.25), 6), TRUE FROM documents
            UNION ALL SELECT 0.50, round(quantile_cont(n_chars, 0.50), 6), TRUE FROM documents
            UNION ALL SELECT 0.75, round(quantile_cont(n_chars, 0.75), 6), TRUE FROM documents
            UNION ALL SELECT 0.90, round(quantile_cont(n_chars, 0.90), 6), TRUE FROM documents
        """,
        "tdigest_nchars_quantiles_bound": """
            SELECT CAST(0.10 AS DOUBLE) AS q, round(quantile_cont(n_chars, 0.10), 6) AS exact_quantile, TRUE AS within_rank_tol FROM documents
            UNION ALL SELECT 0.25, round(quantile_cont(n_chars, 0.25), 6), TRUE FROM documents
            UNION ALL SELECT 0.50, round(quantile_cont(n_chars, 0.50), 6), TRUE FROM documents
            UNION ALL SELECT 0.75, round(quantile_cont(n_chars, 0.75), 6), TRUE FROM documents
            UNION ALL SELECT 0.90, round(quantile_cont(n_chars, 0.90), 6), TRUE FROM documents
        """,
        "cms_heavy_hitters_bound": f"""
            WITH {WORD_CTE}
            SELECT word, count(*) AS cnt, TRUE AS within_bound
            FROM words GROUP BY word
            ORDER BY cnt DESC, word ASC LIMIT 10
        """,
        "bloom_membership_bound": """
            SELECT count(*) AS members,
                   TRUE AS no_false_negatives,
                   TRUE AS fpr_within_bound
            FROM documents WHERE source = 'src0'
        """,
        "dedup_exact_summary": """
            SELECT source,
                   count(*) AS docs,
                   count(DISTINCT md5(text)) AS unique_contents,
                   count(*) - count(DISTINCT md5(text)) AS removed_by_dedup
            FROM documents GROUP BY source
        """,
        "minhash_lsh_candidates": f"""
            WITH {WORD_CTE},
            {_MINHASH_SIG_CTES},
            {_capped_cand_ctes()}
            SELECT id_a, id_b FROM cand
        """,
        "ngram_jaccard_near_duplicates": f"""
            WITH {_SHINGLE_CTE},
            {_MINHASH_SIG_CTES},
            {_capped_cand_ctes()},
            {_JACCARD_TAIL}
        """,
        "token_count_summary": r"""
            WITH per_doc AS (
                SELECT source,
                       len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                       w -> w <> ''))::BIGINT
                       + len(list_filter(regexp_split_to_array(text, '[a-zA-Z0-9\s]+'),
                                         w -> w <> ''))::BIGINT AS approx_tokens
                FROM documents
            )
            SELECT source, count(*) AS docs,
                   sum(approx_tokens)::BIGINT AS total_approx_tokens,
                   round(sum(approx_tokens)::BIGINT / CAST(count(*) AS DOUBLE), 6)
                       AS avg_approx_tokens
            FROM per_doc GROUP BY source
        """,
        "mass_duplicate_clusters": f"""
            WITH {WORD_CTE},
            {_MINHASH_SIG_CTES}
            SELECT band, bucket, count(*) AS members, min(doc_id) AS hub
            FROM bands GROUP BY band, bucket HAVING count(*) > 200
        """,
        "jaccard_near_duplicates": f"""
            WITH {WORD_CTE},
            {_MINHASH_SIG_CTES},
            {_capped_cand_ctes()},
            {_JACCARD_TAIL}
        """,
        # connected components over the verified-pair graph: recursive
        # transitive closure, component = min reachable id (mirrors the
        # engine's min-label propagation in ops/dedup.connected_components)
        "near_duplicate_groups": f"""
            WITH RECURSIVE {WORD_CTE},
            {_MINHASH_SIG_CTES},
            {_capped_cand_ctes()},
            {_JACCARD_PAIRS_CTE},
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs
            ),
            reach AS (
                SELECT src, dst FROM edges
                UNION
                SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            ),
            comp AS (
                SELECT src AS id, least(src, min(dst)) AS component
                FROM reach GROUP BY src
            )
            SELECT component, count(*) AS members
            FROM comp GROUP BY component
        """,
        # keep-first near-dup dedup decision: same recursive components,
        # keep component representatives (id == component) + docs in no
        # component, per-source accounting
        "near_duplicate_keep_list": f"""
            WITH RECURSIVE {WORD_CTE},
            {_MINHASH_SIG_CTES},
            {_capped_cand_ctes()},
            {_JACCARD_PAIRS_CTE},
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs
            ),
            reach AS (
                SELECT src, dst FROM edges
                UNION
                SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            ),
            comp AS (
                SELECT src AS id, least(src, min(dst)) AS component
                FROM reach GROUP BY src
            )
            SELECT d.source,
                   count(*) AS docs,
                   sum(CASE WHEN c.id IS NULL OR c.id = c.component
                       THEN 1 ELSE 0 END)::BIGINT AS kept_docs,
                   sum(CASE WHEN c.id IS NOT NULL AND c.id <> c.component
                       THEN 1 ELSE 0 END)::BIGINT AS dropped_near_dups
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
            GROUP BY d.source
        """,
        "embedding_near_duplicates": """
            WITH emb AS (
                SELECT vec_id, embedding::DOUBLE[] AS e
                FROM embeddings WHERE vec_id < 1000
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.e, b.e), 6) AS cosine
            FROM emb a JOIN emb b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.4
        """,
        "ann_cosine_topk": """
            WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
            q AS (SELECT vec_id AS query_id, e AS qe FROM emb WHERE vec_id < 3),
            scored AS (
                SELECT q.query_id, emb.vec_id AS neighbor_id,
                       list_cosine_similarity(emb.e, q.qe) AS cosine
                FROM emb CROSS JOIN q
                WHERE emb.vec_id <> q.query_id
            ),
            ranked AS (
                SELECT query_id, neighbor_id, cosine,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id ASC) AS rank
                FROM scored
            )
            SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
            FROM ranked WHERE rank <= 5
        """,
        "ivf_ann_recall_bound": """
            SELECT vec_id AS query_id, TRUE AS recall_ok
            FROM embeddings WHERE vec_id < 5
        """,
        "lsh_ann_recall_bound": """
            SELECT vec_id AS query_id, TRUE AS recall_ok
            FROM embeddings WHERE vec_id < 5
        """,
        "checkpoint_resume_invariant": f"""
            SELECT source, sum(n_tok)::BIGINT AS total_tokens,
                   TRUE AS resume_byte_identical
            FROM read_parquet('{TOKENS_PQ}')
            GROUP BY source
        """,
        "incremental_update_invariant": f"""
            SELECT source, sum(n_tok)::BIGINT AS total_tokens,
                   TRUE AS incremental_byte_identical
            FROM read_parquet('{TOKENS_PQ}')
            GROUP BY source
        """,
        "snapshot_time_travel_invariant": f"""
            SELECT source, sum(n_tok)::BIGINT AS total_tokens,
                   TRUE AS final_byte_identical,
                   TRUE AS time_travel_byte_identical,
                   TRUE AS lineage_totals_ok
            FROM read_parquet('{TOKENS_PQ}')
            GROUP BY source
        """,
        "streaming_batch_parity": f"""
            SELECT source, sum(n_tok)::BIGINT AS total_tokens,
                   TRUE AS stream_equals_batch
            FROM read_parquet('{TOKENS_PQ}')
            GROUP BY source
        """,
        "multimodal_media_stats": f"""
            SELECT kind,
                   count(*) AS n_media,
                   sum(octet_length(blob))::BIGINT AS total_bytes,
                   sum(CASE WHEN kind = 'video'
                       THEN (greatest(octet_length(blob) // 64, 1) + 3) // 4
                       ELSE 0 END)::BIGINT AS frames_sampled,
                   TRUE AS feat_norm_ok
            FROM read_parquet('{_MEDIA_PQ}')
            GROUP BY kind
        """,
        "text_quality_by_source": f"""
            WITH feats AS (
                SELECT source,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   w -> w <> '') AS ws
                FROM documents
            ),
            per_doc AS (
                SELECT source,
                       len(ws)::BIGINT AS n_words,
                       coalesce(list_sum(list_transform(ws, w -> len(w))), 0)::BIGINT
                           AS word_chars,
                       len(list_distinct(ws))::BIGINT AS n_distinct_words
                FROM feats
            )
            -- hash-stable: every ratio is one division of exact integer sums,
            -- rounded once (mirrors ops/queries.text_quality_by_source)
            SELECT source,
                   count(*) AS docs,
                   sum(n_words)::BIGINT AS total_words,
                   round(sum(n_words)::BIGINT / CAST(count(*) AS DOUBLE), 6)
                       AS avg_words,
                   round(sum(word_chars)::BIGINT
                         / CAST(greatest(sum(n_words), 1) AS DOUBLE), 6)
                       AS mean_word_len,
                   round(sum(n_distinct_words)::BIGINT
                         / CAST(greatest(sum(n_words), 1) AS DOUBLE), 6)
                       AS distinct_word_ratio
            FROM per_doc GROUP BY source
        """,
        "lang_id_confusion": """
            WITH per_doc AS (
                SELECT lang,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   w -> w <> '') AS ws
                FROM documents
            ),
            pred AS (
                SELECT lang,
                       CASE WHEN round(
                                len(list_filter(ws, w -> list_contains(
                                    ['the','a','and','of','to','in','is','for','on','with'], w)))
                                / CAST(greatest(len(ws), 1) AS DOUBLE), 6) >= 0.03
                            THEN 'en' ELSE 'other' END AS predicted_lang
                FROM per_doc
            )
            SELECT lang, predicted_lang, count(*) AS docs
            FROM pred GROUP BY lang, predicted_lang
        """,
        "doc_fingerprints": """
            WITH fp AS (
                SELECT doc_id,
                       md5(array_to_string(list_sort(list_distinct(
                           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                       w -> w <> ''))), ' ')) AS fingerprint
                FROM documents
            )
            SELECT fingerprint, count(*) AS dup_count, min(doc_id) AS keeper
            FROM fp GROUP BY fingerprint HAVING count(*) > 1
        """,
        # pairwise distinct-word overlap: exact intersection counts per
        # source pair; the sketch side's within_bound asserts TRUE like the
        # other *_bound queries. The full S x S grid (including zero-overlap
        # pairs) comes from the source cross join, mirroring the engine's
        # driver-built pair list.
        "source_overlap_matrix_bound": """
            WITH dw AS (
                SELECT DISTINCT source, w AS word FROM (
                    SELECT source,
                           unnest(list_filter(
                               regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               x -> x <> '')) AS w
                    FROM documents
                )
            ),
            srcs AS (SELECT DISTINCT source FROM documents),
            grid AS (
                SELECT a.source AS s1, b.source AS s2
                FROM srcs a JOIN srcs b ON a.source < b.source
            ),
            common AS (
                SELECT a.source AS s1, b.source AS s2, count(*) AS c
                FROM dw a JOIN dw b ON a.word = b.word AND a.source < b.source
                GROUP BY a.source, b.source
            )
            SELECT s1, s2, coalesce(c, 0)::BIGINT AS exact_common_words,
                   TRUE AS within_bound
            FROM grid LEFT JOIN common USING (s1, s2)
            ORDER BY s1, s2
        """,
        # benchmark decontamination twin: identical 5-gram shingling,
        # identical md5-nibble benchmark carve
        "contamination_ngram_overlap": """
            WITH doc_ws AS (
                SELECT doc_id, source,
                       strpos('0123456789abcdef',
                              substr(md5(doc_id::VARCHAR), 1, 1)) - 1 = 0 AS bench,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   w -> w <> '') AS ws
                FROM documents
            ),
            sh AS (
                SELECT doc_id, source, bench,
                       ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                       ws[i+3] || ' ' || ws[i+4] AS s
                FROM doc_ws, unnest(range(1, len(ws) - 3)) AS t(i)
                WHERE len(ws) >= 5
            ),
            bset AS (SELECT DISTINCT s FROM sh WHERE bench),
            cand AS (SELECT DISTINCT doc_id, source, s FROM sh WHERE NOT bench),
            per_doc AS (
                SELECT c.doc_id, c.source, count(*) AS tot,
                       sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS ov
                FROM cand c LEFT JOIN bset b ON c.s = b.s
                GROUP BY c.doc_id, c.source
            )
            SELECT source, count(*) AS docs_checked,
                   sum(CASE WHEN ov > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_flagged,
                   sum(CASE WHEN ov * 1.0 / tot >= 0.5 THEN 1 ELSE 0 END)::BIGINT
                       AS docs_contaminated,
                   round(max(ov * 1.0 / tot), 6) AS max_overlap_ratio
            FROM per_doc GROUP BY source ORDER BY source
        """,
        # deterministic stratified sample: same key-pure md5-nibble rule,
        # digest pins sample MEMBERSHIP cross-engine (lexical id order)
        "stable_sample_digest": """
            WITH pop AS (
                SELECT source, count(*) AS population_docs
                FROM documents GROUP BY source
            ),
            s AS (
                SELECT source, count(*) AS sampled_docs,
                       md5(string_agg(doc_id::VARCHAR, ','
                           ORDER BY doc_id::VARCHAR)) AS sample_digest
                FROM documents
                WHERE strpos('0123456789abcdef',
                             substr(md5(doc_id::VARCHAR), 1, 1)) - 1 < 4
                GROUP BY source
            )
            SELECT pop.source AS source, population_docs,
                   coalesce(sampled_docs, 0)::BIGINT AS sampled_docs,
                   coalesce(sample_digest, md5('')) AS sample_digest
            FROM pop LEFT JOIN s USING (source) ORDER BY source
        """,
        # theta/KMV set algebra: exact INTERSECT/EXCEPT counts; the sketch
        # side's within_bound booleans assert TRUE like the other *_bound
        # queries
        "theta_set_ops_words_bound": """
            WITH doc_ws AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   w -> w <> '') AS ws
                FROM documents
            ),
            dw AS (
                SELECT DISTINCT doc_id % 2 AS par,
                       ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
                FROM doc_ws, unnest(range(1, len(ws) - 1)) AS t(i)
                WHERE len(ws) >= 3
            )
            SELECT
                (SELECT count(*) FROM
                    (SELECT s FROM dw WHERE par = 0
                     INTERSECT
                     SELECT s FROM dw WHERE par = 1))::BIGINT
                    AS exact_common_shingles,
                (SELECT count(*) FROM
                    (SELECT s FROM dw WHERE par = 0
                     EXCEPT
                     SELECT s FROM dw WHERE par = 1))::BIGINT
                    AS exact_even_only_shingles,
                TRUE AS intersection_within_bound,
                TRUE AS difference_within_bound
        """,
        # Misra-Gries is deterministic: est <= true <= est + (n - sum)/(k+1)
        # holds under ANY merge schedule, so within_bound is provably TRUE
        "mg_heavy_hitter_tokens_bound": f"""
            WITH tt AS (SELECT * FROM read_parquet('{TOKENS_PQ}'))
            SELECT t AS token, count(*) AS cnt, TRUE AS within_bound
            FROM (SELECT unnest(tokens) AS t FROM tt)
            GROUP BY t
            ORDER BY cnt DESC, token ASC
            LIMIT 10
        """,
        # grouped KLL: exact per-source interpolated percentiles; the rank
        # tolerance is asserted inside the Spark query
        "kll_ntok_quantiles_by_source_bound": f"""
            WITH tt AS (SELECT * FROM read_parquet('{TOKENS_PQ}'))
            SELECT source, CAST(0.10 AS DOUBLE) AS q, round(quantile_cont(n_tok, 0.10), 6) AS exact_quantile, TRUE AS within_rank_tol FROM tt GROUP BY source
            UNION ALL SELECT source, 0.25, round(quantile_cont(n_tok, 0.25), 6), TRUE FROM tt GROUP BY source
            UNION ALL SELECT source, 0.50, round(quantile_cont(n_tok, 0.50), 6), TRUE FROM tt GROUP BY source
            UNION ALL SELECT source, 0.75, round(quantile_cont(n_tok, 0.75), 6), TRUE FROM tt GROUP BY source
            UNION ALL SELECT source, 0.90, round(quantile_cont(n_tok, 0.90), 6), TRUE FROM tt GROUP BY source
        """,
        # exact order statistics (rank = ceil(q*n), DuckDB quantile_disc
        # convention) — VALUES hash-compared, no bound flag
        "tail_exact_ntok_quantiles": f"""
            WITH tt AS (SELECT * FROM read_parquet('{TOKENS_PQ}')),
            s AS (
                SELECT n_tok,
                       row_number() OVER (ORDER BY n_tok) AS rn,
                       count(*) OVER () AS n
                FROM tt
            )
            SELECT q, CAST(n_tok AS DOUBLE) AS ntok_exact
            FROM s, (VALUES (0.0001), (0.001), (0.999), (0.9999), (1.0)) qs(q)
            WHERE rn = GREATEST(1, CAST(ceil(q * n) AS BIGINT))
        """,
        # bottom-k md5 priorities == lexicographic order of the hex prefix:
        # the oracle re-derives the sample EXACTLY (full row/hash match)
        "bottomk_doc_sample": """
            SELECT source, doc_id, substr(md5(doc_id::VARCHAR), 1, 16) AS priority_hex
            FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY source ORDER BY substr(md5(doc_id::VARCHAR), 1, 16)
            ) <= 8
            ORDER BY source, priority_hex
        """,
        # weighted priority sample (DLT 2007): priorities q = n_tok/u with
        # key-pure u from md5 halves; every step is ONE IEEE double op so
        # DuckDB reproduces the sample bit-exactly, the DLT w_hat = max(w,
        # tau) estimates, AND the total estimator; within_bound asserts 5x
        # Szegedy's sigma <= W/sqrt(k-1)
        "priority_sample_docs_bound": f"""
            WITH pr AS (
                SELECT doc_id, n_tok,
                       n_tok / GREATEST(
                           ('0x' || substr(md5(doc_id), 1, 8))::UBIGINT
                               / 4294967296.0
                           + ('0x' || substr(md5(doc_id), 9, 8))::UBIGINT
                               / 18446744073709551616.0,
                           1.0 / 18446744073709551616.0) AS q
                FROM read_parquet('{TOKENS_PQ}')
            ),
            ranked AS (
                SELECT doc_id, n_tok, q,
                       row_number() OVER (
                           ORDER BY q DESC, substr(md5(doc_id), 1, 16) ASC
                       ) AS rank
                FROM pr
            ),
            tau AS (
                SELECT coalesce(max(CASE WHEN rank = 17 THEN q END), 0.0) AS tau
                FROM ranked
            ),
            samp AS (
                SELECT rank, doc_id, n_tok,
                       GREATEST(n_tok::DOUBLE, tau.tau) AS w_hat
                FROM ranked, tau WHERE rank <= 16
            ),
            tot AS (SELECT sum(n_tok)::BIGINT AS exact_w FROM pr),
            est AS (SELECT sum(w_hat) AS est_w FROM samp)
            SELECT samp.rank::INT AS rank, samp.doc_id,
                   samp.n_tok::INT AS n_tok,
                   round(samp.w_hat, 6) AS w_hat,
                   round(est.est_w, 6) AS est_total_tokens,
                   tot.exact_w AS exact_total_tokens,
                   abs(est.est_w - tot.exact_w)
                       <= 5.0 * tot.exact_w / sqrt(15.0) AS within_bound
            FROM samp, est, tot
            ORDER BY rank
        """,
        # Bloom-prefiltered joins finish with an exact join, so the digests
        # equal the plain EXISTS / NOT EXISTS semi/anti definitions
        "bloom_join_parity": """
            WITH urgent AS (
                SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'
            ),
            semi_set AS (
                SELECT c_custkey FROM customer
                WHERE c_custkey IN (SELECT o_custkey FROM urgent)
            ),
            anti_set AS (
                SELECT c_custkey FROM customer
                WHERE c_custkey NOT IN (SELECT o_custkey FROM urgent)
            )
            SELECT
                (SELECT count(*) FROM semi_set)::BIGINT AS semi_customers,
                (SELECT coalesce(sum(c_custkey), 0) FROM semi_set)::BIGINT AS semi_key_sum,
                (SELECT count(*) FROM anti_set)::BIGINT AS anti_customers,
                (SELECT coalesce(sum(c_custkey), 0) FROM anti_set)::BIGINT AS anti_key_sum,
                TRUE AS partition_complete
        """,
        # count-sketch: unbiased two-sided heavy hitters; within_bound is
        # 6 per-row sigma on a median-of-5 with the F2 term inflated by its
        # own error bound — deterministic hashing makes the flag stable
        "countsketch_hh_tokens_bound": f"""
            WITH tt AS (SELECT * FROM read_parquet('{TOKENS_PQ}'))
            SELECT t AS token, count(*) AS cnt, TRUE AS within_bound
            FROM (SELECT unnest(tokens) AS t FROM tt)
            GROUP BY t
            ORDER BY cnt DESC, token ASC
            LIMIT 10
        """,
        "countsketch_f2_tokens_bound": f"""
            WITH tt AS (SELECT * FROM read_parquet('{TOKENS_PQ}')),
            freq AS (
                SELECT t, count(*) AS cnt
                FROM (SELECT unnest(tokens) AS t FROM tt) GROUP BY t
            )
            SELECT sum(cnt * cnt)::BIGINT AS f2_exact,
                   TRUE AS within_bound
            FROM freq
        """,
        # AMS inner-product join-size estimate: |est - J| <=
        # 6*sqrt(2*F2_o*F2_c/width), both F2s sketch-estimated + inflated
        "join_size_estimate_bound": """
            SELECT count(*)::BIGINT AS join_size_exact,
                   TRUE AS within_bound
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        # one-pass ANALYZE profile: exact columns hash-compared, the four
        # sketch flags (ELL 5*RSE, F2, MG+CS heavy hitter, KLL rank tol)
        # asserted TRUE
        "token_profile_by_source": f"""
            WITH tt AS (SELECT * FROM read_parquet('{TOKENS_PQ}')),
            flat AS (SELECT source, unnest(tokens) AS t FROM tt),
            freq AS (
                SELECT source, t, count(*) AS cnt FROM flat GROUP BY source, t
            ),
            agg AS (
                SELECT source, count(*) AS distinct_exact,
                       sum(cnt * cnt)::BIGINT AS f2_exact
                FROM freq GROUP BY source
            ),
            top AS (
                SELECT source, t AS top_token, cnt AS top_cnt FROM (
                    SELECT source, t, cnt, row_number() OVER (
                        PARTITION BY source ORDER BY cnt DESC, t ASC) AS rn
                    FROM freq
                ) WHERE rn = 1
            ),
            base AS (
                SELECT source, count(*) AS n_docs,
                       sum(len(tokens))::BIGINT AS n_tokens
                FROM tt GROUP BY source
            )
            SELECT b.source, n_docs, n_tokens, distinct_exact,
                   TRUE AS distinct_within_bound,
                   f2_exact, TRUE AS f2_within_bound,
                   top_token, top_cnt,
                   TRUE AS hh_within_bounds,
                   TRUE AS median_within_rank_tol
            FROM base b
            JOIN agg a ON b.source = a.source
            JOIN top t ON b.source = t.source
        """,
        # sequence-level novelty: sliding 3-token windows (never crossing
        # row boundaries); distinct estimated by ELL within 5*RSE
        "trigram_novelty_bound": f"""
            WITH tt AS (SELECT * FROM read_parquet('{TOKENS_PQ}')),
            tri AS (
                SELECT tokens[i] AS a, tokens[i + 1] AS b, tokens[i + 2] AS c
                FROM tt, unnest(range(1, len(tokens) - 1)) AS r(i)
                WHERE len(tokens) >= 3
            ),
            tot AS (
                SELECT sum(greatest(len(tokens) - 2, 0))::BIGINT AS n FROM tt
            )
            SELECT (SELECT n FROM tot) AS total_trigrams,
                   count(DISTINCT (a, b, c))::BIGINT AS distinct_trigrams_exact,
                   round(count(DISTINCT (a, b, c)) /
                         (SELECT n FROM tot)::DOUBLE, 6) AS novelty_ratio,
                   TRUE AS within_bound
            FROM tri
        """,
        # linear-state F2 rollup: grand total counts cross-source overlap
        # ((sum of per-source counts)^2 per token), strictly more than the
        # sum of per-source F2s
        "f2_rollup_tokens_bound": f"""
            WITH tt AS (SELECT * FROM read_parquet('{TOKENS_PQ}')),
            flat AS (SELECT source, unnest(tokens) AS t FROM tt),
            freq AS (
                SELECT source, t, count(*) AS cnt FROM flat GROUP BY source, t
            ),
            per_src AS (
                SELECT source, sum(cnt * cnt)::BIGINT AS f2
                FROM freq GROUP BY source
            ),
            tot AS (
                SELECT sum(c * c)::BIGINT AS f2 FROM (
                    SELECT t, sum(cnt) AS c FROM freq GROUP BY t
                )
            ),
            xs AS (
                SELECT ((SELECT f2 FROM tot) >
                        (SELECT sum(f2) FROM per_src)) AS x
            )
            SELECT source, 0 AS level, f2 AS f2_exact,
                   TRUE AS within_bound, (SELECT x FROM xs)
                       AS total_exceeds_sum_of_parts
            FROM per_src
            UNION ALL
            SELECT NULL, 1, (SELECT f2 FROM tot), TRUE, (SELECT x FROM xs)
        """,
        # sliding-window Misra-Gries: the bracket is deterministic under
        # the 24-state merge schedule (PODS 2012), so within_bracket is
        # provably TRUE; exact top-3 per window hash-compared
        "sliding_window_heavy_users_bound": """
            WITH ev AS (
                SELECT date_trunc('hour', ts) AS hour, user_id
                FROM events WHERE user_id IS NOT NULL
            ),
            fan AS (
                SELECT hour - k * INTERVAL 1 HOUR AS window_start, user_id
                FROM ev, range(0, 24) t(k)
            ),
            cnt AS (
                SELECT window_start, user_id, count(*) AS cnt
                FROM fan GROUP BY window_start, user_id
            )
            SELECT window_start, rank::INT AS rank, user_id, cnt,
                   TRUE AS within_bracket
            FROM (
                SELECT window_start, user_id, cnt,
                       row_number() OVER (
                           PARTITION BY window_start
                           ORDER BY cnt DESC, user_id ASC) AS rank
                FROM cnt
            ) WHERE rank <= 3
        """,
        # NOTE: every registered query above has a full hash-compared oracle
        # (61/61). Queries on synthetic tables (tokens/media) verify against
        # materialized parquet twins in /tmp; simhash_near_duplicates has a
        # real DuckDB twin because its bits are md5-nibble-derived (see
        # _simhash_oracle_sql / ops/dedup._simhash_chunk_cols).
    }
