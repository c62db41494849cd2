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
        "ell_distinct_words_per_source_bound": Q.ell_distinct_words_per_source_bound,
        "hll_distinct_words_global_bound": Q.hll_distinct_words_global_bound,
        "ell_distinct_tokens_per_source": Q.ell_distinct_tokens_per_source,
        "token_passthrough_invariant": Q.token_passthrough_invariant,
    }


def oracle_sql() -> dict[str, str]:
    return {
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
        # ell_distinct_tokens_per_source / token_passthrough_invariant run on
        # the synthetic token table (not a DuckDB view) -> rows-only check;
        # their statistical correctness is covered by pytest ground-truth
        # tests (tests/test_spark_agg.py) and the *_bound queries above.
    }
