"""Physical-plan assertions: the Catalyst properties the engine relies on at
100 TB must hold in the plan, not just in prose (SURVEY.md §4).

Each test captures .explain() output and asserts the load-bearing feature:
filter pushdown reaching the parquet scan, column pruning in ReadSchema,
broadcast joins for small dimensions, whole-stage codegen on exact
aggregates, and a single shuffle for the sketch partial/final aggregation.
"""

import contextlib
import io

import pytest

from exaloglog_paper_spark.ops import queries as Q


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


SF_DIR = "/root/testdata/sf0.001"


def test_q1_filter_pushdown_and_column_pruning(spark):
    plan = _plan(Q.q1_pricing_summary(spark, SF_DIR))
    # the shipdate predicate must reach the parquet scan...
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # ...and the scan must not read columns the query never touches
    assert "l_comment" not in plan
    assert "l_partkey" not in plan


def test_top_customers_uses_broadcast_join(spark):
    plan = _plan(Q.top_customers_by_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # the fact table side is aggregated before the join (partial agg first),
    # so no SortMergeJoin of raw orders against customers
    assert "SortMergeJoin" not in plan


def test_exact_aggregates_run_in_wholestage_codegen(spark):
    df = Q.exact_distinct_words_per_source(spark, SF_DIR)
    df.collect()  # AQE: codegen annotations appear on the final plan
    plan = _plan(df)
    # formatted mode tags codegen stages; the explode + hash aggregate
    # pipeline must be inside one
    assert "[codegen id :" in plan
    assert "HashAggregate" in plan


def test_sketch_agg_by_group_single_shuffle(spark):
    """The sketch partial/final pattern shuffles once: tiny partial states on
    the group key. More exchanges would mean shuffling raw rows."""
    from exaloglog_paper_spark.ops import tokens as tok
    from exaloglog_paper_spark.ops.agg import (
        ExaLogLogSpec,
        sketch_agg,
        token_array_values,
    )

    df = tok.token_table(spark, 500)
    out = sketch_agg(df, ExaLogLogSpec(2, 20, 8), token_array_values("tokens"), by=["source"])
    plan = _plan(out)
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 2, plan  # one hashpartitioning (+ AQE read at most)
    assert "hashpartitioning(source" in plan, plan


def test_token_scan_prunes_to_used_columns(spark):
    """The flagship per-source query over a parquet token table must read
    only (tokens, source) — not doc_id/n_tok (SURVEY.md §4 'What Catalyst
    already gives us')."""
    from exaloglog_paper_spark.ops import tokens as tok
    from exaloglog_paper_spark.ops.agg import (
        ExaLogLogSpec,
        sketch_agg,
        token_array_values,
    )

    path = tok.materialize_token_table("sf0.001")
    df = spark.read.parquet(path)
    out = sketch_agg(df, ExaLogLogSpec(2, 20, 8), token_array_values("tokens"), by=["source"])
    plan = _plan(out)
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "tokens" in scan and "source" in scan
    assert "doc_id" not in scan and "n_tok" not in scan


@pytest.mark.parametrize("query_name", ["minhash_lsh_candidates", "dedup_exact_summary"])
def test_dedup_plans_have_partial_aggregation(spark, query_name):
    """Map-side partial aggregation must precede the shuffle for the
    dedup/minhash groupBys (partial_min / partial_count in the plan)."""
    df = getattr(Q, query_name)(spark, SF_DIR)
    plan = _plan(df)
    assert "partial_" in plan, plan
