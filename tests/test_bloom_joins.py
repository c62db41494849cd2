"""Bloom-prefiltered semi/anti joins must equal the exact joins row-for-row
even with a deliberately tiny (high-FPR) filter, and the prefilter mark
must never produce a false negative."""

import numpy as np
from pyspark.sql import functions as F

from exaloglog_paper_spark.ops.joins import (
    bloom_anti_join,
    bloom_semi_join,
    build_key_filter,
    with_bloom_hit,
)


def _tables(spark):
    left = spark.range(10_000).select(F.col("id").alias("k"))
    # build side: every 7th key, plus some keys absent from left
    right = spark.range(3_000).select((F.col("id") * 7).alias("rk"))
    return left, right


def test_semi_join_parity_small_filter(spark):
    left, right = _tables(spark)
    got = sorted(
        r.k for r in bloom_semi_join(left, right, "k", "rk", num_bits=1 << 12).collect()
    )
    want = sorted(r.k for r in left.join(
        right.withColumnRenamed("rk", "k").distinct(), "k", "left_semi"
    ).collect())
    assert got == want and len(got) > 0


def test_anti_join_parity_small_filter(spark):
    left, right = _tables(spark)
    got = sorted(
        r.k for r in bloom_anti_join(left, right, "k", "rk", num_bits=1 << 12).collect()
    )
    want = sorted(r.k for r in left.join(
        right.withColumnRenamed("rk", "k").distinct(), "k", "left_anti"
    ).collect())
    assert got == want and len(got) > 0


def test_no_false_negatives_and_fp_path_exercised(spark):
    left, right = _tables(spark)
    fb, spec = build_key_filter(right, "rk", num_bits=1 << 12)  # tiny -> real FPs
    marked = with_bloom_hit(left, "k", fb, spec).collect()
    members = {r.rk for r in right.collect()}
    hits = {r.k for r in marked if r["__bloom_hit"]}
    misses = {r.k for r in marked if not r["__bloom_hit"]}
    true_members = {r.k for r in left.collect()} & members
    assert true_members <= hits, "bloom prefilter produced a false negative"
    assert hits - true_members, "expected false positives at 4096 bits / 3000 keys"
    assert misses.isdisjoint(true_members)
