"""Windowed streaming aggregation over event streams.

Standard Structured Streaming shape: event-time tumbling windows with a
watermark for late data, distinct-user sketches per (window, event_type).
Unlike counts, sketch states are idempotent under replay, so
at-least-once delivery cannot inflate the distinct estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window event counts + approx distinct users per event type.

    Works on both batch and streaming DataFrames (identical results for the
    same input — tested with availableNow); uses Spark's built-in HLL++ for
    the inline approximate distinct (JVM-side; our mergeable sketches cover
    the stateful path in streaming/stateful.py).
    """
    # event time must be TIMESTAMP (not NTZ) for watermarks; session tz is UTC
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "events",
            "approx_users",
        )
    )
