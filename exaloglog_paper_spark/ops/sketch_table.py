"""Persistent, incrementally-updatable sketch tables.

The production pattern for 10^12-row distinct counting: keep one row of
serialized sketch state per group in a versioned parquet table, and fold
each new data increment (today's partition) into it with ONE pass over the
increment only — never rescanning history. Mergeability is exactly what
the sketch algebra buys (state(A ∪ B) == merge(state(A), state(B)),
byte-for-byte), so the incrementally-maintained table is byte-identical
to a from-scratch rebuild over the union — asserted in tests.

Layout: ``<table_dir>/v=<N>/`` parquet with Spark's ``_SUCCESS`` marker;
``read_sketch_table`` picks the highest complete version, so a crashed
update never corrupts the table (the partial ``v=N+1`` is simply ignored
and rewritten by the retry). Columns: ``by..., sketch binary,
n_values long, build_secs double`` — the same shape ``sketch_agg``
emits, so estimates/rollups/further merges compose unchanged.
"""

from __future__ import annotations

import os
import re
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from .agg import tree_merge


def _versions(table_dir: str) -> list[int]:
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        m = re.fullmatch(r"v=(\d+)", name)
        if m and os.path.exists(os.path.join(table_dir, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(table_dir: str) -> int | None:
    vs = _versions(table_dir)
    return vs[-1] if vs else None


def read_sketch_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """Latest complete version of the sketch table."""
    v = latest_version(table_dir)
    if v is None:
        raise FileNotFoundError(f"no complete sketch-table version under {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, f"v={v}"))


def prune_versions(table_dir: str, keep: int = 2) -> list[int]:
    """Delete all but the newest ``keep`` complete versions (plus any
    incomplete scratch dirs older than the newest complete one). Run after
    successful updates to bound storage at daily cadence; never touches
    the latest version, so concurrent readers of ``read_sketch_table``
    stay consistent. Returns the deleted version numbers."""
    import shutil

    vs = _versions(table_dir)
    doomed = vs[:-keep] if keep > 0 else vs
    for v in doomed:
        shutil.rmtree(os.path.join(table_dir, f"v={v}"), ignore_errors=True)
    # incomplete scratch dirs (no _SUCCESS) below the newest complete
    # version are crash leftovers that no retry will ever overwrite (the
    # next update writes latest+1); clean them up too
    newest = vs[-1] if vs else None
    if newest is not None and os.path.isdir(table_dir):
        for name in os.listdir(table_dir):
            m = re.fullmatch(r"v=(\d+)", name)
            if (
                m
                and int(m.group(1)) < newest
                and not os.path.exists(os.path.join(table_dir, name, "_SUCCESS"))
            ):
                shutil.rmtree(os.path.join(table_dir, name), ignore_errors=True)
    return doomed


def merge_state_tables(
    states: Sequence[DataFrame], spec, by: Sequence[str] = (), fanin: int = 64
) -> DataFrame:
    """Merge several (by..., sketch, n_values, build_secs) state tables into
    one row per group. Inputs are state rows (KB each), so this is a
    shuffle of sketch states on the group key — never of raw data."""
    by = list(by)
    # tree_merge wants a DISTINCT partition stamp per planned partial: stamp
    # each input table with its ordinal so the pmod bucketing spreads states
    # across first-level reducers even for > fanin input tables (multi-day
    # backfills) — a constant stamp would funnel every state into one bucket
    cols = states[0].columns
    stamped = states[0].withColumn("partition_id", F.lit(0))
    for i, s in enumerate(states[1:], start=1):
        stamped = stamped.unionByName(s.select(cols).withColumn("partition_id", F.lit(i)))
    return tree_merge(stamped, spec, by=by, num_partials=len(states), fanin=fanin)


def update_sketch_table(
    spark: SparkSession,
    table_dir: str,
    increment_states: DataFrame,
    spec,
    by: Sequence[str] = (),
) -> DataFrame:
    """Fold an increment's state table into the persistent sketch table.

    ``increment_states`` is the output of ``sketch_agg``/``scan_sketch_agg``
    over the NEW data only. Writes ``v=<latest+1>`` (atomic via Spark's
    ``_SUCCESS``) and returns the merged table. History is never rescanned:
    the update cost is one pass over the increment + a KB-per-group state
    merge.
    """
    by = list(by)
    v = latest_version(table_dir)
    if v is None:
        merged = increment_states.select(
            *by, "sketch", "n_values", "build_secs"
        )
        next_v = 1
    else:
        current = read_sketch_table(spark, table_dir)
        merged = merge_state_tables(
            [current, increment_states.select(*by, "sketch", "n_values", "build_secs")],
            spec,
            by=by,
        )
        next_v = v + 1
    merged.write.mode("overwrite").parquet(os.path.join(table_dir, f"v={next_v}"))
    return spark.read.parquet(os.path.join(table_dir, f"v={next_v}"))
