"""Snapshot-committed sketch tables (Iceberg-style semantics, no jars).

``ops/sketch_table.py`` versions the persistent sketch table as ``v=N``
parquet dirs gated on ``_SUCCESS``. This module upgrades that layout to
the semantics a production deployment gets from an Iceberg table —
matching the north rule's "incremental updates ride snapshots" framing —
while staying runnable on a plain filesystem:

- **Immutable data files**: every commit writes a brand-new parquet dir
  under ``data/``; nothing is ever rewritten in place.
- **Atomic commits**: a commit is ONE ``os.replace`` of the
  ``metadata/version-hint.text`` pointer (POSIX-atomic rename). A crash
  anywhere before the swap leaves at most an orphaned data dir and an
  unreferenced metadata file — readers are untouched and the next commit
  simply supersedes them.
- **Snapshot isolation**: a reader resolves hint → metadata → manifest →
  an exact, immutable file set. Writers never disturb in-flight readers.
- **Snapshot history + lineage**: each snapshot records its parent, the
  operation, per-commit metrics (groups, values folded, fold seconds) and
  caller lineage (e.g. which day's increment produced it) — the
  resume/audit trail the north rule asks for.
- **Time travel**: ``read_snapshot_table(..., snapshot_id=k)`` reads the
  table exactly as of commit ``k``.

The sketch-state table is KB-per-group (MBs total even when the SOURCE
data is 10^12 rows), so copy-on-write per commit — rewrite the merged
state table, cost proportional to #groups — is the right trade; the
expensive pass is only ever over the new increment, and mergeability
(``state(A ∪ B) == merge(state(A), state(B))``, byte-for-byte) makes the
snapshot chain byte-identical to a from-scratch rebuild (asserted by the
``snapshot_time_travel_invariant`` oracle and tests/test_snapshot_table.py).

On a cluster with ``iceberg-spark-runtime`` on the classpath, use
``update_sketch_table_iceberg`` to ride real Iceberg snapshots instead
(same COW merge, committed through the catalog); this sandbox has no
Iceberg jars, so that path raises with a pointed message, exactly like
``ops/source.read_table``'s Iceberg branch.

Reference behavior-parity note: the reference persists nothing between
runs (in-memory Java sketches); persistent snapshot tables are this
repo's distributed-deployment surface built on the same merge algebra
(``ExaLogLog.java`` add/merge contract, see sketchlib/exaloglog.py).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from .sketch_table import merge_state_tables

_STATE_COLS = ["sketch", "n_values", "build_secs"]


def _meta_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "metadata")


def _hint_path(table_dir: str) -> str:
    return os.path.join(_meta_dir(table_dir), "version-hint.text")


def current_metadata(table_dir: str) -> dict | None:
    """Metadata the version hint points at, or None for an empty table.

    Only the hint is trusted: metadata/data files not reachable from it
    (crash leftovers) are invisible, which is the whole crash-safety story.
    """
    hint = _hint_path(table_dir)
    if not os.path.exists(hint):
        return None
    with open(hint) as f:
        v = int(f.read().strip())
    with open(os.path.join(_meta_dir(table_dir), f"v{v}.metadata.json")) as f:
        meta = json.load(f)
    meta["version"] = v
    return meta


def snapshot_history(table_dir: str) -> list[dict]:
    """All committed snapshots, oldest first (id, parent_id, timestamp_ms,
    operation, manifest, summary, lineage)."""
    meta = current_metadata(table_dir)
    return list(meta["snapshots"]) if meta else []


def _resolve_snapshot(meta: dict, snapshot_id: int | None) -> dict:
    snaps = meta["snapshots"]
    if snapshot_id is None:
        return snaps[-1]
    for s in snaps:
        if s["id"] == snapshot_id:
            return s
    raise KeyError(
        f"snapshot {snapshot_id} not in table (have "
        f"{[s['id'] for s in snaps]}; expired snapshots are unreadable)"
    )


def read_snapshot_table(
    spark: SparkSession, table_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """Current table state, or — time travel — the state as of
    ``snapshot_id``. The manifest names immutable dirs, so the read is
    reproducible for as long as the snapshot isn't expired."""
    meta = current_metadata(table_dir)
    if meta is None:
        raise FileNotFoundError(f"no committed snapshot under {table_dir}")
    snap = _resolve_snapshot(meta, snapshot_id)
    return spark.read.parquet(
        *[os.path.join(table_dir, rel) for rel in snap["manifest"]]
    )


def update_snapshot_table(
    spark: SparkSession,
    table_dir: str,
    increment_states: DataFrame,
    spec,
    by: Sequence[str] = (),
    lineage: Mapping[str, str] | None = None,
) -> DataFrame:
    """Commit one increment as a new snapshot.

    ``increment_states`` is ``sketch_agg``/``scan_sketch_agg`` output over
    the NEW data only; history is never rescanned — the commit folds the
    increment into the current state rows (KB each) with ``tree_merge``
    and writes the merged table as a fresh immutable data dir. Commit
    order: data dir → metadata json → atomic hint swap; a crash at any
    point leaves the previous snapshot intact and current.
    """
    by = list(by)
    t0 = time.monotonic()
    meta = current_metadata(table_dir)
    inc = increment_states.select(*by, *_STATE_COLS)
    if meta is None:
        merged = inc
        snaps: list[dict] = []
        next_v = 1
        operation = "append"
    else:
        merged = merge_state_tables(
            [read_snapshot_table(spark, table_dir), inc], spec, by=by
        )
        snaps = list(meta["snapshots"])
        next_v = meta["version"] + 1
        operation = "overwrite"  # COW: the new snapshot replaces all state rows

    snap_id = snaps[-1]["id"] + 1 if snaps else 1
    rel_data = os.path.join("data", f"snap-{snap_id:06d}")
    merged.write.mode("overwrite").parquet(os.path.join(table_dir, rel_data))

    out = spark.read.parquet(os.path.join(table_dir, rel_data))
    agg = out.groupBy().sum("n_values").collect()  # KB-scale state table
    snaps.append(
        {
            "id": snap_id,
            "parent_id": snaps[-1]["id"] if snaps else None,
            "timestamp_ms": int(time.time() * 1000),
            "operation": operation,
            "manifest": [rel_data],
            "summary": {
                "n_groups": out.count(),
                "total_values": int(agg[0][0] or 0),
                "commit_secs": round(time.monotonic() - t0, 3),
            },
            "lineage": dict(lineage or {}),
        }
    )

    os.makedirs(_meta_dir(table_dir), exist_ok=True)
    meta_path = os.path.join(_meta_dir(table_dir), f"v{next_v}.metadata.json")
    with open(meta_path, "w") as f:
        json.dump({"format_version": 1, "by": by, "snapshots": snaps}, f, indent=1)
    tmp = _hint_path(table_dir) + f".tmp{next_v}"
    with open(tmp, "w") as f:
        f.write(str(next_v))
    os.replace(tmp, _hint_path(table_dir))  # THE commit point (atomic)
    return out


def expire_snapshots(table_dir: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` snapshots: rewrite metadata without
    them (committed via the same atomic hint swap), then delete their
    now-unreferenced data dirs and any orphans from crashed commits.
    Never touches the current snapshot. Returns expired snapshot ids."""
    meta = current_metadata(table_dir)
    if meta is None:
        return []
    snaps = meta["snapshots"]
    keep = max(keep, 1)  # the current snapshot is never expirable
    kept, doomed = snaps[-keep:], snaps[:-keep]
    if doomed:
        next_v = meta["version"] + 1
        with open(os.path.join(_meta_dir(table_dir), f"v{next_v}.metadata.json"), "w") as f:
            json.dump(
                {"format_version": 1, "by": meta["by"], "snapshots": kept}, f, indent=1
            )
        tmp = _hint_path(table_dir) + f".tmp{next_v}"
        with open(tmp, "w") as f:
            f.write(str(next_v))
        os.replace(tmp, _hint_path(table_dir))
    live = {rel for s in kept for rel in s["manifest"]}
    data_dir = os.path.join(table_dir, "data")
    if os.path.isdir(data_dir):
        for name in os.listdir(data_dir):
            if os.path.join("data", name) not in live:
                shutil.rmtree(os.path.join(data_dir, name), ignore_errors=True)
    return [s["id"] for s in doomed]


def update_sketch_table_iceberg(
    spark: SparkSession,
    table_ident: str,
    increment_states: DataFrame,
    spec,
    by: Sequence[str] = (),
) -> DataFrame:
    """True-Iceberg twin of ``update_snapshot_table`` for clusters with
    ``iceberg-spark-runtime`` on the classpath: the same COW state merge,
    committed through the catalog with ``DataFrameWriterV2`` so
    incremental updates ride real Iceberg snapshots (time travel via
    ``VERSION AS OF``, expiry via ``expire_snapshots`` procedures).

    This sandbox ships no Iceberg jars, so table resolution fails here by
    design — same contract as ``ops/source.read_table``'s iceberg branch.
    """
    by = list(by)
    inc = increment_states.select(*by, *_STATE_COLS)
    try:
        exists = spark.catalog.tableExists(table_ident)
    except Exception as e:  # no catalog / no runtime on the classpath
        raise RuntimeError(
            f"cannot resolve Iceberg table {table_ident!r}: is "
            "iceberg-spark-runtime on the classpath and the catalog "
            "configured? For filesystem deployments use "
            "update_snapshot_table instead"
        ) from e
    if not exists:
        inc.writeTo(table_ident).using("iceberg").create()
    else:
        merged = merge_state_tables(
            [spark.read.table(table_ident), inc], spec, by=by
        )
        # Materialize BEFORE the write: the merged plan reads the very
        # table it is about to replace, and Iceberg (correctly) rejects
        # an overwrite whose scan is still wired to the target. The state
        # table is KB-per-group, so an eager localCheckpoint is ~free and
        # severs the self-reference.
        merged = merged.localCheckpoint(eager=True)
        # one atomic Iceberg snapshot replacing the state rows (COW)
        merged.writeTo(table_ident).overwritePartitions()
    return spark.read.table(table_ident)
