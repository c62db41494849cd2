"""Snapshot-committed sketch tables (ops/snapshot_table.py): byte-exact
COW merges, time travel against immutable manifests, atomic-commit crash
safety (only the version hint is trusted), lineage metrics, and expiry."""

import json
import os

import pytest
from pyspark.sql import functions as F

from exaloglog_paper_spark.ops import tokens as tok
from exaloglog_paper_spark.ops.agg import (
    ExaLogLogSpec,
    sketch_agg,
    token_array_values,
)
from exaloglog_paper_spark.ops.snapshot_table import (
    current_metadata,
    expire_snapshots,
    read_snapshot_table,
    snapshot_history,
    update_snapshot_table,
)

SPEC = ExaLogLogSpec(2, 20, 8)


@pytest.fixture(scope="module")
def tdf(spark):
    return tok.token_table(spark, 4_000, seed=7, num_partitions=5).cache()


def _states(df):
    return {r.source: (bytes(r.sketch), int(r.n_values)) for r in df.collect()}


def _build(df):
    return sketch_agg(df, SPEC, token_array_values("tokens"), by=["source"])


def _commit(spark, tdir, part, lineage=None):
    return update_snapshot_table(
        spark, tdir, _build(part), SPEC, by=["source"], lineage=lineage
    )


def _thirds(tdf):
    return [
        tdf.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i) for i in (0, 1, 2)
    ]


def test_snapshot_commits_equal_full_rebuild_and_time_travel(spark, tdf, tmp_path):
    tdir = str(tmp_path / "snap")
    parts = _thirds(tdf)
    for i, p in enumerate(parts):
        _commit(spark, tdir, p, lineage={"increment": f"day-{i}"})

    # final state: byte-identical to a one-shot build over the union
    assert _states(read_snapshot_table(spark, tdir)) == _states(_build(tdf))

    # time travel: snapshot k == one-shot build over the first k increments
    assert _states(read_snapshot_table(spark, tdir, snapshot_id=1)) == _states(
        _build(parts[0])
    )
    assert _states(read_snapshot_table(spark, tdir, snapshot_id=2)) == _states(
        _build(parts[0].unionByName(parts[1]))
    )

    # history: parent chain, operations, lineage, and honest volume metrics
    hist = snapshot_history(tdir)
    assert [s["id"] for s in hist] == [1, 2, 3]
    assert [s["parent_id"] for s in hist] == [None, 1, 2]
    assert [s["operation"] for s in hist] == ["append", "overwrite", "overwrite"]
    assert [s["lineage"]["increment"] for s in hist] == ["day-0", "day-1", "day-2"]
    vols = [
        sum(n for _, n in _states(_build(d)).values())
        for d in (parts[0], parts[0].unionByName(parts[1]), tdf)
    ]
    assert [s["summary"]["total_values"] for s in hist] == vols
    assert all(s["summary"]["n_groups"] >= 1 for s in hist)


def test_crashed_commit_is_invisible_until_hint_swap(spark, tdf, tmp_path):
    """A writer that dies after the data dir and metadata json but BEFORE
    the atomic version-hint swap must leave readers on the old snapshot;
    the next successful commit supersedes the orphans."""
    tdir = str(tmp_path / "snap")
    parts = _thirds(tdf)
    _commit(spark, tdir, parts[0])
    before = _states(read_snapshot_table(spark, tdir))

    # simulate the crash: orphan data dir + unreferenced metadata file
    os.makedirs(os.path.join(tdir, "data", "snap-000099"))
    bogus = {"format_version": 1, "by": ["source"], "snapshots": []}
    with open(os.path.join(tdir, "metadata", "v99.metadata.json"), "w") as f:
        json.dump(bogus, f)

    assert current_metadata(tdir)["version"] == 1
    assert _states(read_snapshot_table(spark, tdir)) == before
    assert len(snapshot_history(tdir)) == 1

    # recovery: a retry commits normally on top of snapshot 1
    _commit(spark, tdir, parts[1])
    assert _states(read_snapshot_table(spark, tdir)) == _states(
        _build(parts[0].unionByName(parts[1]))
    )


def test_expire_snapshots_prunes_history_and_data(spark, tdf, tmp_path):
    tdir = str(tmp_path / "snap")
    for p in _thirds(tdf):
        _commit(spark, tdir, p)
    current = _states(read_snapshot_table(spark, tdir))

    assert expire_snapshots(tdir, keep=1) == [1, 2]
    # current snapshot untouched; expired ids unreadable; data dirs pruned
    assert _states(read_snapshot_table(spark, tdir)) == current
    assert [s["id"] for s in snapshot_history(tdir)] == [3]
    with pytest.raises(KeyError):
        read_snapshot_table(spark, tdir, snapshot_id=1)
    assert sorted(os.listdir(os.path.join(tdir, "data"))) == ["snap-000003"]
    # expiring again is a no-op
    assert expire_snapshots(tdir, keep=1) == []


def test_empty_table_reads_raise(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_snapshot_table(spark, str(tmp_path / "nope"))
    assert current_metadata(str(tmp_path / "nope")) is None
    assert snapshot_history(str(tmp_path / "nope")) == []
