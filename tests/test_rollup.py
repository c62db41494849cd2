"""Rollup re-aggregation and intersection estimation."""

import numpy as np
import pytest

from exaloglog_paper_spark.ops import tokens as tok
from exaloglog_paper_spark.ops.agg import (
    ExaLogLogSpec,
    sketch_agg,
    token_array_values,
    with_estimate,
)
from exaloglog_paper_spark.ops.rollup import (
    estimate_intersection,
    rollup_level,
    sketch_rollup,
)
from exaloglog_paper_spark.sketchlib.bitops import splitmix64_stream
from exaloglog_paper_spark.sketchlib.exaloglog import ExaLogLog


def test_rollup_from_fine_sketches_equals_direct_global(spark):
    """Global sketch derived by re-merging per-source sketches must be
    byte-identical to a direct global build (no rescan needed)."""
    spec = ExaLogLogSpec(2, 20, 8)
    tdf = tok.token_table(spark, 300, num_partitions=5).cache()
    fine = sketch_agg(tdf, spec, token_array_values("tokens"), by=["source"])
    total = rollup_level(fine, spec, ()).collect()[0]
    direct = sketch_agg(tdf, spec, token_array_values("tokens")).collect()[0]
    assert bytes(total.sketch) == bytes(direct.sketch)
    assert total.n_values == direct.n_values
    # full hierarchy: (source) -> ()
    levels = sketch_rollup(fine, spec, [("source",), ()])
    rows = with_estimate(levels, spec).collect()
    assert {r.level for r in rows} == {0, 1}
    grand = [r for r in rows if r.level == 1]
    assert len(grand) == 1 and bytes(grand[0].sketch) == bytes(direct.sketch)


def test_cube_cells_byte_equal_direct_builds(spark):
    """Every CUBE(source) grouping-set state derived by re-merging fine
    sketches must equal a direct build over that exact slice (the
    grouping-sets analogue of the merge-algebra contract)."""
    from pyspark.sql import functions as F

    from exaloglog_paper_spark.ops.rollup import sketch_cube

    spec = ExaLogLogSpec(2, 20, 8)
    tdf = tok.token_table(spark, 300, num_partitions=5).cache()
    fine = sketch_agg(tdf, spec, token_array_values("tokens"), by=["source"])
    cube = sketch_cube(fine, spec, ["source"]).collect()
    assert {r.gid for r in cube} == {0, 1}
    for r in cube:
        if r.gid == 0:
            sliced = tdf.filter(F.col("source") == r.source)
        else:
            sliced = tdf
        direct = sketch_agg(sliced, spec, token_array_values("tokens")).collect()[0]
        assert bytes(r.sketch) == bytes(direct.sketch), r.source
        assert r.n_values == direct.n_values


def test_intersection_inclusion_exclusion():
    spec = ExaLogLogSpec(2, 20, 10)
    # |A| = 60k, |B| = 50k, overlap 30k
    base = splitmix64_stream(11, 80_000)
    a = ExaLogLog.create(2, 20, 10).add_hashes(base[:60_000])
    b = ExaLogLog.create(2, 20, 10).add_hashes(base[30_000:])
    est = estimate_intersection(spec, a.serialize(), b.serialize())
    assert est == pytest.approx(30_000, rel=0.15)


def test_rollup_preserves_non_string_key_types(spark):
    """Missing-level null literals must carry each key column's real type:
    an int key must stay int across the unionByName (ADVICE r1)."""
    from exaloglog_paper_spark.ops.rollup import sketch_cube

    df = spark.createDataFrame(
        [(1, "x", 10), (1, "y", 11), (2, "x", 10)], "bucket int, tag string, v long"
    )
    spec = ExaLogLogSpec(2, 8, 8)
    fine = sketch_agg(df, spec, __import__("exaloglog_paper_spark.ops.agg", fromlist=["hash64_values"]).hash64_values("v"), by=["bucket", "tag"])
    levels = sketch_rollup(fine, spec, [("bucket", "tag"), ("bucket",), ()])
    schema = {f.name: f.dataType.simpleString() for f in levels.schema.fields}
    assert schema["bucket"] == "int"
    assert schema["tag"] == "string"
    cube = sketch_cube(fine, spec, ["bucket", "tag"])
    assert {f.name: f.dataType.simpleString() for f in cube.schema.fields}["bucket"] == "int"
    # values survive: coarsest level merges everything
    total = [r for r in levels.collect() if r.bucket is None and r.tag is None]
    assert len(total) == 1 and total[0].n_values == 3
