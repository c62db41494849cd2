"""Rollup / set-operation layers over mergeable sketches.

Because sketch states are exact under union (merge algebra), coarser
aggregation levels are derived by *re-merging finer-level sketch rows* — no
rescan of the raw data. This is the sketch-native equivalent of
ROLLUP/GROUPING SETS and the reason a 10^12-row corpus only ever needs one
pass per grouping *hierarchy*, not per grouping *set*.

Set operations: union = merge (exact state); intersection has no exact
sketch form for log-family sketches — estimated via inclusion-exclusion
|A ∩ B| ≈ est(A) + est(B) − est(A ∪ B) (variance grows as the Jaccard
similarity shrinks; documented, tested).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .agg import SketchSpec, _by_schema


def rollup_level(
    fine: DataFrame, spec: SketchSpec, keep: Sequence[str]
) -> DataFrame:
    """Merge finer-level sketch rows up to the ``keep`` grouping columns
    (pass () for the grand total). Input must have `sketch` + `n_values`."""
    keep = list(keep)
    schema = _by_schema(fine, keep) + "sketch binary, n_values long"

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        st = None
        for data in pdf["sketch"]:
            s = spec.deserialize(bytes(data))
            st = s if st is None else spec.merge(st, s)
        out = {c: [pdf[c].iloc[0]] for c in keep}
        out["sketch"] = [spec.serialize(st)]
        out["n_values"] = [int(pdf["n_values"].sum())]
        return pd.DataFrame(out)

    if keep:
        return fine.groupBy(*keep).applyInPandas(merge_group, schema=schema)

    def merge_all(pdf: pd.DataFrame) -> pd.DataFrame:
        out = merge_group(pdf)
        out.insert(0, "__g", [0])
        return out

    return (
        fine.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(merge_all, schema="__g int, " + schema)
        .drop("__g")
    )


def _key_types(fine: DataFrame, all_keys: Sequence[str]) -> dict:
    """Null literals for missing grouping keys must carry the key column's
    ACTUAL type — a hard-coded string cast would coerce non-string key
    columns to string across the unionByName, silently changing the output
    schema and breaking typed joins against exact oracles."""
    by_name = {f.name: f.dataType for f in fine.schema.fields}
    return {k: by_name[k] for k in all_keys}


def sketch_rollup(
    fine: DataFrame, spec: SketchSpec, hierarchy: Sequence[Sequence[str]]
) -> DataFrame:
    """All levels of a grouping hierarchy from one finest-level sketch table.

    ``hierarchy`` is ordered finest -> coarsest, e.g.
    ``[("source", "lang"), ("source",), ()]``. Output rows carry the level's
    keys (missing keys as null) + sketch + n_values + ``level``.
    """
    all_keys = list(hierarchy[0])
    key_types = _key_types(fine, all_keys)
    outs = []
    level_df = fine
    for i, keys in enumerate(hierarchy):
        if i > 0:
            level_df = rollup_level(level_df, spec, keys)
        out = level_df.select(
            *[
                (F.col(k) if k in keys else F.lit(None).cast(key_types[k])).alias(k)
                for k in all_keys
            ],
            "sketch",
            "n_values",
            F.lit(i).alias("level"),
        )
        outs.append(out)
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def sketch_grouping_sets(
    fine: DataFrame, spec: SketchSpec, all_keys: Sequence[str], sets: Sequence[Sequence[str]]
) -> DataFrame:
    """GROUPING SETS / CUBE from one finest-level sketch table.

    Every grouping set is derived by re-merging the finest sketch rows —
    the raw data is scanned exactly once no matter how many sets. Output
    carries all keys (missing ones null) + ``gid``, bit-compatible with SQL
    ``GROUPING(k1, k2, …)`` (leftmost key = most significant bit), so
    results join directly against an exact CUBE oracle.
    """
    all_keys = list(all_keys)
    key_types = _key_types(fine, all_keys)
    outs = []
    for keys in sets:
        keys = list(keys)
        lvl = fine if keys == all_keys else rollup_level(fine, spec, keys)
        gid = sum(1 << (len(all_keys) - 1 - i) for i, k in enumerate(all_keys) if k not in keys)
        outs.append(
            lvl.select(
                *[
                    (F.col(k) if k in keys else F.lit(None).cast(key_types[k])).alias(k)
                    for k in all_keys
                ],
                "sketch",
                "n_values",
                F.lit(gid).alias("gid"),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def sketch_cube(fine: DataFrame, spec: SketchSpec, all_keys: Sequence[str]) -> DataFrame:
    """All 2^k grouping sets of ``all_keys`` (SQL CUBE) from one pass."""
    from itertools import combinations

    all_keys = list(all_keys)
    sets = [
        list(c) for r in range(len(all_keys), -1, -1) for c in combinations(all_keys, r)
    ]
    return sketch_grouping_sets(fine, spec, all_keys, sets)


def estimate_intersection(spec: SketchSpec, state_a: bytes, state_b: bytes) -> float:
    """Inclusion-exclusion distinct-count intersection estimate."""
    a = spec.deserialize(state_a)
    b = spec.deserialize(state_b)
    est_a = spec.finalize(spec.deserialize(state_a))
    est_b = spec.finalize(spec.deserialize(state_b))
    est_union = spec.finalize(spec.merge(a, b))
    return max(est_a + est_b - est_union, 0.0)
