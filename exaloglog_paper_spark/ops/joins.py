"""Sketch-accelerated joins: Bloom-prefiltered semi/anti join.

The canonical 100-TB join optimization: when the probe side is huge and
the match fraction small, shuffling the whole probe side for a
SortMergeJoin wastes almost all of the shuffle. Instead:

  1. BUILD a Bloom filter over the build side's join keys with the same
     distributed ``sketch_agg`` partial/tree-merge path as every other
     sketch (KB..MB state, one row to the driver).
  2. BROADCAST the filter bytes and mark probe rows by membership — a
     miss is a GUARANTEED non-member (Bloom filters have no false
     negatives), so semi-join drops misses soundly and anti-join keeps
     them without ever joining. The probe stays a scan-side
     ``mapInArrow`` (vectorized ``contains_hashes``, no shuffle, no
     per-row Python).
  3. Finish with the EXACT join on the ambiguous rows only — false
     positives (rate (1-e^{-kn/m})^k, tunable via num_bits) are
     eliminated there, so results equal the exact semi/anti join while
     the shuffle carries only ~(match_fraction + fpr) of the probe side.

Spark's own runtime row-level filtering covers a subset of this
(same-query, cost-based); this operator makes the filter an explicit,
REUSABLE artifact — build once, persist the bytes in a sketch table,
prefilter many probe queries. The anti form is the
benchmark-decontamination shape: "training docs whose key does NOT
appear in the benchmark set" at full scale touches only
fpr x |training| rows with the exact join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .agg import hash64_values, sketch_agg
from .specs import BloomSpec

_HASH_COL = "__bloom_h"
_HIT_COL = "__bloom_hit"


def build_key_filter(
    right: DataFrame, key_col: str, num_bits: int = 1 << 22, num_hashes: int = 7
) -> tuple[bytes, BloomSpec]:
    """Distributed Bloom build over ``right[key_col]`` (JVM xxhash64 keys);
    returns (filter_bytes, spec)."""
    spec = BloomSpec(num_bits=num_bits, num_hashes=num_hashes)
    keyed = right.select(F.xxhash64(F.col(key_col)).alias(_HASH_COL))
    row = sketch_agg(keyed, spec, hash64_values(_HASH_COL)).collect()[0]
    return bytes(row.sketch), spec


def with_bloom_hit(
    left: DataFrame, key_col: str, filter_bytes: bytes, spec: BloomSpec
) -> DataFrame:
    """Append a boolean ``__bloom_hit`` membership mark (False = key is
    guaranteed absent from the build side)."""
    spark = left.sparkSession
    bc = spark.sparkContext.broadcast(filter_bytes)
    work = left.withColumn(_HASH_COL, F.xxhash64(F.col(key_col)))
    out_schema = work.drop(_HASH_COL).schema.add(_HIT_COL, "boolean", False)

    def probe(batches):
        import numpy as np
        import pyarrow as pa

        bf = spec.deserialize(bc.value)
        for b in batches:
            h = (
                b.column(_HASH_COL)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                .view(np.uint64)
            )
            hit = bf.contains_hashes(h) if len(h) else np.zeros(0, dtype=bool)
            cols = [c for name, c in zip(b.schema.names, b.columns) if name != _HASH_COL]
            names = [n for n in b.schema.names if n != _HASH_COL]
            yield pa.record_batch(cols + [pa.array(hit)], names=names + [_HIT_COL])

    return work.mapInArrow(probe, schema=out_schema)


def bloom_semi_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    num_bits: int = 1 << 22,
    num_hashes: int = 7,
) -> DataFrame:
    """EXACT left-semi join, Bloom-prefiltered: identical rows to
    ``left.join(right, cond, "left_semi")`` with only filter hits
    (matches + false positives) reaching the join shuffle."""
    filter_bytes, spec = build_key_filter(right, right_key, num_bits, num_hashes)
    marked = with_bloom_hit(left, left_key, filter_bytes, spec)
    survivors = marked.filter(F.col(_HIT_COL)).drop(_HIT_COL)
    return survivors.join(
        right.select(F.col(right_key).alias(left_key)).distinct(),
        on=left_key,
        how="left_semi",
    )


def bloom_anti_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    num_bits: int = 1 << 22,
    num_hashes: int = 7,
) -> DataFrame:
    """EXACT left-anti join, Bloom-prefiltered: misses are guaranteed
    non-members and bypass the join entirely; only filter hits go through
    the exact anti join to weed out false positives."""
    filter_bytes, spec = build_key_filter(right, right_key, num_bits, num_hashes)
    marked = with_bloom_hit(left, left_key, filter_bytes, spec)
    certain = marked.filter(~F.col(_HIT_COL)).drop(_HIT_COL)
    maybe = marked.filter(F.col(_HIT_COL)).drop(_HIT_COL)
    exact_part = maybe.join(
        right.select(F.col(right_key).alias(left_key)).distinct(),
        on=left_key,
        how="left_anti",
    )
    return certain.unionByName(exact_part)
