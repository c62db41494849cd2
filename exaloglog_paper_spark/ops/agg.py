"""Mergeable-sketch aggregation over Spark DataFrames.

The distributed pattern mirrors Spark's own partial/final hash aggregation,
expressed with Arrow-vectorized UDFs (never per-row Python):

  stage A  ``mapInPandas``   — one partial sketch per (partition × group);
                               skew-proof: a hot group contributes one tiny
                               binary state per partition, not its raw rows.
  stage B  tree merge        — ``groupBy(by, pmod(partition_id, buckets))``
                               levels while the partial count exceeds the
                               fan-in, so no single reducer ever sees more
                               than ``fanin`` states (matters at 10^5
                               input partitions on a real cluster).
  stage C  ``groupBy(by)``   — final merge + estimate.

This is the Spark-native equivalent of the reference's
fan-out / per-thread-sketch / merge harness
(``ExaLogLogEstimationErrorSimulation.java:101-121``) and of its 5-op
sketch protocol (``SketchConfig.java:345-353``).

For *high-cardinality* ``by`` (millions of groups), per-partition dicts of
states would exhaust map-side memory; use :func:`sketch_agg_salted`, which
shuffles rows on ``(by, salt)`` — explicit salt-based skew mitigation — and
builds per-(group, salt) sketches with ``applyInPandas`` before the final
merge.
"""

from __future__ import annotations

import abc
import time
from typing import Callable, Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType, DoubleType

from ..sketchlib.bitops import splitmix64
from ..sketchlib.exaloglog import ExaLogLog, ExaLogLogConfig

# ---------------------------------------------------------------------------
# sketch protocol
# ---------------------------------------------------------------------------


class SketchSpec(abc.ABC):
    """Picklable description of a mergeable sketch (the 5-op protocol)."""

    name: str = "sketch"

    @abc.abstractmethod
    def empty(self):
        ...

    @abc.abstractmethod
    def add(self, state, values: np.ndarray):
        """Fold a batch of values into state; returns the (new) state."""

    @abc.abstractmethod
    def merge(self, a, b):
        ...

    @abc.abstractmethod
    def serialize(self, state) -> bytes:
        ...

    @abc.abstractmethod
    def deserialize(self, data: bytes):
        ...

    @abc.abstractmethod
    def finalize(self, state) -> float:
        """Scalar result (e.g. the distinct-count estimate)."""


class ExaLogLogSpec(SketchSpec):
    """ExaLogLog over pre-hashed 64-bit values (uint64 numpy arrays)."""

    def __init__(self, t: int = 2, d: int = 20, p: int = 10):
        self.cfg = ExaLogLogConfig(t, d, p)
        self.name = f"exaloglog_t{t}_d{d}_p{p}"

    def empty(self) -> ExaLogLog:
        return ExaLogLog.from_config(self.cfg)

    def add(self, state: ExaLogLog, values: np.ndarray) -> ExaLogLog:
        return state.add_hashes(values)

    def merge(self, a: ExaLogLog, b: ExaLogLog) -> ExaLogLog:
        return a.merge_(b)

    def serialize(self, state: ExaLogLog) -> bytes:
        return state.serialize()

    def deserialize(self, data: bytes) -> ExaLogLog:
        return ExaLogLog.wrap(self.cfg.t, self.cfg.d, data)

    def finalize(self, state: ExaLogLog) -> float:
        return state.estimate()

    def theoretical_rse(self) -> float:
        return self.cfg.theoretical_rse_ml()


class HyperLogLogSpec(ExaLogLogSpec):
    """ML-estimated HyperLogLog = ExaLogLog with t=0, d=0 (shared kernel).

    The identity is the reference's own framing: HLL is the (q=6, d=0, b=2)
    point of the generalized register model (``python/mvp.py:231``,
    ``probability_densities.py:31-36``); RSE constant 1.0367/√m
    (``PrecomputedConstants.java:45``).
    """

    def __init__(self, p: int = 12):
        super().__init__(t=0, d=0, p=p)
        self.name = f"hll_p{p}"


# ---------------------------------------------------------------------------
# value extractors: pandas chunk -> flat numpy array for SketchSpec.add
# ---------------------------------------------------------------------------


def token_array_values(col: str) -> Callable[[pd.DataFrame], np.ndarray]:
    """Flatten an ``array<int32>`` column and hash every token to 64 bits
    with splitmix64 (vectorized; the primary tokens:array<int32> path)."""

    def extract(pdf: pd.DataFrame) -> np.ndarray:
        lists = pdf[col].to_numpy()
        if len(lists) == 0:
            return np.empty(0, dtype=np.uint64)
        flat = np.concatenate(lists).astype(np.int64, copy=False)
        return splitmix64(flat.view(np.uint64))

    return extract


def hash64_values(col: str) -> Callable[[pd.DataFrame], np.ndarray]:
    """Column already holds 64-bit hashes (e.g. from JVM-side F.xxhash64 —
    keeps the hashing inside whole-stage codegen)."""

    def extract(pdf: pd.DataFrame) -> np.ndarray:
        return pdf[col].to_numpy(np.int64).view(np.uint64)

    return extract


def int_values(col: str) -> Callable[[pd.DataFrame], np.ndarray]:
    """Integer column hashed with splitmix64."""

    def extract(pdf: pd.DataFrame) -> np.ndarray:
        return splitmix64(pdf[col].to_numpy(np.int64).view(np.uint64))

    return extract


def float_values(col: str) -> Callable[[pd.DataFrame], np.ndarray]:
    """Raw float values (for quantile sketches — no hashing)."""

    def extract(pdf: pd.DataFrame) -> np.ndarray:
        return pdf[col].to_numpy(np.float64)

    return extract


# ---------------------------------------------------------------------------
# distributed aggregation
# ---------------------------------------------------------------------------


def _by_schema(df: DataFrame, by: Sequence[str]) -> str:
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return "".join(f"{c} {fields[c]}, " for c in by)


def sketch_partials(
    df: DataFrame,
    spec: SketchSpec,
    extractor: Callable[[pd.DataFrame], np.ndarray],
    by: Sequence[str] = (),
    input_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Stage A: one partial sketch row per (input partition × group).

    Output schema: ``by..., sketch binary, n_values long, partition_id long,
    build_secs double`` — the metrics columns double as per-partition lineage
    (see ops/checkpoints.py).
    """
    by = list(by)
    cols = list(dict.fromkeys(by + list(input_cols or [])))
    if cols:
        df = df.select(*cols)  # column pruning reaches the scan

    schema = (
        _by_schema(df, by)
        + "sketch binary, n_values long, partition_id long, build_secs double"
    )

    def build(iterator: Iterable[pd.DataFrame]):
        states: dict = {}
        counts: dict = {}
        t0 = time.monotonic()
        for pdf in iterator:
            if by:
                grouped = pdf.groupby(by, sort=False, observed=True)
                for key, sub in grouped:
                    key = key if isinstance(key, tuple) else (key,)
                    values = extractor(sub)
                    st = states.get(key)
                    if st is None:
                        st = spec.empty()
                    states[key] = spec.add(st, values)
                    counts[key] = counts.get(key, 0) + len(values)
            else:
                values = extractor(pdf)
                st = states.get(())
                if st is None:
                    st = spec.empty()
                states[()] = spec.add(st, values)
                counts[()] = counts.get((), 0) + len(values)
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        secs = time.monotonic() - t0
        if not states and not by:
            states[()] = spec.empty()
            counts[()] = 0
        rows = []
        for key, st in states.items():
            rows.append(
                list(key) + [spec.serialize(st), counts[key], pid, secs]
            )
        if rows:
            yield pd.DataFrame(
                rows, columns=by + ["sketch", "n_values", "partition_id", "build_secs"]
            )

    return df.mapInPandas(build, schema=schema)


def _merge_level(
    partials: DataFrame, spec: SketchSpec, by: Sequence[str], bucket_expr
) -> DataFrame:
    """One tree-merge level: groupBy(by + bucket) -> merged partial rows."""
    by = list(by)
    gcols = by + ["__bucket"]
    lvl = partials.withColumn("__bucket", bucket_expr)
    schema = (
        _by_schema(partials, by)
        + "sketch binary, n_values long, partition_id long, build_secs double"
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        st = None
        for data in pdf["sketch"]:
            s = spec.deserialize(bytes(data))
            st = s if st is None else spec.merge(st, s)
        out = {c: [pdf[c].iloc[0]] for c in by}
        out["sketch"] = [spec.serialize(st)]
        out["n_values"] = [int(pdf["n_values"].sum())]
        out["partition_id"] = [int(pdf["__bucket"].iloc[0])]
        out["build_secs"] = [float(pdf["build_secs"].sum())]
        return pd.DataFrame(out)

    return lvl.groupBy(*gcols).applyInPandas(merge_group, schema=schema)


def tree_merge(
    partials: DataFrame,
    spec: SketchSpec,
    by: Sequence[str] = (),
    num_partials: int | None = None,
    fanin: int = 64,
) -> DataFrame:
    """Stages B+C: iterative tree merge so no reducer sees > fanin states.

    ``num_partials`` = number of stage-A input partitions (known at plan
    time); with P partials we add ⌈log_fanin(P)⌉ - 1 intermediate levels.
    """
    by = list(by)
    remaining = num_partials if num_partials is not None else fanin
    while remaining > fanin:
        buckets = (remaining + fanin - 1) // fanin
        partials = _merge_level(
            partials, spec, by, F.pmod(F.col("partition_id"), F.lit(buckets))
        )
        remaining = buckets
    final = _merge_level(partials, spec, by, F.lit(0))
    return final.drop("partition_id")


def sketch_agg(
    df: DataFrame,
    spec: SketchSpec,
    extractor: Callable[[pd.DataFrame], np.ndarray],
    by: Sequence[str] = (),
    input_cols: Sequence[str] | None = None,
    fanin: int = 64,
) -> DataFrame:
    """Full pipeline: partials -> tree merge. Returns one row per group with
    columns ``by..., sketch, n_values, build_secs``."""
    num_p = df.rdd.getNumPartitions()
    partials = sketch_partials(df, spec, extractor, by=by, input_cols=input_cols)
    return tree_merge(partials, spec, by=by, num_partials=num_p, fanin=fanin)


def sketch_agg_salted(
    df: DataFrame,
    spec: SketchSpec,
    extractor: Callable[[pd.DataFrame], np.ndarray],
    by: Sequence[str],
    salt_col: str,
    n_salts: int = 32,
    input_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Shuffle-based aggregation with explicit salting for skewed groups.

    Rows are shuffled on ``(by, pmod(xxhash64(salt_col), n_salts))`` so a hot
    group (e.g. source='web' at 62% of a 10^12-row table) is split across
    n_salts reducers; per-(group, salt) sketches are then merged per group.
    Use when ``by`` has too many groups for map-side dict state.
    """
    by = list(by)
    cols = list(dict.fromkeys(by + [salt_col] + list(input_cols or [])))
    work = df.select(*cols).withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts))
    )
    schema = (
        _by_schema(df, by)
        + "sketch binary, n_values long, partition_id long, build_secs double"
    )

    def build_group(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.monotonic()
        values = extractor(pdf)
        st = spec.add(spec.empty(), values)
        out = {c: [pdf[c].iloc[0]] for c in by}
        out["sketch"] = [spec.serialize(st)]
        out["n_values"] = [len(values)]
        out["partition_id"] = [int(pdf["__salt"].iloc[0])]
        out["build_secs"] = [time.monotonic() - t0]
        return pd.DataFrame(out)

    partials = work.groupBy(*(by + ["__salt"])).applyInPandas(build_group, schema=schema)
    return tree_merge(partials, spec, by=by, num_partials=n_salts)


def with_estimate(
    df: DataFrame, spec: SketchSpec, sketch_col: str = "sketch", out: str = "estimate"
) -> DataFrame:
    """Attach the sketch's scalar result as a double column (Arrow UDF)."""

    @F.pandas_udf(DoubleType())
    def est(s: pd.Series) -> pd.Series:
        return s.map(lambda data: float(spec.finalize(spec.deserialize(bytes(data)))))

    return df.withColumn(out, est(F.col(sketch_col)))


def merge_two(spec: SketchSpec, a: bytes, b: bytes) -> bytes:
    """Driver-side convenience: merge two serialized states."""
    return spec.serialize(spec.merge(spec.deserialize(a), spec.deserialize(b)))
