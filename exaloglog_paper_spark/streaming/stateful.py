"""Structured Streaming: per-key ExaLogLog state maintenance.

``applyInPandasWithState`` holds one serialized sketch per group; every
micro-batch folds its rows in (idempotent — late/replayed data cannot
corrupt a distinct-count sketch, so no watermark is required for
correctness) and emits the updated estimate. This is the streaming twin of
the batch ``sketch_agg`` and shares the exact same kernel, so batch/stream
parity is byte-level (asserted in tests).

The reference is batch-only; its only order-sensitive component (the
martingale estimator, MartingaleEstimator.java:32-35) is intentionally NOT
offered here — use it per partition on static data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sketchlib.bitops import splitmix64
from ..sketchlib.exaloglog import ExaLogLog
from ..ops.agg import ExaLogLogSpec

OUTPUT_SCHEMA = "key string, estimate double, n_values long"
STATE_SCHEMA = "sketch binary, n_values long"


def streaming_distinct_sketch(grouped, spec: ExaLogLogSpec, token_col: str = "tokens"):
    """Apply to ``df.groupBy(key_col)`` of a streaming DataFrame whose rows
    carry an array<int32> token column; emits (key, estimate, n_values)
    updates per micro-batch."""

    def update(key, pdfs, state: GroupState):
        if state.exists:
            sketch_bytes, n = state.get
            sk = spec.deserialize(bytes(sketch_bytes))
        else:
            sk, n = spec.empty(), 0
        for pdf in pdfs:
            lists = pdf[token_col].to_numpy()
            if len(lists) == 0:
                continue
            flat = np.concatenate(lists).astype(np.int64, copy=False)
            sk = spec.add(sk, splitmix64(flat.view(np.uint64)))
            n += len(flat)
        state.update((spec.serialize(sk), n))
        yield pd.DataFrame(
            {"key": [key[0]], "estimate": [spec.finalize(sk)], "n_values": [n]}
        )

    return grouped.applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
