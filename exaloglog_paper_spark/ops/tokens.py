"""Deterministic synthetic pre-tokenized-sequence table (FIXTURES.md F1).

Schema per BASELINE.json ``input_hint``::

    doc_id:string, tokens:array<int32>, n_tok:int32, source:string

Every value is a pure function of the row index ``i`` (seeded splitmix64
streams), so the table is identical under any partitioning / parallelism —
which is what lets the same generator back unit tests (exact numpy ground
truth), the DuckDB-free correctness checks, and the two-parallelism scaling
benchmark. The real 10^12-row deployment replaces this module with
``spark.read`` of the Iceberg table; everything downstream only sees the
schema above.

The Zipf(s=1.1) token distribution over a 50_257-token vocab gives the skewed
frequency profile a BPE-tokenized corpus shows; ``source`` is categorical
with a deliberate hot key (``web`` at 62%) for salt/skew testing.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd

from ..sketchlib.bitops import U64, splitmix64

VOCAB_SIZE = 50_257
ZIPF_S = 1.1
SOURCES = np.array(["web", "books", "code", "wiki", "forums"])
SOURCE_WEIGHTS = np.array([0.62, 0.18, 0.10, 0.07, 0.03])
_LOGNORM_MU, _LOGNORM_SIGMA = 5.5, 0.8
_LEN_MIN, _LEN_MAX = 8, 4096
DEFAULT_SEED = 42

TOKEN_TABLE_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"

# rows per scale factor, aligned with the driver's testdata sf naming
# (sf1 exists only for the scaling benchmark: ~674M tokens / ~2.7 GB)
ROWS_PER_SF = {"sf0.001": 1_000, "sf0.01": 20_000, "sf0.1": 200_000, "sf1": 2_000_000,
               # scaling-bench scale: big enough that the 32-core wall is
               # work-dominated, not DAG-floor-dominated (~2.7B tokens)
               "sf4": 8_000_000}


@lru_cache(maxsize=1)
def _zipf_cdf() -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_S)
    return np.cumsum(w / w.sum())


@lru_cache(maxsize=1)
def _source_cdf() -> np.ndarray:
    return np.cumsum(SOURCE_WEIGHTS / SOURCE_WEIGHTS.sum())


def _unit(h: np.ndarray) -> np.ndarray:
    """uint64 -> uniform float64 in [0, 1)."""
    return (h >> U64(11)).astype(np.float64) * (2.0**-53)


def generate_rows(ids: np.ndarray, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    """Generate token-table rows for the given row indices (vectorized)."""
    ids = np.asarray(ids, dtype=np.uint64)
    n = len(ids)
    if n == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype=str), "tokens": [], "n_tok": pd.Series([], dtype=np.int32), "source": pd.Series([], dtype=str)}
        )
    s = U64(seed)
    # sequence length: lognormal via Box-Muller on two per-row streams
    u1 = _unit(splitmix64(ids * U64(4) + U64(0) + s * U64(0x9E3779B9)))
    u2 = _unit(splitmix64(ids * U64(4) + U64(1) + s * U64(0x9E3779B9)))
    z = np.sqrt(-2.0 * np.log(1.0 - u1)) * np.cos(2.0 * np.pi * u2)
    n_tok = np.clip(
        np.round(np.exp(_LOGNORM_MU + _LOGNORM_SIGMA * z)), _LEN_MIN, _LEN_MAX
    ).astype(np.int32)
    # source: categorical over skewed weights
    u3 = _unit(splitmix64(ids * U64(4) + U64(2) + s * U64(0x9E3779B9)))
    src_idx = np.searchsorted(_source_cdf(), u3, side="right")
    source = SOURCES[np.minimum(src_idx, len(SOURCES) - 1)]
    # tokens: Zipf via inverse CDF; per-(row, position) stream keyed by
    # i * 4096 + j which is unique because n_tok <= 4096
    total = int(n_tok.sum())
    row_rep = np.repeat(ids, n_tok)
    starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
    pos = np.arange(total, dtype=np.uint64) - np.repeat(
        starts.astype(np.uint64), n_tok
    )
    hu = _unit(splitmix64(row_rep * U64(4096) + pos + U64(0xABCDEF) + s))
    toks = np.searchsorted(_zipf_cdf(), hu, side="right").astype(np.int32)
    tokens = np.split(toks, np.cumsum(n_tok)[:-1])
    doc_id = np.char.add("doc-", np.char.zfill(ids.astype("U10"), 10))
    return pd.DataFrame(
        {"doc_id": doc_id, "tokens": tokens, "n_tok": n_tok, "source": source}
    )


def token_table(spark, num_rows: int, seed: int = DEFAULT_SEED, num_partitions: int | None = None):
    """Distributed token table as a Spark DataFrame (mapInPandas generator)."""
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 4)

    def gen(iterator):
        for pdf in iterator:
            yield generate_rows(pdf["id"].to_numpy(np.uint64), seed)

    rng = spark.range(0, num_rows, 1, num_partitions)
    return rng.mapInPandas(gen, schema=TOKEN_TABLE_SCHEMA)


def token_table_for_sf_dir(spark, sf_dir: str, seed: int = DEFAULT_SEED):
    """Token table sized to match the driver's sf directory naming."""
    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return token_table(spark, ROWS_PER_SF.get(name, 20_000), seed)


def materialized_table_path(sf_name: str, seed: int = DEFAULT_SEED) -> str:
    return f"/tmp/exaloglog_tokens_{sf_name}_seed{seed}.parquet"


def materialize_token_table(sf_name: str, seed: int = DEFAULT_SEED) -> str:
    """Write the deterministic token table to a local parquet file so the
    DuckDB oracle can read the *same rows* via ``read_parquet()`` and verify
    the Spark pipeline independently (exact distinct/total token counts,
    per-row n_tok == len(tokens), token-array pass-through).

    Idempotent (skips if present); atomic via temp-file + rename. Bounded to
    test scale factors — the 10^12-row deployment reads Iceberg instead.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = materialized_table_path(sf_name, seed)
    if os.path.exists(path):
        return path
    num_rows = ROWS_PER_SF.get(sf_name, 20_000)
    pdf = generate_rows(np.arange(num_rows, dtype=np.uint64), seed)
    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def exact_ground_truth(num_rows: int, seed: int = DEFAULT_SEED) -> dict:
    """Exact distinct counts etc. computed locally with the same generator
    (viable for test scales; used as the oracle for sketch-accuracy checks)."""
    pdf = generate_rows(np.arange(num_rows, dtype=np.uint64), seed)
    all_tokens = np.concatenate(pdf["tokens"].to_list())
    per_source = {}
    for src in np.unique(pdf["source"]):
        sel = pdf["source"] == src
        per_source[str(src)] = {
            "docs": int(sel.sum()),
            "distinct_tokens": int(len(np.unique(np.concatenate(pdf.loc[sel, "tokens"].to_list())))),
            "total_tokens": int(pdf.loc[sel, "n_tok"].sum()),
        }
    vals, counts = np.unique(all_tokens, return_counts=True)
    top = np.argsort(-counts, kind="stable")[:50]
    return {
        "rows": num_rows,
        "distinct_tokens": int(len(vals)),
        "total_tokens": int(len(all_tokens)),
        "top_tokens": list(zip(vals[top].tolist(), counts[top].tolist())),
        "n_tok_quantiles": np.quantile(pdf["n_tok"], [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]).tolist(),
        "per_source": per_source,
    }
