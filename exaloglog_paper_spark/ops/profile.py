"""One-pass multi-sketch table profiling (ANALYZE-style statistics).

``profile_token_table`` scans the token table ONCE and builds, per group,
every optimizer statistic the engine's sketches can answer:

- ExaLogLog  → distinct-token cardinality (ML estimate + published bound)
- count sketch → F2 / self-join size (the skew statistic pricing every
  hash-partitioned shuffle) + unbiased per-token frequencies
- Misra-Gries → deterministic heavy-hitter bracket
- KLL → n_tok quantiles (rank error ≤ eps)

The classical engine shape is one ANALYZE pass per statistic family; here
a single ``mapInArrow`` partial per partition maintains all four states
per group simultaneously over the same decoded Arrow batch (tokens are
flattened and splitmix-hashed once, shared by the ELL and count-sketch
updates), and the driver folds the per-partition states by each spec's
merge algebra — identical to what ``ops/agg.tree_merge`` driver-folds for
ungrouped aggregations (KB states; at most partitions × groups rows ever
leave the executors, never data).

Scale shape: at 10^12 rows the pass is map-only + one KB-state collect
per (partition, group). The driver fold is appropriate for the profile's
cardinality (groups × partitions ≤ ~10^5 states of KB size — the same
contract as tree_merge's ≤4096-partial driver fold, relaxed because
states arrive pre-grouped); for larger layouts run the individual
sketch_agg queries, which tree-merge distributively.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame

from ..sketchlib.bitops import splitmix64
from ..sketchlib.countsketch import CountSketch
from ..sketchlib.exaloglog import ExaLogLog
from ..sketchlib.freqitems import MisraGries
from ..sketchlib.kll import KLL
from .agg import ExaLogLogSpec
from .specs import CountSketchSpec, KLLSpec, MisraGriesSpec

_PROFILE_SCHEMA = (
    "g string, ell binary, cs binary, mg binary, kll binary, "
    "n_docs long, n_tokens long"
)


@dataclass
class TokenProfile:
    """Per-group profile: merged sketch states + exact row/token counts."""

    group: str
    n_docs: int
    n_tokens: int
    ell: ExaLogLog
    cs: CountSketch
    mg: MisraGries
    kll: KLL


def _flat_tokens(batch, col: str) -> tuple[np.ndarray, np.ndarray]:
    """(flat int64 token ids, per-row lengths) — the zero-copy child-array
    access pattern of agg.token_array_values."""
    arr = batch.column(col)
    if hasattr(arr, "combine_chunks"):
        arr = arr.combine_chunks()
    off_arr = arr.offsets
    try:
        offsets = off_arr.to_numpy().astype(np.int64, copy=False)
    except Exception:
        offsets = off_arr.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = arr.values.to_numpy(zero_copy_only=False)
    flat = flat[offsets[0] : offsets[-1]]
    return flat.astype(np.int64, copy=False), np.diff(offsets)


def profile_partials_df(
    df: DataFrame,
    specs: tuple,
    *,
    by: str = "source",
    tokens_col: str = "tokens",
    ntok_col: str = "n_tok",
) -> DataFrame:
    """The profiler's distributed stage as a DataFrame (one row per
    (partition, group) with all four serialized states) — exposed so plan
    properties (column pruning) are pinnable on the REAL plan and so
    callers can sink partials instead of folding them."""
    ell_spec, cs_spec, mg_spec, kll_spec = specs

    def build(batches):
        import pyarrow as pa

        states: dict[str, list] = {}  # g -> [ell, cs, mg, kll, docs, toks]
        for b in batches:
            flat, lengths = _flat_tokens(b, tokens_col)
            src = b.column(by).to_numpy(zero_copy_only=False)
            ntok = b.column(ntok_col).to_numpy(zero_copy_only=False)
            # group membership of every flattened token in one repeat
            codes, inv = np.unique(src, return_inverse=True)
            flat_inv = np.repeat(inv, lengths)
            hashed = splitmix64(flat.view(np.uint64))
            for gi, g in enumerate(codes):
                st = states.get(g)
                if st is None:
                    st = states[g] = [
                        ell_spec.empty(), cs_spec.empty(),
                        mg_spec.empty(), kll_spec.empty(), 0, 0,
                    ]
                rows = inv == gi
                tok_mask = flat_inv == gi
                h = hashed[tok_mask]
                # hash once, share: ELL and count-sketch both take the
                # splitmix64 stream; MG wants raw ids for identifiability
                st[0] = ell_spec.add(st[0], h)
                st[1] = cs_spec.add(st[1], h)
                st[2] = mg_spec.add(st[2], flat[tok_mask])
                st[3] = kll_spec.add(st[3], ntok[rows].astype(np.float64))
                st[4] += int(rows.sum())
                st[5] += int(tok_mask.sum())
        cols = {
            "g": pa.array([str(g) for g in states], pa.string()),
            "ell": pa.array(
                [ell_spec.serialize(s[0]) for s in states.values()], pa.binary()
            ),
            "cs": pa.array(
                [cs_spec.serialize(s[1]) for s in states.values()], pa.binary()
            ),
            "mg": pa.array(
                [mg_spec.serialize(s[2]) for s in states.values()], pa.binary()
            ),
            "kll": pa.array(
                [kll_spec.serialize(s[3]) for s in states.values()], pa.binary()
            ),
            "n_docs": pa.array([s[4] for s in states.values()], pa.int64()),
            "n_tokens": pa.array([s[5] for s in states.values()], pa.int64()),
        }
        yield pa.record_batch(cols)

    from pyspark.sql import functions as F

    return (
        df.select(by, tokens_col, ntok_col)
        # NULL group keys would poison np.unique's object-array sort; a
        # profile of the NULL group is meaningless anyway — drop explicitly
        .filter(F.col(by).isNotNull())
        .mapInArrow(build, schema=_PROFILE_SCHEMA)
    )


def profile_token_table(
    df: DataFrame,
    *,
    by: str = "source",
    tokens_col: str = "tokens",
    ntok_col: str = "n_tok",
    t: int = 2,
    d: int = 20,
    p: int = 10,
    cs_width: int = 8192,
    cs_depth: int = 5,
    mg_k: int = 256,
    kll_k: int = 200,
) -> dict[str, TokenProfile]:
    """One scan of ``df`` → per-``by``-group TokenProfile."""
    ell_spec = ExaLogLogSpec(t, d, p)
    cs_spec = CountSketchSpec(cs_width, cs_depth)
    mg_spec = MisraGriesSpec(mg_k)
    kll_spec = KLLSpec(kll_k)
    rows = profile_partials_df(
        df,
        (ell_spec, cs_spec, mg_spec, kll_spec),
        by=by,
        tokens_col=tokens_col,
        ntok_col=ntok_col,
    ).collect()

    out: dict[str, TokenProfile] = {}
    grouped: dict[str, list] = {}
    for r in rows:
        grouped.setdefault(r.g, []).append(r)
    for g, rs in grouped.items():
        out[g] = TokenProfile(
            group=g,
            n_docs=sum(r.n_docs for r in rs),
            n_tokens=sum(r.n_tokens for r in rs),
            ell=ell_spec.merge_many(
                [ell_spec.deserialize(bytes(r.ell)) for r in rs]
            ),
            cs=cs_spec.merge_many([cs_spec.deserialize(bytes(r.cs)) for r in rs]),
            mg=mg_spec.merge_many([mg_spec.deserialize(bytes(r.mg)) for r in rs]),
            kll=kll_spec.merge_many(
                [kll_spec.deserialize(bytes(r.kll)) for r in rs]
            ),
        )
    return out
