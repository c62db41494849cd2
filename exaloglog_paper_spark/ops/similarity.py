"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — exact brute-force top-k for a (small, broadcast)
  query set. The dot product runs as JVM ``aggregate``/``zip_with``
  expressions inside whole-stage codegen — no Python in the scan loop; the
  per-query top-k is a window over the candidate scores.
- :func:`lsh_cosine_topk` — the scale path: sign-random-projection LSH.
  Each vector is bucketed by the sign pattern of ``nbits`` fixed random
  hyperplanes (deterministic seed); queries only score vectors whose bucket
  is within hamming distance ``probe_hamming`` of the query's bucket
  (multi-probe), turning a full scan into a bucket-pruned scan. Exactness
  is traded for recall; the test measures recall against brute force.

At 10^12 rows the brute-force variant parallelizes as one map stage (no
shuffle until the tiny per-query top-k heap merge); the LSH variant prunes
the scan by ~2^nbits / probed-buckets.
"""

from __future__ import annotations

import itertools

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _norm_expr(col: str):
    return F.sqrt(
        F.aggregate(
            F.col(col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def _dot_expr(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` must be small (it is broadcast). Output: (query_id,
    neighbor_id, cosine, rank), rank 1..k, ties broken by neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    base = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
    scored = (
        base.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot_expr("vec", "qvec") / (_norm_expr("vec") * _norm_expr("qvec")),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("cosine", F.round("cosine", 6))
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 7) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    from ..sketchlib.bitops import splitmix64, U64

    n = dim * nbits
    h = splitmix64(np.arange(n, dtype=np.uint64) + U64(seed * 0x9E3779B9))
    u = (h >> U64(11)).astype(np.float64) * 2.0**-53
    # Box-Muller from consecutive pairs of one stream (second uniform from
    # the bit-reversed hash to stay one-stream deterministic)
    h2 = splitmix64(h)
    u2 = (h2 >> U64(11)).astype(np.float64) * 2.0**-53
    z = np.sqrt(-2 * np.log(1 - u)) * np.cos(2 * np.pi * u2)
    return z.reshape(nbits, dim)


def with_lsh_bucket(
    df: DataFrame, vec_col: str, dim: int, nbits: int = 8, seed: int = 7
) -> DataFrame:
    """Attach the sign-random-projection bucket id (int in [0, 2^nbits)).

    ``dim`` (the embedding width) is required: it is a pipeline constant by
    contract, and deriving it from data would cost a driver job per call."""
    planes = _hyperplanes(dim, nbits, seed)
    bucket = None
    for b in range(nbits):
        row = planes[b]
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(v)) for v in row]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn("lsh_bucket", bucket.cast("int"))


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    iters: int = 3,
    sample: int = 4096,
    seed: int = 7,
) -> np.ndarray:
    """Deterministic mini k-means for IVF coarse quantization.

    Seeded sample -> driver-side Lloyd iterations (centroid count is tiny;
    the *assignment* of the full table stays distributed). Returns
    (n_centroids, dim) float64, L2-normalized.

    Sampling is a CONTENT-hash filter (``xxhash64(vec, seed) % ratio == 0``)
    so the selected rows depend only on the data, never on partition layout
    — ``df.sample`` draws per-partition and would pick different rows at
    different core counts / split plans, flapping the downstream recall
    bound (this repo benches at 2 vs 8 cores). The scan pays one hash +
    predicate per row (same order as sample()'s per-row RNG); the top-K
    heap that made the old full-table orderBy expensive now runs only over
    the ~1.2x oversampled subset. count(*) over parquet is metadata-only.
    """
    total = embeddings.count()
    ratio = max(int(total // max(sample * 1.2, 1)), 1)
    h = F.xxhash64(F.col(vec_col).cast("string"), F.lit(seed))
    pdf = (
        embeddings.select(vec_col)
        .filter(F.pmod(h, F.lit(ratio)) == 0)
        .orderBy(F.xxhash64(F.col(vec_col).cast("string")))
        .limit(sample)
        .toPandas()
    )
    x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=n_centroids, replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(n_centroids):
            sel = x[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def with_ivf_cell(df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (JVM expressions over a
    literal centroid table — broadcast by construction, codegen-friendly)."""
    best_sim = None
    best_cell = None
    for c, row in enumerate(centroids):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(v)) for v in row]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ) / _norm_expr(vec_col)
        if best_sim is None:
            best_sim, best_cell = dot, F.lit(0)
        else:
            best_cell = F.when(dot > best_sim, F.lit(c)).otherwise(best_cell)
            best_sim = F.greatest(dot, best_sim)
    return df.withColumn("ivf_cell", best_cell.cast("int"))


def ivf_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: score only vectors whose cell is among the query's nprobe
    nearest centroids. The probe set is exploded to one (query, cell) row
    each, so the probe is an **equi-join on ``ivf_cell``** — a
    BroadcastHashJoin keyed on the cell (plan-pinned), never a nested-loop
    ``array_contains`` test of every (row, query) pair. At scale the table
    is written partitioned by ivf_cell and the same key prunes whole
    files."""
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_centroids, vec_col)
    base = with_ivf_cell(
        embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")),
        centroids, "vec",
    )
    qpdf = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")).toPandas()
    qx = np.stack(qpdf["qvec"].to_numpy()).astype(np.float64)
    qx /= np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(qx @ centroids.T), axis=1)[:, :nprobe]
    # one row per (query, probed cell): nprobe distinct cells per query, so
    # the equi-join below produces each candidate pair exactly once
    q = queries.sparkSession.createDataFrame(
        [
            (int(qpdf["query_id"][i]), [float(v) for v in qpdf["qvec"][i]], int(c))
            for i in range(len(qpdf))
            for c in probes[i]
        ],
        "query_id long, qvec array<double>, ivf_cell int",
    )
    scored = (
        base.join(F.broadcast(q), on=["ivf_cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot_expr("vec", "qvec") / (_norm_expr("vec") * _norm_expr("qvec")),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("cosine", F.round("cosine", 6))
    )


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 8,
    probe_hamming: int = 2,
    seed: int = 7,
    *,
    dim: int,
) -> DataFrame:
    """Approximate cosine top-k: score only vectors in LSH buckets within
    ``probe_hamming`` of the query's bucket (multi-probe sign-LSH).

    Each query is expanded driver-free to its probe-bucket SET (all
    ``sum(C(nbits, i), i<=probe_hamming)`` bucket ids within hamming
    distance, via a tiny literal XOR-delta table) and the probe is an
    **equi-join on ``lsh_bucket``** — a BroadcastHashJoin keyed on the
    bucket, so only rows in probed buckets are ever scored. At scale the
    table is written ``partitionBy("lsh_bucket")`` and the same key prunes
    whole files (plan-pinned); a nested-loop hamming filter would instead
    popcount-test every (row, query) pair, O(|emb|·|Q|).

    ``dim`` (the embedding width) is required, like
    :func:`with_lsh_bucket`'s: it is a pipeline constant by contract, and
    deriving it from data would cost a driver job per call.
    """
    base = with_lsh_bucket(
        embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")),
        "vec", dim, nbits, seed,
    )
    q = with_lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")),
        "qvec", dim, nbits, seed,
    ).withColumnRenamed("lsh_bucket", "qbucket")
    # all XOR masks with popcount <= probe_hamming: the multi-probe pattern
    # is data-independent, so the expansion is a pure literal array —
    # enumerated from bit combinations (O(C(nbits, <=h))), not a 2^nbits
    # scan, so wide bucket codes stay cheap on the driver
    deltas = [0] + [
        sum(1 << b for b in bits)
        for i in range(1, probe_hamming + 1)
        for bits in itertools.combinations(range(nbits), i)
    ]
    q_exp = q.withColumn("__delta", F.explode(F.array(*[F.lit(x) for x in deltas])))
    q_exp = q_exp.withColumn(
        "lsh_bucket", F.col("qbucket").bitwiseXOR(F.col("__delta")).cast("int")
    ).drop("__delta", "qbucket")
    scored = (
        base.join(
            F.broadcast(q_exp),
            on=["lsh_bucket"],
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot_expr("vec", "qvec") / (_norm_expr("vec") * _norm_expr("qvec")),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("cosine", F.round("cosine", 6))
    )
