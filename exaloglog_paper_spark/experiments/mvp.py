"""Empirical memory-variance product (MVP) computation.

≙ the reference's EmpiricalMVPComputation (``:430-530``): MVP =
serialized-state bits × relative variance of the estimate at cardinality n.
Published values (BASELINE.md): 3.691 for ELL(2,20,8) @ n=1e6 (896 B),
6.459 for HLL. We measure with Poisson-sampled states (same marginal
distribution as n exact inserts) fanned out over Spark.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sketchlib.exaloglog import ExaLogLogConfig
from ..sketchlib.simulate import generate_exaloglog_poisson


def empirical_mvp(
    spark: SparkSession,
    t: int = 2,
    d: int = 20,
    p: int = 8,
    n: float = 1_000_000.0,
    num_cycles: int = 500,
    seed: int = 42,
) -> dict:
    cfg = ExaLogLogConfig(t, d, p)

    def run(iterator):
        for pdf in iterator:
            errs = []
            for cycle in pdf["id"].tolist():
                rng = np.random.default_rng((seed << 21) ^ cycle)
                sk = generate_exaloglog_poisson(n, t, d, p, rng)
                errs.append(sk.estimate() / n - 1.0)
            yield pd.DataFrame({"err": errs})

    par = max(spark.sparkContext.defaultParallelism, 4)
    errors = spark.range(0, num_cycles, 1, par).mapInPandas(run, "err double")
    row = errors.agg(
        F.avg("err").alias("bias"),
        F.avg(F.col("err") * F.col("err")).alias("mse"),
    ).collect()[0]
    state_bits = cfg.state_num_bytes * 8
    return {
        "t": t, "d": d, "p": p, "n": n,
        "cycles": num_cycles,
        "state_bytes": cfg.state_num_bytes,
        "bias": row.bias,
        "rmse": float(np.sqrt(row.mse)),
        "mvp": state_bits * row.mse,
    }
