"""spark-submit entry point: equi-join cardinality estimation WITHOUT
executing the join (AMS count-sketch inner product; sketchlib/countsketch.py).

Two map-only passes build one linear sketch per side over the join key;
the driver dot product estimates |A JOIN B ON key| with
|err| <= 6*sqrt(2*F2(A)*F2(B)/width) — the optimizer statistic classical
engines keep for join planning, here available as a standalone job. At
10^12 x 10^9 rows the join itself would shuffle TBs to answer the same
COUNT; this never shuffles a data-sized relation.

Usage:

    scripts/build_dist.sh
    spark-submit --master local[8] \
        --py-files dist/exaloglog_paper_spark.zip \
        jobs/join_size_job.py \
        --left /path/to/orders.parquet --left-key o_custkey \
        --right /path/to/customer.parquet --right-key c_custkey \
        [--width 16384] [--verify]

``--verify`` additionally executes the real join and reports the exact
size + whether the estimate landed inside the bound (verification only —
never use at data scale).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--left", required=True)
    ap.add_argument("--left-key", required=True)
    ap.add_argument("--right", required=True)
    ap.add_argument("--right-key", required=True)
    ap.add_argument("--width", type=int, default=16384)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()

    from exaloglog_paper_spark.ops.agg import hash64_values, sketch_agg
    from exaloglog_paper_spark.ops.specs import CountSketchSpec
    from exaloglog_paper_spark.sketchlib.countsketch import join_size_error_bound

    spark = SparkSession.builder.appName("join-size-estimate").getOrCreate()
    spec = CountSketchSpec(args.width, args.depth)

    def side(path: str, key: str):
        df = spark.read.parquet(path).select(
            F.xxhash64(F.col(key).cast("long")).alias("h")
        )
        row = sketch_agg(df, spec, hash64_values("h")).collect()[0]
        return spec.deserialize(bytes(row.sketch)), int(row.n_values)

    cs_l, n_l = side(args.left, args.left_key)
    cs_r, n_r = side(args.right, args.right_key)
    infl = 1.0 + spec.cfg.rel_f2_error_bound
    est = cs_l.inner_product(cs_r)
    bound = join_size_error_bound(spec.cfg, cs_l.f2() * infl, cs_r.f2() * infl)
    out = {
        "join_size_est": round(est, 1),
        "error_bound": round(bound, 1),
        "left_rows": n_l,
        "right_rows": n_r,
        "left_f2_est": round(cs_l.f2(), 1),
        "right_f2_est": round(cs_r.f2(), 1),
        "width": args.width,
        "depth": args.depth,
    }
    if args.verify:
        exact = (
            spark.read.parquet(args.left)
            .join(
                spark.read.parquet(args.right),
                F.col(args.left_key) == F.col(args.right_key),
            )
            .count()
        )
        out["join_size_exact"] = exact
        out["within_bound"] = bool(abs(est - exact) <= bound)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
