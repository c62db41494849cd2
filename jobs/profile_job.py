"""spark-submit entry point: one-pass multi-sketch ANALYZE profile of a
token table (doc_id, tokens:array<int32>, n_tok, source) — per-group
optimizer statistics from a single scan (ops/profile.py): ExaLogLog
distinct-token cardinality, count-sketch F2 (shuffle-skew statistic) and
unbiased heavy-hitter frequencies, the Misra-Gries deterministic
heavy-hitter bracket, and KLL n_tok quantiles.

Usage (the production invocation shape; works on any cluster master):

    scripts/build_dist.sh
    spark-submit --master local[8] \
        --py-files dist/exaloglog_paper_spark.zip \
        jobs/profile_job.py \
        --input /path/to/tokens.parquet --by source \
        --top-k 10 --output /path/to/profile.parquet

    # Iceberg (cluster with iceberg-spark-runtime + catalog configured):
    spark-submit ... jobs/profile_job.py \
        --input prod_catalog.training.tokenized_sequences --format iceberg
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--format", default="auto", choices=["auto", "parquet", "iceberg"]
    )
    ap.add_argument("--by", default="source")
    ap.add_argument("--t", type=int, default=2)
    ap.add_argument("--d", type=int, default=20)
    ap.add_argument("--p", type=int, default=10)
    ap.add_argument("--cs-width", type=int, default=8192)
    ap.add_argument("--mg-k", type=int, default=256)
    ap.add_argument("--top-k", type=int, default=10,
                    help="heavy-hitter candidates to report per group")
    ap.add_argument("--quantiles", default="0.1,0.25,0.5,0.75,0.9")
    ap.add_argument("--output", default="",
                    help="optional parquet sink for the profile rows")
    ap.add_argument("--checkpoint-dir", default="",
                    help="bucket-granular resume: completed buckets are "
                    "skipped on rerun; the bucket dirs double as the "
                    "per-partition lineage/metrics table (parquet input "
                    "only)")
    ap.add_argument("--num-buckets", type=int, default=8)
    args = ap.parse_args()

    import numpy as np

    from exaloglog_paper_spark.ops.profile import (
        checkpointed_profile,
        profile_token_table,
        scan_profile,
    )
    from exaloglog_paper_spark.ops.source import read_tokens, resolve_format
    from exaloglog_paper_spark.sketchlib.bitops import splitmix64

    spark = SparkSession.builder.appName("token-profile").getOrCreate()
    kwargs = dict(
        by=args.by,
        t=args.t,
        d=args.d,
        p=args.p,
        cs_width=args.cs_width,
        mg_k=args.mg_k,
    )
    fmt = resolve_format(args.input, args.format)
    if args.checkpoint_dir:
        if fmt != "parquet":
            raise SystemExit(
                "--checkpoint-dir buckets parquet row-group splits and does "
                f"not support format={fmt}; run against the table's parquet "
                "data dir, or drop --checkpoint-dir"
            )
        profs = checkpointed_profile(
            spark, args.input, args.checkpoint_dir,
            num_buckets=args.num_buckets, **kwargs,
        )
    elif fmt == "parquet":
        # pyarrow-native row-group scan: bypasses the JVM->Arrow bridge
        # for the array<int32> column and scales 0.90 at 2->8 cores
        # (BENCH/BASELINE.md)
        profs = scan_profile(spark, args.input, **kwargs)
    else:
        df = read_tokens(spark, args.input, fmt=fmt)
        profs = profile_token_table(df, **kwargs)
    qs = [float(q) for q in args.quantiles.split(",") if q]

    rows = []
    for g in sorted(profs):
        p = profs[g]
        # heavy hitters: MG retained ids ranked by the count-sketch's
        # unbiased estimates (MG guarantees presence above n/(k+1); the
        # count sketch removes MG's undercount for the report)
        ids = p.mg.ids
        if len(ids):
            est = p.cs.query(splitmix64(ids.astype(np.int64).view(np.uint64)))
            order = np.argsort(-est, kind="stable")[: args.top_k]
            top = [(int(ids[i]), float(est[i])) for i in order]
        else:
            top = []
        quants = {f"q{q:g}": float(p.kll.quantile(q)) for q in qs}
        rows.append(
            (
                g,
                int(p.n_docs),
                int(p.n_tokens),
                float(p.ell.estimate()),
                float(p.cs.f2()),
                top,
                quants,
            )
        )
    out = spark.createDataFrame(
        rows,
        "group string, n_docs long, n_tokens long, "
        "distinct_tokens_est double, f2_est double, "
        "top_tokens array<struct<token:int, est_count:double>>, "
        "ntok_quantiles map<string, double>",
    )
    out.show(truncate=False)
    if args.output:
        out.coalesce(1).write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
