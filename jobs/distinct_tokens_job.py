"""spark-submit entry point: distinct-token sketch build over a token
table (doc_id, tokens:array<int32>, n_tok, source) — parquet files or an
Iceberg catalog table.

Usage (the production invocation shape; works on any cluster master):

    scripts/build_dist.sh
    spark-submit --master local[8] \
        --py-files dist/exaloglog_paper_spark.zip \
        jobs/distinct_tokens_job.py \
        --input /path/to/tokens.parquet --by source \
        --checkpoint-dir /path/to/ckpt --output /path/to/out.parquet

    # Iceberg (cluster with iceberg-spark-runtime + catalog configured):
    spark-submit ... jobs/distinct_tokens_job.py \
        --input prod_catalog.training.tokenized_sequences --format iceberg \
        --by source

Resumable: pass --checkpoint-dir to get bucket-granular restart with
per-partition lineage/metrics (see ops/checkpoints.py).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--format", default="auto", choices=["auto", "parquet", "iceberg"],
        help="input format; iceberg reads a catalog table (needs "
        "iceberg-spark-runtime on the cluster classpath)",
    )
    ap.add_argument("--by", default="")
    ap.add_argument("--t", type=int, default=2)
    ap.add_argument("--d", type=int, default=20)
    ap.add_argument("--p", type=int, default=10)
    ap.add_argument("--checkpoint-dir", default="")
    ap.add_argument("--num-buckets", type=int, default=8)
    ap.add_argument("--output", default="")
    args = ap.parse_args()

    from exaloglog_paper_spark.ops.agg import (
        ExaLogLogSpec,
        token_array_values,
        with_estimate,
    )
    from exaloglog_paper_spark.ops.agg import sketch_agg
    from exaloglog_paper_spark.ops.checkpoints import checkpointed_sketch_agg
    from exaloglog_paper_spark.ops.source import (
        read_tokens,
        resolve_format,
        scan_sketch_agg,
    )

    spark = SparkSession.builder.appName("distinct-tokens").getOrCreate()
    spec = ExaLogLogSpec(args.t, args.d, args.p)
    by = [c for c in args.by.split(",") if c]
    extractor = token_array_values("tokens")
    fmt = resolve_format(args.input, args.format)
    if args.checkpoint_dir:
        if fmt == "iceberg":
            raise SystemExit(
                "--checkpoint-dir uses parquet row-group buckets; for Iceberg "
                "inputs run per-snapshot/partition jobs or export to parquet"
            )
        out = checkpointed_sketch_agg(
            spark, args.input, spec, extractor,
            ckpt_dir=args.checkpoint_dir, by=by, num_buckets=args.num_buckets,
        )
    elif fmt == "iceberg":
        out = sketch_agg(read_tokens(spark, args.input, fmt), spec, extractor, by=by)
    else:
        out = scan_sketch_agg(spark, args.input, spec, extractor, by=by)
    out = with_estimate(out, spec)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.select(*(by + ["n_values", "estimate"])).show(50, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
