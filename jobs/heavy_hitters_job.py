"""spark-submit entry point: deterministic token heavy hitters
(Misra-Gries) and/or a fixed-size uniform document sample (bottom-k md5
priorities) over a token table (doc_id, tokens:array<int32>, n_tok,
source) — parquet files or an Iceberg catalog table.

Usage (production invocation shape; works on any cluster master):

    scripts/build_dist.sh
    spark-submit --master local[8] \
        --py-files dist/exaloglog_paper_spark.zip \
        jobs/heavy_hitters_job.py \
        --input /path/to/tokens.parquet --top 20 --k 256 \
        --sample-per-source 8 --output /path/to/out_dir

Emits the top tokens with the deterministic bracket
[est, est + err_bound] (est never overcounts; any token with frequency
> n/(k+1) is guaranteed present), and optionally a per-source bottom-k
document sample any engine can re-derive from md5(doc_id).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--format", default="auto", choices=["auto", "parquet", "iceberg"]
    )
    ap.add_argument("--k", type=int, default=256, help="Misra-Gries counters")
    ap.add_argument("--top", type=int, default=20, help="items to report")
    ap.add_argument(
        "--sample-per-source", type=int, default=0,
        help="also emit a fixed-size per-source doc sample (0 = off)",
    )
    ap.add_argument("--output", default="", help="optional parquet out dir")
    args = ap.parse_args()

    import numpy as np

    from exaloglog_paper_spark.ops.agg import sketch_agg
    from exaloglog_paper_spark.ops.source import read_tokens
    from exaloglog_paper_spark.ops.specs import (
        BottomKSampleSpec,
        MisraGriesSpec,
        md5_priority_values,
        token_array_ids,
    )

    spark = SparkSession.builder.appName("heavy_hitters_job").getOrCreate()
    df = read_tokens(spark, args.input, fmt=args.format)

    spec = MisraGriesSpec(k=args.k)
    row = sketch_agg(df, spec, token_array_ids("tokens")).collect()[0]
    mg = spec.deserialize(bytes(row.sketch))
    top = mg.top_items(args.top)
    hh = spark.createDataFrame(
        [(int(t), int(c), float(c), float(c + mg.err_bound)) for t, c in top],
        "token long, est long, count_lo double, count_hi double",
    )
    print(f"n={mg.n} err_bound={mg.err_bound:.1f} "
          f"guaranteed_present_above={mg.n / (spec.cfg.k + 1):.1f}")
    hh.show(args.top, truncate=False)
    if args.output:
        hh.write.mode("overwrite").parquet(f"{args.output}/heavy_hitters")

    if args.sample_per_source > 0:
        kk = args.sample_per_source
        dig = F.md5(F.col("doc_id").cast("string"))
        keyed = df.select(
            "source",
            "doc_id",
            F.conv(F.substring(dig, 1, 8), 16, 10).cast("long").alias("prio_hi"),
            F.conv(F.substring(dig, 9, 8), 16, 10).cast("long").alias("prio_lo"),
        )
        sspec = BottomKSampleSpec(k=kk)
        states = sketch_agg(keyed, sspec, md5_priority_values(), by=["source"]).collect()
        rows = []
        for r in states:
            for p in sspec.deserialize(bytes(r.sketch)):
                v = int(p)
                rows.append((r.source, v >> 32, v & 0xFFFFFFFF))
        winners = spark.createDataFrame(
            rows, "source string, prio_hi long, prio_lo long"
        )
        sample = (
            keyed.join(F.broadcast(winners), ["source", "prio_hi", "prio_lo"])
            .select("source", "doc_id")
            .orderBy("source", "doc_id")
        )
        sample.show(50, truncate=False)
        if args.output:
            sample.write.mode("overwrite").parquet(f"{args.output}/doc_sample")

    spark.stop()


if __name__ == "__main__":
    main()
