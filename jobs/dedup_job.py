"""spark-submit entry point: near-duplicate detection over a document
corpus (doc_id, text, source).

Stages (each independently skippable):
  exact    — md5 content digests, keep-first dedup accounting
  minhash  — MinHash(8) + LSH(4x2) candidate pairs
  verify   — exact word-set Jaccard >= --threshold over the candidates
  cluster  — connected components over the verified pairs (one row per
             doc: its near-dup component). Pass --checkpoint-dir (a DFS
             path on real clusters) to make each label-propagation round
             durable/resumable; without it rounds use localCheckpoint
             (fine locally, lost on executor failure).

Usage:

    scripts/build_dist.sh
    spark-submit --master local[8] \
        --py-files dist/exaloglog_paper_spark.zip \
        jobs/dedup_job.py \
        --input /path/to/documents.parquet \
        --stage verify --threshold 0.8 --output /path/to/pairs.parquet

At cluster scale the LSH self-join shuffles only (id, band, bucket) rows
(~100 bytes/doc); AQE handles bucket skew. No pairwise cross product is
ever materialized.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession, functions as F

WORD_SPLIT_RE = "[^a-z0-9]+"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--stage",
        choices=["exact", "minhash", "verify", "cluster"],
        default="verify",
    )
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--output", default="")
    ap.add_argument(
        "--checkpoint-dir",
        default="",
        help="durable per-round checkpoint dir for --stage cluster "
        "(parquet spill; required for executor-loss resilience on real "
        "clusters)",
    )
    args = ap.parse_args()

    from exaloglog_paper_spark.ops.dedup import (
        connected_components,
        exact_duplicate_groups,
        jaccard_verified_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    spark = SparkSession.builder.appName("dedup").getOrCreate()
    docs = spark.read.parquet(args.input)
    if args.stage == "exact":
        out = exact_duplicate_groups(docs, args.text_col, args.id_col)
    else:
        words = docs.select(
            args.id_col,
            F.explode(
                F.split(F.lower(F.col(args.text_col)), WORD_SPLIT_RE)
            ).alias("word"),
        ).filter(F.col("word") != "")
        cands = lsh_candidate_pairs(minhash_signatures(words, args.id_col), args.id_col)
        if args.stage == "minhash":
            out = cands
        else:
            out = jaccard_verified_pairs(
                words, cands, args.id_col, threshold=args.threshold
            )
            if args.stage == "cluster":
                out = connected_components(
                    out, checkpoint_dir=args.checkpoint_dir or None
                )
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        print(f"rows: {out.count()}")
        out.show(20, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
