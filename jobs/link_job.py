"""spark-submit entry point for the linkage pipeline (north_rule: "runs via
spark-submit --py-files on multi-executor clusters").

    spark-submit --master <master> \\
        --py-files spacy_ann_linker_spark.zip \\
        jobs/link_job.py --turns-path <parquet> --mentions-path <parquet> \\
        --output <dir> --checkpoint <dir> [--n-synthetic N]

With --n-synthetic the job generates its own deterministic transcript +
mention tables first (sandbox mode); otherwise it reads the given parquet
paths (cluster mode — the Iceberg-table read would replace spark.read.parquet
here). Every stage checkpoints under --checkpoint and the job resumes from
the last committed stage on re-run.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--turns-path")
    p.add_argument("--mentions-path")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--n-synthetic", type=int, default=0)
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--min-df", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    spark = SparkSession.builder.appName("spacy_ann_linker_spark.link").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from pyspark.sql import functions as F

    from spacy_ann_linker_spark.data.transcripts import generate_full
    from spacy_ann_linker_spark.pipeline import run_checkpointed_linkage

    if args.n_synthetic:
        full = generate_full(spark, args.n_synthetic, seed=args.seed)
        turns = full.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        mentions = full.filter(F.col("mention").isNotNull()).select(
            "conv_id",
            "turn_idx",
            F.xxhash64("conv_id", "turn_idx", "start").alias("mention_id"),
            F.col("mention").alias("text"),
            "start",
            "end",
            F.lit(None).cast("string").alias("label"),
        )
        snapshot = f"synthetic:{args.n_synthetic}:{args.seed}"
    else:
        from spacy_ann_linker_spark.plans.checkpoint import path_snapshot

        turns = spark.read.parquet(args.turns_path)
        mentions = spark.read.parquet(args.mentions_path)
        # data identity, not path strings: re-running after the parquet at
        # the same path changed must invalidate committed stages
        snapshot = f"{path_snapshot(args.turns_path)}|{path_snapshot(args.mentions_path)}"

    clusters = run_checkpointed_linkage(
        spark,
        args.checkpoint,
        turns,
        mentions,
        input_snapshot=snapshot,
        threshold=args.threshold,
        min_df=args.min_df,
    )
    clusters.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"link_job: wrote {n} cluster rows to {args.output}")


if __name__ == "__main__":
    main()
