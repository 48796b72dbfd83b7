"""Benchmark driver (contract: prints ONE JSON line).

Headline: end-to-end linkage throughput (turns/sec) — synthetic transcripts
(generated once to parquet, untimed) -> gold-span mentions -> candidate
generation -> disambiguation -> links -> connected-components clusters.
Plus per-query timings of representative operators at $SPARK_GRAFT_SF_DIR.

  python bench.py                 # single run at $SPARK_GRAFT_CPUS (driver mode)
  python bench.py --scaling       # local[8] vs local[32] scaling-efficiency
                                  # protocol (BASELINE.md) via subprocesses
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


SF = _sf_from_dir(SF_DIR)
N_TURNS = max(2000, int(SF * 1_000_000))
TRANSCRIPT_PATH = f"/tmp/bench_transcripts_n{N_TURNS}"


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_bench(cpus: int) -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from spacy_ann_linker_spark.data.transcripts import generate_full
    from spacy_ann_linker_spark.pipeline import build_golden_model, cluster_links, link_transcripts
    from spacy_ann_linker_spark.session import get_spark

    spark = get_spark(app_name=f"bench[{cpus}]", cores=cpus)

    # setup (untimed): materialize transcripts + labels once per N
    if not os.path.exists(TRANSCRIPT_PATH):
        generate_full(spark, N_TURNS).write.mode("overwrite").parquet(TRANSCRIPT_PATH)
    full = spark.read.parquet(TRANSCRIPT_PATH)
    model = build_golden_model(spark, min_df=1)  # production config
    # materialize the KB/model stage tables so the timed section measures
    # linking, not index build (reference splits create_index from query too)
    model.kb.entities.cache().count()
    model.kb.alias_map.cache().count()
    model.cand.tfidf.vocab.cache().count()
    model.cand.alias_vectors.cache().count()
    model.cand.short_aliases.cache().count()

    timings: dict[str, float] = {}

    # headline: link + cluster
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
    t0 = time.perf_counter()
    links = link_transcripts(model, turns, mentions=mentions, fuzzy_rescue=True)
    links.persist()
    n_links = links.count()
    t_link = time.perf_counter() - t0
    timings["link_transcripts"] = round(t_link, 3)

    t0 = time.perf_counter()
    clusters = cluster_links(links)
    n_clusters = clusters.select("component").distinct().count()
    timings["cluster_links"] = round(time.perf_counter() - t0, 3)
    links.unpersist()

    # operator queries over the driver sf tables
    queries = entry_mod.queries()
    for name in [
        "a1_ngram_document_frequency",
        "t1_cosine_topk",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "text_quality_score",
        "sessionize_events",
        "cc_components",
    ]:
        t0 = time.perf_counter()
        _noop(queries[name](spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "bench_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF,
        "cpus": cpus,
        "n_turns": N_TURNS,
        "n_links": n_links,
        "n_clusters": n_clusters,
        "turns_per_sec": round(N_TURNS / t_link, 1),
    }


def main() -> None:
    if "--scaling" in sys.argv:
        results = {}
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--single"],
                env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)},
                capture_output=True,
                text=True,
                check=True,
            )
            results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        eff = (results[32]["turns_per_sec"] / results[8]["turns_per_sec"]) / 4.0
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency_8_to_32",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "throughput_8": results[8]["turns_per_sec"],
                    "throughput_32": results[32]["turns_per_sec"],
                    "runs": results,
                }
            )
        )
        return
    print(json.dumps(run_bench(CPUS)))


if __name__ == "__main__":
    main()
