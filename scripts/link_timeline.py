"""Job-timeline forensics for the bench link legs (guide §1): mirror
bench.py's model-load + cache + warmup + timed-link methodology with the
event log on, then print per-job wall, task counts, and inter-job gaps.

  python scripts/link_timeline.py [--blocked] [--reps N]

NOT the driver contract; optimization-round tooling only.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

EVDIR = "/tmp/spark-events-link"


def main():
    blocked = "--blocked" in sys.argv
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 2

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from spacy_ann_linker_spark.session import get_spark

    spark = get_spark(
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )

    from pyspark.sql import functions as F

    from spacy_ann_linker_spark.data.transcripts import generate_full
    from spacy_ann_linker_spark.link.linker import release_memos
    from spacy_ann_linker_spark.pipeline import LinkageModel, build_golden_model, link_transcripts

    n_turns = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "100000"))
    tpath = f"/tmp/bench_transcripts_n{n_turns}"
    if not os.path.exists(tpath):
        generate_full(spark, n_turns).write.mode("overwrite").parquet(tpath)
    full = spark.read.parquet(tpath)
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

    walls = []
    for i in range(reps):
        release_memos()
        spark.sparkContext.setJobDescription(f"link:rep{i}")
        t0 = time.perf_counter()
        link_transcripts(
            model, turns, mentions=mentions, fuzzy_rescue=True, use_blocking=blocked
        ).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    spark.stop()

    jobs = {}
    paths = []
    for root, _dirs, files in os.walk(EVDIR):
        paths += [f"{root}/{f}" for f in files if "appstatus" not in f]
    for fn in paths:
        for line in open(fn):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties", {}) or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description", "")[:70],
                    "ntasks": sum(
                        s.get("Number of Tasks", 0) for s in ev.get("Stage Infos", [])
                    ),
                    "nstages": len(ev.get("Stage IDs", [])),
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
    print(f"# walls: {walls}")
    prev_end = None
    total_gap = {}
    for jid in sorted(jobs):
        j = jobs[jid]
        if "end" not in j:
            continue
        gap = (j["start"] - prev_end) if prev_end is not None else 0
        prev_end = j["end"]
        rep = j["desc"].split(":rep")[-1][:1] if ":rep" in j["desc"] else "?"
        total_gap[rep] = total_gap.get(rep, 0) + max(gap, 0)
        print(
            f"job {jid:3d} {(j['end'] - j['start']) / 1000:7.2f}s gap {gap / 1000:6.2f}s "
            f"stages {j['nstages']:2d} tasks {j['ntasks']:4d}  {j['desc']}"
        )
    print(f"# inter-job gap sum per rep (ms): {total_gap}")


if __name__ == "__main__":
    main()
