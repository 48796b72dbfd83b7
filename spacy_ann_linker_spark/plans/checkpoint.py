"""Stage checkpointing with lineage + metrics — mid-pipeline resume.

north_rule: "Each stage checkpoints ... with per-partition lineage and
metrics tables so the job resumes mid-pipeline." The reference's analog is
its serialized model dir (`nlp.to_disk`, cfg/kb/index files,
candidate_generator.py:325-346) — an all-or-nothing pickle. Here every stage
is a table commit with a fingerprint, so a re-run skips stages whose inputs
haven't changed and a killed job resumes from the last committed stage.

Backend is parquet + a JSON manifest per stage (Iceberg jars are not in this
container; the commit protocol below — write to staging path, fsync
manifest last — is the swap point for an Iceberg catalog's atomic snapshot
commit; the API would not change).

Layout under root/:
    <stage>/data/...parquet        committed stage output
    <stage>/manifest.json          fingerprint, row count, timing
    _lineage/lineage.jsonl         append-only (stage, fingerprint,
                                   rows_out, partitions, wall_sec, ts)
    _metrics/metrics.jsonl         append-only (stage, metric, value, ts)
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def _fingerprint(obj) -> str:
    import hashlib

    return hashlib.blake2b(
        json.dumps(obj, sort_keys=True, default=str).encode(), digest_size=12
    ).hexdigest()


def path_snapshot(path: str) -> str:
    """Data-identity fingerprint of an input file/directory: sorted
    (relative path, size, mtime_ns) of every file. A re-run after the data at
    the SAME path changed gets a different fingerprint, so committed stages
    correctly invalidate (path strings alone would silently resume on stale
    data). On an object store this is the listing the table format already
    maintains — an Iceberg snapshot id replaces it 1:1."""
    if not os.path.exists(path):
        return _fingerprint({"missing": path})
    entries = []
    if os.path.isfile(path):
        st = os.stat(path)
        entries.append((os.path.basename(path), st.st_size, st.st_mtime_ns))
    else:
        for root_, _, files in os.walk(path):
            for fn in files:
                p = os.path.join(root_, fn)
                st = os.stat(p)
                entries.append((os.path.relpath(p, path), st.st_size, st.st_mtime_ns))
    return _fingerprint(sorted(entries))


def df_snapshot(df: DataFrame) -> str:
    """Content fingerprint of a SMALL DataFrame (KB entity/alias tables): row
    count + order-independent xor of per-row xxhash64 over all columns. One
    aggregate action — only for dimension-sized inputs; fact-table inputs use
    path_snapshot (no full scan)."""
    from pyspark.sql import functions as F

    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c).cast("string") for c in df.columns])).alias("s"),
    ).collect()[0]
    return _fingerprint({"n": row["n"], "s": row["s"]})


@dataclass
class CheckpointManager:
    spark: SparkSession
    root: str
    run_id: str = "run"
    _log: list = field(default_factory=list)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "manifest.json")

    def _append(self, name: str, row: dict) -> None:
        d = os.path.join(self.root, f"_{name}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{name}.jsonl"), "a") as f:
            f.write(json.dumps(row, sort_keys=True) + "\n")

    def metric(self, stage: str, metric: str, value) -> None:
        self._append("metrics", {"stage": stage, "metric": metric, "value": value, "ts": time.time()})

    def is_committed(self, stage: str, fingerprint: str) -> bool:
        mp = self._manifest_path(stage)
        if not os.path.exists(mp):
            return False
        with open(mp) as f:
            m = json.load(f)
        return m.get("fingerprint") == fingerprint and m.get("committed") is True

    def stage(
        self,
        name: str,
        inputs: dict,
        build: Callable[[], DataFrame],
    ) -> DataFrame:
        """Run (or resume) one stage.

        inputs: anything JSON-able describing upstream state (config values,
        upstream stage fingerprints, input snapshot ids). If a committed
        manifest with the same fingerprint exists, the stage is SKIPPED and
        its table read back; otherwise build() runs, the output commits, and
        lineage/metrics rows are appended.
        """
        fp = _fingerprint(inputs)
        data_dir = os.path.join(self._stage_dir(name), "data")
        if self.is_committed(name, fp):
            self._append(
                "lineage",
                {"stage": name, "fingerprint": fp, "event": "resume-skip", "run_id": self.run_id, "ts": time.time()},
            )
            return self.spark.read.parquet(data_dir)

        t0 = time.perf_counter()
        df = build()
        staging = os.path.join(self._stage_dir(name), "_staging")
        shutil.rmtree(staging, ignore_errors=True)
        df.write.mode("overwrite").parquet(staging)
        out = self.spark.read.parquet(staging)
        rows = out.count()
        n_parts = out.rdd.getNumPartitions()
        # commit protocol: (1) INVALIDATE any stale manifest first — a kill
        # between the data-dir swap and the new manifest write must never
        # leave a manifest asserting a committed stage whose data is gone;
        # (2) move data into place; (3) write the new manifest LAST (the
        # atomicity point; Iceberg snapshot commit replaces this block)
        mp = self._manifest_path(name)
        if os.path.exists(mp):
            os.remove(mp)
        shutil.rmtree(data_dir, ignore_errors=True)
        os.replace(staging, data_dir)
        wall = time.perf_counter() - t0
        manifest = {
            "stage": name,
            "fingerprint": fp,
            "rows": rows,
            "partitions": n_parts,
            "wall_sec": round(wall, 3),
            "run_id": self.run_id,
            "committed": True,
        }
        os.makedirs(self._stage_dir(name), exist_ok=True)
        with open(self._manifest_path(name), "w") as f:
            json.dump(manifest, f, sort_keys=True)
        self._append(
            "lineage",
            {"stage": name, "fingerprint": fp, "event": "commit", "rows_out": rows,
             "partitions": n_parts, "wall_sec": round(wall, 3), "run_id": self.run_id, "ts": time.time()},
        )
        self.metric(name, "rows_out", rows)
        self.metric(name, "wall_sec", round(wall, 3))
        return self.spark.read.parquet(data_dir)

    def fingerprint_of(self, stage: str) -> str | None:
        mp = self._manifest_path(stage)
        if not os.path.exists(mp):
            return None
        with open(mp) as f:
            return json.load(f).get("fingerprint")

    def lineage(self) -> DataFrame:
        return self.spark.read.json(os.path.join(self.root, "_lineage", "lineage.jsonl"))

    def metrics(self) -> DataFrame:
        return self.spark.read.json(os.path.join(self.root, "_metrics", "metrics.jsonl"))
