"""Golden KB fixture loaders.

The 15-entity / 18-alias tutorial KB is the reference's own test corpus
(examples/tutorial/data/{entities,aliases}.jsonl, tests/conftest.py:12-20) —
ported verbatim as DATA (FIXTURES.md §2-3), re-serialized with sorted keys.
All parity goldens (a3/a15/a1 linking; research->a15) run against it.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from spacy_ann_linker_spark.schemas import ALIAS_SCHEMA, ENTITY_SCHEMA


def _read_golden_kb() -> dict:
    """Zip-safe package-data read (the engine ships as a --py-files zip,
    where __file__-relative open() fails)."""
    from importlib.resources import files

    text = files("spacy_ann_linker_spark.data").joinpath("golden_kb.json").read_text()
    return json.loads(text)


def read_resource_jsonl(name: str) -> list[dict]:
    """Golden-KB record lists by section name ('golden_entities.jsonl' /
    'golden_aliases.jsonl' kept as logical names for callers)."""
    doc = _read_golden_kb()
    return doc["entities"] if "entities" in name else doc["aliases"]


def _local_relation(spark: SparkSession, rows: list[dict], cols, schema) -> DataFrame:
    """Fixture rows as a JVM LocalRelation (Arrow/pandas route). A
    createDataFrame over a plain python list plans as a pickled LogicalRDD
    whose every scan — e.g. each broadcast build of the alias tables in a
    link plan — round-trips a Python worker per parallelize slice
    (measured ~8 CPU-s per action); the pandas route hands Spark one Arrow
    batch instead, identical rows + schema."""
    import pandas as pd

    pdf = pd.DataFrame([tuple(r.get(c) for c in cols) for r in rows], columns=cols)
    return spark.createDataFrame(pdf, schema)


def load_entities(spark: SparkSession, path: str | None = None) -> DataFrame:
    """S1: JSONL entity scan with explicit schema (cli/create_index.py:57).
    With a path, reads via spark.read.json and attaches `_file_pos` at scan
    time so F7 first-wins dedup is file-order-deterministic under any later
    repartitioning; default loads the packaged golden fixture (zip-safe)."""
    if path is not None:
        from spacy_ann_linker_spark.kb.build import with_file_order

        return with_file_order(spark.read.schema(ENTITY_SCHEMA).json(path))
    rows = _read_golden_kb()["entities"]
    cols = [f.name for f in ENTITY_SCHEMA.fields]
    return _local_relation(spark, rows, cols, ENTITY_SCHEMA)


def load_aliases(spark: SparkSession, path: str | None = None) -> DataFrame:
    """S2: JSONL alias scan with explicit schema (cli/create_index.py:58)."""
    if path is not None:
        return spark.read.schema(ALIAS_SCHEMA).json(path)
    rows = _read_golden_kb()["aliases"]
    cols = [f.name for f in ALIAS_SCHEMA.fields]
    return _local_relation(spark, rows, cols, ALIAS_SCHEMA)
