"""Golden KB fixture loaders.

The 15-entity / 18-alias tutorial KB is the reference's own test corpus
(examples/tutorial/data/{entities,aliases}.jsonl, tests/conftest.py:12-20) —
ported verbatim as DATA (FIXTURES.md §2-3), re-serialized with sorted keys.
All parity goldens (a3/a15/a1 linking; research->a15) run against it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from spacy_ann_linker_spark.schemas import ALIAS_SCHEMA, ENTITY_SCHEMA

_DATA_DIR = os.path.dirname(os.path.abspath(__file__))

ENTITIES_JSONL = os.path.join(_DATA_DIR, "golden_entities.jsonl")
ALIASES_JSONL = os.path.join(_DATA_DIR, "golden_aliases.jsonl")


def load_entities(spark: SparkSession, path: str = ENTITIES_JSONL) -> DataFrame:
    """S1: JSONL entity scan with explicit schema (cli/create_index.py:57)."""
    return spark.read.schema(ENTITY_SCHEMA).json(path)


def load_aliases(spark: SparkSession, path: str = ALIASES_JSONL) -> DataFrame:
    """S2: JSONL alias scan with explicit schema (cli/create_index.py:58)."""
    return spark.read.schema(ALIAS_SCHEMA).json(path)
