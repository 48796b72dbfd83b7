"""Deterministic synthetic KB generator — scale testing beyond the 18-alias
golden fixture. Pure function of (seed, entity index), generated distributed
(mapInPandas over spark.range), same pattern as the transcript generator.

Entities get 3-word names composed from a word pool (so aliases share
n-grams realistically: typo'd and reordered surface forms collide in the
similarity join the way real-world names do), one canonical alias + one
abbreviated alias each, and a description drawn from the same pool (drives
the mean-pool disambiguation signal)."""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_POOL = (
    "quantum neural crystal orbital vector plasma raster tensor lambda krypton "
    "argon helium carbon silicon photon hadron lepton boson quark gluon "
    "matrix kernel lattice spiral fractal vertex circuit signal filter module"
).split()


def _rng(seed: int, gid: int) -> np.random.Generator:
    h = hashlib.blake2b(f"kb:{seed}:{gid}".encode(), digest_size=8).digest()
    return np.random.default_rng(int.from_bytes(h, "big"))


def entity_record(seed: int, gid: int) -> dict:
    rng = _rng(seed, gid)
    words = [_POOL[int(rng.integers(0, len(_POOL)))] for _ in range(3)]
    name = " ".join(w.capitalize() for w in words)
    desc_words = [_POOL[int(rng.integers(0, len(_POOL)))] for _ in range(12)]
    return {
        "id": f"e{gid:07d}",
        "name": name,
        "description": " ".join(words + desc_words),
        "label": "THING",
        # canonical alias = the name; short alias = initials-ish form
        "alias1": name,
        "alias2": "".join(w[0].upper() for w in words) + str(gid % 100),
    }


def generate_kb(spark: SparkSession, n_entities: int, seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """-> (entities_df ENTITY_SCHEMA-shaped, aliases_df ALIAS_SCHEMA-shaped),
    2 aliases per entity."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([entity_record(seed, int(g)) for g in pdf["id"]])

    full = spark.range(n_entities).mapInPandas(
        gen,
        schema="id string, name string, description string, label string, alias1 string, alias2 string",
    )
    entities = full.select("id", "name", "description", "label")
    from pyspark.sql import functions as F

    aliases = (
        full.select(F.explode(F.array("alias1", "alias2")).alias("alias"), "id")
        .groupBy("alias")
        .agg(F.sort_array(F.collect_list("id")).alias("entities"))
        .withColumn(
            "probabilities",
            F.transform("entities", lambda _: F.lit(1.0) / F.size("entities")),
        )
    )
    return entities, aliases
