"""F7 first-wins entity dedup must be FILE-ORDER deterministic: the
reference's "first record per id wins" is the order of entities.jsonl
(cli/create_index.py:90-91), and the engine's survivors must not change
under repartitioning, re-splitting, or parallelism (VERDICT r2 item 2)."""

import json
import os

from pyspark.sql import functions as F

from spacy_ann_linker_spark.data.golden_kb import load_entities
from spacy_ann_linker_spark.kb.build import dedup_entities, with_file_order


def _write_dup_kb(tmp_path) -> str:
    """Two JSONL files (read in lexicographic name order) with duplicate ids
    both across and within files; description marks the true file-order
    winner."""
    rows_a = [
        {"id": "e1", "name": "one", "description": "WINNER e1", "label": "X"},
        {"id": "e2", "name": "two", "description": "WINNER e2", "label": "X"},
        {"id": "e1", "name": "one-dup", "description": "loser", "label": "X"},
    ] + [
        {"id": f"pad{i}", "name": f"p{i}", "description": f"WINNER pad{i}", "label": "Y"}
        for i in range(200)
    ]
    rows_b = [
        {"id": "e2", "name": "two-dup", "description": "loser", "label": "X"},
        {"id": "e3", "name": "three", "description": "WINNER e3", "label": "X"},
        {"id": "pad7", "name": "p7-dup", "description": "loser", "label": "Y"},
    ]
    d = os.path.join(str(tmp_path), "kb")
    os.makedirs(d, exist_ok=True)
    for name, rows in [("a_entities.jsonl", rows_a), ("b_entities.jsonl", rows_b)]:
        with open(os.path.join(d, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return d


def test_dedup_survivors_stable_under_repartition(spark, tmp_path):
    d = _write_dup_kb(tmp_path)
    ents = load_entities(spark, d)  # attaches _file_pos at scan
    assert "_file_pos" in ents.columns

    results = []
    for parts in (1, 4, 16):
        out = dedup_entities(ents.repartition(parts))
        survivors = {r["id"]: r["description"] for r in out.collect()}
        results.append(survivors)
        assert "_file_pos" not in out.columns

    assert results[0] == results[1] == results[2]
    # and the survivor is the true file-order first record, not "a" survivor
    assert all(desc.startswith("WINNER") for desc in results[0].values()), results[0]
    assert len(results[0]) == 203


def test_dedup_single_partition_plain_df(spark):
    """In-memory single-partition input still dedups first-wins via MID."""
    df = spark.createDataFrame(
        [("e1", "first"), ("e1", "second"), ("e2", "only")], "id string, description string"
    ).coalesce(1)
    out = {r["id"]: r["description"] for r in dedup_entities(df).collect()}
    assert out == {"e1": "first", "e2": "only"}


def test_with_file_order_key_orders_across_files(spark, tmp_path):
    d = _write_dup_kb(tmp_path)
    ents = with_file_order(spark.read.json(d))
    first = (
        ents.orderBy(F.col("_file_pos").asc()).select("id", "description").first()
    )
    assert first["id"] == "e1" and first["description"] == "WINNER e1"
