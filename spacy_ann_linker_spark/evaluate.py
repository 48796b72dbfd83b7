"""Evaluation — pairwise F1 on labeled alias-entity pairs at shared blocking
key (BASELINE.json metric; FIXTURES.md §5).

Predicted pairs = (mention instance, entity_id) emitted by the linker.
Gold pairs      = (mention instance, gold_entity) from the label table.
Both restricted to instances whose gold block_key is non-null (the "shared
blocking key" population — mention and gold entity share the block by
construction of the generator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_f1(links: DataFrame, labels: DataFrame) -> dict:
    """links: linker output (conv_id, turn_idx, text, start, entity_id, ...)
    labels: (conv_id, turn_idx, mention, start, gold_entity, block_key, ...)
    -> {precision, recall, f1, n_pred, n_gold, n_correct}

    The join key is span identity (conv_id, turn_idx, start, text) — joining
    on text alone would cross-product repeated mention strings within a turn
    and inflate every count."""
    gold = labels.filter(F.col("block_key").isNotNull()).select(
        "conv_id", "turn_idx", "start", F.col("mention").alias("text"), "gold_entity"
    )
    pred = links.select("conv_id", "turn_idx", "start", "text", "entity_id")
    joined = pred.join(gold, ["conv_id", "turn_idx", "start", "text"], "full_outer")
    agg = joined.agg(
        F.count(F.col("entity_id")).alias("n_pred"),
        F.count(F.col("gold_entity")).alias("n_gold"),
        F.count(F.when(F.col("entity_id") == F.col("gold_entity"), 1)).alias("n_correct"),
    ).collect()[0]
    n_pred, n_gold, n_correct = agg["n_pred"], agg["n_gold"], agg["n_correct"]
    p = n_correct / n_pred if n_pred else 0.0
    r = n_correct / n_gold if n_gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {
        "precision": p,
        "recall": r,
        "f1": f1,
        "n_pred": n_pred,
        "n_gold": n_gold,
        "n_correct": n_correct,
    }
