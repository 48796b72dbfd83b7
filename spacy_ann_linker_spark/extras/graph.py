"""Graph signal operators over pair/link graphs.

PageRank here is a PRIOR computation for entity resolution: the reference
assigns uniform priors per alias (kb/build.py J6) and extras/profiling.py
adds time-decayed counts; the link graph itself carries a third signal —
an entity (or canonical document) referenced by many well-referenced
neighbors matters more than raw degree says. Power iteration with a FIXED
iteration count keeps the operator deterministic (no convergence-dependent
result), which is what makes it driver-oracle-checkable cross-engine: the
DuckDB oracle unrolls the same iterations as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over a DIRECTED edge list (symmetrize first
    for undirected pair graphs), exactly `n_iter` iterations from the
    uniform start 1/N:

        rank'(v) = (1 - d) / N + d * (sum over in-neighbors u of
                   rank(u) / out_degree(u)  +  dangling_mass / N)

    Dangling nodes (no out-edges) spread their rank uniformly — the
    standard stochastic-matrix completion, so total rank stays 1 every
    iteration (asserted in tests).

    Scale shape per iteration: one equi-join of the rank vector onto the
    edge list (rank rows are (node, double) — narrow), one map-side-combined
    groupBy(dst) sum, one one-row dangling aggregate broadcast; lineage is
    cut per iteration with localCheckpoint (the cc.py round discipline —
    without it the plan doubles per iteration). Driver work is O(n_iter)
    tiny actions; ranks never collect. Deterministic: fixed iterations,
    no sampling, floating sums under round-at-output tolerance.
    -> (node, rank), sum(rank) == 1."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        with_deg = ranks.join(
            out_deg.withColumnRenamed("src", "node"), "node", "left"
        )
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        contrib = (
            e.join(
                with_deg.filter(F.col("deg").isNotNull()).withColumnRenamed(
                    "node", "src"
                ),
                "src",
            )
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce("inflow", F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
