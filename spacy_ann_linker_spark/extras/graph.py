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
    # materialize the edge list ONCE: every iteration joins against it, and
    # an upstream pair-generation subtree (an LSH/Jaccard self-join) would
    # otherwise re-execute per round
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=True
    )
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
            # no explicit repartition: the join already hash-partitions by
            # node and AQE coalesces small post-shuffle partitions — an
            # extra exchange per round costs more than it saves
            .localCheckpoint(eager=True)
        )
    return ranks


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 3,
    node_col: str = "node",
    label_col: str = "label",
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Semi-supervised label propagation (Zhu & Ghahramani 2002, the
    graph-based weak-supervision labeler): seed nodes carry labels, the
    rest are NULL; for `n_iter` SYNCHRONOUS rounds every unlabeled-at-seed
    node takes the label with the highest summed (optionally weighted)
    support among its currently-labeled neighbors — seeds stay CLAMPED.
    The training-data use case: spread a small set of human labels
    (language, topic, quality tier) across a near-dup/similarity graph to
    label the long tail.

    Determinism is the whole design: synchronous updates + a FIXED
    iteration count + argmax ties broken by label ascending make the
    result a pure function of (graph, seeds, n_iter) — no convergence
    wobble, partition-invariant, and the DuckDB oracle just unrolls the
    rounds as chained CTEs (the pagerank discipline). A node with no
    labeled neighbor this round keeps its previous assignment (NULL until
    the frontier reaches it).

    Scale shape per round: one equi-join of the (node, label) vector onto
    the edge list, one map-side-combined groupBy((node, label)) support
    sum, one max_by per node — narrow rows throughout; lineage cut per
    round. Edges are treated as given (symmetrize for undirected graphs).
    -> (node, label) — label NULL where the graph never reached."""
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    # one materialization — the per-round support join must not re-execute
    # the upstream pair-generation subtree (the pagerank discipline)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    ).localCheckpoint(eager=True)
    seeds = nodes.select(
        F.col(node_col).alias("node"), F.col(label_col).alias("seed_label")
    ).localCheckpoint(eager=True)
    cur = seeds.select("node", F.col("seed_label").alias("label"))
    for _ in range(n_iter):
        support = (
            e.join(
                cur.filter(F.col("label").isNotNull()).withColumnRenamed(
                    "node", "src"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.sum("w").alias("sup"))
        )
        # argmax with "then smallest label": min_by over (-support, label)
        # — labels must be orderable
        best = support.groupBy("node").agg(
            F.min_by(
                F.col("label"), F.struct((-F.col("sup")).alias("ns"), F.col("label"))
            ).alias("new_label")
        )
        cur = (
            seeds.join(cur.select("node", "label"), "node")
            .join(best, "node", "left")
            .select(
                "node",
                F.coalesce(
                    "seed_label", "new_label", "label"
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return cur
