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




def _make_cut(spark, checkpoint_dir: str | None, prefix: str):
    """The cc.py lineage-cut contract, shared by the iterative graph
    operators: localCheckpoint by default, uuid-namespaced reliable
    parquet round files when checkpoint_dir is given."""
    run_dir = None
    if checkpoint_dir is not None:
        import uuid

        run_dir = f"{checkpoint_dir.rstrip('/')}/{prefix}_{uuid.uuid4().hex}"

    def _cut(df: DataFrame, tag: str) -> DataFrame:
        if run_dir is None:
            return df.localCheckpoint(eager=True)
        path = f"{run_dir}/{tag}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    return _cut


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Power-iteration PageRank over a DIRECTED edge list (symmetrize first
    for undirected pair graphs; PARALLEL EDGES ARE DEDUPED — multiplicity
    does not weight the walk, pre-aggregate to a weighted variant if it
    should), exactly `n_iter` iterations from the uniform start 1/N:

        rank'(v) = (1 - d) / N + d * (sum over in-neighbors u of
                   rank(u) / out_degree(u)  +  dangling_mass / N)

    Dangling nodes (no out-edges) spread their rank uniformly — the
    standard stochastic-matrix completion, so total rank stays 1 every
    iteration (asserted in tests).

    Scale shape per iteration: ONE equi-join of the rank vector onto the
    deg-carrying edge list (rank rows are (node, double) — narrow), one
    map-side-combined groupBy(dst) sum, one narrow semi-join aggregate for
    the dangling mass over the STATIC dangling-node set — the out-degree
    join happens once before the loop (deg rides the edge list: 8 bytes
    per edge buys never rebuilding ranks x out_degree twice per round).
    Lineage is cut per iteration (the cc.py round discipline — without it
    the plan doubles per iteration); `checkpoint_dir` swaps the
    unreplicated localCheckpoint blocks for reliable parquet round files
    (executor-loss-safe, uuid-namespaced per run like cc.py). Driver work
    is O(n_iter) tiny actions; ranks never collect. Deterministic: fixed
    iterations, no sampling, floating sums under round-at-output
    tolerance. An empty edge list returns an empty (node, rank) frame.
    -> (node, rank), sum(rank) == 1."""
    from pyspark.sql import Window

    _cut = _make_cut(edges.sparkSession, checkpoint_dir, "pr")
    # materialize the edge list ONCE, deg already riding it: every
    # iteration joins against it, and an upstream pair-generation subtree
    # (an LSH/Jaccard self-join) would otherwise re-execute per round.
    # out_degree is a window over src on the deduped edges — one exchange
    # in the same cut job, where the former groupBy + join-back shape cost
    # a second eager cut (the edges-then-edges_deg pair) before the loop
    # could start
    e_deg = _cut(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .withColumn("deg", F.count(F.lit(1)).over(Window.partitionBy("src"))),
        "edges_deg",
    )
    nodes = _cut(
        e_deg.select(F.col("src").alias("node"))
        .union(e_deg.select(F.col("dst").alias("node")))
        .distinct(),
        "nodes",
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    # the dangling-node SET is static (only its rank mass changes per
    # round); when it is statically EMPTY — every symmetrized pair graph,
    # since each node then has an out-edge — the per-round dangling-mass
    # aggregate (a full scan of the rank vector + a broadcast per
    # iteration) is a constant 0.0 and is skipped entirely. x + 0.0 is
    # IEEE-identical to x for the non-negative inflows here, so the
    # result is bit-equal to the general path (oracle-verified).
    dangling_nodes = _cut(
        nodes.join(
            e_deg.select(F.col("src").alias("node")), "node", "left_anti"
        ),
        "dangling",
    )
    has_dangling = dangling_nodes.limit(1).count() > 0
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    # dangling-free graphs cut lineage every SECOND iteration: the rank
    # vector is then referenced exactly once per round (the contrib join),
    # so a depth-2 plan re-executes nothing, and every skipped cut saves a
    # materialization barrier — locally a driver action + its AQE jobs, at
    # scale a full rank-vector write+read on the reliable path. With
    # dangling nodes the vector feeds TWO consumers per round (contrib +
    # dangling mass), so the per-iteration cut stays: an uncut round would
    # re-execute its join+aggregate once per consumer.
    cut_stride = 1 if has_dangling else 2
    for i in range(n_iter):
        contrib = (
            e_deg.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        update = nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
        if has_dangling:
            dangling = (
                ranks.join(dangling_nodes, "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            )
            update = update.crossJoin(F.broadcast(dangling))
            dm_over_n = F.col("dm") / n
        else:
            dm_over_n = F.lit(0.0)
        ranks = update.select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce("inflow", F.lit(0.0)) + dm_over_n)
            ).alias("rank"),
        )
        if (i + 1) % cut_stride == 0 or i == n_iter - 1:
            # no explicit repartition: the join already hash-partitions by
            # node and AQE coalesces small post-shuffle partitions — an
            # extra exchange per round costs more than it saves
            ranks = _cut(ranks, f"round_{i}")
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
    checkpoint_dir: str | None = None,
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
    -> (node, label) — label NULL where the graph never reached.

    `checkpoint_dir` swaps the per-round localCheckpoint lineage cuts for
    reliable parquet files (executor-loss-safe; the cc.py contract)."""
    _cut = _make_cut(nodes.sparkSession, checkpoint_dir, "lp")
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    # one materialization — the per-round support join must not re-execute
    # the upstream pair-generation subtree (the pagerank discipline)
    e = _cut(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")),
        "edges",
    )
    # the clamped seed label RIDES the round table as a third column — the
    # seeds frame would otherwise re-join onto every round's output (a
    # static-table join per iteration, one extra hash join of the full
    # node set each round at any scale); carrying the 1-column payload on
    # the (node, label) vector costs only its bytes in the round cut
    seeds = _cut(
        nodes.select(
            F.col(node_col).alias("node"), F.col(label_col).alias("seed_label")
        ),
        "seeds",
    )
    cur = seeds.select(
        "node", F.col("seed_label").alias("label"), "seed_label"
    )
    for i in range(n_iter):
        support = (
            e.join(
                cur.filter(F.col("label").isNotNull()).select(
                    F.col("node").alias("src"), "label"
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
        cur = _cut(
            cur.join(best, "node", "left")
            .select(
                "node",
                F.coalesce(
                    "seed_label", "new_label", "label"
                ).alias("label"),
                "seed_label",
            ),
            f"round_{i}",
        )
    return cur.select("node", "label")
