"""Connected components via alternating large-star / small-star.

Absent in the reference (each mention links independently) — added per
BASELINE.json north_rule (SURVEY.md J9). Algorithm is the public
Kiveris/Lattanzi/Mirrokni/Rastogi/Vassilvitskii "Connected Components in
MapReduce and Beyond" (SOCC'14) alternation, which converges in O(log^2 n)
rounds on any graph and is the standard shuffle-friendly CC at web scale:

    large-star: every node's higher-id neighbors re-point to its minimum
    small-star: every node's lower-or-equal neighbors collapse to the minimum

Each round is two groupBy shuffles over the edge set; lineage is cut every
iteration with localCheckpoint (d: SURVEY.md §4 — iterative plans otherwise
grow an exponential Catalyst tree). Convergence is detected by an edge-set
checksum fixpoint, which adds one tiny aggregate action per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    # NOTE: returns a MULTISET (<= 2|E| rows, duplicates where several
    # neighbors re-point to the same min) — the one distinct per round runs
    # at the end of _small_star, whose output is the round's edge set; a
    # distinct here too was a full extra exchange per round for a set the
    # next aggregation absorbs anyway (min/groupBy are duplicate-insensitive)
    nbrs = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = nbrs.groupBy("src").agg(F.min("dst").alias("_mn"))
    mins = mins.select("src", F.least(F.col("src"), F.col("_mn")).alias("m"))
    return (
        nbrs.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    canon = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    mins = canon.groupBy("src").agg(F.min("dst").alias("m"))
    relink = (
        canon.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    star = mins.select("src", F.col("m").alias("dst"))
    return relink.union(star).distinct()


def _checksum(edges: DataFrame) -> tuple:
    # count + order-independent xor fingerprint (no overflow under ANSI mode)
    row = edges.selectExpr(
        "count(1) as n", "bit_xor(xxhash64(src, dst)) as s"
    ).collect()[0]
    return (row["n"], row["s"])


def _observed_cut(df: DataFrame, cut, rnd: int) -> tuple:
    """Materialize a round's edge set through `cut` AND deliver its
    convergence checksum from the SAME action via observe() — the
    standalone _checksum job re-scanned the just-materialized edge set
    once per round, which locally is one extra job of fixed latency per
    round and at cluster scale one extra full read of the round's edge
    set. CollectMetrics accumulates during the checkpoint/write job, so
    obs.get returns immediately after the eager cut. Same (count,
    bit_xor) tuple as _checksum (bit_xor over an empty set is NULL in
    both forms)."""
    obs = Observation(f"cc_cksum_r{rnd}")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(src, dst))").alias("s"),
    )
    out = cut(observed, rnd)
    row = obs.get
    return out, (row["n"], row["s"])


def connected_components_long(
    edges: DataFrame, max_iter: int = 30, checkpoint_dir: str | None = None
) -> DataFrame:
    """edges(src, dst) of any single orderable type, undirected ->
    (node, component) where component = min node id reachable. The star
    alternation only needs min/least/greatest, so it runs unchanged on longs
    OR strings — string node ids stay strings (no 64-bit hash whose birthday
    collisions would silently merge unrelated clusters at ~4x10^9 nodes).

    checkpoint_dir: per-round lineage cuts go through a RELIABLE parquet
    write+read under this directory instead of localCheckpoint.
    localCheckpoint blocks are unreplicated executor memory — one executor
    loss anywhere in the O(log^2 n) rounds fails the whole run; the parquet
    round tables re-read after any failure, which is the right trade at
    1000-executor scale (CC rounds are edge-set-sized sequential barriers
    anyway, so the write adds no extra shuffle). Each run writes under its
    own uuid subdirectory — two runs sharing a checkpoint_dir can never
    overwrite each other's round files (the returned DataFrame reads the
    final round lazily, so a collision would silently corrupt components).
    Files persist until the caller removes the directory."""
    spark = edges.sparkSession
    run_dir = None
    if checkpoint_dir is not None:
        import uuid

        run_dir = f"{checkpoint_dir.rstrip('/')}/cc_{uuid.uuid4().hex}"

    def _cut(df: DataFrame, rnd: int) -> DataFrame:
        if run_dir is None:
            return df.localCheckpoint(eager=True)
        path = f"{run_dir}/cc_round_{rnd}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    e = _cut(e, 0)

    # round outputs are materialized at whatever partitioning the final
    # distinct's AQE-coalesced exchange produced — size-adaptive by
    # construction (small graphs coalesce to a handful of blocks, large
    # ones keep ~advisory-sized partitions). An explicit per-round
    # repartition(parts, "src") used to follow the distinct purely to
    # right-size checkpoint blocks: a full extra exchange of the edge set
    # EVERY round that AQE's byte-based coalescing already handles, and
    # whose hash partitioning the next round immediately destroys (the
    # large-star union re-keys by both endpoints).
    prev = None
    for i in range(max_iter):
        e, cur = _observed_cut(_small_star(_large_star(e)), _cut, i + 1)
        if cur == prev:
            break
        prev = cur
    # converged edge set is a star forest: src -> component root
    members = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("node"), F.col("dst").alias("component"))
    return members.union(roots).distinct()


def incremental_components(
    prev: DataFrame,
    new_edges: DataFrame,
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fold a NEW batch of edges into an existing component assignment
    WITHOUT re-clustering the world — the production ER pattern (yesterday's
    10^10-node clustering is an artifact; today's batch must not recompute
    it).

    prev: (node, component) — a prior connected_components_long output
    (component = min reachable node id). new_edges: (src, dst), may touch
    old nodes, brand-new nodes, or bridge old clusters.
    -> (node, component) over the FULL universe (old nodes + new endpoints),
    identical to recomputing CC over (prev's implied edges ∪ new_edges) —
    equality is tested against exactly that on random graphs.

    Graph contraction: each old cluster is one supernode (its component id
    — which IS the cluster's min node id, so min-of-mins lifts back to the
    global min and the component-id semantics stay stable under merges).
    The star alternation therefore runs on new-batch-sized input — contracted
    new edges only — not the historical graph:

        map endpoints through prev     two hash joins, new-edge-sized
        CC on contracted edges         O(log^2) rounds over |batch| edges
        lift: universe join on cid     one join; untouched clusters keep
                                       their id (coalesce), so the historic
                                       table is scanned once, never iterated

    The lift join is keyed by old component id — one row per CLUSTER on the
    CC-result side (batch-sized, broadcastable), so a giant historic cluster
    costs its row count only in the final projection, never in the rounds."""
    mapping = prev.select(F.col("node"), F.col("component").alias("cid"))
    ends = (
        new_edges.select(F.col("src").alias("node"))
        .union(new_edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    new_nodes = ends.join(mapping.select("node"), "node", "left_anti").select(
        "node", F.col("node").alias("cid")
    )
    universe = mapping.union(new_nodes)
    contracted = (
        new_edges.join(
            universe.select(F.col("node").alias("src"), F.col("cid").alias("_ca")), "src"
        )
        .join(universe.select(F.col("node").alias("dst"), F.col("cid").alias("_cb")), "dst")
        .select(F.col("_ca").alias("src"), F.col("_cb").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    merged = connected_components_long(
        contracted, max_iter=max_iter, checkpoint_dir=checkpoint_dir
    ).select(F.col("node").alias("cid"), F.col("component").alias("_final"))
    return universe.join(merged, "cid", "left").select(
        "node", F.coalesce(F.col("_final"), F.col("cid")).alias("component")
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """String-keyed CC: edges over string node ids ->
    (node string, component string) where component = lexicographic-min
    reachable node id. Runs the alternation DIRECTLY on the strings — no
    node-id hashing (xxhash64 would begin silently merging unrelated
    clusters from birthday collisions at ~4x10^9 nodes). Singleton nodes
    never appear in `edges` and are their own component by definition —
    callers union them in if needed."""
    return connected_components_long(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")),
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
    ).select(F.col("node").cast("string").alias("node"), F.col("component").cast("string").alias("component"))
