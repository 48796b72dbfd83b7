"""Correlation clustering via KwikCluster (pivot) — the ER clustering that
does NOT over-merge chains.

Transitive closure (cluster/cc.py) merges A—B—C into one entity even when
A and C are dissimilar; on noisy pair graphs that chains whole blocks into
mega-entities. KwikCluster (Ailon, Charikar & Newman, STOC'05) is the
classic fix: pick a random pivot, cluster it WITH ITS DIRECT NEIGHBORS
ONLY, remove them, repeat — a 3-approximation to optimal correlation
clustering in expectation over the pivot order.

Distributed form: an EXACT parallel simulation of the sequential greedy
for one fixed priority order (xxhash64(node, seed), node id tie-break —
deterministic, partition-invariant), in the spirit of Chierichetti/Dalvi/
Kumar KDD'14 and the Blelloch/Fineman/Shun greedy-simulation argument:

  * a node whose priority is a LOCAL MINIMUM among still-active
    neighbors, and which holds no pending claim, is certain to be reached
    unclustered by the sequential scan -> it finalizes as a PIVOT;
  * each round's pivots stamp a CLAIM (their priority) on their active
    neighbors; claims merge by minimum across rounds — any claim on u
    necessarily has priority below u's own (else the pivot was not a
    local minimum), so a claimed node can never become a pivot;
  * a claimed node FINALIZES as a member of its best claim only once
    every remaining active neighbor has priority ABOVE the claim — until
    then a lower-priority neighbor could still pivot first sequentially
    and steal it. (This deferred-membership rule is what a naive
    "join the min pivot this round" version gets wrong; the difference is
    pytest-pinned against the sequential reference.)

Each round the globally minimum-priority unfinished node provably
finalizes, and w.h.p. a constant fraction of the frontier goes with it —
O(log n) rounds in practice, `max_iter` as the safety net.

Scale shape per round: two groupBys over the symmetrized edge list
(neighbor-min before and after pivot removal), one claim merge groupBy,
anti-joins to retire finalized endpoints — the cc.py star-round shuffle
discipline; lineage cut per round with localCheckpoint, convergence by
emptiness actions (O(log n) tiny driver reads). Iterative and
order-defined, so there is no SQL oracle surface (same status as
estimate_mu_em); correctness is pinned against the sequential reference
plus validity invariants in tests/test_correlation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    return (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def kwik_cluster(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed: int = 41,
    max_iter: int = 100,
) -> DataFrame:
    """(node, cluster): KwikCluster assignment over an undirected pair
    graph given as (src, dst) rows (direction and duplicates ignored;
    self-loops dropped). `cluster` is the pivot's node id; every node is
    its own pivot or a DIRECT neighbor of its pivot — the chain A—B—C
    cannot land A and C together unless the A—C edge exists, which is the
    point. The node universe is the edge list's endpoints (cc.py's
    contract); every endpoint gets exactly one output row. Identical to
    sequential KwikCluster in xxhash64(node, seed) priority order."""
    active = _sym(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    all_nodes = active.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    # pending claims: (node, ch, ci) = best adjacent finalized pivot so far
    claims = active.select(
        F.col("src").alias("node"),
        F.xxhash64("src", F.lit(seed)).alias("ch"),
        F.col("src").alias("ci"),
    ).limit(0)
    assigned = None

    def prio(col):
        return F.struct(F.xxhash64(col, F.lit(seed)).alias("h"), col.alias("i"))

    for _ in range(max_iter):
        active = active.localCheckpoint(eager=True)
        claims = claims.localCheckpoint(eager=True)
        if active.isEmpty() and claims.isEmpty():
            break
        nbr_min = active.groupBy("src").agg(F.min(prio(F.col("dst"))).alias("_nm"))
        pivots = (
            nbr_min.filter(prio(F.col("src")) < F.col("_nm"))
            .join(claims.select(F.col("node").alias("src")), "src", "left_anti")
            .select(F.col("src").alias("pivot"))
        )
        new_claims = (
            active.join(pivots.withColumnRenamed("pivot", "dst"), "dst")
            .groupBy("src")
            .agg(F.min(prio(F.col("dst"))).alias("_c"))
            .select(
                F.col("src").alias("node"),
                F.col("_c.h").alias("ch"),
                F.col("_c.i").alias("ci"),
            )
        )
        merged = (
            claims.unionByName(new_claims)
            .groupBy("node")
            .agg(F.min(F.struct(F.col("ch").alias("h"), F.col("ci").alias("i"))).alias("_c"))
            .select("node", F.col("_c.h").alias("ch"), F.col("_c.i").alias("ci"))
        )
        pv = pivots.select("pivot")
        active2 = (
            active.join(pv.withColumnRenamed("pivot", "src"), "src", "left_anti")
            .join(pv.withColumnRenamed("pivot", "dst"), "dst", "left_anti")
            .select("src", "dst")
        )
        # a claim finalizes once no remaining active neighbor outranks it
        nm2 = active2.groupBy("src").agg(F.min(prio(F.col("dst"))).alias("_nm2"))
        fin = merged.join(
            nm2.withColumnRenamed("src", "node"), "node", "left"
        ).filter(
            F.col("_nm2").isNull()
            | (F.struct(F.col("ch").alias("h"), F.col("ci").alias("i")) < F.col("_nm2"))
        )
        round_assign = pivots.select(
            F.col("pivot").alias("src"), F.col("pivot").alias("cluster")
        ).unionByName(fin.select(F.col("node").alias("src"), F.col("ci").alias("cluster")))
        assigned = (
            round_assign
            if assigned is None
            else assigned.unionByName(round_assign).localCheckpoint(eager=True)
        )
        claims = merged.join(fin.select("node"), "node", "left_anti")
        done = round_assign.select("src")
        active = (
            active2.join(done, "src", "left_anti")
            .join(done.withColumnRenamed("src", "dst"), "dst", "left_anti")
            .select("src", "dst")
        )
    else:
        raise RuntimeError(f"kwik_cluster did not converge in {max_iter} rounds")
    # endpoints whose neighbors were all clustered away (and who were never
    # claimed) are sequential singleton pivots
    if assigned is None:
        return all_nodes.select("node", F.col("node").alias("cluster"))
    return all_nodes.join(
        assigned.select(F.col("src").alias("node"), "cluster"), "node", "left"
    ).select("node", F.coalesce("cluster", F.col("node")).alias("cluster"))


def canopy_assign(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    score_col: str = "score",
    t_loose: float = 0.3,
    t_tight: float = 0.7,
    seed: int = 41,
    max_iter: int = 100,
) -> DataFrame:
    """Canopy clustering (McCallum, Nigam & Ungar, KDD'00) — the classic
    cheap-metric OVERLAPPING blocking stage: repeatedly take the next point
    from the list, open a canopy of everything within the LOOSE threshold,
    and remove from the list everything within the TIGHT threshold. Loose
    members stay listed, so they can join several canopies — the overlap is
    the recall mechanism (a record near two cluster cores gets compared in
    both), which disjoint blocking keys cannot express.

    Exact parallel simulation, derived from kwik_cluster rather than
    re-proved: with the deterministic priority order prio(n) =
    (xxhash64(n, seed), n),

      * the center sequence IS the greedy independent set over the TIGHT
        graph in priority order — exactly kwik_cluster's pivot set on the
        tight pairs (a point is skipped iff an earlier center already
        removed it);
      * a point's REMOVAL TIME is its kwik cluster's priority (kwik assigns
        each node to its minimum-priority adjacent pivot = the first center
        that removes it; centers remove themselves at their own turn);
      * membership: q is in canopy(c) iff loose(c, q) and
        prio(c) <= removal(q) — strictly-earlier centers see q still
        listed, and q's own remover admits it (tight implies loose since
        the thresholds cut one score column).

    Every point WITH AT LEAST ONE LOOSE EDGE lands in >= 1 canopy (its
    remover's — tight edge, or itself when it centers), matching the
    sequential guarantee over that universe; equality with a direct
    sequential reference is pytest-pinned. Scope note (ADVICE r5): the
    node universe here is derived from the loose edge list, so a node
    whose every input pair scores below t_loose has no output row —
    sequential canopy over an explicit point list would instead make it a
    singleton center. Union such isolates in as (node, node) rows if the
    caller's point universe is wider than the loose graph. Requires
    t_tight >= t_loose. -> (node, canopy) rows, OVERLAPPING by design
    (one row per membership; centers appear in their own canopy)."""
    if t_tight < t_loose:
        raise ValueError(
            f"t_tight ({t_tight}) must be >= t_loose ({t_loose}): the tight "
            "removal zone is a subset of the loose membership zone"
        )
    base = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst"), F.col(score_col).alias("s")
    )
    loose = _sym(base.filter(F.col("s") >= t_loose).select("src", "dst"))
    tight = base.filter(F.col("s") >= t_tight).select("src", "dst")

    universe = loose.select(F.col("src").alias("node")).distinct()
    removal = kwik_cluster(tight, seed=seed, max_iter=max_iter)
    removal_full = (
        universe.join(removal, "node", "left")
        .select("node", F.coalesce("cluster", F.col("node")).alias("remover"))
        .localCheckpoint(eager=True)
    )

    def prio(col):
        return F.struct(F.xxhash64(col, F.lit(seed)).alias("h"), col.alias("i"))

    centers = removal_full.filter(F.col("node") == F.col("remover")).select(
        F.col("node").alias("canopy")
    )
    # loose edges out of centers, gated on the member's removal time
    cand = (
        loose.join(centers.withColumnRenamed("canopy", "src"), "src")
        .select(F.col("src").alias("canopy"), F.col("dst").alias("node"))
        .join(removal_full, "node")
        .filter(prio(F.col("canopy")) <= prio(F.col("remover")))
        .select("node", "canopy")
    )
    self_rows = centers.select(F.col("canopy").alias("node"), "canopy")
    # non-center nodes always belong to their remover's canopy (tight edge
    # implies loose, so cand already carries it — union is for centers only)
    return cand.unionByName(self_rows).distinct()
