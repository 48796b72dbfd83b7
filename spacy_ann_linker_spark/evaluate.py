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


def cluster_pairwise_metrics(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "id",
    pred_col: str = "cluster",
    gold_col: str = "cluster",
) -> DataFrame:
    """Pairwise precision/recall/F1 of a predicted clustering against a
    gold clustering — the standard entity-resolution cluster metric, and
    the cluster-level counterpart of pairwise_f1's instance-level check.

    Never materializes pairs. Each count is a sum of C(n, 2) over group
    sizes, so the whole evaluation is three map-side-combined groupBys
    over |ids| rows — linear at 10^12-turn scale where the pair space is
    quadratic:

        pred_pairs = sum over predicted clusters c of C(|c|, 2)
        gold_pairs = sum over gold clusters g of C(|g|, 2)
        tp_pairs   = sum over contingency cells (c, g) of C(|cell|, 2)
            (a pair is a true positive iff both ids share BOTH labels,
             i.e. fall in the same contingency cell)

    Population = ids present in both tables (inner join on id). Returns a
    ONE-ROW DataFrame (tp_pairs, pred_pairs, gold_pairs, precision,
    recall, f1) — no .collect(); callers compose or .first() as needed.
    Singleton-only clusterings give 0 pairs; the 0/0 guards define those
    ratios as 0.0.
    """
    joined = pred.select(
        F.col(id_col).alias("id"), F.col(pred_col).alias("p")
    ).join(
        gold.select(F.col(id_col).alias("id"), F.col(gold_col).alias("g")),
        "id",
    )

    # C(n,2) in pure long arithmetic (`div`, not `/` — Spark's `/` on longs
    # routes through double, which silently loses exactness past 2^53 pairs)
    pairs_of_n = F.expr("(n * (n - 1)) div 2")

    def _sum_pairs(keys, alias):
        return (
            joined.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(pairs_of_n.alias("c"))
            .agg(F.coalesce(F.sum("c"), F.lit(0)).alias(alias))
        )

    pp = _sum_pairs(["p"], "pred_pairs")
    gp = _sum_pairs(["g"], "gold_pairs")
    tp = _sum_pairs(["p", "g"], "tp_pairs")
    out = tp.crossJoin(F.broadcast(pp)).crossJoin(F.broadcast(gp))
    prec = F.when(
        F.col("pred_pairs") > 0, F.col("tp_pairs") / F.col("pred_pairs")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("gold_pairs") > 0, F.col("tp_pairs") / F.col("gold_pairs")
    ).otherwise(F.lit(0.0))
    return out.select(
        "tp_pairs",
        "pred_pairs",
        "gold_pairs",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(prec + rec > 0, 2 * prec * rec / (prec + rec))
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )


def bcubed_metrics(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "id",
    pred_col: str = "cluster",
    gold_col: str = "cluster",
) -> DataFrame:
    """B-cubed precision/recall/F1 (Bagga & Baldwin 1998) — the per-ITEM
    counterpart of cluster_pairwise_metrics, and the other standard ER
    clustering metric (pairwise over-weights big clusters quadratically;
    B-cubed weighs every record once, so a mis-merged giant cluster and a
    mis-merged pair of singletons cost proportionally).

        precision = (1/N) Σ_items |C(i) ∩ G(i)| / |C(i)|
                  = (1/N) Σ_cells n_cg² / n_c
        recall    = (1/N) Σ_cells n_cg² / n_g

    where n_cg is the contingency-cell count for (pred cluster c, gold
    cluster g). The identity turns the per-item sum into ONE
    map-side-combined groupBy(p, g) over N rows; cluster sizes n_c / n_g
    are then re-derived from the CELL table (|cells| ≤ |clusters|² but in
    practice ≈ |clusters| — orders of magnitude below N), so nothing past
    the first aggregation touches N rows again. Population = inner join on
    id, as in cluster_pairwise_metrics. Returns ONE row
    (n_items, bcubed_precision, bcubed_recall, bcubed_f1); empty input
    yields 0.0 metrics, not nulls."""
    joined = pred.select(
        F.col(id_col).alias("id"), F.col(pred_col).alias("p")
    ).join(
        gold.select(F.col(id_col).alias("id"), F.col(gold_col).alias("g")),
        "id",
    )
    cells = joined.groupBy("p", "g").agg(F.count(F.lit(1)).alias("n"))
    psz = cells.groupBy("p").agg(F.sum("n").alias("np"))
    gsz = cells.groupBy("g").agg(F.sum("n").alias("ng"))
    agg = (
        cells.join(psz, "p")
        .join(gsz, "g")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("n_items"),
            F.coalesce(F.sum(F.col("n") * F.col("n") / F.col("np")), F.lit(0.0)).alias("sp"),
            F.coalesce(F.sum(F.col("n") * F.col("n") / F.col("ng")), F.lit(0.0)).alias("sg"),
        )
    )
    prec = F.when(F.col("n_items") > 0, F.col("sp") / F.col("n_items")).otherwise(F.lit(0.0))
    rec = F.when(F.col("n_items") > 0, F.col("sg") / F.col("n_items")).otherwise(F.lit(0.0))
    return agg.select(
        "n_items",
        prec.alias("bcubed_precision"),
        rec.alias("bcubed_recall"),
        F.when(prec + rec > 0, 2 * prec * rec / (prec + rec))
        .otherwise(F.lit(0.0))
        .alias("bcubed_f1"),
    )


def cluster_agreement_metrics(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "id",
    pred_col: str = "cluster",
    gold_col: str = "cluster",
) -> DataFrame:
    """Adjusted Rand Index + V-measure (homogeneity / completeness) — the
    chance-corrected and entropy-based cluster-agreement metrics, rounding
    out the metric family (pairwise P/R/F1 over-rewards big clusters,
    B-cubed weighs items, ARI corrects for chance agreement, V-measure is
    insensitive to cluster COUNT mismatch).

    Everything derives from the same contingency-cell table the other two
    metrics use: ONE map-side-combined groupBy(p, g) over the N joined
    rows; every later aggregate runs over |cells| (≈ |clusters|, orders of
    magnitude below N). No pair materialization, no second pass over N.

    ARI (Hubert & Arabie 1985), in pair-confusion form with sklearn's
    degenerate-case convention: tp = Σ_cells C(n,2), fp = pred_pairs − tp,
    fn = gold_pairs − tp, tn = C(N,2) − tp − fp − fn;
        ARI = 2(tp·tn − fn·fp) / ((tp+fn)(fn+tn) + (tp+fp)(fp+tn))
    and ARI := 1.0 when fp = fn = 0 (identical partitions, incl. the
    all-singleton / single-cluster trivia where the denominator is 0).
    Pair counts are exact longs; the ARI ratio itself is computed in
    double (pair products overflow int64 past ~10^9 items — the METRIC
    loses nothing, its inputs are already ratios of ~N² quantities).

    V-measure (Rosenberg & Hirschberg 2007), natural-log entropies over
    the same cells:
        homogeneity  = 1 − H(g|p)/H(g)   (:= 1.0 when H(g) = 0)
        completeness = 1 − H(p|g)/H(p)   (:= 1.0 when H(p) = 0)
        v_measure    = 2hc/(h+c)         (:= 0.0 when h + c = 0)

    Population = inner join on id (as the sibling metrics). Empty input
    returns n_items=0 with ari=1.0 and h=c=1.0, v=1.0 (the degenerate
    "identical empty partitions" reading — documented, not sklearn, which
    raises on empty input). Returns ONE row (n_items, ari, homogeneity,
    completeness, v_measure)."""
    joined = pred.select(
        F.col(id_col).alias("id"), F.col(pred_col).alias("p")
    ).join(
        gold.select(F.col(id_col).alias("id"), F.col(gold_col).alias("g")),
        "id",
    )
    cells = joined.groupBy("p", "g").agg(F.count(F.lit(1)).alias("n"))
    psz = cells.groupBy("p").agg(F.sum("n").alias("np"))
    gsz = cells.groupBy("g").agg(F.sum("n").alias("ng"))

    pairs_of = lambda c: (F.col(c) * (F.col(c) - 1)) / 2  # noqa: E731 — double on purpose

    agg = (
        cells.join(psz, "p")
        .join(gsz, "g")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("n_items"),
            F.coalesce(F.sum(pairs_of("n")), F.lit(0.0)).alias("tp"),
            # Σ_cells C(np,2)·(n/np) = Σ_p C(np,2): cell-weighted so the
            # marginal pair sums come out of the SAME single aggregate
            F.coalesce(
                F.sum(pairs_of("np") * F.col("n") / F.col("np")), F.lit(0.0)
            ).alias("pred_pairs"),
            F.coalesce(
                F.sum(pairs_of("ng") * F.col("n") / F.col("ng")), F.lit(0.0)
            ).alias("gold_pairs"),
            # entropies: H(g) = −Σ_g (ng/N)ln(ng/N), computed cell-weighted
            # the same way; conditional H(g|p) = −Σ_cells (n/N)ln(n/np)
            F.coalesce(
                F.sum(-F.col("n") * F.log(F.col("ng"))), F.lit(0.0)
            ).alias("hg_num"),
            F.coalesce(
                F.sum(-F.col("n") * F.log(F.col("np"))), F.lit(0.0)
            ).alias("hp_num"),
            F.coalesce(
                F.sum(-F.col("n") * F.log(F.col("n"))), F.lit(0.0)
            ).alias("hcell_num"),
        )
    )
    n = F.col("n_items").cast("double")
    # H(X) = ln N − (1/N) Σ n_x ln n_x ; H(g|p) = (1/N)(Σ n ln np − Σ n ln n)
    hg = F.when(n > 0, F.log(n) + F.col("hg_num") / n).otherwise(F.lit(0.0))
    hp = F.when(n > 0, F.log(n) + F.col("hp_num") / n).otherwise(F.lit(0.0))
    hg_given_p = F.when(n > 0, (F.col("hcell_num") - F.col("hp_num")) / n).otherwise(F.lit(0.0))
    hp_given_g = F.when(n > 0, (F.col("hcell_num") - F.col("hg_num")) / n).otherwise(F.lit(0.0))
    homog = F.when(hg > 0, 1.0 - hg_given_p / hg).otherwise(F.lit(1.0))
    compl = F.when(hp > 0, 1.0 - hp_given_g / hp).otherwise(F.lit(1.0))

    tp = F.col("tp")
    fp = F.col("pred_pairs") - tp
    fn = F.col("gold_pairs") - tp
    tn = n * (n - 1) / 2 - F.col("pred_pairs") - F.col("gold_pairs") + tp
    ari = F.when((fp == 0) & (fn == 0), F.lit(1.0)).otherwise(
        2.0 * (tp * tn - fn * fp) / ((tp + fn) * (fn + tn) + (tp + fp) * (fp + tn))
    )
    return agg.select(
        "n_items",
        ari.alias("ari"),
        homog.alias("homogeneity"),
        compl.alias("completeness"),
        F.when(homog + compl > 0, 2 * homog * compl / (homog + compl))
        .otherwise(F.lit(0.0))
        .alias("v_measure"),
    )


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


def blocking_quality(
    records: DataFrame,
    id_col: str = "id",
    block_col: str = "block",
    gold_col: str = "cluster",
) -> DataFrame:
    """Blocking-scheme quality — the metrics that decide whether a blocking
    key is usable BEFORE paying for the comparison step (Christen's survey
    triple; the reference has no blocking at all — its nmslib index probes
    every alias — so this is the scale-side evaluation the engine's
    LSH / sorted-neighborhood blockers are judged by):

        reduction_ratio   = 1 - candidate_pairs / C(N, 2)
        pairs_completeness = covered_gold_pairs / gold_pairs   (recall)
        pairs_quality      = covered_gold_pairs / candidate_pairs (precision)

    Assumes PARTITION blocking (each record carries at most one block key —
    the shape of prefix / sorted-neighborhood keys; a null block key means
    "not blocked": the record generates no candidate pairs but still counts
    in N and in gold_pairs, so completeness honestly punishes dropping
    records). Every count is a sum of C(n, 2) over group sizes — three
    map-side-combined groupBys plus one count, never the pair space; long
    `div` arithmetic keeps exactness past 2^53 pairs. Returns ONE row.
    """
    base = records.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("b"),
        F.col(gold_col).alias("g"),
    )
    pairs_of_n = F.expr("(n * (n - 1)) div 2")

    def _sum_pairs(df, keys, alias):
        return (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(pairs_of_n.alias("c"))
            .agg(F.coalesce(F.sum("c"), F.lit(0)).alias(alias))
        )

    blocked = base.filter(F.col("b").isNotNull())
    cand = _sum_pairs(blocked, ["b"], "candidate_pairs")
    gold = _sum_pairs(base, ["g"], "gold_pairs")
    cov = _sum_pairs(blocked, ["b", "g"], "covered_pairs")
    tot = base.agg(F.count(F.lit(1)).alias("n")).select(
        F.col("n").alias("n_records"), pairs_of_n.alias("total_pairs")
    )
    out = (
        cov.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(gold))
        .crossJoin(F.broadcast(tot))
    )
    rr = F.when(
        F.col("total_pairs") > 0,
        1.0 - F.col("candidate_pairs") / F.col("total_pairs"),
    ).otherwise(F.lit(0.0))
    pc = F.when(
        F.col("gold_pairs") > 0, F.col("covered_pairs") / F.col("gold_pairs")
    ).otherwise(F.lit(0.0))
    pq = F.when(
        F.col("candidate_pairs") > 0,
        F.col("covered_pairs") / F.col("candidate_pairs"),
    ).otherwise(F.lit(0.0))
    return out.select(
        "n_records",
        "total_pairs",
        "candidate_pairs",
        "gold_pairs",
        "covered_pairs",
        rr.alias("reduction_ratio"),
        pc.alias("pairs_completeness"),
        pq.alias("pairs_quality"),
    )


def threshold_sweep_metrics(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "is_match",
    round_scores: int | None = None,
) -> DataFrame:
    """(threshold, tp, fp, fn, precision, recall, f1): classifier metrics
    at EVERY distinct score treated as the decision threshold
    (predict match iff score >= threshold) — the calibration sweep that
    picks the Fellegi-Sunter / cosine cutoff, computed in one pass
    instead of re-scanning pairs per candidate threshold.

    Scale shape: one map-side-combined groupBy(score) collapses the pair
    table to (distinct scores) rows — the window that then takes the
    descending cumulative TP/FP runs over THAT collapsed table, so the
    single-partition window Spark needs for a global running sum touches
    thousands of rows, not 10^10 pairs (`round_scores` caps the distinct
    count when scores are continuous). total positives for recall ride a
    one-row broadcast. NULL labels are rejected by contract (cast to
    int fails closed in the agg); NULL scores are dropped (no threshold
    can select them).
    """
    from pyspark.sql import Window

    s = F.col(score_col)
    if round_scores is not None:
        s = F.round(s, round_scores)
    per_score = (
        scored.filter(F.col(score_col).isNotNull())
        .select(s.alias("threshold"), F.col(label_col).cast("int").alias("_y"))
        .groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_y").alias("_pos"),
        )
    )
    totals = per_score.select(
        F.sum("_pos").alias("_tot_pos"), F.sum("_n").alias("_tot")
    )
    w = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_score.select(
        "threshold",
        F.sum("_pos").over(w).alias("tp"),
        (F.sum("_n").over(w) - F.sum("_pos").over(w)).alias("fp"),
    ).crossJoin(F.broadcast(totals))
    p = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    r = F.col("tp") / F.greatest(F.col("_tot_pos"), F.lit(1))
    return cum.select(
        "threshold",
        "tp",
        "fp",
        (F.col("_tot_pos") - F.col("tp")).alias("fn"),
        p.alias("precision"),
        r.alias("recall"),
        F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0)).alias("f1"),
    )


def ranking_metrics(
    ranked: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    score_round: int | None = None,
) -> DataFrame:
    """Per-query ranking quality — nDCG@k (graded, Järvelin & Kekäläinen
    2002, exponential gain (2^rel - 1)/log2(rank+1)) and average precision
    (binary: rel > 0 counts as relevant) — the standard IR evaluation pair
    for the retrieval operators (bm25_score / qlm_score / rrf_fuse).

    Inputs: `ranked` (query_id, doc_id, score); `qrels` (query_id, doc_id,
    rel int >= 0, absent pairs = 0). Relevant-but-unretrieved docs count
    against BOTH metrics: the AP denominator is the query's total relevant
    count from qrels, and the ideal DCG ranks the FULL qrels list — a
    system cannot score 1.0 by returning one good doc and hiding the rest.

    Determinism: ranks are row_numbers ordered by (score desc, doc_id asc);
    `score_round` pre-rounds scores so rank order is reproducible wherever
    p-decimal scores are (the rrf_fuse discipline). Plan shape: one window
    per side partitioned by query (queries are many, per-query state is the
    doc list), one join on (query, doc), two small aggs — linear, no
    cross-system joins. -> (query_id, n_retrieved, n_rel, ndcg_at_k, ap);
    queries with zero relevant docs report ndcg/ap = 0.0."""
    from pyspark.sql import Window

    s = F.round("score", score_round) if score_round is not None else F.col("score")
    w = Window.partitionBy("query_id").orderBy(F.col("_s").desc(), F.col("doc_id").asc())
    r = (
        ranked.select("query_id", "doc_id", s.alias("_s"))
        .withColumn("rank", F.row_number().over(w))
        .join(
            qrels.select("query_id", "doc_id", F.col("rel").cast("int").alias("rel")),
            ["query_id", "doc_id"],
            "left",
        )
        .withColumn("rel", F.coalesce("rel", F.lit(0)))
    )
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    r = r.withColumn(
        "_cum_rel", F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).over(wcum)
    )
    per_q = r.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_retrieved"),
        F.sum(
            F.when(
                F.col("rank") <= k,
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("rank") + F.lit(1.0)),
            ).otherwise(F.lit(0.0))
        ).alias("_dcg"),
        F.sum(
            F.when(F.col("rel") > 0, F.col("_cum_rel") / F.col("rank")).otherwise(
                F.lit(0.0)
            )
        ).alias("_ap_num"),
    )
    # ideal DCG ranks the FULL qrels list by grade (graded-general: a
    # window over qrels, which is judgment-sized, not corpus-sized)
    wi = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    ideal = (
        qrels.filter(F.col("rel") > 0)
        .withColumn("_irank", F.row_number().over(wi))
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_rel"),
            F.sum(
                F.when(
                    F.col("_irank") <= k,
                    (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                    / F.log2(F.col("_irank") + F.lit(1.0)),
                ).otherwise(F.lit(0.0))
            ).alias("_idcg"),
        )
    )
    return (
        per_q.join(ideal, "query_id", "left")
        .select(
            "query_id",
            "n_retrieved",
            F.coalesce("n_rel", F.lit(0)).alias("n_rel"),
            F.when(
                F.coalesce("_idcg", F.lit(0.0)) > 0.0, F.col("_dcg") / F.col("_idcg")
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg_at_k"),
            F.when(
                F.coalesce("n_rel", F.lit(0)) > 0, F.col("_ap_num") / F.col("n_rel")
            )
            .otherwise(F.lit(0.0))
            .alias("ap"),
        )
    )
