"""End-to-end record-linkage pipeline (SURVEY.md §3, north_rule).

    build_kb -> fit_candidate_model          (the reference's create_index)
    transcripts -> mentions -> link_mentions  (AnnLinker.__call__ per turn)
    links -> entity edges -> connected components -> clusters  (north_rule)

Each stage is a DataFrame -> DataFrame function; `run_linkage` wires them and
optionally checkpoints each stage via plans.checkpoint (resume support).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spacy_ann_linker_spark.candidates.generate import CandidateModel, fit_candidate_model
from spacy_ann_linker_spark.cluster.cc import connected_components
from spacy_ann_linker_spark.data import golden_kb
from spacy_ann_linker_spark.kb.build import KnowledgeBase, build_kb
from spacy_ann_linker_spark.link.linker import link_mentions
from spacy_ann_linker_spark.mentions.extract import extract_mentions


@dataclass
class LinkageModel:
    kb: KnowledgeBase
    cand: CandidateModel

    def save(self, path: str) -> None:
        self.kb.save(f"{path}/kb")
        self.cand.save(f"{path}/cand")

    @staticmethod
    def load(spark, path: str) -> "LinkageModel":
        return LinkageModel(
            kb=KnowledgeBase.load(spark, f"{path}/kb"),
            cand=CandidateModel.load(spark, f"{path}/cand"),
        )


def build_golden_model(spark: SparkSession, dim: int = 64, min_df: int = 2) -> LinkageModel:
    """create_index over the golden tutorial KB (cli/create_index.py:48-114).

    min_df=2 is the reference default (candidate_generator.py:121) — on an
    18-alias corpus it collapses most alias vectors to 1-2 shared ngrams
    (faithful but typo-hostile); the production pipeline passes min_df=1."""
    kb = build_kb(golden_kb.load_entities(spark), golden_kb.load_aliases(spark), dim=dim)
    return LinkageModel(kb=kb, cand=fit_candidate_model(kb, min_df=min_df))


def link_transcripts(
    model: LinkageModel,
    turns: DataFrame,
    mentions: DataFrame | None = None,
    k: int = 5,
    threshold: float = 0.7,
    disambiguate: bool = True,
    exact_fast_path: bool = True,
    fuzzy_rescue: bool = False,
    dim: int = 64,
) -> DataFrame:
    """Link every mention in every turn to its KB entity.

    `mentions` defaults to dictionary extraction over the KB alias strings
    (the upstream-NER stand-in); pass explicit mentions (e.g. gold label
    spans) to mirror the reference's externally-supplied doc.ents."""
    if mentions is None:
        patterns = [r["alias"] for r in model.cand.aliases.collect()]
        mentions = extract_mentions(turns, patterns)
    return link_mentions(
        mentions,
        turns,
        model.kb,
        model.cand,
        k=k,
        threshold=threshold,
        disambiguate=disambiguate,
        exact_fast_path=exact_fast_path,
        fuzzy_rescue=fuzzy_rescue,
        dim=dim,
    )


def cluster_links(links: DataFrame, max_iter: int = 30) -> DataFrame:
    """J9: transitive clustering of accepted matches. Nodes are mention
    surface strings ("m:" prefix) and entity ids ("e:" prefix); edges are the
    accepted mention->entity links, so mentions sharing an entity (and
    entities sharing a mention surface) land in one cluster.
    -> (node string, component long)"""
    edges = links.select(
        F.concat(F.lit("m:"), F.col("text")).alias("src"),
        F.concat(F.lit("e:"), F.col("entity_id")).alias("dst"),
    ).distinct()
    return connected_components(edges, max_iter=max_iter)
