"""Mention extraction from transcript text.

The reference receives mentions from an upstream spaCy NER/EntityRuler
(`doc.ents`, ann_linker.py:17-21,76-77; tests build an EntityRuler with
verbatim string patterns, tests/test_ann_linker.py:7-13). This module is that
upstream stage for transcripts: a dictionary (gazetteer) matcher.

Semantics mirror EntityRuler's verbatim phrase match: case-sensitive,
word-boundary-anchored, leftmost-longest, non-overlapping. F8-F10/C7: char
start/end offsets into the raw turn text; spans are re-derivable via
text[start:end] == mention (the reference's char_span validity filter,
api/app.py:64-66).

Three engines, one output contract:

* regex alternation (longest-first) — exact reference-parity baseline for
  small pattern lists; pattern compile is O(#aliases) per worker.
* Aho-Corasick automaton (public algorithm, Aho & Corasick CACM 1975) —
  the many-pattern path: one text scan regardless of pattern count. The
  pattern list ships as a Spark broadcast (torrent distribution, not task
  closures) and the automaton is built ONCE per python worker and cached.
* `extract_mentions_gazetteer` — the 100 TB path: a tokenize->join gazetteer
  with NO driver-side pattern list at all. Turns explode into word-run
  tokens with char offsets; tokens join the alias table on the alias's first
  word; full-alias verification, word-boundary checks, and the greedy
  leftmost-longest fold are all JVM expressions. Cost is one join shuffled
  (or broadcast) on first-word — linear in corpus size, independent of how
  the alias table is stored.
"""

from __future__ import annotations

import hashlib
import re
from collections import deque

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spacy_ann_linker_spark.schemas import SPAN_STRUCT

# patterns below this count compile into one regex (cheap, reference-exact);
# at or above it the Aho-Corasick automaton takes over (regex alternation
# compile + scan cost grows with pattern count; AC scan does not)
AC_MIN_PATTERNS = 256

_WORD_RE = re.compile(r"\w")


class AhoCorasick:
    """Aho-Corasick multi-pattern automaton (public algorithm: Aho &
    Corasick, CACM 1975). goto/fail/output tables over dict transitions;
    `iter_matches` yields every raw occurrence (start, end) in one pass."""

    def __init__(self, patterns: list[str], case_insensitive: bool = False):
        self.ci = case_insensitive
        self.goto: list[dict] = [{}]
        self.out: list[tuple] = [()]
        for p in sorted({p for p in patterns if p}):
            key = p.lower() if case_insensitive else p
            s = 0
            for ch in key:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append(())
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s] = self.out[s] + (len(key),)
        self.fail = [0] * len(self.goto)
        q = deque(self.goto[0].values())
        while q:
            r = q.popleft()
            for ch, s in self.goto[r].items():
                q.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[s] = self.goto[f].get(ch, 0)
                self.out[s] = self.out[s] + self.out[self.fail[s]]

    def iter_matches(self, text: str):
        """Every raw pattern occurrence as (start, end), in end order."""
        s = 0
        goto, fail, out = self.goto, self.fail, self.out
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            for ln in out[s]:
                yield i + 1 - ln, i + 1


def _compile(patterns: list[str], case_insensitive: bool) -> "re.Pattern":
    ordered = sorted(set(p for p in patterns if p), key=len, reverse=True)
    body = "|".join(re.escape(p) for p in ordered)
    flags = re.IGNORECASE if case_insensitive else 0
    return re.compile(rf"(?<!\w)(?:{body})(?!\w)", flags)


def find_spans(text: str, rx: "re.Pattern", label: str | None) -> list[dict]:
    if not text:
        return []
    return [
        {"text": m.group(0), "start": m.start(), "end": m.end(), "label": label}
        for m in rx.finditer(text)
    ]


def find_spans_ac(text: str, ac: AhoCorasick, label: str | None) -> list[dict] | None:
    """AC-based equivalent of `find_spans`: word-boundary filter + greedy
    leftmost-longest selection replicate the regex scanner exactly (the
    scanner never retries a position before the previous match's end, and at
    each position the longest alternative wins). Returns None — caller falls
    back to the regex engine for that text — when lower() changes string
    length (rare unicode) OR when the text contains chars whose lower() and
    casefold() disagree (e.g. 'ſ' LATIN SMALL LETTER LONG S: re.IGNORECASE
    simple-folds it to 's' but lower() keeps it, so the AC automaton built
    on lower() would miss matches the reference regex path finds)."""
    if not text:
        return []
    key = text.lower() if ac.ci else text
    if ac.ci and (len(key) != len(text) or key != text.casefold()):
        return None
    n = len(text)
    best: dict[int, int] = {}
    for st, en in ac.iter_matches(key):
        if st > 0 and _WORD_RE.match(text[st - 1]):
            continue
        if en < n and _WORD_RE.match(text[en]):
            continue
        ln = en - st
        if ln > best.get(st, 0):
            best[st] = ln
    spans = []
    cur = 0
    for st in sorted(best):
        if st < cur:
            continue
        en = st + best[st]
        spans.append({"text": text[st:en], "start": st, "end": en, "label": label})
        cur = en
    return spans


# per-python-worker automaton/regex cache: the broadcast value is shared
# executor memory; compiling once per worker (not per batch) is the point
_MATCHER_CACHE: dict[str, object] = {}

# driver-side broadcast cache: one Spark broadcast per distinct pattern set,
# reused across extract_mentions calls — a long-running serve process would
# otherwise accumulate one broadcast per request until ContextCleaner GC.
# All access goes through _BROADCAST_LOCK: LRU touches MUTATE the dict on
# every hit, and concurrent /link handler threads (plus a streaming
# micro-batch on the same driver) would otherwise race pop/insert.
import threading as _threading

_BROADCAST_LOCK = _threading.Lock()
_BROADCAST_CACHE: dict[str, object] = {}
_BROADCAST_CACHE_MAX = 64


def _patterns_key(patterns: list[str], ci: bool, kind: str) -> str:
    h = hashlib.blake2b(digest_size=12)
    h.update(f"{kind}:{ci}:".encode())
    for p in sorted(set(patterns)):
        h.update(p.encode("utf-8", "ignore") + b"\x00")
    return h.hexdigest()


def _get_pattern_broadcast(sc, patterns: list[str]):
    key = _patterns_key(patterns, False, "bc")
    with _BROADCAST_LOCK:
        bc = _BROADCAST_CACHE.pop(key, None)
        if bc is not None:
            _BROADCAST_CACHE[key] = bc  # re-insert = mark most-recent (LRU)
            return bc
    # create the broadcast OUTSIDE the lock: driver-side serialization of a
    # big gazetteer takes seconds, and holding the lock across it would
    # stall every concurrent extract call — including pure cache hits on
    # other keys. Double-checked insert below; the worst case is one benign
    # orphan broadcast when two threads race the same new key.
    new_bc = sc.broadcast(list(patterns))
    with _BROADCAST_LOCK:
        bc = _BROADCAST_CACHE.get(key)
        if bc is not None:
            _BROADCAST_CACHE[key] = _BROADCAST_CACHE.pop(key)
            try:
                new_bc.unpersist()
            except Exception:
                pass
            return bc
        while len(_BROADCAST_CACHE) >= _BROADCAST_CACHE_MAX:
            # bound driver/executor memory by evicting the LRU entry ONLY —
            # clearing the whole cache would unpersist hot entries (and
            # broadcasts referenced by in-flight queries on other threads),
            # forcing executors to refetch every pattern set from the driver
            # while the cache rebuilds from zero
            old = _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
            try:
                old.unpersist()
            except Exception:
                pass
        _BROADCAST_CACHE[key] = new_bc
        return new_bc


def extract_mentions(
    turns: DataFrame,
    patterns: list[str],
    label: str | None = None,
    case_insensitive: bool = False,
    engine: str = "auto",
) -> DataFrame:
    """turns (TRANSCRIPT_SCHEMA) -> mentions (MENTION_SCHEMA).

    engine: "auto" (AC at >= AC_MIN_PATTERNS, regex below), "regex", "ac".
    Patterns reach executors as a Spark broadcast either way; matchers are
    built once per worker from the broadcast and cached.

    mention_id = xxhash64(conv_id, turn_idx, start): deterministic and
    shuffle-free (no monotonically_increasing_id / zipWithIndex)."""
    use_ac = engine == "ac" or (engine == "auto" and len(patterns) >= AC_MIN_PATTERNS)
    if use_ac and case_insensitive and engine != "ac":
        # patterns whose lower() and casefold() disagree (ſ, ß, ...) make the
        # lower()-keyed automaton miss matches re.IGNORECASE finds — keep the
        # reference-exact regex engine for those pattern sets (the text-side
        # equivalent falls back per-text inside find_spans_ac)
        if any(len(p.lower()) != len(p) or p.lower() != p.casefold() for p in patterns):
            use_ac = False
    sc = turns.sparkSession.sparkContext
    bc = _get_pattern_broadcast(sc, patterns)
    key = _patterns_key(patterns, case_insensitive, "ac" if use_ac else "rx")

    @F.pandas_udf(T.ArrayType(SPAN_STRUCT))
    def spans_udf(texts: pd.Series) -> pd.Series:
        if len(_MATCHER_CACHE) > 64:  # bound worker memory across jobs
            _MATCHER_CACHE.clear()
        if use_ac:
            ac = _MATCHER_CACHE.get(key)
            if ac is None:
                ac = _MATCHER_CACHE.setdefault(key, AhoCorasick(bc.value, case_insensitive))
            rx = None  # regex fallback only for length-changing case folds
            out = []
            for t in texts:
                spans = find_spans_ac(t or "", ac, label)
                if spans is None:
                    if rx is None:
                        rx = _compile(bc.value, case_insensitive)
                    spans = find_spans(t, rx, label)
                out.append(spans)
            return pd.Series(out)
        rx = _MATCHER_CACHE.get(key)
        if rx is None:
            rx = _MATCHER_CACHE.setdefault(key, _compile(bc.value, case_insensitive))
        return texts.map(lambda t: find_spans(t, rx, label))

    return (
        turns.withColumn("_spans", spans_udf(F.col("text")))
        .select(
            "conv_id",
            "turn_idx",
            F.explode("_spans").alias("_s"),
        )
        .select(
            "conv_id",
            "turn_idx",
            F.xxhash64("conv_id", "turn_idx", F.col("_s.start")).alias("mention_id"),
            F.col("_s.text").alias("text"),
            F.col("_s.start").alias("start"),
            F.col("_s.end").alias("end"),
            F.col("_s.label").alias("label"),
        )
    )


_TOKEN_RUNS = T.ArrayType(
    T.StructType(
        [T.StructField("tok", T.StringType()), T.StructField("pos", T.IntegerType())]
    )
)


@F.pandas_udf(_TOKEN_RUNS)
def word_runs_udf(texts: pd.Series) -> pd.Series:
    """(token, char offset) for every \\w+ run — the only Python step of the
    join gazetteer (offset-preserving tokenization)."""
    rx = re.compile(r"\w+")
    return texts.map(
        lambda t: [{"tok": m.group(0), "pos": m.start()} for m in rx.finditer(t or "")]
    )


def extract_mentions_gazetteer(
    turns: DataFrame,
    aliases_df: DataFrame,
    label: str | None = None,
    case_insensitive: bool = False,
    broadcast_aliases: bool = True,
    salt_buckets: int = 0,
) -> DataFrame:
    """Distributed gazetteer: turns (TRANSCRIPT_SCHEMA) x aliases_df(alias)
    -> mentions (MENTION_SCHEMA), with NO pattern list on the driver.

    Plan: tokenize turns into word runs with offsets (one pandas UDF) ->
    join tokens against each alias's FIRST word run (broadcast by default;
    drop the hint and the shuffle join handles alias tables of any size) ->
    verify the full alias via JVM substring equality + word-boundary checks
    -> greedy leftmost-longest fold per turn as a JVM `aggregate` over the
    sorted match array (same selection the regex scanner makes).

    Semantics match `extract_mentions` for ASCII text; boundary checks here
    use Java's \\w (ASCII) vs Python's unicode \\w in the regex engine —
    the one documented divergence, exercised nowhere in the fixtures.

    salt_buckets (only with broadcast_aliases=False): a hot first word
    shared by many aliases ("The ...") funnels every matching token to one
    reducer in the shuffle join; salt_buckets > 0 salts the token side
    deterministically and replicates aliases into every bucket — identical
    results (verified in tests), max reducer load / salt_buckets."""
    al = aliases_df.select("alias").distinct()
    al = (
        al.withColumn("_plen", F.length(F.regexp_extract("alias", r"^\W*", 0)))
        .withColumn("_fw", F.regexp_extract("alias", r"\w+", 0))
        .filter(F.col("_fw") != "")
        .withColumn("_alen", F.length("alias"))
    )
    tok_key = F.lower(F.col("_tok")) if case_insensitive else F.col("_tok")
    fw_key = F.lower(F.col("_fw")) if case_insensitive else F.col("_fw")
    al = al.withColumn("_k", fw_key).drop("_fw")

    toks = turns.select(
        "conv_id",
        "turn_idx",
        "text",
        F.explode(word_runs_udf(F.col("text"))).alias("_t"),
    ).select(
        "conv_id",
        "turn_idx",
        "text",
        F.col("_t.tok").alias("_tok"),
        F.col("_t.pos").alias("_pos"),
    )

    slice_ = F.expr("substring(text, _start + 1, _alen)")
    alias_cmp = (
        (F.lower(slice_) == F.lower(F.col("alias"))) if case_insensitive else (slice_ == F.col("alias"))
    )
    keyed_toks = toks.withColumn("_k", tok_key)
    if broadcast_aliases:
        paired = keyed_toks.join(F.broadcast(al), "_k")
    elif salt_buckets > 0:
        from spacy_ann_linker_spark.operators.salted import salted_join

        paired = salted_join(keyed_toks, al, key="_k", salt_buckets=salt_buckets)
    else:
        paired = keyed_toks.join(al, "_k")
    cands = (
        paired.withColumn("_start", F.col("_pos") - F.col("_plen"))
        .filter(F.col("_start") >= 0)
        .filter(alias_cmp)
        .withColumn("_end", F.col("_start") + F.col("_alen"))
        # word boundaries: char before start / after end must not be \w
        .filter(
            (F.col("_start") == 0)
            | ~F.expr(r"substring(text, _start, 1) rlike '\\w'")
        )
        .filter(
            (F.col("_end") >= F.length("text"))
            | ~F.expr(r"substring(text, _end + 1, 1) rlike '\\w'")
        )
    )

    m = cands.select(
        "conv_id",
        "turn_idx",
        F.struct(
            F.col("_start").alias("start"),
            (-F.col("_alen")).alias("neglen"),
            F.col("_end").alias("end"),
            slice_.alias("text"),
        ).alias("m"),
    )
    # greedy leftmost-longest: fold the (start asc, len desc)-sorted match
    # array — select iff start >= end of the previous selection
    acc0 = F.struct(
        F.lit(0).alias("cur"),
        F.array().cast(
            "array<struct<start:int,neglen:int,end:int,text:string>>"
        ).alias("sel"),
    )
    sel = (
        m.groupBy("conv_id", "turn_idx")
        .agg(F.array_sort(F.collect_list("m")).alias("ms"))
        .select(
            "conv_id",
            "turn_idx",
            F.explode(
                F.aggregate(
                    "ms",
                    acc0,
                    lambda acc, x: F.when(
                        x["start"] >= acc["cur"],
                        F.struct(
                            x["end"].alias("cur"),
                            F.array_append(acc["sel"], x).alias("sel"),
                        ),
                    ).otherwise(acc),
                    lambda acc: acc["sel"],
                )
            ).alias("_s"),
        )
    )
    return sel.select(
        "conv_id",
        "turn_idx",
        F.xxhash64("conv_id", "turn_idx", F.col("_s.start")).alias("mention_id"),
        F.col("_s.text").alias("text"),
        F.col("_s.start").alias("start"),
        F.col("_s.end").alias("end"),
        F.lit(label).cast("string").alias("label"),
    )


def validate_spans(mentions: DataFrame, turns: DataFrame) -> DataFrame:
    """F10 span-reconstruction filter: keep mentions whose offsets slice the
    turn text back to the mention string (api/app.py:64-66)."""
    joined = mentions.join(
        turns.select("conv_id", "turn_idx", F.col("text").alias("_turn_text")),
        ["conv_id", "turn_idx"],
    )
    return joined.filter(
        F.expr("substring(_turn_text, start + 1, end - start)") == F.col("text")
    ).drop("_turn_text")
