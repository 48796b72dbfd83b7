"""NYSIIS phonetic encoding (Taft 1970, the New York State Identification
and Intelligence System code) — the phonetic blocking key that fixes
Soundex's best-known misses: Soundex collapses everything after the first
letter to 3 digits (NELSON S-425 vs NEILSON S-245 never meet); NYSIIS
normalizes the head (KN->NN, K->C, PH/PF->FF, MAC->MCC, SCH->SSS), folds
vowels to A (NELSON and NEILSON both -> NALSAN), and keeps more of the
tail structure. Y is NOT folded (the canonical rule set), so
SMITH/SMYTH stay apart here — the two phonetic keys are complementary
blocks in the union-of-blocks recipe, not substitutes.

Spark has a built-in `soundex` but no NYSIIS, and neither does DuckDB —
so this is a pandas-UDF function (the jaro_winkler precedent) pinned
against hand-traced vectors that agree with the published outputs of the
classic implementations (MACINTOSH->MCANT, KNIGHT->NAGT, BISHOP->BASAP,
PHILLIPSON->FALAPSAN untruncated); convention choices (KN->NN at the
head, truncate-to-6 default like the original, `max_len=None` for the
modified full-length form) are documented here and pinned in
tests/test_phonetic.py. No SQL oracle surface (DuckDB lacks the
function); library-level like the soundex blocking key.

The UDF encodes each batch's DISTINCT tokens once (names repeat heavily
in gazetteers) — the per-row work is a dict lookup.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_VOWELS = set("AEIOU")


def nysiis(name: str, max_len: int | None = 6) -> str:
    """Scalar NYSIIS code. Empty/non-alphabetic input -> ''."""
    s = "".join(c for c in (name or "").upper() if "A" <= c <= "Z")
    if not s:
        return ""
    # head transforms (first match wins)
    if s.startswith("MAC"):
        s = "MCC" + s[3:]
    elif s.startswith("KN"):
        s = "NN" + s[2:]
    elif s.startswith("K"):
        s = "C" + s[1:]
    elif s.startswith(("PH", "PF")):
        s = "FF" + s[2:]
    elif s.startswith("SCH"):
        s = "SSS" + s[3:]
    # tail transforms
    if s.endswith(("EE", "IE")):
        s = s[:-2] + "Y"
    elif s.endswith(("DT", "RT", "RD", "NT", "ND")):
        s = s[:-2] + "D"
    key = s[0]
    w = list(s)
    i = 1
    n = len(w)
    while i < n:
        c = w[i]
        if c == "E" and i + 1 < n and w[i + 1] == "V":
            w[i], w[i + 1] = "A", "F"
            c = "A"
        elif c in _VOWELS:
            w[i] = "A"
            c = "A"
        elif c == "Q":
            w[i] = "G"
            c = "G"
        elif c == "Z":
            w[i] = "S"
            c = "S"
        elif c == "M":
            w[i] = "N"
            c = "N"
        elif c == "K":
            if i + 1 < n and w[i + 1] == "N":
                w[i] = "N"
            else:
                w[i] = "C"
            c = w[i]
        elif c == "S" and w[i : i + 3] == ["S", "C", "H"]:
            w[i : i + 3] = ["S", "S", "S"]
            c = "S"
        elif c == "P" and i + 1 < n and w[i + 1] == "H":
            w[i], w[i + 1] = "F", "F"
            c = "F"
        elif c == "H" and (w[i - 1] not in _VOWELS or (i + 1 < n and w[i + 1] not in _VOWELS)):
            w[i] = w[i - 1]
            c = w[i]
        elif c == "W" and w[i - 1] in _VOWELS:
            w[i] = w[i - 1]
            c = w[i]
        if c != key[-1]:
            key += c
        i += 1
    if key.endswith("S") and len(key) > 1:
        key = key[:-1]
    if key.endswith("AY"):
        key = key[:-2] + "Y"
    if key.endswith("A") and len(key) > 1:
        key = key[:-1]
    if max_len is not None:
        key = key[:max_len]
    return key


def make_nysiis_udf(max_len: int | None = 6):
    @F.pandas_udf(T.StringType())
    def _udf(names: pd.Series) -> pd.Series:
        uniq = {v: nysiis(v, max_len) for v in names.dropna().unique()}
        return names.map(lambda v: uniq.get(v, ""))

    return _udf


nysiis_udf = make_nysiis_udf()


def nysiis_block_pairs(
    texts: DataFrame, aliases: DataFrame, salt_buckets: int = 0
) -> DataFrame:
    """(text, alias) pairs sharing the NYSIIS code of their first token —
    the companion to blocking.phonetic_block_pairs (Soundex):
    NELSON/NEILSON (both NALSAN) block here but never under Soundex
    (S-425 vs S-245). Same join/skew contract: phonetic codes
    are Zipf-hot on real name tables, salt_buckets>0 salts the alias
    side (pair set identical, asserted in tests)."""
    first = lambda c: F.element_at(F.split(F.trim(F.lower(c)), r"\s+"), 1)  # noqa: E731
    t = texts.withColumn("_bk", nysiis_udf(first(F.col("text")))).filter(F.col("_bk") != "")
    a = aliases.withColumn("_bk", nysiis_udf(first(F.col("alias")))).filter(
        F.col("_bk") != ""
    )
    if salt_buckets > 0:
        from spacy_ann_linker_spark.operators.salted import salted_join

        return (
            salted_join(
                big=a, small=t, key="_bk", salt_buckets=salt_buckets, salt_source="alias"
            )
            .select("text", "alias")
            .distinct()
        )
    return t.join(a, "_bk").select("text", "alias").distinct()
