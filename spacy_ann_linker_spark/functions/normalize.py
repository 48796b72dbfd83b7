"""Deterministic name normalization — the ER pre-blocking step.

Every blocking key and string comparator in this engine assumes its inputs
were canonicalized the same way on both sides ("José " vs "jose" must block
together before any similarity gets a vote). `fold_accents` is a PURE-JVM
translate over the Latin diacritic letters — no ICU, no UDF, no locale
dependence — chosen to agree character-for-character with DuckDB's
`strip_accents` on the covered set (pinned per-character in tests), which
is what keeps `normalize_name` oracle-exact cross-engine. Letters that are
NOT diacritic compositions (ø, æ, œ, ß) are deliberately left alone, same
as ICU.
"""

from __future__ import annotations

from pyspark.sql import functions as F

#: diacritic -> base letter, agreeing with DuckDB strip_accents (ICU) on
#: every covered character; ø/æ/œ/ß excluded on both sides (not diacritics)
_ACCENT_SRC = (
    "áéíóúàèìòùâêîôûäëïöüãõñçýÿ"
    "ÁÉÍÓÚÀÈÌÒÙÂÊÎÔÛÄËÏÖÜÃÕÑÇÝŸ"
    "åāēīōūšžčćśźżńğ"
    "ÅĀĒĪŌŪŠŽČĆŚŹŻŃĞ"
)
_ACCENT_DST = (
    "aeiouaeiouaeiouaeiouaoncyy"
    "AEIOUAEIOUAEIOUAEIOUAONCYY"
    "aaeiouszccszzng"
    "AAEIOUSZCCSZZNG"
)


def fold_accents(col):
    """Column expr: Latin diacritics folded to their base letters (á->a,
    ñ->n, Ç->C, ...), everything else untouched. One JVM translate."""
    if isinstance(col, str):
        col = F.col(col)
    return F.translate(col, _ACCENT_SRC, _ACCENT_DST)


def normalize_name(col):
    """Column expr: the canonical ER name key — accents folded, lowercased,
    punctuation/symbols replaced by spaces, whitespace collapsed, trimmed.
    'José  O'Brien-Smith ' -> 'jose o brien smith'. Pure JVM; apply the
    SAME expression to both sides of a linkage before any blocking key or
    comparator (tests/goldens pin it against the equivalent DuckDB
    strip_accents + regexp chain)."""
    if isinstance(col, str):
        col = F.col(col)
    folded = F.lower(fold_accents(col))
    despecialed = F.regexp_replace(folded, r"[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(despecialed, r"\s+", " "))
