"""String-similarity scoring UDFs: Jaro-Winkler (vectorized pandas UDF) and
Levenshtein (Spark built-in F.levenshtein — use that directly).

north_star: "pairwise candidate scoring runs as vectorized Arrow pandas UDFs
computing batched cosine similarity plus Jaro-Winkler/Levenshtein on mention
text". The reference itself has no string-edit scoring (its fuzziness is
3-gram cosine only) — this is the typo-rescue path for mentions whose n-gram
cosine falls below threshold (e.g. 2-char edits in short words destroy most
of their 3-grams).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def jaro(s1: str, s2: str) -> float:
    """Public-domain Jaro similarity."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4) -> float:
    j = jaro(s1, s2)
    prefix = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched JW over two string columns (case-folded)."""
    return pd.Series(
        [jaro_winkler((x or "").lower(), (y or "").lower()) for x, y in zip(a, b)]
    )
