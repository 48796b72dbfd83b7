"""fold_accents / normalize_name: per-character DuckDB strip_accents parity
and the canonical-name contract."""

import duckdb
from pyspark.sql import functions as F

from spacy_ann_linker_spark.functions.normalize import (
    _ACCENT_DST,
    _ACCENT_SRC,
    fold_accents,
    normalize_name,
)


def test_accent_map_agrees_with_duckdb_strip_accents_per_char(spark):
    """The whole cross-engine contract: for every covered character our
    fold equals ICU's strip_accents; for the excluded non-diacritics both
    engines leave the char alone."""
    con = duckdb.connect()
    for ch, want in zip(_ACCENT_SRC, _ACCENT_DST):
        got = con.sql("SELECT strip_accents(?)", params=[ch]).fetchone()[0]
        assert got == want, (ch, got, want)
    for ch in "øæœßØÆŒ":
        assert con.sql("SELECT strip_accents(?)", params=[ch]).fetchone()[0] == ch
    df = spark.createDataFrame([(_ACCENT_SRC + "øæœß",)], "s string")
    folded = df.select(fold_accents("s").alias("f")).head()["f"]
    assert folded == _ACCENT_DST + "øæœß"


def test_normalize_name_canonical_contract(spark):
    rows = [
        (1, "José  O'Brien-Smith "),
        (2, "JOSE O BRIEN SMITH"),
        (3, "  Müller & Söhne GmbH."),
        (4, "Çemal#42"),
    ]
    df = spark.createDataFrame(rows, "id int, name string")
    got = {r.id: r.n for r in df.select("id", normalize_name("name").alias("n")).collect()}
    assert got[1] == got[2] == "jose o brien smith"
    assert got[3] == "muller sohne gmbh"
    assert got[4] == "cemal 42"


def test_normalize_name_matches_duckdb_chain(spark):
    """End-to-end parity with the oracle expression on accent-planted
    customer-like strings."""
    con = duckdb.connect()
    vals = ["Çüstomér#000000001", "ånon", "  wEIRD   spacing ", "Ångström-Žaba"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r.n for r in df.select(normalize_name("s").alias("n")).collect()]
    want = [
        con.sql(
            r"""SELECT trim(regexp_replace(regexp_replace(
                   lower(strip_accents(?)), '[^a-z0-9 ]', ' ', 'g'),
                   '\s+', ' ', 'g'))""",
            params=[v],
        ).fetchone()[0]
        for v in vals
    ]
    for v, g, w in zip(vals, got, want):
        assert g == w, (v, g, w)
