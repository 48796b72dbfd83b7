"""functions/phonetic.py: NYSIIS encoding + phonetic blocking."""

import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.functions.phonetic import (
    make_nysiis_udf,
    nysiis,
    nysiis_block_pairs,
)


def test_nysiis_published_vectors():
    """Hand-traced vectors that agree with the classic implementations
    (MCANT/NAGT/BASAP match Apache commons-codec's strict outputs;
    FALAPSAN is the published full-length form)."""
    assert nysiis("MACINTOSH") == "MCANT"
    assert nysiis("KNIGHT") == "NAGT"
    assert nysiis("BISHOP") == "BASAP"
    assert nysiis("PHILLIPSON", max_len=None) == "FALAPSAN"
    assert nysiis("PHILLIPSON") == "FALAPS"  # original truncates to 6
    assert nysiis("O'Daniel") == "ODANAL"
    assert nysiis("SCHMIDT") == "SNAD"


def test_nysiis_soundalike_pairs_and_head_rules():
    # the pair Soundex cannot block (S-425 vs S-245)
    assert nysiis("NELSON") == nysiis("NEILSON") == "NALSAN"
    assert nysiis("BROWN") == nysiis("BROWNE") == "BRAN"
    # head normalization: K->C, KN->NN, PH->FF
    assert nysiis("KATHRYN")[0] == "C"
    assert nysiis("KNUTH")[0] == "N"
    assert nysiis("PHONE")[0] == "F"
    # Y is NOT a vowel in the canonical rules
    assert nysiis("SMITH") != nysiis("SMYTH")


def test_nysiis_edge_inputs():
    assert nysiis("") == ""
    assert nysiis(None) == ""
    assert nysiis("123!?") == ""
    assert nysiis("A") == "A"
    # codes are uppercase alphabetic only
    code = nysiis("d'Artagnan-Smith")
    assert code.isalpha() and code.isupper()


def test_nysiis_udf_matches_scalar(spark):
    names = ["MacIntosh", "knight", "bishop", None, "", "Nelson", "Neilson"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        r["name"]: r["code"]
        for r in df.select("name", make_nysiis_udf()(F.col("name")).alias("code")).collect()
    }
    for n in names:
        assert got[n] == (nysiis(n) if n else "")


def test_nysiis_block_pairs_blocks_soundalikes_and_salt_parity(spark):
    texts = spark.createDataFrame(
        [("Nelson Mandela",), ("Knight Rider",), ("Zzz Unique",)], "text string"
    )
    aliases = spark.createDataFrame(
        [("Neilson",), ("Nite",), ("Knigt",)], "alias string"
    )
    plain = {
        (r["text"], r["alias"]) for r in nysiis_block_pairs(texts, aliases).collect()
    }
    assert ("Nelson Mandela", "Neilson") in plain
    assert ("Knight Rider", "Knigt") in plain  # NAGT == NAGT
    assert not any(t == "Zzz Unique" for t, _ in plain)
    salted = {
        (r["text"], r["alias"])
        for r in nysiis_block_pairs(texts, aliases, salt_buckets=4).collect()
    }
    assert plain == salted
