"""char_wb analyzer goldens — sklearn-exact semantics (SURVEY.md V1: the
hardest correctness detail is sklearn's per-word padding / short-word
behavior). Expected outputs hand-derived from the public sklearn
_char_wb_ngrams algorithm."""

from hypothesis import given
from hypothesis import strategies as st

from spacy_ann_linker_spark.functions.ngrams import char_wb_ngrams


def test_simple_word():
    assert char_wb_ngrams("abc") == [" ab", "abc", "bc "]


def test_lowercases():
    assert char_wb_ngrams("ABC") == [" ab", "abc", "bc "]


def test_short_word_padded():
    # "ml" -> " ml " -> 3-grams of the padded form
    assert char_wb_ngrams("ML") == [" ml", "ml "]


def test_single_char_word():
    # " a " has length 3 -> exactly one 3-gram
    assert char_wb_ngrams("a") == [" a "]


def test_multiword_splits_on_any_whitespace():
    assert char_wb_ngrams("ab\tcd") == [" ab", "ab ", " cd", "cd "]
    assert char_wb_ngrams("  ab   cd  ") == [" ab", "ab ", " cd", "cd "]


def test_empty_and_none():
    assert char_wb_ngrams("") == []
    assert char_wb_ngrams("   ") == []
    assert char_wb_ngrams(None) == []


def test_repeats_kept():
    # tf counts need repeated ngrams ("aaaa" -> aaa twice)
    assert char_wb_ngrams("aaaa") == [" aa", "aaa", "aaa", "aa "]


def test_machine_learning():
    got = char_wb_ngrams("Machine learning")
    assert got[:3] == [" ma", "mac", "ach"]
    assert " le" in got and "ng " in got
    # every gram from a padded word of len n+2 yields n rows per word
    assert len(got) == len("machine") + len("learning")


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=30))
def test_all_grams_length_3_or_whole_short_word(s):
    for g in char_wb_ngrams(s):
        assert len(g) == 3


@given(st.text(max_size=30))
def test_deterministic(s):
    assert char_wb_ngrams(s) == char_wb_ngrams(s)


def test_jvm_column_matches_python_reference(spark):
    """char_wb_ngrams_col (pure JVM) == char_wb_ngrams (python reference)
    on adversarial strings: unicode, punctuation, repeated/1-char words,
    tabs/newlines, leading/trailing whitespace, empties."""
    from pyspark.sql import functions as F

    from spacy_ann_linker_spark.functions.ngrams import char_wb_ngrams, char_wb_ngrams_col

    cases = [
        "Machine learning", " NLP ", "a", "ab", "a b  c", "", "   ",
        "tabs\tand\nnewlines", "MiXeD CaSe WoRdS", "über café naïve",
        "x" * 50, "a.b,c;d", "research researched researching",
        # unicode whitespace: str.split() splits on NBSP/thin/ideographic
        # space and line/paragraph separators — the JVM (?U)\s+ must agree
        "nbsp\u00a0separated", "thin\u2009space", "ideo\u3000graphic",
        "line\u2028sep\u2029para", "next\u0085line", "mix\u00a0\u2003\t it",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = {
        r["text"]: r["g"]
        for r in df.select("text", char_wb_ngrams_col(F.col("text")).alias("g")).collect()
    }
    for c in cases:
        assert got[c] == char_wb_ngrams(c, 3), repr(c)
