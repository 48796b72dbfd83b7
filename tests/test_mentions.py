"""Gazetteer mention extraction (F8-F10, C7)."""

from pyspark.sql import functions as F

from spacy_ann_linker_spark.mentions.extract import extract_mentions, validate_spans


def _turns(spark, text):
    return spark.createDataFrame(
        [("c1", 0, "user", text, "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_basic_extraction(spark):
    t = _turns(spark, "I like NLP and machine learning a lot")
    rows = extract_mentions(t, ["NLP", "machine learning"]).orderBy("start").collect()
    assert [(r["text"], r["start"], r["end"]) for r in rows] == [
        ("NLP", 7, 10),
        ("machine learning", 15, 31),
    ]


def test_longest_match_wins(spark):
    t = _turns(spark, "machine learning rocks")
    rows = extract_mentions(t, ["machine", "machine learning"]).collect()
    assert [r["text"] for r in rows] == ["machine learning"]


def test_word_boundaries(spark):
    t = _turns(spark, "HTML is not ML but ML is ML")
    rows = extract_mentions(t, ["ML"]).collect()
    assert len(rows) == 3  # not the one inside HTML


def test_case_sensitive_default(spark):
    t = _turns(spark, "nlp is lowercase NLP is upper")
    rows = extract_mentions(t, ["NLP"]).collect()
    assert [r["start"] for r in rows] == [17]


def test_mention_ids_deterministic(spark):
    t = _turns(spark, "NLP and NLP again")
    a = extract_mentions(t, ["NLP"]).orderBy("start").collect()
    b = extract_mentions(t, ["NLP"]).orderBy("start").collect()
    assert [r["mention_id"] for r in a] == [r["mention_id"] for r in b]
    assert len({r["mention_id"] for r in a}) == 2


def test_validate_spans_filters_bad_offsets(spark):
    t = _turns(spark, "NLP here")
    good = extract_mentions(t, ["NLP"])
    bad = good.withColumn("start", F.col("start") + 1)
    assert validate_spans(good, t).count() == 1
    assert validate_spans(bad, t).count() == 0


def test_ac_engine_matches_regex(spark):
    """AC and regex engines are drop-in equivalent (same spans, same order)
    on text exercising boundaries, overlaps, longest-wins, repeats."""
    texts = [
        "NLP and machine learning beat HTML ML parsing; ML!",
        "machine learning machine learninging learning machine",
        "(NLP) ML-ops nlp NLP2 2NLP NLP",
        "",
        "no mentions at all here",
    ]
    t = spark.createDataFrame(
        [("c1", i, "user", s, "", None) for i, s in enumerate(texts)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    pats = ["NLP", "ML", "machine learning", "learning machine", "machine"]
    want = [
        (r["turn_idx"], r["text"], r["start"], r["end"])
        for r in extract_mentions(t, pats, engine="regex").orderBy("turn_idx", "start").collect()
    ]
    got = [
        (r["turn_idx"], r["text"], r["start"], r["end"])
        for r in extract_mentions(t, pats, engine="ac").orderBy("turn_idx", "start").collect()
    ]
    assert want == got and len(want) > 5


def test_ac_engine_case_insensitive_matches_regex(spark):
    t = _turns(spark, "nlp NLP Nlp xNLP NLP2 machine Learning")
    pats = ["NLP", "machine learning"]
    want = [
        (r["text"], r["start"]) for r in
        extract_mentions(t, pats, case_insensitive=True, engine="regex").orderBy("start").collect()
    ]
    got = [
        (r["text"], r["start"]) for r in
        extract_mentions(t, pats, case_insensitive=True, engine="ac").orderBy("start").collect()
    ]
    assert want == got and len(want) == 4


def test_ac_casefold_unicode_matches_regex(spark):
    """ADVICE r2: re.IGNORECASE simple-folds 'ſ' (LONG S) to 's', but
    lower() keeps it — the AC engine must fall back to regex for texts (or
    pattern sets) where lower() and casefold() disagree, so both engines
    return identical spans."""
    texts = [
        "nlpſ is here",   # text-side long s: regex matches pattern 'nlps'
        "NLPS and nlps",
        "straße walk",    # ß: casefold length-changes
    ]
    t = spark.createDataFrame(
        [("c1", i, "user", s, "", None) for i, s in enumerate(texts)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    pats = ["nlps", "walk"]
    want = [
        (r["turn_idx"], r["start"], r["end"])
        for r in extract_mentions(t, pats, case_insensitive=True, engine="regex")
        .orderBy("turn_idx", "start").collect()
    ]
    got = [
        (r["turn_idx"], r["start"], r["end"])
        for r in extract_mentions(t, pats, case_insensitive=True, engine="ac")
        .orderBy("turn_idx", "start").collect()
    ]
    assert want == got
    assert (0, 0, 4) in want  # the 'nlpſ' match regex finds must survive

    # pattern-side long s: auto engine must stay on regex for this set
    pats2 = ["nlpſ"] + [f"p{i}" for i in range(300)]  # >= AC_MIN_PATTERNS
    t2 = _turns(spark, "NLPS appears")
    got2 = extract_mentions(t2, pats2, case_insensitive=True, engine="auto").collect()
    want2 = extract_mentions(t2, pats2, case_insensitive=True, engine="regex").collect()
    assert [(r["start"], r["end"]) for r in got2] == [(r["start"], r["end"]) for r in want2]


def test_gazetteer_matches_regex_on_golden_aliases(spark):
    """The distributed join gazetteer reproduces the regex engine exactly
    over the golden alias list on synthetic transcripts."""
    from spacy_ann_linker_spark.data import golden_kb
    from spacy_ann_linker_spark.data.transcripts import generate_transcripts
    from spacy_ann_linker_spark.mentions.extract import extract_mentions_gazetteer

    turns = generate_transcripts(spark, 300)
    aliases = golden_kb.load_aliases(spark).select("alias")
    pats = [r["alias"] for r in aliases.collect()]
    want = {
        (r["conv_id"], r["turn_idx"], r["start"], r["end"], r["text"])
        for r in extract_mentions(turns, pats, engine="regex").collect()
    }
    got = {
        (r["conv_id"], r["turn_idx"], r["start"], r["end"], r["text"])
        for r in extract_mentions_gazetteer(turns, aliases).collect()
    }
    assert want == got and len(want) > 100


def test_gazetteer_40k_alias_kb_bounded(spark):
    """Scale smoke (VERDICT item 5): 40k-alias synthetic KB, no driver-side
    pattern list — extraction completes in bounded time and AC agrees."""
    import time

    from spacy_ann_linker_spark.data.synthetic_kb import generate_kb
    from spacy_ann_linker_spark.data.transcripts import generate_transcripts
    from spacy_ann_linker_spark.mentions.extract import extract_mentions_gazetteer

    _, aliases = generate_kb(spark, 20_000)  # 2 aliases per entity
    alias_names = aliases.select("alias")
    turns = generate_transcripts(spark, 500)
    t0 = time.perf_counter()
    got = extract_mentions_gazetteer(turns, alias_names).count()
    gaz_sec = time.perf_counter() - t0
    pats = [r["alias"] for r in alias_names.collect()]
    t0 = time.perf_counter()
    want = extract_mentions(turns, pats, engine="ac").count()
    ac_sec = time.perf_counter() - t0
    assert got == want
    assert gaz_sec < 120 and ac_sec < 120  # bounded even on a throttled host


def test_gazetteer_salted_join_equals_broadcast_on_hot_first_word(spark):
    """Skew path (VERDICT r2 item 6): an alias table where half the aliases
    share the first word "The" — the exact shape that funnels one join key
    to one reducer. The salted non-broadcast plan must replicate the alias
    side across buckets and return EXACTLY the broadcast path's mentions."""
    from spacy_ann_linker_spark.mentions.extract import extract_mentions_gazetteer

    hot = [f"The topic {i}" for i in range(50)]
    cold = [f"subject{i} matter" for i in range(50)]
    aliases = spark.createDataFrame([(a,) for a in hot + cold], "alias string")
    texts = [
        f"we discussed The topic {i % 50} and subject{(i * 7) % 50} matter today"
        for i in range(120)
    ] + ["The unrelated thing", "no mentions here"]
    turns = spark.createDataFrame(
        [("c1", i, "user", s, "", None) for i, s in enumerate(texts)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )

    def key_set(df):
        return {
            (r["conv_id"], r["turn_idx"], r["start"], r["end"], r["text"])
            for r in df.collect()
        }

    want = key_set(extract_mentions_gazetteer(turns, aliases, broadcast_aliases=True))
    salted = extract_mentions_gazetteer(
        turns, aliases, broadcast_aliases=False, salt_buckets=8
    )
    assert key_set(salted) == want and len(want) >= 240
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan, "salted replication missing from the physical plan"
    # plain shuffle path (no salting) also agrees
    plain = extract_mentions_gazetteer(turns, aliases, broadcast_aliases=False)
    assert key_set(plain) == want


def test_gazetteer_punctuation_aliases_match_regex(spark):
    """Aliases starting/ending with non-word chars (.NET, C++) and nested
    word-boundary traps (ML inside HTML) behave identically across engines."""
    from spacy_ann_linker_spark.mentions.extract import extract_mentions_gazetteer

    t = spark.createDataFrame(
        [("c1", 0, "user", "use C++ and .NET and Neuro-linguistic programming today", "", None),
         ("c1", 1, "user", "nested ML in HTML but plain ML works; (ML) too", "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    aliases = spark.createDataFrame(
        [("C++",), (".NET",), ("Neuro-linguistic programming",), ("ML",)], "alias string"
    )
    pats = ["C++", ".NET", "Neuro-linguistic programming", "ML"]
    want = sorted(
        (r["turn_idx"], r["start"], r["text"])
        for r in extract_mentions(t, pats, engine="regex").collect()
    )
    got = sorted(
        (r["turn_idx"], r["start"], r["text"])
        for r in extract_mentions_gazetteer(t, aliases).collect()
    )
    assert want == got and len(want) == 6


def test_ac_find_spans_matches_regex_property():
    """Property: the pure-python AC matcher (find_spans_ac) and the regex
    scanner produce identical spans for arbitrary pattern sets and texts
    over a small alphabet (dense overlaps, shared prefixes/suffixes,
    boundary collisions)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spacy_ann_linker_spark.mentions.extract import (
        AhoCorasick,
        _compile,
        find_spans,
        find_spans_ac,
    )

    word = st.text(alphabet="ab_ ", min_size=1, max_size=6)
    texts = st.text(alphabet="ab_ .x", max_size=40)

    @settings(max_examples=300, deadline=None)
    @given(pats=st.lists(word, min_size=1, max_size=8), text=texts, ci=st.booleans())
    def check(pats, text, ci):
        pats = [p for p in pats if p.strip()]
        if not pats:
            return
        rx = _compile(pats, ci)
        ac = AhoCorasick(pats, ci)
        want = find_spans(text, rx, None)
        got = find_spans_ac(text, ac, None)
        assert got == want, (pats, text, ci)

    check()
