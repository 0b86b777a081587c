"""T6 stemmer: the Porter2 implementation against the PUBLISHED
Snowball spec examples (independent ground truth, committed as
fixtures/porter2_spec_vocab.csv), the kljensen Stem(w, false)
stop-through contract, and the Spark vocab path's equivalence with
the pure-Python function."""

import csv
import os

import pytest
from pyspark.sql import Row

from gocrawler_spark.functions.stem import (
    STOPWORDS,
    stem,
    stem_or_stop,
    stem_vocab,
    stemmed_corpus_freq,
)

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gocrawler_spark",
    "fixtures",
)


def spec_pairs():
    with open(os.path.join(FIXTURES, "porter2_spec_vocab.csv")) as f:
        return [(r["word"], r["stem"]) for r in csv.DictReader(f)]


def test_spec_vocabulary_exact():
    """Every (word, stem) pair published on the spec page (sample
    vocabulary + worked rule examples) must match exactly."""
    pairs = spec_pairs()
    assert len(pairs) >= 130
    bad = [(w, stem(w), e) for w, e in pairs if stem(w) != e]
    assert not bad, bad


def test_stop_through_contract():
    """kljensen Stem(w, stemStopWords=false): Snowball stop-list words
    pass through even when the bare algorithm would change them."""
    assert stem("only") == "onli"  # exception-list stem
    assert stem_or_stop("only") == "only"  # ...but 'only' is a stopword
    assert stem_or_stop("being") == "being"
    assert stem_or_stop("running") == "run"  # non-stopword stems
    assert "only" in STOPWORDS and "running" not in STOPWORDS


def test_short_word_and_edge_inputs():
    assert stem("") == ""
    assert stem("a") == "a"
    assert stem("by") == "by"  # 1c: non-vowel is the first letter
    assert stem("'cause") == "caus"  # initial apostrophe stripped
    assert stem("dog's") == "dog"  # step 0


def test_consecutive_y_marking():
    """Sequential y-marking: in 'ayy' only the first y follows a vowel
    (the marked Y is a consonant), so the second y stays vowel-y and
    the word keeps both letters."""
    assert stem("sayyid") == "sayyid"


def test_spark_vocab_path_matches_python(spark):
    words = sorted({w for w, _ in spec_pairs()} | set(list(STOPWORDS)[:20]))
    df = spark.createDataFrame([Row(token=w) for w in words])
    got = {r["token"]: r["stem"] for r in stem_vocab(df).collect()}
    assert got == {w: stem_or_stop(w) for w in words}


def test_stemmed_corpus_freq_reaggregates(spark):
    """freq-then-stem == stem-then-freq for a pure token function:
    knitted(3) + knitting(2) + knits(1) all fold into knit(6)."""
    freq = spark.createDataFrame(
        [
            Row(token="knitted", count=3),
            Row(token="knitting", count=2),
            Row(token="knits", count=1),
            Row(token="spark", count=5),
        ]
    )
    out = {r["stem"]: r["count"] for r in stemmed_corpus_freq(freq).collect()}
    assert out == {"knit": 6, "spark": 5}


@pytest.mark.parametrize(
    "word,expected",
    [
        ("vietnamization", "vietnam"),
        ("communism", "communism"),  # commun- R1 prefix rule
        ("arsenal", "arsenal"),  # arsen- R1 prefix rule
        ("generalization", "general"),  # gener- R1 prefix rule
        ("luxuriated", "luxuri"),
        ("hopping", "hop"),  # undouble
        ("hoping", "hope"),  # short-word +e
        ("exceeding", "exceed"),  # 1a-invariant then 1b eed->ee?  exc2
    ],
)
def test_targeted_rules(word, expected):
    assert stem(word) == expected


def test_fuzz_never_crashes_and_bounded():
    """stem() is total over arbitrary lowercase token-ish strings:
    never raises, never grows the word by more than the +e restoration,
    returns '' only for ''."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=500, deadline=None)
    @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz'y", max_size=24))
    def run(w):
        out = stem(w)
        assert isinstance(out, str)
        assert len(out) <= len(w) + 1
        if len(w) > 3:
            assert out != ""

    run()
