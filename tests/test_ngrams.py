"""N-gram miner (W3/A7/W4): border asymmetry, sentence dedup, the
101-row reference cap, cross-level pruning rules."""

import pytest
from pyspark.sql import functions as F

from gocrawler_spark.config import covid_profile
from gocrawler_spark.operators import ngrams as NG

CFG = covid_profile()


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_sentence_split_and_dedup(spark):
    # same top-7 signature twice -> only the first survives
    docs = _docs(spark, ["alpha beta gamma. alpha beta gamma. delta epsilon zeta"])
    sents = NG.dedup_sentences(NG.sentences_of(docs), CFG).collect()
    texts = sorted(r["sentence"] for r in sents)
    assert texts == ["alpha beta gamma", "delta epsilon zeta"]
    # the survivor is the first occurrence (pos order)
    first = [r for r in sents if r["sentence"] == "alpha beta gamma"][0]
    assert first["pos"] == 0


def test_border_asymmetry(spark):
    """Left border rejects stop+lowrel; right border rejects only
    stopwords (crawler.go:633-643). 'data' is a low-relevancy word:
    banned on the left, allowed on the right."""
    docs = _docs(spark, ["data warehouse engines process warehouse data"] * 3)
    sents = NG.dedup_sentences(NG.sentences_of(docs), CFG)
    grams = {r["gram"] for r in NG.ngrams_of_sentences(sents, CFG, 2).collect()}
    assert "data warehouse" not in grams  # lowrel on LEFT border -> reject
    assert "warehouse data" in grams  # lowrel on RIGHT border -> allowed
    assert "warehouse engines" in grams


def test_stopword_rejected_both_borders(spark):
    docs = _docs(spark, ["the engine runs the"] * 3)
    sents = NG.dedup_sentences(NG.sentences_of(docs), CFG)
    grams = {r["gram"] for r in NG.ngrams_of_sentences(sents, CFG, 2).collect()}
    assert "the engine" not in grams
    assert "runs the" not in grams
    assert "engine runs" in grams


def test_ignore_tokens(spark):
    docs = _docs(spark, ["wikipedia cite_note engine https link worth keeping"] * 3)
    sents = NG.dedup_sentences(NG.sentences_of(docs), CFG)
    grams = {r["gram"] for r in NG.ngrams_of_sentences(sents, CFG, 2).collect()}
    assert not any("cite_note" in g for g in grams)
    assert not any("https" in g.split() for g in grams)
    assert "worth keeping" in grams


def test_level_cap_101_and_min_freq(spark):
    # 150 distinct bigrams x3 occurrences + one x2 (dropped); unique
    # filler tokens keep every sentence's signature distinct so the
    # sentence dedup doesn't collapse the repeats
    texts = []
    for i in range(150):
        texts += [f"uniqtok{i}a uniqtok{i}b filler{i}x{j}" for j in range(3)]
    texts += [f"raretok1 raretok2 fillerr{j}" for j in range(2)]
    docs = _docs(spark, ["\n".join(texts)])
    sents = NG.dedup_sentences(NG.sentences_of(docs), CFG)
    lvl = NG.ngram_level(sents, CFG, 2).collect()
    assert len(lvl) == 101  # the reference's break-at->100 off-by-one
    assert all(r["cnt"] >= 3 for r in lvl)


def test_pruning_superset_absorbs(spark):
    """'alpha bravo charlie' (freq 6) absorbs 'alpha bravo' (freq 6):
    superset cnt 6 > 6/2."""
    docs = _docs(spark, ["alpha bravo charlie"] * 6)
    # distinct sentences needed to avoid sentence-dedup collapse
    docs = _docs(
        spark, ["alpha bravo charlie extra%d" % i for i in range(6)]
    )
    out = NG.ngrams_all_levels(docs, CFG, n_max=3).collect()
    got = {(r["n"], r["gram"]) for r in out}
    assert (3, "alpha bravo charlie") in got
    assert (2, "alpha bravo") not in got  # absorbed by superset
    assert (2, "bravo charlie") not in got


def test_pruning_subset_dominates(spark):
    """A subset with >2x the frequency kills the longer gram."""
    texts = ["foo bar baz pad%d" % i for i in range(3)]  # trigram freq 3
    texts += ["foo bar solo%d" % i for i in range(7)]  # bigram freq 10 > 2*3
    docs = _docs(spark, texts)
    out = NG.ngrams_all_levels(docs, CFG, n_max=3).collect()
    got = {(r["n"], r["gram"]): r["cnt"] for r in out}
    assert got.get((2, "foo bar")) == 10
    assert (3, "foo bar baz") not in got  # subset freq 10 > 2*3


def test_pruning_survivor(spark):
    """Equal frequencies: trigram survives (subset not >2x), bigrams
    absorbed by the superset."""
    docs = _docs(spark, ["quark lepton boson tail%d" % i for i in range(4)])
    out = NG.ngrams_all_levels(docs, CFG, n_max=3).collect()
    got = {(r["n"], r["gram"]): r["cnt"] for r in out}
    assert got.get((3, "quark lepton boson")) == 4
    assert (2, "quark lepton") not in got
