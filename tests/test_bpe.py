"""BPE tokenizer (operators/bpe.py): hand-computed merge sequence,
encode round-trip, determinism, and a Python-oracle check of the
distributed doc-stats pass."""

import re

import pytest
from pyspark.sql import functions as F

from gocrawler_spark.operators import bpe as BPE


def test_training_hand_computed_merges():
    # one type "aaab" x3: symbols a a a b </w>
    # pair counts: (a,a)=6 (two per word), (a,b)=3, (b,</w>)=3
    # merge 1: (a,a) -> words become [aa, a, b, </w>]
    # now (aa,a)=3, (a,b)=3, (b,</w>)=3 -> tie broken lexicographically:
    # ("a","b") < ("aa","a") < ("b","</w>")  => merge 2 is (a,b)? NO:
    # after merge 1 the word is (aa, a, b, </w>) so pair (a,b) exists.
    merges = BPE.train_bpe_from_counts([("aaab", 3)], n_merges=2)
    assert merges[0] == ("a", "a")
    assert merges[1] == ("a", "b")


def test_training_respects_min_pair_count():
    merges = BPE.train_bpe_from_counts([("ab", 1)], n_merges=10, min_pair_count=2)
    assert merges == []


def test_encode_round_trip_and_greedy_rank():
    types = [("lowest", 5), ("lower", 3), ("low", 7)]
    merges = BPE.train_bpe_from_counts(types, n_merges=6)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in types:
        syms = BPE.encode_word(w, ranks)
        assert "".join(syms) == w + BPE.END  # lossless segmentation
    # untrained word still encodes (to chars + END at worst)
    syms = BPE.encode_word("zzz", ranks)
    assert "".join(syms) == "zzz" + BPE.END


def test_training_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"spark merge shuffle spark merge table{i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    m1 = BPE.train_bpe(docs, n_merges=30, max_types=100)
    m2 = BPE.train_bpe(docs, n_merges=30, max_types=100)
    assert m1 == m2 and len(m1) > 0


def test_doc_stats_matches_python_oracle(spark):
    rows = [
        (0, "low lower lowest"),
        (1, "the quick brown fox 42 jumps"),
        (2, ""),
        (3, "aaa AAA aAa"),  # case folds to one type
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = BPE.train_bpe(docs, n_merges=20, max_types=100)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["n_chars_in_words"])
        for r in BPE.bpe_doc_stats(docs, merges).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    word_re = re.compile(BPE.WORD_RE)
    for did, text in rows:
        ws = word_re.findall(text.lower())
        want = (
            len(ws),
            sum(len(BPE.encode_word(w, ranks)) for w in ws),
            sum(len(w) for w in ws),
        )
        assert got[did] == want
    # more merges => no more tokens than fewer merges
    m_small = BPE.train_bpe(docs, n_merges=3, max_types=100)
    tot_small = (
        BPE.bpe_doc_stats(docs, m_small)
        .agg(F.sum("n_bpe_tokens")).collect()[0][0]
    )
    tot_big = (
        BPE.bpe_doc_stats(docs, merges)
        .agg(F.sum("n_bpe_tokens")).collect()[0][0]
    )
    assert tot_big <= tot_small


def test_registered_query_runs(spark):
    from gocrawler_spark.queries import QUERIES

    df = QUERIES["bpe_token_stats"](spark, "/root/testdata/sf0.001")
    r = df.agg(
        F.count(F.lit(1)), F.sum("n_bpe_tokens"), F.sum("n_words")
    ).collect()[0]
    assert r[0] == 500 and r[1] >= r[2] > 0
    # compression sanity: BPE tokens <= chars-in-words + words (char fallback)
    bad = df.filter(
        F.col("n_bpe_tokens") > F.col("n_chars_in_words") + F.col("n_words")
    ).count()
    assert bad == 0


def test_spark_path_matches_naive_oracle(spark):
    """Drift guard for the pinned bpe_token_stats oracle fixtures: the
    engine's incremental trainer + Arrow-batched encoder must agree
    with the algorithmically independent naive reference
    (oracle/bpe_naive.py, full pair recount per merge) on the real
    sf0.001 corpus — same constants as the registered query."""
    from gocrawler_spark.oracle import bpe_naive as NB
    from gocrawler_spark.queries.text_q import _BPE_MAX_TYPES, _BPE_N_MERGES

    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    doc_ids = [r["doc_id"] for r in rows]
    texts = [r["text"] for r in rows]

    naive_merges = NB.naive_train(texts, _BPE_N_MERGES, _BPE_MAX_TYPES)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    eng_merges = BPE.train_bpe(
        docs, n_merges=_BPE_N_MERGES, max_types=_BPE_MAX_TYPES
    )
    assert eng_merges == naive_merges

    want = {
        r[0]: r[1:] for r in NB.naive_doc_stats(doc_ids, texts, naive_merges)
    }
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["n_chars_in_words"])
        for r in BPE.bpe_doc_stats(docs, eng_merges).collect()
    }
    assert got == want
