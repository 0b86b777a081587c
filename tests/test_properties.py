"""Property-based tests (hypothesis) — SURVEY.md §5.4: the invariants
the engine's correctness rests on, checked over generated inputs
rather than fixtures.

Pattern: each hypothesis example generates a BATCH of inputs and runs
ONE Spark job over it (per-row examples would pay job-scheduling cost
thousands of times), with small max_examples and no deadline.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gocrawler_spark.config import covid_profile
from gocrawler_spark.functions import pyref
from gocrawler_spark.functions import text as TX
from gocrawler_spark.functions import urls as U
from gocrawler_spark.operators import bloom as BL
from gocrawler_spark.operators import corpus as CO
from gocrawler_spark.operators.frontier import select_wave
from unicode_skew import strip_skew

CFG = covid_profile()

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# --------------------------------------------------------------- URLs
_label = st.text("abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8)
_urls = st.builds(
    lambda scheme, labels, port, path, query, frag: (
        scheme
        + "://"
        + ".".join(labels)
        + port
        + ("/" + "/".join(path) if path else "")
        + query
        + frag
    ),
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    st.lists(_label, min_size=1, max_size=4),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.lists(_label, min_size=0, max_size=3),
    st.sampled_from(["", "?", "?a=1&b=2"]),
    st.sampled_from(["", "#frag", "#"]),
)


@pytest.mark.usefixtures("spark")
class TestProperties:
    @given(urls=st.lists(_urls, min_size=1, max_size=200))
    @settings(**SETTINGS)
    def test_canonicalize_idempotent(self, spark, urls):
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        out = df.select(
            U.canonicalize(F.col("url")).alias("once")
        ).select(
            "once", U.canonicalize(F.col("once")).alias("twice")
        )
        bad = out.filter(F.col("once") != F.col("twice")).collect()
        assert bad == [], f"canonicalize not idempotent on: {bad[:3]}"

    @given(texts=st.lists(st.text(max_size=200), min_size=1, max_size=100))
    @settings(**SETTINGS)
    def test_tokenize_matches_python_oracle(self, spark, texts):
        # drop codepoints where this environment's Python and JVM
        # Unicode tables disagree on \p{L}\p{N} (see unicode_skew.py)
        texts = [strip_skew(t) for t in texts]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = [
            r["toks"]
            for r in df.select(
                TX.tokens_of(F.col("text")).alias("toks")
            ).collect()
        ]
        want = [pyref.tokenize(t) for t in texts]
        assert got == want

    @given(texts=st.lists(st.text(max_size=200), min_size=1, max_size=100))
    @settings(**SETTINGS)
    def test_analyzer_matches_python_oracle(self, spark, texts):
        """The decomposed InSet + residual-regex stopword filter equals
        the reference's regex-dance transliteration (T5/T7)."""
        texts = [strip_skew(t) for t in texts]  # see unicode_skew.py
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = [
            r["a"]
            for r in df.select(
                TX.analyzed_tokens(F.col("text"), CFG).alias("a")
            ).collect()
        ]
        want = [pyref.analyze(t, CFG) for t in texts]
        assert got == want

    @given(
        freqs=st.dictionaries(
            st.text("abcdefgh", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=50),
            min_size=1,
            max_size=80,
        ),
        k=st.integers(min_value=1, max_value=20),
    )
    @settings(**SETTINGS)
    def test_topk_matches_total_order(self, spark, freqs, k):
        """W1/W2: TakeOrderedAndProject top-k equals the Python sort by
        (count desc, token desc) — the reference's rSortFreq order."""
        df = spark.createDataFrame(
            list(freqs.items()), "token string, count long"
        )
        got = [(r["token"], r["count"]) for r in CO.top_k(df, k).collect()]
        # NB: reverse=True of (count, token) is the correct "desc
        # count, desc token" — the tuple(-ord(c)) trick is WRONG for
        # prefix pairs ('a' vs 'aa': string DESC ranks 'aa' first,
        # negated ords rank 'a' first; hypothesis found it)
        want = sorted(
            freqs.items(), key=lambda kv: (kv[1], kv[0]), reverse=True
        )[:k]
        assert got == want

    @given(
        urls=st.lists(_urls, min_size=1, max_size=300, unique=True),
    )
    @settings(max_examples=3, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def test_bloom_no_false_negatives(self, spark, urls):
        """The seen-set invariant resume/merge correctness rests on:
        every inserted key probes maybe_seen=true."""
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        bloom = BL.build(
            df, n_shards=8, expected_keys_per_shard=1000, fpr=1e-6
        )
        p = BL.probe(bloom, df, n_shards=8)
        assert p.filter(~F.col("maybe_seen")).count() == 0

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10_000),  # url nonce
                st.sampled_from([f"d{i}.com" for i in range(6)]),
                st.integers(min_value=1, max_value=9),  # count
                st.sampled_from([0, 0, 0, 2, 4]),  # status
            ),
            min_size=1,
            max_size=200,
            unique_by=lambda t: t[0],
        ),
        wave=st.integers(min_value=1, max_value=8),
    )
    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def test_selection_invariant_under_partitioning(self, spark, rows, wave):
        """F8's deterministic total order (bootstrap-first, priority
        desc, seq asc) must not depend on physical partitioning."""
        data = [
            (f"https://{d}/p{n}", d, c, s, i, True)
            for i, (n, d, c, s) in enumerate(rows)
        ]
        schema = "url string, domain string, count long, status int, seq long, eligible boolean"
        dc = spark.createDataFrame(
            [(d, 1) for d in {r[1] for r in data}], "domain string, n_scheduled long"
        )
        sels = []
        for parts in (1, 7):
            fr = spark.createDataFrame(data, schema).repartition(parts)
            sels.append(
                [
                    (r["url"], r["seq"])
                    for r in select_wave(fr, dc, wave, 2).collect()
                ]
            )
        assert sels[0] == sels[1]


def test_scale_engine_partitioning_invariance(spark):
    """The scale-mode engine's RESULT must not depend on
    spark.sql.shuffle.partitions: the decomposed seq assignment and the
    wave-barrier signature first-wins are exactly the code that could
    silently pick up a partition-count dependence (round-3 verdict
    "Next round" #4). Run the 8x8 loop at 4 and at 64 shuffle
    partitions and assert the frontier and visited relations are
    identical."""
    from gocrawler_spark.config import test_profile
    from gocrawler_spark.plans.crawl import CrawlEngine
    from tests.conftest import session_confs

    def run(nparts):
        with session_confs(
            spark, {"spark.sql.shuffle.partitions": str(nparts)}
        ):
            eng = CrawlEngine(
                spark, test_profile(wave_size=8, per_host_budget=2)
            )
            st = eng.run(max_steps=8)
            frontier = sorted(
                (r["url"], r["domain"], r["count"], r["status"], r["seq"])
                for r in st.frontier.select(
                    "url", "domain", "count", "status", "seq"
                ).collect()
            )
            visited = sorted(
                (r["wave"], r["url"], r["status_after"])
                for r in st.crawl_log.select(
                    "wave", "url", "status_after"
                ).collect()
            )
            eng.pins.release_all()
            return frontier, visited

    f4, v4 = run(4)
    f64, v64 = run(64)
    assert f4 == f64
    assert v4 == v64
    assert len(f4) > 100 and len(v4) >= 50  # the run actually ran
