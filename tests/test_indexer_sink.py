"""S11 indexer sink: QueryEscape request construction, executor-side
delivery with swallowed failures, engine wiring, and the streaming twin."""

import datetime
import glob
import os

from gocrawler_spark.config import test_profile as _tp
from gocrawler_spark.plans.crawl import CrawlEngine
from gocrawler_spark.sinks import indexer as IX
from gocrawler_spark.streaming import corpus_stream as CS

ADD_URL = "https://search.example/addUrlPost.php?sender=goCrawler&url="


def _file_transport(dir_path):
    """Recording transport usable from executor processes in local mode:
    append each request to a per-pid file."""

    def t(request_url: str) -> None:
        with open(os.path.join(dir_path, f"req-{os.getpid()}.log"), "a") as f:
            f.write(request_url + "\n")

    return t


def _recorded(dir_path):
    out = []
    for p in glob.glob(os.path.join(dir_path, "req-*.log")):
        out.extend(ln.strip() for ln in open(p) if ln.strip())
    return out


def test_request_urls_query_escape(spark):
    df = spark.createDataFrame(
        [("https://a.example/x y?q=1&r=2",), ("https://b.example/p",)],
        "url string",
    )
    got = {r["url"]: r["request_url"] for r in IX.request_urls(df, ADD_URL).collect()}
    # Go url.QueryEscape: space->'+', reserved chars percent-encoded
    assert got["https://a.example/x y?q=1&r=2"] == (
        ADD_URL + "https%3A%2F%2Fa.example%2Fx+y%3Fq%3D1%26r%3D2"
    )
    assert got["https://b.example/p"] == ADD_URL + "https%3A%2F%2Fb.example%2Fp"


def test_notify_indexer_delivers_and_swallows_failures(spark, tmp_path):
    rec = str(tmp_path)
    df = spark.createDataFrame(
        [("https://a.example/1",), ("https://boom.example/2",)], "url string"
    )

    def flaky(request_url: str) -> None:
        if "boom" in request_url:
            raise RuntimeError("indexer down")
        # inline write: keeps the closure free of test-module globals,
        # which executor processes cannot import
        with open(os.path.join(rec, f"req-{os.getpid()}.log"), "a") as f:
            f.write(request_url + "\n")

    IX.notify_indexer(df, ADD_URL, flaky)  # must not raise
    got = _recorded(rec)
    assert len(got) == 1 and "a.example" in got[0]


def test_notify_indexer_disabled_without_add_url(spark, tmp_path):
    rec = str(tmp_path)
    df = spark.createDataFrame([("https://a.example/1",)], "url string")
    IX.notify_indexer(df, "", _file_transport(rec))
    assert _recorded(rec) == []


def test_engine_notifies_accepted_docs(spark, tmp_path):
    rec = str(tmp_path)
    cfg = _tp(wave_size=1, add_url=ADD_URL)
    eng = CrawlEngine(spark, cfg, index_transport=_file_transport(rec))
    st = eng.run(max_steps=6)
    accepted = {r["url"] for r in st.accepted.select("url").collect()}
    got = _recorded(rec)
    assert len(got) == len(accepted) > 0
    # each request embeds exactly one accepted URL, form-encoded
    from urllib.parse import unquote_plus

    assert {unquote_plus(u[len(ADD_URL):]) for u in got} == accepted


def test_indexer_stream_sink(spark, tmp_path):
    rec, inp, ckpt = (str(tmp_path / d) for d in ("r", "in", "ck"))
    for d in (rec, inp):
        os.makedirs(d, exist_ok=True)
    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        (f"https://s.example/p{i}", "body", f"s{i}", t0)
        for i in range(5)
    ]
    spark.createDataFrame(rows, CS.ACCEPTED_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    q = IX.indexer_stream_sink(
        CS.accepted_docs_stream(spark, inp), ADD_URL, _file_transport(rec), ckpt
    )
    q.awaitTermination()
    assert len(_recorded(rec)) == 5
