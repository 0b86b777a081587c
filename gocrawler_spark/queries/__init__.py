"""Query registry for the driver's correctness gate.

Every implemented operator from SURVEY.md §2 (plus the training-data
pipeline extensions) is exposed twice:

- a Spark callable ``(spark, sf_dir) -> DataFrame`` (the engine path),
- an equivalent ANSI-SQL string runnable by DuckDB on the same parquet
  tables (the oracle path).

Conventions that keep the driver's order-insensitive value-hash
comparison exact:
- every computed column is aliased identically on both sides;
- float results are emitted as ``*_micro`` BIGINT (round(x*1e6)) —
  double arithmetic is kept identical on both sides (IEEE ops in the
  same order) and integerized before hashing;
- sums of doubles are computed as sums of pre-rounded BIGINTs
  (order-independent), never as float SUM (which is
  association-order-dependent and differs across engines);
- top-k queries use a deterministic total order (count desc, key desc
  — the reference's rSortFreq order, crawler.go:705-718).

DuckDB pitfalls that have bitten (cast explicitly in oracle SQL):
- VALUES integer literals bind as INT32 — products overflow; CAST the
  unpivoted value to BIGINT before any multiplication;
- SUM() returns HUGEINT/decimal128 — CAST to BIGINT at every output
  AND before feeding range()/generate_series (range(HUGEINT) fails);
- window SUM feeding integer division: CAST the cumsum to BIGINT;
- int*int literals in SELECT (e.g. alpha*m*m) stay INT32 — write
  float literals when the product exceeds 2^31;
- Spark parquet timestamps are TIMESTAMP_NTZ: unix_micros() rejects
  them — use timestampdiff(MICROSECOND, ...) / DuckDB
  date_diff('microseconds', ...) for exact integer gaps.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle_sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle_sql is not None:
            ORACLES[name] = oracle_sql
        return fn

    return deco


# Session-scoped result materialization for expensive queries with
# SMALL outputs that other queries consume (the curation funnel reads
# the dedup-cluster, contamination, and quality gate relations; the
# cluster query reads the Jaccard pairs). This is the in-session analog
# of how a 100 TB pipeline actually runs: each gate is materialized as
# a table once and every downstream join reads the table, not the
# recomputed lineage. Keyed by (SparkContext, sf_dir); blocks are tiny
# (see each decorated query).
#
# EVICTION: a long-lived session sweeping many sf_dirs would otherwise
# accumulate pinned relations forever (localCheckpoint blocks survive
# dereferencing until the context dies). Every participating memo dict
# registers here, and touching an sf_dir beyond the two most recent
# evicts + unpersists every memoized frame of the oldest one.
_RESULT_MEMO: dict = {}
_MEMO_REGISTRY: list[dict] = [_RESULT_MEMO]
_SF_RECENCY: list[tuple] = []  # (app_id, sf_dir), most recent LAST
MEMO_MAX_SF_DIRS = 2
# id(pinned df) -> (df strong ref, its persistent-RDD ids, session):
# DataFrame.unpersist() cannot release a localCheckpoint's blocks (it
# talks to the SQL cache manager, not the block manager), so memo pins
# record their RDD ids the way PinSet does and eviction frees them
# through the JVM persistent-RDD registry.
_PIN_IDS: dict[int, tuple] = {}


def pin_memo_df(spark: SparkSession, df: DataFrame) -> DataFrame:
    from gocrawler_spark.pins import _persistent_ids

    before = _persistent_ids(spark)
    out = df.localCheckpoint(eager=True)
    _PIN_IDS[id(out)] = (out, _persistent_ids(spark) - before, spark)
    return out


def register_memo(memo: dict) -> dict:
    """Join a memo dict (keys starting with (app_id, sf_dir, ...)) to
    the shared eviction policy."""
    if not any(m is memo for m in _MEMO_REGISTRY):  # identity, not ==
        _MEMO_REGISTRY.append(memo)
    return memo


def touch_sf_dir(app_id: str, sf_dir: str) -> None:
    """Mark (app_id, sf_dir) most-recently-used; evict + unpersist
    every registered memo entry of sf_dirs beyond the newest
    MEMO_MAX_SF_DIRS."""
    k = (app_id, sf_dir)
    if k in _SF_RECENCY:
        _SF_RECENCY.remove(k)
    _SF_RECENCY.append(k)
    while len(_SF_RECENCY) > MEMO_MAX_SF_DIRS:
        old = _SF_RECENCY.pop(0)
        for memo in _MEMO_REGISTRY:
            for mk in [x for x in memo if tuple(x[:2]) == old]:
                release_memo_df(memo.pop(mk))


def release_memo_df(df: DataFrame) -> None:
    ent = _PIN_IDS.pop(id(df), None)
    if ent is None:
        return
    _, ids, spark = ent
    try:
        from gocrawler_spark.pins import _unpersist_ids

        _unpersist_ids(spark, ids)
    except Exception:
        pass  # context already stopped


def memo_result(fn):
    """Memoize a query's pinned result per (app_id, sf_dir).

    LIFETIME CONTRACT (localCheckpoint is non-reliable): a frame
    returned by a memoized query — or anything lazily derived from
    it — stays valid only until `MEMO_MAX_SF_DIRS` NEWER sf_dirs have
    been touched on the same SparkContext. Eviction frees the pinned
    blocks through the JVM persistent-RDD registry, so a later action
    on a frame held across that boundary fails with
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. Callers interleaving ≥3 sf_dirs
    must either re-invoke the query at use time (re-memoizes and
    re-pins) or raise MEMO_MAX_SF_DIRS before the sweep. The round
    driver and bench run one sf_dir per session and never hit this."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        app = spark.sparkContext.applicationId
        touch_sf_dir(app, sf_dir)
        key = (app, sf_dir, fn.__name__)
        df = _RESULT_MEMO.get(key)
        if df is None:
            df = pin_memo_df(spark, fn(spark, sf_dir))
            _RESULT_MEMO[key] = df
        return df

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    wrapped.__wrapped__ = fn  # plan tests inspect the unmaterialized plan
    return wrapped


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# import for registration side effects
from gocrawler_spark.queries import crawler_q  # noqa: E402,F401
from gocrawler_spark.queries import dedup_q  # noqa: E402,F401
from gocrawler_spark.queries import filter_q  # noqa: E402,F401
from gocrawler_spark.queries import freshness_q  # noqa: E402,F401
from gocrawler_spark.queries import funnel_q  # noqa: E402,F401
from gocrawler_spark.queries import graph_q  # noqa: E402,F401
from gocrawler_spark.queries import html_q  # noqa: E402,F401
from gocrawler_spark.queries import image_pipeline_q  # noqa: E402,F401
from gocrawler_spark.queries import image_q  # noqa: E402,F401
from gocrawler_spark.queries import anchor_q  # noqa: E402,F401
from gocrawler_spark.queries import entity_q  # noqa: E402,F401
from gocrawler_spark.queries import budget_q  # noqa: E402,F401
from gocrawler_spark.queries import media_q  # noqa: E402,F401
from gocrawler_spark.queries import mm_q  # noqa: E402,F401
from gocrawler_spark.queries import ngram_q  # noqa: E402,F401
from gocrawler_spark.queries import pipeline_q  # noqa: E402,F401
from gocrawler_spark.queries import provenance_q  # noqa: E402,F401
from gocrawler_spark.queries import rel_q  # noqa: E402,F401
from gocrawler_spark.queries import robots_q  # noqa: E402,F401
from gocrawler_spark.queries import search_q  # noqa: E402,F401
from gocrawler_spark.queries import semdedup_q  # noqa: E402,F401
from gocrawler_spark.queries import sitemap_q  # noqa: E402,F401
from gocrawler_spark.queries import sketch_q  # noqa: E402,F401
from gocrawler_spark.queries import stem_q  # noqa: E402,F401
from gocrawler_spark.queries import stream_q  # noqa: E402,F401
from gocrawler_spark.queries import trap_q  # noqa: E402,F401
from gocrawler_spark.queries import warc_q  # noqa: E402,F401
from gocrawler_spark.queries import text_q  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Registry ordering: queries with NO green driver-gate row in any past
# round come FIRST, so a driver that samples a prefix of the registry
# verifies the never-checked set before re-verifying known-green ones.
# Every query stays registered either way; this is pure iteration
# order. Names below = union of CORRECTNESS_r01/r02/r03 green rows
# (r02 and r03 were disjoint 50-query samples; 15 registered queries
# have never had a driver-green row and therefore order first).
_DRIVER_CHECKED = {
    "anchor_text_stats", "ann_ivf_topk", "ann_ivfpq_topk",
    "ann_lsh_buckets", "ann_pq_adc_topk", "ann_recall_at_k",
    "background_subtract", "baseline_merge", "bigrams_top100",
    "bm25_topk", "caption_decontaminate", "cms_heavy_hitters",
    "corpus_freq_top100", "crawl_budget_allocation",
    "crawl_frontier_5waves", "crawl_polite_8waves",
    "crawl_scale_visited", "crawl_scale_wave8", "curation_verdict",
    "decontaminate_overlap", "dedup_clusters", "dedup_exact",
    "dedup_ngram_jaccard", "doc_signature", "doc_token_stats",
    "domain_mixture_weights", "dsir_importance_weights",
    "dsir_resample_topk", "embedding_cosine_near_dups",
    "embedding_dedup_clusters", "embedding_knn", "entity_freq_top32",
    "events_attribution_asof", "events_pagerank",
    "events_rollup_multi", "events_sessionize",
    "events_value_range_join", "frontier_priority_topk",
    "golden_run_noeng_top100", "gopher_quality_filter",
    "host_inlink_stats", "host_quality_stats", "html_extract_stats",
    "image_ar_buckets", "image_bucketed_enrich", "image_byte_dedup",
    "image_caption_alignment", "image_caption_dedup",
    "image_caption_provenance", "image_compaction_stats",
    "image_curation_filter", "image_dedup_clusters",
    "image_embedding_near_dups", "image_exposure_stats",
    "image_metadata_stats", "image_model_scores", "image_patch_tokens",
    "image_phash_near_dups", "image_privacy_strip",
    "image_quality_funnel", "image_resize_summary",
    "image_shard_packing", "image_sharpness_stats",
    "image_validate_summary", "inverted_index_stats",
    "keyword_ranking", "kmeans_semdedup", "lang_id_heuristic",
    "minhash_bands", "minhash_incremental_probe",
    "minhash_jaccard_estimate", "minhash_lsh_pairs",
    "multimodal_packing", "multimodal_quality_funnel",
    "ngrams_pruned_2to4", "ngrams_pruned_2to5", "oov_quality",
    "opic_priorities", "pii_scrub_stats", "quality_score",
    "recrawl_priority", "redirect_resolution", "repetition_stats",
    "robots_parse_verdicts", "sample_stratified", "signature_dedup",
    "simhash32", "simhash_near_dups", "sitemap_seed_stats",
    "span_dedup_coverage", "stem_spec_vocab", "stemmed_corpus_top100",
    "stopword_ratio_band", "streaming_corpus_top100",
    "streaming_dedup_drops", "streaming_image_ingest",
    "streaming_scored_ingest", "tfidf_topterms", "token_count_bpe",
    "trigrams_bounded", "unigram_lm_nll", "url_validate",
    "warc_cdx_lookup_stats", "warc_revisit_stats",
    "warc_roundtrip_stats", "wds_export_stats",
}


def _unverified_first(d: dict) -> dict:
    fresh = {k: v for k, v in d.items() if k not in _DRIVER_CHECKED}
    seen = {k: v for k, v in d.items() if k in _DRIVER_CHECKED}
    return {**fresh, **seen}


QUERIES = _unverified_first(QUERIES)
ORACLES = _unverified_first(ORACLES)
