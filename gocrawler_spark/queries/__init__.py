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


def _free_pin_ids(spark, ids) -> None:
    try:
        from gocrawler_spark.pins import _unpersist_ids

        _unpersist_ids(spark, ids)
    except Exception:
        pass  # context already stopped


def release_memo_df(df: DataFrame) -> None:
    ent = _PIN_IDS.pop(id(df), None)
    if ent is None:
        return
    _, ids, spark = ent
    # DEFER the JVM-registry free until the frame itself is
    # unreachable: eviction can run while a caller still holds the
    # returned frame (a sweep interleaving >= 3 sf_dirs), and freeing
    # under it failed the caller's next action with
    # CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. weakref.finalize fires at
    # refcount-zero, so in the common unheld case (the memo dict held
    # the only reference) the blocks are freed synchronously on the
    # spot, exactly as the eager free did — test_memo_eviction's
    # count-based assertions still hold.
    import weakref

    weakref.finalize(df, _free_pin_ids, spark, ids)


def memo_result(fn):
    """Memoize a query's pinned result per (app_id, sf_dir).

    LIFETIME CONTRACT (localCheckpoint is non-reliable): once
    `MEMO_MAX_SF_DIRS` NEWER sf_dirs have been touched on the same
    SparkContext, the memo entry is evicted — but the pinned blocks
    are freed only when the RETURNED frame itself becomes unreachable
    (weakref deferral in release_memo_df), so a caller interleaving
    ≥3 sf_dirs may keep using a held frame safely; it just stops being
    served from the memo. The one remaining hazard: holding ONLY a
    frame lazily DERIVED from the returned one (the derived plan does
    not reference the returned Python object) while dropping the
    returned frame — keep the returned frame alive alongside any
    derived lineage, or re-invoke the query at use time. The round
    driver and bench run one sf_dir per session and never hit any of
    this."""

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
# Registry ordering: OLDEST driver evidence first. Every registered
# query has had at least one green driver-gate row (rows+schema+hash)
# by round 4, so the earlier never-checked-first ordering degenerated:
# a driver that samples a 50-row prefix would re-verify the same fresh
# set forever while the other 72 queries' evidence aged. Ordering
# ascending by the round of each query's NEWEST green row rotates the
# sample — every query gets a fresh driver row at least every
# ~ceil(122/50) rounds. Queries absent from the map (future additions)
# default to round 0 and therefore order first, preserving the
# never-checked-first property. Every query stays registered either
# way; this is pure iteration order. Values below = max round with a
# green row in CORRECTNESS_r01..r04 (r01: 6, r02: 19, r03: 47,
# r04: 50 — disjoint 50-query samples after r01).
_LAST_GREEN_ROUND = {
    # r01
    "events_sessionize": 1, "lang_id_heuristic": 1,
    "ngrams_pruned_2to4": 1, "quality_score": 1, "token_count_bpe": 1,
    "trigrams_bounded": 1,
    # r02
    "curation_verdict": 2, "decontaminate_overlap": 2,
    "dedup_clusters": 2, "embedding_dedup_clusters": 2,
    "host_inlink_stats": 2, "host_quality_stats": 2,
    "html_extract_stats": 2, "image_metadata_stats": 2,
    "image_phash_near_dups": 2, "image_resize_summary": 2,
    "image_sharpness_stats": 2, "image_validate_summary": 2,
    "opic_priorities": 2, "pii_scrub_stats": 2, "recrawl_priority": 2,
    "redirect_resolution": 2, "sample_stratified": 2,
    "span_dedup_coverage": 2, "unigram_lm_nll": 2,
    # r03
    "anchor_text_stats": 3, "bm25_topk": 3, "caption_decontaminate": 3,
    "cms_heavy_hitters": 3, "crawl_budget_allocation": 3,
    "domain_mixture_weights": 3, "dsir_importance_weights": 3,
    "dsir_resample_topk": 3, "entity_freq_top32": 3,
    "events_attribution_asof": 3, "events_pagerank": 3,
    "events_rollup_multi": 3, "events_value_range_join": 3,
    "image_ar_buckets": 3, "image_bucketed_enrich": 3,
    "image_byte_dedup": 3, "image_caption_alignment": 3,
    "image_caption_dedup": 3, "image_caption_provenance": 3,
    "image_compaction_stats": 3, "image_curation_filter": 3,
    "image_dedup_clusters": 3, "image_embedding_near_dups": 3,
    "image_exposure_stats": 3, "image_model_scores": 3,
    "image_patch_tokens": 3, "image_privacy_strip": 3,
    "image_quality_funnel": 3, "image_shard_packing": 3,
    "inverted_index_stats": 3, "kmeans_semdedup": 3,
    "multimodal_packing": 3, "multimodal_quality_funnel": 3,
    "ngrams_pruned_2to5": 3, "robots_parse_verdicts": 3,
    "sitemap_seed_stats": 3, "stem_spec_vocab": 3,
    "stemmed_corpus_top100": 3, "streaming_corpus_top100": 3,
    "streaming_dedup_drops": 3, "streaming_image_ingest": 3,
    "streaming_scored_ingest": 3, "tfidf_topterms": 3,
    "warc_cdx_lookup_stats": 3, "warc_revisit_stats": 3,
    "warc_roundtrip_stats": 3, "wds_export_stats": 3,
    # r04
    "ann_ivf_topk": 4, "ann_ivfpq_topk": 4, "ann_lsh_buckets": 4,
    "ann_pq_adc_topk": 4, "ann_recall_at_k": 4,
    "audio_features_summary": 4, "audio_metadata_stats": 4,
    "background_subtract": 4, "baseline_merge": 4, "bigrams_top100": 4,
    "bpe_token_stats": 4, "corpus_freq_top100": 4,
    "crawl_frontier_5waves": 4, "crawl_polite_8waves": 4,
    "crawl_recrawl_wave": 4, "crawl_scale_visited": 4,
    "crawl_scale_wave8": 4, "dedup_exact": 4, "dedup_ngram_jaccard": 4,
    "doc_fingerprint": 4, "doc_length_quantiles": 4, "doc_signature": 4,
    "doc_token_stats": 4, "embedding_cosine_near_dups": 4,
    "embedding_knn": 4, "events_hourly": 4, "events_top_purchasers": 4,
    "frontier_priority_topk": 4, "golden_run_noeng_top100": 4,
    "gopher_quality_filter": 4, "hll_distinct_shingles": 4,
    "keyword_ranking": 4, "minhash_bands": 4,
    "minhash_incremental_probe": 4, "minhash_jaccard_estimate": 4,
    "minhash_lsh_pairs": 4, "oov_quality": 4, "repetition_stats": 4,
    "sequence_packing": 4, "signature_dedup": 4, "simhash32": 4,
    "simhash_near_dups": 4, "stopword_ratio_band": 4,
    "tpch_q1_pricing": 4, "tpch_q3_toporders": 4,
    "tpch_q5_region_revenue": 4, "url_trap_scores": 4,
    "url_validate": 4, "video_frame_sample_motion": 4,
    "video_metadata_stats": 4,
}



def _oldest_evidence_first(d: dict) -> dict:
    # stable sort: ties (same round) keep registration order
    return dict(
        sorted(d.items(), key=lambda kv: _LAST_GREEN_ROUND.get(kv[0], 0))
    )


QUERIES = _oldest_evidence_first(QUERIES)
ORACLES = _oldest_evidence_first(ORACLES)
