"""N-gram miner queries (W3/A7/W4) with DuckDB oracles.

The oracle SQL is generated from the same CrawlConfig regex material
as the Spark plan, so both sides share the stopword/border alternations
verbatim (both engines are RE2-compatible on these constructs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.config import covid_profile
from gocrawler_spark.operators import ngrams as NG
from gocrawler_spark.queries import load, register

_CFG = covid_profile()

N_MAX = 4

# The prepared gram relation (deduplicated sentences -> token array +
# border/ignore predicate arrays) is the shared, expensive prefix of
# every miner query: analyzer tokenization, the signature-dedup window,
# and the 200+-literal border predicates. Memoize it per
# (SparkContext, sf_dir) as a localCheckpoint — the in-session analog
# of materializing a `sentences` table once and running all mining
# jobs against it (what a 100 TB deployment would do). Joined to the
# shared bounded-sf_dir eviction policy (queries/__init__.py), so a
# session sweeping many sf_dirs frees the older pins.
from gocrawler_spark.queries import (
    pin_memo_df,
    register_memo,
    touch_sf_dir,
)

_PREP_MEMO: dict = register_memo({})


def _prepared(spark: SparkSession, sf_dir: str):
    app = spark.sparkContext.applicationId
    touch_sf_dir(app, sf_dir)
    key = (app, sf_dir)
    df = _PREP_MEMO.get(key)
    if df is None:
        docs = load(spark, sf_dir, "documents")
        sents = NG.dedup_sentences(NG.sentences_of(docs), _CFG)
        # AQE coalesces the small post-dedup window output to one
        # partition; spread it back across the cores BEFORE the
        # expensive border-predicate projection and the per-level
        # mining scans, or both run single-task.
        sents = sents.repartition(spark.sparkContext.defaultParallelism)
        df = pin_memo_df(spark, NG.prepare_grams(sents, _CFG))
        _PREP_MEMO[key] = df
    return df

_STOPFULL = _CFG.stop_token_fullmatch
_LEFT = r"(?i)^(" + _CFG.border_left_lowrel + r")$"
_RIGHT = r"(?i)^(" + _CFG.border_right_stop + r")$"
_IGN = NG.IGNORE_TOKEN_RE
_SCRUB = NG.SCRUB_RE


def _level_ctes(n: int) -> str:
    return f"""
l{n}_raw AS (
  SELECT list_slice(T, i, i+{n}-1) AS gt
  FROM (SELECT T, unnest(range(1, len(T) - {n} + 2)) AS i
        FROM gtoks WHERE len(T) >= {n})
),
l{n} AS (
  SELECT gram, cnt FROM (
    SELECT array_to_string(gt, ' ') AS gram, count(*) AS cnt
    FROM l{n}_raw
    WHERE NOT regexp_matches(gt[1], '{_LEFT}')
      AND NOT regexp_matches(gt[-1], '{_RIGHT}')
      AND len(list_filter(gt, t -> regexp_matches(t, '{_IGN}'))) = 0
    GROUP BY gram HAVING count(*) >= 3
  ) QUALIFY row_number() OVER (ORDER BY cnt DESC, gram DESC) <= 101
)"""


_NGRAM_BASE_SQL = (
    """
WITH sents AS (
  SELECT doc_id, i AS pos, L[i] AS sentence
  FROM (
    SELECT doc_id,
           string_split_regex(
             replace(replace(text, '.' || chr(10), chr(10)), '. ', chr(10)),
             '[\\r\\n]+') AS L
    FROM documents
  ), (SELECT 1) _dummy, LATERAL (SELECT unnest(range(1, len(L) + 1)) AS i)
),
analyzed AS (
  SELECT doc_id, pos,
         list_filter(
           list_transform(regexp_extract_all(sentence, '(\\w+)', 1),
                          t -> lower(t)),
           t -> NOT regexp_matches(t, '"""
    + _STOPFULL
    + """')) AS atoks
  FROM sents
),
tokcnt AS (
  SELECT doc_id, pos, tok, count(*) AS cnt
  FROM (SELECT doc_id, pos, unnest(atoks) AS tok FROM analyzed)
  GROUP BY doc_id, pos, tok
),
sigs AS (
  SELECT doc_id, pos,
         '[' || array_to_string(
           list_transform(
             list_slice(list(struct_pack(cnt := cnt, tok := tok)
                             ORDER BY cnt DESC, tok DESC), 1, 7),
             x -> x.tok), ' ') || ']' AS signature
  FROM tokcnt GROUP BY doc_id, pos
),
dedup AS (
  SELECT s.doc_id, s.pos, s.sentence,
         coalesce(g.signature, '[]') AS signature
  FROM sents s LEFT JOIN sigs g ON s.doc_id = g.doc_id AND s.pos = g.pos
  QUALIFY row_number() OVER (PARTITION BY signature
                             ORDER BY s.doc_id, s.pos) = 1
),
gtoks AS (
  SELECT regexp_extract_all(
           regexp_replace(sentence, '"""
    + _SCRUB.replace("'", "''")
    + """', ' ', 'g'),
           '(\\w+)', 1) AS T
  FROM dedup
),
"""
    + ",".join(_level_ctes(n) for n in range(2, 6))
)


def _pruned_sql(n_max: int) -> str:
    """Cross-level pruning (W4) for levels 2..n_max: a gram is dropped
    if a SUPERSTRING one level up has cnt > floor(cnt/2), or a
    SUBSTRING one level down has cnt > 2*cnt (crawler.go:758-800)."""
    kept = []
    for n in range(n_max, 1, -1):
        conds = []
        if n < n_max:
            conds.append(
                f"NOT EXISTS (SELECT 1 FROM l{n + 1} s"
                f" WHERE contains(s.gram, g.gram) AND s.cnt > g.cnt // 2)"
            )
        if n > 2:
            conds.append(
                f"NOT EXISTS (SELECT 1 FROM l{n - 1} s"
                f" WHERE contains(g.gram, s.gram) AND s.cnt > 2 * g.cnt)"
            )
        kept.append(
            f"l{n}_kept AS (SELECT gram, cnt FROM l{n} g"
            f" WHERE {' AND '.join(conds)})"
        )
    selects = " UNION ALL ".join(
        f"SELECT {n} AS n, gram, cnt FROM l{n}_kept"
        for n in range(n_max, 1, -1)
    )
    return (
        _NGRAM_BASE_SQL
        + ",\n"
        + ",\n".join(kept)
        + "\n"
        + selects
        + "\nORDER BY n DESC, cnt DESC, gram DESC\n"
    )


_PRUNED_SQL = _pruned_sql(N_MAX)

_TRIGRAM_SQL = _NGRAM_BASE_SQL + """
SELECT gram, cnt FROM l3 ORDER BY cnt DESC, gram DESC
"""


@register("ngrams_pruned_2to4", _PRUNED_SQL)
def ngrams_pruned_2to4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full W3/A7/W4 miner over documents: sentence dedup, bordered
    n-grams for n=2..4, per-level (freq>=3, top-101) caps, cross-level
    subset/superset pruning."""
    docs = load(spark, sf_dir, "documents")
    return NG.ngrams_all_levels(
        docs, _CFG, n_max=N_MAX, prepared=_prepared(spark, sf_dir)
    ).orderBy(F.desc("n"), F.desc("cnt"), F.desc("gram"))


@register("ngrams_pruned_2to5", _pruned_sql(5))
def ngrams_pruned_2to5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's offline miner runs at n=5
    (ngramsFreqsOfAll(text, 5), crawler.go:1512): same miner as
    ngrams_pruned_2to4 plus the 5-gram level and the 4↔5 pruning
    boundary."""
    docs = load(spark, sf_dir, "documents")
    return NG.ngrams_all_levels(
        docs, _CFG, n_max=5, prepared=_prepared(spark, sf_dir)
    ).orderBy(F.desc("n"), F.desc("cnt"), F.desc("gram"))


@register("trigrams_bounded", _TRIGRAM_SQL)
def trigrams_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3+A7 at n=3 (single level, no pruning): exercises sentence
    dedup + border filters + the 101-row reference cap in isolation."""
    return NG.level_from_prepared(_prepared(spark, sf_dir), 3).orderBy(
        F.desc("cnt"), F.desc("gram")
    )
