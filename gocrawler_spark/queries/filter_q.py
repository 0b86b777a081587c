r"""Corpus-filtering queries (training-data pipeline extensions):
Gopher-style rule filtering, OOV/unigram-frequency quality, and
repetition statistics.

These are the standard pre-training curation gates (C4/Gopher rule
filters, CCNet frequency scoring, repetition removal) expressed as
single-scan column pipelines — the same shape as the reference's own
P1-P7 paragraph/doc gates (crawler.go:1121-1279), generalized to the
rule sets a 100 TB text pipeline actually runs.

Determinism: every ratio is emitted pre-rounded (``*_ppm`` / ``*_micro``
BIGINT) with the double arithmetic written in the identical order on
both engines, and every keep/flag decision compares the ROUNDED
integers, so the verdict is engine-exact (see queries/__init__ header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.functions import pii as PII
from gocrawler_spark.functions import text as TX
from gocrawler_spark.queries import load, memo_result, register
from gocrawler_spark.queries.crawler_q import TOKS_SQL

# whitespace words (both engines: ASCII \s, non-empty)
_WORDS_SQL = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')"
# trimmed non-empty lines
_LINES_SQL = (
    "list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),"
    " x -> x <> '')"
)

_STOP8 = ("the", "a", "and", "to", "of", "in", "is", "that")


def _words(col):
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def _lines(col):
    return F.filter(
        F.transform(F.split(col, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def _ppm(num, den):
    """round(1e6 * num / den) as BIGINT — written in this exact
    operation order on both engines (single IEEE multiply + divide)."""
    return F.round(F.lit(1000000.0) * num / den).cast("bigint")


# ---------------------------------------------------------------------------
@register(
    "gopher_quality_filter",
    f"""
WITH g AS (
  SELECT doc_id,
         {_WORDS_SQL} AS W,
         {_LINES_SQL} AS LN,
         {TOKS_SQL} AS T,
         length(regexp_replace(text, '\\s+', '', 'g')) AS sum_len,
         len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_sym
  FROM documents
),
m AS (
  SELECT doc_id,
         len(W) AS n_words,
         len(LN) AS n_lines,
         CAST(round(1000000.0 * sum_len / greatest(len(W), 1)) AS BIGINT)
           AS mean_word_len_micro,
         CAST(round(1000000.0 * len(list_filter(W, x -> regexp_matches(lower(x), '[a-z]')))
              / greatest(len(W), 1)) AS BIGINT) AS alpha_ppm,
         CAST(round(1000000.0 * n_sym / greatest(len(W), 1)) AS BIGINT)
           AS symbol_ppm,
         CAST(round(1000000.0 * len(list_filter(LN, x -> regexp_matches(x, '^[-*•]')))
              / greatest(len(LN), 1)) AS BIGINT) AS bullet_ppm,
         CAST(round(1000000.0 * len(list_filter(LN, x -> regexp_matches(x, '\\.\\.\\.$')))
              / greatest(len(LN), 1)) AS BIGINT) AS ellipsis_ppm,
         {' + '.join(f"CAST(list_contains(T, '{w}') AS INT)" for w in _STOP8)}
           AS stop_hits
  FROM g
)
SELECT doc_id, n_words, n_lines, mean_word_len_micro, alpha_ppm, symbol_ppm,
       bullet_ppm, ellipsis_ppm, CAST(stop_hits AS BIGINT) AS stop_hits,
       CAST(n_words BETWEEN 50 AND 100000
            AND mean_word_len_micro BETWEEN 3000000 AND 10000000
            AND alpha_ppm >= 800000
            AND symbol_ppm <= 100000
            AND bullet_ppm <= 900000
            AND ellipsis_ppm <= 300000
            AND stop_hits >= 2 AS BIGINT) AS keep
FROM m
""",
)
@memo_result
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule filter: word-count band, mean word length,
    alphabetic-word fraction, symbol (#/ellipsis) ratio, bullet- and
    ellipsis-line fractions, and a small-stopword presence count, with
    the final keep verdict ANDed over the ROUNDED integer metrics (so
    the gate is engine-exact).

    Scale: scan-only — every metric is a row-local array/regex
    expression inside one whole-stage-codegen projection; no shuffle,
    no Python. The per-rule columns (not just the verdict) are emitted
    because at 100 TB you tune thresholds from the rule histograms."""
    docs = load(spark, sf_dir, "documents")
    W = _words(F.col("text"))
    LN = _lines(F.col("text"))
    T = TX.tokens_of(F.lower(F.col("text")))
    n_words = F.size(W)
    n_lines = F.size(LN)
    dw = F.greatest(n_words, F.lit(1))
    dl = F.greatest(n_lines, F.lit(1))
    sum_len = F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
    n_sym = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"#|\.\.\."), F.lit(0))
    )
    n_alpha = F.size(F.filter(W, lambda x: F.lower(x).rlike("[a-z]")))
    n_bullet = F.size(F.filter(LN, lambda x: x.rlike("^[-*•]")))
    n_ellip = F.size(F.filter(LN, lambda x: x.rlike(r"\.\.\.$")))
    stop_hits = None
    for w in _STOP8:
        t = F.array_contains(T, w).cast("int")
        stop_hits = t if stop_hits is None else stop_hits + t

    m = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        _ppm(sum_len, dw).alias("mean_word_len_micro"),
        _ppm(n_alpha, dw).alias("alpha_ppm"),
        _ppm(n_sym, dw).alias("symbol_ppm"),
        _ppm(n_bullet, dl).alias("bullet_ppm"),
        _ppm(n_ellip, dl).alias("ellipsis_ppm"),
        stop_hits.cast("bigint").alias("stop_hits"),
    )
    keep = (
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len_micro").between(3000000, 10000000)
        & (F.col("alpha_ppm") >= 800000)
        & (F.col("symbol_ppm") <= 100000)
        & (F.col("bullet_ppm") <= 900000)
        & (F.col("ellipsis_ppm") <= 300000)
        & (F.col("stop_hits") >= 2)
    )
    return m.withColumn("keep", keep.cast("bigint"))


# ---------------------------------------------------------------------------
_VOCAB_MIN = 5


@register(
    "oov_quality",
    f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS_SQL}) AS token FROM documents
),
vocab AS (
  SELECT token, count(*) AS cnt FROM toks
  GROUP BY token HAVING count(*) >= {_VOCAB_MIN}
),
j AS (
  SELECT t.doc_id, v.cnt FROM toks t LEFT JOIN vocab v USING (token)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tok,
       CAST(count(*) - count(cnt) AS BIGINT) AS n_oov,
       CAST(round(1000000.0 * (count(*) - count(cnt)) / count(*)) AS BIGINT)
         AS oov_ppm,
       CAST(COALESCE(sum(cnt), 0) // greatest(count(cnt), 1) AS BIGINT)
         AS mean_vocab_cnt
FROM j GROUP BY doc_id
""",
)
def oov_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram-frequency quality: per doc, the fraction of
    tokens outside the corpus vocabulary (tokens seen >= {_VOCAB_MIN}
    times corpus-wide) and the mean corpus count of its in-vocab
    tokens (floor division — exact integer arithmetic, no float sums).

    Scale: vocab is one partial-agg groupBy over the exploded tokens;
    the per-doc pass re-joins tokens to the vocab (broadcast when it
    fits — vocabularies are ~10^6 rows even at 100 TB, far under the
    corpus size) and partial-aggregates per doc. Two shuffles total,
    both map-side combined."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TX.tokens_of(F.lower(F.col("text")))).alias("token")
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= _VOCAB_MIN)
    )
    # NOT broadcast-hinted: the >=min-count vocabulary grows with the
    # corpus (1e9+ types at web scale — the same reason tfidf_topterms
    # keeps its df join a shuffle join); at test SF the planner
    # auto-broadcasts it anyway, at scale it must be free to shuffle.
    j = toks.join(vocab, "token", "left")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        (F.count(F.lit(1)) - F.count("cnt")).alias("n_oov"),
        F.round(
            F.lit(1000000.0)
            * (F.count(F.lit(1)) - F.count("cnt"))
            / F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("oov_ppm"),
        F.expr(
            "CAST(coalesce(sum(cnt), 0) DIV greatest(count(cnt), 1) AS BIGINT)"
        ).alias("mean_vocab_cnt"),
    )


# ---------------------------------------------------------------------------
@register(
    "repetition_stats",
    f"""
WITH base AS (
  SELECT doc_id, {TOKS_SQL} AS T, {_LINES_SQL} AS LN FROM documents
),
lines_m AS (
  SELECT doc_id, len(T) AS n_tok, len(LN) AS n_lines,
         len(LN) - len(list_distinct(LN)) AS n_dup_lines
  FROM base
),
bi AS (
  SELECT doc_id, T[i] || ' ' || T[i+1] AS bigram
  FROM (SELECT doc_id, T, unnest(range(1, len(T))) AS i
        FROM base WHERE len(T) >= 2)
),
bc AS (
  SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY doc_id, bigram
),
mx AS (SELECT doc_id, max(c) AS max_c FROM bc GROUP BY doc_id)
SELECT l.doc_id, CAST(l.n_tok AS BIGINT) AS n_tok,
       CAST(l.n_lines AS BIGINT) AS n_lines,
       CAST(round(1000000.0 * l.n_dup_lines / greatest(l.n_lines, 1)) AS BIGINT)
         AS dup_line_ppm,
       CASE WHEN l.n_tok >= 2
            THEN CAST(round(1000000.0 * 2 * COALESCE(m.max_c, 0) / l.n_tok) AS BIGINT)
            ELSE 0 END AS top_bigram_ppm
FROM lines_m l LEFT JOIN mx m USING (doc_id)
""",
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition-removal signals: duplicate-line fraction and
    the character share of the single most frequent token bigram
    (2*max_count/n_tok), both pre-rounded to ppm.

    Scale: line dedup is row-local (array_distinct inside the
    projection — no shuffle); the bigram max is explode -> two-level
    partial agg on (doc_id, bigram) then (doc_id), shuffled on doc_id
    once since (doc_id, bigram) partial agg happens map-side. A doc is
    its own aggregation group, so skew equals the largest single doc,
    not a corpus-wide hot key."""
    docs = load(spark, sf_dir, "documents")
    T = TX.tokens_of(F.lower(F.col("text")))
    LN = _lines(F.col("text"))
    base = docs.select("doc_id", T.alias("T"), LN.alias("LN"))
    lines_m = base.select(
        "doc_id",
        F.size("T").alias("n_tok"),
        F.size("LN").alias("n_lines"),
        (F.size("LN") - F.size(F.array_distinct("LN"))).alias("n_dup_lines"),
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("T") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("T"), i), F.element_at(F.col("T"), i + 1)
        ),
    )
    bi = (
        base.filter(F.size("T") >= 2)
        .select("doc_id", F.explode(grams).alias("bigram"))
    )
    mx = (
        bi.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_c"))
    )
    out = lines_m.join(mx, "doc_id", "left")
    return out.select(
        "doc_id",
        F.col("n_tok").cast("bigint").alias("n_tok"),
        F.col("n_lines").cast("bigint").alias("n_lines"),
        _ppm(F.col("n_dup_lines"), F.greatest(F.col("n_lines"), F.lit(1))).alias(
            "dup_line_ppm"
        ),
        F.when(
            F.col("n_tok") >= 2,
            F.round(
                F.lit(1000000.0)
                * 2
                * F.coalesce(F.col("max_c"), F.lit(0))
                / F.col("n_tok")
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("top_bigram_ppm"),
    )


# ---------------------------------------------------------------------------
# PII scrub stage. The synthetic documents text contains no PII (pure
# word streams), so the oracle-gated query runs over a deterministic
# inline fixture — the same pinned-fixture pattern the phash/media
# queries use — while the column functions (functions/pii.py) apply to
# any text column. The fixture mixes emails, NANP phones, IPv4s,
# overlap cases (digits inside an email), and clean rows.
_PII_FIXTURE = [
    (0, "contact me at alice.smith@example.com for details"),
    (1, "call (555) 123-4567 or +1 555.987.6543 before noon"),
    (2, "server at 192.168.10.25 and backup at 10.0.0.1 are up"),
    (3, "bob_99@mail.example.org logged in from 172.16.254.3"),
    (4, "plain text row with no identifiers at all"),
    (5, "digits 5551234567 without separators are not a phone"),
    (6, "mixed: carol+test@sub.domain.io then 555-000-1111 then 8.8.8.8"),
    (7, "edge 256.1.1.1 is not an ipv4 but 255.255.255.255 is"),
    (8, "dave@example.com dave@example.com twice on one line"),
    (9, "phone-like 123-45-6789 ssn pattern must NOT match"),
]

_PII_VALUES = ", ".join(
    "({}, '{}')".format(i, t) for i, t in _PII_FIXTURE
)


def _redact_sql(expr: str) -> str:
    """Nested DuckDB regexp_replace chain generated from the SAME
    REDACTIONS tuple the Spark side applies — one source of truth for
    both the patterns and the contract order."""
    for rx, token in PII.REDACTIONS:
        expr = f"regexp_replace({expr}, '{rx}', '{token}', 'g')"
    return expr


_PII_COUNT_COLS = "\n".join(
    f"       CAST(len(regexp_extract_all(text, '{rx}')) AS BIGINT)"
    f" AS {name},"
    for (rx, _), name in zip(PII.REDACTIONS, ("n_emails", "n_phones", "n_ipv4"))
)


@register(
    "pii_scrub_stats",
    f"""
WITH fixture(doc_id, text) AS (VALUES {_PII_VALUES})
SELECT CAST(doc_id AS BIGINT) AS doc_id,
{_PII_COUNT_COLS}
       {_redact_sql("text")} AS redacted,
       CAST(length({_redact_sql("text")}) AS BIGINT) AS redacted_len
FROM fixture
""",
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-tier PII scrub (emails / NANP phones / IPv4): per row,
    match counts per category and the redacted text under the fixed
    redaction order (emails, phones, IPs — the order is part of the
    contract so overlapping matches resolve identically on both
    engines; see functions/pii.py).

    Scale: pure codegen'd regex projection — scan-only, no shuffle, no
    Python; the same shape as gopher_quality_filter. The redacted
    STRING is compared across engines, which pins Java-regex and RE2
    to byte-identical replace semantics for these patterns."""
    rows = spark.createDataFrame(_PII_FIXTURE, "doc_id long, text string")
    red = PII.redact(F.col("text"))
    return rows.select(
        "doc_id",
        PII.count_matches(F.col("text"), PII.EMAIL_RX)
        .cast("long")
        .alias("n_emails"),
        PII.count_matches(F.col("text"), PII.PHONE_RX)
        .cast("long")
        .alias("n_phones"),
        PII.count_matches(F.col("text"), PII.IPV4_RX)
        .cast("long")
        .alias("n_ipv4"),
        red.alias("redacted"),
        F.length(red).cast("long").alias("redacted_len"),
    )


# ---------------------------------------------------------------------------
# Unigram-LM perplexity gate (CCNet-style). LM vocabulary is the
# corpus top-K tokens — K bounds the broadcast at ANY corpus size, the
# property that makes this runnable at 100 TB (a full-vocab LM join
# would be an unbounded broadcast; OOV mass absorbs the tail instead).
_LM_K = 1024


@register(
    "unigram_lm_nll",
    f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS_SQL}) AS token FROM documents
),
cnt AS (
  SELECT token, count(*) AS cnt FROM toks GROUP BY token
),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM cnt
),
lm AS (
  SELECT token, cnt FROM cnt ORDER BY cnt DESC, token DESC LIMIT {_LM_K}
),
j AS (
  SELECT t.doc_id,
         CAST(round(ln(CAST(coalesce(lm.cnt, 0) + 1 AS DOUBLE)
                       / (tot.n_total + {_LM_K + 1})) * 1e6) AS BIGINT)
           AS logp_micro
  FROM toks t LEFT JOIN lm USING (token) CROSS JOIN tot
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tok,
       CAST(-sum(logp_micro) AS BIGINT) AS nll_micro,
       CAST((-sum(logp_micro)) // count(*) AS BIGINT) AS avg_nll_micro
FROM j GROUP BY doc_id
""",
)
def unigram_lm_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model negative-log-likelihood per document —
    the CCNet/Wikipedia-LM perplexity filter reduced to its
    deterministic core (CCNet uses a KenLM 5-gram; the gate shape —
    score every doc under a reference LM, threshold on per-token NLL —
    is identical). Laplace-smoothed over the corpus top-{_LM_K} vocab
    with a single OOV bucket: p(w) = (c_w + 1) / (N + {_LM_K} + 1),
    c_w = 0 for OOV.

    Determinism: per-token log-probs are rounded to integer micro-nats
    BEFORE summing (order-independent BIGINT sum; float-sum
    association order differs across engines); ln() agrees across
    JVM/libm to <1 ulp, 9 orders of magnitude below the rounding
    quantum.

    Scale: one token-count shuffle (map-side combined), top-K via
    TakeOrderedAndProject, then a BROADCAST join of the K-row LM +
    1-row total against the token stream and a per-doc partial agg.
    No corpus-sized join side anywhere."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TX.tokens_of(F.lower(F.col("text")))).alias("token")
    )
    cnt = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    tot = cnt.agg(F.sum("cnt").cast("long").alias("n_total"))
    lm = cnt.orderBy(F.col("cnt").desc(), F.col("token").desc()).limit(_LM_K)
    logp = (
        F.round(
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double")
                / (F.col("n_total") + F.lit(_LM_K + 1))
            )
            * 1e6
        )
        .cast("bigint")
        .alias("logp_micro")
    )
    j = (
        toks.join(F.broadcast(lm), "token", "left")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", logp)
    )
    return (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            (-F.sum("logp_micro")).cast("long").alias("nll_micro"),
        )
        .withColumn("avg_nll_micro", F.expr("nll_micro DIV n_tok"))
    )


# ---------------------------------------------------------------------------
@register(
    "host_quality_stats",
    """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups,
       CAST(sum(n_chars) // count(*) AS BIGINT) AS avg_chars
FROM documents GROUP BY source
""",
)
def host_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level curation stats (RefinedWeb-style): per source (the
    host analog in the synthetic schema) — doc count, English share,
    char volume, exact-duplicate count (docs minus distinct md5(text)),
    floor-mean length. The per-HOST aggregate is what drives
    source-level keep/drop decisions (spam hosts, mirror hosts) that
    per-doc gates can't see.

    Scale: one groupBy on the host key with map-side combine; the
    distinct-dup count piggybacks the same shuffle (partial distinct
    per partition). Hot hosts are the north_rule's known skew — AQE
    skew-split applies; the aggregate itself is algebraic."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("n_en"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            (F.count(F.lit(1)) - F.countDistinct(F.md5("text")))
            .cast("long")
            .alias("n_exact_dups"),
        )
        .withColumn("avg_chars", F.expr("sum_chars DIV n_docs"))
    )
