"""Corpus analytics: streaming term-frequency aggregation (A2),
baseline-corpus merge (S9/A5), background subtraction (A6), total-order
sort + top-k (W1/W2).

Reference: corpusFreqs crawler.go:1061,1282; corpusfreqlib merge
corpusfreqlib/corpusfreqlib.go:98-115; subtraction crawler.go:1303-1341;
rSortFreq crawler.go:705-718.

Scale notes: token frequency is a classic partial-agg groupBy (map-side
combine → one shuffle on token). The baseline corpus is a small
dimension (~10^5 rows) → broadcast join; the "the"-anchor scale factor
is a 1-row scalar, computed once on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gocrawler_spark.config import CrawlConfig
from gocrawler_spark.functions import text as TX


def token_freq(docs: DataFrame, cfg: CrawlConfig, text_col: str = "curated") -> DataFrame:
    """A1/A2: explode analyzed tokens → groupBy(token).count.
    Partial aggregation (map-side combine) keeps the shuffle tiny."""
    toks = TX.analyzed_tokens(F.col(text_col), cfg)
    return (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def merge_freq(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental A2: corpus_freq MERGE (sum counts). Union + re-agg
    lets Catalyst do partial aggregation; both sides are partitioned on
    token at scale so the shuffle only moves the (small) delta."""
    return (
        state.unionByName(delta)
        .groupBy("token")
        .agg(F.sum("count").alias("count"))
    )


def rsort(freq: DataFrame) -> DataFrame:
    """W1 total order: count desc, ties token desc (crawler.go:705-718).
    With .limit(k) Catalyst plans TakeOrderedAndProject (no full sort)."""
    return freq.orderBy(F.desc("count"), F.desc("token"))


def top_k(freq: DataFrame, k: int = 100) -> DataFrame:
    """W2 (crawler.go:1289-1293)."""
    return rsort(freq).limit(k)


def kv_remove_at(freq: DataFrame, s: int) -> DataFrame:
    """W6 kvSliceRemoveItem (crawler.go:940-945, an unused helper even
    in the reference): delete the element at 0-based rank ``s`` of the
    W1 total order (count desc, token desc), keeping the rest.

    The reference's call shape is the ≤101-row limited n-gram slice
    (the bound at crawler.go:930), so the relation is driver-small by
    construction and a single-partition row_number window is the
    honest plan; for unbounded inputs positional deletes are the wrong
    abstraction — re-filter the source instead."""
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("count"), F.desc("token"))
    return (
        freq.withColumn("_rn", F.row_number().over(w) - 1)
        .filter(F.col("_rn") != s)
        .drop("_rn")
    )


def load_corpus_file(spark, path: str) -> DataFrame:
    """S9 loader (corpusfreqlib/corpusfreqlib.go:50-96): parse the BNC
    ``all.num`` line format ``"%d %s %s %d"`` into
    (token, num_total, pos, num_docs, line_no).

    `line_no` preserves file order so merge_baselines can reproduce the
    reference's exact dedup rule: for each word, the FIRST line with a
    nonzero count wins; a zero-count entry only holds the slot until a
    later line overwrites it (``if corpusFreqs[word].numTotal == 0``,
    corpusfreqlib.go:88-91).

    Scale: one narrow scan; monotonically_increasing_id over an ordered
    single-file read gives ids whose sort order equals file order
    (partition index occupies the high bits).
    """
    lines = (
        spark.read.text(path)
        .select(F.monotonically_increasing_id().alias("line_no"), "value")
        .filter(F.trim("value") != "")
        .select("line_no", F.split(F.trim("value"), r"\s+").alias("f"))
    )
    return lines.select(
        F.element_at("f", 2).alias("token"),
        F.element_at("f", 1).cast("long").alias("num_total"),
        F.element_at("f", 3).alias("pos"),
        F.element_at("f", 4).cast("long").alias("num_docs"),
        "line_no",
    )


def dedup_first_wins(df: DataFrame) -> DataFrame:
    """The reference's per-file dedup (corpusfreqlib.go:88-91): first
    nonzero-count line per word wins; if all its lines are zero-count,
    the last one stands. One partial-agg shuffle on token."""
    agg = df.groupBy("token").agg(
        F.min(
            F.when(
                F.col("num_total") != 0, F.struct("line_no", "num_total")
            )
        ).alias("nz"),
        F.max(F.struct("line_no", "num_total")).alias("z"),
    )
    return agg.select(
        "token",
        F.coalesce(F.col("nz.num_total"), F.col("z.num_total")).alias(
            "num_total"
        ),
    )


def merge_baselines(classical: DataFrame, contemporary: DataFrame) -> DataFrame:
    """S9/A5 (corpusfreqlib/corpusfreqlib.go:88-115): first-wins dedup
    per corpus file, then contemporary counts are scaled into the
    classical corpus by the ratio of their "the" counts and added on a
    full-outer join.

    Inputs: (token, num_total[, pos, num_docs][, line_no]) — if a
    `line_no` column exists it drives first-wins dedup (file order),
    else min(num_total) per token is kept deterministic.
    """
    def dedup(df: DataFrame) -> DataFrame:
        if "line_no" in df.columns:
            return dedup_first_wins(df)
        return df.groupBy("token").agg(F.min("num_total").alias("num_total"))

    c = dedup(classical)
    m = dedup(contemporary)
    the_c = c.filter(F.col("token") == "the").select("num_total").first()
    the_m = m.filter(F.col("token") == "the").select("num_total").first()
    if the_c is None or the_m is None or not the_m[0]:
        raise ValueError('baseline corpora must both contain "the"')
    cont_factor = the_c[0] / the_m[0]  # corpusfreqlib.go:103-108
    joined = c.alias("c").join(m.alias("m"), "token", "full_outer")
    return joined.select(
        "token",
        (
            F.coalesce(F.col("c.num_total"), F.lit(0)).cast("double")
            + F.lit(cont_factor) * F.coalesce(F.col("m.num_total"), F.lit(0))
        ).cast("long").alias("num_total"),
    )


def background_subtract(
    corpus_freq: DataFrame, baseline: DataFrame, contrast: float = 20.0
) -> DataFrame:
    """A6 (crawler.go:1303-1341): "w/o English" frequencies.

    scale = (1 + baseline("the")) / observed("the"); the reference
    PANICS if the corpus's top token is not "the" — reproduced as a
    ValueError. adj = observed - int(contrast * (1 + baseline(token)) / scale).

    baseline is broadcast (small dim); the "the" lookup is a driver
    scalar. Go's int() truncates toward zero — matched with a cast
    after double arithmetic in the same order.
    """
    top = rsort(corpus_freq).first()
    if top is None or top["token"] != "the":
        raise ValueError('stopword "the" not found at corpus top')
    the_obs = top["count"]
    the_base_row = baseline.filter(F.col("token") == "the").first()
    the_base = the_base_row["num_total"] if the_base_row else 0
    scale = float(1 + the_base) / float(the_obs)

    j = corpus_freq.join(F.broadcast(baseline), "token", "left")
    adj = F.col("count") - (
        F.lit(contrast)
        * (F.lit(1.0) + F.coalesce(F.col("num_total"), F.lit(0)).cast("double"))
        / F.lit(scale)
    ).cast("long")  # Go int(...) truncates toward zero; cast matches for +ve
    return j.select("token", adj.alias("count"))
