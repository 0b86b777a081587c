"""Relational/streaming-analog queries over the TPC-H-ish tables and
the events stream table — the generic DataFrame layer the engine
exposes (joins, aggregations, windows, top-k, sessionization).

Money/value sums are computed as sums of pre-rounded scaled BIGINTs
(order-independent) — see queries/__init__.py. Broadcast hints mirror
what the 100 TB plan needs: dims (region/nation/customer/supplier) are
broadcast; fact-fact joins shuffle on their keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gocrawler_spark.queries import load, register


def _cents(col) -> F.Column:
    return F.round(col * 100).cast("bigint")


# ---------------------------------------------------------------------------
@register(
    "tpch_q1_pricing",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
         AS BIGINT) AS sum_disc_c,
       count(*) AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan-side filter pushdown +
    partial aggregation; the canonical agg benchmark."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_c"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_c"),
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_c"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "tpch_q3_toporders",
    """
WITH rev AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS BIGINT) AS revenue_c
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderkey, c.c_mktsegment, rev.revenue_c
FROM rev
JOIN orders o ON o.o_orderkey = rev.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING'
ORDER BY rev.revenue_c DESC, o.o_orderkey ASC
LIMIT 10
""",
)
def tpch_q3_toporders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shaped top-k revenue join: fact-fact join on orderkey +
    broadcast dim (customer), TakeOrderedAndProject for the top-10."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    rev = li.groupBy("l_orderkey").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue_c"
        )
    )
    return (
        rev.join(o, rev["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "c_mktsegment", "revenue_c")
        .orderBy(F.desc("revenue_c"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
@register(
    "tpch_q5_region_revenue",
    """
SELECT r.r_name, n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
         AS BIGINT) AS revenue_c
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def tpch_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped star join: one shuffle join (lineitem⋈orders) then a
    broadcast chain through the dimension tables."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_c"
            )
        )
    )


# ---------------------------------------------------------------------------
@register(
    "events_hourly",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_sum_micro
FROM events
GROUP BY 1, 2
""",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the event stream (the batch
    twin of the Structured Streaming windowed agg in streaming/)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1e6).cast("bigint")).alias(
                "value_sum_micro"
            ),
        )
    )


# ---------------------------------------------------------------------------
@register(
    "events_sessionize",
    """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) -
                   lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                   > 1800000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id,
       count(DISTINCT session_id) AS n_sessions,
       max(cnt) AS max_session_events
FROM (SELECT user_id, session_id, count(*) AS cnt
      FROM sess GROUP BY user_id, session_id)
GROUP BY user_id
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + running sum —
    the batch twin of applyInPandasWithState sessionization. One
    shuffle on user_id; both windows share the partitioning."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
                > 1800000000
            )
            | F.lag(F.col("ts")).over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = gaps.withColumn("session_id", F.sum("new_session").over(w2))
    per_sess = sess.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("cnt"))
    return per_sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.max("cnt").alias("max_session_events"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_top_purchasers",
    """
SELECT user_id, count(*) AS n_purchases,
       CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS spend_micro
FROM events WHERE event_type = 'purchase'
GROUP BY user_id
ORDER BY n_purchases DESC, user_id ASC
LIMIT 10
""",
)
def events_top_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k users by purchase count (deterministic tiebreak)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.round(F.col("value") * 1e6).cast("bigint")).alias("spend_micro"),
        )
        .orderBy(F.desc("n_purchases"), F.asc("user_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# PageRank over the user browse-transition graph — the link-authority
# signal the reference's in-link Count (crawler.go:84-91, link
# popularity) approximates with a single hop. Iterative distributed
# graph op with an EXACT oracle: the oracle unrolls the same 5
# iterations as WITH-chained CTEs, and every arithmetic step is int64
# micro-units with ONE floor division per edge contribution —
# order-independent sums, no float anywhere, so both engines agree
# bit-for-bit.
_PR_ITERS = 5
_PR_D_NUM, _PR_D_DEN = 85, 100  # damping 0.85 as a rational


def _pr_iter_sql(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT n.node,
         (SELECT ({_PR_D_DEN - _PR_D_NUM} * 1000000) // ({_PR_D_DEN} * count(*)) FROM nodes)
           + COALESCE(s.c, 0) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           sum(({_PR_D_NUM} * p.pr * e.w) // ({_PR_D_DEN} * e.outw)) AS c
    FROM edges e JOIN {prev} p ON p.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""


@register(
    "events_pagerank",
    f"""
WITH ev AS (
  SELECT user_id, ts, event_id,
         CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS node
  FROM events
),
tr AS (
  SELECT node AS src,
         lead(node) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM ev
),
ew AS (
  SELECT src, dst, count(*) AS w FROM tr WHERE dst IS NOT NULL
  GROUP BY src, dst
),
edges AS (
  SELECT ew.src, ew.dst, ew.w, o.outw
  FROM ew JOIN (SELECT src, sum(w) AS outw FROM ew GROUP BY src) o
    ON o.src = ew.src
),
nodes AS (SELECT DISTINCT node FROM ev),
iter0 AS (
  SELECT node, 1000000 // (SELECT count(*) FROM nodes) AS pr FROM nodes
),
{",".join(_pr_iter_sql(f"iter{i}", f"iter{i + 1}") for i in range(_PR_ITERS))}
SELECT node, CAST(pr AS BIGINT) AS pr_micro,
       CAST(row_number() OVER (ORDER BY pr DESC, node ASC) AS BIGINT) AS rnk
FROM iter{_PR_ITERS}
""",
)
def events_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-iteration PageRank (damping 0.85) over the browse graph:
    nodes are the page ids in event props, edges are consecutive
    events per user (ordered by ts, event_id), weighted by transition
    count. All state is int64 micro-units; each edge contribution is
    (85 * pr * w) // (100 * outw) — a single floor division, so the
    per-iteration sums are order-independent and engine-exact.

    Scale: the canonical iterative DataFrame pattern — edges and nodes
    materialize once (the graph is the big table; it never changes
    across iterations), each iteration is one join + partial-agg
    shuffle on dst, and rank state is 16 bytes/node. At 1e10 edges you
    pre-partition edges by src so the per-iteration join co-locates
    with the rank table; iteration count is fixed (5), not
    convergence-driven, keeping the lineage bounded (each iteration
    here builds on a materialized rank, not a growing plan)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.regexp_extract("props", "[0-9]+", 0).cast("long").alias("node"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.col("node").alias("src"), F.lead("node").over(w).alias("dst")
    ).filter(F.col("dst").isNotNull())
    ew = tr.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    outw = ew.groupBy("src").agg(F.sum("w").alias("outw"))
    # the graph is iterated 5x: materialize it once (at 1e10 edges
    # this is the pre-partitioned edges table, not executor memory)
    edges = ew.join(outw, "src").localCheckpoint(eager=True)
    nodes = ev.select("node").distinct().localCheckpoint(eager=True)
    n = nodes.count()
    base = ((_PR_D_DEN - _PR_D_NUM) * 1_000_000) // (_PR_D_DEN * n)
    pr = nodes.select("node", F.lit(1_000_000 // n).cast("long").alias("pr"))
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(pr, edges["src"] == pr["node"])
            .select(
                "dst",
                F.expr(
                    f"({_PR_D_NUM} * pr * w) div ({_PR_D_DEN} * outw)"
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        pr = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (F.lit(base) + F.coalesce(F.col("c"), F.lit(0)))
            .cast("long")
            .alias("pr"),
        )
        # materialize each iteration: bounded lineage, and the next
        # join reads a table instead of replaying the whole prefix
        pr = pr.localCheckpoint(eager=True)
    # total-order rank over ALL nodes: a bare Window.orderBy funnels
    # every node through one task (fine at toy SF, a wall at 1e9
    # nodes); total_order_rank range-partitions the sort so each task
    # ranks ~n/parts nodes and only per-partition counts cross tasks
    from gocrawler_spark.operators.prefix import total_order_rank

    return total_order_rank(
        pr, [F.desc("pr"), F.asc("node")], out_col="rnk"
    ).select(
        "node",
        F.col("pr").alias("pr_micro"),
        F.col("rnk").cast("long").alias("rnk"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_attribution_asof",
    """
WITH v AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id, p.user_id,
       COALESCE(v.event_id, -1) AS view_id,
       CAST(COALESCE(date_diff('microseconds', v.ts, p.ts), -1) AS BIGINT)
         AS gap_us
FROM p ASOF LEFT JOIN v
  ON p.user_id = v.user_id AND p.ts >= v.ts
""",
)
def events_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN (temporal attribution): each purchase is attributed
    to the same user's latest view at or before the purchase instant;
    purchases with no prior view carry the -1 sentinel (explicitly
    "new", and non-null so the driver's row sort never compares NULL). The oracle
    uses DuckDB's native ASOF LEFT JOIN; Spark has no asof operator,
    so the engine uses the SCALABLE distributed formulation — tag both
    event sets, union them, and carry the last non-null view forward
    with one running window per user:

        union(view:kind=0, purchase:kind=1)
        last(view_id, ignorenulls) OVER (PARTITION BY user
                                         ORDER BY ts, kind
                                         ROWS UNBOUNDED PRECEDING..CURRENT)

    One shuffle on the user key and one sort — never the naive
    range-join (p x v per user) expansion, which is quadratic in
    events-per-user at 100 TB. Ordering kind after ts makes a view at
    the exact purchase instant eligible, matching ASOF's >= bound;
    (user, ts) pairs are unique in the generated table; the window
    additionally orders by view_ref so that if duplicates ever appear,
    the engine's pick is still total and deterministic (highest
    event_id among same-instant views) rather than partition-order
    luck — DuckDB's ASOF makes its own arbitrary pick in that case, so
    the oracle comparison still leans on the uniqueness invariant."""
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("view_ref"),
        F.col("ts").alias("view_ts"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("view_ref"),
        F.lit(None).cast("timestamp_ntz").alias("view_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    tagged = views.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", F.col("view_ref").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "user_id",
        "ts",
        "kind",
        "purchase_id",
        F.last("view_ref", ignorenulls=True).over(w).alias("view_id"),
        F.last("view_ts", ignorenulls=True).over(w).alias("attr_ts"),
    )
    return carried.filter(F.col("kind") == 1).select(
        "purchase_id",
        "user_id",
        F.coalesce(F.col("view_id"), F.lit(-1)).alias("view_id"),
        F.coalesce(
            F.expr("timestampdiff(MICROSECOND, attr_ts, ts)").cast("long"),
            F.lit(-1).cast("long"),
        ).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
@register(
    "events_rollup_multi",
    """
SELECT CAST(GROUPING(event_type, day, hour) AS BIGINT) AS lvl,
       COALESCE(event_type, '(all)') AS event_type,
       COALESCE(day, '(all)') AS day,
       COALESCE(hour, '(all)') AS hour,
       count(*) AS n,
       CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_sum_micro
FROM (
  SELECT event_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         strftime(date_trunc('hour', ts), '%H') AS hour,
         value
  FROM events
)
GROUP BY ROLLUP(event_type, day, hour)
""",
)
def events_rollup_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hour, day,
    per-type, and grand totals in ONE pass via GROUP BY ROLLUP —
    Spark expands the grouping sets after the partial aggregation, so
    the fact table is scanned and partially aggregated once, not once
    per granularity (the multi-level materialized-rollup shape a
    time-series store maintains). lvl is the grouping bitmask (0 =
    finest (type, day, hour), 1 = (type, day), 3 = (type), 7 = grand
    total) — same convention on both engines."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("hour", F.col("ts")), "HH").alias("hour"),
        "value",
    )
    return ev.rollup("event_type", "day", "hour").agg(
        F.grouping_id().cast("long").alias("lvl"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 1e6).cast("bigint")).alias(
            "value_sum_micro"
        ),
    ).select(
        "lvl",
        F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
        F.coalesce("day", F.lit("(all)")).alias("day"),
        F.coalesce("hour", F.lit("(all)")).alias("hour"),
        "n",
        "value_sum_micro",
    )


# ---------------------------------------------------------------------------
# Range join: irregular value bands. Bounds in integer cents; the
# engine turns the interval predicate into an EQUIJOIN by expanding
# each band over a fixed 5.00-unit grid (bucket-expansion) — the
# standard trick that keeps a range join off the nested-loop path.
_VALUE_BANDS_C = [  # (band_id, lo_cents incl, hi_cents excl)
    (0, 0, 500),
    (1, 500, 2_000),
    (2, 2_000, 5_000),
    (3, 5_000, 10_000),
    (4, 10_000, 25_000),
    (5, 25_000, 100_000),
]
_GRID_C = 500  # grid cell width in cents


@register(
    "events_value_range_join",
    f"""
WITH bands(band_id, lo_c, hi_c) AS (
  VALUES {", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _VALUE_BANDS_C)}
),
ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc FROM events
)
SELECT b.band_id, CAST(b.lo_c AS BIGINT) AS lo_c, CAST(b.hi_c AS BIGINT) AS hi_c,
       e.event_type,
       count(*) AS n, CAST(sum(e.vc) AS BIGINT) AS value_sum_c
FROM ev e JOIN bands b ON e.vc >= b.lo_c AND e.vc < b.hi_c
GROUP BY b.band_id, b.lo_c, b.hi_c, e.event_type
""",
)
def events_value_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (interval lookup) executed as an equijoin: every
    band expands to the 5.00-unit grid cells it overlaps (200 rows
    total, broadcast), events join on cell = vc // 500, and the exact
    interval bounds apply as a residual filter after the match. All
    comparisons are integer cents, so the band assignment is
    engine-exact (no float-boundary flips at 5.00 etc.).

    Scale: the naive non-equi join is a BroadcastNestedLoopJoin that
    tests every (event, band) pair — fine at 6 bands, quadratic pain
    when the interval table grows (IP ranges, tariff schedules).
    Bucket expansion keeps it a hash equijoin whose build side is
    O(sum of interval widths / grid), independent of probe size; the
    oracle states the same semantics as the plain BETWEEN join."""
    expanded = [
        (b, lo, hi, cell)
        for b, lo, hi in _VALUE_BANDS_C
        for cell in range(lo // _GRID_C, (hi - 1) // _GRID_C + 1)
    ]
    bands = spark.createDataFrame(
        expanded, "band_id long, lo_c long, hi_c long, cell long"
    )
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
    ).withColumn("cell", F.expr(f"vc div {_GRID_C}"))
    return (
        ev.join(F.broadcast(bands), "cell")
        .filter((F.col("vc") >= F.col("lo_c")) & (F.col("vc") < F.col("hi_c")))
        .groupBy("band_id", "lo_c", "hi_c", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("vc").alias("value_sum_c"))
    )
