"""Temporal joins (as-of, interval/range) — operators Spark lacks as
primitives, composed scale-first from built-ins (SURVEY.md custom-
operator rule (a): composition before UDFs).

As-of join via union+window: tag both streams, union, one window sort
per key, last_value(ignorenulls) carries the most recent left-side row
forward.  This is O(n log n) per key with ONE shuffle — versus the
naive inequality join whose range predicate forces a broadcast
nested loop (O(n·m)).  The same trick is how streaming engines do
temporal joins; it survives 100 TB because it's just a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scache_spark.catalog import load_table
from scache_spark.registry import register


@register(
    "asof_join_last_click",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, 'click' AS side FROM events
      WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, event_id, 'purchase' AS side FROM events
      WHERE event_type = 'purchase'
    ),
    carried AS (
      SELECT user_id, ts, event_id, side,
             max(CASE WHEN side = 'click' THEN ts END)
                 OVER (PARTITION BY user_id ORDER BY ts, side, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS last_click_ts
      FROM tagged
    )
    SELECT event_id AS purchase_id, user_id,
           CAST(ts AS TIMESTAMP) AS purchase_ts,
           CAST(last_click_ts AS TIMESTAMP) AS last_click_ts
    FROM carried WHERE side = 'purchase'
    """,
    tags=("temporal", "B11"),
    doc="As-of join: for each purchase, the user's most recent strictly "
    "earlier click — via union+window (one shuffle on user_id), not an "
    "inequality join (broadcast-nested-loop at scale).  Total order "
    "(ts, side, event_id) makes simultaneous events deterministic.",
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit("click").alias("side")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit("purchase").alias("side")
    )
    tagged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = tagged.withColumn(
        "last_click_ts",
        F.max(F.when(F.col("side") == "click", F.col("ts"))).over(w),
    )
    return carried.filter(F.col("side") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_click_ts",
    )


@register(
    "range_join_ship_window",
    oracle="""
    SELECT o_orderkey,
           CAST(count(*) AS BIGINT) AS n_shipped_30d,
           round(sum(l_quantity), 2) AS qty_30d
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate < o_orderdate + INTERVAL '30 days'
    GROUP BY o_orderkey
    """,
    tags=("temporal", "B4"),
    doc="Interval/range join done right at scale: the EQUI key "
    "(l_orderkey = o_orderkey) drives a hash join; the range predicate "
    "is a post-join filter — never a standalone inequality join.",
)
def range_join_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        )
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shipped_30d"),
            F.round(F.sum("l_quantity"), 2).alias("qty_30d"),
        )
    )


@register(
    "time_bucket_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total,
           CAST(count(DISTINCT user_id) AS BIGINT) AS dau
    FROM events GROUP BY 1, 2
    """,
    tags=("temporal", "B15", "B7"),
    doc="Hypertable-style daily rollup with per-bucket distinct users — "
    "the continuous-aggregate shape (at scale: incremental via "
    "Structured Streaming, stream_tumbling_window).",
)
def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("value"), 4).alias("total"),
        F.countDistinct("user_id").cast("long").alias("dau"),
    )


@register(
    "funnel_session_conversion",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, event_type,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    ),
    per_session AS (
      SELECT user_id, sid,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
      FROM sess GROUP BY user_id, sid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(has_click) AS BIGINT) AS n_with_click,
           CAST(sum(has_click * has_purchase) AS BIGINT) AS n_converted,
           CAST(sum(has_click * has_purchase) AS DOUBLE)
             / nullif(sum(has_click), 0) AS conversion_rate
    FROM per_session
    """,
    tags=("temporal", "B11", "B27"),
    doc="Session-based funnel: sessionize (10-min gap), flag click and "
    "purchase per session, conversion = P(purchase | click).  One "
    "shuffle on user_id serves sessionization and flags; the final "
    "aggregate is a scalar.",
)
def funnel_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    ordered = ev.select(
        "user_id",
        "ts",
        "event_type",
        # unix_micros, not cast('long'): the cast truncates to whole
        # seconds, which can disagree with the oracle's full-precision
        # interval comparison at the 10-minute boundary
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                >= 600 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = ordered.withColumn(
        "sid",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "has_click"
        ),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "has_purchase"
        ),
    )
    return per_session.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("has_click").cast("long").alias("n_with_click"),
        F.sum(F.col("has_click") * F.col("has_purchase"))
        .cast("long")
        .alias("n_converted"),
        (
            F.sum(F.col("has_click") * F.col("has_purchase")).cast("double")
            / F.nullif(F.sum("has_click"), F.lit(0))
        ).alias("conversion_rate"),
    )


@register(
    "gap_fill_daily_revenue",
    oracle="""
    WITH spine AS (
      SELECT unnest(generate_series(DATE '1996-01-01', DATE '1996-03-31',
                                    INTERVAL 1 DAY)) AS day),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_orders,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1)
    SELECT CAST(s.day AS DATE) AS day,
           coalesce(d.n_orders, 0) AS n_orders,
           round(coalesce(d.revenue, 0.0), 2) AS revenue,
           round(coalesce(last_value(d.revenue IGNORE NULLS)
                 OVER (ORDER BY s.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 0.0), 2) AS revenue_locf
    FROM spine s LEFT JOIN daily d ON CAST(s.day AS DATE) = d.day
    """,
    tags=("temporal", "B11", "B15", "B19"),
    doc="Calendar gap-filling: a generated date spine LEFT-joins the "
    "daily aggregate; missing days zero-fill, and a last-observation-"
    "carried-forward column fills via last(ignorenulls) over an "
    "ordered frame.  The spine is sequence()+explode — one row per "
    "day, broadcast-joinable.  The LOCF window here is a single "
    "ordered pass over the 91-day spine (the aggregate, not the fact "
    "table); at 100 TB partition the spine window by month/entity so "
    "no single ordered partition grows unbounded.",
)
def gap_fill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"),
                F.lit("1996-03-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.round(F.coalesce("revenue", F.lit(0.0)), 2).alias("revenue"),
            F.round(
                F.coalesce(F.last("revenue", ignorenulls=True).over(w), F.lit(0.0)),
                2,
            ).alias("revenue_locf"),
        )
    )


@register(
    "scd2_status_history",
    oracle="""
    WITH h AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             lag(o_orderstatus) OVER w AS prev
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), flagged AS (
      SELECT *, CASE WHEN prev IS NULL OR prev <> o_orderstatus
                     THEN 1 ELSE 0 END AS brk
      FROM h
    ), grp AS (
      SELECT *, sum(brk) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS UNBOUNDED PRECEDING) AS version_no
      FROM flagged
    )
    SELECT o_custkey,
           o_orderstatus AS status,
           CAST(version_no AS INT) AS version_no,
           CAST(min(o_orderdate) AS TIMESTAMP) AS valid_from,
           CAST(max(o_orderdate) AS TIMESTAMP) AS last_seen,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM grp
    GROUP BY o_custkey, o_orderstatus, version_no
    """,
    tags=("temporal", "B11", "B7"),
    doc="SCD2 (slowly-changing-dimension type 2) history build: "
    "per-customer order-status runs collapsed into effective-dated "
    "version rows via gaps-and-islands (lag → break flag → running "
    "sum → group).  This is how a warehouse derives dimension "
    "validity intervals from an event log.  Both windows and the "
    "final aggregate share ONE hash partitioning on custkey — the "
    "history never shuffles twice.  Ordering is total "
    "((o_orderdate, o_orderkey)), so version numbering is "
    "deterministic across engines and partition counts.",
)
def scd2_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = o.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderdate",
        "o_orderkey",
        F.when(
            F.lag("o_orderstatus").over(w).isNull()
            | (F.lag("o_orderstatus").over(w) != F.col("o_orderstatus")),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    grp = flagged.withColumn(
        "version_no",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return grp.groupBy(
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        F.col("version_no").cast("int").alias("version_no"),
    ).agg(
        F.min("o_orderdate").alias("valid_from"),
        F.max("o_orderdate").alias("last_seen"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )


@register(
    "rolling_7day_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             sum(o_totalprice) AS rev,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1)
    SELECT CAST(day AS DATE) AS day,
           n_orders,
           round(rev, 2) AS revenue,
           round(sum(rev) OVER (ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 2)
               AS revenue_7d
    FROM daily
    """,
    tags=("temporal", "B11", "B15"),
    doc="Trailing 7-day rolling revenue via a TIME-based RANGE frame — "
    "unlike a ROWS frame, missing days don't stretch the horizon.  "
    "Spark's rangeBetween needs a numeric ordering key, so the frame "
    "orders by epoch-day (datediff from 1970-01-01) with range "
    "[-6, 0]: exactly DuckDB's RANGE INTERVAL 6 DAY PRECEDING.  The "
    "window runs over the pre-aggregated daily frame (one row per "
    "day), not the fact table; at scale partition it by entity so no "
    "ordered partition is unbounded.",
)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum("o_totalprice").alias("rev"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )
    w = (
        Window.orderBy(F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "day",
        "n_orders",
        F.round("rev", 2).alias("revenue"),
        F.round(F.sum("rev").over(w), 2).alias("revenue_7d"),
    )
