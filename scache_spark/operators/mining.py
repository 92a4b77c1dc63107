"""Pattern-mining & monitoring operators: co-occurrence, streaks,
EWMA anomaly flags, LSH design curves.

The reference's analytics surface stops at shuffle-level statistics
(reduce-size prediction, ``sim/sim.py:223-263``); this module covers
the dataset-level mining a training-data pipeline runs on top: which
items co-occur (a-priori pruned pair counting), how user activity
streaks distribute (gaps-and-islands), which daily series spike
(observation-indexed EWMA), and whether the deployed MinHash banding
actually catches the observed similarity mass (analytic candidate
curve against measured Jaccard pairs).

Bit-exactness discipline (FIXTURES.md): every float expression is
either (a) built from identical left-associated literal arithmetic in
both engines (EWMA weights are emitted as ``CAST('<repr>' AS
DOUBLE)`` so DuckDB cannot parse them as DECIMAL; powers are expanded
to explicit products, never ``pow``), or (b) an order-dependent sum
rounded onto a grid coarser than accumulated ulp noise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scache_spark.catalog import load_table
from scache_spark.functions import bounded_window
from scache_spark.registry import register

# ---------------------------------------------------------------------------
# co-occurrence mining (market-basket pair counts with a-priori pruning)
# ---------------------------------------------------------------------------

MIN_PAIR_ORDERS = 3


@register(
    "cooccurrence_brand_pairs",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    brand_n AS (
      SELECT p_brand, count(*) AS n_orders_brand FROM items GROUP BY p_brand
    ),
    totals AS (SELECT count(DISTINCT l_orderkey) AS n_total FROM items),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             CAST(count(*) AS BIGINT) AS n_co
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
      HAVING count(*) >= {MIN_PAIR_ORDERS}
    )
    SELECT brand_a, brand_b, n_co,
           round(CAST(n_co AS DOUBLE) * CAST(t.n_total AS DOUBLE)
                 / (CAST(na.n_orders_brand AS DOUBLE)
                    * CAST(nb.n_orders_brand AS DOUBLE)), 6) AS lift
    FROM pairs
    JOIN brand_n na ON na.p_brand = brand_a
    JOIN brand_n nb ON nb.p_brand = brand_b
    CROSS JOIN totals t
    """,
    tags=("B7", "B4", "mining"),
    doc="Market-basket co-occurrence: brand pairs sharing >= "
    f"{MIN_PAIR_ORDERS} orders, with lift.  Scale shape: the li⋈part "
    "brand lookup joins with AQE-chosen strategy (part grows with SF "
    "— no forced broadcast), then ONE shuffle "
    "builds per-order sorted brand baskets (collect_set dedups in "
    "the same aggregate); pairs explode from each basket in-map "
    "(bounded by basket-size², never corpus size) — no self-join, so "
    "the corpus is scanned and shuffled once instead of twice; brand "
    "marginals and the 1-row total come back as broadcasts.  The "
    "same plan counts n-gram co-occurrence over a 100 TB token "
    "corpus.",
)
def cooccurrence_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scache_spark.catalog import widen_scan

    # Project to the two join/group columns before any exchange (§2.3)
    # and widen the single-row-group local scan keyed on l_orderkey
    # (§2.5): the repartition pre-establishes the groupBy's required
    # distribution, so the basket aggregation reuses it instead of
    # adding its own exchange — and the scan→join→collect_set map work
    # runs at full parallelism instead of on the scan's 1 task
    # (r9: interleaved A/B 1.55s → 1.17s min, identical 300 rows; at
    # production scale the widen guard no-ops and the groupBy plans
    # its usual exchange).
    li = widen_scan(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
    )
    part = load_table(spark, sf_dir, "part")
    # The basket table is the working set of every downstream branch
    # (brand marginals, order total, pair generation); checkpoint so
    # the lineitem-part join builds it once, not once per branch.
    baskets = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
        .localCheckpoint(eager=True)
    )
    items = baskets.select(
        "l_orderkey", F.explode("bs").alias("p_brand")
    )
    brand_n = items.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_orders_brand")
    )
    totals = baskets.agg(F.count(F.lit(1)).alias("n_total"))
    # all (a, b) with a before b in the sorted basket — generated
    # in-projection, exploded map-side
    pair_arr = F.flatten(
        F.transform(
            F.col("bs"),
            lambda x, i: F.transform(
                F.slice(F.col("bs"), i + 2, F.size(F.col("bs"))),
                lambda y: F.struct(
                    x.alias("brand_a"), y.alias("brand_b")
                ),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.brand_a"), F.col("p.brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_co"))
        .filter(F.col("n_co") >= MIN_PAIR_ORDERS)
    )
    na = brand_n.select(
        F.col("p_brand").alias("brand_a"), F.col("n_orders_brand").alias("na")
    )
    nb = brand_n.select(
        F.col("p_brand").alias("brand_b"), F.col("n_orders_brand").alias("nb")
    )
    lift = F.round(
        F.col("n_co").cast("double")
        * F.col("n_total").cast("double")
        / (F.col("na").cast("double") * F.col("nb").cast("double")),
        6,
    )
    return (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(totals))
        .select("brand_a", "brand_b", "n_co", lift.alias("lift"))
    )


# ---------------------------------------------------------------------------
# gaps-and-islands: consecutive-day activity streaks
# ---------------------------------------------------------------------------


@register(
    "gaps_islands_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    isl AS (
      SELECT user_id,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INT) AS grp,
             d
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp,
             CAST(count(*) AS BIGINT) AS n_days,
             min(d) AS streak_start
      FROM isl GROUP BY user_id, grp
    ),
    ranked AS (
      SELECT user_id, n_days, streak_start,
             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_islands,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n_days DESC, streak_start ASC) AS rn
      FROM streaks
    )
    SELECT user_id, n_islands,
           n_days AS longest_days,
           CAST(streak_start AS TIMESTAMP) AS longest_start
    FROM ranked WHERE rn = 1
    """,
    tags=("B11", "B15", "mining"),
    doc="Gaps-and-islands: longest consecutive-day activity streak per "
    "user via the date-minus-row_number constant-group trick — one "
    "shuffle on user_id shared by the window and both aggregations, "
    "no self-join, no iteration.  DISTINCT (user, day) first, so "
    "downstream state is bounded by user-days, not raw events.",
)
def gaps_islands_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.min("d").alias("streak_start"),
    )
    wu = Window.partitionBy("user_id")
    wr = Window.partitionBy("user_id").orderBy(
        F.col("n_days").desc(), F.col("streak_start").asc()
    )
    return (
        streaks.withColumn("n_islands", F.count(F.lit(1)).over(wu).cast("long"))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "n_islands",
            F.col("n_days").alias("longest_days"),
            F.col("streak_start").cast("timestamp").alias("longest_start"),
        )
    )


# ---------------------------------------------------------------------------
# EWMA anomaly flags over daily series
# ---------------------------------------------------------------------------

EWMA_DECAY = 0.7
EWMA_LAGS = 14  # current day + 13 trailing observations


def _ewma_cols() -> tuple[Column, Column]:
    """(numerator, denominator) of the observation-indexed EWMA as
    explicit left-associated sums over lag columns ``x_0..x_13``
    (pre-rounded daily totals), weights 0.7^k emitted as exact double
    literals — bit-identical to the SQL twin by construction."""
    num = None
    den = None
    for k in range(EWMA_LAGS):
        wk = F.lit(EWMA_DECAY**k)
        xk = F.col(f"x_{k}")
        nk = F.when(xk.isNotNull(), xk * wk).otherwise(F.lit(0.0))
        dk = F.when(xk.isNotNull(), wk).otherwise(F.lit(0.0))
        num = nk if num is None else num + nk
        den = dk if den is None else den + dk
    return num, den


def _sql_ewma() -> tuple[str, str]:
    num = " + ".join(
        f"CASE WHEN x_{k} IS NOT NULL THEN x_{k} * CAST('{EWMA_DECAY**k!r}' AS DOUBLE) "
        f"ELSE 0.0 END"
        for k in range(EWMA_LAGS)
    )
    den = " + ".join(
        f"CASE WHEN x_{k} IS NOT NULL THEN CAST('{EWMA_DECAY**k!r}' AS DOUBLE) "
        f"ELSE 0.0 END"
        for k in range(EWMA_LAGS)
    )
    return num, den


_SQL_NUM, _SQL_DEN = _sql_ewma()
_SQL_LAG_COLS = ", ".join(
    f"lag(x, {k}) OVER (PARTITION BY event_type ORDER BY day) AS x_{k}"
    for k in range(EWMA_LAGS)
)


@register(
    "ewma_anomaly_flags",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
             round(sum(value), 4) AS x
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    lagged AS (
      SELECT day, event_type, x, {_SQL_LAG_COLS}
      FROM daily
    ),
    scored AS (
      SELECT day, event_type, x,
             round(({_SQL_NUM}) / ({_SQL_DEN}), 4) AS ewma,
             round(x / (({_SQL_NUM}) / ({_SQL_DEN})), 6) AS ratio
      FROM lagged
    )
    SELECT day, event_type, x, ewma, ratio,
           (ratio > 1.2 OR ratio < 0.8) AS is_anomaly
    FROM scored
    """,
    tags=("B11", "B15", "B20", "mining"),
    doc="EWMA spike detection on daily per-type revenue: the smoothing "
    "window is 14 explicit lag columns with closed-form 0.7^k weights "
    "(observation-indexed, so day gaps don't misalign), one window "
    "shuffle on event_type.  Daily totals are rounded BEFORE "
    "smoothing so both engines feed identical doubles into identical "
    "left-associated arithmetic — the flag threshold then compares "
    "bit-equal ratios, never ulp noise.",
)
def ewma_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DIRTY-EVENTS CONTRACT: NULL event time has no day — and the
    # engines disagree on where a NULL day sorts in the lag window
    # (Spark nulls-first, DuckDB nulls-last), which would misalign
    # the whole lag chain.  Excluded on both sides.
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.round(F.sum("value"), 4).alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "day",
        "event_type",
        "x",
        *[F.lag("x", k).over(w).alias(f"x_{k}") for k in range(EWMA_LAGS)],
    )
    num, den = _ewma_cols()
    # try_divide, not /: a day whose values are ALL NULL has x NULL,
    # and if its 13 trailing observations are too, den == 0 — DuckDB
    # division by zero yields NULL while Spark ANSI throws mid-query
    # (property-fuzz finding, tests/test_dirty_properties.py).  Same
    # guard for ratio when the window's EWMA is legitimately 0.0.
    scored = lagged.select(
        "day",
        "event_type",
        "x",
        F.round(F.try_divide(num, den), 4).alias("ewma"),
        F.round(F.try_divide(F.col("x"), F.try_divide(num, den)), 6).alias(
            "ratio"
        ),
    )
    return scored.withColumn(
        "is_anomaly", (F.col("ratio") > 1.2) | (F.col("ratio") < 0.8)
    )


# ---------------------------------------------------------------------------
# LSH design curve: analytic banding probability vs observed similarity
# ---------------------------------------------------------------------------


def _p_candidate(q_terms: int, bands: int, s: str) -> str:
    """SQL for 1 - (1 - s^r)^b with the powers expanded to explicit
    left-associated products (no ``pow`` — libm vs JVM differ by ulp)."""
    sr = "(" + " * ".join([s] * q_terms) + ")"
    q = f"(1.0 - {sr})"
    qb = "(" + " * ".join([q] * bands) + ")"
    return f"(1.0 - {qb})"


def _p_candidate_col(q_terms: int, bands: int, s: Column) -> Column:
    sr = s
    for _ in range(q_terms - 1):
        sr = sr * s
    q = F.lit(1.0) - sr
    qb = q
    for _ in range(bands - 1):
        qb = qb * q
    return F.lit(1.0) - qb


@register(
    "lsh_design_curve",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, source,
             list_distinct([array_to_string(string_split(lower(text), ' ')[i:i+2], ' ')
                            for i in range(1, len(string_split(lower(text), ' ')) - 1)])
                 AS s
      FROM documents
      WHERE len(string_split(lower(text), ' ')) >= 3
    ),
    pairs AS (
      SELECT floor((CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.s, b.s))))
                   * 10.0) / 10.0 AS sim_bin
      FROM sh a JOIN sh b
        ON a.source = b.source AND a.doc_id < b.doc_id
    ),
    binned AS (
      SELECT sim_bin, CAST(count(*) AS BIGINT) AS n_pairs,
             sim_bin + 0.05 AS mid
      FROM pairs GROUP BY sim_bin
    )
    SELECT sim_bin, n_pairs,
           round({_p_candidate(2, 4, "mid")}, 6) AS p_b4r2,
           round({_p_candidate(1, 8, "mid")}, 6) AS p_b8r1,
           round({_p_candidate(4, 2, "mid")}, 6) AS p_b2r4,
           round(CAST(n_pairs AS DOUBLE) * {_p_candidate(2, 4, "mid")}, 4)
               AS exp_caught_b4r2
    FROM binned
    """,
    tags=("B24", "B16", "mining"),
    doc="MinHash-LSH operating curve: measured 3-shingle Jaccard "
    "similarities (within source blocks — the bounded design-time "
    "sample, NOT the production path) are binned into deciles and "
    "scored with the analytic candidate probability 1-(1-s^r)^b for "
    "the deployed banding (b=4, r=2; dedup.py N_BANDS) and two "
    "alternatives, yielding expected-caught-pairs per similarity "
    "decile.  This is how you pick (b, r) BEFORE running banded dedup "
    "over 100 TB; powers are expanded to products so both engines "
    "produce bit-identical curves.",
)
def lsh_design_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plain documents (not the augmented dedup corpus): the curve
    # characterizes the natural similarity mass.
    docs = load_table(spark, sf_dir, "documents")
    from scache_spark.functions import word_shingles

    toks = F.split(F.lower(F.col("text")), " ")
    sh = docs.select(
        "doc_id",
        "source",
        word_shingles(toks, 3).alias("s"),
    ).filter(F.size(toks) >= 3)
    a = sh.select(
        "source", F.col("doc_id").alias("doc_a"), F.col("s").alias("s_a")
    )
    b = sh.select(
        F.col("source").alias("source_b"),
        F.col("doc_id").alias("doc_b"),
        F.col("s").alias("s_b"),
    )
    jac = F.size(F.array_intersect("s_a", "s_b")).cast("double") / F.size(
        F.array_union("s_a", "s_b")
    )
    pairs = a.join(
        b,
        (F.col("source") == F.col("source_b")) & (F.col("doc_a") < F.col("doc_b")),
    ).select((F.floor(jac * 10.0) / 10.0).alias("sim_bin"))
    binned = pairs.groupBy("sim_bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    mid = F.col("sim_bin") + 0.05
    return binned.select(
        "sim_bin",
        "n_pairs",
        F.round(_p_candidate_col(2, 4, mid), 6).alias("p_b4r2"),
        F.round(_p_candidate_col(1, 8, mid), 6).alias("p_b8r1"),
        F.round(_p_candidate_col(4, 2, mid), 6).alias("p_b2r4"),
        F.round(
            F.col("n_pairs").cast("double") * _p_candidate_col(2, 4, mid), 4
        ).alias("exp_caught_b4r2"),
    )


# ---------------------------------------------------------------------------
# revenue concentration (Lorenz/Gini), DAU overlap, conversion survival
# ---------------------------------------------------------------------------


@register(
    "revenue_gini_by_region",
    oracle="""
    WITH cust AS (
      SELECT c_custkey, n_regionkey AS region, sum(o_totalprice) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT region, rev,
             CAST(row_number() OVER (PARTITION BY region
                  ORDER BY rev ASC, c_custkey ASC) AS BIGINT) AS i,
             CAST(count(*) OVER (PARTITION BY region) AS BIGINT) AS n,
             sum(rev) OVER (PARTITION BY region) AS total
      FROM cust
    )
    SELECT region,
           max(n) AS n_customers,
           round(max(total), 2) AS total_revenue,
           round(2.0 * sum(i * rev) / (max(n) * max(total))
                 - (max(n) + 1.0) / max(n), 6) AS gini
    FROM ranked GROUP BY region
    """,
    tags=("B7", "B11", "mining"),
    doc="Revenue concentration per region via the closed-form Gini "
    "estimator 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over ascending "
    "revenue ranks — one window shuffle on region feeds rank, count, "
    "and total simultaneously; no pairwise |x_i - x_j| comparison "
    "(the naive O(n^2) definition).  The same plan audits token-count "
    "concentration across corpus sources.",
)
def revenue_gini_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cust = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", F.col("n_regionkey").alias("region"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    wr = Window.partitionBy("region").orderBy(
        F.col("rev").asc(), F.col("c_custkey").asc()
    )
    wp = Window.partitionBy("region")
    ranked = cust.select(
        "region",
        "rev",
        F.row_number().over(wr).cast("long").alias("i"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
        F.sum("rev").over(wp).alias("total"),
    )
    return ranked.groupBy("region").agg(
        F.max("n").alias("n_customers"),
        F.round(F.max("total"), 2).alias("total_revenue"),
        F.round(
            F.lit(2.0) * F.sum(F.col("i") * F.col("rev"))
            / (F.max("n") * F.max("total"))
            - (F.max("n") + F.lit(1.0)) / F.max("n"),
            6,
        ).alias("gini"),
    )


@register(
    "dau_overlap_jaccard",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             user_id
      FROM events WHERE ts IS NOT NULL
    ),
    sizes AS (SELECT day, CAST(count(*) AS BIGINT) AS n FROM days GROUP BY day),
    overlap AS (
      SELECT a.day AS day, CAST(count(*) AS BIGINT) AS n_both
      FROM days a JOIN days b
        ON a.user_id = b.user_id AND b.day = a.day + INTERVAL '1 day'
      GROUP BY a.day
    )
    SELECT o.day, sa.n AS n_day, sb.n AS n_next, o.n_both,
           round(CAST(o.n_both AS DOUBLE)
                 / (sa.n + sb.n - o.n_both), 6) AS jaccard
    FROM overlap o
    JOIN sizes sa ON sa.day = o.day
    JOIN sizes sb ON sb.day = o.day + INTERVAL '1 day'
    """,
    tags=("B4", "B12", "mining"),
    doc="Day-over-day audience overlap: Jaccard of consecutive days' "
    "active-user sets — the retention-dynamics signal.  DISTINCT "
    "(day, user) first so the self-join carries user-day pairs, not "
    "raw events; the join key is user_id (one shuffle both sides "
    "share), day+1 is an equi condition, and daily sizes come back "
    "as a broadcast.",
)
def dau_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DIRTY-EVENTS CONTRACT: NULL-ts rows excluded (no activity day).
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # The user-day set feeds the size table AND both self-join sides —
    # checkpoint so the events scan + distinct run once, not 4x.
    days = (
        ev.select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = days.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("n"))
    b = days.select(
        (F.col("day") - F.expr("INTERVAL 1 DAY")).alias("day_prev"),
        F.col("user_id").alias("user_b"),
    )
    overlap = (
        days.join(
            b,
            (F.col("user_id") == F.col("user_b"))
            & (F.col("day") == F.col("day_prev")),
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    sa = sizes.select(F.col("day"), F.col("n").alias("n_day"))
    sb = sizes.select(
        (F.col("day") - F.expr("INTERVAL 1 DAY")).alias("day"),
        F.col("n").alias("n_next"),
    )
    return (
        overlap.join(F.broadcast(sa), "day")
        .join(F.broadcast(sb), "day")
        .select(
            "day",
            "n_day",
            "n_next",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_day") + F.col("n_next") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "conversion_survival_curve",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(ts) AS first_ts FROM events
      WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    conv AS (
      SELECT f.user_id,
             min(CASE WHEN e.event_type = 'purchase' THEN e.ts END)
                 AS conv_ts,
             any_value(f.first_ts) AS first_ts
      FROM firsts f JOIN events e ON f.user_id = e.user_id
      GROUP BY f.user_id
    ),
    mins AS (
      SELECT user_id,
             CASE WHEN conv_ts IS NULL THEN NULL
                  ELSE CAST(floor(date_diff('second', first_ts, conv_ts)
                                  / 3600.0) AS BIGINT) END AS conv_hour
      FROM conv
    ),
    grid AS (SELECT CAST(unnest(range(0, 48)) AS BIGINT) AS h),
    totals AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM mins)
    SELECT g.h AS hour,
           t.n_users,
           CAST(count(m.user_id) AS BIGINT) AS n_converted,
           round(1.0 - CAST(count(m.user_id) AS DOUBLE) / t.n_users, 6)
               AS surviving_frac
    FROM grid g
    CROSS JOIN totals t
    LEFT JOIN mins m ON m.conv_hour <= g.h
    GROUP BY g.h, t.n_users
    """,
    tags=("B15", "B7", "mining"),
    doc="Time-to-conversion survival curve: for each hour offset h in "
    "a 48-point grid, the fraction of users whose first purchase has "
    "NOT yet happened within h hours of their first event.  Per-user "
    "state collapses to ONE row (first_ts, conv_hour) before the "
    "grid join, so the 48x fan-out multiplies users, not events; at "
    "scale the grid side is the broadcast and the cumulative counts "
    "come from one pass.",
)
def conversion_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DIRTY-EVENTS CONTRACT: NULL user_id is not a user — the cohort
    # denominator counts identified users only (the oracle's equi-join
    # shape drops the NULL key implicitly; both sides now explicit).
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("conv_ts"),
    )
    mins = per_user.select(
        "user_id",
        F.when(
            F.col("conv_ts").isNotNull(),
            F.floor(
                (
                    F.col("conv_ts").cast("long")
                    - F.col("first_ts").cast("long")
                )
                / 3600.0
            ).cast("long"),
        ).alias("conv_hour"),
    )
    grid = spark.range(0, 48).select(F.col("id").cast("long").alias("hour"))
    totals = mins.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    joined = grid.crossJoin(F.broadcast(totals)).join(
        mins, F.col("conv_hour") <= F.col("hour"), "left"
    )
    return joined.groupBy("hour", "n_users").agg(
        F.count("user_id").cast("long").alias("n_converted"),
        F.round(
            F.lit(1.0) - F.count("user_id").cast("double") / F.col("n_users"),
            6,
        ).alias("surviving_frac"),
    )


@register(
    "new_vs_returning_users",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             user_id
      FROM events WHERE ts IS NOT NULL
    ),
    firsts AS (SELECT user_id, min(day) AS first_day FROM days GROUP BY user_id),
    flagged AS (
      SELECT d.day,
             CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END AS is_new
      FROM days d JOIN firsts f ON d.user_id = f.user_id
    ),
    daily AS (
      SELECT day,
             CAST(sum(is_new) AS BIGINT) AS new_users,
             CAST(sum(1 - is_new) AS BIGINT) AS returning_users
      FROM flagged GROUP BY day
    )
    SELECT day, new_users, returning_users,
           CAST(sum(new_users) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
    FROM daily
    """,
    tags=("B11", "B15", "mining"),
    doc="Growth accounting: per day, users active for the first time "
    "vs returning, plus the running total of distinct users ever "
    "seen — WITHOUT a running COUNT(DISTINCT) (unbounded state): "
    "each user collapses to one first_day row, so the cumulative "
    "curve is a cumsum over per-day NEW counts.  The tiny final "
    "window runs over |days| rows only.",
)
def new_vs_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DIRTY-EVENTS CONTRACT: NULL-ts rows excluded (no activity day).
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    days = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    firsts = days.groupBy("user_id").agg(F.min("day").alias("first_day"))
    flagged = days.join(firsts, "user_id").select(
        "day",
        (F.col("day") == F.col("first_day")).cast("int").alias("is_new"),
    )
    daily = flagged.groupBy("day").agg(
        F.sum("is_new").cast("long").alias("new_users"),
        F.sum(F.lit(1) - F.col("is_new")).cast("long").alias(
            "returning_users"
        ),
    )
    w = bounded_window("day", "day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_users",
        "returning_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


@register(
    "session_feature_vector",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_type, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    )
    SELECT user_id, CAST(sid AS BIGINT) AS sid,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)
               AS duration_s,
           round(sum(value), 4) AS total_value,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_views,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicks,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_errors
    FROM sess GROUP BY user_id, sid
    """,
    tags=("B11", "B7", "mining"),
    doc="Per-session feature vectors — the feature-engineering "
    "composite a behavior model trains on: sessionize (lag-gap "
    "islands), then duration, value, and per-type counts as CASE "
    "pivots, all inside the ONE shuffle the sessionization already "
    "pays.  Emitting features at session grain (not event grain) is "
    "what keeps the training table 100-1000x smaller than the log.",
)
def session_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DIRTY-EVENTS CONTRACT: NULL-ts rows excluded (unsessionizable).
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = (
        prev.isNull()
        | (F.col("ts") >= prev + F.expr("INTERVAL 10 MINUTES"))
    ).cast("int")
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "sid",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )

    def _n(t: str):
        return (
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"n_{t}s" if t != "error" else "n_errors")
        )

    return sess.groupBy("user_id", F.col("sid").cast("long").alias("sid")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("ts").cast("long") - F.min("ts").cast("long"))
        .cast("long")
        .alias("duration_s"),
        F.round(F.sum("value"), 4).alias("total_value"),
        _n("view"),
        _n("click"),
        _n("purchase"),
        _n("error"),
    )


# ---------------------------------------------------------------------------
# PMI token co-occurrence over a bounded vocabulary
# ---------------------------------------------------------------------------

PMI_VOCAB = 30
PMI_MIN_DF = 5


@register(
    "token_pmi_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' ')))
                 AS tok
      FROM documents
    ),
    df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY tok),
    vocab AS (
      SELECT tok, df FROM df ORDER BY df DESC, tok ASC LIMIT {PMI_VOCAB}
    ),
    vtoks AS (
      SELECT t.doc_id, t.tok FROM toks t JOIN vocab v ON t.tok = v.tok
    ),
    n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM documents),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b,
             CAST(count(*) AS BIGINT) AS df_ab
      FROM vtoks a JOIN vtoks b
        ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2
      HAVING count(*) >= {PMI_MIN_DF}
    )
    SELECT tok_a, tok_b, df_ab,
           round(ln(CAST(df_ab AS DOUBLE) * n.n_docs
                    / (CAST(va.df AS DOUBLE) * vb.df)), 6) AS pmi
    FROM pairs
    JOIN vocab va ON va.tok = tok_a
    JOIN vocab vb ON vb.tok = tok_b
    CROSS JOIN n
    """,
    tags=("B24", "B7", "mining"),
    doc="Pointwise mutual information over token pairs, vocabulary "
    f"bounded to the top {PMI_VOCAB} tokens by document frequency "
    "(TakeOrdered, broadcast back): the pair space is |V|² at most, "
    "never corpus-sized — the collocation/phrase-mining primitive.  "
    "ln() differs by ≤1 ulp across libms, so PMI rounds to 6dp; "
    "everything under the log is exact integers.",
)
def token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.lower(F.col("text")), " "))
        ).alias("tok"),
    )
    # vocab (TakeOrdered head) feeds the probe plus two final joins;
    # vtoks feeds BOTH self-join sides.  Checkpoint each so the corpus
    # tokenizes once, not once per branch (was 7 FileScans).
    df = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    vocab = (
        df.orderBy(F.col("df").desc(), F.col("tok").asc())
        .limit(PMI_VOCAB)
        .localCheckpoint(eager=True)
    )
    vtoks = toks.join(F.broadcast(vocab.select("tok")), "tok").localCheckpoint(
        eager=True
    )
    n = docs.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    a = vtoks.select("doc_id", F.col("tok").alias("tok_a"))
    b = vtoks.select("doc_id", F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).cast("long").alias("df_ab"))
        .filter(F.col("df_ab") >= PMI_MIN_DF)
    )
    va = vocab.select(F.col("tok").alias("tok_a"), F.col("df").alias("dfa"))
    vb = vocab.select(F.col("tok").alias("tok_b"), F.col("df").alias("dfb"))
    pmi = F.round(
        F.log(
            F.col("df_ab").cast("double")
            * F.col("n_docs")
            / (F.col("dfa").cast("double") * F.col("dfb"))
        ),
        6,
    )
    return (
        pairs.join(F.broadcast(va), "tok_a")
        .join(F.broadcast(vb), "tok_b")
        .crossJoin(F.broadcast(n))
        .select("tok_a", "tok_b", "df_ab", pmi.alias("pmi"))
    )


# ---------------------------------------------------------------------------
# Holt linear-trend forecasting (level+trend exponential smoothing)
# ---------------------------------------------------------------------------

_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3
_HOLT_HORIZON = 7


def _holt_forecast(pdf):
    """Holt's linear method over the daily series: l_t = a*y + (1-a)
    *(l+b); b_t = B*(l_t - l) + (1-B)*b.  Seeds: l_1 = y_1,
    b_1 = y_2 - y_1.  Emits one-step-ahead in-sample forecasts plus a
    7-day extrapolation.  Arithmetic written in the EXACT operation
    order of the oracle's recursive CTE (bit-identical doubles)."""
    import datetime

    import pandas as pd

    rows = pdf.sort_values("day").reset_index(drop=True)
    days = list(rows["day"])
    y = list(rows["y"])
    out = [(days[0], y[0], None)]
    level = y[0]
    trend = y[1] - y[0]
    for t in range(1, len(y)):
        fc = level + trend
        new_level = _HOLT_ALPHA * y[t] + (1.0 - _HOLT_ALPHA) * (level + trend)
        trend = _HOLT_BETA * (new_level - level) + (1.0 - _HOLT_BETA) * trend
        level = new_level
        out.append((days[t], y[t], round(fc, 4)))
    for h in range(1, _HOLT_HORIZON + 1):
        out.append(
            (days[-1] + datetime.timedelta(days=h), None, round(level + h * trend, 4))
        )
    return pd.DataFrame(out, columns=["day", "y", "forecast"])


@register(
    "holt_linear_forecast",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             round(sum(value), 4) AS y
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    ranked AS (
      SELECT day, y, CAST(row_number() OVER (ORDER BY day) AS INT) AS rn
      FROM daily
    ),
    hw AS (
      SELECT rn, day, y, CAST(NULL AS DOUBLE) AS fc,
             y AS l,
             (SELECT y FROM ranked WHERE rn = 2) - y AS b
      FROM ranked WHERE rn = 1
      UNION ALL
      SELECT r.rn, r.day, r.y,
             h.l + h.b AS fc,
             {_HOLT_ALPHA} * r.y + {1.0 - _HOLT_ALPHA} * (h.l + h.b) AS l,
             {_HOLT_BETA} * ({_HOLT_ALPHA} * r.y
                 + {1.0 - _HOLT_ALPHA} * (h.l + h.b) - h.l)
               + {1.0 - _HOLT_BETA} * h.b AS b
      FROM hw h JOIN ranked r ON r.rn = h.rn + 1
    ),
    last_state AS (
      SELECT day, l, b FROM hw ORDER BY rn DESC LIMIT 1
    ),
    future AS (
      SELECT ls.day + CAST(f.h AS INT) AS day,
             CAST(NULL AS DOUBLE) AS y,
             round(ls.l + f.h * ls.b, 4) AS forecast
      FROM last_state ls,
           (SELECT unnest(generate_series(1, {_HOLT_HORIZON})) AS h) f
    )
    SELECT day, y, round(fc, 4) AS forecast FROM hw
    UNION ALL
    SELECT day, y, forecast FROM future
    """,
    tags=("B15", "B16", "B23"),
    doc="Holt linear-trend forecasting over the daily revenue series: "
    "level+trend exponential smoothing (a=0.5, B=0.3) with one-step "
    "in-sample forecasts and a 7-day extrapolation.  The distributed "
    "shape is the scheduling-family pattern: the 100 TB event stream "
    "collapses to ~30 daily rows in ONE partial-aggregated groupBy "
    "(daily totals rounded BEFORE smoothing, the EWMA rule), then the "
    "inherently sequential recursion runs as a single grouped-map "
    "task over tiny state — never driver-side, never a window over "
    "raw data.  The oracle replays the recursion as a recursive CTE "
    "carrying (level, trend).",
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DIRTY-EVENTS CONTRACT: NULL-ts rows excluded — a NULL day would
    # otherwise enter the series (and crash the horizon extrapolation,
    # NaT + timedelta).
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("y"))
    return (
        daily.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(_holt_forecast, "day date, y double, forecast double")
    )


@register(
    "cuped_experiment_lift",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS t,
             round(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                            THEN value ELSE 0 END), 4) AS x,
             round(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                            THEN value ELSE 0 END), 4) AS y
      FROM events WHERE (value IS NULL OR abs(value) < 1e150)
      GROUP BY user_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             covar_pop(x, y) AS c, var_pop(x) AS vx, var_pop(y) AS vy,
             avg(CASE WHEN t = 1 THEN y END) AS my1,
             avg(CASE WHEN t = 0 THEN y END) AS my0,
             avg(CASE WHEN t = 1 THEN x END) AS mx1,
             avg(CASE WHEN t = 0 THEN x END) AS mx0
      FROM per_user
    )
    SELECT n_users,
           round(c / vx, 6) AS theta,
           round(my1 - my0, 6) AS diff_raw,
           round((my1 - my0) - (c / vx) * (mx1 - mx0), 6) AS diff_cuped,
           round(c * c / (vx * vy) * 100, 6) AS var_reduction_pct
    FROM s
    """,
    tags=("B20", "B16", "mining"),
    doc="CUPED experiment analysis (Deng et al. 2013, 'Improving the "
    "Sensitivity of Online Controlled Experiments'): pre-period "
    "per-user value (before Jan 16) is the covariate, post-period "
    "value the metric, user_id parity the assignment; "
    "theta = cov(x,y)/var(x), the adjusted treatment effect is "
    "diff_raw - theta*(mean_x1 - mean_x0), and the variance "
    "reduction is rho^2 = cov^2/(var_x*var_y) — all CLOSED FORM "
    "from one per-user aggregate plus one stats row, the deliberate "
    "contrast to a per-user adjusted-metric materialization: at "
    "100 TB the experiment readout costs one partial-aggregated "
    "groupBy and six numbers.  Per-user sums rounded (4dp) before "
    "the moment pass so both engines fold identical doubles.",
)
def cuped_experiment_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DIRTY-EVENTS CONTRACT (SQL_VALUE_FINITE_MOMENT): absorbing
    # magnitudes excluded before the covariance/variance pass.
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNull() | (F.abs("value") < 1e150)
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        F.round(
            F.sum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)), 4
        ).alias("x"),
        F.round(
            F.sum(F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)), 4
        ).alias("y"),
    ).withColumn("t", (F.col("user_id") % 2).cast("int"))
    s = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.covar_pop("x", "y").alias("c"),
        F.var_pop("x").alias("vx"),
        F.var_pop("y").alias("vy"),
        F.avg(F.when(F.col("t") == 1, F.col("y"))).alias("my1"),
        F.avg(F.when(F.col("t") == 0, F.col("y"))).alias("my0"),
        F.avg(F.when(F.col("t") == 1, F.col("x"))).alias("mx1"),
        F.avg(F.when(F.col("t") == 0, F.col("x"))).alias("mx0"),
    )
    theta = F.col("c") / F.col("vx")
    return s.select(
        "n_users",
        F.round(theta, 6).alias("theta"),
        F.round(F.col("my1") - F.col("my0"), 6).alias("diff_raw"),
        F.round(
            (F.col("my1") - F.col("my0")) - theta * (F.col("mx1") - F.col("mx0")),
            6,
        ).alias("diff_cuped"),
        F.round(
            F.col("c") * F.col("c") / (F.col("vx") * F.col("vy")) * 100, 6
        ).alias("var_reduction_pct"),
    )
