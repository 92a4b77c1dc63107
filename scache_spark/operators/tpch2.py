"""TPC-H battery, part 2: the 11 query shapes (Q2, Q7, Q8, Q9, Q11,
Q12, Q13, Q15, Q19, Q20, Q21) not covered in `relational.py`,
completing the full 22-query TPC-H surface.

The driver's synthetic schema has no `partsupp`, no ship/commit/receipt
date triple, and no p_container/l_shipmode, so each query keeps its
STRUCTURAL signature — correlated min subquery (Q2), scalar-subquery
threshold (Q11, Q15), disjunctive pushdown (Q19), double EXISTS /
NOT-EXISTS (Q21), two-level aggregation over an outer join (Q13) —
with the missing columns replaced by documented stand-ins derived from
the tables that do exist (unit price from lineitem for supply cost,
`o_orderdate + INTERVAL` lateness for the commit/receipt gap).

Reference grounding: every one of these is a multi-join multi-shuffle
DAG of exactly the kind the reference pre-schedules reduce tasks for
(`MapOutputTracker.scala:219`, `sim/sim.py:223-263`); the broadcast
decisions below are the declarative analog of its block replication
push (`storage/BlockManager.scala:1164-1281`).

Float policy (cross-engine): money sums round to 2dp, unit costs and
averages to 4dp, shares/ratios to 6dp — in the Spark query AND the
DuckDB oracle, before any comparison or equality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scache_spark.catalog import load_table, widen_scan
from scache_spark.registry import register


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             round(min(l_extendedprice / l_quantity), 4) AS unit_cost
      FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2),
    eligible AS (
      SELECT pk, sk, unit_cost, s_acctbal, n_name
      FROM cost
      JOIN supplier ON sk = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'),
    best AS (SELECT pk, min(unit_cost) AS min_cost FROM eligible GROUP BY pk)
    SELECT p_partkey, p_brand, CAST(p_size AS INT) AS p_size,
           sk AS s_suppkey, round(s_acctbal, 2) AS s_acctbal,
           n_name, unit_cost AS min_cost
    FROM eligible
    JOIN best ON eligible.pk = best.pk AND unit_cost = min_cost
    JOIN part ON eligible.pk = p_partkey
    WHERE p_size <= 10 AND p_type = 'STANDARD'
    """,
    tags=("B4", "B5", "B7"),
    doc="TPC-H Q2 shape: for each small STANDARD part, the ASIA "
    "supplier quoting the minimum unit price (min over observed "
    "lineitem unit prices stands in for ps_supplycost; ties kept, as "
    "in the real Q2).  The correlated MIN subquery becomes a partial "
    "aggregate re-joined on (part, 4dp-rounded cost) — exact equality "
    "is safe because both sides compare the SAME rounded per-group "
    "min, never a re-summed float.  supplier⋈nation⋈region prune "
    "before the big aggregate; part is filter-pruned, its join "
    "strategy left to AQE (supplier/part grow with SF — no hard "
    "broadcast hints).",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unit cost is undefined for a non-positive quantity (dirty-orders
    # contract: qty=0 is an ANSI divide-by-zero in Spark, inf in
    # DuckDB — neither is a price)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    cost = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(
        F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias(
            "unit_cost"
        )
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(
                    F.col("r_name") == "ASIA"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_acctbal", "n_name")
    )
    eligible = cost.join(
        s, F.col("sk") == F.col("s_suppkey")
    ).select("pk", "sk", "unit_cost", "s_acctbal", "n_name")
    best = eligible.groupBy(F.col("pk").alias("bpk")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    )
    return (
        eligible.join(
            best,
            (F.col("pk") == F.col("bpk"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(p, F.col("pk") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_brand",
            F.col("p_size").cast("int").alias("p_size"),
            F.col("sk").alias("s_suppkey"),
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "n_name",
            "min_cost",
        )
    )


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
        AND n2.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
        AND n1.n_name <> n2.n_name
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31')
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("B4", "B5", "B7", "B15"),
    doc="TPC-H Q7 shape: bilateral shipping volume between a set of "
    "nations by year (a 4-nation set instead of one ordered pair so "
    "the result is non-empty at every test SF).  The two nation "
    "bounded nation dimensions broadcast with their IN-filters "
    "applied, pruning supplier and customer BEFORE the two big shuffle joins "
    "(lineitem⋈orders on orderkey, orders⋈customer on custkey); the "
    "shipdate range is pushed into the parquet scan.",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = ["NATION_0", "NATION_1", "NATION_2", "NATION_3"]
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(nations))
    n1 = n.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("snk")
    )
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("cnk")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume
                          ELSE 0 END) / sum(volume), 6) AS mkt_share,
           round(sum(volume), 2) AS total_volume
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                            AND TIMESTAMP '1997-12-31')
    GROUP BY o_year
    """,
    tags=("B4", "B5", "B7", "B19"),
    doc="TPC-H Q8 shape: one nation's market share of ECONOMY-part "
    "revenue sold into ASIA customers, by order year.  The share is a "
    "conditional-sum / total-sum in ONE aggregation pass (no second "
    "scan, no self-join).  Both nation roles and region broadcast "
    "(bounded dims); part is type-filtered with its join left to AQE "
    "(SF-proportional).  Ratio rounds to 6dp on both engines.",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(
                    F.col("r_name") == "ASIA"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cnk"))
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("snk"), F.col("n_name").alias("nation")
        )
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer").join(
        n1, F.col("c_nationkey") == F.col("cnk")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        n2, F.col("s_nationkey") == F.col("snk")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        load_table(spark, sf_dir, "lineitem")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
    )


@register(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.5 * p_retailprice * l_quantity AS amount
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%')
    GROUP BY nation, o_year
    """,
    tags=("B4", "B5", "B7", "B14"),
    doc="TPC-H Q9 shape: profit on '%gear%' parts by supplier nation "
    "and order year.  ps_supplycost does not exist in this schema, so "
    "cost is the documented stand-in 0.5 * p_retailprice * quantity — "
    "the arithmetic shape (revenue minus quantity-scaled cost inside "
    "a 5-way join) is identical.  The LIKE filter prunes part at the "
    "scan; nation broadcasts (bounded); part/supplier join strategy "
    "is AQE's — they grow with SF.",
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(load_table(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        load_table(spark, sf_dir, "lineitem")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 4).alias("sum_profit"))
    )


@register(
    "tpch_q11_important_parts",
    oracle="""
    WITH v AS (
      SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1','NATION_2','NATION_3')
      GROUP BY l_partkey)
    SELECT l_partkey, val
    FROM v
    WHERE val > (SELECT round(sum(val) * 0.001, 2) FROM v)
    """,
    tags=("B4", "B5", "B7"),
    doc="TPC-H Q11 shape: parts whose inventory value from a nation "
    "group exceeds a global-fraction threshold.  The scalar subquery "
    "becomes a 1-row aggregate CROSS-broadcast against the per-part "
    "values — computed as an UNPARTITIONED window sum over the "
    "already-aggregated per-part frame, so the fact table is scanned "
    "exactly once (a crossJoin-of-aggregate would re-execute the "
    "whole aggregation subtree: two 100 TB scans for one scalar).  "
    "The single-partition window is safe because it runs on the "
    "per-part frame, whose size is |parts|, not |lineitem|.  Both "
    "the per-part value and the threshold are 2dp-rounded on both "
    "engines before the strict > compare, so the cut is identical.",
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    v = (
        load_table(spark, sf_dir, "lineitem")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2
            ).alias("val")
        )
    )
    # Scalar threshold as a 1-row aggregate broadcast back — NOT a
    # Window.partitionBy() over the per-partkey frame, which is
    # SF-proportional and would single-partition at 100 TB.  Both
    # branches hang off the same groupBy exchange, so ReuseExchange
    # scans lineitem once.
    tot = v.agg(F.round(F.sum("val") * 0.001, 2).alias("thr"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("val") > F.col("thr"))
        .select("l_partkey", "val")
    )


@register(
    "tpch_q12_late_shipping_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_returnflag
    """,
    tags=("B4", "B7", "B15", "B19"),
    doc="TPC-H Q12 shape: of lines shipped >90 days after their order "
    "date (the commit/receipt-date lateness stand-in), how many came "
    "from high- vs low-priority orders, per return flag (the shipmode "
    "stand-in).  The lateness predicate is a cross-table comparison, "
    "so it evaluates post-join — the join itself shuffles on orderkey "
    "with only 3 columns per side; the conditional counts are one "
    "map-side-combinable aggregation.",
)
def tpch_q12_late_shipping_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
    tags=("B4", "B7", "B19"),
    doc="TPC-H Q13 shape: the distribution of per-customer order "
    "counts, excluding one priority class INSIDE the outer-join "
    "condition (not a post-filter — customers whose only orders are "
    "excluded must still appear with count 0).  Two-level "
    "aggregation: the first groupBy shuffles on custkey (same key as "
    "the join, so AQE coalesces), the second reduces the tiny "
    "(c_count, n) histogram.",
)
def tpch_q13_customer_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    tags=("B4", "B5", "B7", "B10"),
    doc="TPC-H Q15 shape: the supplier(s) with maximum Q1-1996 "
    "revenue.  The view + scalar MAX subquery becomes: one revenue "
    "aggregate (2dp-rounded), an unpartitioned window max over that "
    "tiny per-supplier frame (NOT a crossJoin-of-aggregate, which "
    "would scan lineitem twice), and an equality filter — ties all "
    "survive, exactly like the SQL.  "
    "Comparing 2dp-rounded doubles for equality is safe because both "
    "engines round the same per-group sums; the winner set is tiny, "
    "so AQE broadcasts IT (not SF-growing supplier) at runtime.",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    # Scalar max as a 1-row broadcast aggregate (the per-supplier frame
    # is SF-proportional — a global window over it would single-
    # partition at scale); ReuseExchange shares the groupBy shuffle.
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(
            load_table(spark, sf_dir, "supplier").select(
                "s_suppkey", "s_name"
            ),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("B3", "B4", "B5", "B19"),
    doc="TPC-H Q19 shape: revenue under a 3-branch disjunction that "
    "mixes part predicates with lineitem predicates (container and "
    "shipmode clauses replaced by size/quantity ranges present in "
    "this schema).  Catalyst extracts the common part of the "
    "disjunction: the brand IN-set prunes part to 3 brands at the "
    "scan (join strategy AQE-chosen — part grows with SF), and the "
    "per-branch quantity ranges evaluate post-join "
    "in one codegen stage — no union-of-three-scans.",
)
def tpch_q19_disjunctive_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#13", "Brand#14")
    )
    qty = F.col("l_quantity")
    size = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & size.between(1, 5) & qty.between(1, 11))
        | (
            (F.col("p_brand") == "Brand#13")
            & size.between(1, 10)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & size.between(1, 15)
            & qty.between(20, 30)
        )
    )
    return (
        load_table(spark, sf_dir, "lineitem")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


@register(
    "tpch_q20_potential_promotion",
    oracle="""
    WITH qty AS (
      SELECT l_partkey, l_suppkey, round(sum(l_quantity), 2) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY 1, 2),
    sel AS (
      SELECT DISTINCT l_suppkey AS sk
      FROM qty JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%gear%' AND q > 50)
    SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (SELECT sk FROM sel)
    """,
    tags=("B4", "B5", "B6", "B7"),
    doc="TPC-H Q20 shape: suppliers who moved real volume (>50 units "
    "in 1996) of '%gear%' parts — the nested IN(IN(...)) chain.  The "
    "partsupp-availqty test becomes shipped-quantity-per-(part, "
    "supplier); the inner IN is an equi join against the "
    "name-filtered part (AQE-broadcast at fixture scale), the outer "
    "IN a LEFT SEMI join into supplier, "
    "so no duplicate suppliers and no distinct-shuffle of the big "
    "side.  Quantity sums are integers in doubles — exact — and "
    "rounded anyway by policy.",
)
def tpch_q20_potential_promotion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    qty = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey")
    )
    sel = (
        qty.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("q") > 50)
        .select(F.col("l_suppkey").alias("sk"))
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(sel, F.col("s_suppkey") == F.col("sk"), "left_semi")
        .select(
            "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal")
        )
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH ln AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'),
    st AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS ns,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nl
      FROM ln GROUP BY l_orderkey)
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM ln
    JOIN st USING (l_orderkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE late AND ns > 1 AND nl = 1
    GROUP BY s_name
    """,
    tags=("B4", "B6", "B7"),
    doc="TPC-H Q21 shape: suppliers who were the SOLE late shipper on "
    "finished multi-supplier orders (lateness = shipped >60 days "
    "after order date, the receipt/commit stand-in).  The classic "
    "EXISTS / NOT-EXISTS pair is rewritten as one per-order "
    "aggregate — distinct suppliers vs distinct LATE suppliers — "
    "and (r9) the join-back is folded into the SAME aggregate: when "
    "nl = 1 every late line of the order belongs to the one late "
    "supplier, so max(late supplier) + count(late lines) identify "
    "the waiting supplier and its line contribution without "
    "re-reading lineitem.  ONE pass over the fact table, one "
    "orderkey shuffle, then supplier-sized aggregates; semantically "
    "exact, not an approximation.  The supplier name join runs on "
    "the tiny survivor set (AQE picks the build side).",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    # widen_scan: local single-row-group fixture only (no-op at scale)
    ln = (
        widen_scan(
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_suppkey", "l_shipdate"
            ),
            "l_orderkey",
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("late"),
        )
    )
    # Two-level aggregate instead of two count_distincts: the DISTINCT
    # rewrite plans an Expand that (a) triples the shuffled rows at
    # scale and (b) reports UnknownPartitioning, forcing a fresh
    # exchange even over pre-partitioned input.  Level 1 collapses to
    # one row per (order, supplier); level 2 is satisfied by any
    # clustering on l_orderkey, so locally it rides the widen exchange
    # with no further shuffle.
    per_os = ln.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("any_late"),
        F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("n_late_sup"),
    )
    st = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("ns"),
        F.sum(F.when(F.col("any_late"), 1).otherwise(0)).alias("nl"),
        F.sum("n_late_sup").alias("n_late_lines"),
        F.max(F.when(F.col("any_late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    per_supp = (
        st.filter((F.col("ns") > 1) & (F.col("nl") == 1))
        .groupBy("late_supp")
        .agg(F.sum("n_late_lines").alias("w"))
    )
    return (
        per_supp.join(
            load_table(spark, sf_dir, "supplier").select(
                "s_suppkey", "s_name"
            ),
            F.col("late_supp") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.sum("w").cast("long").alias("numwait"))
    )
