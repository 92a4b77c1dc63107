"""Python UDF surface (SURVEY.md §2 B23): vectorized pandas UDFs,
grouped-map applyInPandas, and cogrouped applyInPandas.

Rule: UDFs are the slow path — every query here exists to prove the
*mechanism* (Arrow batching, grouped semantics) and each one is
oracle-checked against a pure-SQL equivalent, demonstrating that the
UDF path computes exactly what the declarative path would.  In the
real engine you'd only reach for these when built-ins can't express
the logic (multimodal decode, model scoring).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from scache_spark.catalog import load_table
from scache_spark.registry import register


# ---------------------------------------------------------------------------
# scalar pandas UDF
# ---------------------------------------------------------------------------


def _make_charge_udf():
    # built lazily: pandas_udf resolves its return type against the
    # active SparkSession, so decorating at import time fails
    @pandas_udf("double")
    def _charge_udf(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        """Vectorized: whole Arrow batches, numpy arithmetic — never
        row-at-a-time Python."""
        return price * (1.0 - disc) * (1.0 + tax)

    return _charge_udf


@register(
    "udf_scalar_pandas",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS total_charge,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("B23",),
    doc="Scalar pandas UDF (Arrow-vectorized) computing the TPC-H "
    "charge expression; oracle is the pure-SQL equivalent — proving "
    "the UDF path is numerically identical to the declarative path.",
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    charge_udf = _make_charge_udf()
    return (
        li.withColumn(
            "charge", charge_udf("l_extendedprice", "l_discount", "l_tax")
        )
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("charge"), 2).alias("total_charge"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# grouped-map applyInPandas
# ---------------------------------------------------------------------------


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group standardization — the grouped-map shape (whole group
    as one pandas frame; group must fit in executor memory, so the
    grouping key must be bounded at 100 TB — here: 5 priorities)."""
    mu = pdf["o_totalprice"].mean()
    sd = pdf["o_totalprice"].std(ddof=1)
    out = pdf[["o_orderkey", "o_orderpriority"]].copy()
    # round(6): pandas pairwise summation vs DuckDB's sequential moment
    # accumulation differ at ~1e-12 relative — both sides round.
    out["z"] = ((pdf["o_totalprice"] - mu) / sd).round(6)
    return out


@register(
    "udf_grouped_zscore",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round((o_totalprice - avg(o_totalprice) OVER w)
             / stddev_samp(o_totalprice) OVER w, 6) AS z
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority)
    """,
    tags=("B23", "B11"),
    doc="applyInPandas grouped-map per-priority z-scores; oracle is the "
    "window-function equivalent.  (At scale prefer the window form — "
    "it streams; grouped-map materializes each group.)",
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").applyInPandas(
        _zscore_group, "o_orderkey long, o_orderpriority string, z double"
    )


# ---------------------------------------------------------------------------
# cogrouped applyInPandas
# ---------------------------------------------------------------------------


def _merge_ratio(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Cogroup shape: both sides of one key as pandas frames."""
    n_orders = len(left)
    n_lines = len(right)
    # round(2): pandas sums pairwise, DuckDB sequentially — ulp noise
    total = round(float(right["l_quantity"].sum()), 2) if n_lines else 0.0
    key = (
        left["o_custkey"].iloc[0]
        if n_orders
        else (right["cust_of_line"].iloc[0] if n_lines else None)
    )
    return pd.DataFrame(
        {
            "o_custkey": [key],
            "n_orders": [n_orders],
            "n_lines": [n_lines],
            "total_qty": [total],
        }
    )


@register(
    "udf_cogrouped_stats",
    oracle="""
    WITH ol AS (
      SELECT o_custkey, o_orderkey FROM orders
    ),
    li AS (
      SELECT o_custkey AS cust_of_line, l_quantity
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT coalesce(o.o_custkey, l.cust_of_line) AS o_custkey,
           CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(n_lines, 0) AS BIGINT) AS n_lines,
           coalesce(total_qty, 0.0) AS total_qty
    FROM (SELECT o_custkey, count(*) AS n_orders FROM ol GROUP BY 1) o
    FULL OUTER JOIN (SELECT cust_of_line, count(*) AS n_lines,
                            round(sum(l_quantity), 2) AS total_qty
                     FROM li GROUP BY 1) l
      ON o.o_custkey = l.cust_of_line
    """,
    tags=("B23",),
    doc="Cogrouped applyInPandas over (orders, lineitems) per customer; "
    "oracle is the equivalent full-outer aggregate join.",
)
def udf_cogrouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("cust_of_line"), "l_quantity")
    )
    return (
        o.groupBy("o_custkey")
        .cogroup(li.groupBy("cust_of_line"))
        .applyInPandas(
            _merge_ratio,
            "o_custkey long, n_orders long, n_lines long, total_qty double",
        )
    )
