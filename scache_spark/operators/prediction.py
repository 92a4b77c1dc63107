"""Shuffle-size prediction (SURVEY.md §2 B26, A.5).

The reference trains sklearn LinearRegression over first-wave map
outputs to predict remaining reducer sizes (`sim/train.py:11-29`,
`predict_with_sample` `sim/train.py:34-60`).  Here the same
least-squares fit is a *declarative aggregate* (regr_slope /
regr_intercept — closed-form OLS computed distributed, one pass,
map-side combined), which scales to 100 TB with a single tiny shuffle
instead of collecting training data to a driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scache_spark.operators.blocks import _BLOCK_VIEW_SQL, block_view
from scache_spark.registry import register


@register(
    "size_regression_fit",
    oracle=f"""
    WITH blocks AS ({_BLOCK_VIEW_SQL}),
    per_block AS (
      SELECT shuffle, map, reduce, CAST(sum(size) AS BIGINT) AS sz
      FROM blocks GROUP BY shuffle, map, reduce
    )
    SELECT shuffle,
           round(regr_slope(sz, reduce), 4) AS slope,
           round(regr_intercept(sz, reduce), 4) AS intercept,
           CAST(count(*) AS BIGINT) AS n_obs
    FROM per_block GROUP BY shuffle
    """,
    tags=("B26", "A.5"),
    doc="Per-shuffle OLS fit of block size vs reduce id — the "
    "distributed closed form of sim/train.py:11-29's "
    "LinearRegression.fit.",
)
def size_regression_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_block = (
        block_view(spark, sf_dir)
        .groupBy("shuffle", "map", "reduce")
        .agg(F.sum("size").alias("sz"))
    )
    # round(4): regression moments accumulate in engine-specific order
    return per_block.groupBy("shuffle").agg(
        F.round(F.regr_slope("sz", "reduce"), 4).alias("slope"),
        F.round(F.regr_intercept("sz", "reduce"), 4).alias("intercept"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    )


@register(
    "size_prediction_error",
    oracle=f"""
    WITH blocks AS ({_BLOCK_VIEW_SQL}),
    per_block AS (
      SELECT shuffle, map, reduce, CAST(sum(size) AS BIGINT) AS sz
      FROM blocks GROUP BY shuffle, map, reduce
    ),
    train AS (SELECT * FROM per_block WHERE map < 4),
    test  AS (SELECT * FROM per_block WHERE map >= 4),
    fit AS (
      SELECT shuffle,
             regr_slope(sz, reduce) AS slope,
             regr_intercept(sz, reduce) AS intercept
      FROM train GROUP BY shuffle
    )
    SELECT t.shuffle,
           round(avg(abs((f.slope * t.reduce + f.intercept) - t.sz) / t.sz), 6)
               AS avg_norm_error,
           CAST(count(*) AS BIGINT) AS n_test
    FROM test t JOIN fit f ON t.shuffle = f.shuffle
    GROUP BY t.shuffle
    """,
    tags=("B26", "A.5"),
    doc="Train on the 'first wave' (map < 4), predict the rest, score "
    "normalized |pred−actual|/actual — the reference's evaluation "
    "metric (sim/train.py:237-270).",
)
def size_prediction_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_block = (
        block_view(spark, sf_dir)
        .groupBy("shuffle", "map", "reduce")
        .agg(F.sum("size").alias("sz"))
    )
    train = per_block.filter(F.col("map") < 4)
    test = per_block.filter(F.col("map") >= 4)
    fit = train.groupBy("shuffle").agg(
        F.regr_slope("sz", "reduce").alias("slope"),
        F.regr_intercept("sz", "reduce").alias("intercept"),
    )
    pred = F.col("slope") * F.col("reduce") + F.col("intercept")
    return (
        test.join(F.broadcast(fit), "shuffle")
        .groupBy(test.shuffle)
        .agg(
            F.round(F.avg(F.abs(pred - F.col("sz")) / F.col("sz")), 6).alias(
                "avg_norm_error"
            ),
            F.count(F.lit(1)).cast("long").alias("n_test"),
        )
    )


@register(
    "expected_reduce_size",
    oracle=f"""
    WITH blocks AS ({_BLOCK_VIEW_SQL})
    SELECT reduce,
           sum(size * (1.0 / 8.0)) AS expected_size,
           CAST(max(size * 8 + map) % 8 AS INT) AS argmax_map
    FROM blocks GROUP BY reduce
    """,
    tags=("B26", "A.5"),
    doc="predict_with_sample analog (sim/train.py:34-60): expected "
    "per-reduce size Σ prob·size with uniform map probability, plus "
    "argmax-contribution map selection.  The argmax is encoded as "
    "max(size*8+map)%8 — a total order, so size ties break "
    "identically in both engines (max_by/arg_max tie-breaks don't).",
)
def expected_reduce_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = block_view(spark, sf_dir)
    return b.groupBy("reduce").agg(
        F.sum(F.col("size") * (1.0 / 8.0)).alias("expected_size"),
        (F.max(F.col("size") * 8 + F.col("map")) % 8).cast("int").alias("argmax_map"),
    )
