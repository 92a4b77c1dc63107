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


# ---------------------------------------------------------------------------
# histogram-based join-size estimation (planner-side shuffle prediction)
# ---------------------------------------------------------------------------


@register(
    "join_size_histogram_estimate",
    oracle="""
    WITH o AS (
      SELECT o_custkey % 16 AS bucket, o_custkey AS k, count(*) AS c
      FROM orders GROUP BY 1, 2
    ),
    e AS (
      SELECT user_id % 16 AS bucket, user_id AS k, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    exact AS (
      SELECT o.bucket, CAST(sum(o.c * e.c) AS BIGINT) AS exact_rows
      FROM o JOIN e ON o.k = e.k GROUP BY o.bucket
    ),
    hist AS (
      SELECT ob.bucket, CAST(ob.tot * eb.tot AS BIGINT) AS est_rows
      FROM (SELECT bucket, sum(c) AS tot FROM o GROUP BY bucket) ob
      JOIN (SELECT bucket, sum(c) AS tot FROM e GROUP BY bucket) eb
        ON ob.bucket = eb.bucket
    )
    SELECT h.bucket,
           coalesce(x.exact_rows, 0) AS exact_rows,
           h.est_rows,
           round(CAST(h.est_rows AS DOUBLE)
                 / greatest(coalesce(x.exact_rows, 0), 1), 4) AS inflation
    FROM hist h LEFT JOIN exact x ON h.bucket = x.bucket
    """,
    tags=("B26", "A.5", "B7"),
    doc="Join-cardinality estimation from per-bucket key histograms vs "
    "the exact per-key product-sum, per 16-way key bucket — the "
    "SQL-level analog of the reference's pre-execution reduce-size "
    "prediction (MapStatus per-reducer size arrays, "
    "scheduler/MapStatus.scala:45-82; predict_with_sample, "
    "sim/train.py:34-60): estimate a shuffle join's output before "
    "running it.  At 100 TB the per-key count frames are map-side "
    "combined, the 16-row histograms are driver-broadcastable, and "
    "the inflation column quantifies exactly how much collision "
    "error a coarser histogram buys; everything is integer-exact.",
)
def join_size_histogram_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scache_spark.catalog import load_table

    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (F.col("o_custkey") % 16).alias("bucket"),
            F.col("o_custkey").alias("k"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    e = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            (F.col("user_id") % 16).alias("bucket"), F.col("user_id").alias("k")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = (
        o.alias("o")
        .join(e.alias("e"), F.col("o.k") == F.col("e.k"))
        .groupBy(F.col("o.bucket").alias("bucket"))
        .agg(F.sum(F.col("o.c") * F.col("e.c")).cast("long").alias("exact_rows"))
    )
    ob = o.groupBy("bucket").agg(F.sum("c").alias("tot_o"))
    eb = e.groupBy("bucket").agg(F.sum("c").alias("tot_e"))
    hist = ob.join(eb, "bucket").select(
        "bucket", (F.col("tot_o") * F.col("tot_e")).cast("long").alias("est_rows")
    )
    return hist.join(exact, "bucket", "left").select(
        "bucket",
        F.coalesce("exact_rows", F.lit(0)).alias("exact_rows"),
        "est_rows",
        F.round(
            F.col("est_rows").cast("double")
            / F.greatest(F.coalesce("exact_rows", F.lit(0)), F.lit(1)),
            4,
        ).alias("inflation"),
    )


@register(
    "size_regression_theil_sen",
    oracle=f"""
    WITH blocks AS ({_BLOCK_VIEW_SQL}),
    per_block AS (
      SELECT shuffle, map, reduce, CAST(sum(size) AS BIGINT) AS sz
      FROM blocks GROUP BY shuffle, map, reduce
    ),
    slopes AS (
      SELECT a.shuffle,
             CAST(b.sz - a.sz AS DOUBLE) / (b.reduce - a.reduce) AS sl
      FROM per_block a JOIN per_block b
        ON a.shuffle = b.shuffle AND a.reduce < b.reduce
    ),
    med AS (
      SELECT shuffle,
             quantile_cont(sl, 0.5) AS slope,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM slopes GROUP BY shuffle
    )
    SELECT p.shuffle,
           round(m.slope, 4) AS slope,
           round(quantile_cont(p.sz - m.slope * p.reduce, 0.5), 4)
             AS intercept,
           m.n_pairs
    FROM per_block p JOIN med m ON p.shuffle = m.shuffle
    GROUP BY p.shuffle, m.slope, m.n_pairs
    """,
    tags=("B26", "A.5", "B20"),
    doc="Theil-Sen ROBUST size predictor — the outlier-resistant "
    "upgrade of size_regression_fit's OLS (one straggler map's "
    "corrupt size estimate skews an OLS fit; the median of pairwise "
    "slopes shrugs it off, which is exactly the failure mode of the "
    "reference's first-wave training data, sim/train.py:237-243).  "
    "The pair space is bounded per shuffle (points are the R-per-map "
    "aggregate, never raw blocks), the median is the interpolated "
    "percentile both engines compute identically "
    "(percentile_battery's proven contract), and the intercept is "
    "the median residual at the fitted slope.",
)
def size_regression_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (shuffle, map, reduce) cells feed both slope-pair sides AND the
    # intercept pass — checkpoint so the fact scan runs once.
    per_block = (
        block_view(spark, sf_dir)
        .groupBy("shuffle", "map", "reduce")
        .agg(F.sum("size").alias("sz"))
        .localCheckpoint(eager=True)
    )
    a = per_block.select(
        "shuffle", F.col("reduce").alias("ra"), F.col("sz").alias("sa")
    )
    b = per_block.select(
        F.col("shuffle").alias("shuffle_b"),
        F.col("reduce").alias("rb"),
        F.col("sz").alias("sb"),
    )
    slopes = a.join(
        b, (F.col("shuffle") == F.col("shuffle_b")) & (F.col("ra") < F.col("rb"))
    ).select(
        "shuffle",
        ((F.col("sb") - F.col("sa")).cast("double") / (F.col("rb") - F.col("ra"))).alias(
            "sl"
        ),
    )
    med = slopes.groupBy("shuffle").agg(
        F.percentile("sl", 0.5).alias("slope"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    return (
        per_block.join(med, "shuffle")
        .groupBy("shuffle", "slope", "n_pairs")
        .agg(
            F.round(
                F.percentile(F.col("sz") - F.col("slope") * F.col("reduce"), 0.5), 4
            ).alias("intercept")
        )
        .select(
            "shuffle",
            F.round("slope", 4).alias("slope"),
            "intercept",
            "n_pairs",
        )
    )


@register(
    "size_prediction_conformal",
    oracle=f"""
    WITH blocks AS ({_BLOCK_VIEW_SQL}),
    per_block AS (
      SELECT shuffle, map, reduce, CAST(sum(size) AS BIGINT) AS sz
      FROM blocks GROUP BY shuffle, map, reduce
    ),
    fit AS (
      SELECT shuffle,
             regr_slope(sz, reduce) AS slope,
             regr_intercept(sz, reduce) AS intercept
      FROM per_block WHERE map < 4 GROUP BY shuffle
    ),
    calib AS (
      SELECT p.shuffle,
             quantile_cont(abs(p.sz - (f.slope * p.reduce + f.intercept)), 0.9)
               AS q90
      FROM per_block p JOIN fit f ON p.shuffle = f.shuffle
      WHERE p.map IN (4, 5)
      GROUP BY p.shuffle
    )
    SELECT p.shuffle,
           CAST(count(*) AS BIGINT) AS n_test,
           round(c.q90, 4) AS interval_halfwidth,
           round(avg(CASE WHEN abs(p.sz - (f.slope * p.reduce + f.intercept))
                          <= c.q90 THEN 1.0 ELSE 0.0 END), 4) AS coverage
    FROM per_block p
    JOIN fit f ON p.shuffle = f.shuffle
    JOIN calib c ON p.shuffle = c.shuffle
    WHERE p.map >= 6
    GROUP BY p.shuffle, c.q90
    """,
    tags=("B26", "A.5", "B20"),
    doc="Split-conformal prediction intervals for the shuffle-size "
    "predictor: fit on the first wave (map < 4), take the 90th "
    "percentile of |residual| on a held-out calibration wave "
    "(map 4-5) as the interval half-width, then measure empirical "
    "coverage on the remaining maps — distribution-free uncertainty "
    "for the reference's point predictor (sim/train.py:237-270 "
    "scores error; a pre-scheduler acting on predictions needs the "
    "WIDTH too, e.g. to over-provision the swap budget).  Three "
    "small aggregates over the same per-block frame; the percentile "
    "is the proven interpolated contract.",
)
def size_prediction_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_block = (
        block_view(spark, sf_dir)
        .groupBy("shuffle", "map", "reduce")
        .agg(F.sum("size").alias("sz"))
        .localCheckpoint(eager=True)
    )
    fit = (
        per_block.filter(F.col("map") < 4)
        .groupBy("shuffle")
        .agg(
            F.regr_slope("sz", "reduce").alias("slope"),
            F.regr_intercept("sz", "reduce").alias("intercept"),
        )
    )
    pred = F.col("slope") * F.col("reduce") + F.col("intercept")
    calib = (
        per_block.filter(F.col("map").isin(4, 5))
        .join(F.broadcast(fit), "shuffle")
        .groupBy("shuffle")
        .agg(F.percentile(F.abs(F.col("sz") - pred), 0.9).alias("q90"))
    )
    test = (
        per_block.filter(F.col("map") >= 6)
        .join(F.broadcast(fit), "shuffle")
        .join(F.broadcast(calib), "shuffle")
    )
    covered = F.when(F.abs(F.col("sz") - pred) <= F.col("q90"), 1.0).otherwise(0.0)
    return test.groupBy("shuffle", "q90").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.round(F.avg(covered), 4).alias("coverage"),
    ).select(
        "shuffle",
        "n_test",
        F.round("q90", 4).alias("interval_halfwidth"),
        "coverage",
    )


_CAL_BINS = 10


@register(
    "size_prediction_calibration",
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
    ),
    scored AS (
      SELECT t.shuffle,
             round(f.slope * t.reduce + f.intercept, 4) AS pred,
             t.sz AS actual
      FROM test t JOIN fit f ON t.shuffle = f.shuffle
    ),
    rng AS (
      SELECT shuffle, min(pred) AS mn, max(pred) AS mx
      FROM scored GROUP BY shuffle
    ),
    binned AS (
      SELECT s.shuffle,
             CAST(least(floor((s.pred - r.mn)
                              / ((r.mx - r.mn) / {_CAL_BINS}.0)),
                        {_CAL_BINS - 1}) AS INT) AS bin,
             s.pred, s.actual
      FROM scored s JOIN rng r ON s.shuffle = r.shuffle
    ),
    per_bin AS (
      SELECT shuffle, bin, count(*) AS n,
             avg(pred) AS mp, avg(actual) AS ma
      FROM binned GROUP BY shuffle, bin
    )
    SELECT shuffle,
           CAST(count(*) AS BIGINT) AS n_bins_used,
           round(sum(n * abs(mp - ma)) / sum(n), 4) AS ece,
           round(max(abs(mp - ma)), 4) AS worst_bin_gap
    FROM per_bin GROUP BY shuffle
    """,
    tags=("B26", "A.5", "B20"),
    doc="Calibration audit of the size predictor (expected calibration "
    f"error): first-wave-trained predictions bin into {_CAL_BINS} "
    "equal-width buckets of predicted size (broadcast per-shuffle "
    "min/max — no sort, no quantile pass), each bin compares mean "
    "predicted vs mean actual bytes, and ECE is the count-weighted "
    "mean absolute gap — the 'can the scheduler TRUST the magnitude' "
    "complement to size_prediction_error's relative error and the "
    "conformal intervals' coverage.  Predictions rounded to 4dp "
    "before binning so both engines bucket identical doubles.  All "
    "aggregates partial-combine; per-shuffle state is 10 bins.",
)
def size_prediction_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    # scored feeds both the range pass and the binning pass —
    # materialize once instead of recomputing the block aggregation +
    # fit join per branch (plan lint: 9 exchanges without, 4 with)
    scored = (
        test.join(F.broadcast(fit), "shuffle")
        .select(
            "shuffle",
            F.round(
                F.col("slope") * F.col("reduce") + F.col("intercept"), 4
            ).alias("pred"),
            F.col("sz").alias("actual"),
        )
        .localCheckpoint(eager=True)
    )
    rng = scored.groupBy("shuffle").agg(
        F.min("pred").alias("mn"), F.max("pred").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / float(_CAL_BINS)
    binned = scored.join(F.broadcast(rng), "shuffle").select(
        "shuffle",
        F.least(
            F.floor((F.col("pred") - F.col("mn")) / width),
            F.lit(_CAL_BINS - 1),
        )
        .cast("int")
        .alias("bin"),
        "pred",
        "actual",
    )
    per_bin = binned.groupBy("shuffle", "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("pred").alias("mp"),
        F.avg("actual").alias("ma"),
    )
    gap = F.abs(F.col("mp") - F.col("ma"))
    return per_bin.groupBy("shuffle").agg(
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
        F.round(F.sum(F.col("n") * gap) / F.sum("n"), 4).alias("ece"),
        F.round(F.max(gap), 4).alias("worst_bin_gap"),
    )
