"""Scalar function surface: strings, dates, math, arrays, JSON,
conditionals, stats & sampling (SURVEY.md §2 B14-B20).

All expressions are built-in `pyspark.sql.functions` — JVM-side,
inside whole-stage codegen.  Reference grounding: the reference's only
"expressions" are block-id regex parsing (storage/BlockId.scala:98-131),
log₁.₁ size compression (scheduler/MapStatus.scala:62-81) and trace
timestamp munging (sim/util.py:30-44); each battery below covers the
general family those instances belong to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scache_spark.catalog import load_table
from scache_spark.functions import (
    SQL_MOMENT_READY,
    SQL_VECTOR_READY,
    bounded_window,
    vector_ready,
)
from scache_spark.functions import kll_fold_double
from scache_spark.registry import register

# ---------------------------------------------------------------------------
# B14 — strings (incl. the BlockId-style regex parse)
# ---------------------------------------------------------------------------


@register(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_up,
           lower(p_type) AS type_lo,
           substr(p_name, 1, 8) AS name_prefix,
           CAST(length(p_name) AS INT) AS name_len,
           concat(p_brand, '#', CAST(p_size AS VARCHAR)) AS brand_size,
           regexp_extract(p_brand, '([A-Za-z]+)#?([0-9]+)', 2) AS brand_num,
           replace(p_type, ' ', '_') AS type_slug,
           CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS is_brass,
           trim(p_name) AS name_trim
    FROM part
    """,
    tags=("B14",),
    doc="String battery; regexp_extract mirrors BlockId.scala:98-131 parsing.",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_type").alias("type_lo"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.regexp_extract("p_brand", r"([A-Za-z]+)#?([0-9]+)", 2).alias("brand_num"),
        F.regexp_replace("p_type", " ", "_").alias("type_slug"),
        F.when(F.col("p_type").like("%BRASS%"), 1).otherwise(0).alias("is_brass"),
        F.trim(F.col("p_name")).alias("name_trim"),
    )


@register(
    "string_split_parse",
    oracle="""
    SELECT o_orderkey,
           string_split(o_orderpriority, '-')[1] AS prio_code,
           string_split(o_orderpriority, '-')[2] AS prio_name,
           CAST(len(string_split(o_orderpriority, '-')) AS INT) AS n_parts
    FROM orders
    """,
    tags=("B14",),
    doc="split + element access (ShuffleKey.fromString done right — the "
    "reference's version mis-parses, util/ShuffleKey.scala:8-14).  "
    "Out-of-bounds access is NULL, not an error (dirty-orders "
    "contract): a malformed single-token priority has no second "
    "element — F.get() gives the tolerate-and-NULL semantics DuckDB's "
    "list index has natively, where getItem() raises under ANSI.",
)
def string_split_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    parts = F.split(F.col("o_orderpriority"), "-")
    return o.select(
        "o_orderkey",
        F.get(parts, 0).alias("prio_code"),
        F.get(parts, 1).alias("prio_name"),
        F.size(parts).cast("int").alias("n_parts"),
    )


# ---------------------------------------------------------------------------
# B15 — date/time
# ---------------------------------------------------------------------------


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT)
               AS days_since_95
    FROM orders
    WHERE o_orderdate < TIMESTAMP '1996-01-01'
    """,
    tags=("B15",),
    doc="Calendar decomposition + truncation + epoch arithmetic.",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    )
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
    )


@register(
    "date_bucket_agg",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY 1
    """,
    tags=("B15", "B7"),
    doc="Time-bucketed aggregation — the batch twin of B27 windows.",
)
def date_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("ship_month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


# ---------------------------------------------------------------------------
# B16 — math (incl. MapStatus log₁.₁ size compression)
# ---------------------------------------------------------------------------


@register(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_extendedprice > 0
                THEN round(ln(l_extendedprice), 6) END AS ln_price,
           CAST(ceil(ln(greatest(l_extendedprice, 1.0)) / ln(1.1)) AS INT)
               AS size_compressed,
           round(power(l_discount, 2), 10) AS disc_sq,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           round(l_extendedprice, 1) AS price_round,
           abs(l_discount - 0.05) AS disc_dev,
           CASE WHEN l_quantity >= 0 THEN sqrt(l_quantity) END AS qty_sqrt
    FROM lineitem
    """,
    tags=("B16",),
    doc="Math battery; size_compressed is exactly the reference's 1-byte "
    "MapStatus encoding ⌈log₁.₁ size⌉ (scheduler/MapStatus.scala:62-81).  "
    "Domain guards (dirty-orders contract, SCALE.md §17): ln and sqrt "
    "map out-of-domain inputs to NULL on BOTH sides — Spark's log() "
    "already NULLs non-positive input and sqrt() returns NaN, while "
    "DuckDB raises Out of Range on both; the explicit CASE/when makes "
    "the NULL contract engine-independent.",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round(6): libm vs JVM ln differ in the last ulp per row, and
        # at 10dp an ulp can straddle the rounding boundary (seen at
        # sf0.01); 6dp puts the boundary ~9 orders beyond ulp noise
        F.when(
            F.col("l_extendedprice") > 0,
            F.round(F.log(F.col("l_extendedprice")), 6),
        ).alias("ln_price"),
        F.ceil(
            F.log(F.greatest(F.col("l_extendedprice"), F.lit(1.0))) / F.log(F.lit(1.1))
        )
        .cast("int")
        .alias("size_compressed"),
        # round(10): pow() is not guaranteed correctly rounded — engines
        # may differ in the last ulp even for integral exponents
        F.round(F.pow(F.col("l_discount"), 2), 10).alias("disc_sq"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.round(F.col("l_extendedprice"), 1).alias("price_round"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.when(F.col("l_quantity") >= 0, F.sqrt("l_quantity")).alias(
            "qty_sqrt"
        ),
    )


# ---------------------------------------------------------------------------
# B17 — arrays (embeddings)
# ---------------------------------------------------------------------------


@register(
    "array_funcs",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           embedding[1] AS first_comp,
           array_to_string([CAST(least(greatest(round(CAST(x AS DOUBLE)
                                 * 10000), -2147483648.0), 2147483647.0)
                                 AS INT)
                            for x in embedding[1:4]], ',') AS head4,
           round(list_aggregate([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
                           for i in range(1, len(embedding) + 1)], 'sum'), 6)
               AS sq_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
    FROM embeddings
    WHERE {SQL_VECTOR_READY}
    """,
    tags=("B17",),
    doc="Array battery over array<float>: size/index/slice/higher-order "
    "fold (dot product) /filter — all codegen, no UDF.  head4 is "
    "serialized as integer 1e-4 units: float→string formatting is "
    "engine-specific, fixed-point integers are not.  vector_ready "
    "(r9): the n_pos filter is a NaN trap — Spark's NaN > 0 is "
    "false, DuckDB orders NaN above everything so its NaN > 0 is "
    "TRUE; the ingest guard removes the divergence class.",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scache_spark.functions import vec_dot

    e = vector_ready(load_table(spark, sf_dir, "embeddings"))
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("int").alias("dim"),
        F.element_at(emb, 1).alias("first_comp"),
        # saturating fixed-point (r9): a finite-but-huge component
        # (|x|*1e4 past INT range) must clamp, not wrap — Spark's
        # non-ANSI double->int cast wraps bits while DuckDB's raises,
        # so the clamp IS the portability contract
        F.array_join(
            F.transform(
                F.slice(emb, 1, 4),
                lambda x: F.least(
                    F.greatest(
                        F.round(x.cast("double") * 10000),
                        F.lit(-2147483648.0),
                    ),
                    F.lit(2147483647.0),
                ).cast("int"),
            ),
            ",",
        ).alias("head4"),
        F.round(vec_dot(emb, emb), 6).alias("sq_norm"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("int").alias("n_pos"),
    )


@register(
    "array_explode_agg",
    oracle=f"""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_components,
           round(avg(comp), 6) AS avg_comp,
           max(comp) AS max_comp
    FROM (SELECT label, CAST(unnest(embedding) AS DOUBLE) AS comp
          FROM embeddings WHERE {SQL_MOMENT_READY})
    GROUP BY label
    """,
    tags=("B17", "B7"),
    doc="explode (unnest) then reaggregate per label.  moment_ready "
    "(r9): this is the engine's one cross-dimension SIGNED mean, so "
    "beyond well-formedness (a NaN component would poison avg and "
    "capture max in engine-specific ways) it needs the dynamic-range "
    "clause — a planted alternating ±1e20 vector made the label's "
    "avg order-DEFINED (Spark 0.0, DuckDB -0.000110: whichever "
    "engine sums the small components before the huge terms cancel "
    "keeps them; SCALE.md §20 #8).",
)
def array_explode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scache_spark.functions import moment_ready

    e = moment_ready(load_table(spark, sf_dir, "embeddings"))
    return (
        e.select("label", F.explode("embedding").alias("comp_f"))
        .select("label", F.col("comp_f").cast("double").alias("comp"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_components"),
            F.round(F.avg("comp"), 6).alias("avg_comp"),
            F.max("comp").alias("max_comp"),
        )
    )


# ---------------------------------------------------------------------------
# B18 — JSON (events.props)
# ---------------------------------------------------------------------------


from scache_spark.functions import SQL_PROPS_K_INT as _ORACLE_K_INT  # noqa: E402


@register(
    "json_funcs",
    oracle=f"""
    SELECT event_id,
           {_ORACLE_K_INT} AS k_val,
           event_type
    FROM events
    WHERE {_ORACLE_K_INT} >= 50
    """,
    tags=("B18", "B3"),
    doc="JSON field extraction + predicate on the extracted value.  "
    "DIRTY-EVENTS CONTRACT (SCALE_STRESS_dirty_events.json): k is an "
    "integer property — malformed props, non-integer JSON values "
    "(3.7) and out-of-INT-range numbers all extract as NULL.  Spark's "
    "try_cast gives exactly that; the oracle needs the json_valid + "
    "integer-regex guard because DuckDB's TRY_CAST rounds '3.7' to 4 "
    "and json_extract_string THROWS on malformed JSON.",
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return ev.select(
        "event_id", k.alias("k_val"), "event_type"
    ).filter(F.col("k_val") >= 50)


@register(
    "json_schema_parse_agg",
    oracle=f"""
    SELECT event_type,
           avg({_ORACLE_K_INT}) AS avg_k,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    tags=("B18", "B7"),
    doc="from_json with explicit schema, then aggregate.  Same "
    "integer-property contract as json_funcs: from_json('k INT') "
    "yields NULL for malformed props, float-valued and "
    "out-of-range k, so the dirty rows fall out of avg() while "
    "still counting in n.",
)
def json_schema_parse_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json("props", "k INT").alias("p")
    )
    return parsed.groupBy("event_type").agg(
        F.avg(F.col("p.k")).alias("avg_k"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# B19 — conditionals / null handling
# ---------------------------------------------------------------------------


@register(
    "conditional_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_class,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_masked,
           CAST(c_acctbal IS NULL AS BOOLEAN) AS bal_is_null,
           greatest(c_acctbal, 0.0) AS bal_clamped
    FROM customer
    """,
    tags=("B19",),
    doc="when/otherwise, coalesce, nullif, greatest (deal_na analog, "
    "sim/sim.py:21-25).",
)
def conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_class"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER"))
        .alias("seg_masked"),
        F.isnull("c_acctbal").alias("bal_is_null"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_clamped"),
    )


# ---------------------------------------------------------------------------
# B20 — sampling & statistics
# ---------------------------------------------------------------------------


@register(
    "stats_summary",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 8) AS qty_price_corr,
           round(stddev_samp(l_extendedprice), 4) AS price_std,
           round(var_samp(l_extendedprice), 2) AS price_var,
           round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 4)
               AS price_median,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS qty_price_cov
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("B20", "B7"),
    doc="Statistical aggregates incl. exact interpolated median "
    "(approxQuantile is the 100 TB path; tested vs exact in pytest).",
)
def stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Moment-based aggregates accumulate in engine-specific order →
    # rounded on BOTH sides (same rule as plain float sums).
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 8).alias("qty_price_corr"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_std"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("price_var"),
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("price_median"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_cov"
        ),
    )


@register(
    "deterministic_sample",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_orderkey % 20 = 0
    """,
    tags=("B20", "B3"),
    doc="Key-hash sampling: deterministic, partition-count-independent "
    "(unlike rand-based sample; df.sample(seed) is tested in pytest — "
    "its row set depends on partition layout so it can't hash-match "
    "a DuckDB oracle).  First-map-wave sampling analog, sim/train.py:237.",
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 20 == 0).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "percentile_battery",
    oracle="""
    SELECT l_returnflag,
           round(CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE), 4) AS p25,
           round(CAST(quantile_cont(l_extendedprice, 0.50) AS DOUBLE), 4) AS p50,
           round(CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE), 4) AS p75,
           round(CAST(quantile_cont(l_extendedprice, 0.95) AS DOUBLE), 4) AS p95,
           round(max(l_extendedprice) - min(l_extendedprice), 4) AS rng
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("B20", "B7"),
    doc="Exact multi-quantile battery: linearly-interpolated p25/50/75/"
    "95 per group (Spark percentile == DuckDB quantile_cont).  Exact "
    "percentiles need the full sorted group — the 100 TB path is "
    "approx_percentile (t-digest sketch, mergeable map-side, tested "
    "within bound in pytest); exact is the oracle-able twin.",
)
def percentile_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.25), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", 0.50), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", 0.75), 4).alias("p75"),
        F.round(F.percentile("l_extendedprice", 0.95), 4).alias("p95"),
        F.round(
            F.max("l_extendedprice") - F.min("l_extendedprice"), 4
        ).alias("rng"),
    )


@register(
    "profile_data_quality",
    oracle="""
    SELECT 'orders' AS tbl,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(o_custkey) AS BIGINT) AS null_custkey,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS distinct_cust,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS distinct_status,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key,
           CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
               AS nonpositive_price,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_keys
    FROM orders
    """,
    tags=("B7", "B20"),
    doc="Data-quality profile — the assertion pass a training pipeline "
    "runs before ingesting a drop: row count, null counts, distinct "
    "cardinalities, key range, constraint violations (non-positive "
    "price), duplicate-key count.  ONE pass over the table computes "
    "every stat (a single aggregate, map-side combined); never one "
    "scan per metric.",
)
def profile_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.lit("orders").alias("tbl"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("o_custkey")).cast("long").alias(
            "null_custkey"
        ),
        F.count_distinct("o_custkey").alias("distinct_cust"),
        F.count_distinct("o_orderstatus").alias("distinct_status"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias(
            "nonpositive_price"
        ),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey"))
        .cast("long")
        .alias("dup_keys"),
    )


@register(
    "approx_percentile_bound",
    oracle="""
    SELECT l_returnflag,
           round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 4)
               AS exact_p50,
           TRUE AS approx_within_2pct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("B20", "B7"),
    doc="t-digest approximate percentile verified against the exact "
    "interpolated median IN the query (±2%%), stated as a literal in "
    "the oracle — same contract as approx_distinct_bound.  At 100 TB "
    "the sketch is the only path: fixed-size mergeable state per "
    "group vs a full per-group sort for the exact quantile.",
)
def approx_percentile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", 0.5), 4).alias("exact_p50"),
            F.approx_percentile(
                "l_extendedprice", F.lit(0.5), F.lit(10000)
            ).alias("approx_p50"),
        )
        .select(
            "l_returnflag",
            "exact_p50",
            (
                F.abs(F.col("approx_p50") - F.col("exact_p50"))
                <= 0.02 * F.col("exact_p50")
            ).alias("approx_within_2pct"),
        )
    )


@register(
    "sample_k_per_group",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    SELECT source, doc_id, n_chars FROM ranked WHERE rn <= 5
    """,
    tags=("B10", "B20"),
    doc="Fixed-quota sampling: exactly k=5 documents per source, "
    "chosen by ranking on a content-independent hash — the "
    "deterministic, partition-layout-independent stand-in for a "
    "per-group reservoir sample (rand()-based sampling can never "
    "hash-match an oracle).  One shuffle on the group key; the hash "
    "order is md5 of the key rendered as text, identical in both "
    "engines, with doc_id as total-order tie-break.  At 100 TB the "
    "window sorts each group once — for pathological group sizes the "
    "mitigation is the same two-phase local-top-k that "
    "topk_per_group documents, and AQE skew-split applies.",
)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "source", "doc_id", "n_chars", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "equi_depth_binning",
    oracle="""
    WITH ranked AS (
      SELECT l_extendedprice AS price,
             ntile(8) OVER (ORDER BY l_extendedprice,
                            l_orderkey, l_linenumber) AS bin
      FROM lineitem
      WHERE (l_extendedprice IS NOT NULL AND abs(l_extendedprice) < 1e9))
    SELECT CAST(bin AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(min(price), 4) AS lo,
           round(max(price), 4) AS hi
    FROM ranked GROUP BY bin
    """,
    tags=("B11", "B20"),
    doc="Equi-depth (equal-frequency) binning: 8 buckets with equal "
    "row counts via ntile over a TOTAL order — (price, orderkey, "
    "linenumber) — so tie placement at bucket boundaries is "
    "identical in both engines.  This is the feature-bucketizer / "
    "histogram-equalization primitive.  The global sort is the cost "
    "at 100 TB; the registered scale-safe path is "
    "equi_depth_hist_binning (histogram boundaries + broadcast "
    "scan-assign, zero global sorts) — this exact variant remains as "
    "its oracle-able semantic twin, same contract as "
    "percentile_battery.",
)
def equi_depth_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from scache_spark.functions import money_domain

    w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    ranked = load_table(spark, sf_dir, "lineitem").where(
        money_domain("l_extendedprice")
    ).select(
        F.col("l_extendedprice").alias("price"),
        F.ntile(8).over(w).alias("bin"),
    )
    return ranked.groupBy(F.col("bin").cast("int").alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.min("price"), 4).alias("lo"),
        F.round(F.max("price"), 4).alias("hi"),
    )


_EDH_BINS = 256  # histogram resolution for the scale-safe equi-depth path
_EDH_K = 8  # target buckets


@register(
    "equi_depth_hist_binning",
    oracle=f"""
    WITH dom AS (
      SELECT l_extendedprice FROM lineitem
      WHERE (l_extendedprice IS NOT NULL AND abs(l_extendedprice) < 1e9)
    ),
    rng AS (
      SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
      FROM dom
    ),
    binned AS (
      SELECT l_extendedprice AS price,
             CAST(CASE WHEN rng.mx = rng.mn THEN 0
                  ELSE least(floor((l_extendedprice - rng.mn)
                              / ((rng.mx - rng.mn) / {_EDH_BINS}.0)),
                        {_EDH_BINS - 1}) END AS INT) AS bin
      FROM dom, rng
    ),
    hist AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS c,
             min(price) AS mn_p, max(price) AS mx_p
      FROM binned GROUP BY bin
    ),
    walked AS (
      SELECT bin, c, mn_p, mx_p,
             sum(c) OVER (ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM hist
    ),
    tot AS (SELECT sum(c) AS n FROM hist)
    SELECT CAST(({_EDH_K} * cum + n - 1) // n AS INT) AS bucket,
           CAST(sum(c) AS BIGINT) AS n_rows,
           round(min(mn_p), 4) AS lo, round(max(mx_p), 4) AS hi
    FROM walked, tot
    GROUP BY 1
    """,
    tags=("B20", "B16", "B7"),
    doc=f"Scale-safe equi-depth binning (the graded sibling of "
    "equi_depth_binning, whose exact ntile needs a global sort): an "
    f"equal-width {_EDH_BINS}-bin histogram (one map-side-combinable "
    "aggregate) is walked cumulatively over its ≤"
    f"{_EDH_BINS} rows (bounded window), each bin lands in bucket "
    f"ceil({_EDH_K}·cum/n) via pure integer arithmetic, and rows are "
    "assigned by a broadcast join on bin id — two scans, zero global "
    "sorts, identical plan shape at 100 TB.  Bucket populations are "
    "equal only up to bin granularity (bins are atomic), which is the "
    "standard t-digest/histogram trade; boundaries here are exact "
    "integer decisions, so both engines agree bit-for-bit.  The exact "
    "ntile twin remains registered as the pytest oracle of the "
    "semantics.",
)
def equi_depth_hist_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scache_spark.functions import money_domain

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(money_domain("l_extendedprice"))
        .select(F.col("l_extendedprice").alias("price"))
    )
    rng = li.agg(F.min("price").alias("mn"), F.max("price").alias("mx"))
    width = (F.col("mx") - F.col("mn")) / float(_EDH_BINS)
    binned = li.crossJoin(F.broadcast(rng)).select(
        "price",
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("price") - F.col("mn")) / width),
                F.lit(_EDH_BINS - 1),
            )
        )
        .cast("int")
        .alias("bin"),
    )
    # The histogram carries per-bin min/max alongside the count, so the
    # final per-bucket rollup derives ENTIRELY from the <=256-row hist
    # (min-of-mins == min; exact integer/branchless decisions) — the
    # corpus is never re-joined against the bucket map.  One data scan
    # for the range, one for the histogram; everything after is
    # bin-resolution work.  hist is checkpointed: it feeds the
    # cumulative walk, the total, and the rollup.
    hist = (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.min("price").alias("mn_p"),
            F.max("price").alias("mx_p"),
        )
        .localCheckpoint(eager=True)
    )
    cum = hist.select(
        "bin",
        "c",
        "mn_p",
        "mx_p",
        F.sum("c")
        .over(
            bounded_window("bin", "bin").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cum"),
    )
    tot = hist.agg(F.sum("c").alias("n"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy(
            F.expr(f"CAST(({_EDH_K} * cum + n - 1) div n AS INT)").alias(
                "bucket"
            )
        )
        .agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.round(F.min("mn_p"), 4).alias("lo"),
            F.round(F.max("mx_p"), 4).alias("hi"),
        )
    )


@register(
    "array_set_ops",
    oracle="""
    WITH t AS (
      SELECT p_partkey,
             list_distinct(string_split(lower(coalesce(p_name, '')), ' '))
               AS a,
             list_distinct(string_split(lower(coalesce(p_type, '')), ' '))
               AS b
      FROM part)
    SELECT p_partkey,
           coalesce(array_to_string(
             list_sort(list_filter(a, x -> NOT list_contains(b, x))), ','),
             '') AS only_name,
           coalesce(array_to_string(
             list_sort(list_filter(a, x -> list_contains(b, x))), ','), '')
             AS common,
           coalesce(array_to_string(list_sort(list_distinct(a || b)), ','),
                    '') AS all_words,
           CAST(len(list_filter(a, x -> list_contains(b, x))) AS INT)
             AS n_common
    FROM t
    """,
    tags=("B12", "B17"),
    doc="Array SET operations (except / intersect / union) — the "
    "B12 set semantics applied inside a row.  Spark's array_except/"
    "array_intersect preserve first-argument order, but DuckDB's "
    "list_distinct does NOT — so every serialized set is explicitly "
    "sorted on both engines; never rely on a set op's element order "
    "cross-engine.  NULL name/type behaves as empty (dirty-catalog "
    "contract: a NULL input array silently NULLs every downstream "
    "set op in Spark while the oracle's coalesce masks it — both "
    "sides now coalesce the STRING first).  All higher-order "
    "codegen — no explode, no shuffle, one scan.",
)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = F.array_distinct(
        F.split(F.lower(F.coalesce(F.col("p_name"), F.lit(""))), " ")
    )
    b = F.array_distinct(
        F.split(F.lower(F.coalesce(F.col("p_type"), F.lit(""))), " ")
    )
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.array_join(F.array_sort(F.array_except(a, b)), ",").alias(
            "only_name"
        ),
        F.array_join(F.array_sort(F.array_intersect(a, b)), ",").alias(
            "common"
        ),
        F.array_join(F.array_sort(F.array_union(a, b)), ",").alias(
            "all_words"
        ),
        F.size(F.array_intersect(a, b)).cast("int").alias("n_common"),
    )


@register(
    "explode_outer_nulls",
    oracle="""
    WITH t AS (
      SELECT p_partkey,
             list_filter(list_distinct(string_split(lower(p_name), ' ')),
                         x -> list_contains(
                           list_distinct(string_split(lower(p_type), ' ')),
                           x)) AS c
      FROM part)
    SELECT p_partkey,
           unnest(CASE WHEN c IS NULL OR len(c) = 0 THEN [NULL] ELSE c END)
             AS word
    FROM t
    """,
    tags=("B17", "B19"),
    doc="explode_outer null semantics: rows whose array is EMPTY — or "
    "NULL (a NULL p_name propagates; dirty-catalog contract) — "
    "survive as a single null row instead of vanishing, the corner "
    "that silently loses data when a pipeline uses plain explode on "
    "sparse arrays (every part whose name shares no word with its "
    "type would disappear from a per-part report).  The oracle "
    "emulates it with unnest over a [NULL] substitution; len(NULL) "
    "is NULL, not 0, so the CASE must test IS NULL explicitly.",
)
def explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = F.array_distinct(F.split(F.lower("p_name"), " "))
    b = F.array_distinct(F.split(F.lower("p_type"), " "))
    return load_table(spark, sf_dir, "part").select(
        "p_partkey", F.explode_outer(F.array_intersect(a, b)).alias("word")
    )


@register(
    "higher_order_funcs",
    oracle=f"""
    SELECT vec_id,
           (len(list_filter(embedding, x -> NOT (abs(x) <= 1.0))) = 0)
             AS all_unit,
           (len(list_filter(embedding, x -> x > 0.5)) > 0) AS any_big,
           round(list_aggregate(
             [CASE WHEN CAST(x AS DOUBLE) > 0
                   THEN CAST(x AS DOUBLE) ELSE 0.0 END
              for x in embedding], 'sum'), 6) AS relu_sum,
           CAST(len(list_filter([i for i in range(1, len(embedding) + 1)],
                                i -> i % 2 = 1
                                AND embedding[i] > 0)) AS INT)
             AS n_pos_odd
    FROM embeddings
    WHERE {SQL_VECTOR_READY}
    """,
    tags=("B17",),
    doc="Higher-order predicate battery: forall (every |x| <= 1), "
    "exists (any component > 0.5), a ReLU fold, and a position-aware "
    "filter (positive components at odd indices) — transform/filter/"
    "aggregate/forall/exists all inside whole-stage codegen, zero "
    "UDFs, zero shuffles.  The oracle states forall/exists as "
    "list_filter cardinality tests, the portable form.  vector_ready "
    "(r9): every predicate here is a NaN-ordering trap (NaN > 0.5 "
    "differs between the engines), so the battery runs on the "
    "well-formed universe.",
)
def higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = F.col("embedding")
    relu = F.aggregate(
        emb,
        F.lit(0.0),
        lambda acc, x: acc
        + F.greatest(x.cast("double"), F.lit(0.0)),
    )
    pos_odd = F.filter(
        F.sequence(F.lit(1), F.size(emb)),
        lambda i: (i % 2 == 1) & (F.element_at(emb, i) > 0),
    )
    return vector_ready(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.forall(emb, lambda x: F.abs(x) <= 1.0).alias("all_unit"),
        F.exists(emb, lambda x: x > 0.5).alias("any_big"),
        F.round(relu, 6).alias("relu_sum"),
        F.size(pos_odd).cast("int").alias("n_pos_odd"),
    )


@register(
    "weekday_bitmask_engagement",
    oracle="""
    SELECT user_id,
           CAST(bit_or(1 << dayofweek(ts)) AS BIGINT) AS day_mask,
           CAST(bit_count(CAST(bit_or(1 << dayofweek(ts)) AS BIGINT))
                AS INT) AS n_active_days,
           (bit_or(1 << dayofweek(ts)) & 65)
             = bit_or(1 << dayofweek(ts)) AS weekend_only
    FROM events GROUP BY user_id
    """,
    tags=("B7", "B16"),
    doc="Weekday-engagement bitmask: one 7-bit integer per user "
    "(bit d set iff the user was active on weekday d; Spark's "
    "dayofweek-1 equals DuckDB's dayofweek, Sunday=0), built with "
    "the bit_or AGGREGATE — a set-union that costs 8 bytes of "
    "mergeable state per user, the idiom behind retention bitmaps "
    "and roaring-bitmap segmentation.  bit_count and the "
    "weekend-mask test (bits 0 and 6 = 65) are pure integer ops, "
    "bit-identical across engines.",
)
def weekday_bitmask_engagement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        # shiftleft needs a literal count in the Python API; the SQL
        # form takes a column
        F.expr("shiftleft(CAST(1 AS BIGINT), dayofweek(ts) - 1)").alias(
            "day_bit"
        ),
    )
    mask = F.bit_or("day_bit")
    return ev.groupBy("user_id").agg(
        mask.alias("day_mask"),
        F.bit_count(mask).cast("int").alias("n_active_days"),
        (mask.bitwiseAND(F.lit(65)) == mask).alias("weekend_only"),
    )


# ---------------------------------------------------------------------------
# weighted priority sampling (Horvitz-Thompson-audited)
# ---------------------------------------------------------------------------

_PS_K = 100  # sample size
_TWO60 = float(1 << 60)


def _priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-materialized top-(K+1) priority frame — split out so the
    plan test can assert the TakeOrderedAndProject shape (per-partition
    heaps, no global sort/window over the corpus) before the query
    checkpoints it."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        + 1
    ) / F.lit(_TWO60)
    pri = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("w"),
        (F.col("n_chars").cast("double") / u).alias("q"),
    )
    return pri.orderBy(F.col("q").desc(), F.col("doc_id")).limit(_PS_K + 1)




@register(
    "weighted_priority_sample",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
             CAST(n_chars AS DOUBLE)
               / ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
                  / {_TWO60}) AS q
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, w, q,
             row_number() OVER (ORDER BY q DESC, doc_id ASC) AS rk
      FROM pri
    ),
    tau AS (SELECT q AS t FROM ranked WHERE rk = {_PS_K} + 1),
    est AS (
      SELECT sum(CASE WHEN r.w > tau.t THEN r.w ELSE tau.t END) AS est_total
      FROM ranked r CROSS JOIN tau WHERE r.rk <= {_PS_K}
    )
    SELECT CAST({_PS_K} AS BIGINT) AS k,
           round((SELECT t FROM tau), 4) AS tau,
           round((SELECT est_total FROM est), 2) AS est_total_chars,
           CAST((SELECT sum(n_chars) FROM documents) AS BIGINT)
               AS true_total_chars,
           round(((SELECT est_total FROM est)
                  - (SELECT sum(n_chars) FROM documents))
                 / (SELECT sum(n_chars) FROM documents), 6) AS rel_err
    """,
    tags=("B20", "B16"),
    doc="Deterministic weighted priority sampling (Duffield-Lund-"
    "Thorup): priority q_i = w_i/u_i with u_i a seeded md5-uniform in "
    "(0,1], keep the top 100 priorities, and audit the sample by the "
    "Horvitz-Thompson total estimate sum(max(w_i, tau)) against the "
    "exact corpus total.  This is the weighted analog of the "
    "reference's first-map-wave sampling (sim/train.py:237-243): a "
    "fixed-size sample whose inclusion probabilities adapt to item "
    "weight, with an unbiased total estimator.  At 100 TB the top-k "
    "by priority is TakeOrderedAndProject (per-partition heaps, no "
    "full sort) and the audit aggregates are map-side combined.",
)
def weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    topk = _priority_topk(spark, sf_dir)
    # 101-row frame feeding tau, the HT estimate, and the final select
    # — checkpoint so the corpus-wide TakeOrdered runs once.
    ranked = topk.withColumn(
        "rk", F.row_number().over(bounded_window("doc_id", F.col("q").desc(), F.col("doc_id")))
    ).localCheckpoint(eager=True)
    tau = ranked.filter(F.col("rk") == _PS_K + 1).select(F.col("q").alias("t"))
    est = (
        ranked.filter(F.col("rk") <= _PS_K)
        .crossJoin(F.broadcast(tau))
        .agg(
            F.sum(
                F.when(F.col("w") > F.col("t"), F.col("w")).otherwise(F.col("t"))
            ).alias("est_total")
        )
    )
    totals = (
        load_table(spark, sf_dir, "documents")
        .agg(F.sum("n_chars").cast("long").alias("true_total_chars"))
    )
    return (
        est.crossJoin(F.broadcast(tau))
        .crossJoin(F.broadcast(totals))
        .select(
            F.lit(_PS_K).cast("long").alias("k"),
            F.round(F.col("t"), 4).alias("tau"),
            F.round(F.col("est_total"), 2).alias("est_total_chars"),
            F.col("true_total_chars"),
            F.round(
                (F.col("est_total") - F.col("true_total_chars"))
                / F.col("true_total_chars"),
                6,
            ).alias("rel_err"),
        )
    )


# ---------------------------------------------------------------------------
# robust outlier detection (median absolute deviation)
# ---------------------------------------------------------------------------


@register(
    "mad_outlier_report",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(max(d.med), 6) AS med,
           round(max(m.mad), 6) AS mad,
           CAST(sum(CASE WHEN d.adev > 3 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type
    """,
    tags=("B20", "B16"),
    doc="Robust outlier report: per event type, the median/MAD scale "
    "estimate and the count of values beyond 3 robust sigmas "
    "(1.4826*MAD) — the data-quality screen that, unlike mean/stddev "
    "z-scores, is not dragged by the outliers it hunts.  Two grouped "
    "exact medians + one broadcast-size join per pass; the outlier "
    "verdict is an integer count, immune to float drift.  The "
    "screening pass a value column gets before training-feature "
    "extraction.",
)
def mad_outlier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact MAD is inherently multi-pass (medians have no partial
    # aggregate): pass 1 per-type medians, pass 2 deviation medians,
    # pass 3 the outlier report.  Checkpoint the two TINY per-type
    # model frames so each pass scans the data exactly once — without
    # this the lineage replays pass 1 under pass 2 and both under
    # pass 3 (4 FileScans for 3 logical passes).
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = (
        ev.groupBy("event_type")
        .agg(F.median("value").alias("med"))
        .localCheckpoint(eager=True)
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = (
        dev.groupBy("event_type")
        .agg(F.median("adev").alias("mad"))
        .localCheckpoint(eager=True)
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


@register(
    "ks_drift_statistic",
    oracle="""
    WITH flagged AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
      FROM orders
      WHERE (o_totalprice IS NOT NULL AND abs(o_totalprice) < 1e9)
    ),
    totals AS (
      SELECT CAST(sum(is_a) AS BIGINT) AS n_a,
             CAST(sum(1 - is_a) AS BIGINT) AS n_b
      FROM flagged
    ),
    walked AS (
      SELECT v,
             sum(is_a) OVER (ORDER BY v, is_a
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             sum(1 - is_a) OVER (ORDER BY v, is_a
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      FROM flagged
    )
    SELECT t.n_a, t.n_b,
           round(max(abs(CAST(w.ca AS DOUBLE) / t.n_a
                         - CAST(w.cb AS DOUBLE) / t.n_b)), 6) AS ks
    FROM walked w CROSS JOIN totals t
    GROUP BY t.n_a, t.n_b
    """,
    tags=("B20", "B9", "B16"),
    doc="Two-sample Kolmogorov-Smirnov drift statistic: max ECDF gap "
    "between urgent and non-urgent order-price distributions — the "
    "continuous-distribution drift test completing source_lang_chisq's "
    "categorical one.  Cumulative counts come from one ordered window "
    "walk with a deterministic (value, group) total order; ECDF "
    "values are exact-integer ratios, so the statistic is "
    "deterministic up to the final rounding.  The unpartitioned "
    "cumulative walk is single-node — the registered scale-safe path "
    "is ks_drift_binned (KS over binned ECDFs, bounded window); this "
    "exact variant remains as its semantic twin for tests.",
)
def ks_drift_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from scache_spark.functions import money_domain

    flagged = load_table(spark, sf_dir, "orders").where(
        money_domain("o_totalprice")
    ).select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("is_a"),
    )
    totals = flagged.agg(
        F.sum("is_a").cast("long").alias("n_a"),
        F.sum(1 - F.col("is_a")).cast("long").alias("n_b"),
    )
    w = Window.orderBy("v", "is_a").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walked = flagged.select(
        F.sum("is_a").over(w).alias("ca"),
        F.sum(1 - F.col("is_a")).over(w).alias("cb"),
    )
    return (
        walked.crossJoin(F.broadcast(totals))
        .groupBy("n_a", "n_b")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("ca").cast("double") / F.col("n_a")
                        - F.col("cb").cast("double") / F.col("n_b")
                    )
                ),
                6,
            ).alias("ks")
        )
    )


_PSI_BINS = 10


@register(
    "psi_drift_bins",
    oracle=f"""
    WITH dom AS (
      SELECT o_totalprice, o_orderpriority FROM orders
      WHERE (o_totalprice IS NOT NULL AND abs(o_totalprice) < 1e9)
    ),
    rng AS (
      SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM dom
    ),
    binned AS (
      SELECT CAST(CASE WHEN rng.mx = rng.mn THEN 0
                   ELSE least(floor((o_totalprice - rng.mn)
                              / ((rng.mx - rng.mn) / {_PSI_BINS}.0)),
                        {_PSI_BINS - 1}) END AS INT) AS bin,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
      FROM dom, rng
    ),
    cells AS (
      SELECT bin,
             CAST(sum(is_a) AS BIGINT) AS n_a,
             CAST(count(*) - sum(is_a) AS BIGINT) AS n_b
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb
      FROM cells
    )
    SELECT bin, n_a, n_b,
           CASE WHEN n_a > 0 AND n_b > 0
                THEN round((n_a * 1.0 / ta - n_b * 1.0 / tb)
                           * ln((n_a * 1.0 / ta) / (n_b * 1.0 / tb)), 6)
           END AS psi_term
    FROM cells, tot
    """,
    tags=("B20", "B16", "B7"),
    doc="Population-stability-index drift monitor: the binned sibling "
    "of ks_drift_statistic (same A/B populations — urgent vs other "
    "orders over o_totalprice).  Equal-width bins from a broadcast "
    "(min, max) 1-row aggregate, so bin assignment is map-side "
    "arithmetic and the whole statistic is ONE small groupBy + a "
    "broadcast total — no ordered window at all, which is why PSI "
    "(not KS) is what production monitoring jobs actually run at "
    "100 TB.  Per-bin psi_term sums to the feature's PSI "
    "(>0.25 = action threshold by convention).",
)
def psi_drift_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scache_spark.functions import money_domain

    o = load_table(spark, sf_dir, "orders").where(
        money_domain("o_totalprice")
    )
    rng = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    binned = o.crossJoin(F.broadcast(rng)).select(
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("o_totalprice") - F.col("mn"))
                    / ((F.col("mx") - F.col("mn")) / float(_PSI_BINS))
                ),
                F.lit(_PSI_BINS - 1),
            )
        )
        .cast("int")
        .alias("bin"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_a"),
    )
    # <=10-row histogram feeding the totals AND the psi terms —
    # checkpoint so the orders scan (and the min/max pass under it)
    # runs once, not once per consumer.
    cells = binned.groupBy("bin").agg(
        F.sum("is_a").cast("long").alias("n_a"),
        (F.count(F.lit(1)) - F.sum("is_a")).cast("long").alias("n_b"),
    ).localCheckpoint(eager=True)
    tot = cells.agg(
        F.sum("n_a").cast("long").alias("ta"), F.sum("n_b").cast("long").alias("tb")
    )
    pa = F.col("n_a") * 1.0 / F.col("ta")
    pb = F.col("n_b") * 1.0 / F.col("tb")
    return cells.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_a",
        "n_b",
        # zero cells have no finite PSI term: NULL, not an error
        # (DuckDB raises on ln(0); Spark silently NULLs — the CASE
        # pins the NULL contract on both sides)
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.round((pa - pb) * F.log(pa / pb), 6),
        ).alias("psi_term"),
    )


_KSB_BINS = 64  # ECDF resolution for the scale-safe KS path


@register(
    "ks_drift_binned",
    oracle=f"""
    WITH dom AS (
      SELECT o_totalprice, o_orderpriority FROM orders
      WHERE (o_totalprice IS NOT NULL AND abs(o_totalprice) < 1e9)
    ),
    rng AS (
      SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM dom
    ),
    binned AS (
      SELECT CAST(CASE WHEN rng.mx = rng.mn THEN 0
                   ELSE least(floor((o_totalprice - rng.mn)
                              / ((rng.mx - rng.mn) / {_KSB_BINS}.0)),
                        {_KSB_BINS - 1}) END AS INT) AS bin,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
      FROM dom, rng
    ),
    hist AS (
      SELECT bin,
             CAST(sum(is_a) AS BIGINT) AS a,
             CAST(sum(1 - is_a) AS BIGINT) AS b
      FROM binned GROUP BY bin
    ),
    walked AS (
      SELECT bin,
             sum(a) OVER (ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             sum(b) OVER (ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      FROM hist
    ),
    tot AS (
      SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b
      FROM hist
    )
    SELECT t.n_a, t.n_b, CAST({_KSB_BINS} AS INT) AS n_bins,
           round(max(abs(CAST(w.ca AS DOUBLE) / t.n_a
                         - CAST(w.cb AS DOUBLE) / t.n_b)), 6) AS ks_binned
    FROM walked w CROSS JOIN tot t
    GROUP BY t.n_a, t.n_b
    """,
    tags=("B20", "B16", "B7"),
    doc=f"Scale-safe two-sample KS drift (the graded sibling of "
    "ks_drift_statistic, whose exact ECDF walk is an unpartitioned "
    "cumulative window over every orders row): both ECDFs are "
    f"evaluated on a {_KSB_BINS}-edge equal-width grid — one "
    "map-side-combinable histogram aggregate, a cumulative walk over "
    f"≤{_KSB_BINS} rows (bounded window), and a broadcast 1-row "
    "totals join.  The statistic is the max ECDF gap AT BIN EDGES — "
    "a deterministic lower bound within 1/bins of the exact KS, the "
    "standard streaming/production form.  ECDF ratios are "
    "exact-integer arithmetic, so both engines agree bit-for-bit "
    "before the final 6dp round.",
)
def ks_drift_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scache_spark.functions import money_domain

    o = load_table(spark, sf_dir, "orders").where(
        money_domain("o_totalprice")
    )
    rng = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    binned = o.crossJoin(F.broadcast(rng)).select(
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("o_totalprice") - F.col("mn"))
                    / ((F.col("mx") - F.col("mn")) / float(_KSB_BINS))
                ),
                F.lit(_KSB_BINS - 1),
            )
        )
        .cast("int")
        .alias("bin"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_a"),
    )
    # <=64-row histogram feeding the ECDF walk AND the totals —
    # checkpoint so the orders scan runs once, not once per consumer.
    hist = binned.groupBy("bin").agg(
        F.sum("is_a").cast("long").alias("a"),
        F.sum(1 - F.col("is_a")).cast("long").alias("b"),
    ).localCheckpoint(eager=True)
    wcum = bounded_window("bin", "bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walked = hist.select(
        F.sum("a").over(wcum).alias("ca"),
        F.sum("b").over(wcum).alias("cb"),
    )
    tot = hist.agg(
        F.sum("a").cast("long").alias("n_a"), F.sum("b").cast("long").alias("n_b")
    )
    return (
        walked.crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("ca").cast("double") / F.col("n_a")
                        - F.col("cb").cast("double") / F.col("n_b")
                    )
                ),
                6,
            ).alias("ks_binned")
        )
        .select(
            "n_a", "n_b", F.lit(_KSB_BINS).cast("int").alias("n_bins"), "ks_binned"
        )
    )


@register(
    "welch_t_test",
    oracle="""
    WITH g AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a,
             o_totalprice AS v
      FROM orders
    ),
    s AS (
      SELECT is_a,
             CAST(count(*) AS BIGINT) AS n,
             avg(v) AS m,
             var_samp(v) AS var
      FROM g GROUP BY is_a
    ),
    w AS (
      SELECT a.n AS n_a, b.n AS n_b,
             round(a.m - b.m, 4) AS mean_diff,
             (a.var / a.n + b.var / b.n) AS se2,
             a.var / a.n AS qa, b.var / b.n AS qb
      FROM (SELECT * FROM s WHERE is_a = 1) a,
           (SELECT * FROM s WHERE is_a = 0) b
    )
    SELECT n_a, n_b, mean_diff,
           round((mean_diff) / sqrt(se2), 4) AS t_stat,
           round(se2 * se2 / (qa * qa / (n_a - 1) + qb * qb / (n_b - 1)), 2)
             AS welch_df
    FROM w
    """,
    tags=("B20", "B16", "B7"),
    doc="Welch two-sample t-test (unequal variances): urgent vs "
    "non-urgent order prices — the parametric mean-shift test "
    "completing the drift family (chi-square categorical, KS "
    "distributional, PSI binned).  Entirely algebraic: one "
    "partial-aggregatable pass produces (n, mean, variance) per "
    "group; t and the Welch-Satterthwaite df are closed-form over "
    "those 6 numbers.  mean_diff is rounded BEFORE t to keep the "
    "divided quantity grid-aligned; var_samp matches Spark's "
    "variance (n-1 denominator) exactly.",
)
def welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    g = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_a"),
        F.col("o_totalprice").alias("v"),
    )
    s = g.groupBy("is_a").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("v").alias("m"),
        F.var_samp("v").alias("var"),
    )
    a = s.filter(F.col("is_a") == 1).select(
        F.col("n").alias("n_a"), F.col("m").alias("m_a"), F.col("var").alias("var_a")
    )
    b = s.filter(F.col("is_a") == 0).select(
        F.col("n").alias("n_b"), F.col("m").alias("m_b"), F.col("var").alias("var_b")
    )
    w = a.crossJoin(b).select(
        "n_a",
        "n_b",
        F.round(F.col("m_a") - F.col("m_b"), 4).alias("mean_diff"),
        (F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")).alias("se2"),
        (F.col("var_a") / F.col("n_a")).alias("qa"),
        (F.col("var_b") / F.col("n_b")).alias("qb"),
    )
    return w.select(
        "n_a",
        "n_b",
        "mean_diff",
        F.round(F.col("mean_diff") / F.sqrt("se2"), 4).alias("t_stat"),
        F.round(
            F.col("se2")
            * F.col("se2")
            / (
                F.col("qa") * F.col("qa") / (F.col("n_a") - 1)
                + F.col("qb") * F.col("qb") / (F.col("n_b") - 1)
            ),
            2,
        ).alias("welch_df"),
    )


_NEYMAN_BUDGET = 1000  # total sample size to allocate


@register(
    "neyman_allocation",
    oracle=f"""
    WITH strata AS (
      SELECT o_orderpriority AS stratum,
             CAST(count(*) AS BIGINT) AS n_h,
             stddev_samp(o_totalprice) AS s_h
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT sum(n_h * s_h) AS z FROM strata)
    SELECT stratum, n_h,
           round(s_h, 4) AS stddev,
           round(n_h * s_h / z, 6) AS weight,
           CAST(floor({_NEYMAN_BUDGET} * n_h * s_h / z) AS BIGINT)
             AS alloc_n
    FROM strata, tot
    """,
    tags=("B20", "B7", "B16"),
    doc="Neyman-optimal stratified sampling allocation: the "
    f"{_NEYMAN_BUDGET}-row budget split across order-priority strata "
    "proportional to N_h*S_h (stratum size x price stddev) — the "
    "minimum-variance design for estimating mean price, and the "
    "statistically-correct upgrade over the engine's equal-rate "
    "sample_stratified.  One algebraic (count, stddev) pass per "
    "stratum, a broadcast 1-row normalizer, floor() for the integer "
    "allocation (floor agrees across engines; cast alone does not).  "
    "At 100 TB: allocate from these per-stratum rates, then sample "
    "with the deterministic content-hash rule per stratum.",
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    strata = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.stddev_samp("o_totalprice").alias("s_h"),
    )
    tot = strata.agg(F.sum(F.col("n_h") * F.col("s_h")).alias("z"))
    return strata.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_h",
        F.round("s_h", 4).alias("stddev"),
        F.round(F.col("n_h") * F.col("s_h") / F.col("z"), 6).alias("weight"),
        F.floor(F.lit(_NEYMAN_BUDGET) * F.col("n_h") * F.col("s_h") / F.col("z"))
        .cast("long")
        .alias("alloc_n"),
    )


@register(
    "try_arithmetic_battery",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE l_quantity = 25
                                    OR l_quantity IS NULL
                                    OR l_extendedprice IS NULL) AS BIGINT)
             AS n_div_zero_null,
           CAST(count(*) FILTER (WHERE l_orderkey > 1) AS BIGINT)
             AS n_overflow_null,
           round(sum(l_quantity), 2) AS qty_sum
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("B16", "B19", "B7"),
    doc="Error-safe arithmetic semantics (Spark try_* family): "
    "try_divide returns NULL on a zero divisor instead of failing "
    "the job, try_multiply NULLs on BIGINT overflow, try_sum "
    "aggregates with overflow-to-NULL.  The battery counts exactly "
    "which rows degrade — the oracle states the expected semantics "
    "as CASE-equivalent predicates, so the query verifies Spark's "
    "ANSI-safety CONTRACT, not just its output.  Matters at 100 TB "
    "because one poisoned row must never kill a 6-hour job: try_* "
    "turns data errors into auditable NULL counts.",
)
def try_arithmetic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select(
        "l_returnflag",
        "l_quantity",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25).alias(
            "safe_div"
        ),
        F.try_multiply(
            F.col("l_orderkey"), F.lit(9223372036854775807).cast("long")
        ).alias("safe_mul"),
    )
    return rows.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(F.col("safe_div").isNull()).cast("long").alias("n_div_zero_null"),
        F.count_if(F.col("safe_mul").isNull()).cast("long").alias("n_overflow_null"),
        F.round(F.try_sum("l_quantity"), 2).alias("qty_sum"),
    )


@register(
    "trimmed_winsorized_mean",
    oracle="""
    WITH bounds AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS lo,
             quantile_cont(l_extendedprice, 0.95) AS hi
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(l_extendedprice) FILTER (
             WHERE l_extendedprice >= lo AND l_extendedprice <= hi), 4)
             AS trimmed_mean,
           round(avg(CASE WHEN l_extendedprice < lo THEN lo
                          WHEN l_extendedprice > hi THEN hi
                          ELSE l_extendedprice END), 4) AS winsorized_mean
    FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
    GROUP BY l.l_returnflag
    """,
    tags=("B20", "B7", "B19"),
    doc="Robust central tendency: 5%-trimmed mean (drop the tails) and "
    "winsorized mean (clamp the tails) per return flag — what "
    "monitoring dashboards use when a handful of corrupt prices "
    "would swing a plain average.  Percentile bounds come from one "
    "grouped aggregate and broadcast back; the second pass is "
    "map-side conditional arithmetic.  Interpolated percentiles are "
    "the cross-engine-proven contract (percentile_battery); only the "
    "order-dependent averages round (4 dp).",
)
def trimmed_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.05).alias("lo"),
        F.percentile("l_extendedprice", 0.95).alias("hi"),
    )
    j = li.join(F.broadcast(bounds), "l_returnflag")
    inside = (F.col("l_extendedprice") >= F.col("lo")) & (
        F.col("l_extendedprice") <= F.col("hi")
    )
    wins = (
        F.when(F.col("l_extendedprice") < F.col("lo"), F.col("lo"))
        .when(F.col("l_extendedprice") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("l_extendedprice"))
    )
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg(F.when(inside, F.col("l_extendedprice"))), 4).alias(
            "trimmed_mean"
        ),
        F.round(F.avg(wins), 4).alias("winsorized_mean"),
    )


# ---------------------------------------------------------------------------
# B20 — Benford first-digit audit & categorical mutual information
# ---------------------------------------------------------------------------


@register(
    "benford_digit_audit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders
      WHERE o_totalprice >= 1 AND o_totalprice < 1e9
    ),
    obs AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(count(*)) OVER () AS BIGINT) AS n_total
      FROM digits GROUP BY digit
    )
    SELECT digit, n,
           round(CAST(n AS DOUBLE) / n_total, 6) AS obs_share,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_share,
           round(
             (CAST(n AS DOUBLE) / n_total - log10(1.0 + 1.0 / digit))
             * (CAST(n AS DOUBLE) / n_total - log10(1.0 + 1.0 / digit))
             / log10(1.0 + 1.0 / digit) * n_total, 4) AS chi2_term
    FROM obs
    ORDER BY digit
    """,
    tags=("B20", "B16", "B14"),
    doc="Benford's-law first-significant-digit audit of order totals "
    "— the classic synthetic-data / fraud screen (a generated or "
    "tampered amount column deviates from P(d)=log10(1+1/d); TPC-H "
    "prices are near-uniform sums, so the fixture VISIBLY fails "
    "Benford — the screen working as intended).  Per-digit observed "
    "share vs Benford share plus the chi-square contribution, so the "
    "offending digit is identifiable, not just the total statistic.  "
    "Bit-exactness: the first digit comes from the BIGINT's decimal "
    "string (floor -> cast -> substr), never floor(log10(x)) whose "
    "power-of-ten ulp behavior differs per libm; shares divide "
    "integer counts once.  Scale: one map-side-combinable 9-group "
    "aggregate; the total rides a window over the 9-row frame.",
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benford domain: first SIGNIFICANT digit needs a positive integer
    # part (dirty-orders contract: a negative total's leading '-' is
    # not a digit — ANSI cast raises where DuckDB errs differently);
    # the 1e9 ceiling is the shared money-domain bound.
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_totalprice") >= 1) & (F.col("o_totalprice") < 1e9)
    )
    digits = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    obs = (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn(
            "n_total",
            F.sum("n").over(Window.partitionBy()).cast("long"),
        )
    )
    share = F.col("n").cast("double") / F.col("n_total")
    bens = F.log10(1.0 + 1.0 / F.col("digit"))
    return obs.select(
        "digit",
        "n",
        F.round(share, 6).alias("obs_share"),
        F.round(bens, 6).alias("benford_share"),
        F.round(
            (share - bens) * (share - bens) / bens * F.col("n_total"), 4
        ).alias("chi2_term"),
    ).orderBy("digit")


@register(
    "mutual_information_categorical",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS x, o_orderstatus AS y,
             CAST(count(*) AS BIGINT) AS nxy
      FROM orders GROUP BY 1, 2
    ),
    m AS (
      SELECT x, y, nxy,
             CAST(sum(nxy) OVER (PARTITION BY x) AS BIGINT) AS nx,
             CAST(sum(nxy) OVER (PARTITION BY y) AS BIGINT) AS ny,
             CAST(sum(nxy) OVER () AS BIGINT) AS n
      FROM cells
    )
    SELECT CAST(max(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_cells,
           round(sum(CAST(nxy AS DOUBLE) / n
                     * ln(CAST(nxy AS DOUBLE) * n
                          / (CAST(nx AS DOUBLE) * ny))), 6) AS mi_nats,
           round(-sum(CASE WHEN rx = 1 THEN CAST(nx AS DOUBLE) / n
                            * ln(CAST(nx AS DOUBLE) / n) ELSE 0 END), 6)
               AS h_x_nats,
           round(-sum(CASE WHEN ry = 1 THEN CAST(ny AS DOUBLE) / n
                            * ln(CAST(ny AS DOUBLE) / n) ELSE 0 END), 6)
               AS h_y_nats
    FROM (
      SELECT *,
             row_number() OVER (PARTITION BY x ORDER BY y) AS rx,
             row_number() OVER (PARTITION BY y ORDER BY x) AS ry
      FROM m
    )
    """,
    tags=("B20", "B7", "B16"),
    doc="Mutual information (nats) between order priority and order "
    "status, with the marginal entropies for normalization — the "
    "information-theoretic dependence screen complementing the "
    "chi-square test (source_lang_chisq): chi2 asks 'is there ANY "
    "association?', MI measures HOW MANY bits one column reveals "
    "about the other (feature-redundancy pruning input).  Scale: one "
    "map-side-combined |X|x|Y| contingency aggregate; margins ride "
    "windows over that bounded frame (the source_lang_chisq pattern "
    "— cells subplan appears once); entropy terms count each margin "
    "exactly once via first-in-margin flags.  All logs fold integer "
    "ratios; round 6 clears libm-vs-JVM ln ulps.",
)
def mutual_information_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("x"),
            F.col("o_orderstatus").alias("y"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("nxy"))
    )
    w_x = Window.partitionBy("x")
    w_y = Window.partitionBy("y")
    w_all = Window.partitionBy(F.pmod(F.hash("x"), F.lit(1)))
    m = cells.select(
        "x",
        "y",
        "nxy",
        F.sum("nxy").over(w_x).cast("long").alias("nx"),
        F.sum("nxy").over(w_y).cast("long").alias("ny"),
        F.sum("nxy").over(w_all).cast("long").alias("n"),
        (F.row_number().over(w_x.orderBy("y"))).alias("rx"),
        (F.row_number().over(w_y.orderBy("x"))).alias("ry"),
    )
    nxy_d = F.col("nxy").cast("double")
    nx_d = F.col("nx").cast("double")
    ny_d = F.col("ny").cast("double")
    return m.agg(
        F.max("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(
            F.sum(nxy_d / F.col("n") * F.log(nxy_d * F.col("n") / (nx_d * ny_d))),
            6,
        ).alias("mi_nats"),
        F.round(
            -F.sum(
                F.when(
                    F.col("rx") == 1,
                    nx_d / F.col("n") * F.log(nx_d / F.col("n")),
                ).otherwise(0.0)
            ),
            6,
        ).alias("h_x_nats"),
        F.round(
            -F.sum(
                F.when(
                    F.col("ry") == 1,
                    ny_d / F.col("n") * F.log(ny_d / F.col("n")),
                ).otherwise(0.0)
            ),
            6,
        ).alias("h_y_nats"),
    )


# ---------------------------------------------------------------------------
# exact DECIMAL money arithmetic (the never-float-for-money surface)
# ---------------------------------------------------------------------------


@register(
    "decimal_money_battery",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority AS pri,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders
    )
    SELECT pri,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(price) AS DOUBLE) AS total_exact,
           CAST(sum(CAST(price * CAST(1.07 AS DECIMAL(4,2))
                         AS DECIMAL(24,4))) AS DOUBLE) AS total_taxed,
           CAST(sum(price) AS DOUBLE) / count(*) AS avg_ieee,
           CAST(max(price) - min(price) AS DOUBLE) AS range_exact
    FROM d GROUP BY pri
    """,
    tags=("B2", "B7", "B16"),
    doc="Exact DECIMAL money arithmetic — the type discipline this "
    "repo's integer-cents convention encodes, surfaced as the SQL "
    "DECIMAL it maps to: prices cast to DECIMAL(18,2), summed EXACTLY "
    "(no float accumulation error at ANY row count — a 100 TB ledger "
    "sums to the same digits in any partition order), a fixed-point "
    "tax multiply at an explicitly pinned result scale "
    "(DECIMAL(24,4) — Spark and DuckDB infer different product "
    "scales, so the query pins it rather than trusting either "
    "engine's inference), and the mean derived as exact-sum -> one double division (both engines run the identical IEEE divide — DuckDB's avg(DECIMAL) returns DOUBLE internally, a different rounding path than Spark's exact-decimal average, so the query derives the mean deterministically instead).  Outputs "
    "cast to DOUBLE only at the very end: one exact-decimal -> "
    "binary conversion, deterministic in both engines, so the "
    "comparator sees identical doubles while every aggregation step "
    "was exact.  Scale: plain partial-aggregatable sums — DECIMAL "
    "adds zero shuffle cost over BIGINT here.",
)
def decimal_money_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    taxed = (price * F.lit(1.07).cast("decimal(4,2)")).cast("decimal(24,4)")
    return o.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(price).cast("double").alias("total_exact"),
        F.sum(taxed).cast("double").alias("total_taxed"),
        (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_ieee"),
        (F.max(price) - F.min(price)).cast("double").alias("range_exact"),
    )


_KSD_LO = 1000  # literal monitoring grid for the sketch KS (config, not data)
_KSD_STEP = 9500  # 64 bins cover prices 1000 .. 609000; outliers clip


@register(
    "kll_sketch_ks_drift",
    oracle=f"""
    WITH binned AS (
      SELECT CAST(greatest(least(floor((o_totalprice - {_KSD_LO})
                                 / {_KSD_STEP}.0), {_KSB_BINS - 1}), 0)
                  AS INT) AS bin,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
      FROM orders
      WHERE (o_totalprice IS NOT NULL AND abs(o_totalprice) < 1e9)
    ),
    hist AS (
      SELECT bin,
             CAST(sum(is_a) AS BIGINT) AS a,
             CAST(sum(1 - is_a) AS BIGINT) AS b
      FROM binned GROUP BY bin
    ),
    walked AS (
      SELECT bin,
             sum(a) OVER (ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             sum(b) OVER (ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      FROM hist
    ),
    tot AS (
      SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b
      FROM hist
    )
    SELECT t.n_a, t.n_b,
           round(max(abs(CAST(w.ca AS DOUBLE) / t.n_a
                         - CAST(w.cb AS DOUBLE) / t.n_b)), 6) AS ks_binned,
           TRUE AS sketch_within_5pct
    FROM walked w CROSS JOIN tot t
    GROUP BY t.n_a, t.n_b
    """,
    tags=("B20", "B16", "B7"),
    doc="KS drift FROM SKETCH TABLES (KLL, Spark 4.1): production "
    "drift monitors cannot rescan yesterday's raw data — they store "
    "one quantile sketch per (segment, day) and compare SKETCHES.  "
    "Two paths side by side: the deterministic binned KS over a "
    f"fixed literal {_KSB_BINS}-edge price grid (ks_drift_binned's "
    "exact-integer walk, the reported value — a LITERAL grid rather "
    "than a data-derived one because kll_sketch_get_rank demands "
    "foldable probe points, and a monitoring grid is a config "
    "constant anyway) and a sketch-only KS: two KLL sketches built "
    "in one scan, rank gaps at the same 63 literal edges as plain "
    "scalar expressions (no explode, no second pass), sup of the "
    "gaps.  The verdict asserts the sketch statistic lands within "
    "0.05 of the binned one (~1.65 percent rank error), keeping the "
    "output engine-exact under sketch randomness while proving the "
    "sketch-table path raises the same alarm.  ONE pruned scan "
    "builds range-free histograms AND both sketches together; the "
    "sketch arm never touches raw data again — which is the "
    "pattern's point.",
)
def kll_sketch_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scache_spark.functions import money_domain

    o = load_table(spark, sf_dir, "orders").where(money_domain("o_totalprice"))
    is_a = F.col("o_orderpriority") == "1-URGENT"
    price = F.col("o_totalprice")
    bin_col = (
        F.greatest(
            F.least(
                F.floor((price - _KSD_LO) / float(_KSD_STEP)),
                F.lit(_KSB_BINS - 1),
            ),
            F.lit(0),
        )
        .cast("int")
        .alias("bin")
    )
    # ONE scan: per-bin histogram for both sides AND both sketches.
    # The hist frame feeds two branches (cumulative walk + sketch
    # fold); it is <=64 rows, so an eager localCheckpoint makes the
    # single scan REAL instead of letting Catalyst re-derive the
    # aggregate per branch (scan-once rule, SCALE.md section 2).
    hist = o.groupBy(bin_col).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("long").alias("b"),
        F.kll_sketch_agg_double(F.when(is_a, price)).alias("sk_a"),
        F.kll_sketch_agg_double(F.when(~is_a, price)).alias("sk_b"),
    ).localCheckpoint(eager=True)
    wspec = bounded_window("bin", F.col("bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walked = hist.select(
        F.sum("a").over(wspec).alias("ca"),
        F.sum("b").over(wspec).alias("cb"),
    )
    # fold the <=64 per-bin sketches and total counts in one pass
    state = hist.agg(
        F.sum("a").cast("long").alias("n_a"),
        F.sum("b").cast("long").alias("n_b"),
        F.collect_list("sk_a").alias("ska"),
        F.collect_list("sk_b").alias("skb"),
    )
    fold = lambda col: kll_fold_double(col, _KSB_BINS)  # noqa: E731
    edges = [float(_KSD_LO + i * _KSD_STEP) for i in range(1, _KSB_BINS)]
    sk = state.select(
        "n_a",
        "n_b",
        fold("ska").alias("ma"),
        fold("skb").alias("mb"),
    ).select(
        "n_a",
        "n_b",
        F.greatest(
            *[
                F.abs(
                    F.kll_sketch_get_rank_double(F.col("ma"), F.lit(e))
                    - F.kll_sketch_get_rank_double(F.col("mb"), F.lit(e))
                )
                for e in edges
            ]
        ).alias("ks_sketch"),
    )
    ks_bin = (
        walked.crossJoin(F.broadcast(sk))
        .select(
            "n_a",
            "n_b",
            "ks_sketch",
            F.abs(
                F.col("ca").cast("double") / F.col("n_a")
                - F.col("cb").cast("double") / F.col("n_b")
            ).alias("gap"),
        )
        .groupBy("n_a", "n_b", "ks_sketch")
        .agg(F.round(F.max("gap"), 6).alias("ks_binned"))
    )
    return ks_bin.select(
        "n_a",
        "n_b",
        "ks_binned",
        (F.abs(F.col("ks_sketch") - F.col("ks_binned")) <= 0.05).alias(
            "sketch_within_5pct"
        ),
    )
