"""Privacy operators: k-anonymity auditing and differentially-private
aggregate release.

The governance leg of a data platform: before a table (or an
aggregate) leaves the trust boundary, audit re-identification risk
(k-anonymity over the quasi-identifiers) and, where counts are
released, add calibrated noise.  Both are plain aggregates — the
100 TB input collapses to one row per quasi-identifier group, and the
audit/release math runs over that tiny frame.

Determinism contract: the Laplace noise is derived from a SEEDED
integer hash (md5-free closed form both engines replay), which makes
the release testable bit-for-bit.  A production deployment swaps the
hash-uniform for a real CSPRNG — one line — keeping the identical
plan; the point here is the pipeline shape and the calibration
arithmetic, stated honestly (deterministic "noise" provides no actual
privacy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scache_spark.catalog import load_table
from scache_spark.registry import register

K_ANON = 5


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH g AS (
      SELECT o_orderpriority AS qi1,
             CAST(year(o_orderdate) AS INT) AS qi2,
             CAST(count(*) AS BIGINT) AS grp_n
      FROM orders GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(count(*) FILTER (WHERE grp_n < {K_ANON}) AS BIGINT)
             AS n_violating,
           CAST(min(grp_n) AS BIGINT) AS min_group_size,
           round(sum(CASE WHEN grp_n < {K_ANON} THEN grp_n ELSE 0 END)
                 * 1.0 / sum(grp_n), 6) AS rows_at_risk_frac
    FROM g
    """,
    tags=("B7", "B19", "B20"),
    doc=f"k-anonymity audit (k={K_ANON}) over the quasi-identifier "
    "pair (order priority, order year): how many equivalence classes "
    "exist, how many are smaller than k, the worst class size, and "
    "the fraction of rows sitting in re-identifiable classes — the "
    "release gate a governance pipeline evaluates before publishing. "
    "One partial-aggregated groupBy; the audit itself is "
    "|classes|-sized.",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy(
        F.col("o_orderpriority").alias("qi1"),
        F.year("o_orderdate").cast("int").alias("qi2"),
    ).agg(F.count(F.lit(1)).cast("long").alias("grp_n"))
    viol = F.col("grp_n") < K_ANON
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.count_if(viol).cast("long").alias("n_violating"),
        F.min("grp_n").cast("long").alias("min_group_size"),
        F.round(
            F.sum(F.when(viol, F.col("grp_n")).otherwise(0)) * 1.0
            / F.sum("grp_n"),
            6,
        ).alias("rows_at_risk_frac"),
    )


_DP_EPS = 1.0
_DP_MOD = 1000003


@register(
    "dp_noisy_counts",
    oracle=f"""
    WITH c AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS true_n,
             CAST(count(DISTINCT user_id) AS BIGINT) AS h
      FROM events GROUP BY event_type
    ),
    u AS (
      SELECT event_type, true_n,
             ((h * 2654435761) % {_DP_MOD} + 0.5) / {_DP_MOD} AS unif
      FROM c
    )
    SELECT event_type, true_n,
           round(true_n + CASE WHEN unif < 0.5
                   THEN ln(2.0 * unif) / {_DP_EPS}
                   ELSE -ln(2.0 * (1.0 - unif)) / {_DP_EPS} END, 6)
             AS released_n
    FROM u
    """,
    tags=("B7", "B16", "B20"),
    doc="Differentially-private count release (Laplace mechanism, "
    "eps=1, sensitivity 1 for count queries): per-type event counts "
    "plus inverse-CDF Laplace noise, noise drawn from a SEEDED "
    "hash-uniform so both engines replay the release bit-for-bit "
    "(swap the hash for a CSPRNG in production — deterministic "
    "'noise' is a test harness, not privacy; the plan and "
    "calibration are the deliverable).  The release runs over the "
    "|types|-row aggregate, never the raw events.",
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("true_n"),
        F.countDistinct("user_id").cast("long").alias("h"),
    )
    unif = ((F.col("h") * 2654435761) % _DP_MOD + 0.5) / _DP_MOD
    noise = F.when(unif < 0.5, F.log(2.0 * unif) / _DP_EPS).otherwise(
        -F.log(2.0 * (1.0 - unif)) / _DP_EPS
    )
    return c.select(
        "event_type",
        "true_n",
        F.round(F.col("true_n") + noise, 6).alias("released_n"),
    )


L_DIV = 2


@register(
    "l_diversity_audit",
    oracle=f"""
    WITH g AS (
      SELECT o_orderpriority AS qi1,
             CAST(year(o_orderdate) AS INT) AS qi2,
             CAST(count(*) AS BIGINT) AS grp_n,
             CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_sensitive
      FROM orders GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(count(*) FILTER (WHERE n_sensitive < {L_DIV}) AS BIGINT)
             AS n_low_diversity,
           CAST(min(n_sensitive) AS BIGINT) AS min_diversity,
           round(sum(CASE WHEN n_sensitive < {L_DIV} THEN grp_n ELSE 0 END)
                 * 1.0 / sum(grp_n), 6) AS rows_exposed_frac
    FROM g
    """,
    tags=("B7", "B19", "B20"),
    doc=f"l-diversity audit (l={L_DIV}), k-anonymity's companion: a "
    "quasi-identifier class can be large yet still leak if every row "
    "shares one sensitive value (here order status) — homogeneity "
    "attack.  Reports classes below l distinct sensitive values and "
    "the row mass exposed.  Same shape as k_anonymity_audit: one "
    "grouped aggregate (count + count distinct per class), audit "
    "math over the |classes|-row frame.",
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy(
        F.col("o_orderpriority").alias("qi1"),
        F.year("o_orderdate").cast("int").alias("qi2"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("grp_n"),
        F.countDistinct("o_orderstatus").cast("long").alias("n_sensitive"),
    )
    low = F.col("n_sensitive") < L_DIV
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.count_if(low).cast("long").alias("n_low_diversity"),
        F.min("n_sensitive").cast("long").alias("min_diversity"),
        F.round(
            F.sum(F.when(low, F.col("grp_n")).otherwise(0)) * 1.0 / F.sum("grp_n"),
            6,
        ).alias("rows_exposed_frac"),
    )


@register(
    "deletion_plan_partitions",
    oracle="""
    WITH dels AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
    ),
    per_part AS (
      SELECT e.event_type,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN d.user_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hits
      FROM events e LEFT JOIN dels d ON e.user_id = d.user_id
      GROUP BY e.event_type
    )
    SELECT event_type, n_rows, n_hits,
           round(n_hits * 1.0 / n_rows, 6) AS hit_frac,
           CASE WHEN n_hits = 0 THEN 'skip'
                WHEN n_hits * 1.0 / n_rows < 0.05 THEN 'deletion_vector'
                ELSE 'rewrite' END AS action
    FROM per_part
    """,
    tags=("B21", "B6", "governance"),
    doc="Right-to-erasure delete PLANNING (the lakehouse deletion-"
    "vector decision): given a subject-key delete set (user_id "
    "multiples of 97 — the GDPR request batch), each partition "
    "reports its hit count and the cheapest compliant action — skip "
    "untouched partitions, write a deletion vector where hits are "
    "sparse (<5%), rewrite where dense.  The delete set joins "
    "broadcast (request batches are small against 100 TB), hit "
    "counting partial-aggregates per partition key, and the planning "
    "output is one row per partition — a metadata-scale frame the "
    "rewrite job consumes.  Complements compaction_plan_ffd (the "
    "other table-maintenance planner) and the k-anonymity/DP release "
    "gates on the governance side.",
)
def deletion_plan_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dels = (
        e.filter(F.col("user_id") % 97 == 0)
        .select("user_id")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per_part = (
        e.join(F.broadcast(dels), "user_id", "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_hits"),
        )
    )
    frac = F.col("n_hits") * 1.0 / F.col("n_rows")
    return per_part.select(
        "event_type",
        "n_rows",
        "n_hits",
        F.round(frac, 6).alias("hit_frac"),
        F.when(F.col("n_hits") == 0, "skip")
        .when(frac < 0.05, "deletion_vector")
        .otherwise("rewrite")
        .alias("action"),
    )
