"""Physical partition-placement probe promised by the
``partition_stats`` docstring (operators/blocks.py).

``partition_stats`` reports per-partition statistics under the
DETERMINISTIC partition function ``pmod(l_orderkey, 8)`` and claims
that is exactly what a ``HashPartitioner(8)`` computes for the key
(reference: ShuffleDependency partitioner wiring,
core/src/main/scala/org/scache/Dependency.scala — partition id =
``key.hashCode mod numPartitions``).  Physical layout is not
oracle-matchable by design, so the claim is verified HERE instead:
we actually shuffle the rows through a hash partitioner and read back
``spark_partition_id()`` / mapPartitionsWithIndex, then compare the
observed physical histogram with the declarative pmod histogram.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scache_spark.catalog import load_table
from tests.conftest import SF_DIR


def _pmod_histogram(spark) -> dict[int, int]:
    li = load_table(spark, SF_DIR, "lineitem")
    rows = (
        li.groupBy(F.pmod(F.col("l_orderkey"), F.lit(8)).cast("int").alias("pid"))
        .count()
        .collect()
    )
    return {r["pid"]: r["count"] for r in rows}


def test_hash_partitioner_places_keys_at_pmod(spark):
    """RDD HashPartitioner(8) physically places key k in partition
    k % 8 for non-negative integer keys (Python portable_hash(int) is
    the int itself), so the physical per-partition counts must equal
    the declarative pmod(l_orderkey, 8) histogram partition-for-
    partition."""
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    pairs = li.rdd.map(lambda r: (r["l_orderkey"], 1)).partitionBy(8)
    physical = dict(
        pairs.mapPartitionsWithIndex(
            lambda pid, it: [(pid, sum(1 for _ in it))]
        ).collect()
    )
    declared = _pmod_histogram(spark)
    # every partition with rows must agree exactly
    assert {p: n for p, n in physical.items() if n} == declared


def test_spark_partition_id_after_key_repartition(spark):
    """DataFrame-side probe: after repartition(8, pid) every
    pmod-class lives in exactly ONE physical partition
    (spark_partition_id) — hash partitioning never splits equal keys.
    (The converse is NOT guaranteed: two pid classes may hash-collide
    into one physical partition.)  This is the co-location property
    partition_stats reasons about."""
    li = load_table(spark, SF_DIR, "lineitem")
    pidded = li.select(
        F.pmod(F.col("l_orderkey"), F.lit(8)).cast("int").alias("pid")
    ).repartition(8, "pid")
    split = (
        pidded.withColumn("phys", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.countDistinct("phys").alias("n_phys"))
        .agg(F.max("n_phys").alias("worst"))
        .collect()[0]["worst"]
    )
    assert split == 1
