"""M6: shuffle observability + prefetch overlap."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from scache_spark.catalog import load_table
from scache_spark.prefetch import prefetch, shuffle_stats


def test_shuffle_stats_reports_exchanges(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("q"))
    )
    stats = shuffle_stats(df)
    assert len(stats) >= 1
    s = stats[0]
    # partial agg runs map-side: the shuffle carries ≤ (#flags × #tasks)
    # rows, never the input rows — the MapStatus-style size check
    assert s.rows is not None and 0 < s.rows < 1000
    assert s.data_size_bytes is not None and s.data_size_bytes > 0


def test_prefetch_overlap_and_reuse(spark, sf_dir):
    base = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_extendedprice").alias("total"))
    )
    h = prefetch(base)
    try:
        df = h.await_ready(timeout=120)
        assert h.ready
        # consumer starts from cache: InMemoryTableScan in its plan
        consumer = df.filter(F.col("total") > 1000)
        consumer.count()
        plan = consumer._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan or "Scan In-memory" in plan, plan
        # cached read is not slower than an order of magnitude vs cold
        t0 = time.time()
        df.count()
        assert time.time() - t0 < 10
    finally:
        h.df.unpersist(blocking=True)
