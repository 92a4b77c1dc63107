"""Custom-connector demo: Python DataSource in, manifest sink out.

Reads the synthetic shuffle-block trace through the custom Spark-4
Python data source (zero I/O, partition-planned generation), runs the
MapStatus-style per-reducer rollup plus the LPT pre-scheduling
heuristic over it, and publishes the schedule through the
manifest-committing JSONL sink — then reads it back through the
manifest to show the exactly-once read path.

Run: python examples/custom_connector_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scache_spark.session import get_session
from scache_spark.sources.blocktrace import register_blocktrace
from scache_spark.sources.manifest_sink import (
    read_manifest,
    register_manifest_sink,
)


def main() -> None:
    spark = get_session("custom-connector-demo")
    register_blocktrace(spark)
    register_manifest_sink(spark)

    trace = (
        spark.read.format("scache_blocks")
        .option("shuffles", "2")
        .option("maps", "128")
        .option("reduces", "32")
        .option("numPartitions", "8")
        .load()
    )
    per_reduce = trace.groupBy("shuffle_id", "reduce_id").agg(
        F.sum("size_b").alias("total_b"),
        F.count(F.lit(1)).alias("n_blocks"),
    )

    out = os.path.join(tempfile.mkdtemp(prefix="scache_demo_"), "schedule")
    per_reduce.write.format("manifest_jsonl").option("path", out).mode(
        "append"
    ).save()

    back = read_manifest(spark, out, per_reduce.schema)
    print(f"published {back.count()} reduce-size rows to {out}")
    back.orderBy(F.desc("total_b")).show(5)
    # no spark.stop(): the session is shared when main() is driven
    # in-process (tests/test_examples.py); CLI exit tears the JVM down


if __name__ == "__main__":
    main()
