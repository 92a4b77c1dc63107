"""Shuffle doctor: the reference's whole control-plane story as one
diagnostic workflow over a live shuffle's block statistics.

The reference (SCache) exists to make shuffles fast: it tracks
per-block sizes (MapStatus), compresses them when reducers multiply
(HighlyCompressedMapStatus), predicts per-reduce totals, and
pre-schedules reduces to hosts (LPT + locality).  This demo runs that
exact diagnosis-to-action pipeline over the deterministic block view:

  1. size the shuffle       — block_size_stats (log1.1 MapStatus encoding)
  2. compress the metadata  — mapstatus_highly_compressed (avg + empty
                              bitmap, with the decode error it costs)
  3. find the hot reducer   — skew_split_plan (1.25x-mean test)
  4. plan the mitigation    — the same query's ceil-div split counts
                              and the makespan before/after
  5. race the schedulers    — schedule_policy_compare (round-robin /
                              fifo / LPT / coflow / ideal)

Run: python examples/shuffle_doctor.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scache_spark.operators.blocks import (
    block_size_stats,
    mapstatus_highly_compressed,
    skew_split_plan,
)
from scache_spark.operators.scheduling import schedule_policy_compare
from scache_spark.session import get_session


def main(sf_dir: str) -> None:
    spark = get_session("shuffle-doctor")

    print("== 1/2. MapStatus sizes + compressed statuses ==")
    sizes = block_size_stats(spark, sf_dir)
    sizes.orderBy("shuffle", "reduce").show(8)
    comp = mapstatus_highly_compressed(spark, sf_dir)
    err = comp.agg(
        F.sum("decode_abs_err").alias("total_decode_err"),
        F.count(F.lit(1)).alias("n_statuses"),
    )
    err.show()

    print("== 3/4. Skew diagnosis -> split plan ==")
    plan = skew_split_plan(spark, sf_dir)
    plan.orderBy("shuffle", "reduce").show(8)
    win = plan.select(
        "shuffle", "makespan_before", "makespan_after"
    ).distinct()
    win.withColumn(
        "improvement_pct",
        F.round(
            100.0
            * (F.col("makespan_before") - F.col("makespan_after"))
            / F.col("makespan_before"),
            1,
        ),
    ).orderBy("shuffle").show()

    print("== 5. Scheduler race over the same task frame ==")
    schedule_policy_compare(spark, sf_dir).orderBy("makespan").show()

    # no spark.stop(): the session is shared when main() is driven
    # in-process (tests/test_examples.py); CLI exit tears the JVM down


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
