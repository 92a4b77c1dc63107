"""Balanced reduce pre-scheduling (SURVEY.md §2 A.2) — the reference's
signature algorithm, re-expressed Spark-first.

The reference's simulator schedules reduce tasks onto hosts with LPT
(longest-processing-time-first) bin packing: sort predicted reduce
sizes descending, repeatedly assign the largest remaining task to the
least-loaded host via a min-heap (`sim/sim.py:223-263`,
``schedule_with_pre``; the sift-down heap is `sim/sim.py:170-196`).
The probabilistic locality swap (`sim/sim.py:198-220`) is driven by an
unseeded ``random.random()`` and is therefore excluded under the
determinism contract (FIXTURES.md) — the LPT packing itself is the
load-balancing contribution.

Architecture at 100 TB: scheduling state is tiny — R reduce tasks and
K hosts — while the *input* to scheduling (per-task predicted sizes)
is a full-scale aggregate.  So the plan is: distributed partial
aggregation squeezes 100 TB down to R rows, then ONE grouped-map
pandas stage (state = R rows, the same place the reference's master
runs it) executes the greedy loop.  Nothing driver-side; the greedy
is itself a (tiny) distributed task.
"""

from __future__ import annotations

import heapq

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scache_spark.catalog import load_table
from scache_spark.operators.blocks import _BLOCK_VIEW_SQL, block_view
from scache_spark.registry import register

N_SCHED_HOSTS = 5  # matches blocks.N_HOSTS
N_SCHED_TASKS = 32  # reduce-task count for the scheduling view


def _lpt_pack(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy LPT: tasks sorted by (size desc, rid asc), each assigned
    to the least-loaded host; ties on load broken by lowest host id.
    heapq orders (load, host) tuples lexicographically, which IS that
    tie-break — and matches the oracle's list_indexof-of-first-min."""
    rows = pdf.sort_values(["sz", "rid"], ascending=[False, True])
    heap = [(0, h) for h in range(N_SCHED_HOSTS)]
    heapq.heapify(heap)
    out = []
    for rid, sz in zip(rows["rid"], rows["sz"]):
        load, host = heapq.heappop(heap)
        out.append((int(rid), int(sz), int(host)))
        heapq.heappush(heap, (load + int(sz), host))
    return pd.DataFrame(out, columns=["rid", "sz", "host"])


@register(
    "lpt_schedule",
    oracle=f"""
    WITH RECURSIVE tasks AS (
      SELECT CAST(l_suppkey % {N_SCHED_TASKS} AS INT) AS rid,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS sz
      FROM lineitem GROUP BY 1
    ),
    ordered AS (
      SELECT rid, sz,
             CAST(row_number() OVER (ORDER BY sz DESC, rid ASC) AS INT) AS rn
      FROM tasks
    ),
    assign AS (
      SELECT 0 AS rn, CAST(NULL AS INT) AS rid, CAST(NULL AS BIGINT) AS sz,
             CAST(NULL AS INT) AS host,
             [CAST(0 AS BIGINT) for i in range(1, {N_SCHED_HOSTS} + 1)] AS loads
      UNION ALL
      SELECT o.rn, o.rid, o.sz,
             CAST(list_indexof(a.loads, list_min(a.loads)) - 1 AS INT) AS host,
             [CASE WHEN i = list_indexof(a.loads, list_min(a.loads))
                   THEN a.loads[i] + o.sz ELSE a.loads[i] END
              for i in range(1, {N_SCHED_HOSTS} + 1)] AS loads
      FROM assign a JOIN ordered o ON o.rn = a.rn + 1
    )
    SELECT rid, sz, host FROM assign WHERE rn > 0
    """,
    tags=("A.2", "B23", "B26"),
    doc="LPT balanced reduce pre-scheduling (sim/sim.py:223-263): "
    f"{N_SCHED_TASKS} reduce tasks sorted by predicted size desc, each "
    "assigned to the least-loaded of "
    f"{N_SCHED_HOSTS} hosts (min-heap; load ties → lowest host id).  "
    "The oracle replays the identical greedy as a recursive CTE "
    "carrying the host-load vector.  Distributed agg → R-row greedy: "
    "the 100 TB never moves, only R predicted sizes do.",
)
def lpt_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    tasks = li.groupBy(
        (F.col("l_suppkey") % N_SCHED_TASKS).cast("int").alias("rid")
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("sz")
    )
    return (
        tasks.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(_lpt_pack, "rid int, sz long, host int")
    )


@register(
    "expected_reduce_size_weighted",
    oracle=f"""
    WITH blocks AS ({_BLOCK_VIEW_SQL}),
    fw AS (
      SELECT map, reduce, CAST(sum(size) AS BIGINT) AS mr
      FROM blocks WHERE map < 4 GROUP BY map, reduce
    ),
    fw_tot AS (SELECT map, CAST(sum(mr) AS BIGINT) AS mt FROM fw GROUP BY map),
    grid AS (
      SELECT m.map, r.reduce
      FROM (SELECT DISTINCT map FROM fw) m,
           (SELECT DISTINCT reduce FROM blocks) r
    ),
    probs AS (
      SELECT g.map, g.reduce,
             coalesce(f.mr, 0) * 1.0 / t.mt AS p
      FROM grid g
      LEFT JOIN fw f ON g.map = f.map AND g.reduce = f.reduce
      JOIN fw_tot t ON g.map = t.map
    ),
    phat AS (SELECT reduce, avg(p) AS ph FROM probs GROUP BY reduce),
    total AS (SELECT CAST(sum(size) AS BIGINT) AS all_bytes FROM blocks)
    SELECT reduce,
           round(ph, 8) AS p_hat,
           round(ph * all_bytes, 2) AS expected_size
    FROM phat, total
    """,
    tags=("B26", "A.5"),
    doc="predict_with_sample with OBSERVED first-wave probabilities "
    "(sim/train.py:34-60): instead of a uniform 1/8 map weight "
    "(expected_reduce_size), each reduce's share p̂(r) is the mean of "
    "the first-wave maps' (map < 4) observed per-map byte shares, and "
    "E[size(r)] = p̂(r) · total bytes.  The probability grid is "
    "completed with a maps×reduces cross join so absent (map,reduce) "
    "cells count as 0 — exactly the reference's distribution frame "
    "(`df_reduce[mapid, reduceid, prob]`).  First-wave state is "
    "K_maps×R cells regardless of corpus size.",
)
def expected_reduce_size_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    b = block_view(spark, sf_dir)
    # ONE aggregation squeezes the fact table to K_maps x R cells;
    # first-wave stats AND the global byte total both derive from
    # that small frame (total as an unpartitioned window), so the
    # 100 TB input is scanned exactly once
    cells = b.groupBy("map", "reduce").agg(
        F.sum("size").alias("mr")
    ).withColumn("all_bytes", F.sum("mr").over(Window.partitionBy()))
    fw = cells.filter(F.col("map") < 4)
    fw_tot = fw.groupBy("map").agg(F.sum("mr").alias("mt"))
    grid = fw.select("map").distinct().crossJoin(
        cells.select("reduce", "all_bytes").distinct()
    )
    probs = (
        grid.join(fw.select("map", "reduce", "mr"), ["map", "reduce"], "left")
        .join(fw_tot, "map")
        .select(
            "reduce",
            "all_bytes",
            (F.coalesce(F.col("mr"), F.lit(0)) * 1.0 / F.col("mt")).alias("p"),
        )
    )
    phat = probs.groupBy("reduce").agg(
        F.avg("p").alias("ph"), F.max("all_bytes").alias("all_bytes")
    )
    return phat.select(
        "reduce",
        F.round(F.col("ph"), 8).alias("p_hat"),
        F.round(F.col("ph") * F.col("all_bytes"), 2).alias("expected_size"),
    )
