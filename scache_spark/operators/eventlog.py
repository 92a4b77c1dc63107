"""Spark-event-log parsing pipeline (SURVEY.md §2 — the reference's
trace tooling, B14+B18 on the reference's own data shape).

The reference mines Spark event logs / executor logs into task-metric
frames: ``parse_log`` splits "Added ... block_id ... size" lines into
(job, shuffle, map, reduce, size) rows (`sim/train.py:64-87`), and
``parse_spark_log`` walks log text for shuffle/distribution records
(`sim/train.py:89-131`); block ids themselves are regex-parsed
(`storage/BlockId.scala:98-131`).

Here the same pipeline is one declarative plan: render event-log JSON
lines (the SparkListenerTaskEnd shape) from lineitem, then parse them
back — get_json_object field extraction, regexp host-id parsing,
from_json array-of-struct decode + explode — and aggregate per
(stage, host).  The oracle computes the identical metrics straight
from lineitem, so any loss in the render→parse round trip is a
mismatch.  At 100 TB the render step is replaced by reading real log
files (`sources.read_jsonl`); everything downstream is unchanged —
parsing is per-line (narrow), the only shuffle is the final small
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scache_spark.catalog import load_table
from scache_spark.registry import register

_ACCUM_SCHEMA = "array<struct<Name:string,Value:bigint>>"


def _render_log_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One SparkListenerTaskEnd-shaped JSON line per sampled lineitem
    row — deterministic, so the parse stage has an exact oracle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 50 == 0
    )
    return li.select(
        F.format_string(
            '{"Event":"SparkListenerTaskEnd","Stage ID":%d,'
            '"Task Info":{"Task ID":%d,"Host":"host-%d.cluster.local"},'
            '"Task Metrics":{"Accumulables":['
            '{"Name":"internal.metrics.shuffleBytesWritten","Value":%d},'
            '{"Name":"internal.metrics.executorRunTime","Value":%d}]}}',
            (F.col("l_orderkey") % 4).cast("int"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long"),
            (F.col("l_suppkey") % 5).cast("int"),
            F.floor(F.col("l_extendedprice") * 100).cast("long"),
            F.floor(F.col("l_quantity") * 10).cast("long"),
        ).alias("line")
    )


@register(
    "event_log_parse",
    oracle="""
    WITH raw AS (
      SELECT CAST(l_orderkey % 4 AS INT) AS stage_id,
             CAST(l_suppkey % 5 AS INT) AS host_num,
             l_orderkey * 10 + l_linenumber AS task_id,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS shuffle_bytes,
             CAST(floor(l_quantity * 10) AS BIGINT) AS run_time
      FROM lineitem WHERE l_orderkey % 50 = 0
    ),
    tasks AS (
      -- the fixture repeats (orderkey, linenumber) pairs, i.e. a task
      -- id can appear in several log lines (task retries); keep one
      -- record per task with max-metrics, exactly as the Spark plan's
      -- per-task regroup does
      SELECT stage_id, host_num, task_id,
             max(shuffle_bytes) AS shuffle_bytes,
             max(run_time) AS run_time
      FROM raw GROUP BY 1, 2, 3
    )
    SELECT stage_id, host_num,
           CAST(count(*) AS BIGINT) AS n_tasks,
           CAST(count(DISTINCT task_id) AS BIGINT) AS n_task_ids,
           CAST(sum(shuffle_bytes) AS BIGINT) AS total_shuffle_bytes,
           CAST(sum(run_time) AS BIGINT) AS total_run_time,
           CAST(max(shuffle_bytes) AS BIGINT) AS max_task_bytes
    FROM tasks GROUP BY stage_id, host_num
    """,
    tags=("B14", "B18", "A.5"),
    doc="Event-log mining pipeline (sim/train.py:64-131 analog): "
    "render SparkListenerTaskEnd JSON lines, then parse them back — "
    "get_json_object scalar fields, regexp_extract the host ordinal "
    "from 'host-N.cluster.local' (BlockId.scala:98-131 style), "
    "from_json + explode the Accumulables array — and aggregate task "
    "metrics per (stage, host).  The oracle computes the same metrics "
    "directly from lineitem: the render→parse round trip must be "
    "lossless to match.",
)
def event_log_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _render_log_lines(spark, sf_dir)
    parsed = lines.select(
        F.get_json_object("line", "$['Stage ID']").cast("int").alias("stage_id"),
        F.regexp_extract(
            F.get_json_object("line", "$['Task Info'].Host"), r"host-(\d+)\.", 1
        )
        .cast("int")
        .alias("host_num"),
        F.get_json_object("line", "$['Task Info']['Task ID']")
        .cast("long")
        .alias("task_id"),
        F.from_json(
            F.get_json_object("line", "$['Task Metrics'].Accumulables"),
            _ACCUM_SCHEMA,
        ).alias("accums"),
    )
    metrics = parsed.select(
        "stage_id", "host_num", "task_id", F.explode("accums").alias("a")
    ).select(
        "stage_id",
        "host_num",
        "task_id",
        F.col("a.Name").alias("metric"),
        F.col("a.Value").alias("value"),
    )
    wide = metrics.groupBy("stage_id", "host_num", "task_id").agg(
        F.max(
            F.when(
                F.col("metric") == "internal.metrics.shuffleBytesWritten",
                F.col("value"),
            )
        ).alias("shuffle_bytes"),
        F.max(
            F.when(
                F.col("metric") == "internal.metrics.executorRunTime",
                F.col("value"),
            )
        ).alias("run_time"),
    )
    return wide.groupBy("stage_id", "host_num").agg(
        F.count(F.lit(1)).cast("long").alias("n_tasks"),
        F.countDistinct("task_id").cast("long").alias("n_task_ids"),
        F.sum("shuffle_bytes").alias("total_shuffle_bytes"),
        F.sum("run_time").alias("total_run_time"),
        F.max("shuffle_bytes").alias("max_task_bytes"),
    )
