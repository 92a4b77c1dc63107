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


# ---------------------------------------------------------------------------
# task-span / host-utilization alignment (sim/util.py as one plan)
# ---------------------------------------------------------------------------

_AL_BUCKET = 60  # seconds per alignment bucket


@register(
    "task_host_utilization_align",
    oracle=f"""
    WITH raw AS (
      SELECT l_orderkey * 10 + l_linenumber AS task_id,
             CAST(l_suppkey % 5 AS INT) AS host_num,
             CAST(1000 + (l_orderkey * 10 + l_linenumber) % 500 AS BIGINT)
               AS t0,
             CAST(floor(l_quantity * 10) AS BIGINT) AS run_time
      FROM lineitem WHERE l_orderkey % 50 = 0
    ),
    spans AS (
      SELECT task_id, host_num, t0, t0 + max(run_time) AS t1
      FROM raw GROUP BY task_id, host_num, t0
    ),
    monitor AS (
      SELECT CAST(user_id % 5 AS INT) AS host_num,
             CAST(1000 + event_id % 600 AS BIGINT) AS ts_s,
             value AS util
      FROM events WHERE event_id % 20 = 0
    ),
    aligned AS (
      SELECT s.host_num, s.task_id, m.util
      FROM spans s JOIN monitor m
        ON s.host_num = m.host_num
       AND m.ts_s BETWEEN s.t0 AND s.t1
    )
    SELECT s.host_num,
           CAST(count(DISTINCT s.task_id) AS BIGINT) AS n_tasks,
           round(avg(s.t1 - s.t0), 6) AS avg_task_seconds,
           (SELECT CAST(count(*) AS BIGINT) FROM aligned a
            WHERE a.host_num = s.host_num) AS n_aligned_samples,
           (SELECT round(avg(a.util), 6) FROM aligned a
            WHERE a.host_num = s.host_num) AS avg_util_during_tasks
    FROM spans s GROUP BY s.host_num
    """,
    tags=("B14", "B18", "A.5", "temporal"),
    doc="The reference's trace-alignment tool (sim/util.py: pair "
    "TaskStart launch times with TaskEnd metrics per task, then line "
    "the spans up against host cpu/net/disk monitor samples) as ONE "
    "declarative plan: task spans parsed from rendered "
    "TaskStart/TaskEnd JSON event-log lines (start/end joined per "
    "task — util.py's dict pairing), host monitor samples derived "
    "from the event stream, and the span-overlap alignment executed "
    f"as an equi-join on {_AL_BUCKET}s epoch buckets (spans explode "
    "to the buckets they cover — fan-out bounded by max task length "
    "— samples map to one) with the BETWEEN as residual filter: no "
    "broadcast-nested-loop, no cross product, per-host utilization "
    "during task execution at any scale.",
)
def task_host_utilization_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 50 == 0
    )
    tid = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long")
    # render BOTH event types, as a real log file interleaves them —
    # emitted from ONE scan via explode (a union of two rendered arms
    # would re-scan lineitem per arm)
    start_line = F.format_string(
        '{"Event":"SparkListenerTaskStart","Task Info":{"Task ID":%d,'
        '"Host":"host-%d.cluster.local","Launch Time":%d}}',
        tid,
        (F.col("l_suppkey") % 5).cast("int"),
        (1000 + tid % 500).cast("long"),
    )
    end_line = F.format_string(
        '{"Event":"SparkListenerTaskEnd","Task Info":{"Task ID":%d,'
        '"Host":"host-%d.cluster.local"},'
        '"Task Metrics":{"Run Time":%d}}',
        tid,
        (F.col("l_suppkey") % 5).cast("int"),
        F.floor(F.col("l_quantity") * 10).cast("long"),
    )
    lines = li.select(
        F.explode(F.array(start_line, end_line)).alias("line")
    )
    ev = F.get_json_object("line", "$.Event")
    parsed = lines.select(
        ev.alias("event"),
        F.get_json_object("line", "$['Task Info']['Task ID']")
        .cast("long")
        .alias("task_id"),
        F.regexp_extract(
            F.get_json_object("line", "$['Task Info'].Host"), r"host-(\d+)\.", 1
        )
        .cast("int")
        .alias("host_num"),
        F.get_json_object("line", "$['Task Info']['Launch Time']")
        .cast("long")
        .alias("launch"),
        F.get_json_object("line", "$['Task Metrics']['Run Time']")
        .cast("long")
        .alias("run_time"),
    )
    # util.py's per-task dict pairing = group per task: launch from the
    # start record, max run time from end records (retries keep max)
    spans = (
        parsed.groupBy("task_id", "host_num")
        .agg(
            F.max("launch").alias("t0"),
            F.max("run_time").alias("run_time"),
        )
        .select(
            "task_id", "host_num", "t0", (F.col("t0") + F.col("run_time")).alias("t1")
        )
        # spans feed the bucket explode AND the per-host task stats —
        # checkpoint (task-count rows) so the log parse runs once
        .localCheckpoint(eager=True)
    )
    monitor = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 20 == 0)
        .select(
            (F.col("user_id") % 5).cast("int").alias("host_num"),
            (1000 + F.col("event_id") % 600).cast("long").alias("ts_s"),
            F.col("value").alias("util"),
        )
    )
    b = _AL_BUCKET
    task_buckets = spans.select(
        "task_id",
        "host_num",
        "t0",
        "t1",
        F.explode(
            F.sequence(F.floor(F.col("t0") / b), F.floor(F.col("t1") / b))
        ).alias("bkt"),
    )
    sample_buckets = monitor.withColumn("bkt", F.floor(F.col("ts_s") / b))
    aligned = task_buckets.join(sample_buckets, ["host_num", "bkt"]).filter(
        F.col("ts_s").between(F.col("t0"), F.col("t1"))
    )
    per_host_align = aligned.groupBy("host_num").agg(
        F.count(F.lit(1)).cast("long").alias("n_aligned_samples"),
        F.round(F.avg("util"), 6).alias("avg_util_during_tasks"),
    )
    per_host_tasks = spans.groupBy("host_num").agg(
        F.countDistinct("task_id").cast("long").alias("n_tasks"),
        F.round(F.avg(F.col("t1") - F.col("t0")), 6).alias("avg_task_seconds"),
    )
    return per_host_tasks.join(F.broadcast(per_host_align), "host_num", "left").select(
        "host_num",
        "n_tasks",
        "avg_task_seconds",
        # a host with tasks but no overlapping monitor samples is a
        # COUNT of 0 (the oracle's correlated count(*)), not NULL;
        # avg_util stays NULL in both engines
        F.coalesce("n_aligned_samples", F.lit(0).cast("long")).alias(
            "n_aligned_samples"
        ),
        "avg_util_during_tasks",
    )
