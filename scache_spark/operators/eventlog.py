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
      -- host parse contract (§18): the rendered ordinal is the
      -- SIGNED REMAINDER l_suppkey % 5, and 'host-(\\d+)' resolves it
      -- iff it is non-negative — so a negative suppkey that divides
      -- evenly (e.g. -5) still renders host-0 and parses, while -3
      -- renders host--3 and reads as NULL (found by the r8 property
      -- fuzz, not the fixed plants)
      SELECT CAST(l_orderkey % 4 AS INT) AS stage_id,
             CASE WHEN l_suppkey % 5 >= 0
                  THEN CAST(l_suppkey % 5 AS INT) END AS host_num,
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
    # Parse-layer contract (SCALE.md §18): a log parser never crashes
    # on garbage — every token->number conversion is try_cast, so an
    # unparseable host ("host--3", "host-null") or a "null" metric
    # token degrades to NULL instead of aborting the scan under ANSI.
    parsed = lines.select(
        F.get_json_object("line", "$['Stage ID']")
        .try_cast("int")
        .alias("stage_id"),
        F.regexp_extract(
            F.get_json_object("line", "$['Task Info'].Host"), r"host-(\d+)\.", 1
        )
        .try_cast("int")
        .alias("host_num"),
        F.get_json_object("line", "$['Task Info']['Task ID']")
        .try_cast("long")
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
# §18: longest span the aligner will bucket-explode.  A parsed
# duration beyond this is garbage (no task runs a day); without the
# cap one bad metric row makes sequence() materialize billions of
# buckets.  The cap bounds the per-row explode fan-out at any scale.
_AL_MAX_SPAN = 86_400


@register(
    "task_host_utilization_align",
    oracle=f"""
    WITH raw AS (
      -- host parse contract (§18): the parse resolves the signed
      -- remainder iff non-negative (see event_log_parse)
      SELECT l_orderkey * 10 + l_linenumber AS task_id,
             CASE WHEN l_suppkey % 5 >= 0
                  THEN CAST(l_suppkey % 5 AS INT) END AS host_num,
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
      -- physical-span contract (§18): only spans with a plausible
      -- duration align — out-of-order (t1 < t0), absurd (> {_AL_MAX_SPAN}s,
      -- a garbage metric would otherwise explode the bucket range)
      -- and NULL-duration spans are excluded from alignment while
      -- still counting in the per-host task stats
      SELECT s.host_num, s.task_id, m.util
      FROM spans s JOIN monitor m
        ON s.host_num = m.host_num
       AND m.ts_s BETWEEN s.t0 AND s.t1
      WHERE s.t1 - s.t0 BETWEEN 0 AND {_AL_MAX_SPAN}
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
    # try_cast throughout: parse garbage degrades to NULL (§18)
    parsed = lines.select(
        ev.alias("event"),
        F.get_json_object("line", "$['Task Info']['Task ID']")
        .try_cast("long")
        .alias("task_id"),
        F.regexp_extract(
            F.get_json_object("line", "$['Task Info'].Host"), r"host-(\d+)\.", 1
        )
        .try_cast("int")
        .alias("host_num"),
        F.get_json_object("line", "$['Task Info']['Launch Time']")
        .try_cast("long")
        .alias("launch"),
        F.get_json_object("line", "$['Task Metrics']['Run Time']")
        .try_cast("long")
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
    # physical-span contract (§18): only plausible durations align —
    # the filter both defines the semantics (garbage spans don't
    # contribute utilization) and bounds the sequence() fan-out (an
    # unguarded 1e13-second parsed duration would materialize ~1e11
    # bucket rows from ONE garbage line)
    task_buckets = spans.filter(
        (F.col("t1") - F.col("t0")).between(0, _AL_MAX_SPAN)
    ).select(
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


# ---------------------------------------------------------------------------
# Hadoop attempt.csv trace parsing (sim/sim.py:278's other input leg)
# ---------------------------------------------------------------------------

_ATT_SCHEMA = (
    "jtid BIGINT, jobid INT, tasktype STRING, taskid BIGINT, attempt INT,"
    " startTime STRING, shuffleTime STRING, sortTime STRING,"
    " finishTime STRING, status STRING, rack STRING, hostname STRING"
)
_ATT_MIN_TASKS = 6  # sim.py:289-292 drops jobs with < 6 reduce attempts


def _render_attempt_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One attempt.csv record per sampled lineitem row, with planted
    empty time/status fields (the NA cells sim.py's ``deal_na_int``
    converts to -1) and planted failed attempts (status 1)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 50 == 0
    )
    jtid = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long")
    start = (1000 + jtid % 500).cast("long")
    shuf = start + F.floor(F.col("l_quantity") * 5).cast("long")
    sort = shuf + F.floor(F.col("l_discount") * 100).cast("long")
    fin = sort + F.floor(F.col("l_tax") * 200).cast("long") + 10
    na_t = F.col("l_suppkey") % 11 == 0  # shuffle/sort columns blank
    na_f = F.col("l_suppkey") % 13 == 0  # finish column blank
    return li.select(
        F.format_string(
            "%d,%d,%s,%d,0,%d,%s,%s,%s,%s,/rack-%d,node%d",
            jtid,
            (F.col("l_orderkey") % 8).cast("int"),
            F.when(F.col("l_linenumber") % 2 == 0, "r").otherwise("m"),
            F.col("l_partkey").cast("long"),
            start,
            F.when(na_t, "").otherwise(shuf.cast("string")),
            F.when(na_t, "").otherwise(sort.cast("string")),
            F.when(na_f, "").otherwise(fin.cast("string")),
            F.when(F.col("l_suppkey") % 17 == 0, "1").otherwise("0"),
            (F.col("l_suppkey") % 3).cast("int"),
            (F.col("l_suppkey") % 5).cast("int"),
        ).alias("line")
    )


# The raw/dedup/reduces derivation, shared between this query's oracle
# and the trace-fed scheduler race (scheduling.schedule_race_from_trace)
# so the render math lives in exactly two places: the Spark renderer
# above and THIS fragment.
ATTEMPT_REDUCES_SQL = """
    raw AS (
      -- deal_na_int contract (§18): a NULL source metric renders the
      -- literal "null" into the CSV cell, and the parser coerces ANY
      -- unparseable cell to -1 — so every time expression coalesces
      -- to -1 exactly like the blank-cell arm
      SELECT l_orderkey * 10 + l_linenumber AS jtid,
             CAST(l_orderkey % 8 AS INT) AS jobid,
             CASE WHEN l_linenumber % 2 = 0 THEN 'r' ELSE 'm' END AS tasktype,
             CAST(1000 + (l_orderkey * 10 + l_linenumber) % 500 AS BIGINT)
                 AS start_t,
             coalesce(CASE WHEN l_suppkey % 11 = 0 THEN -1
                  ELSE CAST(1000 + (l_orderkey * 10 + l_linenumber) % 500
                            + floor(l_quantity * 5) AS BIGINT) END,
                  -1) AS shuf_t,
             coalesce(CASE WHEN l_suppkey % 11 = 0 THEN -1
                  ELSE CAST(1000 + (l_orderkey * 10 + l_linenumber) % 500
                            + floor(l_quantity * 5)
                            + floor(l_discount * 100) AS BIGINT) END,
                  -1) AS sort_t,
             coalesce(CASE WHEN l_suppkey % 13 = 0 THEN -1
                  ELSE CAST(1000 + (l_orderkey * 10 + l_linenumber) % 500
                            + floor(l_quantity * 5) + floor(l_discount * 100)
                            + floor(l_tax * 200) + 10 AS BIGINT) END,
                  -1) AS fin_t,
             CASE WHEN l_suppkey % 17 = 0 THEN 1 ELSE 0 END AS status
      FROM lineitem WHERE l_orderkey % 50 = 0
    ),
    dedup AS (
      -- the fixture repeats (orderkey, linenumber) pairs: keep one
      -- record per attempt id, max-fields (same regroup as the Spark
      -- plan after the CSV parse)
      SELECT jtid, jobid, tasktype,
             max(start_t) AS start_t, max(shuf_t) AS shuf_t,
             max(sort_t) AS sort_t, max(fin_t) AS fin_t,
             max(status) AS status
      FROM raw GROUP BY 1, 2, 3
    ),
    reduces AS (
      SELECT * FROM dedup WHERE tasktype = 'r' AND status = 0
    )
"""


def parsed_attempt_reduces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render -> from_csv parse -> deal_na_int typing -> per-attempt
    dedup -> status-0 reduce filter: the cleaned reduce-attempt frame
    both the per-job stats query and the trace-fed scheduler race
    consume (mirrors the ATTEMPT_REDUCES_SQL fragment)."""
    lines = _render_attempt_csv(spark, sf_dir)
    rec = lines.select(
        F.from_csv(F.col("line"), _ATT_SCHEMA).alias("r")
    ).select("r.*")
    # deal_na_int (sim.py:21-25) generalized: ANY unparseable cell —
    # blank, "null" (a NULL metric rendered into the line), stray text
    # — coerces to -1 via try_cast, never a crash (§18).
    na = lambda c: F.coalesce(  # noqa: E731
        F.col(c).try_cast("long"), F.lit(-1).cast("long")
    )
    typed = rec.select(
        "jtid",
        "jobid",
        "tasktype",
        F.col("startTime").try_cast("long").alias("start_t"),
        na("shuffleTime").alias("shuf_t"),
        na("sortTime").alias("sort_t"),
        na("finishTime").alias("fin_t"),
        na("status").cast("int").alias("status"),
    )
    dedup = typed.groupBy("jtid", "jobid", "tasktype").agg(
        F.max("start_t").alias("start_t"),
        F.max("shuf_t").alias("shuf_t"),
        F.max("sort_t").alias("sort_t"),
        F.max("fin_t").alias("fin_t"),
        F.max("status").alias("status"),
    )
    return dedup.filter((F.col("tasktype") == "r") & (F.col("status") == 0))



@register(
    "hadoop_attempt_trace_parse",
    oracle=f"""
    WITH {ATTEMPT_REDUCES_SQL},
    complete AS (
      SELECT * FROM reduces
      WHERE shuf_t <> -1 AND sort_t <> -1 AND fin_t <> -1
    )
    SELECT r.jobid,
           CAST(count(*) AS BIGINT) AS n_reduce_tasks,
           CAST(count(*) - (SELECT count(*) FROM complete c
                            WHERE c.jobid = r.jobid) AS BIGINT)
               AS n_incomplete,
           (SELECT CAST(sum(fin_t - start_t - (sort_t - shuf_t)) AS BIGINT)
            FROM complete c WHERE c.jobid = r.jobid) AS total_run_time,
           (SELECT CAST(max(sort_t - shuf_t) AS BIGINT)
            FROM complete c WHERE c.jobid = r.jobid) AS coflow_bottleneck,
           (SELECT round(avg((sort_t - shuf_t) * 1.0 / (fin_t - start_t)), 6)
            FROM complete c WHERE c.jobid = r.jobid) AS avg_shuffle_frac
    FROM reduces r
    GROUP BY r.jobid
    HAVING count(*) >= {_ATT_MIN_TASKS}
    """,
    tags=("B14", "B18", "A.5"),
    doc="Hadoop attempt-trace mining (sim/sim.py:278-292's OTHER log "
    "leg, beside the Spark event logs event_log_parse covers): render "
    "attempt.csv records [jtid, jobid, tasktype, taskid, attempt, "
    "startTime, shuffleTime, sortTime, finishTime, status, rack, "
    "hostname] with planted BLANK time cells and failed attempts, "
    "parse them back with from_csv, apply deal_na_int's blank->-1 "
    "convention (sim.py:21-25), keep reduce attempts with status 0 "
    "(sim.py:40), drop jobs with fewer than 6 of them (sim.py:289-"
    "292), and emit per job exactly the quantities the scheduler race "
    "consumes: shuffle-free run time sum/[via max] (fin - start - "
    "(sort - shuf), sim.py:44-46), the coflow bottleneck max(sort - "
    "shuf) (sim.py:131-134) and reduce_cdf's mean shuffle fraction "
    "(sim.py:119-128).  Incomplete records (any -1 time) are counted "
    "but excluded from the time stats — the cleaning every consumer "
    "of this trace performs.  One scan, narrow parse, one small "
    "aggregate.",
)
def hadoop_attempt_trace_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    reduces = parsed_attempt_reduces(spark, sf_dir)
    complete = (
        (F.col("shuf_t") != -1) & (F.col("sort_t") != -1) & (F.col("fin_t") != -1)
    )
    shuffle_t = F.col("sort_t") - F.col("shuf_t")
    run_t = F.col("fin_t") - F.col("start_t") - shuffle_t
    return (
        reduces.groupBy("jobid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reduce_tasks"),
            F.sum(F.when(~complete, 1).otherwise(0))
            .cast("long")
            .alias("n_incomplete"),
            F.sum(F.when(complete, run_t)).cast("long").alias("total_run_time"),
            F.max(F.when(complete, shuffle_t))
            .cast("long")
            .alias("coflow_bottleneck"),
            F.round(
                F.avg(
                    F.when(
                        complete,
                        # §18: a zero-wall-time attempt (fin == start,
                        # garbage clock) has no defined shuffle
                        # fraction — try_divide yields NULL exactly
                        # like DuckDB's zero-divisor `/`, and avg
                        # skips it in both engines
                        F.try_divide(
                            shuffle_t * 1.0,
                            F.col("fin_t") - F.col("start_t"),
                        ),
                    )
                ),
                6,
            ).alias("avg_shuffle_frac"),
        )
        .filter(F.col("n_reduce_tasks") >= _ATT_MIN_TASKS)
    )


# ---------------------------------------------------------------------------
# BlockManager "Added" executor-log parsing (sim/train.py:64-90 parse_log)
# ---------------------------------------------------------------------------


def _render_blockmanager_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved BlockManagerInfo log lines — an Added line per
    sampled block plus a Removed line the parser must skip, emitted
    from ONE scan via explode.  Token positions replicate what
    parse_log indexes: split(' ')[5] = block id, [9] = host,
    [11] = size (sim/train.py:69-80)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 50 == 0
    )
    block = F.format_string(
        "scache_%d_%d_%d_%d",
        (F.col("l_orderkey") % 4).cast("int"),  # jobid
        (F.col("l_partkey") % 2).cast("int"),  # shuffleid
        (F.col("l_partkey") % 8).cast("int"),  # mapid
        (F.col("l_suppkey") % 4).cast("int"),  # reduceid
    )
    host = F.format_string("host-%d", (F.col("l_suppkey") % 5).cast("int"))
    size = F.format_string(
        "%d.0", F.floor(F.col("l_extendedprice") * 100).cast("long")
    )
    added = F.format_string(
        "17/01/01 00:00:00 INFO BlockManagerInfo: Added %s in memory on %s (size %s B)",
        block,
        host,
        size,
    )
    removed = F.format_string(
        "17/01/01 00:00:01 INFO BlockManagerInfo: Removed %s on %s (size %s B)",
        block,
        host,
        size,
    )
    return li.select(F.explode(F.array(added, removed)).alias("line"))


@register(
    "blockmanager_added_log_parse",
    oracle="""
    WITH blocks AS (
      -- §18: hostid comes from the 'host-(\\d+)' extraction, which
      -- resolves the signed remainder iff non-negative (a -5 suppkey
      -- renders host-0 and parses; -3 renders host--3 -> NULL);
      -- block-id fields split on '_' DO parse a leading minus sign
      SELECT CAST(l_orderkey % 4 AS INT) AS jobid,
             CAST(l_partkey % 2 AS INT) AS shuffleid,
             CAST(l_partkey % 8 AS INT) AS mapid,
             CAST(l_suppkey % 4 AS INT) AS reduceid,
             CASE WHEN l_suppkey % 5 >= 0
                  THEN CAST(l_suppkey % 5 AS INT) END AS hostid,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS size
      FROM lineitem WHERE l_orderkey % 50 = 0
    )
    SELECT jobid, shuffleid, hostid,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(count(DISTINCT reduceid) AS BIGINT) AS n_reduces,
           CAST(sum(size) AS BIGINT) AS total_size
    FROM blocks GROUP BY jobid, shuffleid, hostid
    """,
    tags=("B14", "B18", "A.5"),
    doc="parse_log as one plan (sim/train.py:64-90): BlockManagerInfo "
    "'Added' lines split on spaces — token[5] is the block id "
    "scache_<job>_<shuffle>_<map>_<reduce>, token[9] the host, "
    "token[11] the size — non-Added lines skipped exactly as the "
    "reference's 'Added' substring guard does, and the "
    "[jobid, shuffleid, mapid, host, reduceid, size] frame aggregated "
    "per (job, shuffle, host) — the per-host reduce-size matrix the "
    "scheduler race and size-prediction trainers consume.  One "
    "deviation, documented: the reference numbers hosts by dict "
    "first-appearance order (scan-order-dependent, irreproducible "
    "distributed); here the host ordinal is parsed from the name — "
    "any stable host->id map serves the same role.  One scan, narrow "
    "line parse, one aggregate.",
)
def blockmanager_added_log_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _render_blockmanager_log(spark, sf_dir)
    toks = F.split(F.col("line"), " ")
    parsed = (
        lines.filter(F.col("line").contains("Added"))
        .select(
            F.split(F.element_at(toks, 6), "_").alias("ids"),
            F.element_at(toks, 10).alias("host"),
            F.element_at(toks, 12).alias("size_s"),
        )
        .select(
            # try_cast: "null" id tokens and unparseable hosts degrade
            # to NULL rather than aborting the scan (§18)
            F.element_at("ids", 2).try_cast("int").alias("jobid"),
            F.element_at("ids", 3).try_cast("int").alias("shuffleid"),
            F.element_at("ids", 4).try_cast("int").alias("mapid"),
            F.element_at("ids", 5).try_cast("int").alias("reduceid"),
            F.regexp_extract("host", r"host-(\d+)", 1)
            .try_cast("int")
            .alias("hostid"),
            F.col("size_s").try_cast("double").alias("size"),
        )
    )
    return parsed.groupBy("jobid", "shuffleid", "hostid").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.countDistinct("reduceid").cast("long").alias("n_reduces"),
        F.sum("size").cast("long").alias("total_size"),
    )


# ---------------------------------------------------------------------------
# corrupt-record-tolerant JSONL ingestion (PERMISSIVE accounting)
# ---------------------------------------------------------------------------


@register(
    "jsonl_corrupt_records_audit",
    oracle="""
    WITH lines AS (
      SELECT CAST(user_id % 4 AS INT) AS shard,
             CASE WHEN event_id % 13 = 0
                  THEN substr(json_object('event_id', event_id,
                                          'etype', event_type,
                                          'cents', CASE WHEN abs(value * 100)
                                                          < 4.611686018427388e18
                                                   THEN CAST(floor(value * 100)
                                                             AS BIGINT) END
                                          )::VARCHAR,
                              1, 10)
                  ELSE json_object('event_id', event_id,
                                   'etype', event_type,
                                   'cents', CASE WHEN abs(value * 100)
                                                   < 4.611686018427388e18
                                            THEN CAST(floor(value * 100)
                                                      AS BIGINT) END
                                   )::VARCHAR
             END AS line
      FROM events
    ),
    parsed AS (
      SELECT shard, line,
             CASE WHEN json_valid(line) THEN 1 ELSE 0 END AS ok,
             CASE WHEN json_valid(line)
                  THEN CAST(json_extract(line, '$.cents') AS BIGINT)
                  ELSE 0 END AS cents
      FROM lines
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(1 - ok) AS BIGINT) AS n_bad,
           CAST(sum(ok) AS BIGINT) AS n_good,
           CAST(sum(cents) AS BIGINT) AS cents_salvaged,
           CAST(sum(1 - ok) AS DOUBLE) / count(*) AS bad_ratio
    FROM parsed GROUP BY shard
    """,
    tags=("B1", "B18", "B14"),
    doc="Corrupt-record-tolerant JSONL ingestion — the PERMISSIVE-mode "
    "accounting a 100 TB feed needs (at scale, malformed records are "
    "a CERTAINTY; a parser that throws poisons the whole partition): "
    "a JSONL feed is rendered from events with every 13th line "
    "truncated mid-token (planted corruption, the render-then-parse "
    "device of event_log_parse), from_json degrades each bad line to "
    "NULL instead of failing the task — Spark's PERMISSIVE contract, "
    "expressed per-expression so the good fields of good lines "
    "survive — and the audit reports per-shard line/bad/good counts, "
    "the salvaged cents total, and the bad ratio (one IEEE division "
    "of exact integers, identical in both engines).  The JSON "
    "payload carries integer cents, never a float, so the text "
    "round-trip is byte-exact cross-engine.  Narrow render->parse "
    "inside one codegen span; the only exchange is the 4-group "
    "audit aggregate.",
)
def jsonl_corrupt_records_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # DIRTY-EVENTS CONTRACT: cents is range-guarded (|value*100| <
    # 2^62) BEFORE floor — Spark's floor(double) silently saturates
    # inf to Long.MaxValue while DuckDB's CAST(inf AS BIGINT) throws;
    # out-of-range and NULL values render as an ABSENT cents field on
    # both sides and salvage as 0.
    cents_ok = F.abs(F.col("value") * 100) < F.lit(float(2**62))
    line = F.to_json(
        F.struct(
            F.col("event_id").alias("event_id"),
            F.col("event_type").alias("etype"),
            F.when(cents_ok, F.floor(F.col("value") * 100).cast("long")).alias(
                "cents"
            ),
        )
    )
    feed = ev.select(
        (F.col("user_id") % 4).cast("int").alias("shard"),
        F.when(
            F.col("event_id") % 13 == 0, F.substring(line, 1, 10)
        )
        .otherwise(line)
        .alias("line"),
    )
    rec = F.from_json(
        F.col("line"), "event_id BIGINT, etype STRING, cents BIGINT"
    )
    parsed = feed.select(
        "shard",
        # from_json is PERMISSIVE: a malformed line yields a NULL
        # struct (detected via a field that is never NULL on good
        # lines), the task never fails
        F.when(rec["event_id"].isNotNull(), 1).otherwise(0).alias("ok"),
        F.coalesce(rec["cents"], F.lit(0).cast("long")).alias("cents"),
    )
    return parsed.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(1 - F.col("ok")).cast("long").alias("n_bad"),
        F.sum("ok").cast("long").alias("n_good"),
        F.sum("cents").alias("cents_salvaged"),
        (
            F.sum(1 - F.col("ok")).cast("double") / F.count(F.lit(1))
        ).alias("bad_ratio"),
    )
