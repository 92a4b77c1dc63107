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
    cells = (
        b.groupBy("map", "reduce")
        .agg(F.sum("size").alias("mr"))
        .withColumn("all_bytes", F.sum("mr").over(Window.partitionBy()))
        # checkpoint: the cell grid feeds the first-wave filter, its
        # per-map totals, the reduce-id grid, and the probe join —
        # without it the fact scan replays per branch
        .localCheckpoint(eager=True)
    )
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


# ---------------------------------------------------------------------------
# LPT + deterministic locality swap (the FULL reference heuristic)
# ---------------------------------------------------------------------------

_COIN_MOD = 1000003  # prime; coin(rid) = rid*2654435761 % p / p
N_SCHED_MAPS = 8  # map count of the block view; nor normalizes by 1/num_map


def _lpt_swap(pdf: pd.DataFrame) -> pd.DataFrame:
    """Phase 1: LPT pack (as `_lpt_pack`).  Phase 2: the reference's
    locality swap (sim/sim.py:198-220,246-255) made deterministic —
    task r moves to its max-data-share host h*(r) iff
    nor(r) = (p* - 1/K)/(1 - 1/K) exceeds a HASH coin (the reference
    draws random.random(); a seeded closed-form coin keeps the same
    distribution shape and is replayable by the SQL oracle), subject
    to a bounded-imbalance guard: the move may not push h*'s load
    past 1.1x the LPT makespan (the reference bounds swap volume at
    1.1x the moving task instead; same safety intent, but a pure
    load-vector state the oracle can carry — no task-list shuffling).
    """
    rows = pdf.sort_values(["sz", "rid"], ascending=[False, True])
    heap = [(0, h) for h in range(N_SCHED_HOSTS)]
    heapq.heapify(heap)
    lpt = {}
    loads = [0] * N_SCHED_HOSTS
    for rid, sz in zip(rows["rid"], rows["sz"]):
        load, host = heapq.heappop(heap)
        lpt[int(rid)] = int(host)
        loads[host] += int(sz)
        heapq.heappush(heap, (load + int(sz), host))
    cap = 1.1 * max(loads)
    out = []
    for rid, sz, hstar, b in zip(
        rows["rid"], rows["sz"], rows["hstar"], rows["b"]
    ):
        rid, sz, hstar, b = int(rid), int(sz), int(hstar), int(b)
        h0 = lpt[rid]
        nor = (b * 1.0 / sz - 1.0 / N_SCHED_MAPS) / (1.0 - 1.0 / N_SCHED_MAPS)
        coin = (rid * 2654435761 % _COIN_MOD) * 1.0 / _COIN_MOD
        if hstar != h0 and nor > coin and loads[hstar] + sz <= cap:
            loads[h0] -= sz
            loads[hstar] += sz
            out.append((rid, sz, h0, hstar, 1))
        else:
            out.append((rid, sz, h0, h0, 0))
    return pd.DataFrame(out, columns=["rid", "sz", "lpt_host", "host", "moved"])


@register(
    "lpt_schedule_locality_swap",
    oracle=f"""
    WITH RECURSIVE cells AS (
      SELECT CAST(l_suppkey % {N_SCHED_TASKS} AS INT) AS rid,
             CAST((l_partkey % 8) % {N_SCHED_HOSTS} AS INT) AS host,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS b
      FROM lineitem GROUP BY 1, 2
    ),
    tasks AS (SELECT rid, CAST(sum(b) AS BIGINT) AS sz FROM cells GROUP BY rid),
    loc AS (
      SELECT rid, host AS hstar, b FROM (
        SELECT *, row_number() OVER (PARTITION BY rid
                  ORDER BY b DESC, host ASC) AS rk
        FROM cells) WHERE rk = 1
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
    ),
    final_loads AS (
      SELECT loads FROM assign ORDER BY rn DESC LIMIT 1
    ),
    cap AS (SELECT list_max(loads) * 1.1 AS cap FROM final_loads),
    swp AS (
      SELECT 0 AS rn, CAST(NULL AS INT) AS rid, CAST(NULL AS BIGINT) AS sz,
             CAST(NULL AS INT) AS lpt_host, CAST(NULL AS INT) AS host,
             CAST(NULL AS INT) AS moved,
             (SELECT loads FROM final_loads) AS loads
      UNION ALL
      SELECT a.rn, a.rid, a.sz, a.host AS lpt_host,
             CASE WHEN l.hstar <> a.host
                       AND (l.b * 1.0 / a.sz - 1.0 / {N_SCHED_MAPS})
                           / (1.0 - 1.0 / {N_SCHED_MAPS})
                           > (a.rid * 2654435761 % {_COIN_MOD}) * 1.0
                             / {_COIN_MOD}
                       AND s.loads[l.hstar + 1] + a.sz <= c.cap
                  THEN l.hstar ELSE a.host END AS host,
             CASE WHEN l.hstar <> a.host
                       AND (l.b * 1.0 / a.sz - 1.0 / {N_SCHED_MAPS})
                           / (1.0 - 1.0 / {N_SCHED_MAPS})
                           > (a.rid * 2654435761 % {_COIN_MOD}) * 1.0
                             / {_COIN_MOD}
                       AND s.loads[l.hstar + 1] + a.sz <= c.cap
                  THEN 1 ELSE 0 END AS moved,
             [CASE WHEN l.hstar <> a.host
                        AND (l.b * 1.0 / a.sz - 1.0 / {N_SCHED_MAPS})
                            / (1.0 - 1.0 / {N_SCHED_MAPS})
                            > (a.rid * 2654435761 % {_COIN_MOD}) * 1.0
                              / {_COIN_MOD}
                        AND s.loads[l.hstar + 1] + a.sz <= c.cap
                   THEN CASE WHEN i = l.hstar + 1 THEN s.loads[i] + a.sz
                             WHEN i = a.host + 1 THEN s.loads[i] - a.sz
                             ELSE s.loads[i] END
                   ELSE s.loads[i] END
              for i in range(1, {N_SCHED_HOSTS} + 1)] AS loads
      FROM swp s
      JOIN assign a ON a.rn = s.rn + 1
      JOIN loc l ON l.rid = a.rid
      CROSS JOIN cap c
    )
    SELECT rid, sz, lpt_host, host, moved FROM swp WHERE rn > 0
    """,
    tags=("A.2", "B23", "B16"),
    doc="The COMPLETE reference pre-scheduling heuristic "
    "(sim/sim.py:223-263): LPT bin-packing followed by the locality "
    "swap — each task pulled toward the host holding the largest "
    "share of its shuffle data (map outputs placed map % K) when its "
    "normalized locality probability (1/num_map baseline, as the "
    "reference normalizes) beats a coin, guarded so the "
    "makespan never exceeds 1.1x the LPT optimum.  The unseeded "
    "random.random() of the reference becomes a closed-form hash "
    "coin, so both engines replay bit-identically: the oracle chains "
    "TWO recursive CTEs (LPT loads vector, then the swap pass over "
    "the same rank order).  Scheduling state stays K hosts x R "
    "tasks; the 100 TB input collapses to R x K cells in one "
    "distributed aggregation before the greedy runs.  Note the "
    "granularity condition: a move needs task size <= the cap slack "
    "(~10% of makespan), the normal regime at production scale "
    "(thousands of reduces each <<makespan); at fixture scale with "
    "32 coarse tasks only the loosest hosts accept moves.",
)
def lpt_schedule_locality_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        (F.col("l_suppkey") % N_SCHED_TASKS).cast("int").alias("rid"),
        ((F.col("l_partkey") % 8) % N_SCHED_HOSTS).cast("int").alias("host"),
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("b")
    )
    per_rid = cells.groupBy("rid").agg(
        F.sum("b").alias("sz"),
        F.max(
            F.struct(F.col("b").alias("b"), (-F.col("host")).alias("nh"))
        ).alias("best"),
    )
    tasks = per_rid.select(
        "rid",
        "sz",
        (-F.col("best.nh")).cast("int").alias("hstar"),
        F.col("best.b").alias("b"),
    )
    return (
        tasks.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(_lpt_swap, "rid int, sz long, lpt_host int, host int, moved int")
    )


# ---------------------------------------------------------------------------
# scheduler policy comparison (the reference's evaluation methodology)
# ---------------------------------------------------------------------------


def _greedy_min_load(items: list[tuple[int, int]]) -> list[tuple[int, int, int]]:
    """Greedy list-scheduling in the GIVEN item order: each (rid, size)
    goes to the least-loaded host, load ties broken by lowest host id
    (heapq's lexicographic (load, host) order — identical to the
    oracle's list_indexof-of-first-min).  Returns (rid, host,
    completion_time) with completion = the host's load after placing
    the task (tasks on a host run back-to-back, the simulator's
    model)."""
    heap = [(0, h) for h in range(N_SCHED_HOSTS)]
    heapq.heapify(heap)
    out = []
    for rid, sz in items:
        load, host = heapq.heappop(heap)
        ct = load + int(sz)
        out.append((int(rid), host, ct))
        heapq.heappush(heap, (ct, host))
    return out


def _policy_compare(pdf: pd.DataFrame) -> pd.DataFrame:
    """Makespans of the five scheduling policies the reference's
    simulator races (sim/sim.py:38-134): round-robin pre-placement
    (reduce i -> host i mod K, what the Scala master actually ships,
    MapOutputTracker.scala:202-210), FIFO greedy in arrival order over
    the FULL runtime incl. the shuffle-read component
    (sim/sim.py:68-81 — no prefetch, so shuffle time is on the
    critical path), LPT over the shuffle-excluded compute time (the
    paper's heuristic — prefetch overlaps the shuffle), the coflow
    bound max(shuffle component) (sim/sim.py:130-134), and the ideal
    lower bound max(ceil(total/K), max task)."""
    pdf = pdf.sort_values("rid")
    sizes = {int(r): int(s) for r, s in zip(pdf["rid"], pdf["sz"])}
    shuf = {int(r): int(s) for r, s in zip(pdf["rid"], pdf["sh"])}
    k = N_SCHED_HOSTS
    # MAKESPAN CONTRACT (dirty-trace fuzz): every policy's makespan is
    # the max over ALL K hosts' final loads, empty hosts at 0 — the
    # physical reading (an idle host finishes at t=0).  On a clean
    # trace (sizes >= 0) this equals the occupied-hosts max, but a
    # garbage trace can yield NEGATIVE task sizes (fin < start), where
    # occupied-only vs K-wide diverge — and the oracle's recursive
    # loads array is K-wide, so the pandas side must be too.
    rr = [0] * k
    for rid, sz in sizes.items():
        rr[rid % k] += sz
    fifo = _greedy_min_load(
        [(rid, sizes[rid] + shuf[rid]) for rid in sorted(sizes)]
    )
    fifo_loads = [0] * k
    for _, host, ct in fifo:
        fifo_loads[host] = ct  # ct is the host's load after the task
    lpt_out = _lpt_pack(pdf[["rid", "sz"]])
    lpt_loads = [0] * k
    for host, s in zip(lpt_out["host"], lpt_out["sz"]):
        lpt_loads[int(host)] += int(s)
    total = sum(sizes.values())
    ideal = max(-(-total // k), max(sizes.values()))
    return pd.DataFrame(
        {
            "policy": ["round_robin", "fifo", "lpt", "coflow", "ideal"],
            "makespan": [
                int(max(rr)),
                int(max(fifo_loads)),
                int(max(lpt_loads)),
                int(max(shuf.values())),
                int(ideal),
            ],
        }
    )


# Shared oracle CTE fragments for the policy race / completion CDF.
# tasks: rid, sz (shuffle-excluded compute, the prefetch-overlapped
# time base), sh (the shuffle-read component — sortTime-shuffleTime in
# the reference's trace schema, sim/sim.py:278).
_SCHED_TASKS_CTE = f"""
    tasks AS (
      SELECT CAST(l_suppkey % {N_SCHED_TASKS} AS INT) AS rid,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS sz,
             CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
                 AS sh
      FROM lineitem GROUP BY 1
    )
"""


def _sql_greedy_assign(ordered: str, assign: str, size: str) -> str:
    """Recursive-CTE greedy min-load assignment over the pre-ranked
    `ordered` relation (columns rid, {size}, rn), carrying the
    completion time of each step.  The exact recursion shape the
    driver-green lpt_schedule uses; host load ties break to the first
    (lowest-id) minimum via list_indexof."""
    k = N_SCHED_HOSTS
    return f"""
    {assign} AS (
      SELECT 0 AS rn, CAST(NULL AS INT) AS rid, CAST(NULL AS BIGINT) AS {size},
             CAST(NULL AS INT) AS host, CAST(NULL AS BIGINT) AS ct,
             [CAST(0 AS BIGINT) for i in range(1, {k} + 1)] AS loads
      UNION ALL
      SELECT o.rn, o.rid, o.{size},
             CAST(list_indexof(a.loads, list_min(a.loads)) - 1 AS INT) AS host,
             CAST(a.loads[list_indexof(a.loads, list_min(a.loads))] + o.{size}
                  AS BIGINT) AS ct,
             [CASE WHEN i = list_indexof(a.loads, list_min(a.loads))
                   THEN a.loads[i] + o.{size} ELSE a.loads[i] END
              for i in range(1, {k} + 1)] AS loads
      FROM {assign} a JOIN {ordered} o ON o.rn = a.rn + 1
    )
"""


# The five-policy race over any `tasks`(rid, sz, sh) CTE — shared by
# the deterministic-frame race below and the trace-fed race
# (schedule_race_from_trace), so the policy arithmetic exists once.
_POLICY_RACE_TAIL = f"""
    ordered AS (
      SELECT rid, sz,
             CAST(row_number() OVER (ORDER BY sz DESC, rid ASC) AS INT) AS rn
      FROM tasks
    ),
    {_sql_greedy_assign("ordered", "assign", "sz")},
    lpt_makespan AS (
      SELECT list_max(loads) AS m FROM assign
      ORDER BY rn DESC LIMIT 1
    ),
    ordered_f AS (
      SELECT rid, sz + sh AS run,
             CAST(row_number() OVER (ORDER BY rid ASC) AS INT) AS rn
      FROM tasks
    ),
    {_sql_greedy_assign("ordered_f", "assign_f", "run")},
    fifo_makespan AS (
      SELECT list_max(loads) AS m FROM assign_f
      ORDER BY rn DESC LIMIT 1
    ),
    rr AS (
      -- K-wide makespan contract (see _policy_compare): seed every
      -- host with load 0 so idle hosts participate in the max — on a
      -- garbage trace with negative task sizes the occupied-only max
      -- diverges from the pandas side's [0]*K accumulator
      SELECT CAST(max(hl) AS BIGINT) AS m FROM (
        SELECT host, sum(hsz) AS hl FROM (
          SELECT rid % {N_SCHED_HOSTS} AS host, sz AS hsz FROM tasks
          UNION ALL
          SELECT CAST(i AS INT) AS host, CAST(0 AS BIGINT) AS hsz
          FROM unnest(range(0, {N_SCHED_HOSTS})) t(i)
        ) GROUP BY host)
    ),
    cf AS (SELECT CAST(max(sh) AS BIGINT) AS m FROM tasks),
    ideal AS (
      SELECT CAST(greatest(CAST(ceil(sum(sz) * 1.0 / {N_SCHED_HOSTS}) AS BIGINT),
                           max(sz)) AS BIGINT) AS m
      FROM tasks
    )
    SELECT policy, makespan FROM (
      SELECT 'round_robin' AS policy, m AS makespan FROM rr
      UNION ALL SELECT 'fifo', CAST(m AS BIGINT) FROM fifo_makespan
      UNION ALL SELECT 'lpt', CAST(m AS BIGINT) FROM lpt_makespan
      UNION ALL SELECT 'coflow', m FROM cf
      UNION ALL SELECT 'ideal', m FROM ideal
    )
    -- §18: a trace with NO surviving tasks (e.g. every attempt
    -- incomplete) has no race — zero rows, matching the grouped-map
    -- side where an empty input yields no groups; without this the
    -- aggregates-over-empty arms would emit 5 NULL-makespan rows
    WHERE (SELECT count(*) FROM tasks) > 0
"""


@register(
    "schedule_policy_compare",
    oracle=f"""
    WITH RECURSIVE {_SCHED_TASKS_CTE},
    {_POLICY_RACE_TAIL}
    """,
    tags=("A.2", "A.5", "B23"),
    doc="The reference's COMPLETE scheduler evaluation, reproduced: "
    "makespans of round-robin pre-placement (what the Scala master "
    "ships, MapOutputTracker.scala:202-210), FIFO greedy over the "
    "full runtime incl. shuffle reads (sim/sim.py:68-81 — the "
    "no-prefetch baseline), LPT over the shuffle-excluded compute "
    "time (the paper's heuristic, sim/sim.py:223-263), the coflow "
    "shuffle bound max(shuffle component) (sim/sim.py:130-134), and "
    "the ideal lower bound — the same five-way race sim/sim.py:265-"
    "328 runs over the Hadoop trace, here over the deterministic "
    "task-size frame.  The pytest asserts ideal <= lpt <= "
    "round_robin, ideal <= fifo, and coflow <= fifo.  One "
    "distributed aggregation feeds all five policies; the comparison "
    "itself is K-host-sized state.",
)
def schedule_policy_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    tasks = li.groupBy(
        (F.col("l_suppkey") % N_SCHED_TASKS).cast("int").alias("rid")
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("sz"),
        F.sum(F.floor(F.col("l_quantity") * 100).cast("long")).alias("sh"),
    )
    return (
        tasks.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(_policy_compare, "policy string, makespan long")
    )


# ---------------------------------------------------------------------------
# reduce-completion CDF per policy (sim/sim.py:119-128 wired to the race)
# ---------------------------------------------------------------------------


def _completion_rows(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-task completion times under each assignment policy (tasks
    on a host run back-to-back; completion = host load after the
    task).  round_robin uses the shipped i-mod-K placement, fifo the
    arrival-order greedy over full runtime, lpt the paper's sorted
    heuristic over compute time."""
    pdf = pdf.sort_values("rid")
    k = N_SCHED_HOSTS
    out = []
    loads = [0] * k
    for rid, sz in zip(pdf["rid"], pdf["sz"]):
        h = int(rid) % k
        loads[h] += int(sz)
        out.append(("round_robin", int(rid), loads[h]))
    for rid, host, ct in _greedy_min_load(
        list(zip(pdf["rid"], pdf["sz"] + pdf["sh"]))
    ):
        out.append(("fifo", rid, ct))
    lpt_items = pdf.sort_values(["sz", "rid"], ascending=[False, True])
    for rid, host, ct in _greedy_min_load(
        list(zip(lpt_items["rid"], lpt_items["sz"]))
    ):
        out.append(("lpt", rid, ct))
    return pd.DataFrame(out, columns=["policy", "rid", "ct"])


@register(
    "reduce_completion_cdf",
    oracle=f"""
    WITH RECURSIVE {_SCHED_TASKS_CTE},
    rr_ct AS (
      SELECT 'round_robin' AS policy, rid,
             CAST(sum(sz) OVER (PARTITION BY rid % {N_SCHED_HOSTS}
                 ORDER BY rid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS ct
      FROM tasks
    ),
    ordered AS (
      SELECT rid, sz,
             CAST(row_number() OVER (ORDER BY sz DESC, rid ASC) AS INT) AS rn
      FROM tasks
    ),
    {_sql_greedy_assign("ordered", "assign", "sz")},
    lpt_ct AS (
      SELECT 'lpt' AS policy, rid, ct FROM assign WHERE rn > 0
    ),
    ordered_f AS (
      SELECT rid, sz + sh AS run,
             CAST(row_number() OVER (ORDER BY rid ASC) AS INT) AS rn
      FROM tasks
    ),
    {_sql_greedy_assign("ordered_f", "assign_f", "run")},
    fifo_ct AS (
      SELECT 'fifo' AS policy, rid, ct FROM assign_f WHERE rn > 0
    ),
    u AS (
      SELECT * FROM rr_ct
      UNION ALL SELECT * FROM lpt_ct
      UNION ALL SELECT * FROM fifo_ct
    )
    SELECT policy, rid, ct,
           CAST(row_number() OVER (PARTITION BY policy ORDER BY ct, rid)
                AS DOUBLE)
             / count(*) OVER (PARTITION BY policy) AS cum_frac
    FROM u
    """,
    tags=("A.5", "B11", "B23"),
    doc="Per-policy reduce-completion CDF (the reference's reduce_cdf "
    "evaluation, sim/sim.py:119-128, wired to the scheduler-race "
    "assignments): every reduce task's completion time under "
    "round-robin / fifo / lpt placement (tasks on a host run "
    "back-to-back), with cum_frac = fraction of tasks done by that "
    "time — the survival-curve view of how much LPT flattens the "
    "tail.  The CDF rank window is partitioned by policy over the "
    "K-task frame (bounded state); the task frame itself is the one "
    "distributed aggregation all scheduling queries share.  "
    "cum_frac is an exact small-integer ratio — bit-identical in "
    "both engines.",
)
def reduce_completion_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    tasks = li.groupBy(
        (F.col("l_suppkey") % N_SCHED_TASKS).cast("int").alias("rid")
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("sz"),
        F.sum(F.floor(F.col("l_quantity") * 100).cast("long")).alias("sh"),
    )
    cts = (
        tasks.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(_completion_rows, "policy string, rid int, ct long")
    )
    wr = Window.partitionBy("policy").orderBy("ct", "rid")
    wp = Window.partitionBy("policy")
    return cts.select(
        "policy",
        "rid",
        "ct",
        (
            F.row_number().over(wr).cast("double")
            / F.count(F.lit(1)).over(wp)
        ).alias("cum_frac"),
    )


# ---------------------------------------------------------------------------
# the five-policy race fed by the PARSED Hadoop attempt trace
# ---------------------------------------------------------------------------

from scache_spark.operators.eventlog import ATTEMPT_REDUCES_SQL  # noqa: E402


@register(
    "schedule_race_from_trace",
    oracle=f"""
    WITH RECURSIVE {ATTEMPT_REDUCES_SQL},
    complete AS (
      SELECT * FROM reduces
      WHERE shuf_t <> -1 AND sort_t <> -1 AND fin_t <> -1
    ),
    best_job AS (
      SELECT jobid FROM complete GROUP BY jobid
      ORDER BY count(*) DESC, jobid ASC LIMIT 1
    ),
    tasks AS (
      -- NULLS FIRST pins the one possible NULL-jtid attempt (an
      -- unparseable id line) to rid 0 in BOTH engines: Spark's asc is
      -- NULLS FIRST while DuckDB defaults to NULLS LAST, and a
      -- different rid mapping swaps task sizes between round-robin
      -- hosts (found by test_trace_contracts_fuzzed)
      SELECT CAST(row_number() OVER (ORDER BY jtid ASC NULLS FIRST) - 1
                  AS INT) AS rid,
             CAST(fin_t - start_t - (sort_t - shuf_t) AS BIGINT) AS sz,
             CAST(sort_t - shuf_t AS BIGINT) AS sh
      FROM complete JOIN best_job USING (jobid)
    ),
    {_POLICY_RACE_TAIL}
    """,
    tags=("A.2", "A.5", "B14", "B23"),
    doc="The reference's ACTUAL end-to-end evaluation loop closed: "
    "sim.py main() reads attempt.csv, cleans it, picks a job's reduce "
    "attempts, and races the scheduling policies over their runtimes "
    "(sim/sim.py:265-328).  Here the attempt trace is parsed by the "
    "same pipeline as hadoop_attempt_trace_parse (shared "
    "ATTEMPT_REDUCES_SQL fragment / parsed_attempt_reduces helper), "
    "the job with the most complete reduce attempts is selected "
    "(ties -> lowest jobid), each attempt becomes a task with "
    "sz = shuffle-free runtime and sh = shuffle time (sim.py:44-46), "
    "and the SAME five-policy race as schedule_policy_compare runs "
    "over them — trace in, makespans out, nothing hand-fed.  The "
    "cleaned attempt frame is checkpointed (it feeds the job pick "
    "and the task build); the race itself is R-row grouped-map "
    "state.",
)
def schedule_race_from_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scache_spark.functions import bounded_window
    from scache_spark.operators.eventlog import parsed_attempt_reduces

    r = (
        parsed_attempt_reduces(spark, sf_dir)
        .filter(
            (F.col("shuf_t") != -1)
            & (F.col("sort_t") != -1)
            & (F.col("fin_t") != -1)
        )
        .localCheckpoint(eager=True)
    )
    best = (
        r.groupBy("jobid")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("jobid").asc())
        .limit(1)
        .select("jobid")
    )
    shuffle_t = F.col("sort_t") - F.col("shuf_t")
    tasks = r.join(F.broadcast(best), "jobid").select(
        (
            F.row_number().over(bounded_window("jtid", F.asc("jtid"))) - 1
        )
        .cast("int")
        .alias("rid"),
        (F.col("fin_t") - F.col("start_t") - shuffle_t)
        .cast("long")
        .alias("sz"),
        shuffle_t.cast("long").alias("sh"),
    )
    return (
        tasks.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(_policy_compare, "policy string, makespan long")
    )
