"""LPT pre-scheduler properties (reference sim/sim.py:223-263 analog).

Correctness vs the recursive-CTE oracle is covered by
tests/test_correctness.py like every registered query; these tests
check the *scheduling* properties the reference claims: LPT balances
load at least as well as the round-robin placement the registry's
block_placement_roundrobin models.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scache_spark.operators.scheduling import (
    N_SCHED_HOSTS,
    N_SCHED_TASKS,
    lpt_schedule,
)


def _makespan(loads: dict[int, int]) -> int:
    return max(loads.values())


def test_lpt_beats_round_robin_makespan(spark, sf_dir):
    assigned = lpt_schedule(spark, sf_dir).collect()
    # sf0.001 has only 10 suppliers, so fewer than N_SCHED_TASKS ids
    assert N_SCHED_HOSTS < len(assigned) <= N_SCHED_TASKS
    assert len({r["rid"] for r in assigned}) == len(assigned)
    assert {r["host"] for r in assigned} <= set(range(N_SCHED_HOSTS))

    lpt_loads: dict[int, int] = dict.fromkeys(range(N_SCHED_HOSTS), 0)
    rr_loads: dict[int, int] = dict.fromkeys(range(N_SCHED_HOSTS), 0)
    for r in assigned:
        lpt_loads[r["host"]] += r["sz"]
        rr_loads[r["rid"] % N_SCHED_HOSTS] += r["sz"]

    assert _makespan(lpt_loads) <= _makespan(rr_loads)
    # LPT's classical guarantee: makespan ≤ (4/3 − 1/3K) · OPT, and
    # OPT ≥ total/K.  Check the slightly looser computable bound.
    total = sum(r["sz"] for r in assigned)
    opt_lb = total / N_SCHED_HOSTS
    assert _makespan(lpt_loads) <= (4 / 3) * opt_lb + max(
        r["sz"] for r in assigned
    )


def test_lpt_deterministic(spark, sf_dir):
    a = sorted(map(tuple, lpt_schedule(spark, sf_dir).collect()))
    b = sorted(map(tuple, lpt_schedule(spark, sf_dir).collect()))
    assert a == b


def test_event_log_roundtrip_nonempty(spark, sf_dir):
    from scache_spark.operators.eventlog import event_log_parse

    rows = event_log_parse(spark, sf_dir).collect()
    assert rows, "event-log parse produced no groups"
    for r in rows:
        assert r["n_tasks"] == r["n_task_ids"]  # task ids unique
        assert r["total_shuffle_bytes"] >= r["max_task_bytes"] > 0


def test_embedding_lsh_dedup_recall(spark, sf_dir):
    """The LSH-bucketed near-dup path must find every planted exact
    duplicate (identical vector => identical bucket) and a usable
    fraction of what label blocking finds."""
    from scache_spark.operators.dedup import (
        dedup_embedding_cosine,
        dedup_embedding_lsh,
    )

    lsh_pairs = {
        (r["vec_a"], r["vec_b"]) for r in dedup_embedding_lsh(spark, sf_dir).collect()
    }
    planted = {
        (r["vec_a"], r["vec_b"])
        for r in dedup_embedding_cosine(spark, sf_dir).collect()
        if r["vec_b"] == r["vec_a"] + 100000
    }
    assert planted, "no planted duplicates found by the baseline"
    assert planted <= lsh_pairs, "LSH missed planted exact duplicates"


def test_lpt_swap_mechanics_on_skewed_frame():
    """Locality swap mechanics, exercised hard on a synthetic frame
    with strong locality (p* = 0.9): multiple tasks move, loads stay
    conserved, and the makespan never exceeds the 1.1x LPT cap."""
    import pandas as pd

    from scache_spark.operators.scheduling import (
        N_SCHED_HOSTS,
        _lpt_pack,
        _lpt_swap,
    )

    # production-like granularity: many tasks, each far smaller than
    # the makespan, so the 1.1x-cap slack can actually accept moves
    # (at fixture granularity a single task is ~16% of the makespan
    # and the guard correctly refuses nearly every move)
    n = 400
    pdf = pd.DataFrame(
        {
            "rid": range(n),
            "sz": [80 + 7 * (i % 7) for i in range(n)],
            "hstar": [i % N_SCHED_HOSTS for i in range(n)],
            # 90% of each task's bytes sit on hstar -> nor ~ 0.886
            "b": [int((80 + 7 * (i % 7)) * 0.9) for i in range(n)],
        }
    )
    out = _lpt_swap(pdf)
    assert len(out) == n
    assert out["sz"].sum() == pdf["sz"].sum()  # no task lost or duplicated
    moved = out[out["moved"] == 1]
    assert len(moved) >= 5, f"swap barely exercised: {len(moved)} moves"
    # every move went to the task's locality host
    by_rid = pdf.set_index("rid")
    for _, r in moved.iterrows():
        assert r["host"] == by_rid.loc[r["rid"], "hstar"]
        assert r["host"] != r["lpt_host"]
    # bounded imbalance: final makespan <= 1.1x the LPT makespan
    lpt_loads = _lpt_pack(pdf[["rid", "sz"]]).groupby("host")["sz"].sum()
    final_loads = out.groupby("host")["sz"].sum()
    assert final_loads.max() <= 1.1 * lpt_loads.max() + 1e-9


def test_policy_ordering_ideal_lpt_roundrobin(spark, sf_dir):
    """The full five-policy race (sim/sim.py:38-134): LPT must
    dominate round-robin and never beat the lower bound; fifo (which
    pays the shuffle component) can never beat ideal; the coflow
    shuffle bound is a component of some fifo host's load."""
    from scache_spark.operators.scheduling import schedule_policy_compare

    rows = {r["policy"]: r["makespan"] for r in schedule_policy_compare(spark, sf_dir).collect()}
    assert set(rows) == {"round_robin", "fifo", "lpt", "coflow", "ideal"}
    assert rows["ideal"] <= rows["lpt"] <= rows["round_robin"]
    assert rows["ideal"] <= rows["fifo"]
    assert rows["coflow"] <= rows["fifo"]


def test_reduce_completion_cdf_shape(spark, sf_dir):
    """Per-policy CDFs: 3 policies x N tasks, monotone cum_frac ending
    at 1.0, and each policy's max completion equals the race's
    makespan for that policy."""
    from scache_spark.operators.scheduling import (
        reduce_completion_cdf,
        schedule_policy_compare,
    )

    pdf = reduce_completion_cdf(spark, sf_dir).toPandas()
    race = {
        r["policy"]: r["makespan"]
        for r in schedule_policy_compare(spark, sf_dir).collect()
    }
    assert set(pdf["policy"]) == {"round_robin", "fifo", "lpt"}
    for pol, grp in pdf.groupby("policy"):
        grp = grp.sort_values(["ct", "rid"])
        assert grp["cum_frac"].is_monotonic_increasing
        assert abs(grp["cum_frac"].iloc[-1] - 1.0) < 1e-12
        assert grp["ct"].max() == race[pol]


def test_trace_fed_race_invariants(spark, sf_dir):
    """The race over the PARSED attempt trace obeys the same policy
    dominance laws as the deterministic-frame race, and its task set
    really comes from the trace: every policy makespan is positive
    and bounded by the sum of all task runtimes."""
    from scache_spark.operators.scheduling import schedule_race_from_trace

    rows = {
        r["policy"]: r["makespan"]
        for r in schedule_race_from_trace(spark, sf_dir).collect()
    }
    assert set(rows) == {"round_robin", "fifo", "lpt", "coflow", "ideal"}
    assert 0 < rows["ideal"] <= rows["lpt"] <= rows["round_robin"]
    assert rows["ideal"] <= rows["fifo"]
    assert rows["coflow"] <= rows["fifo"]


def test_skew_split_plan_invariants(spark, sf_dir):
    """The split plan really mitigates the planted hot reducer: reduce
    0 is the (only) skewed partition in every shuffle, it splits into
    >1 pieces, non-skewed reducers keep n_splits = 1, split_bytes is a
    true ceil-division, and the post-split makespan strictly improves
    on the pre-split one in every shuffle."""
    from scache_spark.operators.blocks import skew_split_plan

    pdf = skew_split_plan(spark, sf_dir).toPandas()
    assert len(pdf) == 16  # 4 shuffles x N_REDUCES
    for _, r in pdf.iterrows():
        if r["reduce"] == 0:
            assert bool(r["is_skewed"]) and r["n_splits"] > 1
        else:
            assert not bool(r["is_skewed"]) and r["n_splits"] == 1
        # ceil-division identity
        assert (
            r["split_bytes"]
            == (r["load_bytes"] + r["n_splits"] - 1) // r["n_splits"]
        )
    for _, grp in pdf.groupby("shuffle"):
        assert grp["makespan_before"].nunique() == 1
        assert grp["makespan_after"].nunique() == 1
        assert grp["makespan_after"].iloc[0] < grp["makespan_before"].iloc[0]
        assert grp["makespan_after"].iloc[0] == grp["split_bytes"].max()
