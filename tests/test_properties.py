"""Property-based tests (hypothesis) for the pure algorithmic cores —
the reference's own test strategy is simulation over generated inputs
(sim/sim.py), so the LPT packer is exercised over arbitrary size
distributions, not just the fixture's."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from scache_spark.operators.scheduling import N_SCHED_HOSTS, _lpt_pack

sizes = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200
)


def _pack(szs: list[int]) -> pd.DataFrame:
    pdf = pd.DataFrame({"rid": range(len(szs)), "sz": szs})
    return _lpt_pack(pdf)


@settings(max_examples=200, deadline=None)
@given(sizes)
def test_lpt_assigns_every_task_once(szs):
    out = _pack(szs)
    assert sorted(out["rid"]) == list(range(len(szs)))
    assert out["host"].between(0, N_SCHED_HOSTS - 1).all()
    # sizes survive the packing untouched
    assert dict(zip(out["rid"], out["sz"])) == dict(enumerate(szs))


@settings(max_examples=200, deadline=None)
@given(sizes)
def test_lpt_greedy_load_bound(szs):
    # any greedy least-loaded assignment satisfies
    # makespan <= total/K + max_task — the classic list-scheduling
    # invariant (the host that defines the makespan was least loaded
    # when it received its last task)
    out = _pack(szs)
    loads = out.groupby("host")["sz"].sum()
    assert loads.max() <= sum(szs) / N_SCHED_HOSTS + max(szs)


@settings(max_examples=100, deadline=None)
@given(sizes, st.randoms(use_true_random=False))
def test_lpt_input_order_invariant(szs, rnd):
    # the packer sorts by (size desc, rid asc) internally, so the
    # row order of the incoming pandas frame must not matter —
    # exactly the determinism the oracle's recursive CTE assumes
    base = _pack(szs).sort_values("rid").reset_index(drop=True)
    perm = list(range(len(szs)))
    rnd.shuffle(perm)
    pdf = pd.DataFrame({"rid": perm, "sz": [szs[i] for i in perm]})
    shuffled = (
        _lpt_pack(pdf).sort_values("rid").reset_index(drop=True)
    )
    assert base.equals(shuffled)
