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


# ---------------------------------------------------------------------------
# round-2 pure cores: NFD sequence packing
# ---------------------------------------------------------------------------

from scache_spark.operators.pipeline import _PACK_CAP, _nfd_pack  # noqa: E402

tok_counts = st.lists(
    st.integers(min_value=1, max_value=2 * _PACK_CAP), min_size=1, max_size=300
)


def _pack_docs(toks: list[int]) -> pd.DataFrame:
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": range(len(toks)), "tok": toks}
    )
    return _nfd_pack(pdf)


@settings(max_examples=200, deadline=None)
@given(tok_counts)
def test_nfd_every_doc_packed_once(toks):
    out = _pack_docs(toks)
    assert sorted(out["doc_id"]) == list(range(len(toks)))


@settings(max_examples=200, deadline=None)
@given(tok_counts)
def test_nfd_bins_respect_budget_and_are_contiguous(toks):
    out = _pack_docs(toks)
    fills = out.groupby("bin").agg(total=("tok", "sum"), n=("doc_id", "count"))
    # a bin exceeds the budget only when a single oversized doc owns it
    over = fills[fills["total"] > _PACK_CAP]
    assert (over["n"] == 1).all()
    assert sorted(fills.index) == list(range(len(fills)))


@settings(max_examples=200, deadline=None)
@given(tok_counts)
def test_nfd_is_decreasing_within_bins(toks):
    """NFD invariant: walking bins in order, doc sizes never increase
    (the sort survives packing) — guards accidental reorder bugs."""
    out = _pack_docs(toks)
    seq = list(zip(out["bin"], out["tok"]))
    for (b1, t1), (b2, t2) in zip(seq, seq[1:]):
        if b1 == b2:
            assert t1 >= t2


# ---------------------------------------------------------------------------
# distributed prefix sum (curation.token_budget_selection) — the bucket
# decomposition must reproduce the naive global cumsum exactly
# ---------------------------------------------------------------------------

token_lists = st.lists(
    st.integers(min_value=1, max_value=5000), min_size=1, max_size=300
)


@settings(max_examples=200, deadline=None)
@given(token_lists)
def test_bucketed_prefix_sum_equals_global_cumsum(toks):
    # mirror of the Spark algebra in curation.token_budget_selection:
    # bucket = tok // 32 is monotone in the sort key (tokens DESC,
    # doc_id ASC), so per-bucket cumsums + bucket offsets reproduce
    # the single-partition global window integer-for-integer.
    rows = sorted(
        ((t, i) for i, t in enumerate(toks)), key=lambda r: (-r[0], r[1])
    )
    naive = []
    acc = 0
    for t, i in rows:
        acc += t
        naive.append((i, acc))

    buckets: dict[int, list[tuple[int, int]]] = {}
    for t, i in rows:
        buckets.setdefault(t // 32, []).append((t, i))
    offset = 0
    decomposed = {}
    for b in sorted(buckets, reverse=True):
        within = 0
        for t, i in buckets[b]:  # already in global order within bucket
            within += t
            decomposed[i] = offset + within
        offset += within
    assert dict(naive) == decomposed


# ---------------------------------------------------------------------------
# closed-form Gini (mining.revenue_gini_by_region) — must equal the
# O(n²) mean-absolute-difference definition
# ---------------------------------------------------------------------------

revenues = st.lists(
    st.floats(min_value=0.01, max_value=1e6, allow_nan=False),
    min_size=1,
    max_size=80,
)


@settings(max_examples=200, deadline=None)
@given(revenues)
def test_gini_closed_form_matches_pairwise_definition(xs):
    n = len(xs)
    s = sorted(xs)
    total = sum(s)
    closed = 2.0 * sum((i + 1) * x for i, x in enumerate(s)) / (
        n * total
    ) - (n + 1.0) / n
    pairwise = sum(abs(a - b) for a in xs for b in xs) / (
        2.0 * n * n * (total / n)
    )
    assert abs(closed - pairwise) < 1e-9


def test_ffd_pack_invariants():
    """FFD compaction: every file assigned exactly once, no group over
    capacity, and group ids are dense from 0 — for arbitrary size
    mixes including the pathological all-equal and one-giant cases."""
    import pandas as pd

    from scache_spark.operators.blocks import _ffd_pack

    for sizes in (
        [100] * 7,
        [1000, 1, 1, 1, 1, 1],
        [5, 9, 3, 7, 1, 8, 2, 6, 4],
        [17],
    ):
        pdf = pd.DataFrame({"fid": range(len(sizes)), "sz": sizes})
        out = _ffd_pack(pdf)
        cap = 2 * max(sizes)
        assert sorted(out["fid"]) == list(range(len(sizes)))
        loads = out.groupby("grp")["sz"].sum()
        assert (loads <= cap).all()
        assert sorted(out["grp"].unique()) == list(range(out["grp"].max() + 1))
        # FFD never opens more groups than a one-file-per-group plan
        assert out["grp"].max() + 1 <= len(sizes)


# --- ingestion-time near-dup suppression: cross-batch contract ------------

neardup_arrivals = st.lists(
    st.tuples(
        st.sampled_from(["h1", "h2", "h3", "h4"]),  # bucket within the shard
        st.integers(min_value=0, max_value=50),  # doc_id (dups allowed)
    ),
    min_size=1,
    max_size=60,
)
batch_cuts = st.lists(st.integers(min_value=1, max_value=59), max_size=5)


@settings(max_examples=300, deadline=None)
@given(neardup_arrivals, batch_cuts)
def test_neardup_shard_union_equals_batch_semantics(arrivals, cuts):
    """For ANY arrival order and ANY micro-batch split, the union of the
    shard updater's emissions equals batch min-id semantics — each
    (doc, bucket) collision emitted exactly once, bucket minima never
    emitted — and state always holds each bucket's smallest ids."""
    from scache_spark.streaming.stateful import _update_neardup_shard

    class _FakeState:
        exists = False
        get = None

        def update(self, v):
            self.exists, self.get = True, v

    # split the arrival sequence into micro-batches at the given cuts
    bounds = sorted({c for c in cuts if c < len(arrivals)}) + [len(arrivals)]
    batches, prev = [], 0
    for b in bounds:
        if b > prev:
            batches.append(arrivals[prev:b])
            prev = b

    st_ = _FakeState()
    emitted: list[tuple[int, str]] = []  # (doc_id, via-bucket is unknown) — doc only
    for batch in batches:
        pdf = pd.DataFrame(
            {"band_hash": [h for h, _ in batch], "doc_id": [d for _, d in batch]}
        )
        for out in _update_neardup_shard((0, 0), iter([pdf]), st_):
            emitted.extend((int(d), None) for d in out["doc_id"])

    # batch semantics: per bucket, every distinct id except the minimum
    buckets: dict[str, set[int]] = {}
    for h, d in arrivals:
        buckets.setdefault(h, set()).add(d)
    expected = sorted(
        d for ids in buckets.values() for d in ids if d != min(ids)
    )
    got = sorted(d for d, _ in emitted)
    assert got == expected  # exactly-once: multiset equality, not set

    # state: each bucket holds its smallest ids, minimum always present
    hashes, counts, flat, bgens, gen = st_.get
    pos = 0
    for h, c in zip(hashes, counts):
        ids = flat[pos : pos + c]
        pos += c
        assert ids == sorted(buckets[h])[: len(ids)]
    # recency bookkeeping: gen ticks only on batches that REWRITE the
    # shard (the no-op fast path skips the rewrite when TTL is off)
    assert 1 <= gen <= len(batches)
    assert all(1 <= g <= gen for g in bgens)


def test_neardup_cold_bucket_ttl_evicts_and_preserves_hot_semantics(monkeypatch):
    """With the TTL enabled, buckets idle past the horizon are dropped
    at the next shard rewrite (state stops growing with vocabulary),
    while a refreshed bucket keeps its minimum and its monotone
    verdict semantics."""
    from scache_spark.streaming import stateful as S

    monkeypatch.setattr(S, "_NEARDUP_TTL_GENS", 1)

    class _FakeState:
        exists = False
        get = None

        def update(self, v):
            self.exists, self.get = True, v

    st_ = _FakeState()

    def run(batch):
        out = []
        pdf = pd.DataFrame(
            {"band_hash": [h for h, _ in batch], "doc_id": [d for _, d in batch]}
        )
        for o in S._update_neardup_shard((0, 0), iter([pdf]), st_):
            out.extend(int(d) for d in o["doc_id"])
        return sorted(out)

    # batch 1: two buckets; cold goes idle, hot is refreshed each batch
    assert run([("cold", 5), ("hot", 9)]) == []
    assert run([("hot", 9)]) == []          # gen 2: cold idle 1 <= TTL, kept
    hashes = st_.get[0]
    assert set(hashes) == {"cold", "hot"}
    assert run([("hot", 9)]) == []          # gen 3: cold idle 2 > TTL, dropped
    hashes, counts, flat, bgens, gen = st_.get
    assert set(hashes) == {"hot"} and gen == 3
    # hot bucket still verdicts correctly: smaller id dethrones the min
    assert run([("hot", 3)]) == [9]
    # cold bucket was forgotten: its next doc starts a fresh bucket
    assert run([("cold", 7), ("cold", 8)]) == [8]


# ---------------------------------------------------------------------------
# round-4 pure cores: bilinear join-view IVM algebra, CMS guarantee
# ---------------------------------------------------------------------------

import hashlib  # noqa: E402


def _ivm_incremental(orders, custs):
    """Pure mirror of ivm_join_view_delta's algebra.

    orders: list of (custkey, cents, change) where change is one of
    'keep'/'delete'/'update'(+5%-ish: modeled as +7 cents)/'insert'
    (insert = a NEW row added alongside the kept original).
    custs: dict custkey -> (nation_old, nation_new).
    Returns {nation: (n, s)} computed as base + delta.
    """
    # per-custkey old aggregate and signed delta (the one-scan agg)
    oa: dict[int, list[int]] = {}
    for k, cents, change in orders:
        oa.setdefault(k, [0, 0, 0, 0])
        oa[k][0] += 1
        oa[k][1] += cents
        if change == "delete":
            oa[k][2] -= 1
            oa[k][3] -= cents
        elif change == "update":
            oa[k][3] += 7
        elif change == "insert":
            oa[k][2] += 1
            oa[k][3] += cents
    view: dict[int, list[int]] = {}

    def add(nation, dn, ds):
        v = view.setdefault(nation, [0, 0])
        v[0] += dn
        v[1] += ds

    for k, (n, s, dn, ds) in oa.items():
        old_nat, new_nat = custs[k]
        add(old_nat, n, s)  # base
        if old_nat != new_nat:
            add(old_nat, -n, -s)
            add(new_nat, n + dn, s + ds)
        else:
            add(old_nat, dn, ds)
    return {
        nat: (n, s) for nat, (n, s) in view.items() if n > 0
    }


def _ivm_recompute(orders, custs):
    view: dict[int, list[int]] = {}
    for k, cents, change in orders:
        nation = custs[k][1]
        rows = []
        if change == "keep":
            rows = [cents]
        elif change == "update":
            rows = [cents + 7]
        elif change == "insert":
            rows = [cents, cents]  # original kept + new copy
        # delete contributes nothing
        for c in rows:
            v = view.setdefault(nation, [0, 0])
            v[0] += 1
            v[1] += c
    return {nat: (n, s) for nat, (n, s) in view.items() if n > 0}


order_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),  # custkey
        st.integers(min_value=0, max_value=10**6),  # cents
        st.sampled_from(["keep", "delete", "update", "insert"]),
    ),
    min_size=0,
    max_size=120,
)
nation_moves = st.dictionaries(
    st.integers(min_value=0, max_value=15),
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=4),
    ),
)


@settings(max_examples=300, deadline=None)
@given(order_rows, nation_moves)
def test_ivm_bilinear_delta_equals_recompute(orders, moves):
    """base + per-changed-key signed delta == full recompute, for ANY
    mix of deletes/updates/inserts and dimension moves — including a
    customer whose every order is deleted, empty deltas, and movers
    with no fact-side change."""
    custs = {
        k: moves.get(k, (k % 5, k % 5)) for k in range(16)
    }
    assert _ivm_incremental(orders, custs) == _ivm_recompute(
        orders, custs
    )


def _cms_cell_py(key: str, row: int, w: int = 256) -> int:
    """Exact python mirror of _cms_cell / _cms_cell_sql: md5 of
    'row:key', first 15 hex chars as int, mod w — md5 is md5 in every
    engine, so this tests the REAL construction."""
    h = hashlib.md5(f"{row}:{key}".encode()).hexdigest()
    return int(h[:15], 16) % w


keys = st.lists(
    st.text(
        alphabet=st.characters(codec="ascii", categories=("L", "N")),
        min_size=0,
        max_size=8,
    ),
    min_size=0,
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(keys)
def test_cms_never_undercounts_any_key(ks):
    """The Count-Min guarantee on the exact md5 cell construction both
    engines run: min-over-rows estimate >= true count for EVERY key,
    with equality whenever the key collides with nothing."""
    rows, w = 3, 256
    sketch: dict[tuple[int, int], int] = {}
    for k in ks:
        for r in range(rows):
            cell = (r, _cms_cell_py(k, r, w))
            sketch[cell] = sketch.get(cell, 0) + 1
    from collections import Counter

    true = Counter(ks)
    for k, t in true.items():
        est = min(
            sketch.get((r, _cms_cell_py(k, r, w)), 0) for r in range(rows)
        )
        assert est >= t
        # no collision on some row => exact
        if est == t:
            continue
        # collision overcount must come from OTHER keys in every row
        assert est <= len(ks)


# ---------------------------------------------------------------------------
# round-5: sketch algebra laws over the NATIVE Spark 4.1 Datasketches
# built-ins (r4 verdict item 8).  These run real Spark jobs, so the
# example counts are deliberately small — the law, not the volume,
# is the point.
# ---------------------------------------------------------------------------

import pandas as _pd  # noqa: E402
from hypothesis import HealthCheck  # noqa: E402


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.integers(min_value=-(10**6), max_value=10**6),
        min_size=20,
        max_size=300,
    ),
    st.randoms(use_true_random=False),
)
def test_kll_merge_preserves_rank_error_under_arbitrary_splits(spark, vals, rnd):
    """KLL law: merging per-shard sketches built from ANY partition of
    the data answers quantiles with the same distribution-free rank
    guarantee as one global sketch.  With ties the guarantee is on the
    value's rank INTERVAL: for target rank q the returned value v must
    satisfy  frac(< v) - eps <= q <= frac(<= v) + eps  (k=200 rank
    error ~1.65%; 5% + one-row granularity is a generous bound)."""
    from pyspark.sql import functions as F

    from scache_spark.functions import kll_fold_double

    n_shards = rnd.randint(1, 6)
    shards = [rnd.randrange(n_shards) for _ in vals]
    df = spark.createDataFrame(
        _pd.DataFrame({"x": [float(v) for v in vals], "shard": shards})
    )
    probes = (0.25, 0.5, 0.9)
    merged = (
        df.groupBy("shard")
        .agg(F.kll_sketch_agg_double("x").alias("sk"))
        .agg(F.collect_list("sk").alias("sks"))
        .select(
            *[
                F.kll_sketch_get_quantile_double(
                    kll_fold_double("sks", 6), F.lit(q)
                ).alias(f"q{i}")
                for i, q in enumerate(probes)
            ]
        )
        .collect()[0]
    )
    n = len(vals)
    tol = 0.05 + 1.0 / n
    xs = sorted(float(v) for v in vals)
    for i, q in enumerate(probes):
        v = merged[f"q{i}"]
        lo = sum(1 for x in xs if x < v) / n
        hi = sum(1 for x in xs if x <= v) / n
        assert lo - tol <= q <= hi + tol, (q, v, lo, hi, n_shards)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=600),
    st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=600),
)
def test_theta_set_ops_exact_below_retention(spark, a, b):
    """Theta law: below the k=4096 retention the sketch is in exact
    mode, so union / intersection / difference estimates equal the
    true set cardinalities EXACTLY for arbitrary integer rings — the
    deterministic regime theta_sketch_set_ops's fixture verdicts rely
    on."""
    from pyspark.sql import functions as F

    rows = [(int(v), "a") for v in a] + [(int(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v bigint, side string")
    est = (
        df.agg(
            F.theta_sketch_agg(
                F.when(F.col("side") == "a", F.col("v"))
            ).alias("ska"),
            F.theta_sketch_agg(
                F.when(F.col("side") == "b", F.col("v"))
            ).alias("skb"),
        )
        .select(
            F.theta_sketch_estimate(F.theta_union("ska", "skb")).alias("u"),
            F.theta_sketch_estimate(
                F.theta_intersection("ska", "skb")
            ).alias("i"),
            F.theta_sketch_estimate(F.theta_difference("ska", "skb")).alias(
                "d"
            ),
        )
        .collect()[0]
    )
    assert round(est["u"]) == len(a | b)
    assert round(est["i"]) == len(a & b)
    assert round(est["d"]) == len(a - b)
