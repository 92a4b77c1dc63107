"""CI smoke for the scale-stress harness (tools/scale_stress.py) —
the staging transform must stay correct or the x10 artifacts stop
being reproducible.  Stages a tiny x2 replica from sf0.001 and checks
the structural invariants the full run relies on, plus one real
query-vs-oracle compare on the replica."""

from __future__ import annotations

import shutil

import duckdb
import pytest

from tools.scale_stress import DEFAULT_QUERIES, TABLES, stage


@pytest.fixture(scope="module")
def x2_dir():
    out = stage("/root/testdata/sf0.001", 2)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_stage_scales_facts_and_copies_dims(x2_dir):
    con = duckdb.connect()
    n = lambda d, t: con.execute(  # noqa: E731
        f"SELECT count(*) FROM read_parquet('{d}/{t}.parquet')"
    ).fetchone()[0]
    base = "/root/testdata/sf0.001"
    for t in TABLES:
        factor = 2 if t in ("orders", "lineitem", "events", "documents", "embeddings") else 1
        assert n(x2_dir, t) == factor * n(base, t), t


def test_stage_preserves_keys_and_fk(x2_dir):
    con = duckdb.connect()
    dup = con.execute(
        f"SELECT count(*) - count(DISTINCT o_orderkey) FROM read_parquet('{x2_dir}/orders.parquet')"
    ).fetchone()[0]
    assert dup == 0
    orphans = con.execute(
        f"""SELECT count(*) FROM read_parquet('{x2_dir}/lineitem.parquet') l
            LEFT JOIN read_parquet('{x2_dir}/orders.parquet') o
              ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL"""
    ).fetchone()[0]
    assert orphans == 0


def test_default_queries_resolve():
    from scache_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    missing = [q for q in DEFAULT_QUERIES if q not in REGISTRY]
    assert missing == []


def test_one_query_matches_oracle_on_replica(spark, x2_dir):
    """End-to-end: the engine and DuckDB agree on the staged replica
    (the same compare the full x10 run performs, one cheap query)."""
    from __spark_entry__ import oracle_sql
    from scache_spark.registry import REGISTRY, _ensure_loaded
    from tests.conftest import assert_frames_match

    _ensure_loaded()
    name = "flagship_revenue_by_region"
    spdf = REGISTRY[name].fn(spark, x2_dir).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{x2_dir}/{t}.parquet')"
        )
    odf = con.execute(oracle_sql()[name]).df()
    assert_frames_match(spdf, odf, name)
    assert len(spdf) > 0
