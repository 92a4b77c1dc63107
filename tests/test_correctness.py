"""The main correctness gate: every registered query with an oracle is
run through Spark AND DuckDB on the same parquet and compared
order-insensitively — the same check the driver performs at sf0.01.

Execution model (r8, VERDICT item 7 — hold the suite under the
15-minute bar): all pairs are computed ONCE by a session fixture with
a thread pool — DataFrame CONSTRUCTION serialized under a lock (some
builders register fixed-name temp views; analysis is eager, so a
built plan is immune to later view churn — the same discipline as
plans.sweep_plan_reports), while collection (py4j, GIL released) and
the DuckDB oracle (own connection per task, GIL released) overlap
across queries.  Each parametrized test then just compares its pair,
so reporting stays per-query while the wall clock is the slowest
chain, not the sum.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor

import duckdb
import pytest

from scache_spark.catalog import TABLES, table_path
from scache_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import assert_frames_match

_ensure_loaded()

WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.fixture(scope="session")
def correctness_results(spark, sf_dir):
    build_lock = threading.Lock()

    def one(name: str):
        spec = REGISTRY[name]
        try:
            with build_lock:
                df = spec.fn(spark, sf_dir)
            spark_pdf = df.toPandas()
            con = duckdb.connect()
            try:
                for t in TABLES:
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{table_path(sf_dir, t)}')"
                    )
                oracle_pdf = con.execute(spec.oracle).df()
            finally:
                con.close()
            return name, (spark_pdf, oracle_pdf)
        except Exception as exc:  # surfaced by the owning test
            return name, exc

    with ThreadPoolExecutor(max_workers=8) as pool:
        return dict(pool.map(one, WITH_ORACLE))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(correctness_results, name):
    result = correctness_results[name]
    if isinstance(result, Exception):
        raise result
    spark_pdf, oracle_pdf = result
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_every_query_is_oracle_checked():
    """There are deliberately NO rows-only registry entries: every
    query carries a DuckDB oracle (the driver's strongest check).  If
    a future operator genuinely can't be SQL-expressed, it may join
    ROWS_ONLY — then restore the parametrized run-only smoke test
    this assertion replaced."""
    assert ROWS_ONLY == []
