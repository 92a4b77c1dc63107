"""The main correctness gate: every registered query with an oracle is
run through Spark AND DuckDB on the same parquet and compared
order-insensitively — the same check the driver performs at sf0.01."""

from __future__ import annotations

import pytest

from scache_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import assert_frames_match

_ensure_loaded()

WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, oracle_con, sf_dir, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = oracle_con.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_every_query_is_oracle_checked():
    """There are deliberately NO rows-only registry entries: every
    query carries a DuckDB oracle (the driver's strongest check).  If
    a future operator genuinely can't be SQL-expressed, it may join
    ROWS_ONLY — then restore the parametrized run-only smoke test
    this assertion replaced."""
    assert ROWS_ONLY == []
