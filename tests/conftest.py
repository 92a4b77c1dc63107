"""Shared pytest fixtures: one SparkSession per run, a DuckDB oracle
connection with fixture views registered, and the order-insensitive
result comparator mirroring the driver's check."""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from scache_spark.catalog import TABLES, table_path
from scache_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session("scache-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()


def _sort_repr(v) -> str:
    """Stable cross-engine representation for row ordering: floats are
    rounded to 6 significant digits so values equal-within-tolerance
    sort identically in both frames."""
    if v is None:
        return "\x00none"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00nan"
        return f"{v:.6g}"
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_sort_repr(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "\x00none"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by a stringified key over all
    columns — the driver's order-insensitive canonical form.

    The key is built by zipping COLUMN Series, never by row-wise
    ``df.apply``: apply materializes each row as a single-dtype
    Series, upcasting ints to float when any float column exists, so
    a 7-digit integer key renders at _sort_repr's 6 significant
    digits and COLLIDES with its neighbors — the stable sort then
    keeps engine-specific input order and value-identical frames
    spuriously mismatch (x10-replica finding: sf fixtures never grow
    keys past 6 digits)."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        cols = [df[c].to_numpy() for c in df.columns]
        key = np.array(
            ["|".join(_sort_repr(v) for v in row) for row in zip(*cols)],
            dtype=object,
        )
        df = df.iloc[np.argsort(key, kind="stable")].reset_index(drop=True)
    return df


import datetime


def _is_datelike(v) -> bool:
    return isinstance(v, (datetime.date, datetime.datetime, np.datetime64, pd.Timestamp))


def _cell_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if _is_datelike(a) and _is_datelike(b):
        pa, pb = pd.Timestamp(a), pd.Timestamp(b)
        if pd.isna(pa) and pd.isna(pb):  # NaT == NaT is False otherwise
            return True
        return pa == pb
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-9)
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(_cell_equal(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    s, o = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    assert list(s.columns) == list(o.columns), (
        f"{name}: column mismatch spark={list(s.columns)} oracle={list(o.columns)}"
    )
    assert len(s) == len(o), f"{name}: row count spark={len(s)} oracle={len(o)}"
    for col in s.columns:
        sv, ov = s[col].to_numpy(), o[col].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) and np.issubdtype(
            ov.dtype, np.floating
        ):
            ok = np.isclose(sv, ov, rtol=1e-6, atol=1e-9, equal_nan=True)
            assert ok.all(), (
                f"{name}.{col}: {np.count_nonzero(~ok)} float mismatches, "
                f"first at row {int(np.argmin(ok))}: "
                f"{sv[np.argmin(ok)]} vs {ov[np.argmin(ok)]}"
            )
        else:
            for i, (a, b) in enumerate(zip(sv, ov)):
                assert _cell_equal(a, b), f"{name}.{col}[{i}]: {a!r} != {b!r}"


@pytest.fixture(scope="session")
def plan_reports(spark):
    """ONE plan sweep shared by the shape ratchet and the lint (r7):
    each batch query's DataFrame is built once and explained once —
    previously both tests independently re-built and re-explained all
    ~290 plans (~2 min of duplicated Catalyst work, plus re-executing
    every eager localCheckpoint builder twice)."""
    from scache_spark.plans import sweep_plan_reports

    return sweep_plan_reports(spark)
