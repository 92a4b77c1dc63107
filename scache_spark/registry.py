"""Query registry: the contract between the engine and the driver.

Each registered query is a named, pure ``(spark, sf_dir) -> DataFrame``
callable plus (where SQL-expressible) an ANSI-SQL oracle string DuckDB
runs on the same parquet files.  ``__spark_entry__.py`` exposes the
registry to the driver; tests iterate it.

Determinism contract (FIXTURES.md): every aggregate/computed column is
aliased identically in the Spark plan and the oracle SQL; all
randomness is seeded; results are compared order-insensitively by the
driver, so no ORDER BY is required except under LIMIT/top-k, where
ordering must be total (ties broken by a unique key).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imported for registration side effects.
    from scache_spark.operators import (  # noqa: F401
        blocks,
        clustering,
        dedup,
        extra,
        multimodal,
        pipeline,
        prediction,
        relational,
        scalar,
        similarity,
        temporal,
        text,
        udf,
    )
    from scache_spark.streaming import stateful, windows  # noqa: F401

    _LOADED = True
