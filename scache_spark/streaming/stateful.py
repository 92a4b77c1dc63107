"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2 B27): per-user running aggregates with explicit state.

This is the engine's programmable analog of the reference's
MapOutputTracker bookkeeping: long-lived keyed state updated per
arrival (``updateMapBlocksStatus`` decrements a per-map counter as
blocks arrive, MapOutputTracker.scala:282-292) — here the keyed state
is a per-user (count, sum) pair updated per micro-batch.

The final emitted state equals the batch groupBy (each batch emits the
cumulative totals; the driver-side max-per-user collapse makes the
result batch-equivalent regardless of how availableNow splits files
into micro-batches), which is what makes it oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from scache_spark.registry import register
from scache_spark.streaming.windows import events_stream, run_stream

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each arriving batch into keyed state; emit the running
    cumulative total.  State is a (count, sum) pair — O(1) per key,
    the only thing that scales to unbounded streams."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += int(len(pdf))
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


@register(
    "stream_stateful_user_totals",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY user_id
    """,
    tags=("B27", "B23"),
    doc="applyInPandasWithState per-user running totals; cumulative "
    "emissions collapsed with max_by(n_events) so the final state "
    "equals the batch aggregate (the oracle) regardless of "
    "micro-batch splits.",
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # user_id >= 0 drops the staged flush row (synthetic user -1)
    s = (
        events_stream(spark, sf_dir)
        .filter(F.col("user_id") >= 0)
        .select("user_id", "value")
    )
    updated = s.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emitted = run_stream(updated, "stateful_totals", "append")
    # keep the last (largest-n) emission per user: cumulative totals are
    # monotone, so max(n_events) identifies the final state
    return emitted.groupBy("user_id").agg(
        F.max("n_events").cast("long").alias("n_events"),
        F.round(F.max_by("total_value", "n_events"), 4).alias("total_value"),
    )
