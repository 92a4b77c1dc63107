"""Shuffle observability + prefetch helpers (SURVEY.md §7 M6).

The reference's two genuinely novel behaviors are (1) cluster-wide
per-shuffle size statistics (MapStatus aggregation at the master,
storage/BlockManagerMasterEndpoint.scala:323-379) and (2) push-style
prefetch of shuffle blocks overlapping the producing stage
(storage/BlockManager.scala:331-352,616-656).  In the engine:

1. ``shuffle_stats`` reads the *exact* per-exchange runtime metrics
   AQE already collects — rows and bytes per shuffle — replacing the
   reference's predicted sizes with observed ones.
2. ``prefetch`` early-materializes a hot DataFrame (persist + async
   count) so a later consumer starts from memory — the engine-level
   analog of pre-fetching a shuffle's blocks before the reduce stage
   asks, with Spark's BlockManager doing placement/eviction.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass

from pyspark import StorageLevel
from pyspark.sql import DataFrame


@dataclass(frozen=True)
class ExchangeStats:
    """Observed size of one shuffle — the engine's MapStatus."""

    node: str
    rows: int | None
    data_size_bytes: int | None


def shuffle_stats(df: DataFrame) -> list[ExchangeStats]:
    """Execute ``df`` and report rows/bytes for every shuffle exchange
    in its final (AQE) plan.  These are exact observed statistics —
    what the reference approximates with first-wave linear regression
    (sim/train.py:237-270)."""
    # collect() executes THIS df's queryExecution — metrics live on the
    # executed instance (a separate count() plan would leave them zero)
    df.collect()
    out: list[ExchangeStats] = []

    def visit(node) -> None:
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            visit(node.executedPlan())
            return
        if "QueryStage" in name:  # AQE materialized stage wrapper
            visit(node.plan())
            return
        if "Exchange" in name and "Broadcast" not in name:
            rows = size = None
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                key, metric = kv._1(), kv._2()
                if key == "shuffleRecordsWritten":
                    rows = metric.value()
                elif key == "dataSize":
                    size = metric.value()
            out.append(ExchangeStats(node=name, rows=rows, data_size_bytes=size))
        for i in range(node.children().length()):
            visit(node.children().apply(i))

    visit(df._jdf.queryExecution().executedPlan())
    return out


class PrefetchHandle:
    """A running early materialization.  ``await_ready`` blocks until
    the data is cached; ``df`` is the persisted frame to build on.
    A failure inside the background job is captured and re-raised by
    ``await_ready`` — a 'prefetched' frame must never silently be a
    cold (or broken) one."""

    def __init__(self, df: DataFrame):
        self.df = df
        self.error: BaseException | None = None

        def _materialize() -> None:
            try:
                df.count()
            except BaseException as exc:  # noqa: BLE001 — stored, re-raised
                self.error = exc

        self._thread = threading.Thread(target=_materialize, daemon=True)
        self._thread.start()

    def await_ready(self, timeout: float | None = None) -> DataFrame:
        self._thread.join(timeout)
        if self.error is not None:
            raise self.error
        return self.df

    @property
    def ready(self) -> bool:
        """True only when materialization finished WITHOUT error."""
        return not self._thread.is_alive() and self.error is None


def prefetch(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> PrefetchHandle:
    """Start materializing ``df`` now, in a background thread, so a
    later consumer reads it from cache — overlap instead of lazy
    recompute.  MEMORY_AND_DISK mirrors the reference's memory-first /
    disk-fallback storage posture (storage/BlockManager.scala:846-921).

    Spark is thread-safe for concurrent actions on one session; the
    scheduler interleaves the prefetch job with foreground work the
    same way the reference overlaps block pushes with map compute.
    """
    return PrefetchHandle(df.persist(level))
