"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API):
a deterministic shuffle-block-trace generator shaped like the
reference's block model.

The reference's unit of data is a block keyed by
``(app, jobId, shuffleId, mapId, reduceId)`` with an observed byte
size (reference storage/BlockId.scala:79-81, size accounting
storage/BlockManagerMasterEndpoint.scala:323-379).  This source
materializes that keyspace as a proper Spark relation WITHOUT any
input files: each Spark task generates one mapId-range slice
closed-form, so the source parallelizes like a real scan (one
`InputPartition` per map-chunk), costs zero I/O, and scales to any
requested trace size by adding partitions — the Spark-4-native way to
expose a synthetic/external keyspace to the engine, replacing the
RDD-based generators older code reached for.

Sizes are a closed-form integer hash of the key,
``(mapId*2654435761 + reduceId*40503 + shuffleId*97) % 1000003 %
32768`` (Knuth multiplicative constants), all within int64 — so a SQL
engine can reproduce the exact trace from a range join, which is what
the DuckDB oracle for `blocktrace_source_agg` does.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

SCHEMA_DDL = (
    "app string, job_id int, shuffle_id int, map_id int, reduce_id int, size_b bigint"
)


def block_size(shuffle_id: int, map_id: int, reduce_id: int) -> int:
    return (map_id * 2654435761 + reduce_id * 40503 + shuffle_id * 97) % 1000003 % 32768


class _MapRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class BlockTraceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.app = options.get("app", "scache")
        self.job_id = int(options.get("job_id", "0"))
        self.shuffles = int(options.get("shuffles", "1"))
        self.maps = int(options.get("maps", "64"))
        self.reduces = int(options.get("reduces", "16"))
        self.num_partitions = int(options.get("numPartitions", "8"))

    def partitions(self) -> list[InputPartition]:
        chunk = max(1, -(-self.maps // self.num_partitions))
        return [
            _MapRange(lo, min(lo + chunk, self.maps))
            for lo in range(0, self.maps, chunk)
        ]

    def read(self, partition: _MapRange) -> Iterator[tuple]:
        for m in range(partition.start, partition.end):
            for s in range(self.shuffles):
                for r in range(self.reduces):
                    yield (self.app, self.job_id, s, m, r, block_size(s, m, r))


class BlockTraceDataSource(DataSource):
    """`spark.read.format("scache_blocks")` after `register_blocktrace`."""

    @classmethod
    def name(cls) -> str:
        return "scache_blocks"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return BlockTraceReader(self.options)

    def streamReader(self, schema: StructType) -> "BlockTraceStreamReader":
        return BlockTraceStreamReader(self.options)


def register_blocktrace(spark) -> None:
    """Idempotently register the data source with the session."""
    from scache_spark.sources import pin_thread_active_session

    pin_thread_active_session(spark)
    spark.dataSource.register(BlockTraceDataSource)


# ---------------------------------------------------------------------------
# streaming reader: map-output WAVES as micro-batch offsets
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class BlockTraceStreamReader(DataSourceStreamReader):
    """Streams the same deterministic trace in map-output WAVES: offset
    = number of waves emitted, each wave = ``wave_size`` consecutive
    mapIds' blocks.  This is the reference's arrival model — map tasks
    finish in waves, and SCache's size predictor trains on the FIRST
    wave (sim/train.py:237-243); its prefetch trigger fires per
    completed map (storage/BlockManagerMasterEndpoint.scala:347-366).

    Arrival pacing is explicit (r2 advisor finding): by default
    ``latestOffset`` exposes every wave at once, so under
    ``availableNow`` ALL waves land in one micro-batch (each wave
    still its own input partition).  With ``per_wave_batches=true``
    the reader advances ONE wave per trigger, so a processing-time
    trigger delivers each wave as its own micro-batch — the
    reference's per-wave arrival callback made literal.  Progress is
    tracked from ``partitions(start, end)`` (called at every batch
    plan, including the restart replay of the last logged batch), NOT
    from ``commit``: Spark commits a source offset only when the NEXT
    batch constructs, so commit-based pacing would deadlock after the
    first wave when no newer data exists yet.
    """

    def __init__(self, options: dict):
        self.inner = BlockTraceReader(options)
        self.wave_size = int(options.get("wave_size", "16"))
        self.n_waves = max(1, -(-self.inner.maps // self.wave_size))
        self.per_wave = (
            str(options.get("per_wave_batches", "false")).lower() == "true"
        )
        self._planned = 0  # highest wave handed to a batch plan

    def initialOffset(self) -> dict:
        return {"wave": 0}

    def latestOffset(self) -> dict:
        if self.per_wave:
            return {"wave": min(self._planned + 1, self.n_waves)}
        return {"wave": self.n_waves}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        self._planned = max(self._planned, int(end["wave"]))
        parts = []
        for w in range(start["wave"], end["wave"]):
            lo = w * self.wave_size
            hi = min(lo + self.wave_size, self.inner.maps)
            if lo < hi:
                parts.append(_MapRange(lo, hi))
        return parts

    def read(self, partition: _MapRange) -> Iterator[tuple]:
        return self.inner.read(partition)

    def commit(self, end: dict) -> None:
        # progress is tracked in partitions() (see class doc); nothing
        # to clean up for a synthetic closed-form source
        pass
