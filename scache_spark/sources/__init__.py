"""Source/sink surface (SURVEY.md §2 B1): parquet, CSV, JSON-lines,
and partitioned/bucketed writes.

The reference's 'sources' are mmap'd tmp files handed across the
daemon boundary (deploy/Daemon.scala:45-64) — i.e. raw bytes with no
format.  The engine is format-first: every reader takes an explicit
schema (no inference scans at 100 TB) and every writer controls
layout (partitioning, bucketing, target file size) because layout IS
the query plan's first stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def pin_thread_active_session(spark: SparkSession) -> None:
    """Pin ``spark`` as the JVM-thread-local ACTIVE session for the
    calling Python thread.

    Python DataSource lookup (``format("avro_ocf")`` etc.) resolves
    through the *active* session's DataSourceManager, and the JVM
    active session is a thread-local.  py4j gives every Python thread
    its own JVM connection thread, so a query built from a worker
    thread (the threaded correctness suite, any driver-side thread
    pool overlapping jobs per optimization-guide §2.6) sees NO active
    session there and the lookup falls through to classloading —
    DATA_SOURCE_NOT_FOUND on a source that IS registered.  Each
    ``register_*`` helper calls this so the session is pinned on the
    same thread that will run the read/write."""
    spark._jvm.org.apache.spark.sql.SparkSession.setActiveSession(  # noqa: SLF001
        spark._jsparkSession  # noqa: SLF001
    )


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Schema-required CSV: inference reads the whole dataset twice at
    100 TB — never.

    NULL sentinel contract (dirty-catalog, SCALE.md §16): text formats
    cannot natively distinguish NULL from the empty string — Spark's
    default read maps BOTH the unquoted empty field and a quoted
    \"\" to NULL, so a NULL/'' distinction written by the parquet
    source is silently destroyed by a CSV round trip.  Writer
    (write_csv below) and reader agree on the explicit ``\\N``
    sentinel for NULL and keep '' as a quoted empty — the round trip
    is lossless.
    """
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("nullValue", "\\N")
        .option("emptyValue", "")
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV writer matching read_csv's NULL sentinel contract: NULL
    fields serialize as ``\\N``, empty strings as a quoted empty —
    the two survive the text round trip distinctly."""
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("nullValue", "\\N")
        .option("emptyValue", "\"\"")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-required JSON-lines (the reference's trace-log shape,
    sim/util.py:21-51 parses Spark event-log JSON)."""
    return spark.read.schema(schema).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Partition-aware parquet sink.  ``partition_by`` columns become
    directory partitions → downstream partition pruning; cap file size
    via maxRecordsPerFile so 100 TB writes produce ~128 MB files, not
    2 GB stragglers."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: co-locates join keys at write time
    so later joins on ``bucket_cols`` skip the shuffle entirely — the
    engine's durable version of the reference's pre-scheduled reduce
    placement (MapOutputTracker.scala:199-213): partition-by-key
    decided once, reused by every consumer."""
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )
