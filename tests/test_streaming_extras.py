"""Streaming mechanics beyond the oracle gate: foreachBatch sinks and
checkpointed exactly-once resume."""

from __future__ import annotations

from pyspark.sql import functions as F

from scache_spark.catalog import load_table
from scache_spark.streaming.windows import events_stream


def test_foreachbatch_incremental_sink(spark, sf_dir, tmp_path):
    """foreachBatch: the programmable sink (upsert-into-anything shape).
    Accumulate per-batch aggregates into a parquet target; the final
    union equals the batch answer."""
    out = str(tmp_path / "agg_sink")

    def sink(batch_df, batch_id: int):
        (
            batch_df.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out)
        )

    q = (
        # event_id >= 0 drops the staged watermark-flush row
        events_stream(spark, sf_dir)
        .filter(F.col("event_id") >= 0)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    sunk = spark.read.parquet(out).groupBy("event_type").agg(F.sum("n").alias("n"))
    expected = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r["event_type"]: r["n"] for r in sunk.collect()}
    want = {r["event_type"]: r["n"] for r in expected.collect()}
    assert got == want


def test_checkpoint_no_reprocessing_on_restart(spark, sf_dir, tmp_path):
    """Exactly-once via checkpoint: restarting an availableNow query
    over an unchanged source processes zero new rows."""
    out = str(tmp_path / "sink2")
    ckpt = str(tmp_path / "ckpt2")
    seen = []

    def sink(batch_df, batch_id):
        n = batch_df.count()
        seen.append(n)
        batch_df.limit(0).write.mode("append").parquet(out)

    def run_once():
        q = (
            events_stream(spark, sf_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    first_total = sum(seen)
    assert first_total > 0
    seen.clear()
    run_once()  # same checkpoint, unchanged source
    assert sum(seen) == 0, f"reprocessed {sum(seen)} rows after restart"
