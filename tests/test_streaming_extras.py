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


def test_foreachbatch_redelivery_is_idempotent(spark, sf_dir, tmp_path):
    """Exactly-once sink discipline: foreachBatch may RE-DELIVER a
    batch after a failure (same batch_id).  A sink that partitions by
    batch_id and writes with dynamic partition-overwrite makes the
    retry overwrite its own partition — totals identical whether a
    batch arrives once or twice.  (The append-mode sink in
    stream_foreachbatch_sink would double-count; this is the
    production-hardened variant.)"""
    out = str(tmp_path / "eo_sink")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:

        def sink(batch_df, batch_id: int):
            (
                batch_df.groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_part"),
                    F.round(F.sum("value"), 4).alias("t_part"),
                )
                .withColumn("batch_id", F.lit(batch_id))
                .write.partitionBy("batch_id")
                .mode("overwrite")
                .parquet(out)
            )

        ev = load_table(spark, sf_dir, "events")
        half1 = ev.filter(F.col("event_id") % 2 == 0)
        half2 = ev.filter(F.col("event_id") % 2 == 1)
        sink(half1, 0)
        sink(half2, 1)
        once = {
            r["event_type"]: (r["n"], r["t"])
            for r in spark.read.parquet(out)
            .groupBy("event_type")
            .agg(
                F.sum("n_part").cast("long").alias("n"),
                F.round(F.sum("t_part"), 4).alias("t"),
            )
            .collect()
        }
        sink(half2, 1)  # failure-recovery re-delivery of the last batch
        twice = {
            r["event_type"]: (r["n"], r["t"])
            for r in spark.read.parquet(out)
            .groupBy("event_type")
            .agg(
                F.sum("n_part").cast("long").alias("n"),
                F.round(F.sum("t_part"), 4).alias("t"),
            )
            .collect()
        }
        assert once == twice and len(once) > 0
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def test_rocksdb_state_store_matches_default_provider(spark, sf_dir):
    """The RocksDB state store (the disk-spilling provider a 100 TB
    keyspace needs — the default HDFS-backed in-memory maps OOM
    first) must produce byte-identical windowed aggregates."""
    from scache_spark.streaming.windows import run_stream

    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )

    def tumbling():
        s = events_stream(spark, sf_dir).withWatermark("ts", "1 minute")
        agg = s.groupBy(
            F.window("ts", "5 minutes").alias("w"), "event_type"
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        res = agg.select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        return run_stream(res, "rocksdb_check", "append").toPandas()

    base = tumbling().sort_values(["window_start", "event_type"]).reset_index(
        drop=True
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, rocksdb)
    try:
        rdb = tumbling().sort_values(
            ["window_start", "event_type"]
        ).reset_index(drop=True)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert base.equals(rdb), (len(base), len(rdb))


def test_transform_with_state_mix_matches_batch(spark, sf_dir, oracle_con):
    """Per-user type-mix stateful operator vs the batch oracle.  Runs
    in EVERY environment: the Spark-4 transformWithStateInPandas
    MapState path where protobuf (its driver-worker wire protocol)
    exists, else the applyInPandasWithState parallel-array fallback —
    same emissions either way (detect-and-degrade, never a skip)."""
    from scache_spark.streaming.stateful import (
        _TWS_ORACLE,
        stream_transform_with_state_mix,
    )

    from tests.conftest import assert_frames_match

    spark_pdf = stream_transform_with_state_mix(spark, sf_dir).toPandas()
    oracle_pdf = oracle_con.execute(_TWS_ORACLE).df()
    assert_frames_match(spark_pdf, oracle_pdf, "stream_transform_with_state_mix")


def test_type_mix_fallback_state_roundtrip():
    """The fallback's state fold: two batches accumulate, ties on
    count break type-asc, state stays O(|types|)."""
    import pandas as pd

    from scache_spark.streaming.stateful import _update_type_mix

    class _FakeState:
        exists = False
        get = None

        def update(self, v):
            self.exists, self.get = True, v

    st = _FakeState()
    b1 = pd.DataFrame({"event_type": ["a", "b", "b"]})
    out1 = next(_update_type_mix((7,), iter([b1]), st))
    assert out1.loc[0, "top_type"] == "b" and out1.loc[0, "n_total"] == 3
    b2 = pd.DataFrame({"event_type": ["a", "c"]})
    out2 = next(_update_type_mix((7,), iter([b2]), st))
    # a and b now tied at 2 -> type-asc tie-break picks 'a'
    assert out2.loc[0, "top_type"] == "a"
    assert out2.loc[0, "n_total"] == 5 and out2.loc[0, "n_types"] == 3
    assert sorted(st.get[0]) == ["a", "b", "c"]


def test_watermark_actually_drops_window_state(spark, sf_dir, tmp_path):
    """The append-mode watermark contract, observed in the state-store
    metrics: events staged as TIME-ORDERED file slices replay as
    multiple availableNow micro-batches (maxFilesPerTrigger=1), the
    watermark advances between batches, and closed windows are
    EVICTED — numRowsRemoved fires and live state stays bounded far
    below the total window count."""
    import time

    from pyspark.sql import functions as F  # noqa: F811

    from scache_spark.catalog import SCHEMAS, load_table

    src = str(tmp_path / "sliced")
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo) / 4
    for i in range(4):
        s0, s1 = lo + i * span, lo + (i + 1) * span
        cond = (F.col("ts") >= F.lit(s0)) & (
            F.col("ts") <= F.lit(hi) if i == 3 else F.col("ts") < F.lit(s1)
        )
        ev.filter(cond).repartition(1).write.mode("append").parquet(src)
        time.sleep(0.1)  # distinct mtimes -> deterministic batch order

    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 minute")
    )
    agg = stream.groupBy(F.window("ts", "5 minutes"), "event_type").count()
    q = (
        agg.writeStream.format("memory")
        .queryName("state_drop_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    assert q.exception() is None
    progresses = [p for p in q.recentProgress if p["stateOperators"]]
    removed = sum(
        p["stateOperators"][0].get("numRowsRemoved", 0) for p in progresses
    )
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in progresses]
    emitted = spark.table("state_drop_probe").count()
    total_groups = (
        ev.groupBy(F.window("ts", "5 minutes"), "event_type").count().count()
    )
    assert emitted > 0
    assert removed > 0, "watermark never evicted any window state"
    # live state at every point stays well below the all-windows total
    # (complete mode would hold total_groups rows forever)
    assert max(totals) < total_groups, (max(totals), total_groups)


def test_neardup_bucket_verdicts_monotone_across_batches():
    """The ingest deduper's cross-batch contract (the part the
    single-batch oracle can't exercise): a doc's collided verdict is
    false only while it is the bucket minimum, flips true when a
    smaller id arrives later, never flips back — so the downstream
    max() collapse equals batch min-id semantics for any batch split.
    Also: cap eviction still emits the evicted id's (true) verdict."""
    import pandas as pd

    import scache_spark.streaming.stateful as st_mod
    from scache_spark.streaming.stateful import _update_neardup_bucket

    class _FakeState:
        exists = False
        get = None

        def update(self, v):
            self.exists, self.get = True, v

    st = _FakeState()
    key = (2, "abc")
    out1 = next(
        _update_neardup_bucket(key, iter([pd.DataFrame({"doc_id": [10, 30]})]), st)
    )
    v1 = dict(zip(out1["doc_id"], out1["collided"]))
    assert v1 == {10: False, 30: True} and (out1["band_id"] == 2).all()

    # batch 2: a SMALLER id arrives late -> 10's verdict flips true
    out2 = next(
        _update_neardup_bucket(key, iter([pd.DataFrame({"doc_id": [5]})]), st)
    )
    v2 = dict(zip(out2["doc_id"], out2["collided"]))
    assert v2 == {5: False, 10: True, 30: True}
    # max() collapse over both emissions == batch min-id verdicts
    both = pd.concat([out1, out2]).groupby("doc_id")["collided"].max()
    assert dict(both) == {5: False, 10: True, 30: True}

    # cap eviction: ids beyond the cap are emitted (true) but not kept
    orig = st_mod._NEARDUP_BUCKET_CAP
    st_mod._NEARDUP_BUCKET_CAP = 2
    try:
        out3 = next(
            _update_neardup_bucket(
                key, iter([pd.DataFrame({"doc_id": [7]})]), st
            )
        )
    finally:
        st_mod._NEARDUP_BUCKET_CAP = orig
    v3 = dict(zip(out3["doc_id"], out3["collided"]))
    assert v3 == {5: False, 7: True, 10: True, 30: True}
    assert st.get[0] == [5, 7]  # smallest ids retained, 10/30 evicted
