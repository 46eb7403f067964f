"""Streaming-layer tests: batch/stream parity, replay idempotence,
windowed aggregation equivalence between batch and streaming modes."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from click_streaming_data_pipeline_spark.operators.upsert import (
    latest_rows,
    upsert_parquet,
)
from click_streaming_data_pipeline_spark.sources import load_table
from click_streaming_data_pipeline_spark.sources.cdc import (
    filter_and_flatten,
    parse_cdc,
    synth_cdc_envelopes,
)
from click_streaming_data_pipeline_spark.streaming.pipeline import (
    run_batch,
    run_streaming,
)
from click_streaming_data_pipeline_spark.streaming.windows import (
    tumbling_counts,
)

from .conftest import SF_TEST


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cdc_stream_equals_batch(spark):
    batch = run_batch(spark, SF_TEST)
    streamed = run_streaming(spark, SF_TEST)
    assert sorted(batch.columns) == sorted(streamed.columns)
    assert _rows(batch.select(*sorted(batch.columns))) == _rows(
        streamed.select(*sorted(batch.columns))
    )


def test_cdc_filters_snapshot_and_deletes(spark):
    env = parse_cdc(synth_cdc_envelopes(spark, SF_TEST))
    ops = {r["op"] for r in filter_and_flatten(env).select("op").collect()}
    assert ops <= {"c", "u"}
    raw_ops = {r["op"] for r in env.select("op").collect()}
    assert raw_ops == {"c", "u", "r", "d"}


def test_upsert_replay_idempotent(spark):
    """Re-applying the same batch (at-least-once delivery) must not
    change the target state (I1 effectively-once)."""
    docs = load_table(spark, SF_TEST, "documents").select(
        "doc_id", "text", F.lit(1).alias("version")
    )
    with tempfile.TemporaryDirectory() as d:
        target = os.path.join(d, "state")
        upsert_parquet(spark, target, docs, ["doc_id"], ["version"])
        first = _rows(spark.read.parquet(target))
        upsert_parquet(spark, target, docs, ["doc_id"], ["version"])
        assert _rows(spark.read.parquet(target)) == first
        # higher version wins
        bumped = docs.withColumn("version", F.lit(2))
        upsert_parquet(spark, target, bumped, ["doc_id"], ["version"])
        vs = {
            r["version"] for r in spark.read.parquet(target).collect()
        }
        assert vs == {2}


def test_latest_rows_resolves_max_version(spark):
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 3, "c"), (1, 2, "b"), (2, 1, "x")],
        ["id", "version", "val"],
    )
    got = {
        (r["id"], r["version"], r["val"])
        for r in latest_rows(df, ["id"], ["version"]).collect()
    }
    assert got == {(1, 3, "c"), (2, 1, "x")}


def test_tumbling_stream_equals_batch(spark):
    """Windowed agg through a real stream (availableNow, complete
    mode) equals the batch window aggregation."""
    events = load_table(spark, SF_TEST, "events")
    # exact distinct is rejected on streams (unbounded state): compare
    # both modes on the mergeable HLL-sketch variant
    expected = _rows(tumbling_counts(events, "1 hour", exact_uniques=False))

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in")
        events.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        agg = tumbling_counts(
            stream, "1 hour", watermark="2 hours", exact_uniques=False
        )
        q = (
            agg.writeStream.queryName("tumbling_test")
            .format("memory")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = _rows(spark.table("tumbling_test"))
    assert got == expected


@pytest.mark.slow
def test_user_state_stream_equals_batch(spark):
    from click_streaming_data_pipeline_spark.plans import QUERIES

    batch = QUERIES["user_state_batch"].fn(spark, SF_TEST)
    streamed = QUERIES["user_state_streamed"].fn(spark, SF_TEST)
    cols = sorted(batch.columns)
    assert _rows(batch.select(*cols)) == _rows(streamed.select(*cols))


def test_watermark_finalized_windows_ignore_late_data(spark):
    """I2 semantics, the part Spark guarantees: once a window has been
    emitted in APPEND mode (watermark passed its end) and its state
    evicted, a later-arriving event for that window is dropped - the
    window is NOT re-emitted or double counted. (Dropping of all
    late-but-not-yet-finalized data is explicitly NOT guaranteed and
    is not asserted.)"""
    import datetime as dt
    import glob
    import shutil
    import uuid

    def ev(h, m, i):
        return (i, dt.datetime(2024, 1, 1, h, m), 1, "view", 1.0, "{}")

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    files = [
        # batch 1: five events in the 10:00 window
        [ev(10, 5 + i, i) for i in range(5)],
        # batch 2: fresh event advances watermark to 11:30
        [ev(12, 30, 21)],
        # batch 3: another fresh event; during this batch the 11:30
        # watermark finalizes + emits + evicts the 10:00 window
        [ev(12, 40, 22)],
        # batch 4: a LATE event for the already-finalized 10:00 window
        [ev(10, 40, 23)],
    ]

    work = tempfile.mkdtemp(prefix="csdp_late_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    for n, rows in enumerate(files):
        tmp = os.path.join(work, f"tmp_{n}")
        spark.createDataFrame(rows, cols).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(src, f"{chr(ord('a') + n)}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (1_000_000_000 + n * 100,) * 2)

    schema = spark.createDataFrame(files[0], cols).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [
        (r["window_start"], r["n"]) for r in spark.table(name).collect()
    ]
    # exactly one emission of the 10:00 window, count 5: the late
    # 10:40 arrival after finalization was dropped, not re-emitted;
    # the 12:00 window (end beyond final watermark) is withheld
    assert rows == [(dt.datetime(2024, 1, 1, 10, 0), 5)]


def test_checkpoint_recovery_converges(spark):
    """I1: kill the CDC streaming query mid-run, restart from the same
    checkpoint, and the upsert target still converges to the batch
    result - offset tracking + idempotent MERGE give effectively-once
    across restarts."""
    import time
    import uuid

    from click_streaming_data_pipeline_spark.operators.upsert import (
        foreach_batch_upsert,
    )
    from click_streaming_data_pipeline_spark.sources.cdc import (
        synth_cdc_envelopes,
    )
    from click_streaming_data_pipeline_spark.streaming.pipeline import (
        run_batch,
        transform,
    )

    work = tempfile.mkdtemp(prefix="csdp_recov_")
    src = os.path.join(work, "in")
    target = os.path.join(work, "state")
    ckpt = os.path.join(work, "ckpt")
    synth_cdc_envelopes(spark, SF_TEST).repartition(8).write.mode(
        "overwrite"
    ).text(src)

    def start(trigger_kwargs):
        raw = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", 2)
            .load(src)
        )
        return (
            transform(raw)
            .writeStream.queryName(f"recov_{uuid.uuid4().hex[:8]}")
            .foreachBatch(
                foreach_batch_upsert(target, ["doc_id"], ["version", "ts_ms"])
            )
            .option("checkpointLocation", ckpt)
            .trigger(**trigger_kwargs)
            .start()
        )

    # phase 1: run continuously, kill after the first committed batch
    q1 = start({"processingTime": "0 seconds"})
    deadline = time.time() + 60
    while not q1.recentProgress and time.time() < deadline:
        time.sleep(0.2)
    q1.stop()
    q1.awaitTermination()
    assert q1.recentProgress, "first run never committed a batch"

    # phase 2: resume from the same checkpoint and drain
    q2 = start({"availableNow": True})
    q2.awaitTermination()

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(target)
        .select("doc_id", "version", "text")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in run_batch(spark, SF_TEST)
        .select("doc_id", "version", "text")
        .collect()
    )
    assert got == want


def test_interval_join_binned_equals_plain(spark):
    from click_streaming_data_pipeline_spark.operators.asof import (
        interval_join,
        interval_join_binned,
    )

    ev = load_table(spark, SF_TEST, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    cols = ["user_id", "l_event_id", "r_event_id"]
    plain = _rows(interval_join(clicks, purch, max_gap="1 hour").select(*cols))
    binned = _rows(
        interval_join_binned(clicks, purch, gap_seconds=3600).select(*cols)
    )
    assert plain == binned


@pytest.mark.slow
def test_tws_user_state_equals_batch(spark, tmp_path):
    """Spark 4 v2 stateful API (transformWithStateInPandas) parity
    with the batch twin. Auto-skips where the TWS protobuf runtime is
    absent (this container); runs wherever protobuf is installed."""
    import pytest as _pytest

    from click_streaming_data_pipeline_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        tws_runtime_available,
        user_state_batch,
        user_state_stream_tws,
    )

    if not tws_runtime_available():
        _pytest.skip("transformWithStateInPandas needs google.protobuf")

    from click_streaming_data_pipeline_spark.sources import load_table

    events = load_table(spark, SF_TEST, "events")
    src = str(tmp_path / "in")
    events.repartition(6).write.mode("overwrite").parquet(src)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        q = (
            user_state_stream_tws(stream)
            .writeStream.queryName("tws_parity")
            .format("memory")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        from click_streaming_data_pipeline_spark.operators.upsert import (
            latest_rows,
        )

        res = latest_rows(spark.table("tws_parity"), ["user_id"], ["total_events"])
        batch = user_state_batch(events)
        assert res.exceptAll(batch).count() == 0
        assert batch.exceptAll(res).count() == 0
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
