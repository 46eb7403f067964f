"""Real-broker Kafka integration test (SURVEY 2 A2/A3).

This sandbox has no Kafka broker (and no spark-sql-kafka connector
jar), so the whole module auto-skips unless ``SPARK_GRAFT_KAFKA``
points at a reachable bootstrap server — wherever a broker exists
(e.g. CI with a Kafka service container), the same file exercises the
full produce -> consume round-trip with zero code changes.

Run against a broker:

    SPARK_GRAFT_KAFKA=localhost:9092 python -m pytest tests/test_kafka_integration.py

Reference parity: consumer group semantics (event main.py:22-26) and
the JSON producer (data-quality main.py:217-233).
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest

KAFKA_ENV = "SPARK_GRAFT_KAFKA"


def _broker_reachable(addr: str) -> bool:
    host, _, port = addr.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=2):
            return True
    except OSError:
        return False


_BROKERS = os.environ.get(KAFKA_ENV, "")

pytestmark = pytest.mark.skipif(
    not _BROKERS or not _broker_reachable(_BROKERS),
    reason=f"no Kafka broker (set {KAFKA_ENV}=host:port to enable)",
)


def test_kafka_round_trip(spark, tmp_path):
    """Produce rows through write_kafka_stream, read them back through
    read_kafka_stream, assert payloads + metadata columns survive."""
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.streaming.kafka import (
        read_kafka_stream,
        write_kafka_stream,
    )

    topic = f"csdp_it_{uuid.uuid4().hex[:8]}"
    rows = spark.createDataFrame(
        [(1, "created"), (2, "updated"), (3, "deleted")],
        "event_id long, op string",
    )
    # batch-write via the streaming sink builder's options: one
    # availableNow micro-batch drains the frame into the topic
    writer = write_kafka_stream(
        _as_stream(spark, rows, str(tmp_path / "in")),
        _BROKERS,
        topic,
        checkpoint_dir=str(tmp_path / "ckpt_w"),
        key_col="event_id",
    )
    writer.trigger(availableNow=True).start().awaitTermination()

    stream = read_kafka_stream(spark, _BROKERS, topic)
    out_dir = str(tmp_path / "out")
    (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt_r"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.read.parquet(out_dir)
    assert got.count() == 3
    parsed = got.select(
        F.get_json_object("value", "$.op").alias("op"),
        F.col("key"),
        F.col("kafka_ts"),
    ).collect()
    assert {r["op"] for r in parsed} == {"created", "updated", "deleted"}
    assert {r["key"] for r in parsed} == {"1", "2", "3"}
    assert all(r["kafka_ts"] is not None for r in parsed)


def _as_stream(spark, df, path: str):
    """Write a static frame to parquet and re-open it as a bounded
    file stream (availableNow drains it in one batch)."""
    df.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(df.schema).parquet(path)
