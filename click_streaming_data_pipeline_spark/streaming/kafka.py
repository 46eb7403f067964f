"""Kafka source/sink wiring (SURVEY 2 A2, A3).

The test environment has no broker, so nothing here is exercised by
the driver gate — the CDC catalog runs the identical pipeline over the
file-based envelope stream instead (``sources/cdc.py``). These
builders document the one-line swap for a real deployment; every
downstream operator (parse/filter/flatten/score/merge) is shared.

Reference mapping:
- consumer group + ``auto_offset_reset="earliest"``
  (event main.py:22-26) → ``startingOffsets=earliest`` +
  ``checkpointLocation`` (offset tracking).
- ``sdf.to_topic`` JSON producer (data-quality main.py:217-233) →
  ``to_json(struct(*))`` as ``value`` + kafka writeStream.
- record metadata key/timestamp/headers (H1 ``metadata=True``) are
  first-class columns on the Kafka source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """CDC/event consumer (A2). Returns the raw frame with ``value``
    as string plus key/timestamp/headers metadata columns (H1)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:  # I7 backpressure bound
        reader = reader.option(
            "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
        )
    return reader.load().select(
        F.col("value").cast("string").alias("value"),
        F.col("key").cast("string").alias("key"),
        F.col("timestamp").alias("kafka_ts"),
        F.col("headers"),
    )


def write_kafka_stream(
    df: DataFrame,
    brokers: str,
    topic: str,
    *,
    checkpoint_dir: str,
    key_col: str | None = None,
):
    """JSON producer sink (A3): serialize all columns to one JSON
    value (the quality.checks topic shape). The projection lives in
    ``kafka_wire.kafka_payload`` — shared with the connector-free
    wire producer so the sandbox wire test exercises THIS leg."""
    from .kafka_wire import kafka_payload

    out = kafka_payload(df, key_col)
    if not key_col:
        out = out.drop("key")
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
