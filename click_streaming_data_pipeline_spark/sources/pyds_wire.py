"""Custom Python STREAMING DataSource over the Kafka wire stub —
SURVEY 2 A2 (the consumer leg, ``services/data-quality/app/
main.py:212-215``) executed as a true Structured Streaming SOURCE
against real RecordBatch v2 bytes on a real socket.

The jar-based ``spark-sql-kafka`` connector is absent from the
sandbox; this is the same integration seam Spark offers for any
third-party wire format (Spark 4 ``pyspark.sql.datasource``): the
driver tracks offsets — REAL log offsets assigned by the broker, not
file indices — and ``partitions(start, end)`` maps the offset range
to one ``InputPartition`` per stored RecordBatch, fetched and
CRC-validated on the EXECUTOR (the driver never moves payload
bytes). ``latestOffset`` advances at most ``batchesPerTrigger``
batches per call — the ``maxOffsetsPerTrigger`` backpressure analogue
(I7). Offsets are checkpointable dicts; replaying a committed range
re-fetches the same immutable batches. The PACING cursor is
in-memory only: after a driver restart it re-syncs from the first
``partitions(start, end)`` call (Spark replays the pending batch
with the checkpointed range first), and until then ``latestOffset``
may lag the checkpoint — Spark plans an empty batch for a backward
range, and the downstream idempotent LWW sink absorbs any
redelivery: the standard Kafka at-least-once + idempotent-sink
posture (I1).

Output contract mirrors ``kafka.read_kafka_stream``: value/key
strings, ``ts_ms`` epoch millis, plus the per-record log ``offset``.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "kafka_wire"


class KafkaWireDataSource(DataSource):
    """``spark.readStream.format("kafka_wire").option("addr", a)
    .option("topic", t)`` — micro-batched consumption of a MiniBroker
    topic log with broker-assigned offsets."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "value string, key string, ts_ms long, offset long"

    def streamReader(self, schema) -> "KafkaWireStreamReader":
        return KafkaWireStreamReader(self.options)


class KafkaWireStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._addr = options.get("addr")
        self._topic = options.get("topic")
        if not self._addr or not self._topic:
            raise ValueError(
                "kafka_wire requires options 'addr' and 'topic'"
            )
        self._per_trigger = int(options.get("batchesPerTrigger", "2"))
        self._cursor = 0  # consumed record offset (batch-aligned)

    def _meta(self):
        from ..streaming.kafka_wire import topic_meta

        return topic_meta(self._addr, self._topic)

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        # advance by whole batches (offsets must align to RecordBatch
        # boundaries), at most batchesPerTrigger per micro-batch
        taken = 0
        for base, n in self._meta():
            if base >= self._cursor:
                if taken == self._per_trigger:
                    break
                self._cursor = base + n
                taken += 1
        return {"offset": self._cursor}

    def partitions(self, start, end):
        lo, hi = start["offset"], end["offset"]
        # re-sync the in-memory pacing cursor after a restart: Spark
        # replays the pending batch with the CHECKPOINTED range before
        # asking for new offsets, so the cursor never lags a committed
        # position past the first (empty) planned batch
        self._cursor = max(self._cursor, lo, hi)
        return [
            InputPartition((self._addr, self._topic, base))
            for base, _n in self._meta()
            if lo <= base < hi
        ]

    def read(self, partition):
        from ..streaming.kafka_wire import decode_record_batch, fetch_one

        addr, topic, base = partition.value
        blob = fetch_one(addr, topic, base)
        got_base, records = decode_record_batch(blob)  # CRC-verified
        for i, r in enumerate(records):
            yield (
                None if r.value is None else r.value.decode("utf-8"),
                None if r.key is None else r.key.decode("utf-8"),
                r.timestamp_ms,
                got_base + i,
            )

    def commit(self, end) -> None:
        # broker log is immutable — nothing to clean up; keep the
        # pacing cursor at/past every committed position
        self._cursor = max(self._cursor, end["offset"])


def register(spark) -> None:
    """Idempotent format registration on the session."""
    spark.dataSource.register(KafkaWireDataSource)
