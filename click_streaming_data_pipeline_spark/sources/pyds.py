"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API)
for Debezium-envelope JSONL files — SURVEY 2 A1/A2 source breadth.

Why this exists: the reference consumes its CDC envelopes from a
broker through a consumer library (``services/data-quality/app/
main.py:212-215``). In Spark, third-party wire formats whose readers
aren't built in are integrated exactly this way: a registered
DataSource whose reader exposes PARTITIONED, engine-parallel access
(one ``InputPartition`` per file here — each executor task reads its
own file), with everything downstream (``from_json`` parse, op
filter, flatten, quality scoring, LWW merge) untouched DataFrame
code. The driver never reads data; only file NAMES are listed there.

The format is one JSON envelope per line (``value.converter.schemas.
enable=false`` Debezium output, newline-delimited) — what a
Kafka-topic archiver dumps to object storage.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "cdc_jsonl"


class CdcJsonlDataSource(DataSource):
    """``spark.read.format("cdc_jsonl").option("path", dir)`` — each
    ``*.txt``/``*.jsonl``/``part-*`` file in ``dir`` becomes one input
    partition; rows are ``value: string`` JSON envelopes. The same
    format also registers a STREAM reader (``spark.readStream``):
    offsets index the sorted archive listing, so the file sequence
    becomes a replayable log (the object-store analogue of a topic)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> "CdcJsonlReader":
        return CdcJsonlReader(self.options)

    def streamReader(self, schema) -> "CdcJsonlStreamReader":
        return CdcJsonlStreamReader(self.options)


def _archive_files(path: str) -> list[str]:
    return sorted(
        f
        for f in os.listdir(path)
        if f.endswith((".txt", ".jsonl")) or f.startswith("part-")
    )


def _read_jsonl(full_path: str):
    with open(full_path, "r", encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if line:
                yield (line,)


class CdcJsonlReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("cdc_jsonl requires option 'path'")

    def partitions(self):
        return [
            InputPartition(os.path.join(self._path, f))
            for f in _archive_files(self._path)
        ]

    def read(self, partition):
        yield from _read_jsonl(partition.value)


class CdcJsonlStreamReader(DataSourceStreamReader):
    """Micro-batched reads over the archive: the offset is the count
    of files consumed from the SORTED listing (append-only archives
    sort by name, so the listing is a log). Each ``latestOffset``
    advances at most ``filesPerBatch`` files — the backpressure bound
    (I7, ≙ maxOffsetsPerTrigger); ``partitions(start, end)`` maps the
    offset range back to one InputPartition per file, so the rows are
    still read executor-parallel, never on the driver. Offsets are
    checkpointable dicts; replaying a committed range re-reads the
    same immutable files — effectively-once downstream via the A4
    idempotent sink, exactly like the file-stream analogue."""

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("cdc_jsonl requires option 'path'")
        self._per_batch = int(options.get("filesPerBatch", "2"))
        self._cur = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        n = len(_archive_files(self._path))
        self._cur = min(self._cur + self._per_batch, n)
        return {"index": self._cur}

    def partitions(self, start, end):
        # re-sync the in-memory pacing cursor after a restart (Spark
        # replays the pending batch with the checkpointed range first)
        self._cur = max(self._cur, start["index"], end["index"])
        files = _archive_files(self._path)[start["index"] : end["index"]]
        return [
            InputPartition(os.path.join(self._path, f)) for f in files
        ]

    def read(self, partition):
        yield from _read_jsonl(partition.value)

    def commit(self, end) -> None:
        # immutable archive: nothing to clean up; cursor stays at or
        # past every committed position
        self._cur = max(self._cur, end["index"])


def register(spark) -> None:
    """Idempotent format registration on the session."""
    spark.dataSource.register(CdcJsonlDataSource)
