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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FORMAT_NAME = "cdc_jsonl"


class CdcJsonlDataSource(DataSource):
    """``spark.read.format("cdc_jsonl").option("path", dir)`` — each
    ``*.txt``/``*.jsonl``/``part-*`` file in ``dir`` becomes one input
    partition; rows are ``value: string`` JSON envelopes."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> "CdcJsonlReader":
        return CdcJsonlReader(self.options)


class CdcJsonlReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("cdc_jsonl requires option 'path'")

    def partitions(self):
        names = sorted(
            f
            for f in os.listdir(self._path)
            if f.endswith((".txt", ".jsonl")) or f.startswith("part-")
        )
        return [InputPartition(os.path.join(self._path, f)) for f in names]

    def read(self, partition):
        with open(partition.value, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    yield (line,)


def register(spark) -> None:
    """Idempotent format registration on the session."""
    spark.dataSource.register(CdcJsonlDataSource)
