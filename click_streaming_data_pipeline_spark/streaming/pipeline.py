"""The flagship streaming dataflow (SURVEY 3.1), Spark-first.

Reference chain (7 process hops): POST -> S3 -> PG -> WAL/Debezium ->
Kafka -> data-quality consumer (filter/flatten/fetch/LLM/enrich) ->
Kafka -> event-processor -> ES upsert. Here it is ONE streaming query:

    readStream(json envelopes)
      -> from_json/parse           (A2 source, G6)
      -> filter op not in (r, d)   (B3)
      -> select after.*            (B2 flatten)
      -> quality columns           (H2 scorer, C4 weighted score)
      -> [optional gate]           (B8)
      -> foreachBatch MERGE        (A4/E4/I4 idempotent upsert sink)

The process hops collapse into narrow transformations; the only wide
operation is the sink's per-key resolve. ``run_batch`` executes the
identical logical plan on a static frame — batch/streaming parity is
asserted by the driver oracle and tests.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..operators.upsert import foreach_batch_upsert, latest_rows
from ..sources.cdc import filter_and_flatten, parse_cdc, synth_cdc_envelopes


def transform(envelopes_raw: DataFrame) -> DataFrame:
    """Parse -> filter -> flatten -> quality-score. Works unchanged on
    batch and streaming DataFrames (no stateful ops here; state lives
    in the sink merge).

    Quality scores come from ``with_quality_columns``, which computes
    the expensive per-row primitives (tokenizer split, stop-word HOF
    filter, PII rlikes) once behind an explode fence — without it the
    optimizer inlines one full tokenizer tree per score column (six
    split() passes per row in the flagship CDC plan)."""
    from ..functions.quality import with_quality_columns

    return with_quality_columns(filter_and_flatten(parse_cdc(envelopes_raw)))


def run_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch execution of the full pipeline incl. LWW resolution —
    the reference's end state after the stream drains."""
    enriched = transform(synth_cdc_envelopes(spark, sf_dir))
    return latest_rows(enriched, ["doc_id"], ["version", "ts_ms"])


def run_streaming(
    spark: SparkSession,
    sf_dir: str,
    *,
    files_per_trigger: int = 4,
    work_dir: str | None = None,
) -> DataFrame:
    """True Structured Streaming execution: envelopes written as JSON
    text files, consumed as a file stream in several micro-batches
    (``maxFilesPerTrigger`` stands in for Kafka's
    ``maxOffsetsPerTrigger``, I7), merged into a parquet target by
    ``foreachBatch`` (I1: replay-safe idempotent sink). Returns the
    final target state — must equal ``run_batch`` exactly.
    """
    work = work_dir or tempfile.mkdtemp(prefix="csdp_stream_")
    src = os.path.join(work, "in")
    target = os.path.join(work, "state")
    ckpt = os.path.join(work, "ckpt")

    # stage the wire data: N json files so the stream sees several
    # micro-batches (repartition -> one file per partition)
    synth_cdc_envelopes(spark, sf_dir).repartition(8).write.mode(
        "overwrite"
    ).text(src)

    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", files_per_trigger)
        .load(src)
    )
    q = (
        transform(raw)
        .writeStream.queryName(f"cdc_pipeline_{uuid.uuid4().hex[:8]}")
        .foreachBatch(
            foreach_batch_upsert(target, ["doc_id"], ["version", "ts_ms"])
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(target)
