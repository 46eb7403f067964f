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

    The expensive per-row primitives (tokenizer split, stop-word HOF
    filter, the two PII rlikes) are computed ONCE into scalar columns
    behind a 1-element explode fence, and every quality score derives
    from those scalars — without the fence the optimizer inlines one
    full tokenizer tree per selected score column (six split() passes
    per row in the flagship CDC plan; higher-order filters get no
    codegen CSE). The score arithmetic is byte-identical to
    ``quality_check_columns`` (same ops over the same integers), so
    all four CDC lanes keep their value-hash parity."""
    from pyspark.sql import functions as F

    from ..functions.quality import (
        EMAIL_RE,
        MIN_QUALITY_SCORE,
        PHONE_RE,
        QUALITY_WEIGHTS,
        STOPWORDS,
    )

    flat = filter_and_flatten(parse_cdc(envelopes_raw))
    text = F.col("text")
    tokens = F.split(text, " ")
    prim = F.struct(
        F.length(text).alias("len_text"),
        F.size(tokens).alias("n_tokens"),
        F.size(
            F.filter(tokens, lambda t: t.isin(*STOPWORDS))
        ).alias("stop_hits"),
        (text.rlike(EMAIL_RE) | text.rlike(PHONE_RE)).alias("has_pii"),
    )
    fenced = flat.select(
        "*", F.explode(F.array(prim)).alias("__p")
    )
    n_chars = F.col("n_chars")
    completeness = F.least(F.lit(100.0), n_chars / F.lit(20.0))
    consistency = F.when(
        F.col("__p.len_text") == n_chars, F.lit(100.0)
    ).otherwise(F.lit(50.0))
    pii_detection = F.when(F.col("__p.has_pii"), F.lit(0.0)).otherwise(
        F.lit(100.0)
    )
    stop_ratio = F.col("__p.stop_hits") / F.greatest(
        F.col("__p.n_tokens"), F.lit(1)
    )
    language_quality = F.least(F.lit(100.0), stop_ratio * F.lit(250.0))
    overall = (
        completeness * F.lit(QUALITY_WEIGHTS["completeness"])
        + consistency * F.lit(QUALITY_WEIGHTS["consistency"])
        + pii_detection * F.lit(QUALITY_WEIGHTS["pii_detection"])
        + language_quality * F.lit(QUALITY_WEIGHTS["language_quality"])
    )
    return fenced.select(
        "*",
        completeness.alias("completeness"),
        consistency.alias("consistency"),
        pii_detection.alias("pii_detection"),
        language_quality.alias("language_quality"),
        overall.alias("quality_score"),
        (overall >= F.lit(MIN_QUALITY_SCORE)).alias("quality_is_valid"),
        F.col("__p.has_pii").alias("has_pii"),
    ).drop("__p")


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
