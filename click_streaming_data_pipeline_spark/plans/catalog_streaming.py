"""Streaming catalog (SURVEY 2 A, I): the CDC pipeline end-to-end —
batch plan and true Structured Streaming execution, same oracle — plus
event-time windows (tumbling / sliding / session).

The streamed variant is the strongest gate in the repo: JSON envelopes
consumed as a multi-micro-batch file stream, merged by foreachBatch
LWW upsert, must reproduce the batch plan's result bit-for-bit (I1
effectively-once, I4 last-write-wins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.quality import quality_oracle_exprs
from ..sources import load_table
from ..streaming.pipeline import run_batch, run_streaming
from ..streaming.windows import session_windows, sliding_counts, tumbling_counts
from .registry import dsum_sql, query

_Q = quality_oracle_exprs("text", "n_chars")
_QUALITY_COLS_SQL = ",\n".join(
    f"       ({expr}) AS {name}" for name, expr in _Q.items()
)

#: expected end-state of the CDC pipeline, derived straight from the
#: documents table (mirrors sources/cdc.py synth rules: %10 -> op;
#: updates suffix ' v2' and bump version/ts)
_CDC_EXPECTED_SQL = f"""
WITH eligible AS (
    SELECT doc_id,
           CASE WHEN doc_id % 10 IN (6, 7) THEN text || ' v2'
                ELSE text END AS text,
           lang, source,
           CASE WHEN doc_id % 10 IN (6, 7) THEN n_chars + 3
                ELSE n_chars END AS n_chars,
           CAST(CASE WHEN doc_id % 10 IN (6, 7) THEN 2 ELSE 1 END
                AS INTEGER) AS version,
           CASE WHEN doc_id % 10 IN (6, 7) THEN 'u' ELSE 'c' END AS op,
           CASE WHEN doc_id % 10 IN (6, 7)
                THEN 1704067200000 + doc_id + 1000000
                ELSE 1704067200000 + doc_id END AS ts_ms
    FROM documents
    WHERE doc_id % 10 NOT IN (8, 9)
)
SELECT doc_id, text, lang, source, n_chars, version, op, ts_ms,
{_QUALITY_COLS_SQL}
FROM eligible
"""


@query(
    "cdc_pipeline",
    oracle=_CDC_EXPECTED_SQL,
    doc=(
        "SURVEY 3.1 flagship dataflow, batch plan: synth Debezium "
        "envelopes (A1) -> from_json parse (G6) -> op filter (B3) -> "
        "flatten after.* (B2) -> quality scorer (H2/C4) -> "
        "last-write-wins resolve (I4). The reference's 7 process hops "
        "as one query"
    ),
    tags=("bench", "streaming"),
)
def cdc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_batch(spark, sf_dir)


@query(
    "cdc_pipeline_streamed",
    oracle=_CDC_EXPECTED_SQL,
    doc=(
        "Same dataflow executed as TRUE Structured Streaming: file "
        "stream of JSON envelopes in multiple micro-batches "
        "(maxFilesPerTrigger ~ I7 backpressure), foreachBatch "
        "idempotent MERGE sink (A4/E4, I1 effectively-once), "
        "availableNow trigger (I5). Must equal the batch plan exactly "
        "- batch/streaming parity IS the oracle"
    ),
    tags=("streaming",),
)
def cdc_pipeline_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_streaming(spark, sf_dir)


@query(
    "window_tumbling",
    oracle=f"""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               {dsum_sql('value', 'total_value')}
        FROM events
        GROUP BY 1, 2
    """,
    doc=(
        "I2 (added): event-time tumbling window aggregation - "
        "per-hour per-type counts, exact uniques, value sums; the "
        "windowed form of C1/C2"
    ),
    tags=("bench", "streaming", "window"),
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"), "1 hour")


@query(
    "window_sliding",
    oracle="""
        WITH expanded AS (
            SELECT unnest([
                time_bucket(INTERVAL '30 minutes', ts),
                time_bucket(INTERVAL '30 minutes', ts)
                    - INTERVAL '30 minutes'
            ]) AS window_start
            FROM events
        )
        SELECT window_start, count(*) AS n_events
        FROM expanded
        GROUP BY 1
    """,
    doc=(
        "I2 (added): sliding windows (1h every 30min) - each event "
        "expands into duration/slide overlapping windows"
    ),
    tags=("streaming", "window"),
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(
        load_table(spark, sf_dir, "events"), "1 hour", "30 minutes"
    )


@query(
    "window_session",
    oracle="""
        WITH o AS (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
            FROM events
        ),
        marked AS (
            SELECT user_id, ts,
                   CASE WHEN prev IS NULL
                             OR ts - prev > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_s
            FROM o
        ),
        sessions AS (
            SELECT user_id, ts,
                   sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM marked
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL '30 minutes' AS session_end,
               count(*) AS n_events
        FROM sessions
        GROUP BY user_id, sid
    """,
    doc=(
        "I2 (added): per-user session windows, 30min inactivity gap "
        "(session_window); oracle is the classic gaps-and-islands SQL"
    ),
    tags=("streaming", "window"),
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_windows(
        load_table(spark, sf_dir, "events"), "30 minutes"
    )


_USER_STATE_SQL = """
    WITH latest AS (
        SELECT user_id, event_type AS last_event_type
        FROM (
            SELECT user_id, event_type, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    aggs AS (
        SELECT user_id,
               count(*) AS total_events,
               CAST(count(DISTINCT date_trunc('day', ts)) AS INTEGER)
                   AS active_days
        FROM events
        GROUP BY 1
    )
    SELECT a.user_id, total_events, active_days, last_event_type
    FROM aggs a JOIN latest l ON a.user_id = l.user_id
"""


@query(
    "user_state_batch",
    oracle=_USER_STATE_SQL,
    doc=(
        "I3 per-key state shape (Redis counters + last-activity hash, "
        "analytics.py:36-56): batch twin of the custom stateful "
        "operator - counts, distinct active days, latest event type"
    ),
    tags=("streaming", "agg"),
)
def user_state_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import user_state_batch

    return user_state_batch(load_table(spark, sf_dir, "events"))


@query(
    "user_state_streamed",
    oracle=_USER_STATE_SQL,
    doc=(
        "I3 custom stateful operator via applyInPandasWithState: "
        "per-user typed state (counter + day-set + last-event) updated "
        "across micro-batches, update-mode output; final state must "
        "hash-match the batch twin - arrival order independent"
    ),
    tags=("streaming", "agg"),
)
def user_state_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid as _uuid

    from ..operators.upsert import latest_rows
    from ..streaming.stateful import user_state_stream

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_state_")
    src = os.path.join(work, "in")
    events.repartition(6).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    name = f"user_state_{_uuid.uuid4().hex[:8]}"
    q = (
        user_state_stream(stream)
        .writeStream.queryName(name)
        .format("memory")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink appends one refreshed row per user per
    # micro-batch; total_events grows monotonically, so the max row
    # per user is the converged state
    return latest_rows(spark.table(name), ["user_id"], ["total_events"])


@query(
    "dedup_events_streamed",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events
    """,
    doc=(
        "I4 streaming exact dedup: two unioned readers of the same "
        "source produce every record twice; dropDuplicates on the key "
        "restores exactly-one per event_id across micro-batches "
        "(state-backed, the streaming form of dedup_exact)"
    ),
    tags=("streaming", "dedup"),
)
def dedup_events_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid as _uuid

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_dedup_")
    src = os.path.join(work, "in")
    events.repartition(4).write.mode("overwrite").parquet(src)

    def rd():
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )

    doubled = rd().unionByName(rd())  # at-least-once delivery, simulated
    deduped = doubled.dropDuplicates(["event_id"])
    name = f"dedup_{_uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@query(
    "trending_topk_streamed",
    oracle="""
        WITH expanded AS (
            SELECT event_type, unnest([
                time_bucket(INTERVAL '30 minutes', ts),
                time_bucket(INTERVAL '30 minutes', ts)
                    - INTERVAL '30 minutes'
            ]) AS window_start
            FROM events
        ),
        counts AS (
            SELECT window_start, event_type, count(*) AS n_events
            FROM expanded GROUP BY 1, 2
        )
        SELECT window_start, event_type, n_events, rank FROM (
            SELECT window_start, event_type, n_events,
                   row_number() OVER (
                       PARTITION BY window_start
                       ORDER BY n_events DESC, event_type ASC
                   ) AS rank
            FROM counts
        )
        WHERE rank <= 3
    """,
    doc=(
        "beyond-reference streaming analytics: TRENDING top-k — "
        "sliding-window (1h/30min) per-type counts maintained by "
        "Structured Streaming across micro-batches (complete-mode "
        "state, the dashboard-facing form; production appends "
        "finalized windows under a real watermark), then the rank "
        "runs as a batch post-pass over the drained state because "
        "streaming queries cannot rank within unfinalized windows. "
        "Must equal the all-batch plan exactly; ties break on "
        "event_type for determinism."
    ),
    tags=("streaming", "window"),
)
def trending_topk_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid as _uuid

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_trend_")
    src = os.path.join(work, "in")
    events.repartition(6).write.mode("overwrite").parquet(src)

    agg = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 3)
        .parquet(src)
        .groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n_events"))
    )
    name = f"trend_{_uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.queryName(name)
        .format("memory")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table(name).select(
        F.col("w.start").alias("window_start"), "event_type", "n_events"
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        drained.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
    )


@query(
    "dedup_events_watermarked_streamed",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events
    """,
    doc=(
        "I4 streaming exact dedup with BOUNDED state: "
        "dropDuplicatesWithinWatermark keeps a key's dedup state only "
        "for the watermark horizon instead of forever — the form that "
        "survives an unbounded stream (dedup_events_streamed's plain "
        "dropDuplicates state grows without bound). The horizon here "
        "covers the dataset's span so the oracle stays exact; "
        "production sets it to the delivery-retry window."
    ),
    tags=("streaming", "dedup"),
)
def dedup_events_watermarked_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile
    import uuid as _uuid

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_wmdedup_")
    src = os.path.join(work, "in")
    events.repartition(4).write.mode("overwrite").parquet(src)

    def rd():
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )

    doubled = rd().unionByName(rd())  # at-least-once delivery, simulated
    deduped = doubled.withWatermark("ts", "35 days").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    name = f"wmdedup_{_uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@query(
    "segment_revenue_streamed",
    oracle=f"""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_events,
               {dsum_sql('value', 'total_value')}
        FROM events
        JOIN customer ON user_id = c_custkey
        WHERE event_type = 'purchase'
        GROUP BY c_mktsegment
    """,
    doc=(
        "beyond-reference streaming: STREAM-STATIC enrichment join — "
        "purchase events arrive as a micro-batched stream and join a "
        "static customer dimension (broadcast per micro-batch, the "
        "Structured Streaming dimension-enrichment idiom; at 100 TB "
        "the dim is a slowly-changing broadcast or a state-store "
        "lookup), then fold into per-segment running revenue; the "
        "drained complete-mode state must equal the all-batch join"
    ),
    tags=("streaming", "join"),
)
def segment_revenue_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid as _uuid

    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    work = tempfile.mkdtemp(prefix="csdp_segrev_")
    src = os.path.join(work, "in")
    events.repartition(6).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 3)
        .parquet(src)
        .filter(F.col("event_type") == "purchase")
        .join(F.broadcast(cust), F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("__tv"),
        )
    )
    name = f"segrev_{_uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.queryName(name)
        .format("memory")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "c_mktsegment",
        "n_events",
        F.col("__tv").cast("double").alias("total_value"),
    )


@query(
    "window_tumbling_append_streamed",
    oracle=f"""
        WITH wm AS (
            SELECT max(ts) - INTERVAL 2 HOUR AS horizon FROM events
        )
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               {dsum_sql('value', 'total_value')}
        FROM events, wm
        WHERE time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR
              <= horizon
        GROUP BY 1, 2
    """,
    doc=(
        "I2 streaming, APPEND mode: watermarked tumbling windows "
        "drained from a time-ordered micro-batched stream - each "
        "window is emitted EXACTLY ONCE when the watermark passes its "
        "end and its state is evicted (the unbounded-stream form; "
        "complete/trending keeps all state forever). Emitted set == "
        "batch windows whose end <= max(ts) - delay, which is what "
        "the oracle encodes; in-order arrival is forced by per-file "
        "mtimes (range partition k holds the k-th time slice). "
        "Late-vs-watermark semantics are separately pinned by "
        "test_watermark_finalized_windows_ignore_late_data."
    ),
    tags=("streaming", "window"),
)
def window_tumbling_append_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile
    import time as _time
    import uuid as _uuid

    from pyspark.sql import functions as F

    from ..functions.exact import dsum

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_apwin_")
    src = os.path.join(work, "in")
    events.repartitionByRange(6, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(src)
    # FileStreamSource orders by modification time; make that order the
    # ts order (part-k == range partition k == k-th time slice)
    parts = sorted(f for f in os.listdir(src) if f.startswith("part-"))
    base = _time.time() - 10_000
    for k, f in enumerate(parts):
        os.utime(os.path.join(src, f), (base + 10 * k, base + 10 * k))

    agg = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
    )
    name = f"apwin_{_uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@query(
    "window_session_append_streamed",
    oracle="""
        WITH o AS (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
            FROM events
        ),
        marked AS (
            SELECT user_id, ts,
                   CASE WHEN prev IS NULL
                             OR ts - prev > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_s
            FROM o
        ),
        sessions AS (
            SELECT user_id, ts,
                   sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM marked
        ),
        built AS (
            SELECT user_id,
                   min(ts) AS session_start,
                   max(ts) + INTERVAL '30 minutes' AS session_end,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM sessions
            GROUP BY user_id, sid
        ),
        wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS horizon FROM events)
        SELECT user_id, session_start, session_end, n_events
        FROM built, wm
        WHERE session_end <= horizon
    """,
    doc=(
        "I2 streaming, session windows in APPEND mode: per-user "
        "30-min-gap sessions MERGED ACROSS MICRO-BATCHES by the state "
        "store (session_window + watermark), each emitted exactly "
        "once when the watermark passes its end - the stateful merge "
        "a batch gaps-and-islands pass cannot express incrementally. "
        "Emitted set == batch sessions whose end <= max(ts) - delay "
        "(in-order arrival via per-file mtimes, same determinism "
        "device as window_tumbling_append_streamed)."
    ),
    tags=("streaming", "window"),
)
def window_session_append_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile
    import time as _time
    import uuid as _uuid

    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_apsess_")
    src = os.path.join(work, "in")
    events.repartitionByRange(6, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(src)
    parts = sorted(f for f in os.listdir(src) if f.startswith("part-"))
    base = _time.time() - 10_000
    for k, f in enumerate(parts):
        os.utime(os.path.join(src, f), (base + 10 * k, base + 10 * k))

    agg = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "2 hours")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(F.count("*").alias("n_events"))
    )
    name = f"apsess_{_uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )


@query(
    "cdc_pipeline_pyds",
    oracle=_CDC_EXPECTED_SQL,
    doc=(
        "Same flagship dataflow consumed through a CUSTOM PYTHON "
        "DATA SOURCE (Spark 4 pyspark.sql.datasource API, "
        "sources/pyds.py): envelopes archived as JSONL files are "
        "read by a registered 'cdc_jsonl' format with one "
        "InputPartition per file (executor-parallel, nothing read "
        "on the driver), then flow through the identical parse/"
        "filter/score/LWW plan. Same oracle as cdc_pipeline — the "
        "source swap changes only the first line, the A1/A2 "
        "pluggability claim made executable."
    ),
    tags=("streaming",),
)
def cdc_pipeline_pyds(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..operators.upsert import latest_rows
    from ..sources.cdc import synth_cdc_envelopes
    from ..sources.pyds import FORMAT_NAME, register
    from ..streaming.pipeline import transform

    work = tempfile.mkdtemp(prefix="csdp_pyds_")
    arch = os.path.join(work, "archive")
    synth_cdc_envelopes(spark, sf_dir).repartition(4).write.mode(
        "overwrite"
    ).text(arch)
    register(spark)
    raw = spark.read.format(FORMAT_NAME).option("path", arch).load()
    return latest_rows(transform(raw), ["doc_id"], ["version", "ts_ms"])


@query(
    "cdc_pipeline_pyds_streamed",
    oracle=_CDC_EXPECTED_SQL,
    doc=(
        "Flagship dataflow consumed through the custom Python data "
        "source's STREAM reader (Spark 4 DataSourceStreamReader, "
        "sources/pyds.py): offsets index the sorted archive listing "
        "(filesPerBatch=2 is the I7 backpressure bound), partitions "
        "map offset ranges to per-file executor reads — the driver "
        "only lists names. Micro-batches append through the identical "
        "parse/filter/score plan; the final LWW resolve runs over the "
        "drained sink and hits the batch cdc_pipeline oracle "
        "bit-for-bit."
    ),
    tags=("streaming",),
)
def cdc_pipeline_pyds_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid as _uuid

    from ..operators.upsert import latest_rows
    from ..sources.cdc import synth_cdc_envelopes
    from ..sources.pyds import FORMAT_NAME, register
    from ..streaming.pipeline import transform

    work = tempfile.mkdtemp(prefix="csdp_pyds_s_")
    arch = os.path.join(work, "archive")
    synth_cdc_envelopes(spark, sf_dir).repartition(4).write.mode(
        "overwrite"
    ).text(arch)
    register(spark)
    raw = (
        spark.readStream.format(FORMAT_NAME)
        .option("path", arch)
        .option("filesPerBatch", "2")
        .load()
    )
    name = f"pyds_{_uuid.uuid4().hex[:8]}"
    q = (
        transform(raw)
        .writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return latest_rows(spark.table(name), ["doc_id"], ["version", "ts_ms"])


@query(
    "window_sliding_append_streamed",
    # emitted set == sliding windows (1h every 30min) whose END has
    # been passed by the final watermark (max ts - 2h)
    oracle="""
        WITH wm AS (
            SELECT max(ts) - INTERVAL 2 HOUR AS horizon FROM events
        ),
        expanded AS (
            SELECT unnest([
                time_bucket(INTERVAL '30 minutes', ts),
                time_bucket(INTERVAL '30 minutes', ts)
                    - INTERVAL '30 minutes'
            ]) AS window_start, ts
            FROM events
        )
        SELECT window_start, CAST(count(*) AS BIGINT) AS n_events
        FROM expanded, wm
        WHERE window_start + INTERVAL 1 HOUR <= horizon
        GROUP BY 1
    """,
    doc=(
        "I2 streaming, APPEND mode, SLIDING windows: the overlapping "
        "1h/30min windows drain exactly once as the watermark passes "
        "each window's end - state per key is #overlap windows (2 "
        "here), evicted on emit. Emitted set == batch sliding "
        "windows with end <= max(ts) - delay (the oracle); in-order "
        "arrival forced by per-file mtimes, same harness as the "
        "tumbling append twin."
    ),
    tags=("streaming", "window"),
)
def window_sliding_append_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile
    import time as _time
    import uuid as _uuid

    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_slwin_")
    src = os.path.join(work, "in")
    events.repartitionByRange(6, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(src)
    parts = sorted(f for f in os.listdir(src) if f.startswith("part-"))
    base = _time.time() - 10_000
    for k, f in enumerate(parts):
        os.utime(os.path.join(src, f), (base + 10 * k, base + 10 * k))

    agg = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
    )
    name = f"slwin_{_uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("window_start"), "n_events"
    )


_SESSIONS_CTE = """o AS (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
            FROM events
        ),
        marked AS (
            SELECT user_id, ts,
                   CASE WHEN prev IS NULL
                             OR ts - prev > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_s
            FROM o
        ),
        numbered AS (
            SELECT user_id, ts,
                   sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM marked
        ),
        sess AS (
            SELECT user_id,
                   min(ts) AS s_start,
                   max(ts) + INTERVAL '30 minutes' AS s_end
            FROM numbered
            GROUP BY user_id, sid
        )"""


@query(
    "session_peak_concurrency",
    oracle=f"""
        WITH {_SESSIONS_CTE},
        b AS (
            SELECT user_id, s_start AS ts, 1 AS delta FROM sess
            UNION ALL
            SELECT user_id, s_end AS ts, -1 AS delta FROM sess
        ),
        r AS (
            SELECT ts, delta,
                   sum(delta) OVER (
                       ORDER BY ts, delta, user_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS conc
            FROM b
        )
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(max(conc) AS BIGINT) AS peak_concurrent
        FROM r
        GROUP BY 1
    """,
    doc=(
        "beyond-reference interval algebra: PEAK CONCURRENT SESSIONS "
        "per day - the sweep-line over session intervals ([start, "
        "start_of_silence+30min), end-exclusive so a session ending "
        "exactly when another starts never double-counts: -1 sorts "
        "before +1 at a shared instant). The running concurrency is "
        "the distributed prefix sum operator (operators/prefix.py) - "
        "NO single-partition ORDER BY window, full parallelism on the "
        "global sweep - and the per-day max is invariant to ordering "
        "among equal-delta ties, which is what makes the output "
        "deterministic without a unique boundary key. The capacity-"
        "planning readout every session store needs."
    ),
    tags=("window", "scale", "agg"),
)
def session_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.prefix import partitioned_prefix_sum

    sess = session_windows(load_table(spark, sf_dir, "events"), "30 minutes")
    b = sess.select(
        "user_id", F.col("session_start").alias("ts"), F.lit(1).alias("delta")
    ).unionByName(
        sess.select(
            "user_id",
            F.col("session_end").alias("ts"),
            F.lit(-1).alias("delta"),
        )
    )
    r = partitioned_prefix_sum(
        b, ["ts", "delta", "user_id"], "delta", "conc"
    )
    return r.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.max("conc").cast("bigint").alias("peak_concurrent")
    )


@query(
    "user_balance_clamped",
    oracle="""
        WITH RECURSIVE e AS (
            SELECT user_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn,
                   CASE WHEN event_type = 'purchase'
                            THEN CAST(round(value * 100) AS BIGINT)
                        ELSE -CAST(round(value * 100) AS BIGINT)
                   END AS d
            FROM events
            WHERE event_type IN ('purchase', 'view')
        ),
        bal(user_id, rn, b, clamps) AS (
            SELECT user_id, rn, greatest(0, d),
                   CASE WHEN d < 0 THEN 1 ELSE 0 END
            FROM e WHERE rn = 1
            UNION ALL
            SELECT e.user_id, e.rn, greatest(0, bal.b + e.d),
                   bal.clamps + CASE WHEN bal.b + e.d < 0
                                     THEN 1 ELSE 0 END
            FROM bal JOIN e
              ON e.user_id = bal.user_id AND e.rn = bal.rn + 1
        )
        SELECT user_id,
               CAST(max(rn) AS BIGINT) AS n_moves,
               CAST(arg_max(b, rn) AS BIGINT) AS final_balance_cents,
               CAST(arg_max(clamps, rn) AS BIGINT) AS n_clamps
        FROM bal
        GROUP BY user_id
    """,
    doc=(
        "beyond-reference stateful operator class: INHERENTLY "
        "SEQUENTIAL per-key fold — a running balance clamped at zero "
        "(credits = purchases, debits = views, floor like a wallet/"
        "inventory that cannot go negative). greatest(0, b+d) is NOT "
        "associative, so no prefix-sum, window, or mergeable-state "
        "trick applies — this is the operator family that genuinely "
        "requires ordered per-key iteration, implemented as an "
        "Arrow-batched applyInPandas fold (cost bounded by one key's "
        "history; keys parallelize). Oracle: DuckDB linear recursive "
        "CTE stepping rn -> rn+1. The contrast with changelog_"
        "aggregate (abelian) and the prefix-sum family (associative) "
        "documents exactly WHEN each state representation applies."
    ),
    tags=("agg", "scale"),
)
def user_balance_clamped(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql import functions as F

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            )
            .otherwise(-F.round(F.col("value") * 100).cast("long"))
            .alias("d"),
        )
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        b = 0
        clamps = 0
        for d in pdf["d"]:
            nb = b + int(d)
            if nb < 0:
                clamps += 1
                nb = 0
            b = nb
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_moves": [len(pdf)],
                "final_balance_cents": [b],
                "n_clamps": [clamps],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        fold,
        "user_id long, n_moves long, final_balance_cents long, "
        "n_clamps long",
    )


@query(
    "user_balance_clamped_streamed",
    oracle="""
        WITH RECURSIVE e AS (
            SELECT user_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn,
                   CASE WHEN event_type = 'purchase'
                            THEN CAST(round(value * 100) AS BIGINT)
                        ELSE -CAST(round(value * 100) AS BIGINT)
                   END AS d
            FROM events
            WHERE event_type IN ('purchase', 'view')
        ),
        bal(user_id, rn, b, clamps) AS (
            SELECT user_id, rn, greatest(0, d),
                   CASE WHEN d < 0 THEN 1 ELSE 0 END
            FROM e WHERE rn = 1
            UNION ALL
            SELECT e.user_id, e.rn, greatest(0, bal.b + e.d),
                   bal.clamps + CASE WHEN bal.b + e.d < 0
                                     THEN 1 ELSE 0 END
            FROM bal JOIN e
              ON e.user_id = bal.user_id AND e.rn = bal.rn + 1
        )
        SELECT user_id,
               CAST(max(rn) AS BIGINT) AS n_moves,
               CAST(arg_max(b, rn) AS BIGINT) AS final_balance_cents,
               CAST(arg_max(clamps, rn) AS BIGINT) AS n_clamps
        FROM bal
        GROUP BY user_id
    """,
    doc=(
        "streamed twin of user_balance_clamped: a non-associative "
        "fold can only stream if the source preserves per-key event "
        "order, so the envelope is written as TIME-ORDERED log "
        "segments with ascending modification times (FileStreamSource "
        "schedules files by mtime, measured - the shape an archived "
        "Kafka log has in object storage, giving the per-key ordering "
        "a Kafka partition guarantees) and each micro-batch resumes every "
        "user's (balance, clamps, n) from versioned state, folding "
        "only the batch's rows. Replay-safe via v{batch_id} commits; "
        "drained state == the batch applyInPandas fold == the "
        "recursive-CTE oracle. The representation-selection rule in "
        "one pair: abelian state folds in any order, sequential "
        "state demands an ordered log."
    ),
    tags=("streaming", "agg", "scale"),
)
def user_balance_clamped_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile

    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.incremental import (
        read_prior_zset,
        write_zset_version,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            )
            .otherwise(-F.round(F.col("value") * 100).cast("long"))
            .alias("d"),
        )
    )
    work = tempfile.mkdtemp(prefix="csdp_bal_")
    src = os.path.join(work, "in")
    state_dir = os.path.join(work, "state")
    # time-ordered log SEGMENTS: FileStreamSource orders files by
    # MODIFICATION TIME (not name - measured: same-mtime files arrive
    # in arbitrary order), so each time-range segment is written
    # separately and given an explicitly ascending mtime, the shape
    # an archived Kafka log has in object storage. Six segments by
    # ts-rank sextile; within a segment rows are sorted.
    import glob
    import shutil as _sh

    from pyspark.sql.window import Window as W

    seg = ev.withColumn(
        "__seg",
        F.ntile(6).over(W.orderBy("ts", "event_id")) - 1,
    )
    os.makedirs(src, exist_ok=True)
    base = 1_700_000_000
    for k in range(6):
        tmp = os.path.join(work, f"seg{k}")
        seg.filter(F.col("__seg") == k).drop("__seg").sort(
            "ts", "event_id"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src, f"seg{k:02d}.parquet")
        _sh.move(part, dst)
        os.utime(dst, (base + k, base + k))
    schema = spark.read.parquet(src).schema

    state_schema = (
        "user_id long, n_moves long, final_balance_cents long, "
        "n_clamps long"
    )

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        empty_state = sp.createDataFrame([], state_schema)
        prev = read_prior_zset(sp, state_dir, batch_id, empty_state)
        joined = batch.join(prev, "user_id", "full_outer")

        def resume(pdf: pd.DataFrame) -> pd.DataFrame:
            rows = pdf[pdf["ts"].notna()].sort_values(["ts", "event_id"])
            carried = pdf["final_balance_cents"].dropna()
            b = int(carried.iloc[0]) if len(carried) else 0
            nm = pdf["n_moves"].dropna()
            n = int(nm.iloc[0]) if len(nm) else 0
            cl = pdf["n_clamps"].dropna()
            clamps = int(cl.iloc[0]) if len(cl) else 0
            for d in rows["d"]:
                nb = b + int(d)
                if nb < 0:
                    clamps += 1
                    nb = 0
                b = nb
            return pd.DataFrame(
                {
                    "user_id": [pdf["user_id"].iloc[0]],
                    "n_moves": [n + len(rows)],
                    "final_balance_cents": [b],
                    "n_clamps": [clamps],
                }
            )

        new_state = joined.groupBy("user_id").applyInPandas(
            resume, state_schema
        )
        write_zset_version(new_state, state_dir, batch_id)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(fold_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = max(
        int(d[1:]) for d in os.listdir(state_dir) if d.startswith("v")
    )
    return spark.read.parquet(os.path.join(state_dir, f"v{latest}"))


@query(
    "cdc_kafka_wire_streamed",
    # the same end-state oracle as cdc_pipeline: a lossless producer->
    # broker->consumer wire hop must not change a single value
    oracle=_CDC_EXPECTED_SQL,
    doc=(
        "SURVEY 2 A3 (Kafka producer sink, data-quality "
        "main.py:217-233) certified VALUE-EXACT over a real socket: "
        "the resolved quality.checks rows stream out micro-batched "
        "through write_kafka_wire (to_json payload projection -> "
        "RecordBatch v2 encode w/ CRC-32C -> TCP produce to the "
        "in-process MiniBroker log), then read_kafka_wire fetches the "
        "stored batches back, decode validates CRC, from_json "
        "restores the typed columns, and the result must hash-match "
        "the straight batch pipeline oracle — produce/encode/wire/"
        "log/fetch/decode/parse as one gated round trip. The sink is "
        "a KIP-98 IDEMPOTENT producer (producerId + baseSequence = "
        "batch_id) and the lane injects at-least-once chaos: one "
        "already-accepted batch is produced AGAIN verbatim; the "
        "broker acks the replay with its original offset without "
        "re-appending, so the hash match proves effectively-once "
        "delivery at the wire level (I1). The foreachBatch "
        "collect-and-send leg is the sandbox protocol-parity twin; "
        "at scale the connector sink (kafka.write_kafka_stream, same "
        "kafka_payload projection) ships rows executor-side."
    ),
    tags=("streaming",),
)
def cdc_kafka_wire_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..streaming.kafka_wire import (
        MiniBroker,
        fetch,
        produce,
        read_kafka_wire,
        write_kafka_wire,
    )

    work = tempfile.mkdtemp(prefix="csdp_kwire_")
    src = os.path.join(work, "in")
    run_batch(spark, sf_dir).repartition(6).write.mode(
        "overwrite"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    broker = MiniBroker().start()
    try:
        q = (
            write_kafka_wire(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 2)
                .parquet(src),
                broker.address,
                "quality.checks",
                checkpoint_dir=os.path.join(work, "ckpt"),
                key_col="doc_id",
                producer_id=7,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # at-least-once chaos: redeliver an already-accepted batch
        # verbatim — KIP-98 dedupe must drop it or the oracle fails
        stored = fetch(broker.address, "quality.checks")
        if stored:
            produce(broker.address, "quality.checks", stored[0])
        # fetch is EAGER (rows land driver-side before createDataFrame),
        # so the broker can stop before the result is consumed
        consumed = read_kafka_wire(spark, broker.address, "quality.checks")
    finally:
        broker.stop()
    payload_schema = T.StructType(
        [f for f in schema.fields if f.name != "doc_id"]
    )
    return consumed.select(
        F.col("key").cast("bigint").alias("doc_id"),
        F.from_json("value", payload_schema).alias("p"),
    ).select("doc_id", "p.*")


@query(
    "cdc_kafka_wire_consume_streamed",
    # the batch CDC oracle again: wire consumption must be lossless
    # and the LWW resolve arrival-order independent
    oracle=_CDC_EXPECTED_SQL,
    doc=(
        "SURVEY 2 A2 (Kafka consumer, data-quality main.py:212-215) "
        "as a TRUE Structured Streaming SOURCE over the wire: CDC "
        "envelopes are produced to the MiniBroker as multiple "
        "RecordBatch v2 blobs, then a registered Spark-4 Python "
        "streaming data source (sources/pyds_wire.py) consumes the "
        "topic — driver tracks broker-assigned log offsets "
        "(batchesPerTrigger backpressure, I7), executors fetch and "
        "CRC-validate their own batches over the socket, and the "
        "micro-batches flow through the identical parse/filter/score "
        "plan into the LWW resolve. Hash-matches the batch pipeline "
        "oracle — the consumer bookend to cdc_kafka_wire_streamed's "
        "producer leg."
    ),
    tags=("streaming",),
)
def cdc_kafka_wire_consume_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import uuid as _uuid

    from pyspark.sql import functions as F

    from ..operators.upsert import latest_rows
    from ..sources.cdc import synth_cdc_envelopes
    from ..sources.pyds_wire import FORMAT_NAME, register
    from ..streaming.kafka_wire import MiniBroker, produce_df
    from ..streaming.pipeline import transform

    broker = MiniBroker().start()
    try:
        produce_df(
            synth_cdc_envelopes(spark, sf_dir),
            broker.address,
            "cdc.events",
            records_per_batch=None,  # ~8 wire batches at ANY corpus
            raw_value_col="value",   # size => 4 real micro-batches,
            codec="gzip",  # constant trigger overhead as data grows;
            # executors inflate + CRC-check their own batches
        )
        register(spark)
        raw = (
            spark.readStream.format(FORMAT_NAME)
            .option("addr", broker.address)
            .option("topic", "cdc.events")
            .option("batchesPerTrigger", "2")
            .load()
        )
        name = f"kwire_{_uuid.uuid4().hex[:8]}"
        q = (
            transform(raw.select("value"))
            .writeStream.queryName(name)
            .format("memory")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        broker.stop()
    return latest_rows(spark.table(name), ["doc_id"], ["version", "ts_ms"])
