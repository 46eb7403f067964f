"""CDC envelope source (SURVEY 2 A1): the Debezium-on-Kafka shape
(``debezium/register-postgres.json:11,24-29``: ``{op in {c,u,r,d},
before, after, source, ts_ms}``) as Structured-Streaming-ready
DataFrames.

Because the test environment has no Kafka broker, envelopes are
*synthesized deterministically* from the ``documents`` table and
serialized to JSON strings — the same wire format Debezium emits with
``value.converter.schemas.enable=false`` — then parsed back with
``from_json``. Swapping the synthetic source for
``readStream.format("kafka")`` changes only the first line of the
pipeline; every downstream operator is identical.

Timestamps ride as epoch-millis longs, matching Debezium
``time.precision.mode=connect`` (``register-postgres.json:30``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tables import load_table, scan_parallel

#: document payload inside the envelope (reference init-db.sql:20-44
#: mapped onto the test documents table)
DOC_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("version", T.IntegerType()),
    ]
)

#: the Debezium envelope (flattened `source` to the fields we use)
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("before", DOC_PAYLOAD_SCHEMA),
        T.StructField("after", DOC_PAYLOAD_SCHEMA),
        T.StructField("src_table", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)

#: deterministic op assignment: doc_id % 10
#: 0-5 -> c; 6,7 -> c then u (two events, LWW test); 8 -> r; 9 -> d
_TS_BASE_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z


def synth_cdc_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-column DataFrame ``value: string`` of JSON envelopes.

    Deterministic: op from ``doc_id % 10``; updated docs (%10 in 6,7)
    emit a v1 create AND a v2 update whose text is suffixed ``' v2'``
    — exercising op filtering (B3), flatten (B2), and
    last-write-wins upsert (I4) downstream.
    """
    docs = scan_parallel(load_table(spark, sf_dir, "documents"))
    mod = F.col("doc_id") % 10

    payload = F.struct(
        F.col("doc_id"),
        F.col("text"),
        F.col("lang"),
        F.col("source"),
        F.col("n_chars"),
        F.lit(1).alias("version"),
    )
    payload_v2 = F.struct(
        F.col("doc_id"),
        F.concat(F.col("text"), F.lit(" v2")).alias("text"),
        F.col("lang"),
        F.col("source"),
        (F.col("n_chars") + 3).alias("n_chars"),
        F.lit(2).alias("version"),
    )
    null_payload = F.lit(None).cast(DOC_PAYLOAD_SCHEMA)

    def env(op, before, after, ts):
        return F.struct(
            op.alias("op"),
            before.alias("before"),
            after.alias("after"),
            F.lit("documents").alias("src_table"),
            ts.alias("ts_ms"),
        )

    base_env = env(
        F.when(mod == 8, F.lit("r"))
        .when(mod == 9, F.lit("d"))
        .otherwise(F.lit("c")),
        F.when(mod == 9, payload).otherwise(null_payload),
        F.when(mod == 9, null_payload).otherwise(payload),
        F.lit(_TS_BASE_MS) + F.col("doc_id"),
    )
    update_env = env(
        F.lit("u"),
        payload,
        payload_v2,
        F.lit(_TS_BASE_MS) + F.col("doc_id") + 1_000_000,
    )
    # one scan, one branch: updated docs carry [create, update]
    # envelopes, everything else a single envelope (a two-branch
    # union would re-read and re-shuffle the source once per branch)
    envs = F.when(
        mod.isin(6, 7), F.array(base_env, update_env)
    ).otherwise(F.array(base_env))
    return docs.select(F.explode(envs).alias("e")).select(
        F.to_json(F.col("e")).alias("value")
    )


def parse_cdc(raw: DataFrame) -> DataFrame:
    """Wire JSON -> typed envelope (G6; data-quality main.py:214).

    The parsed struct leaves through a 1-element explode: expanding
    ``e.*`` directly lets CollapseProject inline ``from_json`` into
    every top-level field reference — the envelope JSON gets re-parsed
    once per column (3x in cdc_pipeline's optimized plan), which at
    warehouse scale multiplies the single most expensive scan-stage
    expression. The Generate fence parses once; a corrupt row's NULL
    envelope still flows (array(NULL) explodes to one NULL row, same
    as the un-fenced form)."""
    return raw.select(
        F.explode(
            F.array(F.from_json(F.col("value"), ENVELOPE_SCHEMA))
        ).alias("e")
    ).select("e.*")


def filter_and_flatten(envelopes: DataFrame) -> DataFrame:
    """B3 op filter (drop snapshot reads & deletes, event
    main.py:38-40) + B2 nested flatten of ``after.*`` (data-quality
    main.py:90-99)."""
    return (
        envelopes.filter(~F.col("op").isin("r", "d"))
        .filter(F.col("after").isNotNull())
        .select(F.col("after.*"), F.col("op"), F.col("ts_ms"))
    )
