"""Idempotent upsert / last-write-wins sink (SURVEY 2 A4, E4, I4).

The reference gets idempotence from Elasticsearch doc-id upserts
(``services/event/app/main.py:71-77``) and optimistic version counters
(``main.py:153``). Spark-side, the same contract is a MERGE keyed on
id resolved by max-(version, ts): applied per micro-batch from
``foreachBatch``, replayed batches converge to the same state
(effectively-once on top of at-least-once delivery, I1).

Without a Delta/Iceberg table format in this environment the target is
a parquet directory swapped atomically (write new -> rename); on a
lakehouse table the body of ``upsert_parquet`` becomes a single
``MERGE INTO`` and the LWW logic is the ``WHEN MATCHED AND s.version >=
t.version`` clause. The resolution operator (``latest_rows``) is the
same either way.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_rows(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Resolve duplicates per key to the max-(order_cols) row —
    the reference's last-write-wins / max-version-wins rule."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_parquet(
    spark: SparkSession,
    target_dir: str,
    batch: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> None:
    """MERGE-equivalent against a parquet target: union existing state
    with the batch, keep the winning row per key, atomically swap.

    Scale note: a real deployment uses Delta ``MERGE INTO`` (shuffles
    only matched files via data skipping); this read-union-rewrite is
    the format-agnostic fallback and stays correct under replay.
    """
    if os.path.exists(target_dir):
        current = spark.read.parquet(target_dir)
        merged = latest_rows(
            current.unionByName(batch), key_cols, order_cols
        )
    else:
        merged = latest_rows(batch, key_cols, order_cols)
    tmp = f"{target_dir}.__new_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(target_dir):
        shutil.rmtree(target_dir)
    os.rename(tmp, target_dir)


def foreach_batch_upsert(
    target_dir: str, key_cols: list[str], order_cols: list[str]
):
    """foreachBatch hook: resolve LWW within the batch, then merge into
    the target (A4's ES sink semantics, batch_size ~ micro-batch)."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        compact = latest_rows(batch, key_cols, order_cols)
        upsert_parquet(
            batch.sparkSession, target_dir, compact, key_cols, order_cols
        )

    return apply
