"""Event-time windowed aggregations (SURVEY 2 I2 — added capability:
the reference has no watermarks/windows because Redis absorbed all
state; a real clickstream engine needs them).

Tumbling / sliding / session windows over the ``events`` stream with
per-window counts, uniques and value sums. All three run identically
on batch DataFrames (used by the driver oracle) and on streaming
DataFrames with ``withWatermark`` bounding state.

Scale: window aggs shuffle on (key, window); state store size =
#active windows x #keys — the watermark is what keeps it bounded, and
``approx_count_distinct`` keeps per-window uniques O(sketch) instead
of O(distinct values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import dsum


def tumbling_counts(
    events: DataFrame,
    duration: str = "1 hour",
    *,
    ts_col: str = "ts",
    watermark: str | None = None,
    exact_uniques: bool = True,
) -> DataFrame:
    """Per-(window, event_type) counts + uniques + value sum.

    ``exact_uniques=False`` switches to approx_count_distinct — the
    HLL sketch (Redis-PFADD semantics, C2) — which is REQUIRED on
    streaming inputs: Spark rejects distinct aggregation on streams
    because exact distinct state is unbounded; the sketch is mergeable
    across micro-batches. Sketch estimates are order-independent, so
    batch and streaming runs still agree exactly with each other."""
    df = events
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    uniques = (
        F.countDistinct("user_id")
        if exact_uniques
        else F.approx_count_distinct("user_id")
    )
    return (
        df.groupBy(
            F.window(ts_col, duration).alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            uniques.alias("n_users"),
            dsum("value", "total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    *,
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide
    windows; Spark expands them at the scan, downstream is a normal
    grouped agg."""
    df = events
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key session windows (gap-based): a session closes after
    ``gap`` of inactivity. Batch-mode ``session_window`` merges
    overlapping intervals exactly like the streaming state store."""
    df = events
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.session_window(ts_col, gap).alias("w"), F.col(key_col)
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
