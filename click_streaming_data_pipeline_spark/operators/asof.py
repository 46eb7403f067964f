"""Temporal joins for clickstream analytics (beyond-reference: the
reference has key-equality joins only — SURVEY 2 E note — but any
real event pipeline needs attribution joins).

- ``interval_join``: purchases matched to clicks of the same user
  within a time window — equi-join on the key plus a range predicate.
  Streamable as a watermarked stream-stream join (the range predicate
  is exactly what bounds join state in Structured Streaming).
- ``asof_join``: each right-side event matched to the most recent
  left-side event at-or-before it, per key. Implemented as the
  union-tag + last(ignorenulls) carry-forward window — one shuffle on
  (key), no per-row subquery, no range explosion; this is the
  scalable formulation (a correlated subquery or a range join with
  top-1 both blow up on hot keys). DuckDB's native ASOF JOIN is the
  oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    max_gap: str = "1 hour",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Pairs (left, right) with the same key and
    ``left.ts <= right.ts <= left.ts + max_gap``.

    Scale: the equi-key shuffles; the range predicate filters inside
    each key group. Streaming: put watermarks on both sides and the
    same predicate bounds the state retention window.
    """
    l = left.select(
        F.col(key).alias("__k"),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns if c != key],
    )
    r = right.select(
        F.col(key).alias("__k2"),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c != key
        ],
    )
    lts, rts = f"{left_prefix}{ts}", f"{right_prefix}{ts}"
    return (
        l.join(r, F.col("__k") == F.col("__k2"))
        .filter(
            (F.col(rts) >= F.col(lts))
            & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {max_gap}"))
        )
        .withColumn("__key", F.col("__k"))
        .drop("__k", "__k2")
        .withColumnRenamed("__key", key)
    )


def interval_join_binned(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 3600,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Equivalent to ``interval_join`` (gap = ``gap_seconds``) with a
    tighter join condition: both sides are binned to gap-sized time
    buckets and the left side is exploded to (bin, bin+1), so matching
    becomes an equi-join on (key, bin) followed by the exact range
    filter.

    Why: the plain form equi-joins on the key alone — every left row
    meets every right row of that key (per-key cartesian) before the
    range predicate filters. Hot keys with long histories make that
    quadratic. Binning bounds each left row to exactly the two buckets
    its window can reach, so the pre-filter pair count tracks the
    *temporal* density, not the key's total history. Same trick is
    what Spark's stream-stream join does internally with watermark
    state buckets.
    """
    l = left.select(
        F.col(key).alias("__k"),
        *[
            F.col(c).alias(f"{left_prefix}{c}")
            for c in left.columns
            if c != key
        ],
    )
    r = right.select(
        F.col(key).alias("__k2"),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c != key
        ],
    )
    lts, rts = f"{left_prefix}{ts}", f"{right_prefix}{ts}"
    lbin = (F.unix_seconds(F.col(lts)) / gap_seconds).cast("long")
    rbin = (F.unix_seconds(F.col(rts)) / gap_seconds).cast("long")
    l = l.withColumn(
        "__binl", F.explode(F.array(lbin, lbin + F.lit(1)))
    )
    r = r.withColumn("__binr", rbin)
    return (
        l.join(
            r,
            (F.col("__k") == F.col("__k2"))
            & (F.col("__binl") == F.col("__binr")),
        )
        .filter(
            (F.col(rts) >= F.col(lts))
            & (
                F.col(rts)
                <= F.col(lts) + F.expr(f"INTERVAL {gap_seconds} SECONDS")
            )
        )
        .withColumn("__key", F.col("__k"))
        .drop("__k", "__k2", "__binl", "__binr")
        .withColumnRenamed("__key", key)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    left_val_cols: list[str] | None = None,
) -> DataFrame:
    """For every right row, the most recent left row with
    ``left.ts <= right.ts`` on the same key (left rows win ties).

    Carry-forward formulation: union-tag both sides, sort within key
    by (ts, side) with left first, and propagate the last seen left
    values with ``last(..., ignorenulls=True)`` over an unbounded-
    preceding window. One shuffle, linear in rows — the hot-key-safe
    as-of plan."""
    left_val_cols = left_val_cols or [
        c for c in left.columns if c not in (key, ts)
    ]
    lt = left.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__lv_{c}") for c in left_val_cols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right.columns
            if c not in (key, ts)
        ],
    )
    rt = right.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__lv_{c}")
            for c in left_val_cols
        ],
        *[F.col(c) for c in right.columns if c not in (key, ts)],
    )
    merged = lt.unionByName(rt)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        "*",
        F.last(
            F.when(F.col("__side") == 0, F.col(ts)), ignorenulls=True
        )
        .over(w)
        .alias("__asof_ts"),
        *[
            F.last(
                F.when(F.col("__side") == 0, F.col(f"__lv_{c}")),
                ignorenulls=True,
            )
            .over(w)
            .alias(f"__asof_{c}")
            for c in left_val_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).select(
        F.col(key),
        F.col(ts),
        *[c for c in right.columns if c not in (key, ts)],
        F.col("__asof_ts").alias("asof_ts"),
        *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in left_val_cols],
    )
    return out
