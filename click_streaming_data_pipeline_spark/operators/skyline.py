"""Skyline (Pareto frontier) operator.

A query family the reference's ES surface cannot express at all
(``bool`` filters and one-dimensional ``sort`` only,
``services/search/app/main.py:110-119``): the set of rows not
DOMINATED by any other row — here 2-D, minimize one column while
maximizing another (cheapest part for its size class, best
quality-per-cost document, ...).

Distributed shape (the standard two-phase skyline):

1. **Local prune** — each partition computes its own skyline with a
   C-speed pandas sort-sweep (`mapInPandas`, Arrow batches). The
   global skyline is a subset of the union of local skylines
   (dominance within a partition implies global dominance), so this
   pass only DISCARDS certainly-dominated rows; typically orders of
   magnitude of reduction before any shuffle.
2. **Global sweep** — group the survivors by the minimize-column,
   keep each group's max of the maximize-column, and run one ordered
   running-max over that AGGREGATED dimension (distinct minimize
   values, not rows). A group survives iff its max strictly exceeds
   the running max of every strictly-cheaper group; the surviving
   (min_col, max_col) frontier then semi-joins the pruned rows.

The frontier is a monotone chain, so the single-partition window in
phase 2 touches |distinct minimize values after pruning| rows — tiny
by construction after phase 1. Ties: rows equal on both columns are
all in the skyline (no strict dominance either way).

Associativity makes the operator streamable:
``skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B))`` — the
catalog's streamed twin folds per-micro-batch local skylines into a
versioned state dir and converges to the batch answer exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _local_sweep(pdf: pd.DataFrame, lo: str, hi: str) -> pd.DataFrame:
    """In-memory 2-D skyline, sweeping the aggregated lo-dimension:
    a lo-group survives iff its max(hi) strictly exceeds every
    strictly-cheaper group's max; rows tied on both columns all
    survive (no strict dominance between them)."""
    if pdf.empty:
        return pdf
    gm = pdf.groupby(lo)[hi].max().sort_index()
    prev = gm.cummax().shift(1)
    frontier = gm[prev.isna() | (gm > prev)]
    mask = pdf[lo].map(frontier).eq(pdf[hi])
    return pdf[mask]


def local_skyline(df: DataFrame, lo: str, hi: str) -> DataFrame:
    """Phase 1: per-partition skyline prune (mapInPandas, no shuffle)."""
    schema = df.schema

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches if not b.empty]
        if not frames:
            return
        yield _local_sweep(pd.concat(frames, ignore_index=True), lo, hi)

    return df.mapInPandas(part, schema)


def skyline_2d(df: DataFrame, lo: str, hi: str, prune: bool = True) -> DataFrame:
    """Rows minimizing ``lo`` / maximizing ``hi`` under Pareto
    dominance. Output columns = input columns."""
    pruned = local_skyline(df, lo, hi) if prune else df
    g = pruned.groupBy(lo).agg(F.max(hi).alias("_gmax"))
    w = Window.orderBy(F.col(lo).asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky = (
        g.withColumn("_prev", F.max("_gmax").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_gmax") > F.col("_prev")))
        .select(lo, F.col("_gmax").alias(hi))
    )
    return pruned.join(sky, [lo, hi], "left_semi").select(df.columns)
