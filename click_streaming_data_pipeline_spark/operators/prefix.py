"""Distributed global prefix sum (two-phase scan).

A window like ``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY plans
an ``Exchange SinglePartition`` — every row funnels through one task,
the classic scale cliff of global cumulative queries (PPS sampling,
Gini curves, equi-depth boundaries). This operator computes the same
prefix sums with NO single-partition stage:

1. ``repartitionByRange(order)`` + ``sortWithinPartitions`` — rows
   land range-ordered ACROSS partitions and sorted within;
2. local prefix sums per partition — a zero-shuffle ``mapInPandas``
   pass over the already-sorted partition (a window PARTITION BY
   spark_partition_id() would plan an extra hash exchange because
   Catalyst cannot see that rows are already co-located);
3. per-partition totals (one tiny row per partition) get their own
   prefix sum on the partition-id dimension and broadcast back as
   offsets;
4. global prefix = local prefix + partition offset.

Correctness does not depend on where the range boundaries fall: with
a TOTAL order (pass tie-break columns!), local prefix + offset equals
the global prefix sum for every row regardless of partitioning, so
the operator is deterministic even though range boundaries come from
sampling. Cost: one range shuffle of the data + a partition-count
sized side frame — the standard parallel-scan shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _with_local_prefix(
    ranged: DataFrame, value_col: str, sum_type: T.DataType
) -> DataFrame:
    """Zero-shuffle per-partition pass adding ``__pid`` and the
    partition-local inclusive prefix sum ``__local``."""
    schema = T.StructType(
        list(ranged.schema.fields)
        + [
            T.StructField("__pid", T.IntegerType()),
            T.StructField("__local", sum_type),
        ]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        running = 0
        for b in batches:
            out = b.copy()
            out["__pid"] = pid
            out["__local"] = b[value_col].cumsum() + running
            running = int(out["__local"].iloc[-1]) if len(out) else running
            yield out

    return ranged.mapInPandas(scan, schema)


def partitioned_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds ``out_col`` = inclusive prefix sum of ``value_col`` in
    ``order_cols`` order (must be a total order), plus nothing else —
    input columns pass through. No single-partition exchange.

    ``value_col`` must be integral (the running carry is exact BIGINT
    arithmetic — the catalog's cents/chars convention)."""
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    ranged = df.repartitionByRange(
        int(n), *[F.col(c) for c in order_cols]
    ).sortWithinPartitions(*order_cols)
    local = _with_local_prefix(ranged, value_col, T.LongType())

    totals = local.groupBy("__pid").agg(F.sum(value_col).alias("__tot"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # the offsets frame is partition-count sized (tens of rows) — its
    # own ordered window is trivially small, and it broadcasts back
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(w_off), F.lit(0))
    ).select("__pid", "__off")

    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__off")).cast("long"))
        .drop("__pid", "__local", "__off")
    )


def ntile_from_rank(r: str, n: str, k: int) -> F.Column:
    """SQL-standard NTILE(k) reconstructed from a 1-based dense total
    rank column ``r`` and total-count column ``n`` in exact integer
    arithmetic: the first n%k buckets hold n/k+1 rows. Lets quantile
    scoring run on distributed prefix-sum ranks instead of an
    ORDER-BY-only window. (When n < k the second branch always takes,
    so the n/k = 0 division is never evaluated.)"""
    return F.expr(
        f"""
        CASE WHEN {n} % {k} = 0 THEN ({r} - 1) DIV ({n} DIV {k}) + 1
             WHEN {r} <= ({n} % {k}) * ({n} DIV {k} + 1)
                 THEN ({r} - 1) DIV ({n} DIV {k} + 1) + 1
             ELSE {n} % {k}
                  + ({r} - ({n} % {k}) * ({n} DIV {k} + 1) - 1)
                      DIV ({n} DIV {k})
                  + 1
        END
        """
    ).cast("int")


def grouped_prefix_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group inclusive prefix sum of ``value_col`` in
    ``order_cols`` order — the scalable form of
    ``SUM(x) OVER (PARTITION BY g ORDER BY k)`` when a single group
    outgrows one task (the web-scale-segment case a partitioned
    window cannot split). Range-partitions on (group, order) so a
    giant group SPANS partitions, scans each partition once with a
    per-group running carry, then aligns cross-partition offsets per
    (group, partition) — the offsets frame holds one row per group
    per partition it touches, and its window partitions by group
    (parallel, tiny)."""
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    keys = group_cols + order_cols
    ranged = df.repartitionByRange(
        int(n), *[F.col(c) for c in keys]
    ).sortWithinPartitions(*keys)

    schema = T.StructType(
        list(ranged.schema.fields)
        + [
            T.StructField("__pid", T.IntegerType()),
            T.StructField("__local", T.LongType()),
        ]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        carry: dict[tuple, int] = {}
        for b in batches:
            out = b.copy()
            out["__pid"] = pid
            local = b.groupby(group_cols, sort=False)[value_col].cumsum()
            offs = [
                carry.get(k, 0)
                for k in zip(*(b[c] for c in group_cols))
            ]
            out["__local"] = local + pd.Series(offs, index=b.index)
            for k, g in b.groupby(group_cols, sort=False)[value_col]:
                key = k if isinstance(k, tuple) else (k,)
                carry[key] = carry.get(key, 0) + int(g.sum())
            yield out

    local = ranged.mapInPandas(scan, schema)

    totals = local.groupBy("__pid", *group_cols).agg(
        F.sum(value_col).alias("__tot")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(w_off), F.lit(0))
    ).select("__pid", *group_cols, "__off")

    return (
        local.join(offsets, ["__pid"] + group_cols)
        .withColumn(out_col, (F.col("__local") + F.col("__off")).cast("long"))
        .drop("__pid", "__local", "__off")
    )
