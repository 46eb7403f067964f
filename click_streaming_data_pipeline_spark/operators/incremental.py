"""Incremental aggregate maintenance (materialized-view merge): keep a
100 TB rollup current by aggregating ONLY the new partition and
merging mergeable state — never re-reading the historical corpus.

The algebra: an aggregate is incrementally maintainable when its
accumulator merges associatively — count/sum merge by sum, min/max by
min/max, uniques by HLL sketch union (exact distinct does NOT merge;
that's why the sketch column IS the stored state, Redis-PFMERGE
style, same contract as `hll_sketch_views`). Decimal(28,6) sums keep
the merged result bit-identical to a from-scratch aggregation, so
merge(agg(A), agg(B)) == agg(A union B) exactly — the property the
catalog oracle checks.

Reference parity note: the reference maintains its counters
incrementally too (Redis INCR/PFADD per event, cache.py:81-101); this
is the batch/lakehouse form of the same idea.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: state column suffixes produced by ``agg_state`` / consumed by
#: ``merge_states``: n (count), s (decimal sum), mn, mx, hll (sketch).


def agg_state(
    df: DataFrame, keys: list[str], value: str, uniq: str | None = None
) -> DataFrame:
    """Mergeable per-key accumulator frame for one data slice."""
    aggs = [
        F.count("*").alias("n"),
        F.sum(F.col(value).cast("decimal(28,6)")).alias("s"),
        F.min(value).alias("mn"),
        F.max(value).alias("mx"),
    ]
    if uniq is not None:
        aggs.append(F.hll_sketch_agg(uniq).alias("hll"))
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    prev: DataFrame, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """merge(agg(A), agg(B)) — union the state frames and re-reduce.

    Cost is proportional to the STATE size (number of keys), not the
    data: the historical corpus is never touched. New keys appear via
    the union; decimal sums make the merge bit-exact.
    """
    both = prev.unionByName(delta, allowMissingColumns=True)
    aggs = [
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    ]
    if "hll" in both.columns:
        aggs.append(F.hll_union_agg("hll").alias("hll"))
    return both.groupBy(*keys).agg(*aggs)


def signed_state(
    df: DataFrame, keys: list[str], sign: str, value: str
) -> DataFrame:
    """RETRACTABLE accumulator for a changelog (Flink-style retract
    stream): each input row carries ``sign`` (+1 insert / -1 retract)
    and the accumulator is (sum(sign), sum(sign*value)) — count and
    sum under retraction. min/max/distinct are NOT retractable
    (removing the current max needs the full history), which is
    exactly why this state carries only the signed pair; decimal
    accumulation keeps the fold bit-exact and order-insensitive."""
    v = F.col(value).cast("decimal(28,6)")
    return df.groupBy(*keys).agg(
        F.sum(sign).alias("n"),
        F.sum(F.col(sign) * v).alias("s"),
    )


def merge_signed(prev: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Signed states merge by plain addition (abelian group — the
    property that makes deletes as cheap as inserts)."""
    both = prev.unionByName(delta)
    return both.groupBy(*keys).agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    )


def finalize_signed(state: DataFrame, keys: list[str]) -> DataFrame:
    """Live view: drop fully-retracted keys (net count 0)."""
    return state.filter(F.col("n") != 0).select(
        *keys,
        F.col("n").cast("bigint").alias("n_live"),
        F.col("s").cast("double").alias("sum_live"),
    )


def zset_reduce(df: DataFrame, keys: list[str], sign: str = "sign") -> DataFrame:
    """Collapse changelog rows into a Z-SET: one row per distinct
    row-identity (``keys``) carrying its net multiplicity ``w``
    (sum of +1/-1 signs). The z-set is the state representation that
    makes JOINS incrementally maintainable: deletes are weight -1,
    and a row retracted as often as inserted nets to w=0."""
    return df.groupBy(*keys).agg(F.sum(sign).alias("w"))


def merge_zset(prev: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Z-sets form an abelian group under row-wise weight addition —
    merging a batch's delta costs one groupBy on the delta+state,
    never a history re-read."""
    return (
        prev.unionByName(delta)
        .groupBy(*keys)
        .agg(F.sum("w").alias("w"))
        .filter(F.col("w") != 0)
    )


def join_view_delta(
    dA: DataFrame,
    A_new: DataFrame,
    B_prev: DataFrame,
    dB: DataFrame,
    on: str,
) -> DataFrame:
    """One batch's delta of the maintained join view V = A |x| B.

    The join of z-sets is BILINEAR (weights multiply), so its delta
    under simultaneous updates of both sides is the asymmetric rule

        dV = dA |x| B_prev  +  A_new |x| dB        (A_new = A+dA)

    which covers the cross-term dA |x| dB exactly once — the
    DBSP/differential-dataflow incremental-join rule. Cost per batch
    is |dA| x matched(B) + |A| x matched(dB): proportional to the
    CHANGE, never |A| x |B|. Output rows carry the product weight
    ``w``; payload columns from both sides are preserved (the caller
    aggregates or finalizes). Column names of the two sides must be
    disjoint apart from ``on``."""

    def side_join(left: DataFrame, right: DataFrame) -> DataFrame:
        lw = left.withColumnRenamed("w", "__wl")
        rw = right.withColumnRenamed("w", "__wr")
        return (
            lw.join(rw, on)
            .withColumn("w", F.col("__wl") * F.col("__wr"))
            .drop("__wl", "__wr")
        )

    return side_join(dA, B_prev).unionByName(side_join(A_new, dB))


def read_prior_zset(
    spark, state_dir: str, batch_id: int, like: DataFrame
) -> DataFrame:
    """Latest committed version STRICTLY below ``batch_id`` (replay
    discipline: a retried micro-batch re-derives byte-identical state
    because it never reads its own or later versions); an empty
    z-set with ``like``'s schema when no prior version exists."""
    import os

    if os.path.isdir(state_dir):
        prior = sorted(
            int(d[1:])
            for d in os.listdir(state_dir)
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < batch_id
        )
        if prior:
            return spark.read.parquet(
                os.path.join(state_dir, f"v{prior[-1]}")
            )
    return spark.createDataFrame([], like.schema)


def write_zset_version(df: DataFrame, state_dir: str, batch_id: int) -> DataFrame:
    """Commit one state version (overwrite => replay-idempotent),
    pruning all but the direct parent; returns the checkpointed frame
    so callers can keep deriving from it without a re-read."""
    import os
    import shutil

    out = df.localCheckpoint(eager=True)
    out.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"v{batch_id}")
    )
    versions = sorted(
        int(d[1:])
        for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < batch_id
    )
    for v in versions[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v{v}"), ignore_errors=True)
    return out


def fold_state_dir(
    spark,
    state_dir: str,
    delta: DataFrame,
    batch_id: int,
    keys: list[str],
    merge_fn=None,
) -> None:
    """Replay-safe streaming fold: merge ``delta`` into versioned
    state under ``state_dir``.

    Version ``v{batch_id}`` is derived ONLY from versions strictly
    below ``batch_id`` and written with overwrite, so a retried
    micro-batch (foreachBatch is at-least-once) reproduces byte-
    identical state instead of double-merging its delta — the same
    commit-log discipline as the dedup bucket stores. Old versions
    are pruned to keep the directory bounded. ``merge_fn`` defaults
    to the mergeable-aggregate ``merge_states``; pass ``merge_signed``
    for retractable changelog state.
    """
    import os
    import shutil

    if merge_fn is None:
        merge_fn = merge_states

    def _versions() -> list[int]:
        if not os.path.isdir(state_dir):
            return []
        return sorted(
            int(d[1:])
            for d in os.listdir(state_dir)
            if d.startswith("v") and d[1:].isdigit()
        )

    prior = [v for v in _versions() if v < batch_id]
    if prior:
        prev = spark.read.parquet(
            os.path.join(state_dir, f"v{prior[-1]}")
        )
        merged = merge_fn(prev, delta, keys)
    else:
        merged = delta
    out = merged.localCheckpoint(eager=True)
    out.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"v{batch_id}")
    )
    for v in prior[:-1]:  # keep the direct parent for replay safety
        shutil.rmtree(os.path.join(state_dir, f"v{v}"), ignore_errors=True)


def read_state_dir(spark, state_dir: str) -> DataFrame:
    """Latest committed state version."""
    import os

    latest = max(
        int(d[1:])
        for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit()
    )
    return spark.read.parquet(os.path.join(state_dir, f"v{latest}"))


def finalize(state: DataFrame) -> DataFrame:
    """Presentation projection: decimal state -> double metrics (the
    repo's cross-engine convention), sketch -> estimate."""
    cols = [
        *[c for c in state.columns if c not in ("n", "s", "mn", "mx", "hll")],
        F.col("n").alias("n_rows"),
        F.col("s").cast("double").alias("sum_value"),
        F.col("mn").alias("min_value"),
        F.col("mx").alias("max_value"),
    ]
    if "hll" in state.columns:
        cols.append(F.hll_sketch_estimate("hll").alias("approx_uniques"))
    return state.select(*cols)
