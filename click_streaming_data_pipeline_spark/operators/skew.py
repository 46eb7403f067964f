"""Skew-resistant aggregation (SCALE.md; SURVEY 2 C at 100 TB).

A straight ``groupBy(key).agg(countDistinct(v))`` concentrates each
hot key on one reducer. Salting splits every key into S sub-groups by
a deterministic hash of the *value*, aggregates the sub-groups in
parallel, then combines — correct for distinct counts because a given
value always lands in the same salt bucket, so per-bucket distincts
partition the value set.

AQE's skew-join handling covers joins; salting is the groupBy-side
equivalent Spark doesn't do automatically for single-key hot spots.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_distinct_count(
    df: DataFrame,
    key: str,
    value: str,
    *,
    n_salts: int = DEFAULT_SALTS,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact distinct-count per key via two-stage salted aggregation.

    Stage 1 shuffles on (key, hash(value) % S) — hot keys spread over
    S reducers; stage 2 sums the S partial distincts (valid because
    the buckets partition the values)."""
    salt: Column = F.pmod(F.hash(F.col(value)), F.lit(n_salts))
    stage1 = (
        df.groupBy(F.col(key), salt.alias("__salt"))
        .agg(F.countDistinct(value).alias("__d"))
    )
    return stage1.groupBy(key).agg(F.sum("__d").alias(out_col))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for when the small side is too large to
    broadcast but the big side has hot keys: each big row gets a
    deterministic salt in [0, S) (hash of the whole row — no RNG, so
    plans are replayable), the small side is replicated S times, and
    the join key becomes (key, salt) — a hot key's rows spread over S
    reducers instead of one.

    Only ``inner`` and ``left`` are valid: a big row carries exactly
    one salt so it matches (or misses) exactly once, but an unmatched
    small row exists in all S replicas — right/full would duplicate
    it. AQE's skew-join split handles moderate skew without this;
    explicit salting is for the single-key hot spot AQE can't split
    further (one key too big for any single reducer's sort buffer).

    Cost model: small side shuffles S times its size; pick S ~ the
    hot key's multiple of the average reducer load, not larger.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left only")
    salt_b = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    bigs = big.withColumn("__salt", salt_b)
    smalls = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return bigs.join(smalls, [*on, "__salt"], how).drop("__salt")


def salted_count(
    df: DataFrame,
    key: str,
    *,
    n_salts: int = DEFAULT_SALTS,
    out_col: str = "n_rows",
) -> DataFrame:
    """Plain counts are already skew-safe via partial aggregation;
    provided for parity — two-stage form with a row-random-free salt
    (monotonically-increasing ids are per-partition, deterministic
    enough to spread rows without an RNG)."""
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    stage1 = (
        df.groupBy(F.col(key), salt.alias("__salt"))
        .agg(F.count("*").alias("__c"))
    )
    return stage1.groupBy(key).agg(F.sum("__c").alias(out_col))
