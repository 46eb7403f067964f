"""Property-based tests (hypothesis) for engine invariants that the
fixed test corpus can't sweep: last-write-wins resolution, exact
decimal aggregation, uuid7 ordering, and salted-distinct equality.
Small generated frames, spark-round-tripped."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from click_streaming_data_pipeline_spark.functions.exact import dsum
from click_streaming_data_pipeline_spark.functions.scalars import (
    uuid7_deterministic,
)
from click_streaming_data_pipeline_spark.operators.skew import (
    salted_distinct_count,
)
from click_streaming_data_pipeline_spark.operators.upsert import latest_rows

_SETTINGS = dict(
    max_examples=12,  # each example round-trips through the JVM
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),  # key
        st.integers(0, 8),  # version
        st.integers(0, 3),  # payload
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_latest_rows_is_max_version_per_key(spark, rows):
    df = spark.createDataFrame(rows, ["id", "version", "payload"])
    got = {
        r["id"]: r["version"]
        for r in latest_rows(df, ["id"], ["version", "payload"]).collect()
    }
    expected = {}
    for k, v, _ in rows:
        expected[k] = max(expected.get(k, -1), v)
    assert got == expected
    # idempotence: resolving an already-resolved frame is a no-op
    once = latest_rows(df, ["id"], ["version", "payload"])
    twice = latest_rows(once, ["id"], ["version", "payload"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


@given(
    vals=st.lists(
        st.decimals(
            min_value=Decimal("-99999.99"),
            max_value=Decimal("99999.99"),
            places=2,
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_dsum_is_exact_regardless_of_partitioning(spark, vals):
    """Decimal-exact sums must equal the true decimal sum and be
    invariant under repartitioning (double sums are neither)."""
    truth = float(sum(vals))
    df = spark.createDataFrame(
        [(float(v),) for v in vals], ["x"]
    )
    a = df.agg(dsum("x", "s")).collect()[0]["s"]
    b = df.repartition(7).agg(dsum("x", "s")).collect()[0]["s"]
    assert a == b == pytest.approx(truth, abs=1e-9)


@given(
    pairs=st.lists(
        st.tuples(
            st.datetimes(
                min_value=dt.datetime(2000, 1, 1),
                max_value=dt.datetime(2030, 1, 1),
            ),
            st.integers(0, 10_000),
        ),
        min_size=2,
        max_size=30,
        unique_by=lambda p: p,
    )
)
@settings(**_SETTINGS)
def test_uuid7_lexicographic_order_matches_time_order(spark, pairs):
    df = spark.createDataFrame(pairs, ["ts", "entropy"])
    got = (
        df.select(
            "ts", uuid7_deterministic(F.col("ts"), F.col("entropy")).alias("u")
        )
        .collect()
    )
    by_time = [r["u"] for r in sorted(got, key=lambda r: (r["ts"], r["u"]))]
    by_uuid = sorted(r["u"] for r in got)
    assert by_time == by_uuid


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 50)),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_salted_distinct_equals_plain_distinct(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    salted = {
        r["k"]: r["n_distinct"]
        for r in salted_distinct_count(df, "k", "v").collect()
    }
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    assert salted == plain
