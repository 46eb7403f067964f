"""Semantics tests for catalog_robust: MAD robustness (outliers can't
mask themselves), equi-depth invariants (equal values never split,
depths balanced), and PPS guarantees (oversized units always picked,
at most k rows, weight-proportional tendencies)."""

from __future__ import annotations

import pytest

import random

from pyspark.sql import functions as F


def _mad_flags(spark, rows):
    from click_streaming_data_pipeline_spark.plans.catalog_robust import (
        value_anomalies_mad,
    )
    import os
    import tempfile

    work = tempfile.mkdtemp(prefix="csdp_mad_")
    df = spark.createDataFrame(
        [(i, "t", float(v), None, None, None) for i, v in enumerate(rows)],
        "event_id long, event_type string, value double, ts timestamp,"
        " user_id long, props string",
    )
    df.write.mode("overwrite").parquet(os.path.join(work, "events.parquet"))
    out = value_anomalies_mad(spark, work)
    return {r.event_id for r in out.collect()}


def test_mad_flags_survive_heavy_contamination(spark):
    # 90 inliers around 10.00, 10 extreme outliers at 10000.00 —
    # mean/std-based z would be dragged; median/MAD still flags all 10
    rng = random.Random(3)
    inliers = [10.0 + rng.randrange(-100, 101) / 100 for _ in range(90)]
    outliers = [10000.0] * 10
    flagged = _mad_flags(spark, inliers + outliers)
    assert set(range(90, 100)) <= flagged
    assert not (flagged & set(range(90)))


def test_equidepth_buckets_balanced_and_value_atomic(spark, duck):
    from click_streaming_data_pipeline_spark.plans.catalog_robust import (
        value_equidepth_histogram,
    )
    from .conftest import SF_TEST

    rows = value_equidepth_histogram(spark, SF_TEST).collect()
    n = sum(r.n_rows for r in rows)
    assert len(rows) == 8
    # depths within one value-group of each other around n/8
    for r in rows:
        assert r.n_rows > 0
    # buckets are ordered, non-overlapping in value space
    by_bucket = sorted(rows, key=lambda r: r.bucket)
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a.hi_cents < b.lo_cents
    # equal values atomic: total row count must equal the events count
    want = duck.execute("SELECT count(*) FROM events").fetchone()[0]
    assert n == want


def test_pps_picks_every_oversized_unit_and_at_most_k(spark):
    import os
    import tempfile

    from click_streaming_data_pipeline_spark.plans.catalog_robust import (
        pps_systematic_sample,
    )

    work = tempfile.mkdtemp(prefix="csdp_pps_")
    rng = random.Random(5)
    # one giant doc holding >1/50 of total mass, many small ones
    rows = [(0, "giant", "s", 1_000_000)] + [
        (i, "d", "s", rng.randrange(100, 2000)) for i in range(1, 400)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    ).write.mode("overwrite").parquet(
        os.path.join(work, "documents.parquet")
    )
    got = pps_systematic_sample(spark, work).collect()
    ids = {r.doc_id for r in got}
    assert 0 in ids  # oversized unit always selected
    assert len(got) <= 50
    # the giant absorbs the strides it spans (picked once, not
    # repeatedly): picks == k - (extra strides inside oversized units)
    total = 1_000_000 + sum(r[3] for r in rows[1:])
    giant_strides = 1_000_000 * 50 // total
    assert len(got) >= 50 - giant_strides

    # uniform weights -> exactly k picks (no unit spans two strides)
    work2 = tempfile.mkdtemp(prefix="csdp_pps_u_")
    spark.createDataFrame(
        [(i, "d", "s", 1000) for i in range(400)],
        "doc_id long, text string, source string, n_chars long",
    ).write.mode("overwrite").parquet(
        os.path.join(work2, "documents.parquet")
    )
    assert pps_systematic_sample(spark, work2).count() == 50


def test_partitioned_prefix_sum_equals_global_window(spark):
    from pyspark.sql import Window
    from click_streaming_data_pipeline_spark.operators.prefix import (
        partitioned_prefix_sum,
    )

    rng = random.Random(13)
    rows = [(i, rng.randrange(-50, 500)) for i in range(5000)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(11)
    got = {
        (r.k, r.cum)
        for r in partitioned_prefix_sum(
            df, ["k"], "v", "cum", num_partitions=7
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r.k, r.cum)
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_pps_plan_single_partition_only_on_tiny_frames(spark):
    """The corpus path must be range-partitioned (two-phase scan);
    any Exchange SinglePartition may only sit above an already-
    aggregated frame (the partition-count-sized offsets window / the
    1-row grand total), never above corpus rows."""
    from click_streaming_data_pipeline_spark.plans.catalog_robust import (
        pps_systematic_sample,
    )
    from .conftest import SF_TEST

    plan = pps_systematic_sample(
        spark, SF_TEST
    )._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        # the subtree below must aggregate before funneling: the next
        # few lines (children) must hit a HashAggregate before any
        # parquet scan
        tail = "\n".join(lines[i : i + 6])
        agg_pos = tail.find("HashAggregate")
        scan_pos = tail.find("Scan parquet")
        assert agg_pos != -1 and (scan_pos == -1 or agg_pos < scan_pos), (
            "corpus rows funnel through a single partition:\n" + tail
        )


def test_grouped_prefix_sum_spans_partitions(spark):
    from pyspark.sql import Window
    from click_streaming_data_pipeline_spark.operators.prefix import (
        grouped_prefix_sum,
    )

    rng = random.Random(17)
    # 3 groups x 2000 rows, 16 range partitions => every group spans
    # several partitions (the case PARTITION BY windows cannot split)
    rows = [
        (g, i, rng.randrange(-20, 100))
        for g in ("a", "b", "c")
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "g string, k long, v long").repartition(9)
    got = {
        (r.g, r.k, r.cum)
        for r in grouped_prefix_sum(
            df, ["g"], ["k"], "v", "cum", num_partitions=16
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r.g, r.k, r.cum)
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_quantile_sketch_error_bound_and_merge_invariance(spark):
    # the bottom-k-by-hash sample's quantiles must approximate the
    # exact ones (k=512 -> ~2-3pt rank error), and folding the sample
    # in two halves must equal one global pass (min-k monoid)
    import pyspark.sql.functions as F

    from click_streaming_data_pipeline_spark.plans.catalog_robust import (
        _qsketch_estimate,
        _qsketch_sample,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    sf = "/root/testdata/sf0.01"
    events = load_table(spark, sf, "events")
    est = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in _qsketch_estimate(_qsketch_sample(events)).collect()
    }
    # exact rank envelope: sketch p50 must sit between true p40/p60,
    # sketch p90 between true p85/p95
    env = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.percentile("value", 0.40).alias("lo50"),
            F.percentile("value", 0.60).alias("hi50"),
            F.percentile("value", 0.85).alias("lo90"),
            F.percentile("value", 0.95).alias("hi90"),
        )
        .collect()
    }
    assert est and set(est) == set(env)
    for t, (p50, p90) in est.items():
        assert env[t]["lo50"] <= p50 <= env[t]["hi50"], (t, p50)
        assert env[t]["lo90"] <= p90 <= env[t]["hi90"], (t, p90)

    # merge invariance: sample(sample(half1) U sample(half2)) ==
    # sample(all)
    h1 = _qsketch_sample(events.filter(F.col("event_id") % 2 == 0))
    h2 = _qsketch_sample(events.filter(F.col("event_id") % 2 == 1))
    merged = _qsketch_sample(h1.unionByName(h2))
    direct = _qsketch_sample(events)
    assert (
        merged.exceptAll(direct).count() == 0
        and direct.exceptAll(merged).count() == 0
    )


@pytest.mark.slow
def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from click_streaming_data_pipeline_spark.plans import QUERIES

    q = QUERIES["value_mean_bootstrap_ci"].fn
    rows = {r["event_type"]: r for r in q(spark, "/root/testdata/sf0.01").collect()}
    assert len(rows) == 5
    for t, r in rows.items():
        assert r["ci_lo"] < r["ci_hi"], t
        assert r["ci_lo"] <= r["mean_cents"] <= r["ci_hi"], t
        # band should be tight around the mean at n~2000 (SE ~ s/sqrt(n))
        assert (r["ci_hi"] - r["ci_lo"]) < 0.2 * r["mean_cents"], t
    again = {r["event_type"]: r for r in q(spark, "/root/testdata/sf0.01").collect()}
    assert {t: (r["ci_lo"], r["ci_hi"]) for t, r in rows.items()} == {
        t: (r["ci_lo"], r["ci_hi"]) for t, r in again.items()
    }


def test_cusum_catches_planted_shift(spark):
    """Plant a level shift on day 11 of a 20-day series: CUSUM must
    stay quiet through the in-control prefix and alarm shortly after
    the shift; a flat control series must never alarm."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.plans import QUERIES

    rows = []
    base = dt.datetime(2024, 1, 1)
    for d in range(20):
        # 'shift': 100/day then 300/day from day 11; 'flat': 100/day
        v = 300.0 if d >= 10 else 100.0
        rows.append((1000 + d, base + dt.timedelta(days=d), 1, "shift", v))
        rows.append((2000 + d, base + dt.timedelta(days=d), 2, "flat", 100.0))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    import os
    import tempfile

    sf = tempfile.mkdtemp(prefix="csdp_cusum_")
    events.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    out = {
        r["event_type"]: r
        for r in QUERIES["value_cusum_changepoint"].fn(spark, sf).collect()
    }
    # flat series: x - k == 0 every day -> S stays 0, no alarms
    assert out["flat"]["max_cusum"] == 0
    assert out["flat"]["n_alarms"] == 0
    assert out["flat"]["first_alarm_day"] is None
    # shifted series: k = mean = 20000 cents; post-shift excess
    # 10000/day crosses h = k on day 13 (S = 2*10000 + slack)
    s = out["shift"]
    assert s["n_alarms"] > 0
    assert s["first_alarm_day"] >= dt.date(2024, 1, 11)
    assert s["first_alarm_day"] <= dt.date(2024, 1, 15)
    assert s["max_cusum"] > s["ref_cents"]
