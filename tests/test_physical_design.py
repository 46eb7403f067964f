"""Physical-design behaviors (SURVEY 2 D3, section 4): partitioned
writes give partition pruning; scans prune columns and push filters.
These are plan-level assertions — the properties that decide whether
a query touches 100 TB or 100 GB."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from click_streaming_data_pipeline_spark.sources import load_table

from .conftest import SF_TEST


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_partitions(spark):
    """Date-partitioned layout (the analogue of the reference's
    (status, created_at) indexes, init-db.sql:61-70): a day filter
    must read only that day's directory."""
    events = load_table(spark, SF_TEST, "events").withColumn(
        "day", F.to_date("ts")
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "events_by_day")
        events.write.partitionBy("day").parquet(path)
        n_days = len(
            [p for p in os.listdir(path) if p.startswith("day=")]
        )
        assert n_days > 1
        df = spark.read.parquet(path).filter(
            F.col("day") == "2024-01-02"
        )
        plan = _plan(df)
        assert "PartitionFilters" in plan
        # correctness of the pruned read
        want = events.filter(F.to_date("ts") == "2024-01-02").count()
        assert df.count() == want


def test_scan_prunes_columns_and_pushes_filters(spark):
    li = load_table(spark, SF_TEST, "lineitem")
    df = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
    plan = _plan(df)
    assert "PushedFilters" in plan and "l_quantity" in plan
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema
    assert "l_orderkey" in read_schema
