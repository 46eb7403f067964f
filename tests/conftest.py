"""Shared fixtures: one local SparkSession + a DuckDB oracle harness
that mirrors the driver's t2 comparison (row count + schema-ish +
order-insensitive value equality with exact floats)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from click_streaming_data_pipeline_spark.session import get_spark
from click_streaming_data_pipeline_spark.sources import TABLES

SF_TEST = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("csdp-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_TEST}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else v
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "tolist") and not isinstance(v, str):  # numpy scalar/array
        return _canon(v.tolist())
    try:
        if pd.isna(v):  # pd.NA / NaT
            return None
    except (TypeError, ValueError):
        pass
    return v


def _normalize(cols, raw_rows):
    """Column-name-sorted, repr-sorted canonical rows. Operates on
    NATIVE python values (Spark Row / DuckDB fetchall) — pandas
    conversion silently unifies DATE vs timestamp and None vs NaN,
    which the driver's repr-level hash does NOT forgive."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        (tuple(_canon(r[i]) for i in order) for r in raw_rows), key=repr
    )
    return [cols[i] for i in order], rows


def assert_df_matches_oracle(spark_df, duck_con, sql, *, atol=0.0):
    """Order-insensitive exact comparison, the local stand-in for the
    driver's value-hash gate. atol>0 loosens float equality for
    explicitly approximate queries only. ``sql`` may be a LAZY oracle
    (callable -> str), mirroring registry.oracle_dict()."""
    if callable(sql):
        sql = sql()
    gcols, grows = _normalize(
        spark_df.columns, [tuple(r) for r in spark_df.collect()]
    )
    cur = duck_con.execute(sql)
    ecols, erows = _normalize(
        [d[0] for d in cur.description], cur.fetchall()
    )
    assert gcols == ecols, f"column mismatch: {gcols} vs {ecols}"
    assert len(grows) == len(erows), f"row count {len(grows)} vs {len(erows)}"
    for i, (gr, er) in enumerate(zip(grows, erows)):
        for col, a, b in zip(gcols, gr, er):
            if atol and isinstance(a, float) and isinstance(b, float):
                assert abs(a - b) <= atol, f"{col}[{i}]: {a} != {b}"
            else:
                assert a == b, f"{col}[{i}]: {a!r} != {b!r}"
