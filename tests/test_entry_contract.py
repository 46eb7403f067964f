"""Driver-contract invariants: the exact surface the driver consumes
must stay well-formed regardless of catalog growth."""

from __future__ import annotations

import pytest

import inspect

import __spark_entry__ as se
from click_streaming_data_pipeline_spark.plans import QUERIES


def test_oracles_are_subset_of_queries():
    qs, oracles = se.queries(), se.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(QUERIES)


def test_every_query_documents_its_survey_mapping():
    for name, q in QUERIES.items():
        assert q.doc and len(q.doc) > 20, name
        assert callable(q.fn), name


def test_callables_take_spark_and_sfdir():
    for name, fn in se.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name}: {params}"


def test_oracle_sql_mentions_only_registered_tables():
    registered = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    import re

    for name, sql in se.oracle_sql().items():
        for m in re.finditer(r"\bFROM\s+([a-z_][a-z0-9_]*)\b", sql,
                             re.IGNORECASE):
            t = m.group(1).lower()
            # table functions (FROM range(20) t(x)) are not relations
            if sql[m.end():m.end() + 1] == "(":
                continue
            # CTE names and subqueries are fine; real tables must be
            # in the registered set or defined as a CTE in this sql
            if t in registered:
                continue
            assert (
                re.search(
                    rf"\b{t}\b\s*(\([^)]*\))?\s+AS\s*(MATERIALIZED\s*)?\(",
                    sql,
                    re.IGNORECASE,
                )
                or re.search(rf"\(\s*{t}\b", sql)
            ), f"{name}: unknown relation {t!r}"


def test_entry_targets_sf0001():
    assert se.SF0001.endswith("sf0.001")


@pytest.mark.slow
def test_no_query_emits_driver_hostile_types(spark):
    """The driver canonicalizes every output through pandas, where
    array/map cells are unhashable (the r1 multimodal_features err).
    Guard the whole catalog: scalar/struct/binary only."""
    from pyspark.sql.types import ArrayType, MapType

    from .conftest import SF_TEST

    offenders = []
    for name, fn in sorted(se.queries().items()):
        df = fn(spark, SF_TEST)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType)):
                offenders.append((name, f.name))
    assert not offenders, offenders


def test_no_oracle_emits_pandas_fragile_dtypes():
    """The r3 driver hash-fails were DuckDB HUGEINT outputs degrading
    to float64 through the driver's pandas fetch ("10.0" vs Spark's
    "10"). DESCRIBE every oracle and require zero HUGEINT/UHUGEINT or
    DECIMAL(>18) output columns — integer sums must CAST to BIGINT."""
    import duckdb

    import __spark_entry__ as se
    from tools.driver_check import TABLES, fragile_dtypes

    from .conftest import SF_TEST

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_TEST}/{t}.parquet'"
        )
    bad = {}
    for name, sql in se.oracle_sql().items():
        cols = fragile_dtypes(con, sql)
        if cols:
            bad[name] = cols
    assert not bad, bad
