"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship per-key view-analytics query
(SURVEY.md section 3.2) at sf0.001. ``queries()``/``oracle_sql()``
expose the full catalog in
``click_streaming_data_pipeline_spark/plans`` — one named query per
implemented operator from SURVEY.md section 2, each with a DuckDB
oracle where ANSI-SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from click_streaming_data_pipeline_spark.plans import (
    QUERIES,
    oracle_dict,
    queries_dict,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["doc_views"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return queries_dict()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    return oracle_dict()
