"""Cross-engine exact-float aggregation helpers.

Double sums are order-dependent; accumulating in a wide decimal and
emitting a final double makes Spark and the DuckDB oracle produce
identical bits. Scale 6 is chosen because the source data carries at
most 6 true decimal digits, so the double->decimal rounding step is
unambiguous (identical) in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(28,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Exact sum: accumulate in decimal, emit double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


def dsum_sql(expr: str, alias: str) -> str:
    """DuckDB twin of ``dsum`` (bit-identical result)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) AS {alias}"


def davg(col: Column | str, alias: str) -> Column:
    """Exact-decimal mean emitted as double: sum(dec)::double / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(_DEC)).cast("double") / F.count(c)).alias(alias)


def davg_sql(expr: str, alias: str) -> str:
    return (
        f"(CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / "
        f"COUNT({expr})) AS {alias}"
    )
