"""Query-catalog registry.

Every operator from SURVEY.md section 2 is exposed as a *named query*:
a callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
a DuckDB oracle string over the same parquet tables. The driver compares
the two at sf0.01 (row count + schema + order-insensitive value hash),
so:

- every computed column is explicitly aliased, identically on both
  sides;
- float aggregates go through exact decimal accumulation and a final
  double cast (see ``dsum``) so both engines produce identical bits;
- queries with LIMIT/OFFSET use total orders (unique tie-break keys)
  so the selected row *set* is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str  # SURVEY section 2 ids + reference citations
    tags: frozenset[str] = field(default_factory=frozenset)


QUERIES: dict[str, CatalogQuery] = {}


def query(name: str, *, oracle: str | None, doc: str, tags: tuple[str, ...] = ()):
    """Decorator registering a catalog query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = CatalogQuery(
            name=name, fn=fn, oracle=oracle, doc=doc, tags=frozenset(tags)
        )
        return fn

    return deco


def queries_dict() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_dict() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle}


# ---------------------------------------------------------------------------
# cross-engine exact-float helpers

#: decimal type wide enough for sums of price products at 100 TB; scale 6 chosen because source values
#: carry <=6 true decimal digits, making the double->decimal rounding
#: unambiguous (identical) across engines
_DEC = "decimal(28,6)"


def dsum_sql(expr: str, alias: str) -> str:
    """Oracle-side exact sum: accumulate in decimal, emit double."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) AS {alias}"


def dsum(col, alias: str):
    """Spark-side twin of ``dsum_sql`` (bit-identical result)."""
    from pyspark.sql import functions as F

    c = col if not isinstance(col, str) else F.col(col)
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


def davg(col, alias: str):
    """Exact-decimal mean emitted as double: sum(dec)::double / count."""
    from pyspark.sql import functions as F

    c = col if not isinstance(col, str) else F.col(col)
    return (
        F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    ).alias(alias)


def davg_sql(expr: str, alias: str) -> str:
    return (
        f"(CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / "
        f"COUNT({expr})) AS {alias}"
    )
