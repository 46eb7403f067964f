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
    # DuckDB SQL; None => driver does rows-only check. A CALLABLE is a
    # LAZY oracle, rendered when oracle_dict() is asked for it — for
    # oracles that embed fixture-derived literals (compression_signals'
    # zlib VALUES) which must be computed against the round's
    # regenerated testdata, not at import time.
    oracle: str | None | Callable[[], str]
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
    return {
        name: (q.oracle() if callable(q.oracle) else q.oracle)
        for name, q in QUERIES.items()
        if q.oracle
    }


# ---------------------------------------------------------------------------
# cross-engine exact-float helpers live in functions.exact (neutral
# module: both the catalog and the streaming layer use them without
# import cycles); re-exported here for catalog convenience.

from ..functions.exact import davg, davg_sql, dsum, dsum_sql  # noqa: E402,F401
