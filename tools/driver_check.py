"""Strict local mirror of the driver's verify protocol.

Runs t1 (``entry`` smoke on a *plain* SparkSession, no engine confs
pre-applied — exactly how the driver calls it) and t2 (every
``queries()`` entry vs its ``oracle_sql()`` twin on DuckDB at sf0.01,
compared by repr-level value hash with columns sorted by name).

repr-level is deliberately stricter than pandas equality: it catches
double-vs-decimal and timestamp-vs-date type drift between engines
that a tolerant compare would hide.

Usage: python tools/driver_check.py [sf_dir] [query ...]
(with query names given, only those catalog entries are checked)
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def value_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(tuple(repr(r[i]) for i in order) for r in rows)
    return hashlib.md5(repr(canon).encode()).hexdigest()


def fragile_dtypes(con, sql: str) -> list[tuple[str, str]]:
    """Oracle output columns whose DuckDB type degrades through a
    pandas fetch (HUGEINT -> float64, wide DECIMAL -> object): these
    hash-match under fetchall (Python ints) but hash-FAIL under the
    driver's pandas path — the exact CORRECTNESS_r03 failure mode
    (lm_quality_score/pack_sequences emitted raw sum(BIGINT))."""
    out = []
    for name, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
        t = typ.upper()
        if t.startswith(("HUGEINT", "UHUGEINT")):
            out.append((name, typ))
        elif t.startswith("DECIMAL") and int(t.split("(")[1].split(",")[0]) > 18:
            out.append((name, typ))
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .appName("driver-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as se

    rows = se.entry(spark).collect()
    print(f"t1 smoke: entry() -> {len(rows)} rows")
    assert len(rows) > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = se.queries(), se.oracle_sql()
    ok = bad = weak = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name}: rows-only ({len(srows)} rows)")
            weak += 1
            continue
        fragile = fragile_dtypes(con, oracles[name])
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        match = (
            value_hash(srows, sdf.columns) == value_hash(orows, ocols)
            and sorted(sdf.columns) == sorted(ocols)
            and len(srows) == len(orows)
            and not fragile
        )
        if fragile:
            print(f"  {name}: FRAGILE oracle dtypes {fragile}")
        if match:
            ok += 1
            print(f"  {name}: MATCH ({len(srows)} rows)")
        else:
            bad += 1
            print(
                f"  {name}: MISMATCH rows {len(srows)}/{len(orows)} "
                f"cols {sorted(sdf.columns)}/{sorted(ocols)}"
            )
    print(f"t2: {ok} match, {bad} mismatch, {weak} rows-only")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
