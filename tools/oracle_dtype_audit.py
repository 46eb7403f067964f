"""Audit oracle_sql() output types for pandas-fragile columns.

DuckDB's HUGEINT (the result type of sum(BIGINT), and of arithmetic on
such sums) converts to float64 in fetchdf()/pandas — so a value-hash
computed over a pandas fetch sees "10.0" where Spark emits long "10".
The same applies to DECIMAL outputs wider than 18 digits. Any oracle
emitting those types hash-matches under fetchall() (Python ints) but
hash-FAILS under a pandas fetch: exactly the split between the local
mirror and the driver observed in CORRECTNESS_r03 (lm_quality_score,
pack_sequences).

This tool DESCRIBEs every oracle against the sf0.01 views and flags
output columns typed HUGEINT / UHUGEINT / DECIMAL(>18) so they can be
CAST explicitly. Run it whenever oracles are added.

Usage: python tools/oracle_dtype_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.driver_check import TABLES, fragile_dtypes as fragile_cols  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import __spark_entry__ as se

    flagged = 0
    for name, sql in sorted(se.oracle_sql().items()):
        try:
            bad = fragile_cols(con, sql)
        except Exception as e:  # DESCRIBE itself failed
            print(f"  {name}: DESCRIBE error: {e}")
            flagged += 1
            continue
        if bad:
            flagged += 1
            print(f"  {name}: {bad}")
    print(f"{flagged} fragile oracle(s)")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
