"""Snapshot diff — CDC GENERATION (beyond-reference; the inverse of
``sources/cdc.py``): given two states of a table, emit the
Debezium-shaped change set (op c/u/d + before/after) that transforms
old into new. This is how a warehouse publishes a change feed for
tables that have no log-based capture (periodic full extracts), and
the round-trip partner of the A1 CDC source: applying the generated
deltas onto the old snapshot with the LWW upsert reproduces the new
snapshot exactly (pytest proves it).

Plan shape: ONE full outer join on the key — inserts are right-only
rows, deletes left-only, updates key-matched rows whose compared
columns differ (null-safe struct equality, so NULL→value and
value→NULL count as changes). No window, no per-row Python; at 100 TB
both snapshots shuffle once on the key (or zero times if both are
bucketed by it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """(op, before struct, after struct) rows turning ``old`` into
    ``new``: op 'c' (right-only), 'd' (left-only), 'u' (both sides,
    any compared column differs under null-safe equality). Unchanged
    rows are dropped."""
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in key_cols]
    cols = list(key_cols) + list(compare_cols)
    o = old.select(*cols).alias("o")
    n = new.select(*cols).alias("n")
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(f"o.{k}") == F.col(f"n.{k}"))
    j = o.join(n, cond, "full_outer")
    in_old = F.col(f"o.{key_cols[0]}").isNotNull()
    in_new = F.col(f"n.{key_cols[0]}").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    op = (
        F.when(~in_old, F.lit("c"))
        .when(~in_new, F.lit("d"))
        .when(changed, F.lit("u"))
    )
    before = F.struct(*[F.col(f"o.{c}").alias(c) for c in cols])
    after = F.struct(*[F.col(f"n.{c}").alias(c) for c in cols])
    return (
        j.select(
            op.alias("op"),
            F.when(in_old, before).alias("before"),
            F.when(in_new, after).alias("after"),
        )
        .filter(F.col("op").isNotNull())
    )


def schema_drift_report(old: DataFrame, new: DataFrame) -> list[dict]:
    """Structural diff between two table versions: added / removed /
    type-changed columns, plus the null-rate shift on surviving
    columns (the silent killer — a upstream change that starts
    nulling a column breaks consumers without any schema change).

    Returns a list of {"column", "change", "detail"} dicts,
    driver-side (schema-sized, not data-sized; the null-rate pass is
    ONE aggregate per side over the common columns). The governance
    companion to snapshot_diff: that one diffs rows, this diffs
    structure."""
    from pyspark.sql import functions as F

    old_types = {f.name: f.dataType.simpleString() for f in old.schema}
    new_types = {f.name: f.dataType.simpleString() for f in new.schema}
    report: list[dict] = []
    for c in sorted(set(new_types) - set(old_types)):
        report.append(
            {"column": c, "change": "added", "detail": new_types[c]}
        )
    for c in sorted(set(old_types) - set(new_types)):
        report.append(
            {"column": c, "change": "removed", "detail": old_types[c]}
        )
    common = sorted(set(old_types) & set(new_types))
    for c in common:
        if old_types[c] != new_types[c]:
            report.append(
                {
                    "column": c,
                    "change": "type_changed",
                    "detail": f"{old_types[c]} -> {new_types[c]}",
                }
            )

    def null_rates(df):
        if not common:
            return {}
        row = df.agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.count(F.when(F.col(c).isNull(), 1)).alias(c)
                for c in common
            ],
        ).collect()[0]
        n = row["__n"] or 1
        return {c: row[c] / n for c in common}

    old_nr, new_nr = null_rates(old), null_rates(new)
    for c in common:
        delta = new_nr[c] - old_nr[c]
        if abs(delta) > 0.05:
            report.append(
                {
                    "column": c,
                    "change": "null_rate_shift",
                    "detail": f"{old_nr[c]:.3f} -> {new_nr[c]:.3f}",
                }
            )
    return report
