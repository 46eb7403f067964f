"""Count-min sketch heavy-hitter estimation (beyond-reference
extension, next to the HLL sketch in catalog_scale): a bounded-size,
mergeable frequency summary for item streams whose domain is too large
to count exactly.

Why a CMS at 100 TB: exact per-item counts shuffle the full corpus on
the item key; the sketch reduces every partition to a fixed d x w
counter grid (here 4 x 32 = 128 cells) that merges by elementwise sum
— the same partial-aggregate shape Spark already uses, but with a
HARD size bound independent of item cardinality. Point estimates are
biased high (collisions only add), never low: est >= true, with
P[est > true + eps*N] <= (1/2)^d at w = e/eps.

All hashing is md5-derived (seed-prefixed, first 8 hex chars mod w),
so Spark and DuckDB compute identical grids — the catalog query gets
a full value-hash oracle, unusual for a sketch. Merge correctness
(sketch(A union B) == sketch(A) + sketch(B) elementwise) is pinned by
pytest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

D_ROWS = 4
W_COLS = 32


def _cms_col(item: Column, r: int, w: int) -> Column:
    """Column index of ``item`` in hash row ``r``: first 8 md5 hex
    chars of the seed-prefixed item, mod ``w`` (non-negative)."""
    h = F.md5(F.concat(F.lit(f"{r}:"), item.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % w


def _probe_structs(item: Column, d: int, w: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"), _cms_col(item, r, w).alias("col")
            )
            for r in range(d)
        ]
    )


def cms_build(
    df: DataFrame, item_col: str, *, d: int = D_ROWS, w: int = W_COLS
) -> DataFrame:
    """Build the counter grid (r, col, n) — d*w rows max.

    One narrow explode (xd rows, no shuffle) then a groupBy whose
    key space is the GRID, not the item domain: the shuffle moves at
    most d*w partial counters per map task regardless of corpus size.
    Grids from different corpus slices merge by summing n on (r, col).
    """
    rc = df.select(
        F.explode(_probe_structs(F.col(item_col), d, w)).alias("rc")
    )
    return (
        rc.select("rc.r", "rc.col")
        .groupBy("r", "col")
        .agg(F.count("*").alias("n"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Elementwise sum of counter grids (PFMERGE analogue)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "col").agg(F.sum("n").alias("n"))


def cms_estimate(
    items: DataFrame,
    sketch: DataFrame,
    item_col: str,
    *,
    d: int = D_ROWS,
    w: int = W_COLS,
) -> DataFrame:
    """Point estimate per item: min over the d counters it hashes to.

    The sketch is grid-bounded -> broadcast; the probe join never
    shuffles the item side."""
    probes = items.select(
        F.col(item_col),
        F.explode(_probe_structs(F.col(item_col), d, w)).alias("rc"),
    ).select(item_col, "rc.r", "rc.col")
    return (
        probes.join(F.broadcast(sketch), ["r", "col"])
        .groupBy(item_col)
        .agg(F.min("n").alias("cms_est"))
    )
