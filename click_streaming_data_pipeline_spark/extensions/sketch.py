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

    The sketch is GRID-BOUNDED — at most d*w counters at ANY corpus
    size — so it collects to the driver (one tiny job) and the probe
    becomes a literal-array lookup folded into the items projection.
    This replaces the previous broadcast-join form's d-way probe
    explode, broadcast build, and min-regroup exchange with a single
    codegen'd projection (three scheduling barriers deleted; the
    sketch itself still builds distributed with the bounded partial
    aggregate).

    Exactness vs the join form: absent grid cells are NULL literals
    and ``least`` skips NULLs, so the estimate is the min over
    PRESENT cells and an item probing only absent cells drops out —
    the inner join's row semantics, bit for bit. Every item that
    contributed to the sketch has all d of its cells present. Emits
    one row per input row; callers pass distinct items (all do)."""
    est = cms_estimate_col(sketch, F.col(item_col), d=d, w=w)
    return items.select(item_col, est.alias("cms_est")).filter(
        F.col("cms_est").isNotNull()
    )


def cms_estimate_col(
    sketch: DataFrame,
    item: Column,
    *,
    d: int = D_ROWS,
    w: int = W_COLS,
) -> Column:
    """The CMS point-estimate EXPRESSION over a collected grid — NULL
    where every probed cell is absent (callers filter, replaying the
    join form's inner semantics). Collects the sketch immediately
    (one bounded job); composable into any projection, so a lane that
    already aggregates per item folds the estimate into that pass
    with no extra join."""
    grid: list[list[int | None]] = [[None] * w for _ in range(d)]
    for row in sketch.collect():
        grid[int(row["r"])][int(row["col"])] = int(row["n"])
    lookups = [
        F.element_at(
            F.expr(
                "array({})".format(
                    ",".join(
                        "CAST(NULL AS BIGINT)" if x is None else f"{x}L"
                        for x in grid[r]
                    )
                )
            ),
            (_cms_col(item, r, w) + 1).cast("int"),
        )
        for r in range(d)
    ]
    return F.least(*lookups) if d > 1 else lookups[0]


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — mergeable distinct counts
# PLUS set intersection/Jaccard estimation, which HLL cannot provide
# without inclusion-exclusion error stacking (Beyer et al., SIGMOD'07
# "On synopses for distinct-value estimation under multiset
# operations"). The sketch of a key's item set is its k smallest
# 60-bit md5 values; sketches merge by "k smallest of the union" —
# the same bounded partial-aggregate shape as the CMS above.

KMV_K = 64
#: 15 md5 hex chars = 60 bits: fits signed 64-bit exactly (no conv
#: overflow) and makes hash ties across distinct items ~impossible
#: (p < n^2 / 2^61), so the k-th order statistic is engine-portable.
KMV_BITS_DENOM = float(1 << 60)


def kmv_hash(item: Column) -> Column:
    """60-bit uniform integer hash of an item (md5-derived, exact in
    both engines; DuckDB twin: CAST(('0x' || substr(md5(x),1,15)) AS
    BIGINT))."""
    return F.conv(
        F.substring(F.md5(item.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    item_col: str,
    *,
    k: int = KMV_K,
) -> DataFrame:
    """Per-key KMV sketch rows ``(key, u)``: the k smallest distinct
    item hashes. Distinct-first collapses duplicates so the window
    ranks the SET's order statistics; the per-key sort is k-bounded
    after the rank filter and partition-local before it."""
    from pyspark.sql.window import Window

    hashed = (
        df.select(F.col(key_col), kmv_hash(F.col(item_col)).alias("u"))
        .distinct()
    )
    w = Window.partitionBy(key_col).orderBy("u")
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(key_col, "u")
    )


def kmv_estimates(sketch: DataFrame, key_col: str, *, k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate per key from its sketch: exact when the
    sketch holds the whole set (n_sketch < k), else (k-1)/u_k with u_k
    normalized to (0,1) — the classic KMV estimator."""
    return sketch.groupBy(key_col).agg(
        F.count("*").alias("n_sketch"),
        F.max("u").alias("u_k"),
    ).select(
        F.col(key_col),
        F.col("n_sketch"),
        F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
        .otherwise(
            F.lit(float(k - 1))
            * F.lit(KMV_BITS_DENOM)
            / F.col("u_k").cast("double")
        )
        .alias("est_distinct"),
    )


def kmv_pairwise_overlap(
    sketch: DataFrame, key_col: str, *, k: int = KMV_K
) -> DataFrame:
    """Pairwise set-overlap estimates between every two keys from
    their KMV sketches: merged sketch = k smallest of the union of the
    two k-min sets (a valid KMV of A∪B); Jaccard estimate = fraction
    of merged values present in BOTH input sketches; intersection =
    jaccard * union. Every step is an equi-join or a k-bounded window
    over sketch-sized data (#keys x k rows), never the raw corpus."""
    from pyspark.sql.window import Window

    keys = sketch.select(F.col(key_col).alias("__key")).distinct()
    pairs = (
        keys.select(F.col("__key").alias("key_a"))
        .join(
            keys.select(F.col("__key").alias("key_b")),
            F.col("key_a") < F.col("key_b"),
        )
    )
    sk = sketch.select(F.col(key_col).alias("__k"), "u")
    a_side = pairs.join(
        sk.withColumnRenamed("__k", "key_a"), "key_a"
    ).select("key_a", "key_b", "u", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    b_side = pairs.join(
        sk.withColumnRenamed("__k", "key_b"), "key_b"
    ).select("key_a", "key_b", "u", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        a_side.unionByName(b_side)
        .groupBy("key_a", "key_b", "u")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("key_a", "key_b").orderBy("u")
    kept = merged.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    agg = kept.groupBy("key_a", "key_b").agg(
        F.count("*").alias("k_used"),
        F.max("u").alias("u_k"),
        F.sum((F.col("in_a") * F.col("in_b"))).alias("n_both"),
    )
    est_union = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_BITS_DENOM) / F.col("u_k").cast("double")
    )
    jacc = F.col("n_both").cast("double") / F.col("k_used").cast("double")
    return agg.select(
        "key_a",
        "key_b",
        "k_used",
        "n_both",
        jacc.alias("est_jaccard"),
        est_union.alias("est_union"),
        (jacc * est_union).alias("est_intersection"),
    )


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog — the faithful Redis PFADD/PFCOUNT/PFMERGE
# analogue (reference services/document/app/db/cache.py:88-101) with a
# PINNED estimator: every step (60-bit md5 hash, register index, rank
# rho, register max, harmonic sum, bias-corrected readout) is exact
# integer/IEEE arithmetic both engines reproduce bit-for-bit, so the
# sketch earns a full DuckDB value-hash oracle — unlike
# approx_count_distinct / hll_sketch_agg, whose register layouts are
# engine-internal. The ONE transcendental (linear counting's
# m*ln(m/V)) is precomputed in Python over its entire 1023-value
# domain and embedded as the SAME literal table in both plans: ln()
# is not bit-portable across JVM/libm (measured: 302/4095 inputs
# differ in the last ulp), a table lookup is.
#
# Scale: registers are a bounded partial aggregate (<= m rows per key
# before the key shuffle — map-side combine keeps the shuffle at
# partitions x keys x m), merge = elementwise max (PFMERGE), state is
# m rows per key at ANY corpus size. rsd ~ 1.04/sqrt(m) = 3.25 %.

HLL_P = 10
HLL_M = 1 << HLL_P  # 1024 registers
#: rho upper bound: 60-bit hash leaves 60-p rest bits; all-zero rest
#: means 60-p leading zeros -> rho = 60-p+1
HLL_RMAX = 60 - HLL_P + 1


def _hll_alpha_m(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


#: harmonic-estimator numerator alpha*m^2*2^RMAX, ONE python float
#: embedded identically in both engines (raw = HLL_RAW_NUM / S)
HLL_RAW_NUM = _hll_alpha_m(HLL_M) * HLL_M * HLL_M * float(2**HLL_RMAX)

#: linear-counting readout m*ln(m/V) for V = 1..m-1, python-computed
#: once — the literal table both engines index instead of evaluating
#: ln() at query time
def _hll_lc_table() -> list[float]:
    import math

    return [HLL_M * math.log(HLL_M / v) for v in range(1, HLL_M)]


HLL_LC_TABLE = _hll_lc_table()


def hll_registers(df: DataFrame, key_cols: list[str], item_col: str) -> DataFrame:
    """Per-key HLL register rows ``(*key_cols, ridx, rho)``: the
    PFADD state. ridx = low p bits of the 60-bit md5 hash, rho = 1 +
    leading zeros of the remaining 60-p bits (via length(bin(rest)),
    integer-exact in both engines), register = max(rho). NULL items
    are skipped (countDistinct semantics)."""
    hashed = (
        df.filter(F.col(item_col).isNotNull())
        .select(*key_cols, kmv_hash(F.col(item_col)).alias("__u"))
    )
    rest = F.shiftright(F.col("__u"), HLL_P)
    rho = F.when(rest == 0, F.lit(HLL_RMAX)).otherwise(
        F.lit(HLL_RMAX) - F.length(F.bin(rest))
    )
    return (
        hashed.select(
            *key_cols,
            (F.col("__u") % HLL_M).alias("ridx"),
            rho.alias("rho"),
        )
        .groupBy(*key_cols, "ridx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(regs: DataFrame, key_cols: list[str]) -> DataFrame:
    """Distinct-count estimate per key from register rows: harmonic
    mean over 2^-rho with absent registers contributing 2^0, as an
    EXACT integer sum S = sum(2^(RMAX-rho)) + (m-n)*2^RMAX (order-free
    — the one float division raw = NUM/S is bit-identical on any
    partitioning and in the DuckDB twin); small-range correction =
    the embedded linear-counting table at V = m - n zero registers."""
    agg = regs.groupBy(*key_cols).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RMAX} - rho)")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    v = (F.lit(HLL_M) - F.col("n_present")).cast("int")
    s_int = F.col("s_present") + (
        (F.lit(HLL_M).cast("long") - F.col("n_present"))
        * F.lit(2**HLL_RMAX).cast("long")
    )
    raw = F.lit(HLL_RAW_NUM) / s_int.cast("double")
    est = F.when(
        (v > 0) & (raw <= F.lit(2.5 * HLL_M)),
        F.element_at(F.lit(HLL_LC_TABLE), v),
    ).otherwise(raw)
    return agg.select(*key_cols, est.alias("unique_views"))


def _sql_double(x: float) -> str:
    """A DuckDB literal that parses as DOUBLE with exactly these bits:
    repr round-trips, and an exponent suffix blocks the DECIMAL
    inference a plain decimal literal would get."""
    s = repr(float(x))
    return s if "e" in s else s + "e0"


def hll_est_cte(name: str, reg_src: str) -> str:
    """DuckDB CTE ``{name}(doc_key, unique_views)`` estimating from a
    register CTE ``reg_src(doc_key, ridx, rho)`` — references the
    shared ``lc(tbl)`` linear-counting table CTE."""
    m, rmax = HLL_M, HLL_RMAX
    raw = (
        f"{_sql_double(HLL_RAW_NUM)} / CAST(s_present + ({m} - n_present)"
        f" * (CAST(1 AS BIGINT) << {rmax}) AS DOUBLE)"
    )
    return f"""
        {name} AS (
            SELECT doc_key,
                   CASE WHEN ({m} - n_present) > 0
                             AND {raw} <= {_sql_double(2.5 * HLL_M)}
                        THEN (SELECT tbl FROM lc)
                                 [CAST({m} - n_present AS INTEGER)]
                        ELSE {raw}
                   END AS unique_views
            FROM (
                SELECT doc_key,
                       sum(CAST(1 AS BIGINT) << ({rmax} - rho))
                           AS s_present,
                       count(*) AS n_present
                FROM {reg_src} GROUP BY doc_key
            )
        )"""


def hll_oracle_ctes(key_sql: str, *, src: str = "events") -> str:
    """DuckDB CTE chain computing the SAME registers and estimate:
    ``h`` (hash), ``reg`` (registers), ``lc`` (the shared
    linear-counting literal table), ``hll_est(doc_key,
    unique_views)``. ``key_sql`` is the key expression over ``src``."""
    table = ", ".join(_sql_double(x) for x in HLL_LC_TABLE)
    m, rmax = HLL_M, HLL_RMAX
    return f"""
        h AS (
            SELECT {key_sql} AS doc_key,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                        AS BIGINT) AS u
            FROM {src} WHERE user_id IS NOT NULL
        ),
        reg AS (
            SELECT doc_key, u % {m} AS ridx,
                   max(CASE WHEN (u >> {HLL_P}) = 0 THEN {rmax}
                            ELSE {rmax} - length(bin(u >> {HLL_P})) END)
                       AS rho
            FROM h GROUP BY doc_key, u % {m}
        ),
        lc(tbl) AS (SELECT [{table}]),{hll_est_cte("hll_est", "reg")}"""
