"""Catalog: robust statistics and weight-proportional sampling.

Completes two analytics gaps: the z-score anomaly monitor
(`value_anomalies`) breaks down when the contamination it is looking
for inflates the variance — the robust (median/MAD) twin here does
not; and the sampling family (uniform `consistent_sample`, quota
`mixture_allocation_sample`, stratified, per-key-capped) lacked a
weight-proportional member — systematic PPS sampling is how you pick
k documents proportional to token mass for eval sets.

Everything stays in exact integer/decimal space (cents, cumulative
BIGINT weights, integer-division stride crossings) so both engines
produce identical bits; the only floats are single exactly-rounded
IEEE ops (one multiply, one divide) shared verbatim with the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_CENTS_SQL = "CAST(round(value * 100) AS BIGINT)"


def _cents() -> F.Column:
    return F.round(F.col("value") * 100).cast("bigint")


@query(
    "value_anomalies_mad",
    oracle=f"""
        WITH e AS (
            SELECT event_id, event_type, value, {_CENTS_SQL} AS cents
            FROM events
        ),
        med AS (
            SELECT event_type, quantile_cont(cents, 0.5) AS med
            FROM e GROUP BY event_type
        ),
        dev AS (
            SELECT e.*, m.med, abs(e.cents - m.med) AS adev
            FROM e JOIN med m USING (event_type)
        ),
        mad AS (
            SELECT event_type, quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY event_type
        ),
        scored AS (
            SELECT d.event_id, d.event_type, d.value,
                   (d.cents - d.med)
                       / (CAST(1.4826 AS DOUBLE) * s.mad) AS robust_z
            FROM dev d JOIN mad s USING (event_type)
            WHERE s.mad > 0
        )
        SELECT event_id, event_type, value, robust_z
        FROM scored
        WHERE robust_z > CAST(3.5 AS DOUBLE)
           OR robust_z < CAST(-3.5 AS DOUBLE)
    """,
    doc=(
        "beyond-reference robust statistics: MEDIAN/MAD anomaly "
        "flagging — the outlier monitor value_anomalies' z-scores "
        "cannot be: a burst of extreme values inflates mean AND "
        "stddev (masking itself), while median and MAD have 50% "
        "breakdown. Three-pass plan, every pass a per-type "
        "aggregation of the type-bounded dimension broadcast back: "
        "exact interpolated median of integer cents, MAD of the "
        ".5-granular deviations (all exactly representable doubles), "
        "then one shared-spelling multiply+divide so the robust z is "
        "bit-identical cross-engine. Consistency factor 1.4826 "
        "rescales MAD to sigma-equivalent units."
    ),
    tags=("agg", "robust"),
)
def value_anomalies_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", _cents().alias("cents")
    )
    med = e.groupBy("event_type").agg(
        F.percentile("cents", F.lit(0.5)).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    rz = (F.col("cents") - F.col("med")) / (
        F.lit(1.4826).cast("double") * F.col("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .withColumn("robust_z", rz)
        .filter(
            (F.col("robust_z") > F.lit(3.5).cast("double"))
            | (F.col("robust_z") < F.lit(-3.5).cast("double"))
        )
        .select("event_id", "event_type", "value", "robust_z")
    )


@query(
    "value_equidepth_histogram",
    oracle=f"""
        WITH c AS (
            SELECT {_CENTS_SQL} AS cents, count(*) AS cnt
            FROM events GROUP BY 1
        ),
        cum AS (
            SELECT cents, cnt,
                   COALESCE(SUM(cnt) OVER (
                       ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS cb,
                   SUM(cnt) OVER () AS n
            FROM c
        )
        SELECT CAST(cb * 8 // n AS BIGINT) AS bucket,
               CAST(sum(cnt) AS BIGINT) AS n_rows,
               min(cents) AS lo_cents,
               max(cents) AS hi_cents
        FROM cum
        GROUP BY 1
    """,
    doc=(
        "beyond-reference statistics: EQUI-DEPTH histogram (8 "
        "equal-frequency buckets) — the selectivity-estimation "
        "companion to value_histogram's equal-width view. Bucket "
        "boundaries come from the CUMULATIVE DISTRIBUTION over the "
        "AGGREGATED value dimension (distinct cents, orders of "
        "magnitude smaller than the corpus): bucket(v) = "
        "floor(cum_before(v) * B / N) in pure BIGINT arithmetic, so "
        "equal values never split across buckets and both engines "
        "agree bit-for-bit. The corpus-scale work is one groupBy; "
        "the window sweeps only the value domain (at a truly "
        "unbounded domain, range-partition the sweep or pre-bin)."
    ),
    tags=("agg", "window"),
)
def value_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "events")
        .select(_cents().alias("cents"))
        .groupBy("cents")
        .agg(F.count("*").alias("cnt"))
    )
    w_before = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = c.select(
        "cents",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_before), F.lit(0)).alias("cb"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    return (
        cum.withColumn("bucket", F.expr("cb * 8 DIV n"))
        .groupBy("bucket")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


@query(
    "pps_systematic_sample",
    oracle="""
        WITH d AS (
            SELECT doc_id, source, n_chars,
                   md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        ),
        c AS (
            SELECT doc_id, source, n_chars,
                   SUM(n_chars) OVER (
                       ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum,
                   SUM(n_chars) OVER () AS w
            FROM d
        )
        SELECT doc_id, source, n_chars
        FROM c
        WHERE (cum * 50) // w > ((cum - n_chars) * 50) // w
    """,
    doc=(
        "beyond-reference sampling: SYSTEMATIC PPS (probability "
        "proportional to size) — picks <= 50 documents with "
        "inclusion probability proportional to n_chars (token mass), "
        "the standard way to draw an eval set that represents the "
        "corpus BY VOLUME, not by document count. Deterministic "
        "integer spec: md5-shuffled order, BIGINT cumulative weights, "
        "a document is selected iff its weight interval crosses a "
        "stride boundary (floor(cum*k/W) increments) — no floats, no "
        "ln/pow (Efraimidis-Spirakis keys are NOT bit-portable), "
        "replicated verbatim by the oracle. Oversized units are "
        "picked once (exactly the PPS-without-replacement clamp). "
        "Scale shape: the cumulative weights come from the TWO-PHASE "
        "distributed prefix sum (operators/prefix.py — range "
        "repartition, zero-shuffle per-partition scan, partition-"
        "count-sized offset frame broadcast back), NOT a global "
        "window: the plan contains no Exchange SinglePartition "
        "(asserted by pytest), so the operator parallelizes at any "
        "corpus size. The grand total W rides the same offsets pass "
        "as a 1-row broadcast."
    ),
    tags=("sampling", "window", "scale"),
)
def pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import partitioned_prefix_sum

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    c = partitioned_prefix_sum(d, ["h", "doc_id"], "n_chars", "cum")
    total = c.agg(F.sum("n_chars").alias("w"))
    return (
        c.join(F.broadcast(total))
        .filter(F.expr("(cum * 50) DIV w > ((cum - n_chars) * 50) DIV w"))
        .select("doc_id", "source", "n_chars")
    )


@query(
    "revenue_trend_theilsen",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS d,
                   CAST(SUM({_CENTS_SQL}) AS BIGINT) AS c
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        slopes AS (
            SELECT CAST(b.c - a.c AS DOUBLE) / (b.d - a.d) AS slope
            FROM daily a JOIN daily b ON a.d < b.d
        ),
        m AS (SELECT quantile_cont(slope, 0.5) AS slope FROM slopes)
        SELECT m.slope AS slope_cents_per_day,
               quantile_cont(daily.c - m.slope * daily.d, 0.5)
                   AS intercept_cents,
               (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days
        FROM daily, m
        GROUP BY m.slope
    """,
    doc=(
        "beyond-reference robust statistics: THEIL-SEN trend "
        "estimator over daily purchase revenue — the median of all "
        "pairwise slopes, with 29% breakdown against outlier days "
        "(a flash-sale spike shifts an OLS fit, not this). The "
        "corpus-scale work is one groupBy day; the O(n^2) pair frame "
        "lives on the AGGREGATED day dimension (30 days -> 435 "
        "pairs), never the events. Exactness: integer cent sums and "
        "epoch-day deltas, ONE IEEE division per slope and one "
        "shared-spelling multiply for intercept residuals — "
        "interpolated medians of identical doubles match bit-for-bit."
    ),
    tags=("agg", "robust", "temporal"),
)
def revenue_trend_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
            .alias("d")
        )
        .agg(F.sum(_cents()).alias("c"))
    )
    a = daily.select(F.col("d").alias("d1"), F.col("c").alias("c1"))
    b = daily.select(F.col("d").alias("d2"), F.col("c").alias("c2"))
    slopes = a.join(b, F.col("d1") < F.col("d2")).select(
        (
            (F.col("c2") - F.col("c1")).cast("double")
            / (F.col("d2") - F.col("d1"))
        ).alias("slope")
    )
    m = slopes.agg(F.percentile("slope", F.lit(0.5)).alias("slope"))
    resid = daily.join(F.broadcast(m)).select(
        "slope",
        (F.col("c") - F.col("slope") * F.col("d")).alias("r"),
    )
    n_days = daily.agg(F.count("*").alias("n_days"))
    return (
        resid.groupBy("slope")
        .agg(F.percentile("r", F.lit(0.5)).alias("intercept_cents"))
        .select(F.col("slope").alias("slope_cents_per_day"), "intercept_cents")
        .join(F.broadcast(n_days))
    )


@query(
    "value_trimmed_mean",
    oracle=f"""
        WITH e AS (
            SELECT event_type, {_CENTS_SQL} AS cents, event_id,
                   value,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY {_CENTS_SQL}, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_kept,
               (CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                    / COUNT(value)) AS trimmed_mean
        FROM e
        WHERE rn > n * 5 // 100 AND rn <= n - n * 5 // 100
        GROUP BY event_type
    """,
    doc=(
        "beyond-reference robust statistics: 5% TRIMMED MEAN per "
        "event type — the middle ground between the mean (0% "
        "breakdown) and the median; the trim spec is deterministic "
        "integer rank arithmetic over the total order (cents, "
        "event_id), so both engines drop the exact same rows, and "
        "the surviving values aggregate through the decimal-exact "
        "davg convention. Per-type window partitions — parallel at "
        "scale, no global sort."
    ),
    tags=("agg", "robust", "window"),
)
def value_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import davg

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value", _cents().alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    kept = ranked.filter(
        (F.col("rn") > F.expr("n * 5 DIV 100"))
        & (F.col("rn") <= F.col("n") - F.expr("n * 5 DIV 100"))
    )
    return kept.groupBy("event_type").agg(
        F.count("*").alias("n_kept"),
        davg("value", "trimmed_mean"),
    )


@query(
    "float_semantics",
    oracle="""
        SELECT 'sum_repr' AS probe,
               CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS result_d,
               CAST(NULL AS BOOLEAN) AS result_b,
               CAST(NULL AS BIGINT) AS result_i
        UNION ALL SELECT 'overflow_inf',
               CAST(1e308 AS DOUBLE) * 10, NULL, NULL
        UNION ALL SELECT 'inf_minus_inf',
               CAST('Infinity' AS DOUBLE) - CAST('Infinity' AS DOUBLE),
               NULL, NULL
        UNION ALL SELECT 'subnormal_min',
               CAST(5e-324 AS DOUBLE), NULL, NULL
        UNION ALL SELECT 'assoc_breaks', NULL,
               (CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE))
                   + CAST(0.3 AS DOUBLE)
               = CAST(0.1 AS DOUBLE)
                   + (CAST(0.2 AS DOUBLE) + CAST(0.3 AS DOUBLE)),
               NULL
        UNION ALL SELECT 'nan_eq_self', NULL,
               CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE), NULL
        UNION ALL SELECT 'neg_zero_eq', NULL,
               CAST(-0.0 AS DOUBLE) = CAST(0.0 AS DOUBLE), NULL
        UNION ALL SELECT 'neg_zero_ndv', NULL, NULL,
               (SELECT count(DISTINCT v) FROM (VALUES
                   (CAST(0.0 AS DOUBLE)),
                   (CAST(-0.0 AS DOUBLE))) s(v))
        UNION ALL SELECT 'nan_sorts_last', NULL, NULL,
               (SELECT rn FROM (SELECT v, row_number() OVER
                       (ORDER BY v) AS rn
                   FROM (VALUES (CAST(1.0 AS DOUBLE)),
                                (CAST('Infinity' AS DOUBLE)),
                                (CAST('NaN' AS DOUBLE))) s(v))
                WHERE isnan(v))
    """,
    doc=(
        "engine-conformance probe: IEEE-754 DOUBLE semantics pinned "
        "under driver hash, completing the UTF-8/NULL/calendar/"
        "numeric probe family — literal round-trips (0.1+0.2 bits), "
        "overflow to +inf, inf-inf = NaN, the minimum subnormal, "
        "float addition non-associativity (why the catalog sums in "
        "decimal), and the SQL-over-IEEE divergences both engines "
        "share: NaN = NaN is TRUE, NaN sorts greatest, and -0.0 "
        "equals +0.0 with ONE distinct grouping key (why -0.0 can "
        "never split a groupBy partition). Each agreement here is a "
        "precondition the exact-float conventions (functions/"
        "exact.py) silently rely on."
    ),
    tags=("scalar",),
)
def float_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT 'sum_repr' AS probe,
               double('0.1') + double('0.2') AS result_d,
               CAST(NULL AS BOOLEAN) AS result_b,
               CAST(NULL AS BIGINT) AS result_i
        UNION ALL SELECT 'overflow_inf',
               double('1e308') * 10, NULL, NULL
        UNION ALL SELECT 'inf_minus_inf',
               double('Infinity') - double('Infinity'), NULL, NULL
        UNION ALL SELECT 'subnormal_min',
               double('5e-324'), NULL, NULL
        UNION ALL SELECT 'assoc_breaks', NULL,
               (double('0.1') + double('0.2')) + double('0.3')
               = double('0.1') + (double('0.2') + double('0.3')), NULL
        UNION ALL SELECT 'nan_eq_self', NULL,
               double('NaN') = double('NaN'), NULL
        UNION ALL SELECT 'neg_zero_eq', NULL,
               double('-0.0') = double('0.0'), NULL
        UNION ALL SELECT 'neg_zero_ndv', NULL, NULL,
               (SELECT count(DISTINCT v) FROM (VALUES
                   (double('0.0')), (double('-0.0'))) s(v))
        UNION ALL SELECT 'nan_sorts_last', NULL, NULL,
               (SELECT rn FROM (SELECT v, row_number() OVER
                       (ORDER BY v) AS rn
                   FROM (VALUES (double('1.0')),
                                (double('Infinity')),
                                (double('NaN'))) s(v))
                WHERE isnan(v))
        """
    )


#: Benford expected first-digit shares, materialized driver-side as
#: exact double literals (log10(1+1/d) evaluated ONCE in Python and
#: embedded verbatim in both engines' expressions — no reliance on
#: log10 bit-parity between JVM and DuckDB libm paths)
_BENFORD_SHARES = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}

_BENFORD_CASE_SQL = "CASE digit " + " ".join(
    f"WHEN {d} THEN CAST({s!r} AS DOUBLE)" for d, s in _BENFORD_SHARES.items()
) + " END"


@query(
    "benford_audit",
    oracle=f"""
        WITH pos AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
            WHERE CAST(round(value * 100) AS BIGINT) > 0
        ),
        d AS (
            SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
                       AS digit,
                   CAST(count(*) AS BIGINT) AS n_obs,
                   CAST(SUM(count(*)) OVER () AS BIGINT) AS n_total
            FROM pos
            GROUP BY 1
        )
        SELECT digit, n_obs,
               CAST(n_total AS DOUBLE) * ({_BENFORD_CASE_SQL})
                   AS n_expected,
               CAST(n_obs AS DOUBLE)
                   / (CAST(n_total AS DOUBLE) * ({_BENFORD_CASE_SQL}))
                   AS obs_over_expected
        FROM d
    """,
    doc=(
        "beyond-reference data-quality: BENFORD first-digit audit — "
        "naturally-arising monetary amounts follow "
        "P(d) = log10(1+1/d); fabricated or clipped data shows up as "
        "obs/expected ratios far from 1 (the classic fraud / "
        "synthetic-data forensic). One groupBy over the digit "
        "domain; expected shares are Python-evaluated double "
        "literals shared verbatim with the oracle, so the only "
        "runtime float ops are one multiply and one divide — "
        "bit-identical cross-engine. (The window total runs over "
        "the 9-row digit frame.)"
    ),
    tags=("agg", "robust"),
)
def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = (
        load_table(spark, sf_dir, "events")
        .select(_cents().alias("cents"))
        .filter(F.col("cents") > 0)
    )
    d = pos.groupBy(
        F.substring(F.col("cents").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    ).agg(F.count("*").alias("n_obs"))
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    share = F.coalesce(
        *[
            F.when(F.col("digit") == dd, F.lit(ss).cast("double"))
            for dd, ss in _BENFORD_SHARES.items()
        ]
    )
    return d.withColumn(
        "n_total", F.sum("n_obs").over(w_all)
    ).select(
        "digit",
        "n_obs",
        (F.col("n_total").cast("double") * share).alias("n_expected"),
        (
            F.col("n_obs").cast("double")
            / (F.col("n_total").cast("double") * share)
        ).alias("obs_over_expected"),
    )


@query(
    "value_quantiles_distributed",
    oracle="""
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90,
               quantile_cont(value, 0.99) AS p99
        FROM events
        GROUP BY event_type
    """,
    doc=(
        "scale pattern: EXACT DISTRIBUTED QUANTILES — the same "
        "interpolated percentiles as value_quantiles, computed "
        "without the percentile aggregate's per-group value buffer "
        "(which materializes the full multiset per group in one "
        "task): a grouped distributed prefix-sum rank "
        "(operators/prefix.py) locates the two boundary rows per "
        "quantile, only those <=6 rows per group survive the "
        "filter, and the final interpolation v_lo + (v_hi - v_lo) * "
        "frac is the identical IEEE expression Spark's percentile "
        "and DuckDB's quantile_cont evaluate (the lo*(1-f)+hi*f "
        "spelling; its algebraic twin is an ulp off) — bit-equal to the "
        "oracle. The selection scan is codegen'd; no task ever "
        "holds a group's values in memory."
    ),
    tags=("agg", "window", "scale"),
)
def value_quantiles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import grouped_prefix_sum

    qs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    type_n = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    ranked = grouped_prefix_sum(
        ev.withColumn("__one", F.lit(1).cast("long")),
        ["event_type"],
        ["value", "event_id"],
        "__one",
        "r",
    ).join(F.broadcast(type_n), "event_type")

    # 0-based continuous position per quantile: pos = q * (n - 1)
    def pos(q: float) -> F.Column:
        return F.lit(q).cast("double") * (F.col("n") - 1).cast("double")

    keep = None
    for q in qs.values():
        c = (F.col("r") - 1 == F.floor(pos(q)).cast("long")) | (
            F.col("r") - 1 == F.ceil(pos(q)).cast("long")
        )
        keep = c if keep is None else (keep | c)
    boundary = ranked.filter(keep)

    aggs = []
    for name, q in qs.items():
        lo_v = F.max(
            F.when(
                F.col("r") - 1 == F.floor(pos(q)).cast("long"),
                F.col("value"),
            )
        )
        hi_v = F.max(
            F.when(
                F.col("r") - 1 == F.ceil(pos(q)).cast("long"),
                F.col("value"),
            )
        )
        frac = pos(q) - F.floor(pos(q))
        # the lo*(1-f) + hi*f spelling — the formula quantile_cont
        # (and Spark's percentile) actually evaluates; the algebraic
        # twin lo + (hi-lo)*f differs by an ulp on some inputs
        aggs.append(
            (lo_v * (F.lit(1.0) - frac) + hi_v * frac).alias(name)
        )
    # n is constant within a group; keep it in scope for pos()
    return (
        boundary.groupBy("event_type", "n")
        .agg(*aggs)
        .drop("n")
    )


# ------------------------------------------- mergeable quantile sketch

#: sample size per group: quantile error of a k-subsample is
#: O(sqrt(q(1-q)/k)) — ~2.2 points at the median for k=512 — and the
#: state per (group, sketch) is bounded at k rows regardless of input
#: size, which is the property that makes the sketch streamable.
QSKETCH_K = 512

_QSKETCH_SAMPLE_SQL = f"""
        SELECT event_type, value
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY event_type
            ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
        ) <= {QSKETCH_K}
"""

_QSKETCH_ORACLE = f"""
        WITH s AS ({_QSKETCH_SAMPLE_SQL})
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90
        FROM s
        GROUP BY event_type
"""


def _qsketch_sample(df: DataFrame, k: int = QSKETCH_K) -> DataFrame:
    """Bottom-k rows per group by md5 of the row identity — a
    DETERMINISTIC uniform subsample (the hash is a fixed uniform rank,
    so 'k smallest hashes' is a simple random sample any engine can
    reproduce bit-for-bit, the KMV trick applied to values)."""
    h = F.md5(F.col("event_id").cast("string"))
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(h, "event_id")
    )
    return (
        df.select("event_type", "event_id", "value")
        .withColumn("__rn", rn)
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _qsketch_estimate(
    sample: DataFrame,
    quantiles: tuple = ((0.5, "p50"), (0.9, "p90")),
) -> DataFrame:
    return sample.groupBy("event_type").agg(
        *[F.percentile("value", q).alias(name) for q, name in quantiles]
    )


@query(
    "value_quantiles_sketch",
    oracle=_QSKETCH_ORACLE,
    doc=(
        "beyond-reference sketching: MERGEABLE quantile sketch with "
        "an EXACT oracle — a bottom-k-by-hash (KMV-style) uniform "
        "subsample per group, quantiles interpolated over the "
        "sample. Unlike percentile_approx (value_quantiles_approx, "
        "rows-only by necessity: GK internals are engine-specific), "
        "the deterministic hash sample lets DuckDB reproduce the "
        "ESTIMATOR bit-for-bit, so the sketch itself sits under the "
        "driver hash; closeness to the true quantiles is a separate "
        "error-bound pytest. min-k sets are associative/commutative "
        "under union — the property the streamed twin folds on — and "
        "state is bounded at k rows per group at any corpus size. "
        "Plan: one WindowGroupLimit pass (partial top-k before the "
        "shuffle), never a global sort."
    ),
    tags=("agg", "scale"),
)
def value_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return _qsketch_estimate(_qsketch_sample(events))


@query(
    "value_quantiles_sketch_streamed",
    oracle=_QSKETCH_ORACLE,
    doc=(
        "streamed twin of value_quantiles_sketch: each micro-batch "
        "computes its per-group bottom-k-by-hash sample, and the fold "
        "re-selects the k smallest hashes of (state UNION batch) — "
        "min-k is an idempotent commutative monoid, so the drained "
        "state equals the batch sample regardless of arrival order "
        "or batch boundaries, and the final quantile readout matches "
        "the batch query and its DuckDB oracle bit-for-bit. State is "
        "versioned per batch_id (at-least-once replay safe), bounded "
        "at k rows per group."
    ),
    tags=("streaming", "agg", "scale"),
)
def value_quantiles_sketch_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile

    from ..operators.incremental import read_prior_zset, write_zset_version

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_qsk_")
    src = os.path.join(work, "in")
    state_dir = os.path.join(work, "state")
    events.select("event_type", "event_id", "value").repartition(
        6
    ).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        delta = _qsketch_sample(batch)
        prev = read_prior_zset(sp, state_dir, batch_id, delta)
        write_zset_version(
            _qsketch_sample(prev.unionByName(delta)), state_dir, batch_id
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(fold_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = max(
        int(d[1:]) for d in os.listdir(state_dir) if d.startswith("v")
    )
    return _qsketch_estimate(
        spark.read.parquet(os.path.join(state_dir, f"v{latest}"))
    )


# ------------------------------------------- bootstrap confidence bands

#: resample count: B=100 bootstrap replicates gives a stable 5th/95th
#: band over the replicate means while keeping the generated pick
#: table at B x n rows — embarrassingly parallel and per-group bounded.
BOOTSTRAP_B = 100


@query(
    "value_mean_bootstrap_ci",
    oracle=f"""
        WITH e AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY event_id) - 1 AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        picks AS (
            SELECT e.event_type, bs.b,
                   CAST(('0x' || substr(md5(e.event_type || ':' ||
                        bs.b || ':' || e.rn), 1, 15)) AS BIGINT)
                       % e.n AS idx
            FROM e, (SELECT unnest(generate_series(0,
                        {BOOTSTRAP_B - 1})) AS b) bs
        ),
        res AS (
            SELECT p.event_type, p.b,
                   CAST(sum(v.cents) AS DOUBLE) / count(*) AS m
            FROM picks p
            JOIN e v ON v.event_type = p.event_type AND v.rn = p.idx
            GROUP BY 1, 2
        )
        SELECT e.event_type,
               CAST(sum(e.cents) AS DOUBLE) / count(*) AS mean_cents,
               (SELECT quantile_cont(m, 0.05) FROM res r
                WHERE r.event_type = e.event_type) AS ci_lo,
               (SELECT quantile_cont(m, 0.95) FROM res r
                WHERE r.event_type = e.event_type) AS ci_hi
        FROM e
        GROUP BY e.event_type
    """,
    doc=(
        "beyond-reference statistics: BOOTSTRAP CONFIDENCE INTERVAL "
        "on the per-type mean — B=100 deterministic resamples (pick "
        "index = md5(type:b:rn) mod n, the repo's hash-randomness "
        "convention, so both engines draw byte-identical resamples), "
        "replicate means in exact integer space with one IEEE "
        "division each, and the 5th/95th replicate percentiles via "
        "the shared interpolation spelling. The estimator is fully "
        "oracle-pinned — no RNG, no seed-management divergence. "
        "Scale: the pick table is B x n rows, generated by explode "
        "and joined back on (type, rn) — per-group bounded, "
        "embarrassingly parallel, one shuffle; at 100 TB you "
        "bootstrap a per-group SAMPLE (value_quantiles_sketch's "
        "bottom-k trick) rather than the raw rows."
    ),
    tags=("agg", "scale"),
)
def value_mean_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    e = events.select(
        "event_type",
        _cents().alias("cents"),
        (
            F.row_number().over(w.orderBy("event_id")) - 1
        ).alias("rn"),
        F.count("*").over(w).alias("n"),
    ).localCheckpoint(eager=True)
    picks = e.select(
        "event_type",
        "rn",
        "n",
        F.explode(F.sequence(F.lit(0), F.lit(BOOTSTRAP_B - 1))).alias("b"),
    ).select(
        "event_type",
        "b",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("event_type"),
                            F.col("b").cast("string"),
                            F.col("rn").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % F.col("n")
        ).alias("idx"),
    )
    # BOTH sides of the resample join scale with the corpus (picks is
    # B x n rows; e is n rows) — pin a SORT-MERGE join. Left to the
    # optimizer, the explode's size estimate makes the 10M-row picks
    # side look broadcastable and a plain SparkSession's 1g driver
    # OOMs building the broadcast (observed at sf0.1); shuffle_hash
    # likewise OOMs building per-partition hash maps in a default-
    # memory session. Sort-merge spills gracefully at any scale.
    res = (
        picks.hint("merge").join(
            e.select("event_type", F.col("rn").alias("idx"), "cents"),
            ["event_type", "idx"],
        )
        .groupBy("event_type", "b")
        .agg(
            (F.sum("cents").cast("double") / F.count("*")).alias("m")
        )
    )
    base = e.groupBy("event_type").agg(
        (F.sum("cents").cast("double") / F.count("*")).alias("mean_cents")
    )
    ci = res.groupBy("event_type").agg(
        F.percentile("m", 0.05).alias("ci_lo"),
        F.percentile("m", 0.95).alias("ci_hi"),
    )
    return base.join(ci, "event_type").select(
        "event_type", "mean_cents", "ci_lo", "ci_hi"
    )


@query(
    "value_weighted_median",
    oracle="""
        WITH l AS (
            SELECT l_returnflag,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                   CAST(l_quantity AS BIGINT) AS w
            FROM lineitem
        ),
        agg AS (
            SELECT l_returnflag, cents, sum(w) AS w
            FROM l GROUP BY 1, 2
        ),
        cum AS (
            SELECT l_returnflag, cents,
                   sum(w) OVER (PARTITION BY l_returnflag
                                ORDER BY cents
                                ROWS UNBOUNDED PRECEDING) AS cw,
                   sum(w) OVER (PARTITION BY l_returnflag) AS tw
            FROM agg
        )
        SELECT l_returnflag,
               min(cents) AS weighted_median_cents
        FROM cum
        WHERE 2 * cw >= tw
        GROUP BY l_returnflag
    """,
    doc=(
        "beyond-reference statistics: WEIGHTED MEDIAN (lower) - the "
        "smallest price whose cumulative quantity weight reaches "
        "half the group's total, in pure BIGINT space (2*cum >= "
        "total avoids any fraction). percentile/quantile_cont are "
        "row-weighted only; revenue- or volume-weighted centers "
        "need the cumulative-crossing form. Plan: pre-aggregate to "
        "the distinct value dimension (the agg CTE - cardinality "
        "bounded by distinct prices, not rows), then one partitioned "
        "cumulative pass; at scale the cumulative pass is the "
        "grouped distributed prefix sum (operators/prefix.py), same "
        "as the decile/Gini family."
    ),
    tags=("agg", "scale"),
)
def value_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("cents"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    agg = li.groupBy("l_returnflag", "cents").agg(F.sum("w").alias("w"))
    wspec = Window.partitionBy("l_returnflag").orderBy("cents")
    cum = agg.select(
        "l_returnflag",
        "cents",
        F.sum("w")
        .over(wspec.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cw"),
        F.sum("w").over(Window.partitionBy("l_returnflag")).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.min("cents").alias("weighted_median_cents"))
    )


@query(
    "event_type_mode_value",
    oracle="""
        WITH c AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, cents AS mode_cents, CAST(n AS BIGINT) AS n
        FROM c
        QUALIFY row_number() OVER (
            PARTITION BY event_type ORDER BY n DESC, cents
        ) = 1
    """,
    doc=(
        "beyond-reference statistics: MODE per group with a "
        "DETERMINISTIC tie-break (highest count, then smallest "
        "value) - engines' built-in mode()/any_value tie behavior "
        "is unspecified, so the catalog spells the argmax as "
        "count-groupBy + WindowGroupLimit, the same two-phase "
        "top-1-per-key plan as latest_event_per_user (partial "
        "group-limit before the shuffle; never a global sort)."
    ),
    tags=("agg",),
)
def event_type_mode_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", _cents().alias("cents")
    )
    c = ev.groupBy("event_type", "cents").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("cents")
    )
    return (
        c.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("event_type", F.col("cents").alias("mode_cents"), "n")
    )


def _fold_value_weights(
    spark: SparkSession,
    src_df: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Shared streamed-fold harness for value-distribution state: each
    micro-batch reduces to (keys -> weight) and merges by addition
    into versioned z-set state (replay-safe); returns drained state.
    Any readout computable from the value-weight map (weighted
    median, mode, histograms, entropy) gets its streamed twin for
    free from this one fold."""
    import os
    import tempfile

    from ..operators.incremental import (
        merge_zset,
        read_prior_zset,
        write_zset_version,
    )

    work = tempfile.mkdtemp(prefix="csdp_vw_")
    src = os.path.join(work, "in")
    state_dir = os.path.join(work, "state")
    src_df.repartition(6).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def fold(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        delta = batch.groupBy(*keys).agg(F.sum("w").alias("w"))
        prev = read_prior_zset(sp, state_dir, batch_id, delta)
        write_zset_version(
            merge_zset(prev, delta, keys), state_dir, batch_id
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = max(
        int(d[1:]) for d in os.listdir(state_dir) if d.startswith("v")
    )
    return spark.read.parquet(os.path.join(state_dir, f"v{latest}"))


@query(
    "value_weighted_median_streamed",
    oracle="""
        WITH l AS (
            SELECT l_returnflag,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                   CAST(l_quantity AS BIGINT) AS w
            FROM lineitem
        ),
        agg AS (
            SELECT l_returnflag, cents, sum(w) AS w
            FROM l GROUP BY 1, 2
        ),
        cum AS (
            SELECT l_returnflag, cents,
                   sum(w) OVER (PARTITION BY l_returnflag
                                ORDER BY cents
                                ROWS UNBOUNDED PRECEDING) AS cw,
                   sum(w) OVER (PARTITION BY l_returnflag) AS tw
            FROM agg
        )
        SELECT l_returnflag,
               min(cents) AS weighted_median_cents
        FROM cum
        WHERE 2 * cw >= tw
        GROUP BY l_returnflag
    """,
    doc=(
        "streamed twin of value_weighted_median: the value-weight "
        "map (flag, cents) -> quantity is an abelian monoid under "
        "addition, so micro-batches fold into versioned state by one "
        "groupBy each (replay-safe v{batch_id} commits) and the "
        "cumulative-crossing readout runs once at drain. State is "
        "bounded by DISTINCT prices per group - the pre-aggregated "
        "dimension, not the row stream. Drained answer == batch == "
        "oracle bit-for-bit, arrival-order independent."
    ),
    tags=("streaming", "agg", "scale"),
)
def value_weighted_median_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("cents"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    state = _fold_value_weights(spark, li, ["l_returnflag", "cents"])
    wspec = Window.partitionBy("l_returnflag").orderBy("cents")
    cum = state.select(
        "l_returnflag",
        "cents",
        F.sum("w")
        .over(wspec.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cw"),
        F.sum("w").over(Window.partitionBy("l_returnflag")).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.min("cents").alias("weighted_median_cents"))
    )


@query(
    "event_type_mode_value_streamed",
    oracle="""
        WITH c AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, cents AS mode_cents, CAST(n AS BIGINT) AS n
        FROM c
        QUALIFY row_number() OVER (
            PARTITION BY event_type ORDER BY n DESC, cents
        ) = 1
    """,
    doc=(
        "streamed twin of event_type_mode_value on the SAME "
        "value-weight fold as the weighted median (each row weight "
        "1): counts merge by addition into versioned state, argmax "
        "with the deterministic tie-break runs at drain. One fold "
        "harness, a family of order-statistics readouts - the reason "
        "the state is the value->weight map rather than any single "
        "statistic."
    ),
    tags=("streaming", "agg"),
)
def event_type_mode_value_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", _cents().alias("cents"), F.lit(1).alias("w")
    )
    state = _fold_value_weights(spark, ev, ["event_type", "cents"])
    w = Window.partitionBy("event_type").orderBy(
        F.col("w").desc(), F.col("cents")
    )
    return (
        state.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "event_type",
            F.col("cents").alias("mode_cents"),
            F.col("w").cast("bigint").alias("n"),
        )
    )


#: shared contingency CTE (both chi2 twins): exact integer counts and
#: one exactly-rounded division per cell.
_CHI2_CELLS_CTE = """
        WITH c AS (
            SELECT CASE WHEN ts < TIMESTAMP '2024-01-16'
                        THEN 'w1' ELSE 'w2' END AS period,
                   event_type,
                   CAST(count(*) AS BIGINT) AS o
            FROM events
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT c.*,
                   sum(o) OVER (PARTITION BY period) AS row_tot,
                   sum(o) OVER (PARTITION BY event_type) AS col_tot,
                   sum(o) OVER () AS grand_tot
            FROM c
        ),
        cells AS (
            SELECT period, event_type, o, grand_tot,
                   CAST(row_tot * col_tot AS DOUBLE) / grand_tot AS e
            FROM tot
        )"""

#: shared readout: per-cell terms are bit-identical across engines, so
#: the only divergence left is SUMMATION ORDER — sf0.01 happened to
#: agree, sf0.1 differed in the last bits. Both engines therefore fold
#: the (tiny: periods x types) term list in explicit
#: (period, event_type) order: list() ORDER BY + list_reduce here,
#: array_sort(collect_list(struct)) + F.aggregate on the Spark side.
_CHI2_READOUT_SQL = """
        SELECT CAST(count(*) AS BIGINT) AS n_cells,
               CAST((count(DISTINCT period) - 1)
                    * (count(DISTINCT event_type) - 1) AS BIGINT)
                   AS dof,
               list_reduce(
                   list((o - e) * (o - e) / e
                        ORDER BY period, event_type),
                   (a, b) -> a + b) AS chi2,
               sqrt(list_reduce(
                        list((o - e) * (o - e) / e
                             ORDER BY period, event_type),
                        (a, b) -> a + b)
                    / (max(grand_tot)
                       * least(count(DISTINCT period) - 1,
                               count(DISTINCT event_type) - 1)))
                   AS cramers_v
        FROM cells
    """

_CHI2_ORACLE = _CHI2_CELLS_CTE + _CHI2_READOUT_SQL


def _chi2_readout(cells: DataFrame) -> DataFrame:
    """Order-deterministic chi2 / Cramer's V readout from a cell table
    (period, event_type, o, e, grand_tot) — see _CHI2_READOUT_SQL."""
    term = (
        (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
    )
    g = cells.agg(
        F.count("*").alias("n_cells"),
        (
            (F.countDistinct("period") - 1)
            * (F.countDistinct("event_type") - 1)
        ).alias("dof"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("period"), F.col("event_type"), term.alias("t")
                )
            )
        ).alias("__terms"),
        F.max("grand_tot").alias("__gt"),
        F.least(
            F.countDistinct("period") - 1,
            F.countDistinct("event_type") - 1,
        ).alias("__k"),
    )
    chi2 = F.aggregate(
        "__terms", F.lit(0.0), lambda acc, x: acc + x["t"]
    )
    return g.select(
        "n_cells",
        "dof",
        chi2.alias("chi2"),
        F.sqrt(chi2 / (F.col("__gt") * F.col("__k"))).alias("cramers_v"),
    )


@query(
    "event_mix_drift_chi2",
    oracle=_CHI2_ORACLE,
    doc=(
        "beyond-reference data-quality statistics: CHI-SQUARE "
        "homogeneity test for event-mix drift between two periods "
        "(the distribution-shift monitor a training-data pipeline "
        "runs before mixing sources) plus Cramer's V effect size. "
        "Chosen over KL/JS divergence deliberately: entropy needs "
        "ln(), which is not bit-portable across engines (the same "
        "reason BM25 idf enters plans as a driver-computed literal), "
        "while chi-square is exact integer contingency counts, one "
        "division per cell, squared differences, and a correctly-"
        "rounded IEEE sqrt - every op identical in both engines. "
        "Plan: one groupBy for the contingency table, window totals "
        "over the CELL table (periods x types rows, never the "
        "corpus), one-row readout."
    ),
    tags=("agg", "scale"),
)
def event_mix_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt

    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.select(
            F.when(
                F.col("ts") < F.lit(_dt.datetime(2024, 1, 16)), "w1"
            )
            .otherwise("w2")
            .alias("period"),
            "event_type",
        )
        .groupBy("period", "event_type")
        .agg(F.count("*").alias("o"))
    )
    tot = c.select(
        "*",
        F.sum("o").over(Window.partitionBy("period")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("event_type")).alias("col_tot"),
        F.sum("o").over(
            Window.partitionBy()
        ).alias("grand_tot"),
    )
    cells = tot.select(
        "period",
        "event_type",
        "o",
        "grand_tot",
        (
            (F.col("row_tot") * F.col("col_tot")).cast("double")
            / F.col("grand_tot")
        ).alias("e"),
    )
    return _chi2_readout(cells)


@query(
    "price_quantity_spearman",
    oracle="""
        WITH d AS (
            SELECT l_returnflag,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
                   CAST(l_quantity AS BIGINT) AS q
            FROM lineitem
        ),
        r AS (
            SELECT l_returnflag,
                   2 * rank() OVER (PARTITION BY l_returnflag
                                    ORDER BY p)
                   + count(*) OVER (PARTITION BY l_returnflag, p)
                   - 1 AS rp,
                   2 * rank() OVER (PARTITION BY l_returnflag
                                    ORDER BY q)
                   + count(*) OVER (PARTITION BY l_returnflag, q)
                   - 1 AS rq
            FROM d
        )
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(floor(
                   (CAST(count(*) AS DOUBLE)
                        * CAST(sum(CAST(rp * rq AS DECIMAL(28,6)))
                               AS DOUBLE)
                    - CAST(sum(CAST(rp AS DECIMAL(28,6))) AS DOUBLE)
                      * CAST(sum(CAST(rq AS DECIMAL(28,6))) AS DOUBLE))
                   / (sqrt(CAST(count(*) AS DOUBLE)
                               * CAST(sum(CAST(rp * rp
                                       AS DECIMAL(28,6))) AS DOUBLE)
                           - CAST(sum(CAST(rp AS DECIMAL(28,6)))
                                  AS DOUBLE)
                             * CAST(sum(CAST(rp AS DECIMAL(28,6)))
                                    AS DOUBLE))
                      * sqrt(CAST(count(*) AS DOUBLE)
                                 * CAST(sum(CAST(rq * rq
                                         AS DECIMAL(28,6))) AS DOUBLE)
                             - CAST(sum(CAST(rq AS DECIMAL(28,6)))
                                    AS DOUBLE)
                               * CAST(sum(CAST(rq AS DECIMAL(28,6)))
                                      AS DOUBLE)))
                   * CAST(1000000000.0 AS DOUBLE)
                   + CAST(0.5 AS DOUBLE)
               ) AS BIGINT) AS spearman_nano
        FROM r
        GROUP BY l_returnflag
    """,
    doc=(
        "beyond-reference statistics: SPEARMAN RANK CORRELATION - "
        "the monotonic-association monitor that survives outliers "
        "and nonlinearity where Pearson (price_quantity_correlation) "
        "does not. Tie-averaged ranks are kept EXACT by storing "
        "2*avg_rank = 2*min_rank + tie_count - 1 (always an "
        "integer; correlation is affine-invariant so the doubling "
        "cancels), co-moments accumulate in decimal, and the ratio "
        "quantizes at 1e-9 like the Pearson twin (sums exceed 2^53 "
        "where int128->double vs BigDecimal rounding diverges by a "
        "half-ulp). Scale: the per-group rank windows are the "
        "grouped-prefix-sum family's territory when a group outgrows "
        "a task (customer_value_deciles pattern)."
    ),
    tags=("agg", "scale"),
)
def price_quantity_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("p"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )

    def rank2(col: str) -> F.Column:
        return (
            2 * F.rank().over(Window.partitionBy("l_returnflag").orderBy(col))
            + F.count("*").over(Window.partitionBy("l_returnflag", col))
            - 1
        )

    r = li.select(
        "l_returnflag", rank2("p").alias("rp"), rank2("q").alias("rq")
    )
    dsum = lambda c: F.sum(c.cast("decimal(28,6)")).cast("double")  # noqa: E731
    n = F.count("*").cast("double")
    sx, sy = dsum(F.col("rp")), dsum(F.col("rq"))
    sxy = dsum(F.col("rp") * F.col("rq"))
    sxx = dsum(F.col("rp") * F.col("rp"))
    syy = dsum(F.col("rq") * F.col("rq"))
    rho = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    nano = F.floor(rho * F.lit(1_000_000_000.0) + F.lit(0.5)).cast("long")
    return r.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), nano.alias("spearman_nano")
    )


@query(
    "value_drift_ks",
    oracle="""
        WITH d AS (
            SELECT CASE WHEN ts < TIMESTAMP '2024-01-16'
                        THEN 1 ELSE 2 END AS grp,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        n AS (
            SELECT sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n1,
                   sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS n2
            FROM d
        ),
        steps AS (
            SELECT cents,
                   sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1,
                   sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS c2
            FROM d GROUP BY cents
        ),
        cum AS (
            SELECT cents,
                   sum(c1) OVER (ORDER BY cents
                                 ROWS UNBOUNDED PRECEDING) AS f1,
                   sum(c2) OVER (ORDER BY cents
                                 ROWS UNBOUNDED PRECEDING) AS f2
            FROM steps
        )
        SELECT CAST(n.n1 AS BIGINT) AS n1,
               CAST(n.n2 AS BIGINT) AS n2,
               CAST(max(abs(f1 * n.n2 - f2 * n.n1)) AS BIGINT)
                   AS ks_numer,
               CAST(max(abs(f1 * n.n2 - f2 * n.n1)) AS DOUBLE)
                   / (n.n1 * n.n2) AS ks_stat
        FROM cum, n
        GROUP BY n.n1, n.n2
    """,
    doc=(
        "beyond-reference data-quality statistics: two-sample "
        "KOLMOGOROV-SMIRNOV drift test on purchase values between "
        "two periods - the whole-distribution shift monitor that "
        "catches what the chi-square mix test (categorical) and mean "
        "CI (location-only) cannot. Fully EXACT: D's numerator "
        "max|F1*n2 - F2*n1| is pure BIGINT arithmetic over the "
        "merged step function (empirical CDFs compared at every "
        "jump), and the statistic itself is that integer over n1*n2 "
        "- one IEEE division, no quantization needed. Plan: groupBy "
        "to the distinct-value dimension, one cumulative pass over "
        "it (grouped-prefix-sum territory at scale), one-row "
        "readout."
    ),
    tags=("agg", "scale"),
)
def value_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt

    d = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("ts") < F.lit(_dt.datetime(2024, 1, 16)), 1
            )
            .otherwise(2)
            .alias("grp"),
            _cents().alias("cents"),
        )
    )
    steps = d.groupBy("cents").agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("grp") == 2, 1).otherwise(0)).alias("c2"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = steps.select(
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
    )
    return _ks_readout(cum)


def _ks_readout(cum: DataFrame) -> DataFrame:
    totals = cum.agg(
        F.max("f1").alias("n1"), F.max("f2").alias("n2")
    )
    joined = cum.crossJoin(F.broadcast(totals))
    return joined.groupBy("n1", "n2").agg(
        F.max(
            F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
        ).alias("ks_numer"),
        (
            F.max(
                F.abs(
                    F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")
                )
            ).cast("double")
            / (F.col("n1") * F.col("n2"))
        ).alias("ks_stat"),
    )


@query(
    "value_shift_mannwhitney",
    oracle="""
        WITH d AS (
            SELECT CASE WHEN ts < TIMESTAMP '2024-01-16'
                        THEN 1 ELSE 2 END AS grp,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        r AS (
            SELECT grp,
                   2 * rank() OVER (ORDER BY cents)
                   + count(*) OVER (PARTITION BY cents) - 1 AS r2
            FROM d
        )
        SELECT CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2,
               CAST(sum(CASE WHEN grp = 1 THEN r2 ELSE 0 END)
                    - sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
                      * (sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) + 1)
                    AS BIGINT) AS u1_x2,
               CAST(sum(CASE WHEN grp = 1 THEN r2 ELSE 0 END)
                    - sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
                      * (sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) + 1)
                    AS DOUBLE)
               / (2 * sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
                    * sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END))
                   AS auc
        FROM r
    """,
    doc=(
        "beyond-reference statistics: MANN-WHITNEY U location-shift "
        "test between two periods - the rank-based sibling "
        "completing the drift trio (chi-square: categorical mix; "
        "KS: whole distribution; U: stochastic dominance). "
        "Tie-averaged combined ranks stay exact via the doubled-rank "
        "trick (2*avg_rank is integer), so 2*U1 = sum(r2 | grp1) - "
        "n1(n1+1) is pure BIGINT, and U1/(n1*n2) - one IEEE "
        "division - is exactly the AUC / P(X1 > X2) effect size "
        "(0.5 = no shift). Plan: one global rank window over the "
        "filtered slice (grouped-prefix territory at scale), "
        "one-row readout, no joins at all."
    ),
    tags=("agg", "scale"),
)
def value_shift_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt

    d = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("ts") < F.lit(_dt.datetime(2024, 1, 16)), 1
            )
            .otherwise(2)
            .alias("grp"),
            _cents().alias("cents"),
        )
    )
    r = d.select(
        "grp",
        (
            2 * F.rank().over(Window.orderBy("cents"))
            + F.count("*").over(Window.partitionBy("cents"))
            - 1
        ).alias("r2"),
    )
    n1 = F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
    n2 = F.sum(F.when(F.col("grp") == 2, 1).otherwise(0))
    r1 = F.sum(F.when(F.col("grp") == 1, F.col("r2")).otherwise(0))
    u1x2 = r1 - n1 * (n1 + 1)
    return r.agg(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        u1x2.cast("bigint").alias("u1_x2"),
        (u1x2.cast("double") / (2 * n1 * n2)).alias("auc"),
    )


@query(
    "value_drift_ks_streamed",
    oracle="""
        WITH d AS (
            SELECT CASE WHEN ts < TIMESTAMP '2024-01-16'
                        THEN 1 ELSE 2 END AS grp,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        n AS (
            SELECT sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n1,
                   sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS n2
            FROM d
        ),
        steps AS (
            SELECT cents,
                   sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1,
                   sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS c2
            FROM d GROUP BY cents
        ),
        cum AS (
            SELECT cents,
                   sum(c1) OVER (ORDER BY cents
                                 ROWS UNBOUNDED PRECEDING) AS f1,
                   sum(c2) OVER (ORDER BY cents
                                 ROWS UNBOUNDED PRECEDING) AS f2
            FROM steps
        )
        SELECT CAST(n.n1 AS BIGINT) AS n1,
               CAST(n.n2 AS BIGINT) AS n2,
               CAST(max(abs(f1 * n.n2 - f2 * n.n1)) AS BIGINT)
                   AS ks_numer,
               CAST(max(abs(f1 * n.n2 - f2 * n.n1)) AS DOUBLE)
                   / (n.n1 * n.n2) AS ks_stat
        FROM cum, n
        GROUP BY n.n1, n.n2
    """,
    doc=(
        "STREAMING drift detection: the two-sample KS monitor "
        "maintained as events arrive. The sufficient state is the "
        "(group, value) -> count map - mergeable by addition, the "
        "same value-weight monoid fold as the streamed weighted "
        "median/mode - so each micro-batch costs one groupBy into "
        "versioned replay-safe state bounded by the distinct-value "
        "domain, and the exact-integer KS readout runs at drain "
        "(in production: after every batch, giving a live drift "
        "series). Drained statistic == the batch value_drift_ks == "
        "the oracle, bit-for-bit."
    ),
    tags=("streaming", "agg", "scale"),
)
def value_drift_ks_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt

    d = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("ts") < F.lit(_dt.datetime(2024, 1, 16)), 1
            )
            .otherwise(2)
            .alias("grp"),
            _cents().alias("cents"),
            F.lit(1).alias("w"),
        )
    )
    state = _fold_value_weights(spark, d, ["grp", "cents"])
    steps = state.groupBy("cents").agg(
        F.sum(F.when(F.col("grp") == 1, F.col("w")).otherwise(0)).alias(
            "c1"
        ),
        F.sum(F.when(F.col("grp") == 2, F.col("w")).otherwise(0)).alias(
            "c2"
        ),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = steps.select(
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
    )
    return _ks_readout(cum)


@query(
    "event_value_trend_ols",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', ts)) + 1
                        AS BIGINT) AS x,
                   sum(CAST(round(value * 100) AS BIGINT)) AS y
            FROM events
            GROUP BY 1, 2
        ),
        m AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx
            FROM daily GROUP BY 1
        )
        SELECT event_type, n,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / (n * sxx - sx * sx) AS slope_cents_per_day,
               (CAST(sy AS DOUBLE)
                - CAST(n * sxy - sx * sy AS DOUBLE)
                      / (n * sxx - sx * sx) * sx)
               / n AS intercept_cents
        FROM m
    """,
    doc=(
        "beyond-reference statistics: per-group OLS LINEAR TREND of "
        "daily revenue - the least-squares sibling of the robust "
        "Theil-Sen slope (revenue_trend_theilsen); together they "
        "bracket trend estimation (efficient vs 29%-breakdown). "
        "Fully exact WITHOUT quantization: x is the integer day "
        "index and y integer cents, so all five co-moment sums are "
        "BIGINT and the slope is one IEEE division of exact "
        "integers (unlike the Pearson/Spearman co-moments, nothing "
        "here exceeds 2^53); the intercept reuses the slope with a "
        "shared-spelling multiply-subtract-divide chain. Plan: "
        "groupBy to (type, day) then (type) - two partial-agg "
        "shuffles over the day dimension, never a window."
    ),
    tags=("agg",),
)
def event_value_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt

    daily = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            (
                F.datediff(
                    F.date_trunc("day", "ts"),
                    F.lit(_dt.date(2024, 1, 1)),
                )
                + 1
            )
            .cast("bigint")
            .alias("x"),
            _cents().alias("cents"),
        )
        .groupBy("event_type", "x")
        .agg(F.sum("cents").alias("y"))
    )
    m = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num.cast("double") / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx")
    ) / F.col("n")
    return m.select(
        "event_type",
        "n",
        slope.alias("slope_cents_per_day"),
        intercept.alias("intercept_cents"),
    )


@query(
    "event_mix_drift_chi2_streamed",
    oracle=_CHI2_ORACLE,
    doc=(
        "streamed twin of the chi-square mix-drift monitor, closing "
        "the live drift pair with value_drift_ks_streamed: the "
        "contingency table (period, type) -> count is the same "
        "additive value-weight monoid, so micro-batches fold into "
        "versioned replay-safe state (cells x 1 rows, trivially "
        "bounded) and the chi2/Cramer's V readout runs at drain - "
        "or after every batch for a live drift series. Matches the "
        "batch statistic and oracle bit-for-bit."
    ),
    tags=("streaming", "agg"),
)
def event_mix_drift_chi2_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import datetime as _dt

    src = load_table(spark, sf_dir, "events").select(
        F.when(F.col("ts") < F.lit(_dt.datetime(2024, 1, 16)), "w1")
        .otherwise("w2")
        .alias("period"),
        "event_type",
        F.lit(1).alias("w"),
    )
    state = _fold_value_weights(spark, src, ["period", "event_type"])
    c = state.select("period", "event_type", F.col("w").alias("o"))
    tot = c.select(
        "*",
        F.sum("o").over(Window.partitionBy("period")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("event_type")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("grand_tot"),
    )
    cells = tot.select(
        "period",
        "event_type",
        "o",
        "grand_tot",
        (
            (F.col("row_tot") * F.col("col_tot")).cast("double")
            / F.col("grand_tot")
        ).alias("e"),
    )
    return _chi2_readout(cells)


# ---------------------------------------------------------------------------
# priority sampling (Duffield-Lund-Thorup)

from ..extensions.privacy import hex_uniform, hex_uniform_sql  # noqa: E402


@query(
    "priority_sample_dlt",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, source, n_chars,
                   CAST(n_chars AS DOUBLE)
                       / {hex_uniform_sql('CAST(doc_id AS VARCHAR)', 'dlt')}
                       AS priority
            FROM documents
        ),
        t AS (
            SELECT *, row_number() OVER (
                ORDER BY priority DESC, doc_id ASC) AS rn
            FROM d
        ),
        tau AS (SELECT priority AS tau FROM t WHERE rn = 51)
        SELECT doc_id, source, n_chars, priority,
               CASE WHEN CAST(n_chars AS DOUBLE) > tau.tau
                    THEN CAST(n_chars AS DOUBLE) ELSE tau.tau
               END AS est_weight
        FROM t, tau WHERE rn <= 50
    """,
    doc=(
        "beyond-reference sampling: PRIORITY SAMPLING (Duffield-"
        "Lund-Thorup 2005) - weighted-without-replacement k=50 by "
        "priority = w/u with u a seeded md5 uniform, plus the "
        "tau-threshold estimator (est_weight = max(w, tau), tau = "
        "the (k+1)-th priority) whose subset-sum estimates are "
        "unbiased with near-optimal variance. The bit-portable "
        "sibling of pps_systematic_sample: Efraimidis-Spirakis keys "
        "need ln/pow (not bit-portable across engines, per that "
        "query's doc), but w/u is ONE correctly-rounded IEEE "
        "division of exactly-representable operands, so priorities "
        "hash identically. Scale shape: top-(k+1) is "
        "TakeOrderedAndProject (per-partition heads, driver merge of "
        "51 rows) - no prefix sum, no global sort, no single-"
        "partition window over the corpus; the (k+1)-row frame then "
        "broadcasts."
    ),
    tags=("sampling", "scale", "bench"),
)
def priority_sample_dlt(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        (
            F.col("n_chars").cast("double")
            / hex_uniform(F.col("doc_id").cast("string"), "dlt")
        ).alias("priority"),
    )
    # top-(k+1) never global-sorts: orderBy().limit() plans
    # TakeOrderedAndProject; the 51-row result is the only thing the
    # single-partition window below ever sees
    top = d.orderBy(F.col("priority").desc(), F.col("doc_id").asc()).limit(51)
    w = Window.orderBy(F.col("priority").desc(), F.col("doc_id").asc())
    ranked = top.select("*", F.row_number().over(w).alias("rn"))
    tau = ranked.filter(F.col("rn") == 51).select(
        F.col("priority").alias("tau")
    )
    return (
        ranked.filter(F.col("rn") <= 50)
        .join(F.broadcast(tau))
        .select(
            "doc_id",
            "source",
            "n_chars",
            "priority",
            F.when(
                F.col("n_chars").cast("double") > F.col("tau"),
                F.col("n_chars").cast("double"),
            )
            .otherwise(F.col("tau"))
            .alias("est_weight"),
        )
    )


@query(
    "priority_sample_dlt_streamed",
    # oracle = the batch priority sample: top-(k+1)-by-priority is a
    # max-like fold, so the drained reservoir equals the from-scratch
    # draw exactly
    oracle=f"""
        WITH d AS (
            SELECT doc_id, source, n_chars,
                   CAST(n_chars AS DOUBLE)
                       / {hex_uniform_sql('CAST(doc_id AS VARCHAR)', 'dlt')}
                       AS priority
            FROM documents
        ),
        t AS (
            SELECT *, row_number() OVER (
                ORDER BY priority DESC, doc_id ASC) AS rn
            FROM d
        ),
        tau AS (SELECT priority AS tau FROM t WHERE rn = 51)
        SELECT doc_id, source, n_chars, priority,
               CASE WHEN CAST(n_chars AS DOUBLE) > tau.tau
                    THEN CAST(n_chars AS DOUBLE) ELSE tau.tau
               END AS est_weight
        FROM t, tau WHERE rn <= 50
    """,
    doc=(
        "beyond-reference sampling: STREAMING priority sampling - the "
        "distributed weighted reservoir: state is the top-(k+1) rows "
        "by priority (k+1 rows FOREVER, the textbook bounded-state "
        "stream sample), folded per micro-batch by union + re-top "
        "(a max-like idempotent merge, so at-least-once replays "
        "cannot change the draw); tau and the estimator come from "
        "the drained reservoir and must equal the batch "
        "priority_sample_dlt exactly."
    ),
    tags=("sampling", "streaming", "scale"),
)
def priority_sample_dlt_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..extensions.privacy import hex_uniform

    docs = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="csdp_dlt_")
    src = os.path.join(work, "in")
    state_dir = os.path.join(work, "state")
    os.makedirs(state_dir)
    docs.repartition(6).write.mode("overwrite").parquet(src)

    def _versions() -> list[int]:
        return sorted(
            int(d[1:])
            for d in os.listdir(state_dir)
            if d.startswith("v") and d[1:].isdigit()
        )

    def fold_topk(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        delta = batch.select(
            "doc_id",
            "source",
            "n_chars",
            (
                F.col("n_chars").cast("double")
                / hex_uniform(F.col("doc_id").cast("string"), "dlt")
            ).alias("priority"),
        )
        prior_vs = [v for v in _versions() if v < batch_id]
        if prior_vs:
            prior = sp.read.parquet(
                os.path.join(state_dir, f"v{prior_vs[-1]}")
            )
            delta = prior.unionByName(delta).dropDuplicates(["doc_id"])
        merged = delta.orderBy(
            F.col("priority").desc(), F.col("doc_id").asc()
        ).limit(51)
        out = os.path.join(state_dir, f"v{batch_id}")
        tmp = out + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(out):
            shutil.rmtree(out)
        os.rename(tmp, out)
        for v in prior_vs[:-1]:
            shutil.rmtree(os.path.join(state_dir, f"v{v}"), True)

    q_ = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(fold_topk)
        .trigger(availableNow=True)
        .start()
    )
    q_.awaitTermination()
    latest = _versions()[-1]
    state = spark.read.parquet(os.path.join(state_dir, f"v{latest}"))
    w = Window.orderBy(F.col("priority").desc(), F.col("doc_id").asc())
    ranked = state.select("*", F.row_number().over(w).alias("rn"))
    tau = ranked.filter(F.col("rn") == 51).select(
        F.col("priority").alias("tau")
    )
    return (
        ranked.filter(F.col("rn") <= 50)
        .join(F.broadcast(tau))
        .select(
            "doc_id",
            "source",
            "n_chars",
            "priority",
            F.when(
                F.col("n_chars").cast("double") > F.col("tau"),
                F.col("n_chars").cast("double"),
            )
            .otherwise(F.col("tau"))
            .alias("est_weight"),
        )
    )


@query(
    "value_cusum_changepoint",
    oracle="""
        WITH RECURSIVE daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS x
            FROM events
            GROUP BY 1, 2
        ),
        ref AS (
            SELECT event_type,
                   SUM(x) // COUNT(*) AS k,
                   COUNT(*) AS n_days
            FROM daily GROUP BY 1
        ),
        e AS (
            SELECT d.event_type, d.day, d.x, r.k, r.n_days,
                   row_number() OVER (PARTITION BY d.event_type
                                      ORDER BY d.day) AS rn
            FROM daily d JOIN ref r ON r.event_type = d.event_type
        ),
        cu(event_type, rn, s, n_alarms, first_alarm) AS (
            SELECT event_type, rn, greatest(0, x - k),
                   CASE WHEN greatest(0, x - k) > k THEN 1 ELSE 0 END,
                   CASE WHEN greatest(0, x - k) > k THEN day END
            FROM e WHERE rn = 1
          UNION ALL
            SELECT e.event_type, e.rn,
                   greatest(0, cu.s + e.x - e.k),
                   cu.n_alarms
                     + CASE WHEN greatest(0, cu.s + e.x - e.k) > e.k
                            THEN 1 ELSE 0 END,
                   COALESCE(cu.first_alarm,
                     CASE WHEN greatest(0, cu.s + e.x - e.k) > e.k
                          THEN e.day END)
            FROM cu JOIN e
              ON e.event_type = cu.event_type AND e.rn = cu.rn + 1
        )
        SELECT r.event_type,
               CAST(r.n_days AS BIGINT) AS n_days,
               CAST(r.k AS BIGINT) AS ref_cents,
               CAST(max(cu.s) AS BIGINT) AS max_cusum,
               CAST(arg_max(cu.n_alarms, cu.rn) AS BIGINT) AS n_alarms,
               arg_max(cu.first_alarm, cu.rn) AS first_alarm_day
        FROM cu JOIN ref r ON r.event_type = cu.event_type
        GROUP BY 1, 2, 3
    """,
    doc=(
        "beyond-reference drift family: CUSUM CHANGEPOINT detection "
        "(Page 1954) - the SEQUENTIAL drift monitor next to the "
        "two-sample tests (value_drift_ks / event_mix_drift_chi2 / "
        "value_shift_mannwhitney compare two windows; CUSUM walks "
        "the series and accumulates one-sided excess over a "
        "reference, alarming when S_t = max(0, S_(t-1) + x_t - k) "
        "crosses h = k). Pure-integer spec: daily cents totals, "
        "integer-DIV reference, so the fold is exact on both "
        "engines. max(0, .) is not associative - same inherently "
        "sequential class as user_balance_clamped: Arrow applyInPandas "
        "fold per key (cost bounded by one key's day count, keys "
        "parallelize), DuckDB linear recursive CTE as oracle. At "
        "100 TB the corpus contributes one (type, day) partial agg; "
        "the fold runs on the tiny day-series frame."
    ),
    tags=("agg", "temporal", "scale"),
)
def value_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(_cents()).cast("long").alias("x"))
    ref = daily.groupBy("event_type").agg(
        F.expr("SUM(x) DIV COUNT(*)").alias("k"),
        F.count("*").cast("long").alias("n_days"),
    )
    joined = daily.join(ref, "event_type")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        k = int(pdf["k"].iloc[0])
        s = 0
        max_s = 0
        n_alarms = 0
        first_alarm = None
        for day, x in zip(pdf["day"], pdf["x"]):
            s = max(0, s + int(x) - k)
            max_s = max(max_s, s)
            if s > k:
                n_alarms += 1
                if first_alarm is None:
                    first_alarm = day
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(pdf)],
                "ref_cents": [k],
                "max_cusum": [max_s],
                "n_alarms": [n_alarms],
                "first_alarm_day": [first_alarm],
            }
        )

    return joined.groupBy("event_type").applyInPandas(
        fold,
        "event_type string, n_days long, ref_cents long, "
        "max_cusum long, n_alarms long, first_alarm_day date",
    )


def _make_value_cusum_streamed() -> None:
    batch = QUERIES["value_cusum_changepoint"]

    @query(
        "value_cusum_changepoint_streamed",
        # oracle = the batch CUSUM verbatim: (type, day) cents totals
        # merge exactly across micro-batches, so the drain-time
        # sequential fold walks the identical day series
        oracle=batch.oracle,
        doc=(
            "beyond-reference drift family: STREAMING CUSUM - the "
            "(event_type, day) cents-total table is the mergeable "
            "state (bounded by types x calendar days, not stream "
            "length), folded per micro-batch into replay-idempotent "
            "versions; the non-associative max(0,.) walk runs once "
            "at drain over the drained day series and must equal "
            "the batch value_cusum_changepoint exactly. The "
            "sequential-fold member of the streamed-monitor set "
            "(KS/chi2 drift twins fold distribution state the same "
            "way)."
        ),
        tags=("agg", "temporal", "streaming", "scale"),
    )
    def value_cusum_changepoint_streamed(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        import os
        import shutil
        import tempfile

        import pandas as pd

        events = load_table(spark, sf_dir, "events")
        work = tempfile.mkdtemp(prefix="csdp_cus_")
        src = os.path.join(work, "in")
        state_dir = os.path.join(work, "state")
        os.makedirs(state_dir)
        events.repartition(6).write.mode("overwrite").parquet(src)

        def _versions() -> list[int]:
            return sorted(
                int(d[1:])
                for d in os.listdir(state_dir)
                if d.startswith("v") and d[1:].isdigit()
            )

        def fold_daily(batch_df: DataFrame, batch_id: int) -> None:
            sp = batch_df.sparkSession
            delta = batch_df.groupBy(
                "event_type", F.col("ts").cast("date").alias("day")
            ).agg(F.sum(_cents()).cast("long").alias("x"))
            prior_vs = [v for v in _versions() if v < batch_id]
            if prior_vs:
                prior = sp.read.parquet(
                    os.path.join(state_dir, f"v{prior_vs[-1]}")
                )
                delta = (
                    prior.unionByName(delta)
                    .groupBy("event_type", "day")
                    .agg(F.sum("x").cast("long").alias("x"))
                )
            out = os.path.join(state_dir, f"v{batch_id}")
            tmp = out + ".tmp"
            delta.write.mode("overwrite").parquet(tmp)
            if os.path.exists(out):
                shutil.rmtree(out)
            os.rename(tmp, out)
            for v in prior_vs[:-1]:
                shutil.rmtree(os.path.join(state_dir, f"v{v}"), True)

        q_ = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
            .writeStream.foreachBatch(fold_daily)
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
        latest = _versions()[-1]
        daily = spark.read.parquet(os.path.join(state_dir, f"v{latest}"))
        ref = daily.groupBy("event_type").agg(
            F.expr("SUM(x) DIV COUNT(*)").alias("k"),
            F.count("*").cast("long").alias("n_days"),
        )
        joined = daily.join(ref, "event_type")

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("day")
            k = int(pdf["k"].iloc[0])
            s = 0
            max_s = 0
            n_alarms = 0
            first_alarm = None
            for day, x in zip(pdf["day"], pdf["x"]):
                s = max(0, s + int(x) - k)
                max_s = max(max_s, s)
                if s > k:
                    n_alarms += 1
                    if first_alarm is None:
                        first_alarm = day
            return pd.DataFrame(
                {
                    "event_type": [pdf["event_type"].iloc[0]],
                    "n_days": [len(pdf)],
                    "ref_cents": [k],
                    "max_cusum": [max_s],
                    "n_alarms": [n_alarms],
                    "first_alarm_day": [first_alarm],
                }
            )

        return joined.groupBy("event_type").applyInPandas(
            fold,
            "event_type string, n_days long, ref_cents long, "
            "max_cusum long, n_alarms long, first_alarm_day date",
        )


from .registry import QUERIES  # noqa: E402

_make_value_cusum_streamed()
