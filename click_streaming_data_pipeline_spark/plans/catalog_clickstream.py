"""Clickstream-analytics catalog (beyond reference): marketing
attribution, experiment readout, abuse detection, and leaderboard
queries over the ``events`` table.

The reference pipeline ingests and aggregates the click stream
(services/event, services/data-quality); these are the downstream
analytics a team runs ON that stream. All money math happens in exact
integer cent-space (``value`` carries exactly 2 decimal digits, so
``round(value*100)`` is bit-identical in Spark and DuckDB), and every
rate/statistic either stays integer or is emitted at a fixed 1e-9
resolution (the ``*_nano`` convention shared with
price_quantity_correlation) so the driver hash-compare is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.asof import interval_join_binned
from ..sources import load_table
from .registry import query

_CENTS_SQL = "CAST(round(value * 100) AS BIGINT)"


def _cents() -> F.Column:
    """Exact integer cents from the 2-decimal double column."""
    return F.round(F.col("value") * 100).cast("long")


@query(
    "linear_attribution",
    oracle=f"""
        WITH c AS (
            SELECT user_id, ts, event_id FROM events
            WHERE event_type = 'click'
        ),
        p AS (
            SELECT user_id, ts, event_id, {_CENTS_SQL} AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        touched AS (
            SELECT c.user_id, c.event_id AS click_id,
                   p.event_id AS purchase_id, p.cents,
                   count(*) OVER (PARTITION BY p.event_id) AS n_touch
            FROM c JOIN p
              ON c.user_id = p.user_id
             AND p.ts >= c.ts
             AND p.ts <= c.ts + INTERVAL '1 hour'
        )
        SELECT click_id, user_id,
               CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(sum(cents * 10000 // n_touch) AS BIGINT)
                   AS attributed_microcents
        FROM touched
        GROUP BY 1, 2
    """,
    doc=(
        "beyond-reference attribution: LINEAR MULTI-TOUCH - each "
        "purchase's revenue is split evenly across every same-user "
        "click in the preceding hour (the standard marketing "
        "attribution model after last-touch, which asof_attribution "
        "already covers). Candidate pairs come from the hot-key-safe "
        "binned interval join; the per-purchase touch count is a "
        "window over purchase_id (bounded groups: touches within 1h), "
        "then one groupBy click. Shares are floor(cents*1e4/n) "
        "BIGINTs - exact in both engines, no float accumulation."
    ),
    tags=("join", "temporal", "window", "agg"),
)
def linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", _cents().alias("cents")
    )
    j = interval_join_binned(clicks, purchases, gap_seconds=3600)
    touched = j.select(
        "user_id",
        F.col("l_event_id").alias("click_id"),
        F.col("r_event_id").alias("purchase_id"),
        F.col("r_cents").alias("cents"),
    ).withColumn(
        "n_touch", F.count("*").over(Window.partitionBy("purchase_id"))
    )
    share = F.expr("cents * 10000 DIV n_touch")
    return touched.groupBy("click_id", "user_id").agg(
        F.count("*").alias("n_purchases"),
        F.sum(share).alias("attributed_microcents"),
    )


# deterministic 50/50 split: parity of the md5 tail of the user id —
# identical hex in both engines, uncorrelated with user_id ranges.
_VARIANT_SQL = (
    "CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 32, 1)) % 2 = 0 "
    "THEN 'control' ELSE 'treatment' END"
)


@query(
    "ab_test_report",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   {_VARIANT_SQL} AS variant,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted,
                   coalesce(sum(CASE WHEN event_type = 'purchase'
                                     THEN {_CENTS_SQL} END), 0) AS cents
            FROM events
            GROUP BY 1, 2
        ),
        v AS (
            SELECT
                CAST(sum(CASE WHEN variant = 'control' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_control,
                CAST(sum(CASE WHEN variant = 'treatment' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_treatment,
                CAST(sum(CASE WHEN variant = 'control' THEN converted
                              ELSE 0 END) AS BIGINT) AS conv_control,
                CAST(sum(CASE WHEN variant = 'treatment' THEN converted
                              ELSE 0 END) AS BIGINT) AS conv_treatment,
                CAST(sum(CASE WHEN variant = 'control' THEN cents
                              ELSE 0 END) AS BIGINT) AS cents_control,
                CAST(sum(CASE WHEN variant = 'treatment' THEN cents
                              ELSE 0 END) AS BIGINT) AS cents_treatment
            FROM per_user
        )
        SELECT n_control, n_treatment, conv_control, conv_treatment,
               cents_control, cents_treatment,
               CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE)
                   AS rate_control,
               CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)
                   AS rate_treatment,
               CAST(floor(
                   CASE WHEN sqrt(
                       (CAST(conv_control + conv_treatment AS DOUBLE)
                            / CAST(n_control + n_treatment AS DOUBLE))
                       * (CAST(1.0 AS DOUBLE)
                          - CAST(conv_control + conv_treatment AS DOUBLE)
                              / CAST(n_control + n_treatment AS DOUBLE))
                       * (CAST(1.0 AS DOUBLE) / CAST(n_control AS DOUBLE)
                          + CAST(1.0 AS DOUBLE)
                              / CAST(n_treatment AS DOUBLE)))
                       > CAST(0.0 AS DOUBLE)
                   THEN
                   (CAST(conv_treatment AS DOUBLE)
                        / CAST(n_treatment AS DOUBLE)
                    - CAST(conv_control AS DOUBLE)
                        / CAST(n_control AS DOUBLE))
                   / sqrt(
                       (CAST(conv_control + conv_treatment AS DOUBLE)
                            / CAST(n_control + n_treatment AS DOUBLE))
                       * (CAST(1.0 AS DOUBLE)
                          - CAST(conv_control + conv_treatment AS DOUBLE)
                              / CAST(n_control + n_treatment AS DOUBLE))
                       * (CAST(1.0 AS DOUBLE) / CAST(n_control AS DOUBLE)
                          + CAST(1.0 AS DOUBLE)
                              / CAST(n_treatment AS DOUBLE)))
                   * CAST(1000000000.0 AS DOUBLE)
                   + CAST(0.5 AS DOUBLE)
                   END) AS BIGINT) AS z_nano
        FROM v
    """,
    doc=(
        "beyond-reference experimentation: A/B TEST READOUT - users "
        "deterministically bucketed 50/50 by md5-tail parity (the "
        "hash-assignment every experimentation platform uses; "
        "independent of id ranges), per-variant user/converter/revenue "
        "counts in one pass, and the two-proportion pooled z-statistic "
        "for the conversion-rate lift. Counts and cents stay BIGINT; "
        "the z value is emitted at fixed 1e-9 resolution (the same "
        "quantized-spec convention as price_quantity_correlation) so "
        "both engines agree bitwise. Scale: one partial-agg groupBy "
        "user_id, then a single-row total - no shuffle after the "
        "per-user rollup."
    ),
    tags=("agg",),
)
def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    variant = F.expr(
        "CASE WHEN ascii(substring(md5(CAST(user_id AS STRING)), 32, 1)) "
        "% 2 = 0 THEN 'control' ELSE 'treatment' END"
    )
    is_purchase = F.col("event_type") == "purchase"
    per_user = ev.groupBy("user_id", variant.alias("variant")).agg(
        F.max(F.when(is_purchase, 1).otherwise(0)).alias("converted"),
        F.coalesce(
            F.sum(F.when(is_purchase, _cents())), F.lit(0)
        ).alias("cents"),
    )

    def side(name: str, col: F.Column) -> F.Column:
        return F.sum(F.when(F.col("variant") == name, col).otherwise(0))

    v = per_user.agg(
        side("control", F.lit(1)).alias("n_control"),
        side("treatment", F.lit(1)).alias("n_treatment"),
        side("control", F.col("converted")).alias("conv_control"),
        side("treatment", F.col("converted")).alias("conv_treatment"),
        side("control", F.col("cents")).alias("cents_control"),
        side("treatment", F.col("cents")).alias("cents_treatment"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    rate_c = d("conv_control") / d("n_control")
    rate_t = d("conv_treatment") / d("n_treatment")
    pooled = (d("conv_control") + d("conv_treatment")) / (
        d("n_control") + d("n_treatment")
    )
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / d("n_control") + F.lit(1.0) / d("n_treatment"))
    )
    # zero conversions (or 100%) make the pooled SE 0: no defined z.
    # The CASE guard is mirrored in the oracle; ANSI mode would raise
    # on the bare division.
    z = F.when(se > F.lit(0.0), (rate_t - rate_c) / se)
    return v.select(
        "n_control",
        "n_treatment",
        "conv_control",
        "conv_treatment",
        "cents_control",
        "cents_treatment",
        rate_c.alias("rate_control"),
        rate_t.alias("rate_treatment"),
        F.floor(z * F.lit(1_000_000_000.0) + F.lit(0.5))
        .cast("long")
        .alias("z_nano"),
    )


@query(
    "suspect_bots",
    oracle="""
        WITH g AS (
            SELECT user_id, ts, event_id,
                   lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_ts
            FROM events
        ),
        per AS (
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT)
                       AS span_us,
                   CAST(min(epoch_us(ts) - epoch_us(prev_ts)) AS BIGINT)
                       AS min_gap_us
            FROM g GROUP BY 1
        )
        SELECT user_id, n_events, span_us, min_gap_us,
               (n_events >= 30 AND
                n_events * 3600000000 >= span_us * 100) AS high_rate,
               (min_gap_us IS NOT NULL AND min_gap_us < 1000000)
                   AS burst,
               ((n_events >= 30 AND
                 n_events * 3600000000 >= span_us * 100)
                OR (min_gap_us IS NOT NULL AND min_gap_us < 1000000))
                   AS is_suspect
        FROM per
    """,
    doc=(
        "beyond-reference abuse detection: BOT HEURISTICS - per-user "
        "event count, active-span and minimum inter-event gap (one "
        "lag window + one groupBy, both in the SAME user_id shuffle - "
        "Catalyst reuses the exchange), flagged on sustained rate "
        ">=100 events/hour or any sub-second burst. All comparisons "
        "are integer microsecond math: no float thresholds to "
        "diverge between engines. The per-user feature vector is "
        "what a downstream classifier would consume."
    ),
    tags=("window", "agg"),
)
def suspect_bots(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        "ts",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    )
    per = g.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "span_us"
        ),
        F.min("gap_us").alias("min_gap_us"),
    )
    high_rate = (F.col("n_events") >= 30) & (
        F.col("n_events") * F.lit(3_600_000_000)
        >= F.col("span_us") * F.lit(100)
    )
    burst = F.col("min_gap_us").isNotNull() & (
        F.col("min_gap_us") < 1_000_000
    )
    return per.select(
        "user_id",
        "n_events",
        "span_us",
        "min_gap_us",
        high_rate.alias("high_rate"),
        burst.alias("burst"),
        (high_rate | burst).alias("is_suspect"),
    )


@query(
    "top_events_per_type",
    oracle="""
        SELECT event_type, rnk, event_id, user_id, value
        FROM (
            SELECT event_type, event_id, user_id, value,
                   CAST(rank() OVER (
                       PARTITION BY event_type
                       ORDER BY value DESC, event_id ASC
                   ) AS INT) AS rnk
            FROM events
        )
        WHERE rnk <= 3
    """,
    doc=(
        "beyond-reference leaderboard: PER-GROUP TOP-K - the 3 "
        "highest-value events of each type, unique tie-break on "
        "event_id so the selected set is deterministic. Scale: Spark "
        "plans this as WindowGroupLimit (partial top-k BEFORE the "
        "shuffle, verified in tests/test_physical_design.py), so each "
        "map task ships at most k rows per group - the grouped "
        "analogue of top_orders' TakeOrderedAndProject."
    ),
    tags=("window",),
)
def top_events_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.select(
            "event_type",
            "event_id",
            "user_id",
            "value",
            F.rank().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .select("event_type", "rnk", "event_id", "user_id", "value")
    )


@query(
    "clickpath_trigrams",
    oracle="""
        WITH keyed AS (
            SELECT user_id, ts, event_id,
                   CAST(json_extract_string(props, '$.k') AS INTEGER)
                       AS page
            FROM events
        ),
        paths AS (
            SELECT page AS p1,
                   lead(page, 1) OVER w AS p2,
                   lead(page, 2) OVER w AS p3
            FROM keyed
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        counted AS (
            SELECT p1, p2, p3, CAST(count(*) AS BIGINT) AS n_paths
            FROM paths
            WHERE p2 IS NOT NULL AND p3 IS NOT NULL
            GROUP BY 1, 2, 3
        )
        SELECT p1, p2, p3, n_paths, rn FROM (
            SELECT *, CAST(row_number() OVER (
                ORDER BY n_paths DESC, p1, p2, p3) AS INT) AS rn
            FROM counted
        ) WHERE rn <= 20
    """,
    doc=(
        "beyond-reference sequence mining: TOP CLICKPATH TRIGRAMS - "
        "the 20 most frequent length-3 page sequences across user "
        "sessions (two leads in ONE user_id window pass, the "
        "path-analysis big brother of page_transitions' bigrams). "
        "Count groups are page-triple-bounded; the final top-20 is a "
        "TakeOrderedAndProject with a total-order tie-break so the "
        "selected set is deterministic."
    ),
    tags=("window", "graph"),
)
def clickpath_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    page = F.get_json_object("props", "$.k").cast("int")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select("user_id", "ts", "event_id", page.alias("p1"))
        .select(
            "p1",
            F.lead("p1", 1).over(w).alias("p2"),
            F.lead("p1", 2).over(w).alias("p3"),
        )
        .filter(F.col("p2").isNotNull() & F.col("p3").isNotNull())
    )
    counted = paths.groupBy("p1", "p2", "p3").agg(
        F.count("*").alias("n_paths")
    )
    # top-20 never global-sorts (TakeOrderedAndProject): the bare
    # ranking window shipped every distinct trigram to ONE reducer
    from ..operators.topk import ranked_topn

    return ranked_topn(
        counted,
        [F.col("n_paths").desc(), F.col("p1"), F.col("p2"), F.col("p3")],
        20,
    ).select("p1", "p2", "p3", "n_paths", "rn")


# drift math stays exact by clearing denominators: per-bin deviations
# are |c_w*N_0 - c_0*N_w| computed in DECIMAL (exact integers), summed
# exactly, with ONE final double division — no ln(), no float sums.
_DRIFT_SQL = """
    WITH bounds AS (
        SELECT min(value) AS lo, max(value) AS hi FROM events
    ),
    binned AS (
        SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
               least(CAST(floor((value - lo) / ((hi - lo) /
                   CAST(20.0 AS DOUBLE))) AS BIGINT), 19) AS bin
        FROM events, bounds
    ),
    counts AS (
        SELECT week, bin, CAST(count(*) AS BIGINT) AS c
        FROM binned GROUP BY 1, 2
    ),
    weeks AS (
        SELECT week, CAST(sum(c) AS BIGINT) AS n_week FROM counts
        GROUP BY 1
    ),
    base AS (
        SELECT bin, c AS c0 FROM counts
        WHERE week = (SELECT min(week) FROM weeks)
    ),
    n0 AS (
        SELECT n_week AS n_base FROM weeks
        WHERE week = (SELECT min(week) FROM weeks)
    ),
    grid AS (
        SELECT w.week, w.n_week, b.bin,
               coalesce(c.c, 0) AS c_w,
               coalesce(base.c0, 0) AS c_0
        FROM weeks w
        CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS bin) b
        LEFT JOIN counts c ON c.week = w.week AND c.bin = b.bin
        LEFT JOIN base ON base.bin = b.bin
    )
    SELECT week, n_week,
           CAST(CAST(sum(abs(
                    CAST(c_w AS DECIMAL(18,0)) * CAST(n_base AS DECIMAL(18,0))
                  - CAST(c_0 AS DECIMAL(18,0)) * CAST(n_week AS DECIMAL(18,0))
               )) AS DOUBLE)
               / CAST(CAST(2 AS DECIMAL(18,0))
                      * CAST(n_week AS DECIMAL(18,0))
                      * CAST(n_base AS DECIMAL(18,0)) AS DOUBLE)
               AS DOUBLE) AS tv_distance,
           CAST(CAST(max(abs(
                    CAST(c_w AS DECIMAL(18,0)) * CAST(n_base AS DECIMAL(18,0))
                  - CAST(c_0 AS DECIMAL(18,0)) * CAST(n_week AS DECIMAL(18,0))
               )) AS DOUBLE)
               / CAST(CAST(n_week AS DECIMAL(18,0))
                      * CAST(n_base AS DECIMAL(18,0)) AS DOUBLE)
               AS DOUBLE) AS max_bin_dev
    FROM grid, n0
    GROUP BY week, n_week, n_base
"""


def _drift_binned(ev: DataFrame) -> DataFrame:
    """(week, bin) spine of the drift monitor — 20 equal-width bins
    over the GLOBAL value range (in production the bin codebook is
    fixed once; here the bounds pass derives it from the corpus so
    the oracle can reproduce it)."""
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(20.0)
    return ev.crossJoin(F.broadcast(bounds)).select(
        F.to_date(F.date_trunc("week", F.col("ts"))).alias("week"),
        F.least(
            F.floor((F.col("value") - F.col("lo")) / width).cast("long"),
            F.lit(19).cast("long"),
        ).alias("bin"),
    )


def _drift_report(spark: SparkSession, counts: DataFrame) -> DataFrame:
    """Drift statistics from a (week, bin, c) count table — shared by
    the batch query and the streaming incremental fold (identical
    math, so both hit the same oracle)."""
    weeks = counts.groupBy("week").agg(F.sum("c").alias("n_week"))
    base_week = weeks.agg(F.min("week").alias("bw"))
    base = (
        counts.join(
            F.broadcast(base_week), F.col("week") == F.col("bw")
        ).select(F.col("bin"), F.col("c").alias("c0"))
    )
    n0 = (
        weeks.join(F.broadcast(base_week), F.col("week") == F.col("bw"))
        .select(F.col("n_week").alias("n_base"))
    )
    bins = spark.range(20).select(F.col("id").alias("bin"))
    grid = (
        weeks.crossJoin(F.broadcast(bins))
        .join(counts, ["week", "bin"], "left")
        .join(F.broadcast(base), "bin", "left")
        .select(
            "week",
            "n_week",
            "bin",
            F.coalesce("c", F.lit(0)).alias("c_w"),
            F.coalesce("c0", F.lit(0)).alias("c_0"),
        )
        .crossJoin(F.broadcast(n0))
    )
    dec = lambda c: F.col(c).cast("decimal(18,0)")  # noqa: E731
    dev = F.abs(dec("c_w") * dec("n_base") - dec("c_0") * dec("n_week"))
    return grid.groupBy("week", "n_week", F.col("n_base")).agg(
        (
            F.sum(dev).cast("double")
            / (F.lit(2).cast("decimal(18,0)") * dec("n_week") * dec("n_base"))
            .cast("double")
        ).alias("tv_distance"),
        (
            F.max(dev).cast("double")
            / (dec("n_week") * dec("n_base")).cast("double")
        ).alias("max_bin_dev"),
    ).drop("n_base").select("week", "n_week", "tv_distance", "max_bin_dev")


@query(
    "weekly_value_drift",
    oracle=_DRIFT_SQL,
    doc=(
        "beyond-reference data-quality monitoring: DISTRIBUTION DRIFT "
        "- each week's value distribution vs the first week's, as "
        "total-variation distance and max per-bin deviation over a "
        "20-bin equal-width histogram (the drift monitor a feature "
        "pipeline alarms on; TV instead of PSI because ln() is not "
        "bit-portable across engines - docstring convention of the LM "
        "scores). All deviations are exact DECIMAL integer products "
        "(denominators cleared), one double division at the end. "
        "Scale: one bounds row broadcast, one (week,bin) partial agg, "
        "then week-count-sized joins - nothing proportional to raw "
        "events after the first groupBy."
    ),
    tags=("agg", "window"),
)
def weekly_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = _drift_binned(ev).groupBy("week", "bin").agg(
        F.count("*").alias("c")
    )
    return _drift_report(spark, counts)


@query(
    "session_funnel_stats",
    oracle=f"""
        WITH o AS (
            SELECT user_id, ts, event_id, event_type, value,
                   lag(ts) OVER w AS prev
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        marked AS (
            SELECT *, CASE WHEN prev IS NULL
                                OR ts - prev > INTERVAL '30 minutes'
                           THEN 1 ELSE 0 END AS new_s
            FROM o
        ),
        sessions AS (
            SELECT *, sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM marked
        )
        SELECT user_id, CAST(sid AS BIGINT) AS sid,
               min(ts) AS session_start,
               CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT)
                   AS duration_us,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_views,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clicks,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases,
               CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                      THEN {_CENTS_SQL} END), 0) AS BIGINT)
                   AS revenue_cents,
               (sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0)
                   AS converted,
               (count(*) = 1) AS bounced
        FROM sessions
        GROUP BY 1, 2
    """,
    doc=(
        "beyond-reference sessionization: SESSION FEATURE TABLE - "
        "gaps-and-islands session assignment (30-min inactivity gap, "
        "lag + running sum in ONE user_id exchange) rolled up to the "
        "per-session feature vector session-based models consume: "
        "duration (integer microseconds), per-type event counts, "
        "exact cent revenue, converted/bounced flags. The relational "
        "twin of window_session's session_window view - this one "
        "keeps the session KEY so downstream joins can attach "
        "features; all outputs integer/boolean, no float drift."
    ),
    tags=("window", "agg", "temporal"),
)
def session_funnel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > 1800 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sessions = marked.withColumn(
        "sid",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    is_p = F.col("event_type") == "purchase"
    n_purch = F.sum(F.when(is_p, 1).otherwise(0))
    return sessions.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "n_views"
        ),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "n_clicks"
        ),
        n_purch.alias("n_purchases"),
        F.coalesce(F.sum(F.when(is_p, _cents())), F.lit(0)).alias(
            "revenue_cents"
        ),
        (n_purch > 0).alias("converted"),
        (F.count("*") == 1).alias("bounced"),
    )



@query(
    "weekly_value_drift_streamed",
    oracle=_DRIFT_SQL,
    doc=(
        "beyond-reference data-quality monitoring, STREAMING form: "
        "the (week, bin) histogram state folds incrementally per "
        "micro-batch (foreachBatch + the versioned replay-safe merge "
        "of operators/incremental.py - history never re-read, "
        "per-batch cost is delta-agg + state-sized merge), and the "
        "drained state feeds the SAME drift math as the batch query, "
        "hitting the same oracle bit-for-bit. What a production "
        "drift alarm actually runs: the monitor stays current "
        "without rescanning the corpus."
    ),
    tags=("streaming", "agg", "scale"),
)
def weekly_value_drift_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile

    from ..operators.incremental import fold_state_dir, read_state_dir

    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_drift_")
    src = os.path.join(work, "in")
    state_dir = os.path.join(work, "state")
    ev.repartition(6).write.mode("overwrite").parquet(src)
    # the bin codebook (global bounds) is fixed up front, as a real
    # monitor would fix it; the stream only folds counts
    b = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    row = b.collect()[0]
    lo, hi = float(row["lo"]), float(row["hi"])
    width = (hi - lo) / 20.0

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        binned = batch.select(
            F.to_date(F.date_trunc("week", F.col("ts"))).alias("week"),
            F.least(
                F.floor((F.col("value") - F.lit(lo)) / F.lit(width)).cast(
                    "long"
                ),
                F.lit(19).cast("long"),
            ).alias("bin"),
        )
        delta = binned.groupBy("week", "bin").agg(
            F.count("*").alias("n"),
            F.lit(0).cast("decimal(28,6)").alias("s"),
            F.lit(0.0).alias("mn"),
            F.lit(0.0).alias("mx"),
        )
        fold_state_dir(
            batch.sparkSession, state_dir, delta, batch_id, ["week", "bin"]
        )

    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(fold_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    counts = read_state_dir(spark, state_dir).select(
        "week", "bin", F.col("n").alias("c")
    )
    return _drift_report(spark, counts)


@query(
    "session_funnel_stats_streamed",
    oracle=f"""
        WITH o AS (
            SELECT user_id, ts, event_id, event_type, value,
                   lag(ts) OVER w AS prev
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        marked AS (
            SELECT *, CASE WHEN prev IS NULL
                                OR ts - prev > INTERVAL '30 minutes'
                           THEN 1 ELSE 0 END AS new_s
            FROM o
        ),
        sessions AS (
            SELECT *, sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM marked
        ),
        built AS (
            SELECT user_id,
                   min(ts) AS session_start,
                   max(ts) + INTERVAL 30 MINUTE AS session_end,
                   CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT)
                       AS duration_us,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_purchases,
                   CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                          THEN {_CENTS_SQL} END), 0)
                        AS BIGINT) AS revenue_cents
            FROM sessions
            GROUP BY user_id, sid
        ),
        wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS horizon FROM events)
        SELECT user_id, session_start, duration_us, n_events,
               n_purchases, revenue_cents,
               (n_purchases > 0) AS converted
        FROM built, wm
        WHERE session_end <= horizon
    """,
    doc=(
        "beyond-reference sessionization, STREAMING form: the session "
        "FEATURE TABLE built by session_window + state-store merge - "
        "per-session duration/counts/exact-cent revenue/conversion "
        "computed incrementally and emitted exactly once when the "
        "watermark finalizes the session (sessions spanning micro-"
        "batches are merged by state, which a batch gaps-and-islands "
        "pass cannot do incrementally). Emitted set == batch sessions "
        "finalized by the final watermark (same in-order-arrival "
        "device as window_session_append_streamed)."
    ),
    tags=("streaming", "window", "agg"),
)
def session_funnel_stats_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile
    import time as _time
    import uuid as _uuid

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_sfss_")
    src = os.path.join(work, "in")
    events.repartitionByRange(6, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(src)
    parts = sorted(f for f in os.listdir(src) if f.startswith("part-"))
    base = _time.time() - 10_000
    for k, f in enumerate(parts):
        os.utime(os.path.join(src, f), (base + 10 * k, base + 10 * k))

    is_p = F.col("event_type") == "purchase"
    n_purch = F.sum(F.when(is_p, 1).otherwise(0))
    agg = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "2 hours")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count("*").alias("n_events"),
            n_purch.alias("n_purchases"),
            F.coalesce(F.sum(F.when(is_p, _cents())), F.lit(0)).alias(
                "revenue_cents"
            ),
        )
    )
    name = f"sfss_{_uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "user_id",
        F.col("first_ts").alias("session_start"),
        (F.unix_micros("last_ts") - F.unix_micros("first_ts")).alias(
            "duration_us"
        ),
        "n_events",
        "n_purchases",
        "revenue_cents",
        (F.col("n_purchases") > 0).alias("converted"),
    )


@query(
    "suspect_bots_streamed",
    oracle="""
        WITH g AS (
            SELECT user_id, ts, event_id,
                   lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_ts
            FROM events
        ),
        per AS (
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT)
                       AS span_us,
                   CAST(min(epoch_us(ts) - epoch_us(prev_ts)) AS BIGINT)
                       AS min_gap_us
            FROM g GROUP BY 1
        )
        SELECT user_id, n_events, span_us, min_gap_us,
               (n_events >= 30 AND
                n_events * 3600000000 >= span_us * 100) AS high_rate,
               (min_gap_us IS NOT NULL AND min_gap_us < 1000000)
                   AS burst,
               ((n_events >= 30 AND
                 n_events * 3600000000 >= span_us * 100)
                OR (min_gap_us IS NOT NULL AND min_gap_us < 1000000))
                   AS is_suspect
        FROM per
    """,
    doc=(
        "beyond-reference abuse detection, STREAMING form: the "
        "per-user rate/gap feature vector maintained as O(1) custom "
        "state (applyInPandasWithState) - count/first/last/min-gap "
        "updated per micro-batch with the cross-batch bridge gap, "
        "correct under per-user in-order arrival (Kafka per-key "
        "ordering; the harness feeds time-ordered files). Converged "
        "state == the batch suspect_bots rollup, same oracle."
    ),
    tags=("streaming", "window", "agg"),
)
def suspect_bots_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import time as _time
    import uuid as _uuid

    from ..operators.upsert import latest_rows
    from ..streaming.stateful import bot_features_stream

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_bots_")
    src = os.path.join(work, "in")
    events.repartitionByRange(6, "ts").sortWithinPartitions(
        "ts", "event_id"
    ).write.mode("overwrite").parquet(src)
    parts = sorted(f for f in os.listdir(src) if f.startswith("part-"))
    base = _time.time() - 10_000
    for k, f in enumerate(parts):
        os.utime(os.path.join(src, f), (base + 10 * k, base + 10 * k))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"bots_{_uuid.uuid4().hex[:8]}"
    q = (
        bot_features_stream(stream)
        .writeStream.queryName(name)
        .format("memory")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = latest_rows(spark.table(name), ["user_id"], ["n_events"])
    high_rate = (F.col("n_events") >= 30) & (
        F.col("n_events") * F.lit(3_600_000_000)
        >= F.col("span_us") * F.lit(100)
    )
    burst = F.col("min_gap_us").isNotNull() & (
        F.col("min_gap_us") < 1_000_000
    )
    return final.select(
        "user_id",
        "n_events",
        "span_us",
        "min_gap_us",
        high_rate.alias("high_rate"),
        burst.alias("burst"),
        (high_rate | burst).alias("is_suspect"),
    )


@query(
    "user_status_scd2_streamed",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        changes AS (
            SELECT user_id, event_type AS status, ts, event_id
            FROM ordered
            WHERE prev_type IS NULL OR prev_type <> event_type
        )
        SELECT user_id, status,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               lead(ts) OVER w IS NULL AS is_current
        FROM changes
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc=(
        "beyond-reference warehouse modeling, STREAMING form: the "
        "SCD TYPE 2 history maintained INCREMENTALLY from the event "
        "stream (applyInPandasWithState folds status changes into "
        "validity intervals; closing a row and opening its successor "
        "is one state transition, no re-read of history). Converged "
        "intervals == the batch gaps-and-islands build, same oracle. "
        "The streaming form is what keeps a 100 TB dimension current "
        "without nightly full rebuilds."
    ),
    tags=("streaming", "window"),
)
def user_status_scd2_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile
    import time as _time
    import uuid as _uuid

    from pyspark.sql.window import Window as W

    from ..streaming.stateful import scd2_stream

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_scd2s_")
    src = os.path.join(work, "in")
    events.repartitionByRange(6, "ts").sortWithinPartitions(
        "ts", "event_id"
    ).write.mode("overwrite").parquet(src)
    parts = sorted(f for f in os.listdir(src) if f.startswith("part-"))
    base = _time.time() - 10_000
    for k, f in enumerate(parts):
        os.utime(os.path.join(src, f), (base + 10 * k, base + 10 * k))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"scd2s_{_uuid.uuid4().hex[:8]}"
    q = (
        scd2_stream(stream)
        .writeStream.queryName(name)
        .format("memory")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table(name)
    # each user's converged history is the emission set from their
    # final micro-batch (highest version)
    wmax = W.partitionBy("user_id")
    final = emitted.withColumn(
        "__vmax", F.max("version").over(wmax)
    ).filter(F.col("version") == F.col("__vmax"))
    return final.select(
        "user_id",
        "status",
        F.timestamp_micros(F.col("valid_from_us")).alias("valid_from"),
        F.when(
            F.col("valid_to_us") >= 0,
            F.timestamp_micros(F.col("valid_to_us")),
        ).alias("valid_to"),
        (F.col("valid_to_us") < 0).alias("is_current"),
    )


@query(
    "item_cooccurrence",
    oracle="""
        WITH ui AS (
            SELECT DISTINCT user_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS item
            FROM events
        ),
        capped AS (
            SELECT user_id, item
            FROM ui
            QUALIFY count(*) OVER (PARTITION BY user_id) <= 512
        ),
        pair AS (
            SELECT a.item AS item_a, b.item AS item_b,
                   CAST(count(*) AS BIGINT) AS n_ab
            FROM capped a
            JOIN capped b
              ON a.user_id = b.user_id AND a.item < b.item
            GROUP BY 1, 2
        ),
        deg AS (
            SELECT item, CAST(count(*) AS BIGINT) AS n
            FROM capped
            GROUP BY 1
        )
        SELECT item_a, item_b, n_ab,
               CAST(n_ab AS DOUBLE)
                   / sqrt(CAST(da.n * db.n AS DOUBLE)) AS cosine,
               CAST(n_ab AS DOUBLE)
                   / CAST(da.n + db.n - n_ab AS DOUBLE) AS jaccard
        FROM pair
        JOIN deg da ON da.item = item_a
        JOIN deg db ON db.item = item_b
        WHERE n_ab >= 3
    """,
    doc=(
        "extension (clickstream/recsys): item-item co-visitation "
        "similarity — the collaborative-filtering prep table (users "
        "as the join key, cosine = n_ab/sqrt(n_a*n_b) over binary "
        "interaction sets, plus Jaccard). Scale guard: per-user "
        "fan-out is QUADRATIC in a user's item count, so users above "
        "a 512-item cap are excluded before the self-join (heavy "
        "accounts are bots/crawlers and carry no preference signal — "
        "the standard co-visitation cap); on this corpus the cap "
        "excludes nobody, keeping the oracle exact. sqrt/division "
        "are IEEE-correctly-rounded, so doubles match DuckDB "
        "bit-for-bit. Min support n_ab >= 3 prunes noise pairs."
    ),
    tags=("join", "agg"),
)
def item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ui = events.select(
        "user_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("item"),
    ).distinct()
    w = Window.partitionBy("user_id")
    capped = (
        ui.withColumn("__n", F.count("*").over(w))
        .filter(F.col("__n") <= 512)
        .select("user_id", "item")
    )
    a = capped.select("user_id", F.col("item").alias("item_a"))
    b = capped.select("user_id", F.col("item").alias("item_b"))
    pair = (
        a.join(b, "user_id")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_ab"))
    )
    deg = capped.groupBy("item").agg(F.count("*").alias("n"))
    da = deg.select(F.col("item").alias("item_a"), F.col("n").alias("n_a"))
    db = deg.select(F.col("item").alias("item_b"), F.col("n").alias("n_b"))
    return (
        pair.join(da, "item_a")
        .join(db, "item_b")
        .filter(F.col("n_ab") >= 3)
        .select(
            "item_a",
            "item_b",
            "n_ab",
            (
                F.col("n_ab").cast("double")
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double"))
            ).alias("cosine"),
            (
                F.col("n_ab").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_ab")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Markov (removal-effect) attribution


def _markov_journeys(events: DataFrame) -> DataFrame:
    """Per-user journey rows truncated at the FIRST conversion
    ('purchase' -> absorbing state 'conv'), with a dense per-user
    order column ``rn``. One window pass over user_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.when(F.col("event_type") == "purchase", F.lit("conv"))
        .otherwise(F.col("event_type"))
        .alias("state"),
    )
    first_conv = (
        ordered.filter(F.col("state") == "conv")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    return ordered.join(first_conv, "user_id", "left").filter(
        F.col("prn").isNull() | (F.col("rn") <= F.col("prn"))
    )


def markov_transition_counts(events: DataFrame) -> DataFrame:
    """First-order transition-count matrix of user journeys:
    'start' -> first touch, touch -> next touch, touch -> 'conv'
    (first purchase) or -> 'null' (journey ends unconverted). The
    absorbing states emit no outgoing transitions. This is the
    distributed 99% of Markov attribution — everything after it is
    k x k driver math."""
    j = _markov_journeys(events)
    w = Window.partitionBy("user_id").orderBy("rn")
    starts = j.filter(F.col("rn") == 1).select(
        F.lit("start").alias("from_state"), F.col("state").alias("to_state")
    )
    steps = (
        j.withColumn(
            "to_state", F.coalesce(F.lead("state").over(w), F.lit("null"))
        )
        .filter(F.col("state") != "conv")
        .select(F.col("state").alias("from_state"), "to_state")
    )
    return (
        starts.unionByName(steps)
        .groupBy("from_state", "to_state")
        .agg(F.count("*").alias("n"))
    )


_MARKOV_TRANSITIONS_SQL = """
    WITH ordered AS (
        SELECT user_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               CASE WHEN event_type = 'purchase' THEN 'conv'
                    ELSE event_type END AS state
        FROM events
    ),
    first_conv AS (
        SELECT user_id, min(rn) AS prn FROM ordered
        WHERE state = 'conv' GROUP BY user_id
    ),
    j AS (
        SELECT o.* FROM ordered o
        LEFT JOIN first_conv fc USING (user_id)
        WHERE fc.prn IS NULL OR o.rn <= fc.prn
    ),
    steps AS (
        SELECT state AS from_state,
               coalesce(lead(state) OVER (PARTITION BY user_id
                                          ORDER BY rn), 'null') AS to_state
        FROM j
    ),
    allt AS (
        SELECT 'start' AS from_state, state AS to_state FROM j WHERE rn = 1
        UNION ALL
        SELECT from_state, to_state FROM steps WHERE from_state <> 'conv'
    )
    SELECT from_state, to_state, count(*) AS n
    FROM allt GROUP BY from_state, to_state
"""


@query(
    "markov_transitions",
    oracle=_MARKOV_TRANSITIONS_SQL,
    doc=(
        "extension (clickstream/attribution): the first-order Markov "
        "transition-count matrix of user journeys - 'start' -> first "
        "touch -> ... -> 'conv' (first purchase, absorbing) or "
        "'null' (unconverted end). ONE window pass partitioned by "
        "user_id builds every journey edge; the matrix is "
        "(channels+3)^2 rows regardless of corpus size. This is the "
        "distributed stage of Markov removal-effect attribution "
        "(markov_attribution solves the tiny chain); at 100 TB the "
        "per-user window is the same shuffle the session/funnel "
        "queries already pay, and the output is bytes."
    ),
    tags=("agg", "window"),
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return markov_transition_counts(load_table(spark, sf_dir, "events"))


def markov_removal_effects(counts) -> list[tuple[str, float, float]]:
    """Solve the absorbing chain for P(conv | start), then for each
    channel c the chain with c removed (transitions into c land in
    'null'); removal_effect(c) = 1 - P_removed(c)/P(conv). Driver-side
    k x k linear algebra on the collected count matrix (k = number of
    event types, single digits), the same bounded-collect pattern as
    ivf.py's centroids. Returns [(channel, removal_effect, share)]."""
    import numpy as np

    trans: dict[tuple[str, str], int] = {
        (r[0], r[1]): int(r[2]) for r in counts
    }
    channels = sorted(
        {s for s, _ in trans} | {t for _, t in trans} - {"conv", "null"}
    )
    channels = [c for c in channels if c not in ("start", "conv", "null")]

    def p_conv(removed: str | None) -> float:
        # restrict the system to states REACHABLE from start: journey
        # data always drains to conv/null, but arbitrary count
        # matrices can contain closed cycles among unreachable
        # states, which would make (I - Q) singular even though they
        # cannot affect P(conv | start)
        candidates = ["start"] + [c for c in channels if c != removed]
        adj = {
            f: [t for (ff, t), n in trans.items()
                if ff == f and n > 0 and t in candidates]
            for f in candidates
        }
        reach, frontier = {"start"}, ["start"]
        while frontier:
            nxt = []
            for f in frontier:
                for t in adj.get(f, []):
                    if t not in reach:
                        reach.add(t)
                        nxt.append(t)
            frontier = nxt
        states = [s for s in candidates if s in reach]
        idx = {s: i for i, s in enumerate(states)}
        k = len(states)
        q = np.zeros((k, k))
        r = np.zeros(k)
        for s in states:
            out = {t: n for (f, t), n in trans.items() if f == s}
            tot = sum(out.values())
            if not tot:
                continue
            for t, n in out.items():
                p = n / tot
                if t == "conv":
                    r[idx[s]] += p
                elif t == removed or t == "null":
                    pass  # removed channel/null absorb without converting
                elif t in idx:
                    q[idx[s], idx[t]] += p
        a = np.eye(k) - q
        try:
            t_vec = np.linalg.solve(a, r)
            if (t_vec < -1e-9).any() or (t_vec > 1 + 1e-9).any():
                raise np.linalg.LinAlgError("out-of-range solution")
        except np.linalg.LinAlgError:
            # reachable closed cycle (impossible for journey-derived
            # counts, possible for arbitrary input): the absorption
            # probability is the MINIMAL non-negative fixpoint, which
            # power iteration from zero converges to (trapped mass
            # correctly contributes nothing); lstsq would not
            t_vec = np.zeros(k)
            for _ in range(2000):
                t_vec = r + q @ t_vec
        return float(t_vec[idx["start"]])

    base = p_conv(None)
    effects = [(c, 1.0 - p_conv(c) / base) for c in channels]
    total = sum(e for _, e in effects)
    return [
        (c, e, (e / total if total else 0.0)) for c, e in effects
    ]


#: absorbing-chain iteration count: the journey chains' contraction
#: factor is the spectral radius of Q (measured ~0.78 on the harness
#: corpus), so 160 rounds leave < 1e-16 iteration tail — far inside
#: the 9-dp released rounding, and the FIXED count is what makes the
#: solve SQL-expressible (one CTE pair per round, page_rank style)
MARKOV_N_ITER = 160


def _dec18(x):
    """``x`` as DuckDB's CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18)):
    shortest-repr digits quantized HALF_UP at 1e-18, with the
    |x| < 1e-19 -> 0 guard both sides share (page_rank's pattern).
    Pure-Python twin — no JVM in this path, so repr(float) IS the
    string both engines see."""
    from decimal import ROUND_HALF_UP, Decimal

    if abs(x) < 1e-19:
        return Decimal(0)
    return Decimal(repr(float(x))).quantize(
        Decimal("1E-18"), rounding=ROUND_HALF_UP
    )


def _round9(x: float) -> float:
    """float -> 9-dp HALF_UP via the shortest repr — the exact twin of
    DuckDB's CAST(CAST(x AS VARCHAR) AS DECIMAL(38,9)) readout."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal("1E-9"), rounding=ROUND_HALF_UP
        )
    )


def markov_removal_effects_iter(
    counts, n_iter: int = MARKOV_N_ITER
) -> list[tuple[str, float, float]]:
    """Removal effects by FIXED-COUNT power iteration t = r + Q t from
    zero — the lane's defined semantics, bit-replayable in SQL: every
    per-state contribution sum is decimal(38,18)-exact (order-free,
    via :func:`_dec18`), each round ends with one correctly-rounded
    decimal->double conversion and one IEEE add, so any engine that
    unrolls the same rounds produces identical doubles. Converges to
    the true absorption probability (minimal non-negative fixpoint —
    reachability/closed-cycle handling is free: unreachable states
    never feed t[start], trapped mass contributes nothing), tail
    < rho^n_iter; parity with the np.linalg solve is pinned in
    pytest. Returns [(channel, effect, share)] rounded to 9 dp."""
    from decimal import Decimal, localcontext

    trans: dict[tuple[str, str], int] = {
        (r[0], r[1]): int(r[2]) for r in counts
    }
    channels = sorted(
        {s for s, _ in trans} | {t for _, t in trans} - {"conv", "null"}
    )
    channels = [c for c in channels if c not in ("start", "conv", "null")]
    tot = {}
    for (f, _t), n in trans.items():
        tot[f] = tot.get(f, 0) + n

    def p_conv(removed: str | None) -> float:
        states = ["start"] + [c for c in channels if c != removed]
        sset = set(states)
        q = {
            (f, t): n / tot[f]
            for (f, t), n in trans.items()
            if f in sset and t in sset and t != removed
        }
        r = {
            s: (
                trans[(s, "conv")] / tot[s]
                if (s, "conv") in trans
                else 0.0
            )
            for s in states
        }
        t_old = {s: 0.0 for s in states}
        with localcontext() as ctx:
            ctx.prec = 60
            for _ in range(n_iter):
                t_new = {}
                for s in states:
                    acc = Decimal(0)
                    for t2 in states:
                        qv = q.get((s, t2))
                        if qv is not None:
                            acc += _dec18(qv * t_old[t2])
                    t_new[s] = r[s] + float(acc)
                t_old = t_new
        return t_old["start"]

    base = p_conv(None)
    effects = [(c, 1.0 - p_conv(c) / base) for c in channels]
    with localcontext() as ctx:
        ctx.prec = 60
        total = float(sum(_dec18(e) for _, e in effects))
    return [
        (c, _round9(e), _round9(e / total if total else 0.0))
        for c, e in effects
    ]


def _markov_attribution_oracle(n_iter: int = MARKOV_N_ITER) -> str:
    """Unrolled-iteration SQL twin of ``markov_removal_effects_iter``
    (the page_rank precedent): ALL removal variants iterate together
    keyed by (removed, state), so the CTE count is 2 per round
    regardless of channel count; decimal sums are string-mediated for
    bit parity with Python's repr-based quantize."""
    head = f"""
        WITH tc AS MATERIALIZED ({_MARKOV_TRANSITIONS_SQL}),
        chan AS (
            SELECT from_state AS c FROM tc
            WHERE from_state NOT IN ('start', 'conv', 'null')
            UNION
            SELECT to_state FROM tc
            WHERE to_state NOT IN ('start', 'conv', 'null')
        ),
        var AS (
            SELECT '__none__' AS removed
            UNION ALL SELECT c FROM chan
        ),
        sts AS (SELECT 'start' AS state UNION ALL SELECT c FROM chan),
        states AS MATERIALIZED (
            SELECT v.removed, s.state
            FROM var v JOIN sts s
              ON s.state = 'start' OR s.state <> v.removed
        ),
        tots AS MATERIALIZED (
            SELECT from_state AS s, sum(n) AS tot FROM tc GROUP BY 1
        ),
        qe AS MATERIALIZED (
            SELECT sf.removed, e.from_state AS s, e.to_state AS t,
                   CAST(e.n AS DOUBLE) / CAST(o.tot AS DOUBLE) AS q
            FROM tc e
            JOIN tots o ON o.s = e.from_state
            JOIN states sf
              ON sf.state = e.from_state
            JOIN states st
              ON st.removed = sf.removed AND st.state = e.to_state
        ),
        rv AS MATERIALIZED (
            SELECT sf.removed, sf.state AS s,
                   coalesce(CAST(e.n AS DOUBLE) / CAST(o.tot AS DOUBLE),
                            0.0e0) AS r
            FROM states sf
            LEFT JOIN tc e
              ON e.from_state = sf.state AND e.to_state = 'conv'
            LEFT JOIN tots o ON o.s = sf.state
        ),
        t0 AS (SELECT removed, state AS s, 0.0e0 AS t FROM states)"""
    its = []
    for k in range(1, n_iter + 1):
        its.append(f""",
        s{k} AS MATERIALIZED (
            SELECT q.removed, q.s,
                   CAST(CAST(sum(
                       CASE WHEN abs(q.q * p.t) < 1e-19
                            THEN CAST(0 AS DECIMAL(38,18))
                            ELSE CAST(CAST(q.q * p.t AS VARCHAR)
                                      AS DECIMAL(38,18)) END
                   ) AS VARCHAR) AS DOUBLE) AS in_sum
            FROM qe q JOIN t{k - 1} p
              ON p.removed = q.removed AND p.s = q.t
            GROUP BY q.removed, q.s
        ),
        t{k} AS MATERIALIZED (
            SELECT rv.removed, rv.s,
                   rv.r + coalesce(s{k}.in_sum, 0.0e0) AS t
            FROM rv LEFT JOIN s{k}
              ON s{k}.removed = rv.removed AND s{k}.s = rv.s
        )"""
        )
    tail = f""",
        base AS (
            SELECT t FROM t{n_iter}
            WHERE removed = '__none__' AND s = 'start'
        ),
        eff AS (
            SELECT c.c AS channel,
                   1.0e0 - (t.t / (SELECT t FROM base)) AS e
            FROM chan c
            JOIN t{n_iter} t ON t.removed = c.c AND t.s = 'start'
        ),
        totef AS (
            SELECT CAST(CAST(sum(
                       CASE WHEN abs(e) < 1e-19
                            THEN CAST(0 AS DECIMAL(38,18))
                            ELSE CAST(CAST(e AS VARCHAR)
                                      AS DECIMAL(38,18)) END
                   ) AS VARCHAR) AS DOUBLE) AS tot
            FROM eff
        )
        SELECT channel,
               CAST(CAST(CAST(CAST(e AS VARCHAR) AS DECIMAL(38,9))
                    AS VARCHAR) AS DOUBLE) AS removal_effect,
               CAST(CAST(CAST(CAST(
                        CASE WHEN (SELECT tot FROM totef) <> 0.0e0
                             THEN e / (SELECT tot FROM totef)
                             ELSE 0.0e0 END
                    AS VARCHAR) AS DECIMAL(38,9))
                    AS VARCHAR) AS DOUBLE) AS share
        FROM eff
        ORDER BY channel
    """
    return head + "".join(its) + tail


@query(
    "markov_attribution",
    oracle=_markov_attribution_oracle(),
    doc=(
        "extension (clickstream/attribution): Markov REMOVAL-EFFECT "
        "attribution - the data-driven multi-touch model (Anderl et "
        "al.): P(conversion) of the journey chain is solved with and "
        "without each channel; a channel's credit is the normalized "
        "drop. Complements linear_attribution (positional). The "
        "corpus-scale work is markov_transitions (oracled); the solve "
        "is (channels+1)^2 driver math on the collected count matrix "
        "- bounded by the event-type vocabulary, never the data — as "
        "a FIXED-160-round power iteration with decimal-exact "
        "contribution sums, which the oracle unrolls CTE-per-round "
        "(page_rank precedent), putting even the solve under the "
        "value-hash gate; closeness to the np.linalg solve is pinned "
        "in pytest."
    ),
    tags=("agg",),
)
def markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = markov_transition_counts(
        load_table(spark, sf_dir, "events")
    ).collect()
    rows = markov_removal_effects_iter(counts)
    out = spark.createDataFrame(
        rows, "channel string, removal_effect double, share double"
    )
    return out.orderBy("channel")


@query(
    "cep_funnel_regex",
    oracle="""
        WITH j AS (
            SELECT user_id,
                   string_agg(CASE event_type
                                  WHEN 'view' THEN 'v'
                                  WHEN 'click' THEN 'c'
                                  WHEN 'purchase' THEN 'p'
                                  WHEN 'signup' THEN 's'
                                  ELSE 'e' END,
                              '' ORDER BY ts, event_id) AS journey
            FROM events
            GROUP BY user_id
        )
        SELECT user_id,
               CAST(length(journey) AS INT) AS n_events,
               CAST(len(regexp_extract_all(journey, 'vc*p')) AS INT)
                   AS n_funnel_matches
        FROM j
    """,
    doc=(
        "extension (clickstream/CEP): complex-event-processing "
        "pattern match - the MATCH_RECOGNIZE / Flink-CEP analogue. "
        "Each user's journey collapses to an ordered symbol string "
        "(one char per event) and the funnel pattern is a REGEX "
        "('vc*p': view, any clicks, purchase) counted per user with "
        "leftmost non-overlapping semantics - identical in Spark's "
        "java.util.regex and DuckDB's RE2 for this pattern class "
        "(no backtracking constructs). Declarative sequence patterns "
        "beat hand-rolled window chains once the pattern grows "
        "(funnel_steps covers the fixed 3-step case). Scale: ONE "
        "groupBy(user_id) with an ordered in-group fold; journey "
        "length is bounded by per-user activity, and the regex runs "
        "per user row in codegen, not per event."
    ),
    tags=("agg", "window", "bench"),
)
def cep_funnel_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    initial = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    j = (
        events.select(
            "user_id", F.struct("ts", "event_id", initial.alias("sym"))
            .alias("ev")
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("ev")),
                    lambda e: e["sym"],
                ),
                "",
            ).alias("journey")
        )
    )
    return j.select(
        "user_id",
        F.length("journey").cast("int").alias("n_events"),
        F.size(F.regexp_extract_all("journey", F.lit("vc*p"), 0))
        .cast("int")
        .alias("n_funnel_matches"),
    )


@query(
    "cep_funnel_regex_streamed",
    # same oracle as cep_funnel_regex: streamed journey accumulation,
    # drained and pattern-counted, must equal the batch CEP result
    oracle="""
        WITH j AS (
            SELECT user_id,
                   string_agg(CASE event_type
                                  WHEN 'view' THEN 'v'
                                  WHEN 'click' THEN 'c'
                                  WHEN 'purchase' THEN 'p'
                                  WHEN 'signup' THEN 's'
                                  ELSE 'e' END,
                              '' ORDER BY ts, event_id) AS journey
            FROM events
            GROUP BY user_id
        )
        SELECT user_id,
               CAST(length(journey) AS INT) AS n_events,
               CAST(len(regexp_extract_all(journey, 'vc*p')) AS INT)
                   AS n_funnel_matches
        FROM j
    """,
    doc=(
        "extension (clickstream/CEP, STREAMING): per-user journey "
        "strings assembled across micro-batches with "
        "applyInPandasWithState (in-order per-user arrival, the "
        "_bot_update contract); the drained converged state is "
        "pattern-counted with the same regex as the batch twin and "
        "must match it exactly. The Flink-CEP-shaped deployment: "
        "accumulate sequence state per key on the stream, evaluate "
        "patterns on emit. Production bounds journey state with "
        "session windows or a length cap; the harness corpus is "
        "per-user bounded already."
    ),
    tags=("streaming", "agg"),
)
def cep_funnel_regex_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import time as _time
    import uuid as _uuid

    from ..operators.upsert import latest_rows
    from ..streaming.stateful import cep_journey_stream

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_cep_")
    src = os.path.join(work, "in")
    events.repartitionByRange(6, "ts").sortWithinPartitions(
        "ts", "event_id"
    ).write.mode("overwrite").parquet(src)
    parts = sorted(f for f in os.listdir(src) if f.startswith("part-"))
    base = _time.time() - 10_000
    for k, f in enumerate(parts):
        os.utime(os.path.join(src, f), (base + 10 * k, base + 10 * k))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"cep_{_uuid.uuid4().hex[:8]}"
    q = (
        cep_journey_stream(stream)
        .writeStream.queryName(name)
        .format("memory")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = latest_rows(spark.table(name), ["user_id"], ["n_events"])
    return final.select(
        "user_id",
        F.col("n_events").cast("int").alias("n_events"),
        F.size(F.regexp_extract_all("journey", F.lit("vc*p"), 0))
        .cast("int")
        .alias("n_funnel_matches"),
    )


@query(
    "user_recommendations",
    oracle="""
        WITH ui AS (
            SELECT DISTINCT user_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS item
            FROM events
        ),
        pair AS (
            SELECT a.item AS item_a, b.item AS item_b,
                   CAST(count(*) AS BIGINT) AS n_ab
            FROM ui a
            JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
            GROUP BY 1, 2
            HAVING count(*) >= 3
        ),
        sym AS (
            SELECT item_a AS item, item_b AS rec, n_ab FROM pair
            UNION ALL
            SELECT item_b, item_a, n_ab FROM pair
        ),
        scored AS (
            SELECT ui.user_id, sym.rec,
                   CAST(SUM(sym.n_ab) AS BIGINT) AS score
            FROM ui JOIN sym ON sym.item = ui.item
            GROUP BY 1, 2
        ),
        unseen AS (
            SELECT s.user_id, s.rec, s.score
            FROM scored s
            LEFT JOIN ui seen
              ON seen.user_id = s.user_id AND seen.item = s.rec
            WHERE seen.item IS NULL
        )
        SELECT user_id, rec, score, rank FROM (
            SELECT user_id, rec, score,
                   CAST(row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY score DESC, rec ASC
                   ) AS INT) AS rank
            FROM unseen
        ) WHERE rank <= 3
    """,
    doc=(
        "extension (clickstream/recsys): per-user TOP-3 "
        "RECOMMENDATIONS from item-item co-visitation - candidate "
        "items' pair counts (support >= 3) summed over the user's "
        "history, already-seen items anti-joined out, integer scores "
        "with deterministic ties. The serving-table capstone on "
        "item_cooccurrence (same pair build). Scale: history x "
        "similar-items fan-out is bounded by (per-user items) x "
        "(pairs per item, support-pruned); the per-user top-3 plans "
        "as WindowGroupLimit (partial top-k below the shuffle), "
        "never a global sort."
    ),
    tags=("join", "agg", "window"),
)
def user_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ui = events.select(
        "user_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("item"),
    ).distinct()
    a = ui.select("user_id", F.col("item").alias("item_a"))
    b = ui.select("user_id", F.col("item").alias("item_b"))
    pair = (
        a.join(b, "user_id")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    sym = pair.select(
        F.col("item_a").alias("item"), F.col("item_b").alias("rec"), "n_ab"
    ).unionByName(
        pair.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("rec"),
            "n_ab",
        )
    )
    scored = (
        ui.join(sym, "item")
        .groupBy("user_id", "rec")
        .agg(F.sum("n_ab").alias("score"))
    )
    seen = ui.select("user_id", F.col("item").alias("rec"))
    unseen = scored.join(seen, ["user_id", "rec"], "left_anti")
    w = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), F.col("rec").asc()
    )
    return (
        unseen.select(
            "user_id",
            "rec",
            "score",
            F.row_number().over(w).cast("int").alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )


@query(
    "revenue_concentration",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   SUM(CAST(round(value * 100) AS BIGINT)) AS cents
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY user_id
        ),
        ranked AS (
            SELECT cents,
                   CAST(row_number() OVER (ORDER BY cents ASC, user_id ASC)
                        AS BIGINT) AS i,
                   CAST(count(*) OVER () AS BIGINT) AS n
            FROM per_user
        )
        SELECT max(n) AS n_users,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               (CAST(2 * SUM(i * cents) AS DOUBLE)
                / (CAST(max(n) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE))
                - CAST(max(n) + 1 AS DOUBLE) / CAST(max(n) AS DOUBLE))
                   AS gini,
               (CAST(SUM(CASE WHEN i > n - n // 10 THEN cents ELSE 0 END)
                     AS DOUBLE)
                / CAST(SUM(cents) AS DOUBLE)) AS top_decile_share
        FROM ranked
    """,
    doc=(
        "extension (clickstream/KPI): revenue CONCENTRATION - the "
        "Gini coefficient and top-decile share of per-user purchase "
        "revenue (the Lorenz-curve 'whales' readout every "
        "monetization review asks for). Exactness: cent-space bigint "
        "sums, the rank-weighted sum SUM(i*cents) is exact integer "
        "arithmetic, and only the final gini/share divisions are "
        "IEEE - bit-identical cross-engine with deterministic "
        "(cents, user_id) tie-break. Scale: one groupBy, then the "
        "global rank over the USER dimension comes from the "
        "TWO-PHASE distributed prefix sum (operators/prefix.py: "
        "range repartition + zero-shuffle local scan + partition-"
        "count offset frame) — the user dimension is NOT bounded at "
        "100 TB, so no ORDER-BY-only window / Exchange "
        "SinglePartition touches it; n rides a 1-row broadcast."
    ),
    tags=("agg", "window"),
)
def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import partitioned_prefix_sum

    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(_cents()).alias("cents"))
    )
    counted = per_user.agg(F.count("*").cast("long").alias("n"))
    ranked = partitioned_prefix_sum(
        per_user.withColumn("__one", F.lit(1).cast("long")),
        ["cents", "user_id"],
        "__one",
        "i",
    ).join(F.broadcast(counted)).select("cents", "i", "n")
    n = F.max("n")
    tot = F.sum("cents")
    iw = F.sum(F.col("i") * F.col("cents"))
    top = F.sum(
        F.when(
            F.col("i") > F.col("n") - (F.col("n") / 10).cast("long"),
            F.col("cents"),
        ).otherwise(F.lit(0))
    )
    return ranked.agg(
        n.alias("n_users"),
        tot.alias("total_cents"),
        (
            (F.lit(2) * iw).cast("double")
            / (n.cast("double") * tot.cast("double"))
            - (n + F.lit(1)).cast("double") / n.cast("double")
        ).alias("gini"),
        (top.cast("double") / tot.cast("double")).alias(
            "top_decile_share"
        ),
    )


@query(
    "item_cooccurrence_streamed",
    # oracle = the batch pair build over ALL events: incremental
    # maintenance must converge to exactly the from-scratch counts
    oracle="""
        WITH ui AS (
            SELECT DISTINCT user_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS item
            FROM events
        )
        SELECT a.item AS item_a, b.item AS item_b,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM ui a
        JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
        GROUP BY 1, 2
        HAVING count(*) >= 3
    """,
    doc=(
        "extension (clickstream/recsys, STREAMING): INCREMENTAL "
        "co-visitation maintenance - each micro-batch's genuinely-new "
        "(user, item) interactions (batch-distinct, anti-joined "
        "against the accumulated interaction store) generate exactly "
        "the DELTA pairs (new x prior same-user, plus new x new), "
        "folded into the versioned replay-safe pair-count state; the "
        "historical pair table is never rebuilt. Converged counts "
        "must equal the from-scratch batch build bit-for-bit. Scale: "
        "per-batch cost is (batch items) x (that user's stored "
        "items), the true delta work - at 100 TB this is how the "
        "serving pair table stays minutes-fresh without nightly "
        "recomputes."
    ),
    tags=("streaming", "join", "agg"),
)
def item_cooccurrence_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile

    from ..operators.incremental import fold_state_dir, read_state_dir

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_covis_")
    src = os.path.join(work, "in")
    ui_store = os.path.join(work, "ui")
    pair_state = os.path.join(work, "pairs")
    events.repartition(6).write.mode("overwrite").parquet(src)

    def prior_ui(bid: int):
        if not os.path.isdir(ui_store):
            return None
        parts = [
            os.path.join(ui_store, d)
            for d in os.listdir(ui_store)
            if d.startswith("b") and d != f"b{bid}"
        ]
        return spark.read.parquet(*parts) if parts else None

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        batch_ui = batch.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("item"),
        ).distinct()
        prior = prior_ui(batch_id)
        new_ui = (
            batch_ui.join(prior, ["user_id", "item"], "left_anti")
            if prior is not None
            else batch_ui
        ).localCheckpoint(eager=True)

        within = (
            new_ui.alias("a")
            .join(new_ui.alias("b"), "user_id")
            .filter(F.col("a.item") < F.col("b.item"))
            .select(
                F.col("a.item").alias("item_a"),
                F.col("b.item").alias("item_b"),
            )
        )
        if prior is not None:
            cross = (
                new_ui.alias("n")
                .join(prior.alias("p"), "user_id")
                .select(
                    F.least("n.item", "p.item").alias("item_a"),
                    F.greatest("n.item", "p.item").alias("item_b"),
                )
            )
            all_pairs = within.unionByName(cross)
        else:
            all_pairs = within
        delta = (
            all_pairs.groupBy("item_a", "item_b")
            .agg(F.count("*").alias("n"))
            .select(
                "item_a",
                "item_b",
                "n",
                F.lit(0).cast("decimal(28,6)").alias("s"),
                F.lit(0.0).alias("mn"),
                F.lit(0.0).alias("mx"),
            )
        )
        fold_state_dir(s, pair_state, delta, batch_id, ["item_a", "item_b"])
        new_ui.write.mode("overwrite").parquet(
            os.path.join(ui_store, f"b{batch_id}")
        )

    q = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(fold_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        read_state_dir(spark, pair_state)
        .filter(F.col("n") >= 3)
        .select("item_a", "item_b", F.col("n").alias("n_ab"))
    )


@query(
    "markov_transitions_streamed",
    # same oracle as markov_transitions: journey state accumulated on
    # the stream, transition edges derived from the drained strings
    oracle=_MARKOV_TRANSITIONS_SQL,
    doc=(
        "extension (clickstream/attribution, STREAMING): the Markov "
        "transition matrix maintained on a stream - per-user journey "
        "symbol strings accumulate via applyInPandasWithState (the "
        "CEP state, one state row per user), and the drained strings "
        "expand to first-touch/step/absorbing edges with pure "
        "expressions (truncate at first conversion, pair adjacent "
        "symbols, terminal null). Must equal the batch window-pass "
        "matrix exactly. Scale: state is one string per user; the "
        "edge expansion runs on the user dimension, never the event "
        "stream - the always-fresh attribution feed."
    ),
    tags=("streaming", "agg"),
)
def markov_transitions_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile
    import time as _time
    import uuid as _uuid

    from ..operators.upsert import latest_rows
    from ..streaming.stateful import cep_journey_stream

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_mkv_")
    src = os.path.join(work, "in")
    events.repartitionByRange(6, "ts").sortWithinPartitions(
        "ts", "event_id"
    ).write.mode("overwrite").parquet(src)
    parts = sorted(f for f in os.listdir(src) if f.startswith("part-"))
    base = _time.time() - 10_000
    for k, f in enumerate(parts):
        os.utime(os.path.join(src, f), (base + 10 * k, base + 10 * k))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"mkv_{_uuid.uuid4().hex[:8]}"
    q = (
        cep_journey_stream(stream)
        .writeStream.queryName(name)
        .format("memory")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = latest_rows(spark.table(name), ["user_id"], ["n_events"])

    sym_to_state = F.create_map(
        F.lit("v"), F.lit("view"),
        F.lit("c"), F.lit("click"),
        F.lit("p"), F.lit("conv"),
        F.lit("s"), F.lit("signup"),
        F.lit("e"), F.lit("error"),
    )
    # truncate at the first conversion (inclusive); unconverted
    # journeys get the explicit terminal 'null'
    upto = F.when(
        F.instr("journey", "p") > 0,
        F.substring("journey", 1, F.instr("journey", "p")),
    ).otherwise(F.col("journey"))
    syms = F.split(upto, "")
    j = final.select(
        F.col("user_id"),
        F.filter(syms, lambda c: c != "").alias("syms"),
        (F.instr("journey", "p") > 0).alias("converted"),
    )
    starts = j.select(
        F.lit("start").alias("from_state"),
        sym_to_state[F.col("syms")[0]].alias("to_state"),
    )
    steps = (
        j.select(
            F.posexplode("syms").alias("pos", "sym"),
            F.col("syms"),
            F.col("converted"),
        )
        .filter(F.col("sym") != "p")
        .select(
            sym_to_state[F.col("sym")].alias("from_state"),
            F.coalesce(
                sym_to_state[F.col("syms")[F.col("pos") + 1]],
                F.lit("null"),
            ).alias("to_state"),
        )
    )
    return (
        starts.unionByName(steps)
        .groupBy("from_state", "to_state")
        .agg(F.count("*").alias("n"))
    )


@query(
    "rfm_features",
    oracle="""
        WITH mx AS (SELECT max(ts) AS now FROM events),
        per_user AS (
            SELECT user_id,
                   CAST(date_diff('day', max(ts), (SELECT now FROM mx))
                        AS BIGINT) AS recency_days,
                   CAST(count(*) AS BIGINT) AS frequency,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS monetary_cents
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY user_id
        )
        SELECT user_id, recency_days, frequency, monetary_cents,
               CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id)
                    AS INT) AS r_score,
               CAST(ntile(5) OVER (ORDER BY frequency ASC, user_id)
                    AS INT) AS f_score,
               CAST(ntile(5) OVER (ORDER BY monetary_cents ASC, user_id)
                    AS INT) AS m_score
        FROM per_user
    """,
    doc=(
        "extension (clickstream/ML features): RFM - recency/"
        "frequency/monetary per purchasing user plus 1-5 quintile "
        "scores (higher = better: least-recent ranks first so "
        "ntile 5 = freshest), the canonical churn/LTV feature "
        "block and segmentation input. Exact integer days/counts/"
        "cents; quintile buckets use explicit user_id tie-breaks so "
        "both engines bucket identically. Scale: one filtered "
        "partial-agg pass over events; the user dimension is "
        "unbounded at 100 TB, so each quintile score comes from a "
        "TWO-PHASE distributed prefix-sum rank + the exact ntile "
        "reconstruction (operators/prefix.py) — three parallel "
        "range shuffles of the user frame, no ORDER-BY-only window."
    ),
    tags=("agg", "window"),
)
def rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import ntile_from_rank, partitioned_prefix_sum

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    now = purchases.agg(F.max("ts").alias("now"))
    per_user = (
        purchases.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("frequency"),
            F.sum(_cents()).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(now))
        .select(
            "user_id",
            F.datediff(F.to_date("now"), F.to_date("last_ts"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    counted = per_user.agg(F.count("*").cast("long").alias("n"))
    # one prefix-sum rank per RFM axis (recency: least-recent first,
    # so ntile 5 = freshest — the negated-days ascending order)
    ranked = per_user.withColumn("__one", F.lit(1).cast("long"))
    for key, rank_col in [
        (-F.col("recency_days"), "__rr"),
        (F.col("frequency"), "__rf"),
        (F.col("monetary_cents"), "__rm"),
    ]:
        ranked = partitioned_prefix_sum(
            ranked.withColumn("__key", key),
            ["__key", "user_id"],
            "__one",
            rank_col,
        ).drop("__key")
    return (
        ranked.join(F.broadcast(counted))
        .select(
            "user_id",
            "recency_days",
            "frequency",
            "monetary_cents",
            ntile_from_rank("__rr", "n", 5).alias("r_score"),
            ntile_from_rank("__rf", "n", 5).alias("f_score"),
            ntile_from_rank("__rm", "n", 5).alias("m_score"),
        )
    )


@query(
    "item_decay_popularity",
    oracle="""
        WITH mx AS (SELECT CAST(date_trunc('day', max(ts)) AS DATE)
                        AS now FROM events),
        k AS (
            SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS item,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   date_diff('day', CAST(date_trunc('day', ts) AS DATE),
                             (SELECT now FROM mx)) // 7 AS hl
            FROM events WHERE event_type = 'purchase'
        ),
        b AS (SELECT max(hl) AS maxhl FROM k)
        SELECT item,
               CAST(SUM(cents * (1::BIGINT << (maxhl - hl))) AS BIGINT)
                   AS weighted_num,
               CAST((SELECT 1::BIGINT << maxhl FROM b) AS BIGINT)
                   AS weight_den,
               (CAST(SUM(cents * (1::BIGINT << (maxhl - hl))) AS DOUBLE)
                / CAST((SELECT 1::BIGINT << maxhl FROM b) AS DOUBLE))
                   AS decayed_cents
        FROM k, b
        GROUP BY item, maxhl
    """,
    doc=(
        "extension (clickstream/recsys): TIME-DECAYED item "
        "popularity - purchase revenue weighted by 2^-(age_weeks), "
        "the freshness-aware ranking signal (recent demand beats "
        "stale volume; exponential decay with a one-week half-life). "
        "Exactness trick: the decay weights are dyadic rationals, so "
        "scaling every term by 2^max_halflives turns the weighted "
        "sum into EXACT bigint arithmetic (cents << k), with one "
        "final IEEE division - no pow(), no libm, fully "
        "hash-oracled. Scale: one filtered scan + one groupBy; the "
        "max-halflife scalar broadcasts."
    ),
    tags=("agg",),
)
def item_decay_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase")
    now = p.agg(
        F.to_date(F.date_trunc("day", F.max("ts"))).alias("now")
    )
    k = p.crossJoin(F.broadcast(now)).select(
        F.get_json_object("props", "$.k").cast("bigint").alias("item"),
        _cents().alias("cents"),
        (
            F.datediff(
                F.col("now"), F.to_date(F.date_trunc("day", "ts"))
            )
            / 7
        )
        .cast("long")
        .alias("hl"),
    )
    b = k.agg(F.max("hl").alias("maxhl"))
    return (
        k.crossJoin(F.broadcast(b))
        .groupBy("item", "maxhl")
        .agg(
            F.sum(
                F.col("cents")
                * F.expr("shiftleft(1L, CAST(maxhl - hl AS INT))")
            ).alias("weighted_num")
        )
        .select(
            "item",
            "weighted_num",
            F.expr("shiftleft(1L, CAST(maxhl AS INT))").alias(
                "weight_den"
            ),
            F.expr(
                "CAST(weighted_num AS DOUBLE)"
                " / CAST(shiftleft(1L, CAST(maxhl AS INT)) AS DOUBLE)"
            ).alias("decayed_cents"),
        )
    )


@query(
    "ltv_curve",
    oracle="""
        WITH first_seen AS (
            SELECT user_id,
                   CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
            FROM events GROUP BY user_id
        ),
        cohort_size AS (
            SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
            FROM first_seen GROUP BY cohort
        ),
        rev AS (
            SELECT f.cohort,
                   CAST(date_diff('week',
                        f.cohort,
                        CAST(date_trunc('week', e.ts) AS DATE))
                        AS BIGINT) AS age_week,
                   SUM(CAST(round(e.value * 100) AS BIGINT)) AS cents
            FROM events e
            JOIN first_seen f ON f.user_id = e.user_id
            WHERE e.event_type = 'purchase'
            GROUP BY 1, 2
        )
        SELECT r.cohort, r.age_week, cs.n_users,
               CAST(SUM(r.cents) OVER (PARTITION BY r.cohort
                                       ORDER BY r.age_week)
                    AS BIGINT) AS cum_cents,
               (CAST(SUM(r.cents) OVER (PARTITION BY r.cohort
                                        ORDER BY r.age_week) AS DOUBLE)
                / cs.n_users) AS ltv_cents_per_user
        FROM rev r JOIN cohort_size cs ON cs.cohort = r.cohort
    """,
    doc=(
        "extension (clickstream/KPI): LTV CURVE - cumulative "
        "purchase revenue per user by cohort age (users grouped by "
        "first-seen week; each cohort's running revenue divided by "
        "its size), the payback-period readout every acquisition "
        "budget is set against. Exact cent sums, one running-sum "
        "window over the (cohort, age) frame (weeks x cohorts rows, "
        "tiny), one IEEE division. Scale: the only corpus-scale "
        "passes are the first-seen min and the revenue groupBy - "
        "both partial-agg; the curve math runs on the aggregate."
    ),
    tags=("agg", "window"),
)
def ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    first_seen = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort"))
    )
    cohort_size = first_seen.groupBy("cohort").agg(
        F.count("*").alias("n_users")
    )
    events = load_table(spark, sf_dir, "events")
    rev = (
        events.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .groupBy(
            "cohort",
            (
                F.datediff(
                    F.to_date(F.date_trunc("week", "ts")), F.col("cohort")
                )
                / 7
            )
            .cast("long")
            .alias("age_week"),
        )
        .agg(F.sum(_cents()).alias("cents"))
    )
    w = Window.partitionBy("cohort").orderBy("age_week")
    return (
        rev.join(F.broadcast(cohort_size), "cohort")
        .select(
            "cohort",
            "age_week",
            "n_users",
            F.sum("cents").over(w).alias("cum_cents"),
            (
                F.sum("cents").over(w).cast("double") / F.col("n_users")
            ).alias("ltv_cents_per_user"),
        )
    )


@query(
    "association_rules",
    oracle="""
        WITH ui AS (
            SELECT DISTINCT user_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS item
            FROM events
        ),
        n_total AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                        AS n FROM ui),
        deg AS (
            SELECT item, CAST(count(*) AS BIGINT) AS n_item
            FROM ui GROUP BY item
        ),
        pair AS (
            SELECT a.item AS antecedent, b.item AS consequent,
                   CAST(count(*) AS BIGINT) AS n_both
            FROM ui a
            JOIN ui b ON a.user_id = b.user_id AND a.item <> b.item
            GROUP BY 1, 2
            HAVING count(*) >= 5
        )
        SELECT antecedent, consequent, n_both,
               (CAST(n_both AS DOUBLE) / da.n_item) AS confidence,
               ((CAST(n_both AS DOUBLE) / da.n_item)
                / (CAST(db.n_item AS DOUBLE)
                   / (SELECT n FROM n_total))) AS lift
        FROM pair
        JOIN deg da ON da.item = antecedent
        JOIN deg db ON db.item = consequent
    """,
    doc=(
        "extension (clickstream/recsys): ASSOCIATION RULES - "
        "directional item->item rules with support (co-visit "
        "count), confidence P(consequent|antecedent) and lift "
        "(confidence over base rate), the Apriori/market-basket "
        "readout (lift > 1 = genuinely associated, not just "
        "popular). Integer counts, two IEEE divisions per rule; "
        "min-support 5 prunes noise. Scale: same capped per-user "
        "pair build as item_cooccurrence (directional, so both "
        "orders emit); the degree/total frames broadcast."
    ),
    tags=("join", "agg"),
)
def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ui = events.select(
        "user_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("item"),
    ).distinct()
    n_total = ui.agg(F.countDistinct("user_id").alias("n"))
    deg = ui.groupBy("item").agg(F.count("*").alias("n_item"))
    a = ui.select("user_id", F.col("item").alias("antecedent"))
    b = ui.select("user_id", F.col("item").alias("consequent"))
    pair = (
        a.join(b, "user_id")
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= 5)
    )
    da = deg.select(
        F.col("item").alias("antecedent"), F.col("n_item").alias("n_a")
    )
    db = deg.select(
        F.col("item").alias("consequent"), F.col("n_item").alias("n_c")
    )
    return (
        pair.join(F.broadcast(da), "antecedent")
        .join(F.broadcast(db), "consequent")
        .crossJoin(F.broadcast(n_total))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            (F.col("n_both").cast("double") / F.col("n_a")).alias(
                "confidence"
            ),
            (
                (F.col("n_both").cast("double") / F.col("n_a"))
                / (F.col("n_c").cast("double") / F.col("n"))
            ).alias("lift"),
        )
    )


@query(
    "landing_page_conversion",
    oracle="""
        WITH o AS (
            SELECT user_id, ts, event_id, event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS item,
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
            FROM events
        ),
        s AS (
            SELECT *,
                   SUM(CASE WHEN prev IS NULL
                            OR ts - prev > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS sid
            FROM o
        ),
        sessions AS (
            SELECT user_id, sid,
                   CAST(SUM(item * CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS landing_item,
                   max(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS converted
            FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY user_id, sid
                           ORDER BY ts, event_id) AS rn
                FROM s
            )
            GROUP BY user_id, sid
        )
        SELECT landing_item,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(SUM(converted) AS BIGINT) AS n_converted,
               (CAST(SUM(converted) AS DOUBLE) / count(*))
                   AS conversion_rate
        FROM sessions
        GROUP BY landing_item
    """,
    doc=(
        "extension (clickstream/attribution): LANDING-PAGE "
        "conversion - sessions (30-min gaps-and-islands, the "
        "session_funnel_stats sid) keyed by their FIRST item; "
        "conversion = any purchase inside the session; rate per "
        "landing item. The entry-point performance table behind "
        "'which page starts journeys that buy'. Exact integers + "
        "one division; the landing item rides the session aggregate "
        "as sum(item*[rn=1]) so one grouped pass computes both "
        "first-touch and outcome (no self-join). Scale: the "
        "standard per-user window exchange, then session-count-"
        "sized aggregates."
    ),
    tags=("window", "agg"),
)
def landing_page_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("item"),
        F.lag("ts").over(w).alias("prev"),
    )
    gap = F.when(
        F.col("prev").isNull()
        | (
            F.unix_micros("ts") - F.unix_micros("prev")
            > 30 * 60 * 1_000_000
        ),
        1,
    ).otherwise(0)
    s = o.select(
        "*", F.sum(gap).over(w).alias("sid")
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    sessions = (
        s.select("*", F.row_number().over(ws).alias("rn"))
        .groupBy("user_id", "sid")
        .agg(
            F.sum(
                F.col("item")
                * F.when(F.col("rn") == 1, 1).otherwise(0)
            ).alias("landing_item"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
    )
    return sessions.groupBy("landing_item").agg(
        F.count("*").alias("n_sessions"),
        F.sum("converted").alias("n_converted"),
        (
            F.sum("converted").cast("double") / F.count("*")
        ).alias("conversion_rate"),
    )


@query(
    "new_vs_returning",
    oracle="""
        WITH fs AS (
            SELECT user_id,
                   CAST(date_trunc('day', min(ts)) AS DATE) AS first_day
            FROM events GROUP BY user_id
        ),
        d AS (
            SELECT CAST(date_trunc('day', e.ts) AS DATE) AS day,
                   e.user_id,
                   (CAST(date_trunc('day', e.ts) AS DATE) = fs.first_day)
                       AS is_new
            FROM events e JOIN fs ON fs.user_id = e.user_id
        )
        SELECT day,
               CAST(count(DISTINCT CASE WHEN is_new THEN user_id END)
                    AS BIGINT) AS n_new_users,
               CAST(count(DISTINCT CASE WHEN NOT is_new THEN user_id END)
                    AS BIGINT) AS n_returning_users,
               CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
                   AS events_from_new,
               CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT)
                   AS events_from_returning
        FROM d
        GROUP BY day
    """,
    doc=(
        "extension (clickstream/KPI): NEW vs RETURNING split per day "
        "- each day's active users partitioned by whether it is "
        "their first-seen day, with event volumes for both groups; "
        "the acquisition-vs-retention composition every growth "
        "dashboard leads with. One first-seen aggregate (broadcast "
        "back onto the stream - at 100 TB this is the incrementally-"
        "maintained user dimension), one grouped conditional pass. "
        "Exact integers throughout."
    ),
    tags=("agg", "join"),
)
def new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    fs = events.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("first_day")
    )
    d = events.join(F.broadcast(fs), "user_id").select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "user_id",
        (
            F.to_date(F.date_trunc("day", "ts")) == F.col("first_day")
        ).alias("is_new"),
    )
    return d.groupBy("day").agg(
        F.countDistinct(
            F.when(F.col("is_new"), F.col("user_id"))
        ).alias("n_new_users"),
        F.countDistinct(
            F.when(~F.col("is_new"), F.col("user_id"))
        ).alias("n_returning_users"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias(
            "events_from_new"
        ),
        F.sum(F.when(F.col("is_new"), 0).otherwise(1)).alias(
            "events_from_returning"
        ),
    )


@query(
    "clickstream_mart_pipeline",
    oracle=f"""
        WITH o AS (
            SELECT user_id, ts, event_type, {_CENTS_SQL} AS cents,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       AS prev
            FROM events
        ),
        marked AS (
            SELECT user_id, ts, event_type, cents,
                   CASE WHEN prev IS NULL
                             OR ts - prev > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_s
            FROM o
        ),
        numbered AS (
            SELECT user_id, ts, event_type, cents,
                   sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM marked
        ),
        sess AS (
            SELECT user_id, sid,
                   min(ts) AS s_start,
                   count(*) AS n_events,
                   sum(CASE WHEN event_type = 'purchase'
                            THEN cents ELSE 0 END) AS revenue_cents,
                   max(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS converted
            FROM numbered
            GROUP BY 1, 2
        )
        SELECT CAST(date_trunc('day', s_start) AS TIMESTAMP) AS day,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(converted) AS BIGINT) AS n_converted,
               CAST(sum(revenue_cents) AS BIGINT) AS revenue_cents,
               CAST(sum(converted) AS DOUBLE) / count(*)
                   AS conversion_rate,
               CAST(sum(n_events) AS BIGINT) AS n_events
        FROM sess
        GROUP BY 1
    """,
    doc=(
        "FLAGSHIP composition, clickstream side (the corpus_build_"
        "pipeline's sibling for the reference's actual domain): raw "
        "events -> gaps-and-islands sessionization -> per-session "
        "stats (events, purchase revenue in cents, converted flag) "
        "-> daily mart (sessions, conversions, revenue, exact-"
        "division conversion rate) as ONE declarative plan - the "
        "per-user session window and the two aggregations fuse into "
        "a single DAG Catalyst pipelines with no intermediate "
        "materialization. Oracle replays the identical CTE stack. "
        "Scale: one shuffle to (user) for sessionization, one to "
        "(user, sid), one to (day) - each strictly coarser, and the "
        "session count per user is bounded, so no stage re-reads "
        "the corpus."
    ),
    tags=("window", "agg", "scale", "bench"),
)
def clickstream_mart_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", _cents().alias("cents")
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    marked = ev.withColumn(
        "new_s",
        F.when(
            F.lag("ts").over(w).isNull()
            # exact microsecond gap compare (cast-to-long would
            # truncate to seconds and disagree with the oracle's
            # INTERVAL arithmetic inside the boundary second)
            | (
                F.unix_micros(F.col("ts"))
                - F.unix_micros(F.lag("ts").over(w))
                > 1800 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "sid",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sess = numbered.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s_start"),
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("cents"))
            .otherwise(0)
        ).alias("revenue_cents"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    return sess.groupBy(
        F.date_trunc("day", "s_start").alias("day")
    ).agg(
        F.count("*").alias("n_sessions"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
        (F.sum("converted").cast("double") / F.count("*")).alias(
            "conversion_rate"
        ),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )
