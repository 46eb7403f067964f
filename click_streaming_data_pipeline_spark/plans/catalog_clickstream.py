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
