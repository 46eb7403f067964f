"""Temporal-join catalog (beyond reference): click→purchase
attribution via interval join (batch + true stream-stream) and as-of
join, oracle-checked against DuckDB (including its native ASOF JOIN).
"""

from __future__ import annotations

import os
import tempfile
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join, interval_join_binned
from ..sources import load_table
from .registry import query


def _typed(events: DataFrame, etype: str) -> DataFrame:
    return events.filter(F.col("event_type") == etype).select(
        "user_id", "ts", "event_id"
    )


_INTERVAL_SQL = """
    SELECT c.user_id,
           c.event_id AS click_id, c.ts AS click_ts,
           p.event_id AS purchase_id, p.ts AS purchase_ts
    FROM (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'click') c
    JOIN (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL '1 hour'
"""


@query(
    "click_purchase_interval_join",
    oracle=_INTERVAL_SQL,
    doc=(
        "beyond-reference: interval join - purchases attributed to "
        "same-user clicks within 1h, via time-bin equi-join (each "
        "click meets only its two reachable 1h buckets, not the "
        "user's whole history - hot-key-safe; the naive key-only "
        "join + range filter is kept as the tested reference impl)"
    ),
    tags=("join", "temporal"),
)
def click_purchase_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    joined = interval_join_binned(
        _typed(events, "click"), _typed(events, "purchase"), gap_seconds=3600
    )
    return joined.select(
        "user_id",
        F.col("l_event_id").alias("click_id"),
        F.col("l_ts").alias("click_ts"),
        F.col("r_event_id").alias("purchase_id"),
        F.col("r_ts").alias("purchase_ts"),
    )


@query(
    "click_purchase_interval_streamed",
    oracle=_INTERVAL_SQL,
    doc=(
        "beyond-reference: the same attribution as a TRUE stream-"
        "stream join — both sides watermarked, event-time range "
        "condition bounds join state, availableNow; must equal the "
        "batch interval join exactly. Watermark delay spans the whole "
        "corpus here so out-of-order micro-batches can never evict a "
        "matchable row (production would tune it to real lateness)"
    ),
    tags=("streaming", "join", "temporal"),
)
def click_purchase_interval_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_ssj_")
    src = os.path.join(work, "in")
    events.repartition(6).write.mode("overwrite").parquet(src)

    def stream():
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 3)
            .parquet(src)
        )

    clicks = (
        stream()
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "90 days")
    )
    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", "90 days")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 hour")
        ),
    ).select("user_id", "click_id", "click_ts", "purchase_id", "purchase_ts")

    name = f"ssj_{_uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "asof_attribution",
    oracle="""
        SELECT p.user_id, p.ts, p.event_id,
               c.ts AS asof_ts,
               c.event_id AS asof_event_id
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events
                        WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    doc=(
        "beyond-reference: AS-OF join — each purchase matched to the "
        "user's most recent click at-or-before it, via the union-tag + "
        "last(ignorenulls) carry-forward window (one shuffle, hot-key "
        "safe); oracle is DuckDB's native ASOF JOIN"
    ),
    tags=("join", "temporal", "window"),
)
def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return asof_join(
        _typed(events, "click"),
        _typed(events, "purchase"),
        left_val_cols=["event_id"],
    )


@query(
    "asof_attribution_streamed",
    oracle="""
        SELECT p.user_id, p.ts, p.event_id,
               c.ts AS asof_ts,
               c.event_id AS asof_event_id
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events
                        WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    doc=(
        "streamed AS-OF join (Flink temporal/versioned-join "
        "analogue): clicks and purchases arrive interleaved and out "
        "of order on one stream; each micro-batch re-derives matches "
        "ONLY for users the batch touched (left-semi restriction "
        "against the accumulated stores) and upserts them keyed by "
        "purchase id — so a click arriving AFTER the purchase it "
        "attributes emits a correction row, later batches win, and "
        "per-batch cost tracks affected users, never the corpus. "
        "Stores are versioned per batch_id and the upsert is "
        "last-writer-wins, so at-least-once replays converge to the "
        "same table. Drained result == the batch asof_attribution == "
        "DuckDB's native ASOF JOIN, bit-for-bit."
    ),
    tags=("streaming", "join", "temporal"),
)
def asof_attribution_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..operators.upsert import upsert_parquet

    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("user_id", "ts", "event_id", "event_type")
    )
    work = tempfile.mkdtemp(prefix="csdp_asof_")
    src = os.path.join(work, "in")
    stores = {k: os.path.join(work, k) for k in ("clicks", "purchases")}
    out = os.path.join(work, "out")
    events.repartition(6).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def read_prior(sp, store: str, batch_id: int):
        """All batch subdirs EXCEPT the current id — the replay-safe
        accumulated-store read (same discipline as the streaming
        dedup stores)."""
        if not os.path.isdir(store):
            return None
        parts = [
            os.path.join(store, d)
            for d in os.listdir(store)
            if d.startswith("b") and d != f"b{batch_id}"
        ]
        return sp.read.parquet(*parts) if parts else None

    def on_batch(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        c_new = batch.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        p_new = batch.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id"
        )
        c_prev = read_prior(sp, stores["clicks"], batch_id)
        p_prev = read_prior(sp, stores["purchases"], batch_id)
        c_all = c_prev.unionByName(c_new) if c_prev is not None else c_new
        p_all = p_prev.unionByName(p_new) if p_prev is not None else p_new
        touched = batch.select("user_id").distinct()
        res = asof_join(
            c_all.join(touched, "user_id", "left_semi"),
            p_all.join(touched, "user_id", "left_semi"),
            left_val_cols=["event_id"],
        ).withColumn("__bid", F.lit(batch_id))
        upsert_parquet(sp, out, res, ["event_id"], ["__bid"])
        c_new.write.mode("overwrite").parquet(
            os.path.join(stores["clicks"], f"b{batch_id}")
        )
        p_new.write.mode("overwrite").parquet(
            os.path.join(stores["purchases"], f"b{batch_id}")
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).drop("__bid")


@query(
    "funnel_steps",
    oracle="""
        WITH v AS (
            SELECT user_id, min(ts) AS view_ts FROM events
            WHERE event_type = 'view' GROUP BY 1
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS click_ts
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > v.view_ts
            GROUP BY 1
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS purchase_ts
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
            GROUP BY 1
        )
        SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts,
               (p.purchase_ts IS NOT NULL) AS completed
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN v ON v.user_id = u.user_id
        LEFT JOIN c ON c.user_id = u.user_id
        LEFT JOIN p ON p.user_id = u.user_id
    """,
    doc=(
        "beyond-reference: ordered funnel analysis - per user the "
        "first view, the first click strictly AFTER that view, the "
        "first purchase strictly after that click (sequence "
        "detection, not mere co-occurrence); the canonical "
        "clickstream-analytics operator"
    ),
    tags=("agg", "temporal", "join"),
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three staged conditional aggregations, each joining the
    previous step's timestamp back (one row per user — but the user
    population is unbounded at warehouse scale, so no forced broadcast
    hint: AQE / autoBroadcastJoinThreshold decides at runtime, and the
    fallback is a sort-merge join already co-partitioned on user_id by
    the preceding aggregation shuffle. Scale: 3 narrow joins + 3
    partial-agg shuffles on user_id; no window over full history."""
    events = load_table(spark, sf_dir, "events")
    users = events.select("user_id").distinct()
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        events.join(v, "user_id")
        .filter(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("view_ts"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        events.join(c, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("click_ts"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            F.col("purchase_ts").isNotNull().alias("completed"),
        )
    )


@query(
    "cohort_retention",
    oracle="""
        WITH active AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS active_week
            FROM events
        ),
        withc AS (
            SELECT user_id, active_week,
                   min(active_week) OVER (PARTITION BY user_id)
                       AS cohort_week
            FROM active
        ),
        per AS (
            SELECT cohort_week,
                   CAST(date_diff('day', cohort_week, active_week) // 7
                        AS INT) AS week_offset,
                   count(*) AS n_active
            FROM withc GROUP BY 1, 2
        )
        SELECT cohort_week, week_offset, n_active,
               first_value(n_active) OVER w AS cohort_size,
               CAST(n_active AS DOUBLE)
                   / first_value(n_active) OVER w AS retention_rate
        FROM per
        WINDOW w AS (PARTITION BY cohort_week ORDER BY week_offset)
    """,
    doc=(
        "beyond-reference breadth: weekly cohort retention — users "
        "grouped by first-active ISO week, activity counted per "
        "(cohort, week-offset) cell, rate normalized by the offset-0 "
        "cohort size. Join-free plan: distinct (user, week) then a "
        "per-user window min derives the cohort in the SAME user_id "
        "shuffle; the cells groupBy is cohort-bounded. cohort_size "
        "comes from first_value over the cells, not a self-join. "
        "Both engines truncate weeks to Monday; day-diffs of "
        "week-truncated dates are exact multiples of 7, so the "
        "integer division is exact."
    ),
    tags=("window", "agg"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    active = events.select(
        "user_id",
        F.to_date(F.date_trunc("week", F.col("ts"))).alias("active_week"),
    ).distinct()
    withc = active.withColumn(
        "cohort_week",
        F.min("active_week").over(Window.partitionBy("user_id")),
    )
    per = withc.groupBy(
        "cohort_week",
        F.expr(
            "CAST(datediff(active_week, cohort_week) DIV 7 AS INT)"
        ).alias("week_offset"),
    ).agg(F.count("*").alias("n_active"))
    w = Window.partitionBy("cohort_week").orderBy("week_offset")
    return per.select(
        "cohort_week",
        "week_offset",
        "n_active",
        F.first("n_active").over(w).alias("cohort_size"),
        (F.col("n_active").cast("double") / F.first("n_active").over(w)).alias(
            "retention_rate"
        ),
    )


@query(
    "page_transitions",
    oracle="""
        WITH keyed AS (
            SELECT user_id, ts, event_id,
                   CAST(json_extract_string(props, '$.k') AS INTEGER)
                       AS dst
            FROM events
        ),
        pairs AS (
            SELECT lag(dst) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS src,
                   dst
            FROM keyed
        )
        SELECT src, dst, count(*) AS n_transitions
        FROM pairs
        WHERE src IS NOT NULL AND src <> dst
        GROUP BY 1, 2
    """,
    doc=(
        "beyond-reference graph analytics: the page-transition graph "
        "— consecutive doc views per user (the Markov chain of "
        "attention), one window pass on user_id + one grouped count; "
        "the edge list PageRank walks"
    ),
    tags=("window", "graph"),
)
def page_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.graph import transition_edges

    return transition_edges(load_table(spark, sf_dir, "events"))


def _pagerank_oracle(n_iter: int = 10) -> str:
    """Unrolled-iteration SQL twin of ``extensions.graph.pagerank``.

    The fixed iteration count makes the 'iterative' algorithm
    SQL-expressible: each driver-loop round becomes one CTE pair
    (contribution sum, rank update). Float parity notes:

    - Spark's double->decimal(38,18) cast goes through the shortest
      string repr (then HALF_UP); DuckDB's native cast converts the
      exact binary value, so the two differ in the last decimal
      digits. ``CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18))`` makes
      DuckDB take the same string-mediated route (verified
      value-by-value).
    - decimal->double likewise goes through VARCHAR so both engines
      parse the same exact decimal string with correct rounding.
    - ``0.85e0``/``1.0e0`` keep DuckDB literals DOUBLE (a bare 0.85
      parses as DECIMAL(3,2) and ``1.0-0.85`` would then be an exact
      decimal 0.15, not Python's 0.15000000000000002).
    Both sides round the released rank to 9 dp (repo float rule).
    """
    head = """
        WITH keyed AS (
            SELECT user_id, ts, event_id,
                   CAST(json_extract_string(props, '$.k') AS INTEGER)
                       AS dst
            FROM events
        ),
        pairs AS (
            SELECT lag(dst) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS src,
                   dst
            FROM keyed
        ),
        edges AS (
            SELECT src, dst, count(*) AS n
            FROM pairs
            WHERE src IS NOT NULL AND src <> dst
            GROUP BY 1, 2
        ),
        nodes AS (
            SELECT src AS node FROM edges
            UNION
            SELECT dst FROM edges
        ),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        outw AS (SELECT src, sum(n) AS out_w FROM edges GROUP BY src),
        shares AS (
            SELECT e.src, e.dst,
                   CAST(e.n AS DOUBLE) / CAST(o.out_w AS DOUBLE)
                       AS share
            FROM edges e JOIN outw o USING (src)
        ),
        r0 AS (
            SELECT node, 1.0e0 / (SELECT n FROM nn) AS rank FROM nodes
        )"""
    its = []
    for k in range(1, n_iter + 1):
        its.append(f""",
        s{k} AS (
            SELECT sh.dst,
                   CAST(CAST(sum(
                       CASE WHEN abs(r.rank * sh.share) < 1e-19
                            THEN CAST(0 AS DECIMAL(38,18))
                            ELSE CAST(CAST(r.rank * sh.share AS VARCHAR)
                                      AS DECIMAL(38,18)) END
                   ) AS VARCHAR) AS DOUBLE) AS in_sum
            FROM shares sh JOIN r{k - 1} r ON sh.src = r.node
            GROUP BY sh.dst
        ),
        r{k} AS (
            SELECT nodes.node,
                   (1.0e0 - 0.85e0) / (SELECT n FROM nn)
                       + 0.85e0 * coalesce(s{k}.in_sum, 0.0e0) AS rank
            FROM nodes LEFT JOIN s{k} ON nodes.node = s{k}.dst
        )""")
    tail = f"""
        SELECT node, round(rank, 9) AS rank FROM r{n_iter}
    """
    return head + "".join(its) + tail


@query(
    "page_rank",
    oracle=_pagerank_oracle(),
    doc=(
        "beyond-reference graph analytics: weighted PageRank over the "
        "page-transition graph — 10 driver-loop iterations, each one "
        "join on src + one decimal-exact (order-free, bit-stable) "
        "contribution sum per dst; edge shares materialize once, node "
        "state checkpoints per round (the Pregel-on-DataFrames "
        "shape). Simplified dangling-mass variant, mirrored exactly "
        "by the pytest python oracle AND, since the iteration count "
        "is fixed, by an unrolled-CTE SQL oracle (one contribution/"
        "update CTE pair per round, string-mediated decimal casts "
        "for bit parity)."
    ),
    tags=("graph",),
)
def page_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.graph import pagerank, transition_edges

    edges = transition_edges(load_table(spark, sf_dir, "events"))
    return pagerank(edges).select(
        "node", F.round("rank", 9).alias("rank")
    )


@query(
    "hourly_error_spine",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('hour', min(ts)) AS lo,
                   date_trunc('hour', max(ts)) AS hi
            FROM events
        ),
        spine AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                AS hour
            FROM bounds
        ),
        err AS (
            SELECT date_trunc('hour', ts) AS hour,
                   CAST(count(*) AS BIGINT) AS n_errors
            FROM events WHERE event_type = 'error'
            GROUP BY 1
        )
        SELECT spine.hour, coalesce(n_errors, 0) AS n_errors
        FROM spine LEFT JOIN err ON spine.hour = err.hour
    """,
    doc=(
        "beyond-reference time-series: GAP-FILLED RESAMPLE - a "
        "calendar spine (sequence over the observed hour range) left-"
        "joins sparse per-hour error counts and zero-fills the 42 "
        "missing hours; the resample-with-fill operator dashboards "
        "and downstream window functions need (a gap breaks every "
        "trailing-window calc). Scale: bounds reduce to ONE row, the "
        "spine explodes from it (rows = hours, tiny), and the fact "
        "side is a partial-agg groupBy - no extra fact scan."
    ),
    tags=("window", "agg"),
)
def hourly_error_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour")
    )
    err = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").alias("n_errors"))
    )
    return spine.join(err, "hour", "left").select(
        "hour", F.coalesce("n_errors", F.lit(0)).alias("n_errors")
    )


@query(
    "user_status_scd2",
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
        "beyond-reference warehouse modeling: SCD TYPE 2 interval "
        "build - collapse each user's event stream into status "
        "validity intervals (change detection via lag, interval close "
        "via lead, open-ended current row); the slowly-changing-"
        "dimension history table every warehouse maintains. Scale: "
        "both window passes share ONE hash partitioning on user_id "
        "(Catalyst reuses the exchange), so the whole build is a "
        "single shuffle."
    ),
    tags=("window",),
)
def user_status_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id", F.col("event_type").alias("status"), "ts", "event_id"
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        "status",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "point_in_time_status",
    oracle="""
        WITH o AS (
            SELECT user_id, ts, event_type,
                   lag(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        changes AS (
            SELECT user_id, event_type AS status, ts AS valid_from
            FROM o
            WHERE prev_type IS NULL OR prev_type <> event_type
        ),
        purchases AS (
            SELECT user_id, ts, event_id FROM events
            WHERE event_type = 'purchase'
        )
        SELECT p.user_id, p.ts, p.event_id,
               c.status AS status_asof,
               c.valid_from AS status_since
        FROM purchases p
        ASOF LEFT JOIN changes c
          ON p.user_id = c.user_id AND c.valid_from <= p.ts
    """,
    doc=(
        "beyond-reference feature-store: POINT-IN-TIME join - each "
        "purchase is annotated with the status interval valid AT that "
        "moment (the SCD2 table of user_status_scd2 probed as-of the "
        "event time), the leakage-free feature lookup a training "
        "pipeline must use instead of joining current state onto past "
        "events. Same union-tag carry-forward plan as "
        "asof_attribution: one shuffle, hot-key safe, no range join "
        "explosion; oracle is DuckDB's native ASOF JOIN against the "
        "gaps-and-islands interval build."
    ),
    tags=("join", "temporal", "window"),
)
def point_in_time_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("status"),
            F.col("ts").alias("valid_from"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(
        changes.select(
            "user_id", F.col("valid_from").alias("ts"), "status"
        ),
        purchases,
        left_val_cols=["status"],
    )
    return joined.select(
        "user_id",
        "ts",
        "event_id",
        F.col("asof_status").alias("status_asof"),
        F.col("asof_ts").alias("status_since"),
    )


@query(
    "click_purchase_left_outer_streamed",
    oracle="""
        SELECT c.user_id,
               c.event_id AS click_id, c.ts AS click_ts,
               p.event_id AS purchase_id, p.ts AS purchase_ts
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'click') c
        LEFT JOIN (SELECT user_id, ts, event_id FROM events
                   WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL '1 hour'
    """,
    doc=(
        "beyond-reference: LEFT OUTER stream-stream join - every "
        "click emits, attributed or not, with the null row produced "
        "only when the watermark proves no purchase can still arrive "
        "(the hard part of outer streaming joins: unmatched results "
        "are watermark-delayed state evictions, not immediate rows). "
        "Parity with the batch LEFT JOIN is exact because a sentinel "
        "event past max(ts)+delay is appended as the LAST file (later "
        "mtime), pushing the final watermark beyond every click's "
        "expiry so all pending state drains inside availableNow's "
        "no-data batch - the standard flush technique for bounded "
        "replays of an outer join."
    ),
    tags=("streaming", "join", "temporal"),
)
def click_purchase_left_outer_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import time as _time

    events = load_table(spark, sf_dir, "events")
    max_ts = events.agg(F.max("ts").alias("m")).collect()[0]["m"]
    work = tempfile.mkdtemp(prefix="csdp_ssloj_")
    src = os.path.join(work, "in")
    events.repartition(6).write.mode("overwrite").parquet(src)
    # sentinel pair (user_id<0) past max_ts + watermark delay: its
    # arrival advances the watermark beyond every real click's
    # expiry, draining unmatched state before termination. Written
    # AFTER the data files (plus a sleep beating coarse mtime
    # granularity) so FileStreamSource's mtime order puts it in the
    # last micro-batch.
    _time.sleep(1.1)
    sentinel = spark.createDataFrame(
        [(-1, "click"), (-2, "purchase")], "user_id long, event_type string"
    ).select(
        F.lit(-1).cast("long").alias("event_id"),
        (F.lit(max_ts) + F.expr("INTERVAL 91 DAYS")).alias("ts"),
        "user_id",
        "event_type",
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    ).select(*[c for c in events.columns])
    sentinel.coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 3)
            .parquet(src)
        )

    clicks = (
        stream()
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "90 days")
    )
    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", "90 days")
    )
    # NOTE: the sentinel filter must NOT be part of the streaming
    # plan: Catalyst pushes `user_id >= 0` through the outer join to
    # BOTH scans (constraint propagation via the equi-key), which
    # would drop the sentinel rows at the source — before their event
    # time ever reaches the watermark operator — and the flush never
    # happens. Filter the materialized result instead.
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 hour")
        ),
        "left_outer",
    ).select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts"
    )

    name = f"ssloj_{_uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).filter(F.col("user_id") >= 0)


@query(
    "click_purchase_full_outer_streamed",
    oracle="""
        SELECT coalesce(c.user_id, p.user_id) AS user_id,
               c.event_id AS click_id, c.ts AS click_ts,
               p.event_id AS purchase_id, p.ts AS purchase_ts
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'click') c
        FULL JOIN (SELECT user_id, ts, event_id FROM events
                   WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL '1 hour'
    """,
    doc=(
        "beyond-reference: FULL OUTER stream-stream join - attributed "
        "pairs, never-converting clicks AND orphan purchases all "
        "emit; both sides' null rows are watermark-driven state "
        "evictions. Same sentinel-flush + post-materialization filter "
        "discipline as the left-outer form (the filter must stay out "
        "of the streaming plan or constraint propagation pushes it "
        "into both scans and kills the flush row before the watermark "
        "sees it). Exactly equals the batch FULL JOIN."
    ),
    tags=("streaming", "join", "temporal"),
)
def click_purchase_full_outer_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import time as _time

    events = load_table(spark, sf_dir, "events")
    max_ts = events.agg(F.max("ts").alias("m")).collect()[0]["m"]
    work = tempfile.mkdtemp(prefix="csdp_ssfoj_")
    src = os.path.join(work, "in")
    events.repartition(6).write.mode("overwrite").parquet(src)
    _time.sleep(1.1)
    sentinel = spark.createDataFrame(
        [(-1, "click"), (-2, "purchase")], "user_id long, event_type string"
    ).select(
        F.lit(-1).cast("long").alias("event_id"),
        (F.lit(max_ts) + F.expr("INTERVAL 91 DAYS")).alias("ts"),
        "user_id",
        "event_type",
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    ).select(*[c for c in events.columns])
    sentinel.coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 3)
            .parquet(src)
        )

    clicks = (
        stream()
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "90 days")
    )
    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", "90 days")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 hour")
        ),
        "full_outer",
    ).select(
        F.coalesce("user_id", "p_user_id").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
    )

    name = f"ssfoj_{_uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).filter(F.col("user_id") >= 0)


@query(
    "page_triangles",
    oracle="""
        WITH keyed AS (
            SELECT user_id, ts, event_id,
                   CAST(json_extract_string(props, '$.k') AS INTEGER)
                       AS dst
            FROM events
        ),
        pairs AS (
            SELECT lag(dst) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS src, dst
            FROM keyed
        ),
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM pairs WHERE src IS NOT NULL AND src <> dst
        ),
        deg AS (
            SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
                SELECT a AS v FROM und UNION ALL SELECT b FROM und
            ) GROUP BY v
        ),
        tri AS (
            SELECT count(*) AS t
            FROM und e1
            JOIN und e2 ON e2.a = e1.b
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
               (SELECT CAST(sum(deg * (deg - 1)) // 2 AS BIGINT) FROM deg)
                   AS n_wedges,
               (SELECT CAST(t AS BIGINT) FROM tri) AS n_triangles,
               CAST(3.0 AS DOUBLE) * (SELECT t FROM tri)
                   / (SELECT sum(deg * (deg - 1)) // 2 FROM deg)
                   AS global_clustering
    """,
    doc=(
        "beyond-reference graph analytics: TRIANGLE CENSUS of the "
        "page-transition graph (nodes/edges/wedges/triangles + global "
        "clustering coefficient) via the compact-forward degree-"
        "oriented join - each triangle counted once at its lowest-"
        "degree corner, bounding hub fan-out (the skew-safe plan; "
        "the oracle's id-ordered enumeration proves the count is "
        "orientation-independent). Counts are exact BIGINTs; the "
        "coefficient is one final division."
    ),
    tags=("graph", "join"),
)
def page_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.graph import transition_edges, triangle_stats

    edges = transition_edges(load_table(spark, sf_dir, "events"))
    return triangle_stats(edges)


@query(
    "point_in_time_status_streamed",
    oracle="""
        WITH o AS (
            SELECT user_id, ts, event_type,
                   lag(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        changes AS (
            SELECT user_id, event_type AS status, ts AS valid_from
            FROM o
            WHERE prev_type IS NULL OR prev_type <> event_type
        ),
        purchases AS (
            SELECT user_id, ts, event_id FROM events
            WHERE event_type = 'purchase'
        )
        SELECT p.user_id, p.ts, p.event_id,
               c.status AS status_asof,
               c.valid_from AS status_since
        FROM purchases p
        ASOF LEFT JOIN changes c
          ON p.user_id = c.user_id AND c.valid_from <= p.ts
    """,
    doc=(
        "beyond-reference feature-store, STREAMING form: each "
        "purchase micro-batch is enriched point-in-time against the "
        "STATIC SCD2 interval table (stream-static join - the static "
        "side re-resolves per trigger, so a slowly-refreshed dim "
        "stays current; no watermark state because the dim is "
        "bounded). The interval probe is closed intervals "
        "[valid_from, valid_to) so exactly one row matches - the "
        "leakage-free online feature lookup, equal to the batch "
        "as-of join row for row."
    ),
    tags=("streaming", "join", "temporal"),
)
def point_in_time_status_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    # static SCD2 interval dim (same build as user_status_scd2)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            F.col("user_id").alias("d_user_id"),
            F.col("event_type").alias("status"),
            F.col("ts").alias("valid_from"),
        )
        .withColumn(
            "valid_to",
            F.lead("valid_from").over(
                Window.partitionBy("d_user_id").orderBy("valid_from")
            ),
        )
    )
    work = tempfile.mkdtemp(prefix="csdp_pits_")
    src = os.path.join(work, "in")
    events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    ).repartition(6).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    joined = stream.join(
        changes,
        (F.col("user_id") == F.col("d_user_id"))
        & (F.col("valid_from") <= F.col("ts"))
        & (
            F.col("valid_to").isNull()
            | (F.col("valid_to") > F.col("ts"))
        ),
        "left",
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.col("status").alias("status_asof"),
        F.col("valid_from").alias("status_since"),
    )
    name = f"pits_{_uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


_LPA_ROUNDS = 5

_LPA_EDGES_CTE = """
    keyed AS (
        SELECT user_id, ts, event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS dst
        FROM events
    ),
    pairs AS (
        SELECT lag(dst) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS src,
               dst
        FROM keyed
    ),
    edges AS (
        SELECT src, dst, count(*) AS n_transitions
        FROM pairs
        WHERE src IS NOT NULL AND src <> dst
        GROUP BY 1, 2
    ),
    sym AS (
        SELECT node, nbr, CAST(sum(w) AS BIGINT) AS w FROM (
            SELECT src AS node, dst AS nbr, n_transitions AS w FROM edges
            UNION ALL
            SELECT dst AS node, src AS nbr, n_transitions AS w FROM edges
        ) GROUP BY 1, 2
    ),
    lab0 AS (SELECT DISTINCT node, node AS lbl FROM sym)
"""

_LPA_ROUND_CTE = """
    lab{i} AS (
        SELECT node, lbl FROM (
            SELECT s.node, l.lbl,
                   row_number() OVER (
                       PARTITION BY s.node
                       ORDER BY sum(s.w) DESC, l.lbl ASC) AS rn
            FROM sym s JOIN lab{prev} l ON l.node = s.nbr
            GROUP BY s.node, l.lbl
        ) WHERE rn = 1
    )
"""

_LPA_SQL = (
    "WITH "
    + _LPA_EDGES_CTE
    + ","
    + ",".join(
        _LPA_ROUND_CTE.format(i=i, prev=i - 1)
        for i in range(1, _LPA_ROUNDS + 1)
    )
    + f"SELECT node, lbl AS community FROM lab{_LPA_ROUNDS}"
)


@query(
    "page_communities",
    oracle=_LPA_SQL,
    doc=(
        "beyond-reference graph analytics: community detection via "
        "SYNCHRONOUS weighted label propagation over the undirected "
        "page-transition graph — 5 driver-loop rounds, each one "
        "equi-join (labels onto the neighbor key) + grouped weight "
        "sum + per-node argmax with smallest-label ties. All-integer "
        "math makes the iterative algorithm fully deterministic, so "
        "unlike PageRank it carries a COMPLETE DuckDB value oracle "
        "(the same rounds unrolled as SQL stages). Node state "
        "checkpoints per round; edges shuffle once per round on the "
        "neighbor key"
    ),
    tags=("graph",),
)
def page_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.graph import label_propagation, transition_edges

    edges = transition_edges(load_table(spark, sf_dir, "events"))
    return label_propagation(edges, n_iter=_LPA_ROUNDS)


@query(
    "seasonal_decomposition",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS day_cents
            FROM events
            GROUP BY 1, 2
        )
        SELECT event_type, day,
               CAST(date_diff('day', DATE '1970-01-05', day) % 7 AS INT)
                   AS dow,
               day_cents,
               (CAST(SUM(day_cents) OVER w AS DOUBLE)
                / COUNT(*) OVER w) AS dow_mean_cents,
               (CAST(day_cents AS DOUBLE)
                - (CAST(SUM(day_cents) OVER w AS DOUBLE)
                   / COUNT(*) OVER w)) AS residual_cents
        FROM daily
        WINDOW w AS (
            PARTITION BY event_type,
                         date_diff('day', DATE '1970-01-05', day) % 7
        )
    """,
    doc=(
        "analytics breadth: seasonal-naive timeseries DECOMPOSITION "
        "- per event_type, the daily revenue series splits into a "
        "day-of-week seasonal profile (mean of that weekday's days) "
        "and a residual; the residual is what anomaly detection "
        "should watch (a quiet Sunday is not an incident). Exactness: "
        "daily totals in integer cent-space, the seasonal mean is ONE "
        "IEEE division of exact bigint sums, the residual one IEEE "
        "subtraction - bit-identical cross-engine. Day-of-week via "
        "portable integer date arithmetic (days-since-a-known-Monday "
        "mod 7), dodging the engines' dayofweek() convention split. "
        "Scale: the window runs over the DAILY table (rows = days x "
        "event types, thousands), not events; the only corpus-scale "
        "work is the first groupBy - partial-agg + one shuffle."
    ),
    tags=("agg", "window", "temporal"),
)
def seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("day_cents")
    )
    dow = (
        F.datediff(F.col("day"), F.lit("1970-01-05").cast("date")) % 7
    ).cast("int")
    w = Window.partitionBy("event_type", dow)
    mean = F.sum("day_cents").over(w).cast("double") / F.count("*").over(w)
    return daily.select(
        "event_type",
        "day",
        dow.alias("dow"),
        "day_cents",
        mean.alias("dow_mean_cents"),
        (F.col("day_cents").cast("double") - mean).alias("residual_cents"),
    )


@query(
    "conversion_latency_stats",
    oracle=f"""
        WITH pairs AS ({_INTERVAL_SQL}),
        nearest AS (
            SELECT purchase_id,
                   min(date_diff('microsecond', click_ts, purchase_ts))
                       AS latency_us
            FROM pairs GROUP BY purchase_id
        )
        SELECT count(*) AS n_conversions,
               min(latency_us) AS min_us,
               quantile_cont(latency_us, 0.5) AS p50_us,
               quantile_cont(latency_us, 0.9) AS p90_us,
               max(latency_us) AS max_us
        FROM nearest
    """,
    doc=(
        "beyond-reference (temporal analytics): CONVERSION-LATENCY "
        "distribution - each purchase takes the latency to its "
        "NEAREST preceding click inside the 1h attribution window "
        "(min over the interval-join pairs), then exact interpolated "
        "p50/p90 over the per-purchase latencies in integer "
        "microseconds (Spark percentile == DuckDB quantile_cont on "
        "bigint, the value_quantiles contract). The funnel-speed KPI "
        "behind 'how fast do clicks convert'. Scale: rides the "
        "hot-key-safe binned interval join; the percentile input is "
        "one row per conversion, orders of magnitude below the "
        "event stream."
    ),
    tags=("join", "temporal", "agg"),
)
def conversion_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pairs = interval_join_binned(
        _typed(events, "click"), _typed(events, "purchase"), gap_seconds=3600
    )
    nearest = (
        pairs.select(
            F.col("r_event_id").alias("purchase_id"),
            (
                F.unix_micros("r_ts") - F.unix_micros("l_ts")
            ).alias("latency_us"),
        )
        .groupBy("purchase_id")
        .agg(F.min("latency_us").alias("latency_us"))
    )
    return nearest.agg(
        F.count("*").alias("n_conversions"),
        F.min("latency_us").alias("min_us"),
        F.percentile("latency_us", 0.5).alias("p50_us"),
        F.percentile("latency_us", 0.9).alias("p90_us"),
        F.max("latency_us").alias("max_us"),
    )


@query(
    "rolling_active_users",
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                   user_id
            FROM events
        ),
        spine AS (SELECT DISTINCT day FROM du)
        SELECT s.day,
               CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau
        FROM spine s
        JOIN du ON du.day BETWEEN s.day - INTERVAL 6 DAY AND s.day
        GROUP BY s.day
    """,
    doc=(
        "beyond-reference (temporal KPI): trailing-7-day ACTIVE "
        "USERS per day (WAU) - the windowed-distinct problem that "
        "plain window frames cannot express (no count-distinct over "
        "RANGE windows). Shape: dedup to (day, user) once, then each "
        "row joins to at most 7 spine days (broadcast day spine) and "
        "a distinct-count per day finishes it - fan-out bounded by "
        "the window length, NEVER events x days. At 100 TB the "
        "(day, user) frame is the only corpus-scale aggregate; the "
        "rest runs on user x 7 rows. The mergeable approximate form "
        "swaps count(DISTINCT) for HLL-union over per-day sketches "
        "(hll_sketch_views pattern)."
    ),
    tags=("agg", "temporal", "join"),
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    du = events.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    ).distinct()
    spine = du.select("day").distinct()
    # each (day, user) row contributes to the 7 trailing windows
    # ending on day..day+6: explode the bounded fan-out, then an
    # EQUI semi-join on the day spine drops targets past the data —
    # no non-equi join anywhere in the plan
    targets = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
        "user_id",
    )
    return (
        targets.join(F.broadcast(spine), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )


@query(
    "click_purchase_semi_streamed",
    oracle="""
        SELECT c.user_id,
               c.event_id AS click_id, c.ts AS click_ts
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'click') c
        WHERE EXISTS (
            SELECT 1 FROM events p
            WHERE p.event_type = 'purchase'
              AND p.user_id = c.user_id
              AND p.ts >= c.ts
              AND p.ts <= c.ts + INTERVAL '1 hour'
        )
    """,
    doc=(
        "beyond-reference: LEFT SEMI stream-stream join - each click "
        "emits AT MOST ONCE, when its first in-window purchase "
        "arrives (the existence test of E1 lifted to two live "
        "streams); no purchase columns leak and no duplicate emission "
        "however many purchases match - semantics a projected inner "
        "join + dropDuplicates would need extra state to fake. "
        "Completes the stream-stream family (inner, left outer, full "
        "outer, semi). Watermarks bound both sides' state; equals "
        "the batch EXISTS exactly."
    ),
    tags=("streaming", "join", "temporal"),
)
def click_purchase_semi_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_sssj_")
    src = os.path.join(work, "in")
    events.repartition(6).write.mode("overwrite").parquet(src)

    def stream():
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 3)
            .parquet(src)
        )

    clicks = (
        stream()
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "90 days")
    )
    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "90 days")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 hour")
        ),
        "left_semi",
    )
    name = f"sssj_{_uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select("user_id", "click_id", "click_ts")


@query(
    "time_weighted_value",
    oracle="""
        WITH stepped AS (
            SELECT user_id,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   CAST(date_diff('microsecond', ts,
                       lead(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id))
                       AS BIGINT) AS dur_us
            FROM events
        )
        SELECT user_id,
               CAST(SUM(cents * dur_us) AS BIGINT) AS weighted_area,
               CAST(SUM(dur_us) AS BIGINT) AS span_us,
               (CAST(SUM(cents * dur_us) AS DOUBLE)
                / CAST(SUM(dur_us) AS DOUBLE)) AS twa_cents
        FROM stepped
        WHERE dur_us IS NOT NULL
        GROUP BY user_id
        HAVING SUM(dur_us) > 0
    """,
    doc=(
        "beyond-reference (temporal analytics): TIME-WEIGHTED "
        "average value per user over irregularly-spaced events "
        "(last-observation-carried-forward integration: each "
        "reading holds until the next one, its weight is that "
        "duration) - the irregular-timeseries mean a plain AVG gets "
        "wrong whenever sampling is bursty (the TimescaleDB "
        "time_weight primitive). Exactness: cents x microsecond "
        "durations are exact bigint products/sums; one final IEEE "
        "division. One window pass per user (the same exchange all "
        "per-user queries share) then a partial-agg groupBy."
    ),
    tags=("temporal", "window", "agg"),
)
def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = events.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        stepped.groupBy("user_id")
        .agg(
            F.sum(F.col("cents") * F.col("dur_us")).alias("weighted_area"),
            F.sum("dur_us").alias("span_us"),
        )
        .filter(F.col("span_us") > 0)
        .select(
            "user_id",
            "weighted_area",
            "span_us",
            (
                F.col("weighted_area").cast("double")
                / F.col("span_us").cast("double")
            ).alias("twa_cents"),
        )
    )


@query(
    "hourly_ohlc",
    oracle="""
        WITH base AS (
            SELECT event_type,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   row_number() OVER (
                       PARTITION BY event_type, date_trunc('hour', ts)
                       ORDER BY ts ASC, event_id ASC) AS rn_open,
                   row_number() OVER (
                       PARTITION BY event_type, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn_close
            FROM events
        )
        SELECT event_type, hour,
               CAST(SUM(CASE WHEN rn_open = 1 THEN cents END)
                    AS BIGINT) AS open_cents,
               max(cents) AS high_cents,
               min(cents) AS low_cents,
               CAST(SUM(CASE WHEN rn_close = 1 THEN cents END)
                    AS BIGINT) AS close_cents,
               count(*) AS n_events
        FROM base
        GROUP BY event_type, hour
    """,
    doc=(
        "beyond-reference (temporal analytics): OHLC / candlestick "
        "rollup per (event_type, hour) - open and close are the "
        "chronologically first/last readings (deterministic "
        "(ts, event_id) tie-break via dual row_numbers, NOT "
        "arg_min/max whose tie behavior is engine-specific), "
        "high/low/volume are plain aggregates; everything in exact "
        "integer cents. The finance-shaped summary every metrics "
        "dashboard draws. Scale: both window passes and the final "
        "aggregate share ONE (event_type, hour) exchange; at 100 TB "
        "this is the standard pre-aggregation the rollup_cascade "
        "then maintains incrementally."
    ),
    tags=("temporal", "window", "agg"),
)
def hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", "ts")
    wa = Window.partitionBy("event_type", hour).orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wd = Window.partitionBy("event_type", hour).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    base = events.select(
        "event_type",
        hour.alias("hour"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.row_number().over(wa).alias("rn_open"),
        F.row_number().over(wd).alias("rn_close"),
    )
    return base.groupBy("event_type", "hour").agg(
        F.sum(F.when(F.col("rn_open") == 1, F.col("cents"))).alias(
            "open_cents"
        ),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.sum(F.when(F.col("rn_close") == 1, F.col("cents"))).alias(
            "close_cents"
        ),
        F.count("*").alias("n_events"),
    )


_EDGES_SQL = """
        SELECT DISTINCT src, dst FROM (
            SELECT lag(CAST(json_extract_string(props, '$.k') AS INTEGER))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS src,
                   CAST(json_extract_string(props, '$.k') AS INTEGER)
                       AS dst
            FROM events
        ) WHERE src IS NOT NULL AND src <> dst
"""


@query(
    "page_reach_bfs",
    oracle=f"""
        WITH RECURSIVE edges AS ({_EDGES_SQL}),
        reach(node, dist) AS (
            SELECT 0 AS node, 0 AS dist
            UNION
            SELECT e.dst, r.dist + 1
            FROM reach r JOIN edges e ON e.src = r.node
            WHERE r.dist < 4
        )
        SELECT node, CAST(min(dist) AS INTEGER) AS distance
        FROM reach
        GROUP BY node
    """,
    doc=(
        "beyond-reference graph analytics: bounded-hop BFS "
        "REACHABILITY - shortest-path distance (<= 4 hops) from page "
        "0 over the deduplicated transition graph, the 'what can a "
        "session reach from here' traversal. Spark side is the "
        "Pregel-on-DataFrames frontier loop (per hop: frontier JOIN "
        "edges -> new frontier minus visited, both localCheckpointed "
        "like dedup_clusters); DuckDB verifies with a genuinely "
        "RECURSIVE CTE - the one query class Spark SQL lacks "
        "natively, expressed as a bounded driver loop instead. "
        "Scale: each hop is one equi-join shuffle on the frontier "
        "(frontier-sized, not graph-sized); hop count bounds the "
        "iteration like every production BFS."
    ),
    tags=("graph", "join"),
)
def page_reach_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.graph import transition_edges

    edges = (
        transition_edges(load_table(spark, sf_dir, "events"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    visited = spark.createDataFrame([(0, 0)], "node int, distance int")
    frontier = visited
    for hop in range(1, 5):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).alias("distance"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.select(F.col("node").cast("int"), F.col("distance").cast("int"))


@query(
    "repurchase_intervals",
    oracle="""
        WITH p AS (
            SELECT user_id, ts, event_id,
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
            FROM events WHERE event_type = 'purchase'
        ),
        gaps AS (
            SELECT date_diff('microsecond', prev, ts) AS gap_us
            FROM p WHERE prev IS NOT NULL
        )
        SELECT count(*) AS n_gaps,
               min(gap_us) AS min_us,
               quantile_cont(gap_us, 0.5) AS p50_us,
               quantile_cont(gap_us, 0.9) AS p90_us,
               max(gap_us) AS max_us
        FROM gaps
    """,
    doc=(
        "beyond-reference (temporal KPI): REPURCHASE-INTERVAL "
        "distribution - the gap between a user's consecutive "
        "purchases (lag per user), summarized with exact "
        "interpolated percentiles over integer microseconds (the "
        "value_quantiles contract). The replenishment-cycle KPI "
        "behind reorder reminders and churn windows (a user 2x past "
        "their p90 interval is churning). One window pass on the "
        "purchase subset; percentile input is one row per repeat "
        "purchase."
    ),
    tags=("temporal", "window", "agg"),
)
def repurchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
            .alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    return gaps.agg(
        F.count("*").alias("n_gaps"),
        F.min("gap_us").alias("min_us"),
        F.percentile("gap_us", 0.5).alias("p50_us"),
        F.percentile("gap_us", 0.9).alias("p90_us"),
        F.max("gap_us").alias("max_us"),
    )


@query(
    "peak_event_rate",
    oracle="""
        WITH b AS (
            SELECT event_type,
                   time_bucket(INTERVAL '15 minutes', ts) AS w,
                   CAST(count(*) AS BIGINT) AS n
            FROM events
            GROUP BY 1, 2
        )
        SELECT event_type, n AS peak_count,
               CAST(w AS TIMESTAMP) AS peak_window
        FROM (
            SELECT event_type, n, w,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY n DESC, w ASC) AS rn
            FROM b
        ) WHERE rn = 1
    """,
    doc=(
        "beyond-reference (temporal ops-KPI): PEAK RATE - each event "
        "type's busiest 15-minute bucket and its count (earliest "
        "window wins ties), the capacity-planning / burst-detection "
        "number behind alert thresholds and autoscaler headroom. "
        "Tumbling-bucket counts then a per-type argmax via "
        "WindowGroupLimit (partial top-1 below the shuffle). At "
        "100 TB the bucket table is minutes x types - the argmax "
        "runs on thousands of rows."
    ),
    tags=("temporal", "window", "agg"),
)
def peak_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    b = events.groupBy(
        "event_type",
        F.window("ts", "15 minutes").alias("w"),
    ).agg(F.count("*").alias("n"))
    rw = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("w.start").asc()
    )
    return (
        b.select(
            "event_type",
            "n",
            F.col("w.start").alias("w_start"),
            F.row_number().over(rw).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n").alias("peak_count"),
            F.col("w_start").alias("peak_window"),
        )
    )
