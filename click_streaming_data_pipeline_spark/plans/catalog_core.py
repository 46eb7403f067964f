"""Core relational catalog: scans, projections/filters (SURVEY 2 B),
aggregations (2 C), sort/limit/pagination (2 D), joins (2 E), scalar
functions (2 G), quality scoring (2 H) — each as a named query with a
DuckDB oracle.

Scale notes are attached per query: the local[32] plan is the same
logical plan a 1000-executor cluster would run; comments call out the
shuffle/broadcast strategy that keeps it viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.quality import (
    MIN_QUALITY_SCORE,
    quality_check_columns,
    quality_oracle_exprs,
)
from ..functions.scalars import uuid7_deterministic
from ..sources import load_table
from ..sources.tables import scan_parallel
from .registry import davg_sql, dsum, dsum_sql, query

# ---------------------------------------------------------------------------
# C. Aggregations — the reference's per-key analytics (Redis INCR/PFADD)


@query(
    "doc_views",
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS doc_key,
               count(*) AS total_views,
               count(DISTINCT user_id) AS unique_views
        FROM events
        GROUP BY 1
    """,
    doc=(
        "C1 total views (cache.py:81-87, analytics.py:36-44) + C2 unique "
        "visitors (cache.py:88-101) + G6 JSON decode (cache.py:42,51); "
        "exact countDistinct variant for the oracle gate"
    ),
    tags=("bench", "flagship", "agg"),
)
def doc_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key view analytics: the reference keeps `views:{id}` counters
    and `unique_views:{id}` HLLs in Redis; here it is one hash
    aggregation. Scale: partial (map-side) aggregation halves the
    shuffle; the key space (~100) is tiny so the reduce side is free.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("int").alias("doc_key"),
            "user_id",
        )
        .groupBy("doc_key")
        .agg(
            F.count("*").alias("total_views"),
            F.countDistinct("user_id").alias("unique_views"),
        )
    )


def _doc_views_approx_oracle() -> str:
    from ..extensions.sketch import hll_oracle_ctes

    key = "CAST(json_extract_string(props, '$.k') AS INTEGER)"
    return f"""
        WITH {hll_oracle_ctes(key)},
        tot AS (
            SELECT {key} AS doc_key, count(*) AS total_views
            FROM events GROUP BY 1
        )
        SELECT t.doc_key, t.total_views,
               coalesce(e.unique_views, 0.0e0) AS unique_views
        FROM tot t LEFT JOIN hll_est e ON t.doc_key IS NOT DISTINCT FROM e.doc_key
    """


@query(
    "doc_views_approx",
    oracle=_doc_views_approx_oracle(),
    doc=(
        "C2 HyperLogLog unique visitors (cache.py:88-94 PFADD/PFCOUNT) "
        "via a DETERMINISTIC pinned-estimator HLL (md5 hash -> register "
        "max -> harmonic estimate, extensions/sketch.py) — the scale "
        "path: mergeable bounded sketch state instead of the exact "
        "distinct's second shuffle, and unlike approx_count_distinct "
        "the estimator replays bit-for-bit in DuckDB, so the sketch "
        "itself sits under the driver value-hash gate; closeness to "
        "exact is a separate error-bound pytest"
    ),
    tags=("agg", "approx"),
)
def doc_views_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-based uniques, rsd ~3.25% (m=1024) — at 100 TB this
    replaces the exact distinct's second shuffle with mergeable
    register state (Redis-PFADD semantics, SURVEY 2 C2): registers
    partial-aggregate map-side, so the key shuffle carries at most
    m rows per key per partition."""
    from ..extensions.sketch import hll_estimate, hll_registers

    events = load_table(spark, sf_dir, "events").select(
        F.get_json_object("props", "$.k").cast("int").alias("doc_key"),
        "user_id",
    )
    regs = hll_registers(events, ["doc_key"], "user_id")
    est = hll_estimate(regs, ["doc_key"]).withColumnRenamed(
        "doc_key", "__ek"
    )
    totals = events.groupBy("doc_key").agg(
        F.count("*").alias("total_views")
    )
    # null-safe join: a NULL doc_key (missing $.k) must still pick up
    # its sketch row, matching the oracle's IS NOT DISTINCT FROM
    return totals.join(
        est, F.col("doc_key").eqNullSafe(F.col("__ek")), "left"
    ).select(
        "doc_key",
        "total_views",
        F.coalesce("unique_views", F.lit(0.0)).alias("unique_views"),
    )


@query(
    "event_type_funnel",
    oracle=f"""
        SELECT event_type,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               {dsum_sql('value', 'total_value')},
               {davg_sql('value', 'avg_value')}
        FROM events
        WHERE event_type <> 'error'
        GROUP BY event_type
    """,
    doc=(
        "B3 op-code drop filter (event main.py:38-40: skip r/d => skip "
        "'error') + C1/C5 counts + weighted sums"
    ),
    tags=("agg", "filter"),
)
def event_type_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type") != "error")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", "total_value"),
            (
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
                / F.count("value")
            ).alias("avg_value"),
        )
    )


@query(
    "pricing_summary",
    oracle=f"""
        SELECT l_returnflag,
               l_linestatus,
               {dsum_sql('l_quantity', 'sum_qty')},
               {dsum_sql('l_extendedprice', 'sum_base_price')},
               {dsum_sql('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
               {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
               {davg_sql('l_quantity', 'avg_qty')},
               {davg_sql('l_extendedprice', 'avg_price')},
               {davg_sql('l_discount', 'avg_disc')},
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc=(
        "C-group aggregation suite (TPC-H Q1 shape) over lineitem; "
        "exercises scan filter pushdown + partial aggregation; the "
        "bench headline scan"
    ),
    tags=("bench", "agg"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide aggregation: 4 sums + 3 means over a pushed-down date
    filter. Scale: map-side partial agg reduces 100 TB of lineitem to
    (#groups x #partitions) rows before the shuffle — the canonical
    Spark-win plan."""
    # single-row-group input: redistribute before the 7 decimal aggs
    li = scan_parallel(load_table(spark, sf_dir, "lineitem"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (
                F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double")
                / F.count("l_quantity")
            ).alias("avg_qty"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast(
                    "double"
                )
                / F.count("l_extendedprice")
            ).alias("avg_price"),
            (
                F.sum(F.col("l_discount").cast("decimal(28,6)")).cast("double")
                / F.count("l_discount")
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# D. Sorts / limits / pagination


@query(
    "paginate_orders",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders
        ORDER BY o_orderdate DESC, o_orderkey ASC
        LIMIT 50 OFFSET 100
    """,
    doc=(
        "D1 ORDER BY ... DESC + OFFSET/LIMIT listing (document "
        "main.py:94-99); unique o_orderkey tie-break makes the page "
        "deterministic (the reference's created_at DESC has uuid7 PK "
        "for the same reason)"
    ),
    tags=("sort",),
)
def paginate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination page 3 (skip 100, take 50). Scale: Spark plans
    TakeOrderedAndProject — each partition top-(150), merge on driver;
    no full sort of 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
        .offset(100)
        .limit(50)
    )


@query(
    "top_orders",
    oracle=f"""
        SELECT l_orderkey,
               {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')},
               o_orderdate,
               o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    doc=(
        "D2 top-k by composite sort (search main.py:116-119) + E2 FK "
        "equi-joins; TPC-H Q3 shape"
    ),
    tags=("bench", "sort", "join"),
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 revenue orders for one segment. Scale: customer filter is
    broadcast to the orders scan; lineitem joins shuffle on orderkey;
    final top-k is TakeOrderedAndProject (no global sort)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# E. Joins


@query(
    "nation_revenue",
    oracle=f"""
        SELECT n_name,
               {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_name
    """,
    doc=(
        "E2 multi-table FK equi-join chain (init-db.sql:55,67 FK "
        "pattern) with broadcast dims; TPC-H Q5 shape"
    ),
    tags=("bench", "join"),
)
def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-way join. Scale: nation/region (25/5 rows at any SF) and
    supplier broadcast; customer⋈orders⋈lineitem shuffle on their FK
    keys; AQE handles any skewed nation."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
    )


@query(
    "signature_exists_semijoin",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM customer
            WHERE c_custkey = o_custkey AND c_acctbal > 9000
        )
    """,
    doc=(
        "E1 existence semi-join: the reference's DocumentExists gRPC "
        "check before signature insert (signature main.py:73-78, "
        "grpc_servicer.py:95-120) as a left-semi join"
    ),
    tags=("join",),
)
def signature_exists_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-based replacement for the per-row RPC existence check.
    Scale: the filtered probe side broadcasts; no per-row round trips."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    rich = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    return orders.join(
        F.broadcast(rich), orders.o_custkey == rich.c_custkey, "left_semi"
    )


@query(
    "orphan_antijoin",
    oracle="""
        SELECT p_partkey, p_name, p_brand
        FROM part
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_partkey = p_partkey AND l_quantity > 45
        )
    """,
    doc=(
        "E1 dead-letter anti-join: rows failing the existence check "
        "(dangling signature document_ids, FIXTURES.md section 3) via "
        "left_anti"
    ),
    tags=("join",),
)
def orphan_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand"
    )
    bulk = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_partkey")
    )
    return part.join(bulk, part.p_partkey == bulk.l_partkey, "left_anti")


@query(
    "enrichment_join",
    oracle="""
        SELECT event_id, user_id, event_type,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS doc_key,
               coalesce(lang, 'unknown') AS doc_lang,
               coalesce(n_chars, 0) AS doc_chars
        FROM events
        LEFT JOIN documents
          ON CAST(json_extract_string(props, '$.k') AS INTEGER) = doc_id
    """,
    doc=(
        "E3 enrichment lookup join: per-event S3 content fetch "
        "(data-quality main.py:35-54,94-108) replaced by a set-based "
        "broadcast join + B6 defaults (event main.py:45-60)"
    ),
    tags=("join",),
)
def enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-side enrichment as a broadcast left join — the 100 TB
    replacement for the reference's per-record S3 GET (25 ms RPC per
    row would be 80 years of wall-clock at 100 TB; one broadcast is
    free)."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "doc_key", F.get_json_object("props", "$.k").cast("int")
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return events.join(
        F.broadcast(docs), events.doc_key == docs.doc_id, "left"
    ).select(
        "event_id",
        "user_id",
        "event_type",
        "doc_key",
        F.coalesce("lang", F.lit("unknown")).alias("doc_lang"),
        F.coalesce("n_chars", F.lit(0)).alias("doc_chars"),
    )


# ---------------------------------------------------------------------------
# B. Projections / filters / validation


@query(
    "projection_defaults",
    oracle="""
        SELECT CAST(doc_id AS VARCHAR) AS id,
               coalesce(substr(text, 1, 64), '') AS title,
               coalesce(lang, 'unknown') AS lang,
               coalesce(source, '') AS source,
               coalesce(n_chars, CAST(0 AS BIGINT)) AS content_size
        FROM documents
    """,
    doc=(
        "B1 projection+rename/reshape (event main.py:44-61) + B6 "
        "default-value projection (event main.py:45-60: value.get(f, "
        "default) => coalesce)"
    ),
    tags=("projection",),
)
def projection_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("id"),
        F.coalesce(F.substring("text", 1, 64), F.lit("")).alias("title"),
        F.coalesce("lang", F.lit("unknown")).alias("lang"),
        F.coalesce("source", F.lit("")).alias("source"),
        F.coalesce("n_chars", F.lit(0).cast("bigint")).alias("content_size"),
    )


@query(
    "constraint_deadletter",
    oracle="""
        SELECT doc_id,
               concat_ws(',',
                 CASE WHEN n_chars > 300 THEN 'too_large' END,
                 CASE WHEN lang NOT IN ('en','es','de','zh','fr')
                      THEN 'bad_lang' END,
                 CASE WHEN length(text) < 10 THEN 'too_short' END
               ) AS violations
        FROM documents
        WHERE n_chars > 300
           OR lang NOT IN ('en','es','de','zh','fr')
           OR length(text) < 10
    """,
    doc=(
        "B7 ingest constraint predicates (schemes.py:7-16 title 1-255, "
        "content<=10MB; init-db.sql:31-43 status domain) -> dead-letter "
        "DataFrame of rejects with reasons"
    ),
    tags=("filter",),
)
def constraint_deadletter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    too_large = F.col("n_chars") > 300
    bad_lang = ~F.col("lang").isin("en", "es", "de", "zh", "fr")
    too_short = F.length("text") < 10
    return docs.filter(too_large | bad_lang | too_short).select(
        "doc_id",
        F.concat_ws(
            ",",
            F.when(too_large, F.lit("too_large")),
            F.when(bad_lang, F.lit("bad_lang")),
            F.when(too_short, F.lit("too_short")),
        ).alias("violations"),
    )


# ---------------------------------------------------------------------------
# H/C4/B8. Quality scoring


def _quality_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.quality import with_quality_columns

    docs = load_table(spark, sf_dir, "documents")
    scored = with_quality_columns(docs)  # fenced: tokenizer runs once
    return scored.select(
        "doc_id",
        *quality_check_columns("text", "n_chars").keys(),
    )


_QUALITY_ORACLE_COLS = ",\n".join(
    f"       ({expr}) AS {name}"
    for name, expr in quality_oracle_exprs("text", "n_chars").items()
)


@query(
    "quality_scores",
    oracle=f"""
        SELECT doc_id,
{_QUALITY_ORACLE_COLS}
        FROM documents
    """,
    doc=(
        "H2 deterministic quality scorer (OpenAIProvider.py:42-176 "
        "semantics, same output contract) + C4 weighted average "
        "(OpenAIProvider.py:154-165) + G11 has_pii (llm/schemas.py:52-55)"
    ),
    tags=("bench", "quality"),
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full quality-check projection: all sub-scores + weighted overall
    + flags, 100% built-in expressions (whole-stage codegen; no UDF)."""
    return _quality_df(spark, sf_dir)


@query(
    "quality_gate",
    oracle=f"""
        SELECT doc_id, quality_score, has_pii FROM (
            SELECT doc_id,
{_QUALITY_ORACLE_COLS}
            FROM documents
        ) WHERE quality_score >= {MIN_QUALITY_SCORE}
    """,
    doc=(
        "B8 quality gate filter (data-quality main.py:119-124, "
        "config.py:22-23 MIN_QUALITY_SCORE=50, BLOCK_LOW_QUALITY)"
    ),
    tags=("quality", "filter"),
)
def quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _quality_df(spark, sf_dir)
        .filter(F.col("quality_score") >= MIN_QUALITY_SCORE)
        .select("doc_id", "quality_score", "has_pii")
    )


# ---------------------------------------------------------------------------
# I4. Last-write-wins / versioned dedup


@query(
    "latest_event_per_user",
    oracle="""
        SELECT user_id, event_id AS last_event_id, ts AS last_ts,
               event_type AS last_event_type
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC
            ) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    doc=(
        "I4 last-write-wins dedup: ES doc-id upsert keyed by id with "
        "max version (event main.py:71-77; main.py:153 version bump) as "
        "a row_number window"
    ),
    tags=("bench", "window"),
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-wins per key. Scale: single hash-partitioned window
    (shuffle on user_id); at 100 TB prefer pre-bucketed storage on the
    key so the shuffle disappears."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
        )
    )


# ---------------------------------------------------------------------------
# G. Scalar function showcases


@query(
    "scalar_text_functions",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS text_bytes,
               length(substr(text, 1, 1024)) AS capped_chars,
               to_base64(encode(substr(text, 1, 16))) AS b64_prefix,
               upper(substr(text, 1, 8)) AS upper_prefix,
               md5(text) AS text_md5
        FROM documents
    """,
    doc=(
        "G2 UTF-8 byte length (main.py:69,76 octet semantics), G7 LLM "
        "input truncation to 1024 (OpenAIProvider.py:44), G12 base64 "
        "payloads (signature models.py:18), fingerprint md5"
    ),
    tags=("scalar",),
)
def scalar_text_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length("text").alias("text_bytes"),
        F.length(F.substring("text", 1, 1024)).alias("capped_chars"),
        F.base64(F.encode(F.substring("text", 1, 16), "utf-8")).alias(
            "b64_prefix"
        ),
        F.upper(F.substring("text", 1, 8)).alias("upper_prefix"),
        F.md5("text").alias("text_md5"),
    )


@query(
    "scalar_time_functions",
    oracle="""
        SELECT event_id,
               strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso_ts,
               epoch_ms(ts) AS ts_millis,
               CAST(hour(ts) AS BIGINT) AS ts_hour,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_day
        FROM events
    """,
    doc=(
        "G4 ISO-8601 formatting (grpc_servicer.py:134-135), G5 "
        "epoch-millis handling (event main.py:94-101, Debezium "
        "time.precision.mode=connect), G3 date_trunc bucketing"
    ),
    tags=("scalar",),
)
def scalar_time_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_ts"),
        F.unix_millis("ts").alias("ts_millis"),
        F.hour("ts").cast("bigint").alias("ts_hour"),
        F.date_trunc("day", "ts").alias("ts_day"),
    )


@query(
    "uuid7_ids",
    oracle="""
        SELECT event_id,
               concat_ws('-',
                 substr(lpad(lower(to_hex(epoch_ms(ts))), 12, '0'), 1, 8),
                 substr(lpad(lower(to_hex(epoch_ms(ts))), 12, '0'), 9, 4),
                 concat('7', substr(md5(CAST(event_id AS VARCHAR)), 1, 3)),
                 concat('8', substr(md5(CAST(event_id AS VARCHAR)), 4, 3)),
                 substr(md5(CAST(event_id AS VARCHAR)), 7, 12)
               ) AS doc_uuid
        FROM events
    """,
    doc=(
        "G1 UUIDv7 time-ordered id generation (document main.py:68, "
        "models.py:26) — deterministic variant so the oracle can verify "
        "layout + time-ordering"
    ),
    tags=("scalar",),
)
def uuid7_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        uuid7_deterministic(F.col("ts"), F.col("event_id")).alias("doc_uuid"),
    )


@query(
    "sql_api_nation_stats",
    oracle="""
        SELECT n_name,
               count(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                   AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    doc=(
        "SQL-API parity: the same engine surface through spark.sql() "
        "over registered temp views (the DataFrame and SQL front-ends "
        "share Catalyst; users of either get identical plans)"
    ),
    tags=("agg", "join", "sql"),
)
def sql_api_nation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name,
               count(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                   AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


@query(
    "rollup_revenue",
    oracle="""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                   AS revenue,
               count(*) AS n_items
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc=(
        "beyond-reference breadth: ROLLUP hierarchy totals "
        "(flag, flag+status, grand total) in one pass - Catalyst "
        "expands to a single shuffle with grouping-id"
    ),
    tags=("agg",),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_extendedprice", "revenue"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_items",
        )
    )


@query(
    "cube_revenue",
    oracle="""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                   AS revenue,
               count(*) AS n_items
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc=(
        "beyond-reference breadth: CUBE grouping sets (every "
        "flag x status combination plus both one-dimension margins "
        "and the grand total) in ONE shuffle — Catalyst expands the "
        "cube to a grouping-id Expand node, not four passes. Both "
        "keys are non-null in lineitem, so coalesce-to-'ALL' labels "
        "the margin rows unambiguously."
    ),
    tags=("agg",),
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_extendedprice", "revenue"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_items",
        )
    )


@query(
    "customer_spend_deciles",
    oracle="""
        WITH spend AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                        AS DOUBLE) AS spend
            FROM orders
            GROUP BY 1
        ),
        ranked AS (
            SELECT spend,
                   ntile(10) OVER (ORDER BY spend DESC, o_custkey)
                       AS decile
            FROM spend
        )
        SELECT decile,
               count(*) AS n_customers,
               CAST(SUM(CAST(spend AS DECIMAL(28,6))) AS DOUBLE)
                   AS total_spend,
               min(spend) AS min_spend,
               max(spend) AS max_spend
        FROM ranked
        GROUP BY 1
    """,
    doc=(
        "beyond-reference breadth: equal-population customer value "
        "deciles (ntile over lifetime spend, ties broken by custkey "
        "for determinism) with per-decile population and spend "
        "bounds. Scale: the customer dimension is unbounded at 100 "
        "TB, so the ntile does NOT run as an ORDER-BY-only window "
        "(Exchange SinglePartition); the rank comes from the "
        "two-phase distributed prefix sum (operators/prefix.py) and "
        "the SQL-standard ntile bucket formula is reproduced in "
        "exact integer arithmetic from (rank, n) — bit-identical to "
        "the oracle's ntile(10), fully parallel."
    ),
    tags=("agg", "window"),
)
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import partitioned_prefix_sum

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(dsum("o_totalprice", "spend"))
    counted = spend.agg(F.count("*").cast("long").alias("n"))
    ranked = (
        partitioned_prefix_sum(
            spend.withColumn("__negspend", -F.col("spend")).withColumn(
                "__one", F.lit(1).cast("long")
            ),
            ["__negspend", "o_custkey"],
            "__one",
            "r",
        )
        .join(F.broadcast(counted))
        .select("spend", "r", "n")
    )
    from ..operators.prefix import ntile_from_rank

    return (
        ranked.withColumn("decile", ntile_from_rank("r", "n", 10))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("spend", "total_spend"),
            F.min("spend").alias("min_spend"),
            F.max("spend").alias("max_spend"),
        )
    )


@query(
    "daily_event_pivot",
    oracle="""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               count(*) FILTER (event_type = 'view') AS view,
               count(*) FILTER (event_type = 'click') AS click,
               count(*) FILTER (event_type = 'purchase') AS purchase,
               count(*) FILTER (event_type = 'signup') AS signup,
               count(*) FILTER (event_type = 'error') AS error
        FROM events
        GROUP BY 1
    """,
    doc=(
        "beyond-reference breadth: pivot (wide per-type daily counts) "
        "- conditional aggregation, one shuffle, no per-type passes"
    ),
    tags=("agg",),
)
def daily_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", ["view", "click", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@query(
    "value_quantiles",
    oracle="""
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90,
               quantile_cont(value, 0.99) AS p99
        FROM events
        GROUP BY event_type
    """,
    doc=(
        "beyond-reference breadth: exact interpolated percentiles per "
        "group (Spark percentile == SQL percentile_cont); the approx "
        "path at 100 TB is percentile_approx/t-digest"
    ),
    tags=("agg",),
)
def value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.9).alias("p90"),
        F.percentile("value", 0.99).alias("p99"),
    )


#: approx-quantile sketch size: 4x value_quantiles_sketch's 512 —
#: tail quantiles (p99) need the finer sample; error O(sqrt(q(1-q)/k))
#: ~ 1.1 % at the median, ~0.2 % at p99
VQ_APPROX_K = 2048

_VQ_APPROX_ORACLE = f"""
        WITH s AS (
            SELECT event_type, value
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY event_type
                ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
            ) <= {VQ_APPROX_K}
        )
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90,
               quantile_cont(value, 0.99) AS p99
        FROM s GROUP BY event_type
"""


@query(
    "value_quantiles_approx",
    oracle=_VQ_APPROX_ORACLE,
    doc=(
        "beyond-reference breadth: APPROXIMATE percentiles per group "
        "via a DETERMINISTIC bottom-k-by-hash (KMV-style) sample, "
        "k=2048 with a p99 tail readout — the mergeable-sketch "
        "sibling of value_quantiles for 100 TB (exact percentile "
        "needs the full value multiset per group; the min-k sample "
        "is bounded-size and merges across partitions by 'k smallest "
        "of the union'). Unlike percentile_approx (GK internals are "
        "engine-specific, so it can never be value-proven), the "
        "pinned-hash sample replays bit-for-bit in DuckDB — full "
        "value-hash oracle; GK itself stays as an in-test conformance "
        "probe, and closeness to the exact quantiles is error-bounded "
        "in pytest. Plan: one WindowGroupLimit pass (partial top-k "
        "before the shuffle), never a global sort."
    ),
    tags=("agg",),
)
def value_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog_robust import _qsketch_estimate, _qsketch_sample

    events = load_table(spark, sf_dir, "events")
    sample = _qsketch_sample(events, k=VQ_APPROX_K)
    return _qsketch_estimate(
        sample, quantiles=((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
    )


@query(
    "value_stats",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_v,
               CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
                   AS sum_sq,
               ((CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
                 - CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   * CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   / count(*))
                / (count(*) - 1)) AS variance
        FROM events
        GROUP BY event_type
    """,
    doc=(
        "beyond-reference breadth: moment statistics from decimal-"
        "exact sums (sum, sum-of-squares -> sample variance) - "
        "engine-independent bits where builtin var_samp (Welford) "
        "would drift in the last ulp across engines"
    ),
    tags=("agg",),
)
def value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    sum_v = F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
    sum_sq = F.sum(
        (F.col("value") * F.col("value")).cast("decimal(28,6)")
    ).cast("double")
    n = F.count("*")
    return events.groupBy("event_type").agg(
        n.alias("n"),
        sum_v.alias("sum_v"),
        sum_sq.alias("sum_sq"),
        ((sum_sq - sum_v * sum_v / n) / (n - F.lit(1))).alias("variance"),
    )


@query(
    "user_activity_timeline",
    oracle="""
        SELECT user_id, event_id, ts,
               epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   AS micros_since_prev,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS DOUBLE) AS running_value,
               lead(event_type) OVER w AS next_event_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc=(
        "beyond-reference breadth: per-user timeline analytics - "
        "lag/lead navigation and decimal-exact running sums in one "
        "window pass (one shuffle on user_id)"
    ),
    tags=("window",),
)
def user_activity_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return events.select(
        "user_id",
        "event_id",
        "ts",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("micros_since_prev"),
        F.sum(F.col("value").cast("decimal(28,6)"))
        .over(wsum)
        .cast("double")
        .alias("running_value"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@query(
    "repeat_customers",
    oracle="""
        SELECT o_custkey AS custkey FROM orders
        WHERE o_orderdate < TIMESTAMP '1997-01-01'
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    """,
    doc=(
        "beyond-reference breadth: INTERSECT set operation - customers "
        "active in both the early and late era (Catalyst plans it as a "
        "left-semi join over distincts)"
    ),
    tags=("agg", "join"),
)
def repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    early = orders.filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    late = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    return early.intersect(late)


@query(
    "lapsed_customers",
    oracle="""
        SELECT o_custkey AS custkey FROM orders
        WHERE o_orderdate < TIMESTAMP '1997-01-01'
        EXCEPT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    """,
    doc=(
        "beyond-reference breadth: EXCEPT set operation - early-era "
        "customers with no late-era orders (left-anti join over "
        "distincts)"
    ),
    tags=("agg", "join"),
)
def lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    early = orders.filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    late = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    return early.subtract(late)


@query(
    "value_anomalies",
    oracle="""
        WITH stats AS (
            SELECT event_type,
                   count(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                       AS sum_v,
                   CAST(SUM(CAST(value * value AS DECIMAL(28,6)))
                        AS DOUBLE) AS sum_sq
            FROM events
            GROUP BY event_type
        ),
        scored AS (
            SELECT e.event_id, e.event_type, e.value,
                   (e.value - s.sum_v / s.n)
                       / sqrt((s.sum_sq - s.sum_v * s.sum_v / s.n)
                              / (s.n - 1)) AS zscore
            FROM events e JOIN stats s USING (event_type)
        )
        SELECT event_id, event_type, value, zscore
        FROM scored
        WHERE zscore > CAST(3.0 AS DOUBLE)
           OR zscore < CAST(-3.0 AS DOUBLE)
    """,
    doc=(
        "beyond-reference breadth: per-type z-score anomaly flagging "
        "— two-pass plan (decimal-exact moment stats per type, "
        "type-bounded -> broadcast back, score every event in one "
        "codegen'd expression). The monitoring query a clickstream "
        "pipeline runs on itself; decimal sums keep the mean/variance "
        "bit-identical across engines (value_stats convention)."
    ),
    tags=("agg",),
)
def value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(28,6)"))
        .cast("double")
        .alias("sum_v"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,6)"))
        .cast("double")
        .alias("sum_sq"),
    )
    mean = F.col("sum_v") / F.col("n")
    var = (F.col("sum_sq") - F.col("sum_v") * F.col("sum_v") / F.col("n")) / (
        F.col("n") - 1
    )
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        events.join(F.broadcast(stats), "event_type")
        .withColumn("zscore", z)
        .filter((F.col("zscore") > 3.0) | (F.col("zscore") < -3.0))
        .select("event_id", "event_type", "value", "zscore")
    )


@query(
    "rolling_hour_value",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL '1 hour' PRECEDING
                         AND CURRENT ROW
               ) AS DOUBLE) AS rolling_value,
               COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL '1 hour' PRECEDING
                         AND CURRENT ROW
               ) AS rolling_events
        FROM events
    """,
    doc=(
        "beyond-reference breadth: TIME-RANGE window frames — per "
        "user, the trailing-1-hour value sum and event count at every "
        "event (RANGE BETWEEN INTERVAL frames, the event-time sibling "
        "of the ROWS frames in user_activity_timeline); one shuffle "
        "on user_id, decimal-exact sums. Ties in ts are absorbed by "
        "the RANGE frame (peers aggregate together), so the result "
        "is deterministic without an event_id tie-break."
    ),
    tags=("window",),
)
def rolling_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # RANGE frames over timestamps: order by the epoch scalar and
    # bound by seconds (Spark's rangeBetween takes numeric bounds)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("rolling_value"),
        F.count("*").over(w).alias("rolling_events"),
    )


@query(
    "priority_order_counts",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = 'R'
          )
        GROUP BY o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape: EXISTS decorrelated to a semi-join — "
        "returned lineitems (the test schema's stand-in for Q4's "
        "late-delivery predicate) project to keys only before the "
        "join (column-pruned probe side), the quarter filter pushes "
        "to the orders scan, and the priority groupBy is tiny. The "
        "join-family sibling of signature_exists_semijoin on a "
        "fact-to-fact correlation."
    ),
    tags=("join", "agg"),
)
def priority_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    q = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    return (
        q.join(late, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "customer_order_distribution",
    oracle="""
        WITH per_cust AS (
            SELECT c.c_custkey,
                   count(o.o_orderkey) AS n_orders
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        SELECT n_orders, count(*) AS n_customers
        FROM per_cust GROUP BY n_orders
    """,
    doc=(
        "TPC-H Q13 shape: customer order-count DISTRIBUTION — outer "
        "join that must preserve zero-order customers (count over the "
        "null-extended side), then a second tiny histogram aggregate. "
        "The canonical left-outer + double-aggregation pattern; the "
        "priority predicate filters the orders side BEFORE the join "
        "(pushed to the scan), which is only legal on the preserved "
        "side of an outer join — the planner subtlety Q13 exists to "
        "exercise."
    ),
    tags=("join", "agg"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(
            orders, cust.c_custkey == orders.o_custkey, "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count("*").alias("n_customers")
    )


@query(
    "large_quantity_orders",
    oracle=f"""
        WITH big AS (
            SELECT l_orderkey,
                   {dsum_sql('l_quantity', 'sum_qty')}
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)))
                        AS DOUBLE) > CAST(300.0 AS DOUBLE)
        )
        SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, b.sum_qty
        FROM big b
        JOIN orders o ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 20
    """,
    doc=(
        "TPC-H Q18 shape: large-quantity orders — the HAVING-on-SUM "
        "group filter runs FIRST on the widest table (map-side "
        "partial sums, then the filter kills ~all groups before any "
        "join), the surviving handful of keys join back to orders and "
        "customer (both join inputs now tiny => broadcast-able), "
        "top-k by total price with the unique orderkey tie-break. "
        "Exact-decimal sums keep the HAVING threshold and output "
        "bit-identical across engines."
    ),
    tags=("join", "agg", "topk"),
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 300.0)
    )
    return (
        big.join(
            orders, big.l_orderkey == orders.o_orderkey
        )
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "revenue_grouping_sets",
    oracle=f"""
        WITH base AS (
            SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
                   o_totalprice
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
        )
        SELECT n_name, o_year,
               CAST(GROUPING(n_name) AS INT) AS g_nation,
               CAST(GROUPING(o_year) AS INT) AS g_year,
               count(*) AS n_orders,
               {dsum_sql('o_totalprice', 'revenue')}
        FROM base
        GROUP BY GROUPING SETS ((n_name, o_year), (n_name), (o_year), ())
    """,
    doc=(
        "analytics breadth: GROUPING SETS over (nation, year) — the "
        "general form of rollup_revenue's hierarchy (detail, each "
        "single-axis margin, grand total in ONE pass over the join; "
        "Spark expands sets map-side, so the fact is read once, not "
        "once per set). GROUPING() markers disambiguate real NULLs "
        "from margin rows; exact-decimal sums keep every margin "
        "bit-identical across engines."
    ),
    tags=("agg",),
)
def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            F.year("o_orderdate").cast("int").alias("o_year"),
            "o_totalprice",
        )
    )
    return (
        base.groupingSets(
            [["n_name", "o_year"], ["n_name"], ["o_year"], []],
            "n_name",
            "o_year",
        )
        .agg(
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.grouping("o_year").cast("int").alias("g_year"),
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "revenue"),
        )
        .select(
            "n_name", "o_year", "g_nation", "g_year", "n_orders", "revenue"
        )
    )


@query(
    "customer_value_deciles",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               CAST(ntile(10) OVER w AS INT) AS decile,
               CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank,
               CAST(cume_dist() OVER w AS DOUBLE) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal, c_custkey)
    """,
    doc=(
        "analytics breadth: distribution-rank window family — "
        "ntile/percent_rank/cume_dist per market segment. Scale: a "
        "PARTITION BY window caps parallelism at the number of "
        "segments and dies when one segment outgrows a task, so the "
        "per-segment rank comes from the GROUPED distributed prefix "
        "sum (operators/prefix.py::grouped_prefix_sum — a giant "
        "group spans range partitions; offsets align per (group, "
        "partition)); ntile/percent_rank/cume_dist are then exact "
        "integer reconstructions + single IEEE divisions of the "
        "same small integers the window functions divide — "
        "bit-identical to the oracle's window forms under the total "
        "(acctbal, custkey) order."
    ),
    tags=("window",),
)
def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import grouped_prefix_sum, ntile_from_rank

    cust = load_table(spark, sf_dir, "customer")
    seg_n = cust.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n")
    )
    ranked = grouped_prefix_sum(
        cust.withColumn("__one", F.lit(1).cast("long")),
        ["c_mktsegment"],
        ["c_acctbal", "c_custkey"],
        "__one",
        "r",
    ).join(F.broadcast(seg_n), "c_mktsegment")
    return ranked.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        ntile_from_rank("r", "n", 10).alias("decile"),
        (
            (F.col("r") - 1).cast("double") / (F.col("n") - 1).cast("double")
        ).alias("pct_rank"),
        (F.col("r").cast("double") / F.col("n").cast("double")).alias(
            "cume"
        ),
    )


@query(
    "cheapest_supplier",
    oracle="""
        WITH r AS (
            SELECT l_partkey, l_extendedprice, l_suppkey,
                   row_number() OVER (
                       PARTITION BY l_partkey
                       ORDER BY l_extendedprice, l_suppkey) AS rn
            FROM lineitem
        )
        SELECT r.l_partkey, p.p_name,
               r.l_extendedprice AS best_price,
               s.s_name AS best_supplier
        FROM r
        JOIN part p ON p.p_partkey = r.l_partkey
        JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE rn = 1
    """,
    doc=(
        "TPC-H Q2 shape: min-per-group with ARGUMENT recovery — the "
        "cheapest (price, supplier) per part. Spark side is "
        "min(struct(price, suppkey)): a lexicographic struct-min that "
        "runs as a PARTIAL aggregate (map-side combine, one shuffle "
        "of one row per part) instead of the window-sort the naive "
        "row_number form pays; the oracle keeps the row_number "
        "formulation to prove they're the same function. Unique "
        "suppkey tie-break makes the argmin total."
    ),
    tags=("join", "agg"),
)
def cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_suppkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    best = (
        li.groupBy("l_partkey")
        .agg(
            F.min(F.struct("l_extendedprice", "l_suppkey")).alias("__m")
        )
        .select(
            "l_partkey",
            F.col("__m.l_extendedprice").alias("best_price"),
            F.col("__m.l_suppkey").alias("l_suppkey"),
        )
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(supp, best.l_suppkey == supp.s_suppkey)
        .select(
            "l_partkey",
            "p_name",
            "best_price",
            F.col("s_name").alias("best_supplier"),
        )
    )


@query(
    "price_quantity_correlation",
    oracle="""
        WITH d AS (
            SELECT l_returnflag,
                   CAST(l_extendedprice AS DECIMAL(38,2)) AS p,
                   CAST(l_quantity AS DECIMAL(38,2)) AS q
            FROM lineitem
        )
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(floor(
                   (CAST(count(*) AS DOUBLE) * CAST(sum(p * q) AS DOUBLE)
                    - CAST(sum(p) AS DOUBLE) * CAST(sum(q) AS DOUBLE))
                   / (sqrt(CAST(count(*) AS DOUBLE)
                               * CAST(sum(p * p) AS DOUBLE)
                           - CAST(sum(p) AS DOUBLE)
                             * CAST(sum(p) AS DOUBLE))
                      * sqrt(CAST(count(*) AS DOUBLE)
                                 * CAST(sum(q * q) AS DOUBLE)
                             - CAST(sum(q) AS DOUBLE)
                               * CAST(sum(q) AS DOUBLE)))
                   * CAST(1000000000.0 AS DOUBLE)
                   + CAST(0.5 AS DOUBLE)
               ) AS BIGINT) AS pearson_nano
        FROM d
        GROUP BY l_returnflag
    """,
    doc=(
        "beyond-reference statistics: PEARSON CORRELATION from decimal-"
        "exact co-moments (inputs cast to DECIMAL(18,2) BEFORE "
        "multiplying, so all five sums are exact). The ratio itself is "
        "emitted at fixed 1e-9 resolution (floor(r*1e9+0.5) integer): "
        "sum(p*p)'s scaled integer exceeds 2^53, where DuckDB's "
        "int128->double conversion double-rounds while Java BigDecimal "
        "rounds once - a half-ulp divergence no expression ordering "
        "can remove, so the spec quantizes below it (same rational-"
        "space convention as the LM scores)"
    ),
    tags=("agg",),
)
def price_quantity_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DECIMAL(38,2), not (18,2): DuckDB multiplies DECIMAL(18)s in
    # int64 and overflows on large-but-valid prices (~1e13 x qty);
    # width 38 keeps both engines in int128 exactness
    li = scan_parallel(load_table(spark, sf_dir, "lineitem"))
    p = F.col("l_extendedprice").cast("decimal(38,2)")
    q = F.col("l_quantity").cast("decimal(38,2)")
    d = lambda c: F.sum(c).cast("double")  # noqa: E731
    n = F.count("*").cast("double")
    sx, sy = d(p), d(q)
    sxy, sxx, syy = d(p * q), d(p * p), d(q * q)
    r = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    nano = F.floor(r * F.lit(1_000_000_000.0) + F.lit(0.5)).cast("long")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), nano.alias("pearson_nano")
    )


@query(
    "value_histogram",
    oracle="""
        WITH bounds AS (
            SELECT min(value) AS lo, max(value) AS hi FROM events
        ),
        b AS (
            SELECT least(CAST(floor((value - lo) / ((hi - lo) /
                       CAST(20.0 AS DOUBLE))) AS BIGINT), 19) AS bucket,
                   value
            FROM events, bounds
        )
        SELECT bucket,
               CAST(count(*) AS BIGINT) AS n,
               min(value) AS bucket_min,
               max(value) AS bucket_max
        FROM b
        GROUP BY bucket
    """,
    doc=(
        "beyond-reference statistics: equal-width HISTOGRAM (20 "
        "buckets over the observed range) - two-pass shape: the "
        "min/max bounds reduce to ONE broadcast row, bucketing is a "
        "pure expression, counts partial-aggregate; the profile "
        "companion to value_quantiles' equal-frequency view"
    ),
    tags=("agg",),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(20.0)
    bucket = F.least(
        F.floor((F.col("value") - F.col("lo")) / width).cast("long"),
        F.lit(19).cast("long"),
    )
    return (
        ev.join(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("bucket_min"),
            F.max("value").alias("bucket_max"),
        )
    )


@query(
    "variant_props_extract",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT)
                   AS doc_key,
               CAST(json_valid(props) AS BOOLEAN) AS is_valid_json
        FROM events
    """,
    doc=(
        "G6 JSON decode on the modern path: props parsed ONCE into a "
        "binary VARIANT (Spark 4 parse_json), then typed "
        "variant_get extraction — at scale this replaces N repeated "
        "get_json_object string re-parses with one parse + cheap "
        "binary probes, and parquet variant shredding pushes the "
        "extraction into the scan. try_parse_json nullity doubles as "
        "the validity predicate (B7's malformed-input gate)."
    ),
    tags=("scalar",),
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return scan_parallel(events).select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("doc_key"),
        F.try_parse_json("props").isNotNull().alias("is_valid_json"),
    )


@query(
    "daily_event_unpivot",
    oracle="""
        WITH wide AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   count(*) FILTER (event_type = 'view') AS view,
                   count(*) FILTER (event_type = 'click') AS click,
                   count(*) FILTER (event_type = 'purchase') AS purchase,
                   count(*) FILTER (event_type = 'signup') AS signup,
                   count(*) FILTER (event_type = 'error') AS error
            FROM events
            GROUP BY 1
        )
        SELECT day, event_type, n
        FROM wide
        UNPIVOT (n FOR event_type IN (view, click, purchase, signup, error))
    """,
    doc=(
        "beyond-reference breadth: UNPIVOT/melt — the wide daily-"
        "count frame from daily_event_pivot folded back to long form "
        "via DataFrame.unpivot (the Spark melt API; Expand node, no "
        "shuffle beyond the source aggregate). Pivot→unpivot is the "
        "reshape round-trip every metrics store needs in both "
        "directions"
    ),
    tags=("agg",),
)
def daily_event_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = daily_event_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["day"],
        values=["view", "click", "purchase", "signup", "error"],
        variableColumnName="event_type",
        valueColumnName="n",
    )


_SQL_FUNNEL = """
    WITH firsts AS (
        SELECT user_id, event_type, min(ts) AS first_ts
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
        GROUP BY user_id, event_type
    ),
    per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN first_ts END)
                   AS v_ts,
               min(CASE WHEN event_type = 'click' THEN first_ts END)
                   AS c_ts,
               min(CASE WHEN event_type = 'purchase' THEN first_ts END)
                   AS p_ts
        FROM firsts
        GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(SUM(CASE WHEN v_ts IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
           CAST(SUM(CASE WHEN v_ts IS NOT NULL AND c_ts > v_ts
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after,
           CAST(SUM(CASE WHEN v_ts IS NOT NULL AND c_ts > v_ts
                              AND p_ts > c_ts
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purchased_after
    FROM per_user
"""


@query(
    "sql_api_funnel",
    oracle=_SQL_FUNNEL,
    doc=(
        "SQL-API parity, complex-query form: the ordered "
        "view->click->purchase funnel written ENTIRELY in SQL "
        "(chained CTEs, conditional aggregation) and executed via "
        "spark.sql() over the registered temp views - the SAME text "
        "DuckDB runs as the oracle, proving the ANSI surface is "
        "engine-portable beyond single-block queries. Catalyst "
        "plans the CTE chain identically to the DataFrame funnel "
        "(partial aggs, one user_id exchange)."
    ),
    tags=("agg", "sql", "window"),
)
def sql_api_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_SQL_FUNNEL)


@query(
    "paginate_orders_keyset",
    # the page is row 101-150 of the (o_orderdate DESC, o_orderkey
    # ASC) order — same rows as paginate_orders, fetched by KEYSET
    oracle="""
        WITH last_key AS (
            SELECT o_orderdate AS kd, o_orderkey AS kk
            FROM orders
            ORDER BY o_orderdate DESC, o_orderkey ASC
            LIMIT 1 OFFSET 99
        )
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders, last_key
        WHERE o_orderdate < kd
           OR (o_orderdate = kd AND o_orderkey > kk)
        ORDER BY o_orderdate DESC, o_orderkey ASC
        LIMIT 50
    """,
    doc=(
        "D1 at scale: KEYSET pagination - the page after cursor "
        "(last_date, last_key) is fetched with a composite-key "
        "predicate + LIMIT, NOT OFFSET. Offset pagination reads and "
        "discards every skipped row (page 10000 of a 100 TB listing "
        "scans 10000 pages); the keyset predicate pushes into the "
        "scan (min/max pruning on the date column skips whole files) "
        "and every page costs one TakeOrderedAndProject of page-size "
        "rows. Must return exactly paginate_orders' page-3 rows - "
        "the oracle derives the cursor then applies the predicate, "
        "pinning the equivalence."
    ),
    tags=("sort", "scan"),
)
def paginate_orders_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cursor = (
        orders.orderBy(
            F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
        )
        .offset(99)
        .limit(1)
        .select(
            F.col("o_orderdate").alias("kd"),
            F.col("o_orderkey").alias("kk"),
        )
    )
    return (
        orders.crossJoin(F.broadcast(cursor))
        .filter(
            (F.col("o_orderdate") < F.col("kd"))
            | (
                (F.col("o_orderdate") == F.col("kd"))
                & (F.col("o_orderkey") > F.col("kk"))
            )
        )
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
        .limit(50)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
    )


@query(
    "utf8_semantics",
    oracle="""
        SELECT s,
               CAST(length(s) AS INT) AS n_chars,
               CAST(octet_length(encode(s)) AS INT) AS n_bytes,
               substr(s, 2, 2) AS chars_2_3,
               upper(s) AS uppered
        FROM (VALUES
            ('ascii only'),
            ('héllo wörld'),
            ('日本語テキスト'),
            ('mixed 混合 text'),
            ('emoji 🙂 here'),
            ('Ångström Å')
        ) AS t(s)
    """,
    doc=(
        "G2 i18n semantics pinned: character length vs UTF-8 byte "
        "length, character-addressed substring, and case mapping "
        "over multibyte text (accents, CJK, astral-plane emoji) - "
        "the content-size constraint in the reference is BYTES "
        "(schemes.py:12-16 content <= 10MB utf-8) while display "
        "truncation is CHARACTERS (G7), and conflating them corrupts "
        "multibyte documents at the boundary. The corpus here is "
        "ASCII, so this VALUES-based probe is what proves the "
        "engine's string stack is char/byte-correct for real-world "
        "text. (Note: 🙂 counts as ONE character in both engines - "
        "codepoint semantics, not UTF-16 code units.)"
    ),
    tags=("scalar",),
)
def utf8_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [
        ("ascii only",),
        ("héllo wörld",),
        ("日本語テキスト",),
        ("mixed 混合 text",),
        ("emoji 🙂 here",),
        ("Ångström Å",),
    ]
    df = spark.createDataFrame(rows, "s string")
    return df.select(
        "s",
        F.length("s").cast("int").alias("n_chars"),
        F.octet_length("s").cast("int").alias("n_bytes"),
        F.substring("s", 2, 2).alias("chars_2_3"),
        F.upper("s").alias("uppered"),
    )


@query(
    "null_semantics",
    oracle="""
        WITH t(g, x) AS (VALUES
            ('a', 1), ('a', NULL), ('a', 3),
            ('b', NULL), ('b', NULL),
            ('c', 7)
        )
        SELECT g,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(x) AS BIGINT) AS n_nonnull,
               CAST(sum(x) AS BIGINT) AS sum_skips_nulls,
               CAST(min(x) AS INT) AS min_skips_nulls,
               CAST(sum(CASE WHEN x IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
               (CAST(NULL AS INT) = CAST(NULL AS INT)) IS NULL
                   AS null_eq_is_unknown,
               CAST(coalesce(min(x), -1) AS INT) AS coalesced_min
        FROM t
        GROUP BY g
    """,
    doc=(
        "ANSI NULL semantics pinned: count(*) vs count(col), "
        "null-skipping aggregates (sum/min over all-NULL groups "
        "yield NULL, not 0), NULL = NULL evaluating to UNKNOWN "
        "rather than true, and coalesce defaulting - the SQL-92 "
        "corners where home-grown engines silently diverge and "
        "where the reference's defensive value.get(field, default) "
        "pattern (B6, event main.py:45-60) lives. VALUES-based "
        "probe: every behavior is driver-hash-pinned against "
        "DuckDB's reading of the standard."
    ),
    tags=("scalar", "agg"),
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [
        ("a", 1), ("a", None), ("a", 3),
        ("b", None), ("b", None),
        ("c", 7),
    ]
    t = spark.createDataFrame(rows, "g string, x int")
    return t.groupBy("g").agg(
        F.count("*").alias("n_rows"),
        F.count("x").alias("n_nonnull"),
        F.sum("x").cast("bigint").alias("sum_skips_nulls"),
        F.min("x").cast("int").alias("min_skips_nulls"),
        F.sum(F.when(F.col("x").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nulls"),
        (
            F.lit(None).cast("int") == F.lit(None).cast("int")
        ).isNull().alias("null_eq_is_unknown"),
        F.coalesce(F.min("x"), F.lit(-1)).cast("int").alias(
            "coalesced_min"
        ),
    )


@query(
    "date_arithmetic_semantics",
    oracle="""
        WITH t(d) AS (VALUES
            (DATE '2024-01-31'),
            (DATE '2024-02-29'),
            (DATE '2023-02-28'),
            (DATE '2024-12-31'),
            (DATE '2024-03-15')
        )
        SELECT d,
               (d + INTERVAL 1 MONTH)::DATE AS plus_month,
               (d + INTERVAL 1 YEAR)::DATE AS plus_year,
               (d - INTERVAL 90 DAY)::DATE AS minus_90d,
               CAST(date_part('isodow', d) AS INT) AS iso_dow,
               CAST(date_part('week', d) AS INT) AS iso_week,
               CAST(last_day(d) AS DATE) AS month_end
        FROM t
    """,
    doc=(
        "calendar arithmetic pinned: month addition CLAMPS at "
        "month-end (Jan 31 + 1 month = Feb 29 in a leap year, not "
        "Mar 2), year addition from Feb 29 clamps to Feb 28, day "
        "arithmetic is exact, ISO day-of-week/week numbering, and "
        "last_day - the calendar corners every retention/billing "
        "query silently depends on. Both engines implement the "
        "clamping convention identically; the driver hash pins it "
        "so a regression in either engine's calendar logic (or a "
        "future port to another backend) surfaces as a red row "
        "instead of drifted monthly cohorts."
    ),
    tags=("scalar", "temporal"),
)
def date_arithmetic_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt

    rows = [
        (_dt.date(2024, 1, 31),),
        (_dt.date(2024, 2, 29),),
        (_dt.date(2023, 2, 28),),
        (_dt.date(2024, 12, 31),),
        (_dt.date(2024, 3, 15),),
    ]
    t = spark.createDataFrame(rows, "d date")
    return t.select(
        "d",
        F.add_months("d", 1).alias("plus_month"),
        F.add_months("d", 12).alias("plus_year"),
        F.date_sub("d", 90).alias("minus_90d"),
        F.dayofweek("d").alias("__raw_dow"),
        F.weekofyear("d").cast("int").alias("iso_week"),
        F.last_day("d").alias("month_end"),
    ).select(
        "d",
        "plus_month",
        "plus_year",
        "minus_90d",
        # Spark dayofweek: 1=Sunday..7; ISO dow: 1=Monday..7
        F.when(F.col("__raw_dow") == 1, 7)
        .otherwise(F.col("__raw_dow") - 1)
        .cast("int")
        .alias("iso_dow"),
        "iso_week",
        "month_end",
    )


@query(
    "numeric_semantics",
    oracle="""
        WITH t(a, b) AS (VALUES
            (-7, 2), (7, 2), (7, -2), (-7, -2), (0, 5)
        )
        SELECT a, b,
               CAST(a // b AS INT) AS int_div,
               CAST(a % b AS INT) AS int_mod,
               CAST(floor(CAST(a AS DOUBLE) / b + 0.5) AS INT)
                   AS rounded_ratio,
               CAST(9223372036854775807 - 1 AS BIGINT) AS bigint_edge
        FROM t
    """,
    doc=(
        "integer/float semantics pinned: integer division truncates "
        "toward zero and modulo takes the DIVIDEND's sign in both "
        "engines (the C convention - a floor-division engine would "
        "flip negative results and silently shift every modulo-"
        "bucketed partition); rounding uses the repo's floor(x+0.5) "
        "spec (engines disagree on round()'s half-handling, so the "
        "catalog never calls it - this row documents the convention "
        "under driver hash); and int64 boundary arithmetic. "
        "Deliberately NOT probed: division by zero, where the "
        "engines genuinely diverge (Spark 4 ANSI mode raises "
        "DIVIDE_BY_ZERO; DuckDB returns IEEE infinity) - the "
        "catalog guards every division's denominator instead of "
        "relying on either behavior. The arithmetic contract every "
        "hash-partitioner, bucketer and cent-space query in this "
        "catalog stands on."
    ),
    tags=("scalar",),
)
def numeric_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [(-7, 2), (7, 2), (7, -2), (-7, -2), (0, 5)]
    t = spark.createDataFrame(rows, "a int, b int")
    return t.select(
        "a",
        "b",
        F.expr("div(a, b)").cast("int").alias("int_div"),
        (F.col("a") % F.col("b")).cast("int").alias("int_mod"),
        F.floor(F.col("a").cast("double") / F.col("b") + 0.5)
        .cast("int")
        .alias("rounded_ratio"),
        (F.lit(9223372036854775807).cast("long") - 1).alias(
            "bigint_edge"
        ),
    )


@query(
    "window_frame_semantics",
    oracle="""
        WITH t(id, g, k, v) AS (VALUES
            (1, 'a', 10, 100), (2, 'a', 10, 200), (3, 'a', 11, 300),
            (4, 'a', 13, 400), (5, 'b', 5, 10), (6, 'b', 5, 20),
            (7, 'b', 9, 30)
        )
        SELECT id,
               CAST(sum(v) OVER (PARTITION BY g ORDER BY k)
                    AS BIGINT) AS run_sum_peers,
               CAST(sum(v) OVER (PARTITION BY g ORDER BY id
                    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
                    AS BIGINT) AS rows_sum,
               CAST(sum(v) OVER (PARTITION BY g ORDER BY k
                    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS range_sum,
               CAST(lead(v, 1, -1) OVER (PARTITION BY g ORDER BY id)
                    AS INT) AS lead_v,
               CAST(lag(v, 2, -99) OVER (PARTITION BY g ORDER BY id)
                    AS INT) AS lag_v,
               CAST(last_value(v) OVER (PARTITION BY g ORDER BY id)
                    AS INT) AS last_default_frame,
               CAST(last_value(v) OVER (PARTITION BY g ORDER BY id
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND UNBOUNDED FOLLOWING) AS INT) AS last_full,
               CAST(nth_value(v, 2) OVER (PARTITION BY g ORDER BY id)
                    AS INT) AS nth2_default_frame
        FROM t
    """,
    doc=(
        "window FRAME semantics pinned: the default frame with ORDER "
        "BY is RANGE UNBOUNDED PRECEDING..CURRENT ROW, so a running "
        "sum over duplicate sort keys includes ALL PEERS (ids 1,2 "
        "both see 300 - the corner that silently inflates running "
        "totals, and why every catalog running-sum orders by a "
        "unique key); ROWS frames address physical neighbors; RANGE "
        "frames with numeric offsets address VALUES (k=11 reaches "
        "back to k=10's two rows; k=13 reaches nothing); last_value "
        "under the default frame returns the CURRENT row's value "
        "(the classic gotcha - the full-frame variant returns the "
        "partition max id's), and nth_value is NULL until the frame "
        "holds n rows. lead/lag defaults fire at partition edges. "
        "Driver-hash-pinned against DuckDB's reading of SQL:2003."
    ),
    tags=("window", "scalar"),
)
def window_frame_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    rows = [
        (1, "a", 10, 100), (2, "a", 10, 200), (3, "a", 11, 300),
        (4, "a", 13, 400), (5, "b", 5, 10), (6, "b", 5, 20),
        (7, "b", 9, 30),
    ]
    t = spark.createDataFrame(rows, "id int, g string, k int, v int")
    by_k = W.partitionBy("g").orderBy("k")
    by_id = W.partitionBy("g").orderBy("id")
    return t.select(
        "id",
        F.sum("v").over(by_k).cast("bigint").alias("run_sum_peers"),
        F.sum("v")
        .over(by_id.rowsBetween(-1, 1))
        .cast("bigint")
        .alias("rows_sum"),
        F.sum("v")
        .over(by_k.rangeBetween(-1, 0))
        .cast("bigint")
        .alias("range_sum"),
        F.lead("v", 1, -1).over(by_id).cast("int").alias("lead_v"),
        F.lag("v", 2, -99).over(by_id).cast("int").alias("lag_v"),
        F.last("v").over(by_id).cast("int").alias("last_default_frame"),
        F.last("v")
        .over(by_id.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("int")
        .alias("last_full"),
        F.nth_value("v", 2)
        .over(by_id)
        .cast("int")
        .alias("nth2_default_frame"),
    )


@query(
    "array_higher_order_semantics",
    oracle="""
        WITH t(id, a) AS (VALUES
            (1, [3, 1, 2]),
            (2, [5]),
            (3, [2, 2, 4, 6]),
            (4, CAST([] AS INTEGER[]))
        )
        SELECT id,
               CAST(len(a) AS INT) AS n,
               CAST(list_sum(list_transform(a, x -> x * x))
                    AS BIGINT) AS sum_squares,
               CAST(len(list_filter(a, x -> x % 2 = 0)) AS INT)
                   AS n_even,
               CAST(len(list_filter(a, x -> x > 1)) = len(a)
                    AS BOOLEAN) AS all_gt1,
               CAST(len(list_filter(a, x -> x > 3)) > 0 AS BOOLEAN)
                   AS any_gt3,
               CAST(a[1] AS INT) AS first_el,
               CAST(a[-1] AS INT) AS last_el,
               coalesce(array_to_string(list_sort(a), ','), '')
                   AS sorted_a,
               coalesce(array_to_string(list_slice(a, 2, 3), ','), '')
                   AS middle,
               CAST(list_contains(a, 2) AS BOOLEAN) AS has_two,
               coalesce(array_to_string(list_transform(list_sort(a),
                   x -> CAST(x AS VARCHAR)), '-'), '') AS joined,
               CAST(list_sum(generate_series(1, 4)) AS BIGINT)
                   AS seq_sum
        FROM t
    """,
    doc=(
        "higher-order array semantics pinned: lambda transform/"
        "filter composition (sum of squares via fold - empty arrays "
        "yield NULL sum in BOTH engines, not 0), exists/forall "
        "spelled as filter-length so both engines agree on the "
        "empty-array edge (forall over [] is TRUE, vacuous truth; "
        "exists is FALSE), 1-based indexing with negative-index "
        "tail addressing, list_sort default ascending, slice "
        "(aligned: Spark slice(a,2,2) == DuckDB list_slice(a,2,3) - "
        "START+LENGTH vs START..END is a real porting trap), "
        "membership, sorted string join, and inclusive integer "
        "sequence generation. One genuine divergence found and "
        "worked around: joining an EMPTY array yields '' in Spark "
        "(concat_ws) but NULL in DuckDB (array_to_string) - the "
        "oracle coalesces, and catalog code must never rely on the "
        "empty-join result. The semantic floor under every "
        "shingle/embedding/token pipeline in this catalog."
    ),
    tags=("scalar",),
)
def array_higher_order_semantics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    rows = [
        (1, [3, 1, 2]),
        (2, [5]),
        (3, [2, 2, 4, 6]),
        (4, []),
    ]
    t = spark.createDataFrame(rows, "id int, a array<int>")
    a = F.col("a")
    return t.select(
        "id",
        F.size(a).cast("int").alias("n"),
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("bigint")),
            F.lit(None).cast("bigint"),
            lambda acc, x: F.coalesce(acc + x, x),
        ).alias("sum_squares"),
        F.size(F.filter(a, lambda x: x % 2 == 0)).cast("int").alias(
            "n_even"
        ),
        F.forall(a, lambda x: x > 1).alias("all_gt1"),
        F.exists(a, lambda x: x > 3).alias("any_gt3"),
        F.try_element_at(a, F.lit(1)).cast("int").alias("first_el"),
        F.try_element_at(a, F.lit(-1)).cast("int").alias("last_el"),
        F.concat_ws(
            ",", F.transform(F.sort_array(a), lambda x: x.cast("string"))
        ).alias("sorted_a"),
        F.concat_ws(
            ",", F.transform(F.slice(a, 2, 2), lambda x: x.cast("string"))
        ).alias("middle"),
        F.array_contains(a, 2).alias("has_two"),
        F.concat_ws(
            "-", F.transform(F.sort_array(a), lambda x: x.cast("string"))
        ).alias("joined"),
        F.aggregate(
            F.sequence(F.lit(1), F.lit(4)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("seq_sum"),
    )


@query(
    "regexp_semantics",
    oracle=r"""
        WITH t(id, s) AS (VALUES
            (1, 'order #123 shipped to ZIP 94107'),
            (2, 'no digits here'),
            (3, 'a1b22c333 mixed'),
            (4, 'Click CLICK click'),
            (5, 'path/to/file.tar.gz')
        )
        SELECT id,
               regexp_matches(s, '\d+') AS has_number,
               regexp_extract(s, '#(\d+)', 1) AS order_no,
               regexp_replace(s, '\d', '#', 'g') AS digits_masked,
               regexp_matches(s, '(?i)\bclick\b') AS has_click_ci,
               regexp_extract(s, '^(.*?)\.', 1) AS lazy_head,
               CAST(len(regexp_split_to_array(s, '\s+')) AS INT)
                   AS n_tokens,
               regexp_extract(s, '([a-c])(\d+)', 2) AS second_group
        FROM t
    """,
    doc=(
        "regular-expression semantics pinned across Java regex "
        "(Spark) and RE2 (DuckDB) on the portable core the catalog "
        "actually uses (the CEP funnel matches journey strings with "
        "regexp_extract_all; PII redaction and text normalization "
        "use regexp_replace): unanchored contains-matching, numbered "
        "capture groups with '' (not NULL) on no-match, GLOBAL "
        "replace (divergence worked around: Spark regexp_replace is "
        "global by default, DuckDB replaces the first match unless "
        "given the 'g' flag - the oracle passes it explicitly), "
        "inline (?i) case folding with word boundaries, lazy "
        "quantifiers, and regex split. Deliberately NOT probed: "
        "backreferences and lookaround, which Java has and RE2 "
        "rejects by design - catalog code must never use them, and "
        "this probe's doc is where that rule is recorded."
    ),
    tags=("scalar",),
)
def regexp_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [
        (1, "order #123 shipped to ZIP 94107"),
        (2, "no digits here"),
        (3, "a1b22c333 mixed"),
        (4, "Click CLICK click"),
        (5, "path/to/file.tar.gz"),
    ]
    t = spark.createDataFrame(rows, "id int, s string")
    s = F.col("s")
    return t.select(
        "id",
        s.rlike(r"\d+").alias("has_number"),
        F.regexp_extract(s, r"#(\d+)", 1).alias("order_no"),
        F.regexp_replace(s, r"\d", "#").alias("digits_masked"),
        s.rlike(r"(?i)\bclick\b").alias("has_click_ci"),
        F.regexp_extract(s, r"^(.*?)\.", 1).alias("lazy_head"),
        F.size(F.split(s, r"\s+")).cast("int").alias("n_tokens"),
        F.regexp_extract(s, r"([a-c])(\d+)", 2).alias("second_group"),
    )


@query(
    "cast_semantics",
    oracle="""
        WITH t(id, s, d) AS (VALUES
            (1, '12', CAST(12.7 AS DOUBLE)),
            (2, 'abc', CAST(-12.7 AS DOUBLE)),
            (3, '', CAST(2.5 AS DOUBLE)),
            (4, '  42  ', CAST(-0.9 AS DOUBLE)),
            (5, 'true', CAST(0.0 AS DOUBLE))
        )
        SELECT id,
               TRY_CAST(s AS INTEGER) AS str_to_int,
               TRY_CAST(s AS BOOLEAN) AS str_to_bool,
               CAST(TRY_CAST(s AS BOOLEAN) AS INTEGER) AS bool_to_int,
               CAST(trunc(d) AS INTEGER) AS dbl_trunc,
               CAST(floor(d) AS INTEGER) AS dbl_floor,
               CAST(floor(d + 0.5) AS INTEGER) AS dbl_half_up,
               CAST(TRY_CAST(s AS INTEGER) AS VARCHAR) AS int_to_str
        FROM t
    """,
    doc=(
        "cast/coercion semantics: the PORTABLE core pinned, the "
        "non-portable core documented. Pinned: strict string->int "
        "(non-numeric and empty -> NULL via try_cast, surrounding "
        "whitespace tolerated), string->boolean ('true'/'1' forms), "
        "boolean->int, int->string round-trip, and the three "
        "explicit-narrowing spellings trunc/floor/floor(x+0.5) that "
        "agree bit-for-bit. DOCUMENTED DIVERGENCE (probed once, "
        "excluded from the oracle): a bare CAST(double AS INT) "
        "TRUNCATES in Spark (ANSI, 12.7 -> 12) but ROUNDS in DuckDB "
        "(12.7 -> 13, 2.5 -> 3) — and DuckDB's TRY_CAST('12.7' AS "
        "INT) even parses-then-rounds where Spark yields NULL. Rule "
        "this probe enforces on the catalog: never narrow a double "
        "with a bare cast IN SQL MEANT FOR BOTH ENGINES; spell the "
        "intent — Spark's bare cast/DuckDB trunc() for truncation, "
        "floor(), or floor(x+0.5) (the numeric_semantics probe pins "
        "the latter as the repo's round spec)."
    ),
    tags=("scalar",),
)
def cast_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [
        (1, "12", 12.7),
        (2, "abc", -12.7),
        (3, "", 2.5),
        (4, "  42  ", -0.9),
        (5, "true", 0.0),
    ]
    t = spark.createDataFrame(rows, "id int, s string, d double")
    b = F.expr("try_cast(s AS boolean)")
    return t.select(
        "id",
        F.expr("try_cast(s AS int)").alias("str_to_int"),
        b.alias("str_to_bool"),
        b.cast("int").alias("bool_to_int"),
        # Spark's bare numeric cast IS truncate-toward-zero, which is
        # what DuckDB spells trunc(); the bare DuckDB cast (rounding)
        # is the divergent form the doc bans
        F.col("d").cast("int").alias("dbl_trunc"),
        F.floor("d").cast("int").alias("dbl_floor"),
        F.floor(F.col("d") + 0.5).cast("int").alias("dbl_half_up"),
        F.expr("try_cast(s AS int)").cast("string").alias("int_to_str"),
    )


@query(
    "string_function_semantics",
    oracle="""
        WITH t(id, s) AS (VALUES
            (1, 'hello world'),
            (2, 'a,b,c'),
            (3, 'kitten'),
            (4, ''),
            (5, 'MiXeD CaSe')
        )
        SELECT id,
               lpad(s, 8, '*') AS padded,
               lpad(s, 3, '*') AS pad_truncates,
               translate(s, 'aeiou', 'AEIOU') AS vowels_up,
               CAST(levenshtein(s, 'sitting') AS INT) AS lev_sitting,
               CAST(strpos(s, 'l') AS INT) AS first_l,
               repeat(s, 2) AS doubled,
               reverse(s) AS reversed,
               split_part(s, ',', 2) AS second_field,
               split_part(s, ',', 9) AS missing_field,
               replace(s, 'l', 'LL') AS grown,
               left(s, 3) AS head3,
               right(s, 3) AS tail3,
               lower(s) AS lowered
        FROM t
    """,
    doc=(
        "string-function semantics pinned on the portable core: "
        "lpad both pads AND TRUNCATES to the target length (the "
        "fixed-width-formatting gotcha), translate's positional "
        "char mapping, levenshtein (the edit-distance join and the "
        "search suggester stand on it agreeing), 1-based strpos with "
        "0 for no-match, repeat/reverse/replace growth, split_part "
        "returning '' (not NULL, not an error) for an out-of-range "
        "field index, and left/right head/tail addressing. All "
        "behaviors identical on the empty string. Not probed: "
        "initcap (absent from DuckDB), soundex (absent from DuckDB) "
        "- word-capitalization and phonetic logic must be spelled "
        "from these primitives if an oracle needs them."
    ),
    tags=("scalar",),
)
def string_function_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [
        (1, "hello world"),
        (2, "a,b,c"),
        (3, "kitten"),
        (4, ""),
        (5, "MiXeD CaSe"),
    ]
    t = spark.createDataFrame(rows, "id int, s string")
    s = F.col("s")
    return t.select(
        "id",
        F.lpad(s, 8, "*").alias("padded"),
        F.lpad(s, 3, "*").alias("pad_truncates"),
        F.translate(s, "aeiou", "AEIOU").alias("vowels_up"),
        F.levenshtein(s, F.lit("sitting")).cast("int").alias("lev_sitting"),
        F.instr(s, "l").cast("int").alias("first_l"),
        F.repeat(s, 2).alias("doubled"),
        F.reverse(s).alias("reversed"),
        F.split_part(s, F.lit(","), F.lit(2)).alias("second_field"),
        F.split_part(s, F.lit(","), F.lit(9)).alias("missing_field"),
        F.replace(s, F.lit("l"), F.lit("LL")).alias("grown"),
        F.substring(s, 1, 3).alias("head3"),
        F.expr("right(s, 3)").alias("tail3"),
        F.lower(s).alias("lowered"),
    )


@query(
    "set_operation_semantics",
    oracle="""
        WITH a(x) AS (VALUES (1), (1), (2), (3), (NULL)),
             b(x) AS (VALUES (1), (3), (3), (NULL))
        SELECT 'union' AS op, CAST(x AS INT) AS x,
               CAST(count(*) AS BIGINT) AS n
        FROM (SELECT x FROM a UNION SELECT x FROM b) GROUP BY 2
        UNION ALL
        SELECT 'union_all', CAST(x AS INT), CAST(count(*) AS BIGINT)
        FROM (SELECT x FROM a UNION ALL SELECT x FROM b) GROUP BY 2
        UNION ALL
        SELECT 'intersect', CAST(x AS INT), CAST(count(*) AS BIGINT)
        FROM (SELECT x FROM a INTERSECT SELECT x FROM b) GROUP BY 2
        UNION ALL
        SELECT 'intersect_all', CAST(x AS INT), CAST(count(*) AS BIGINT)
        FROM (SELECT x FROM a INTERSECT ALL SELECT x FROM b) GROUP BY 2
        UNION ALL
        SELECT 'except', CAST(x AS INT), CAST(count(*) AS BIGINT)
        FROM (SELECT x FROM a EXCEPT SELECT x FROM b) GROUP BY 2
        UNION ALL
        SELECT 'except_all', CAST(x AS INT), CAST(count(*) AS BIGINT)
        FROM (SELECT x FROM a EXCEPT ALL SELECT x FROM b) GROUP BY 2
    """,
    doc=(
        "set-operation semantics pinned: UNION dedups (and treats "
        "NULL as equal to NULL - group semantics, not comparison "
        "semantics), INTERSECT/EXCEPT are DISTINCT operations, the "
        "ALL variants are multiset arithmetic (intersect_all keeps "
        "min(multiplicity): 3 appears once though b has it twice; "
        "except_all subtracts: two 1s minus one 1 leaves one 1), and "
        "NULL rows participate in all of them as ordinary values. "
        "The dedup/exceptAll idioms the test suite itself leans on "
        "(merge-invariance checks compare frames with exceptAll), "
        "driver-hash-pinned."
    ),
    tags=("scalar", "agg"),
)
def set_operation_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = spark.createDataFrame([(1,), (1,), (2,), (3,), (None,)], "x int")
    b = spark.createDataFrame([(1,), (3,), (3,), (None,)], "x int")

    def counted(op: str, df: DataFrame) -> DataFrame:
        return df.groupBy("x").agg(F.count("*").alias("n")).select(
            F.lit(op).alias("op"), F.col("x").cast("int").alias("x"), "n"
        )

    return (
        counted("union", a.union(b).distinct())
        .unionByName(counted("union_all", a.union(b)))
        .unionByName(counted("intersect", a.intersect(b)))
        .unionByName(counted("intersect_all", a.intersectAll(b)))
        .unionByName(counted("except", a.subtract(b)))
        .unionByName(counted("except_all", a.exceptAll(b)))
    )


@query(
    "subquery_null_semantics",
    oracle="""
        WITH t(id, x) AS (VALUES (1, 10), (2, 20), (3, 30)),
             s_clean(y) AS (VALUES (10), (30)),
             s_null(y) AS (VALUES (10), (NULL))
        SELECT 'in_clean' AS pred, CAST(count(*) AS BIGINT) AS n_rows
        FROM t WHERE x IN (SELECT y FROM s_clean)
        UNION ALL
        SELECT 'not_in_clean', CAST(count(*) AS BIGINT)
        FROM t WHERE x NOT IN (SELECT y FROM s_clean)
        UNION ALL
        SELECT 'in_nullset', CAST(count(*) AS BIGINT)
        FROM t WHERE x IN (SELECT y FROM s_null)
        UNION ALL
        SELECT 'not_in_nullset', CAST(count(*) AS BIGINT)
        FROM t WHERE x NOT IN (SELECT y FROM s_null)
        UNION ALL
        SELECT 'exists_match', CAST(count(*) AS BIGINT)
        FROM t WHERE EXISTS (SELECT 1 FROM s_null s WHERE s.y = t.x)
        UNION ALL
        SELECT 'not_exists_match', CAST(count(*) AS BIGINT)
        FROM t WHERE NOT EXISTS (SELECT 1 FROM s_null s WHERE s.y = t.x)
    """,
    doc=(
        "subquery NULL semantics pinned in WHERE position - the most "
        "famous silent-wrong-answer trap in SQL: NOT IN against a "
        "set CONTAINING NULL filters to ZERO rows (every comparison "
        "is at best UNKNOWN), while NOT EXISTS with an equality "
        "correlate - the null-safe spelling - returns the 2 expected "
        "rows; IN matches members regardless. This is exactly why "
        "every anti-join in this catalog (orphan_antijoin, "
        "dead-letter lanes, vacuum candidates) is written as "
        "EXISTS/anti-join form, never NOT IN. DOCUMENTED DIVERGENCE "
        "(found while building this probe, excluded from the "
        "oracle): in a PROJECTED select-list context Spark renders "
        "the untestable IN/NOT IN comparisons as FALSE (its "
        "ExistenceJoin is two-valued) where DuckDB follows the "
        "standard and yields NULL - so subquery predicates in this "
        "catalog appear only in WHERE/filter position, where the "
        "engines agree."
    ),
    tags=("scalar", "join"),
)
def subquery_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "id int, x int"
    ).createOrReplaceTempView("__sq_t")
    spark.createDataFrame([(10,), (30,)], "y int").createOrReplaceTempView(
        "__sq_clean"
    )
    spark.createDataFrame([(10,), (None,)], "y int").createOrReplaceTempView(
        "__sq_null"
    )
    return spark.sql(
        """
        SELECT 'in_clean' AS pred, CAST(count(*) AS BIGINT) AS n_rows
        FROM __sq_t WHERE x IN (SELECT y FROM __sq_clean)
        UNION ALL
        SELECT 'not_in_clean', CAST(count(*) AS BIGINT)
        FROM __sq_t WHERE x NOT IN (SELECT y FROM __sq_clean)
        UNION ALL
        SELECT 'in_nullset', CAST(count(*) AS BIGINT)
        FROM __sq_t WHERE x IN (SELECT y FROM __sq_null)
        UNION ALL
        SELECT 'not_in_nullset', CAST(count(*) AS BIGINT)
        FROM __sq_t WHERE x NOT IN (SELECT y FROM __sq_null)
        UNION ALL
        SELECT 'exists_match', CAST(count(*) AS BIGINT)
        FROM __sq_t t WHERE EXISTS
            (SELECT 1 FROM __sq_null s WHERE s.y = t.x)
        UNION ALL
        SELECT 'not_exists_match', CAST(count(*) AS BIGINT)
        FROM __sq_t t WHERE NOT EXISTS
            (SELECT 1 FROM __sq_null s WHERE s.y = t.x)
        """
    )


@query(
    "scalar_subquery_semantics",
    oracle="""
        WITH t(id, x) AS (VALUES (1, 10), (2, 20), (3, 3)),
             s(y) AS (VALUES (5), (15))
        SELECT id,
               (SELECT y FROM s WHERE y > 100) AS empty_scalar,
               (SELECT max(y) FROM s WHERE y > 100) AS empty_agg,
               CAST((SELECT count(*) FROM s WHERE y > 100) AS BIGINT)
                   AS empty_count,
               (SELECT max(y) FROM s WHERE s.y < t.x) AS corr_agg,
               CAST((SELECT count(*) FROM s
                     WHERE s.y < t.x AND s.y > 100) AS BIGINT)
                   AS corr_empty_count,
               (SELECT CAST(sum(y) AS BIGINT) FROM s
                WHERE s.y < t.x AND s.y > 100) AS corr_empty_sum
        FROM t
    """,
    doc=(
        "scalar-subquery semantics pinned: an empty scalar subquery "
        "yields NULL (both bare and through null-skipping "
        "aggregates), but COUNT over the empty set is 0 - INCLUDING "
        "the correlated form, which is the classic decorrelation "
        "pitfall: a naive outer-join rewrite turns the count's "
        "unmatched rows into NULL instead of 0, and both engines "
        "prove they patch it (Spark wraps the count in a "
        "null-to-zero coalesce during decorrelation). Correlated "
        "aggregates vary per outer row; the TPC-H Q17 shape "
        "(important_part_values) decorrelates this same pattern "
        "explicitly - this probe pins the semantics the rewrite "
        "must preserve."
    ),
    tags=("scalar", "join"),
)
def scalar_subquery_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 3)], "id int, x int"
    ).createOrReplaceTempView("__ss_t")
    spark.createDataFrame([(5,), (15,)], "y int").createOrReplaceTempView(
        "__ss_s"
    )
    return spark.sql(
        """
        SELECT id,
               (SELECT y FROM __ss_s WHERE y > 100) AS empty_scalar,
               (SELECT max(y) FROM __ss_s WHERE y > 100) AS empty_agg,
               CAST((SELECT count(*) FROM __ss_s WHERE y > 100)
                    AS BIGINT) AS empty_count,
               (SELECT max(y) FROM __ss_s s WHERE s.y < t.x)
                   AS corr_agg,
               CAST((SELECT count(*) FROM __ss_s s
                     WHERE s.y < t.x AND s.y > 100) AS BIGINT)
                   AS corr_empty_count,
               (SELECT CAST(sum(y) AS BIGINT) FROM __ss_s s
                WHERE s.y < t.x AND s.y > 100) AS corr_empty_sum
        FROM __ss_t t
        """
    )


@query(
    "lateral_topk_per_nation",
    oracle="""
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n,
             LATERAL (SELECT c_custkey, c_acctbal
                      FROM customer c
                      WHERE c.c_nationkey = n.n_nationkey
                      ORDER BY c_acctbal DESC, c_custkey
                      LIMIT 2) t
    """,
    doc=(
        "LATERAL correlated subquery surface (SQL:1999): top-2 "
        "customers per nation spelled as a per-outer-row dependent "
        "subquery with ORDER BY + LIMIT — the third spelling of "
        "top-k-per-group next to the WindowGroupLimit window "
        "(top_events_per_type) and the self-join max-recovery "
        "(cheapest_supplier); all three must agree, and Catalyst "
        "plans the lateral form as a rewritten join rather than a "
        "per-row re-execution. Deterministic via the unique "
        "c_custkey tie-break."
    ),
    tags=("join", "sort"),
)
def lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("__lat_n")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "__lat_c"
    )
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM __lat_n n,
             LATERAL (SELECT c_custkey, c_acctbal
                      FROM __lat_c c
                      WHERE c.c_nationkey = n.n_nationkey
                      ORDER BY c_acctbal DESC, c_custkey
                      LIMIT 2) t
        """
    )


@query(
    "event_id_gaps",
    oracle="""
        WITH present AS (
            SELECT event_id FROM events WHERE event_id % 7 <> 0
        ),
        nxt AS (
            SELECT event_id,
                   lead(event_id) OVER (ORDER BY event_id) AS next_id
            FROM present
        )
        SELECT event_id + 1 AS gap_start,
               next_id - 1 AS gap_end,
               next_id - event_id - 1 AS n_missing
        FROM nxt
        WHERE next_id > event_id + 1
    """,
    doc=(
        "beyond-reference data-quality: SEQUENCE GAP DETECTION - "
        "contiguous missing id ranges in an ordered key (the "
        "CDC-completeness / lost-message audit; deliberate holes "
        "synthesized by dropping multiples of 7). One lead() pass "
        "over the ordered ids, no self-join and no id-domain "
        "explode; at scale the single ORDER BY window becomes the "
        "range-partitioned boundary exchange (each partition needs "
        "only its successor's first id - the partition_sync_plan "
        "checksum pattern)."
    ),
    tags=("window", "scale"),
)
def event_id_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    present = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 7 != 0)
        .select("event_id")
    )
    nxt = present.withColumn(
        "next_id", F.lead("event_id").over(W.orderBy("event_id"))
    )
    return nxt.filter(F.col("next_id") > F.col("event_id") + 1).select(
        (F.col("event_id") + 1).alias("gap_start"),
        (F.col("next_id") - 1).alias("gap_end"),
        (F.col("next_id") - F.col("event_id") - 1).alias("n_missing"),
    )


@query(
    "ordering_semantics",
    oracle="""
        WITH t(s) AS (VALUES
            ('a'), ('B'), ('b'), ('A'), (NULL), ('Z'), ('~'), ('0')
        )
        SELECT s,
               CAST(row_number() OVER (ORDER BY s ASC NULLS LAST)
                    AS INT) AS rank_asc_nl,
               CAST(row_number() OVER (ORDER BY s DESC NULLS FIRST)
                    AS INT) AS rank_desc_nf,
               (s < 'a') AS lt_lower_a,
               (upper(s) < 'a') AS upper_lt_lower_a
        FROM t
    """,
    doc=(
        "ORDER BY semantics pinned: string comparison is BINARY "
        "(codepoint) collation in both engines - digits before "
        "uppercase before lowercase before high-ASCII ('0'<'A'<'Z'<"
        "'a'<'~'), no case folding, so every string tie-break in the "
        "catalog is engine-stable - and NULL placement under "
        "EXPLICIT NULLS FIRST/LAST. DOCUMENTED DIVERGENCE (excluded "
        "from the oracle): the DEFAULTS differ - Spark ascending "
        "puts NULLS FIRST (standard-style direction-coupled), "
        "DuckDB puts NULLS LAST in both directions - so any ORDER "
        "BY over a nullable sort key in cross-engine SQL must spell "
        "the placement explicitly, which the catalog's LIMIT/"
        "pagination queries do by sorting non-nullable keys."
    ),
    tags=("scalar", "sort"),
)
def ordering_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    rows = [("a",), ("B",), ("b",), ("A",), (None,), ("Z",), ("~",), ("0",)]
    t = spark.createDataFrame(rows, "s string")
    s = F.col("s")
    return t.select(
        "s",
        F.row_number()
        .over(W.orderBy(s.asc_nulls_last()))
        .cast("int")
        .alias("rank_asc_nl"),
        F.row_number()
        .over(W.orderBy(s.desc_nulls_first()))
        .cast("int")
        .alias("rank_desc_nf"),
        (s < "a").alias("lt_lower_a"),
        (F.upper(s) < "a").alias("upper_lt_lower_a"),
    )
