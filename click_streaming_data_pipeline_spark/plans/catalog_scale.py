"""Scale-pattern catalog: skew-resistant salted aggregation, mergeable
HLL sketch state (the faithful Redis PFADD/PFMERGE analogue), deeper
TPC-H-shaped analytics, and the complete /search pipeline entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.search import search
from ..operators.skew import salted_distinct_count
from ..sources import load_table
from ..sources.tables import scan_parallel
from .registry import dsum, dsum_sql, query


@query(
    "salted_distinct_views",
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS doc_key,
               count(DISTINCT user_id) AS n_distinct
        FROM events
        GROUP BY 1
    """,
    doc=(
        "C2 exact uniques via two-stage SALTED aggregation — the "
        "skew-resistant plan for hot keys at 100 TB (a hot document's "
        "distinct-count spreads over 16 reducers instead of one); "
        "must equal the plain distinct exactly"
    ),
    tags=("agg", "scale"),
)
def salted_distinct_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        F.get_json_object("props", "$.k").cast("int").alias("doc_key"),
        "user_id",
    )
    return salted_distinct_count(events, "doc_key", "user_id")


def _hll_sketch_views_oracle() -> str:
    from ..extensions.sketch import hll_est_cte, hll_oracle_ctes

    key = "CAST(json_extract_string(props, '$.k') AS INTEGER)"
    # the global readout re-estimates from the MERGED registers
    # (elementwise max across keys = PFMERGE), never from the source
    return f"""
        WITH {hll_oracle_ctes(key)},
        greg AS (
            SELECT CAST(-1 AS INTEGER) AS doc_key, ridx, max(rho) AS rho
            FROM reg GROUP BY ridx
        ),{hll_est_cte("g_est", "greg")},
        tot AS (
            SELECT {key} AS doc_key, count(*) AS total_views
            FROM events GROUP BY 1
        ),
        per_key AS (
            SELECT t.doc_key, t.total_views,
                   coalesce(e.unique_views, 0.0e0) AS unique_views
            FROM tot t
            LEFT JOIN hll_est e ON t.doc_key IS NOT DISTINCT FROM e.doc_key
        )
        SELECT doc_key, unique_views, total_views FROM per_key
        UNION ALL
        SELECT g.doc_key, g.unique_views,
               (SELECT CAST(sum(total_views) AS BIGINT) FROM per_key)
                   AS total_views
        FROM g_est g
    """


def _hll_views_readout(regs: DataFrame, totals: DataFrame) -> DataFrame:
    """Shared readout over register rows ``(doc_key, ridx, rho)`` and
    totals ``(doc_key, total_views)``: per-key estimates + the -1
    global row re-estimated from the MERGED registers (PFMERGE),
    never from the source."""
    from ..extensions.sketch import hll_estimate

    est = hll_estimate(regs, ["doc_key"]).withColumnRenamed(
        "doc_key", "__ek"
    )
    per_key = totals.join(
        est, F.col("doc_key").eqNullSafe(F.col("__ek")), "left"
    ).select(
        "doc_key",
        F.coalesce("unique_views", F.lit(0.0)).alias("unique_views"),
        "total_views",
    )
    merged = (
        regs.groupBy("ridx")
        .agg(F.max("rho").alias("rho"))
        .withColumn("doc_key", F.lit(-1))
    )
    global_est = hll_estimate(merged, ["doc_key"])
    global_row = global_est.join(
        per_key.agg(F.sum("total_views").alias("total_views"))
    ).select("doc_key", "unique_views", "total_views")
    return per_key.unionByName(global_row)



@query(
    "hll_sketch_views",
    oracle=_hll_sketch_views_oracle(),
    doc=(
        "C2 mergeable HLL sketch state (cache.py:88-101 PFADD/PFCOUNT "
        "+ PFMERGE): deterministic pinned-estimator registers per key "
        "(extensions/sketch.py), global rollup = elementwise register "
        "MAX across keys — the persistable/unionable form Redis "
        "provides, exact-shuffle-free, and fully value-hash-oracled "
        "(the estimator replays in DuckDB; accuracy gated separately "
        "in pytest)"
    ),
    tags=("agg", "approx", "scale"),
)
def hll_sketch_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key sketches + a global rollup from the SAME registers
    (re-aggregation without re-reading the source — the property that
    matters at 100 TB and the reason Redis uses HLL). Register state
    is bounded at m=1024 rows per key; the merge is an elementwise
    max, associative/commutative/idempotent under union."""
    from ..extensions.sketch import hll_registers

    events = load_table(spark, sf_dir, "events").select(
        F.get_json_object("props", "$.k").cast("int").alias("doc_key"),
        "user_id",
    )
    regs = hll_registers(events, ["doc_key"], "user_id")
    totals = events.groupBy("doc_key").agg(
        F.count("*").alias("total_views")
    )
    return _hll_views_readout(regs, totals)


@query(
    "hll_sketch_views_streamed",
    # same oracle as the batch lane: the drained register/total state
    # must reproduce the batch readout bit-for-bit
    oracle=_hll_sketch_views_oracle(),
    doc=(
        "C2 STREAMING HLL (the live Redis PFADD counter): events "
        "arrive in micro-batches, each batch's registers fold into "
        "versioned state by elementwise MAX (an idempotent "
        "commutative monoid — arrival order and batch boundaries "
        "cannot change the drained state) and view totals fold by "
        "sum under the same replay-safe version discipline; the "
        "drained state feeds the exact batch readout and its oracle. "
        "State is bounded at m=1024 register rows per key at ANY "
        "stream length."
    ),
    tags=("streaming", "agg", "approx", "scale"),
)
def hll_sketch_views_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile

    from ..extensions.sketch import hll_registers
    from ..operators.incremental import (
        read_prior_zset,
        write_zset_version,
    )

    events = load_table(spark, sf_dir, "events").select(
        F.get_json_object("props", "$.k").cast("int").alias("doc_key"),
        "user_id",
    )
    work = tempfile.mkdtemp(prefix="csdp_hll_")
    src = os.path.join(work, "in")
    reg_dir = os.path.join(work, "regs")
    tot_dir = os.path.join(work, "totals")
    events.repartition(6).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        regs_delta = hll_registers(batch, ["doc_key"], "user_id")
        prior_r = read_prior_zset(sp, reg_dir, batch_id, regs_delta)
        write_zset_version(
            prior_r.unionByName(regs_delta)
            .groupBy("doc_key", "ridx")
            .agg(F.max("rho").alias("rho")),
            reg_dir,
            batch_id,
        )
        tot_delta = batch.groupBy("doc_key").agg(
            F.count("*").alias("total_views")
        )
        prior_t = read_prior_zset(sp, tot_dir, batch_id, tot_delta)
        write_zset_version(
            prior_t.unionByName(tot_delta)
            .groupBy("doc_key")
            .agg(F.sum("total_views").alias("total_views")),
            tot_dir,
            batch_id,
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

    def latest(d: str) -> DataFrame:
        v = max(int(x[1:]) for x in os.listdir(d) if x.startswith("v"))
        return spark.read.parquet(os.path.join(d, f"v{v}"))

    return _hll_views_readout(latest(reg_dir), latest(tot_dir))


@query(
    "forecast_revenue",
    oracle=f"""
        SELECT {dsum_sql('l_extendedprice * l_discount', 'revenue')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.05
          AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6 shape: pure filter+sum — the pushdown showcase "
        "(every predicate reaches the parquet scan; no shuffle at all "
        "beyond the final 1-row combine)"
    ),
    tags=("bench", "agg"),
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


@query(
    "small_quantity_revenue",
    oracle=f"""
        WITH flagged AS (
            SELECT l_extendedprice, l_quantity,
                   avg(l_quantity) OVER (PARTITION BY l_partkey)
                       AS avg_qty
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#1'
        )
        SELECT {dsum_sql('l_extendedprice', 'total_price')},
               count(*) AS n_items
        FROM flagged
        WHERE l_quantity < 0.5 * avg_qty
    """,
    doc=(
        "TPC-H Q17 shape: correlated per-group average decorrelated "
        "into a window function — one shuffle on partkey instead of a "
        "per-row subquery"
    ),
    tags=("agg", "window", "join"),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    flagged = (
        li.join(F.broadcast(brand), li.l_partkey == brand.p_partkey)
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
    )
    return flagged.filter(
        F.col("l_quantity") < 0.5 * F.col("avg_qty")
    ).agg(
        dsum("l_extendedprice", "total_price"),
        F.count("*").alias("n_items"),
    )


@query(
    "search_full_pipeline",
    oracle="""
        WITH scored AS (
            SELECT doc_id,
                   substr(text, 1, 64) AS title,
                   (CAST(0.0 AS DOUBLE)
                    + len(list_filter(string_split(lower(substr(text, 1, 64)), ' '),
                          t -> t = 'data')) * CAST(2.0 AS DOUBLE)
                    + len(list_filter(string_split(lower(text), ' '),
                          t -> t = 'data')) * CAST(1.0 AS DOUBLE)) AS score
            FROM documents
            WHERE lang = 'en'
        )
        SELECT doc_id, score, title,
               regexp_replace(title, '(?i)(data)', '<em>\\1</em>', 'g')
                   AS title_highlight
        FROM scored
        WHERE score > 0
        ORDER BY score DESC, doc_id ASC
        LIMIT 5 OFFSET 5
    """,
    doc=(
        "F7 full /search pipeline (search main.py:72-147): bool "
        "filter + boosted score + score>0 match + composite sort + "
        "from/size pagination + highlight + hit reshape, via the "
        "library search() entry point"
    ),
    tags=("search", "sort"),
)
def search_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .withColumn("title", F.substring("text", 1, 64))
        .withColumn("body", F.col("text"))
    )
    return search(
        docs,
        ["data"],
        filters=[F.col("lang") == "en"],
        size=5,
        offset=5,
    )


_CMS_HH_SQL = """
        WITH hashes AS (
            SELECT user_id, r,
                   CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':'
                        || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       % 32 AS col
            FROM events
            CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r)
        ),
        sketch AS (
            SELECT r, col, count(*) AS n FROM hashes GROUP BY 1, 2
        ),
        probes AS (SELECT DISTINCT user_id, r, col FROM hashes),
        est AS (
            SELECT user_id, min(n) AS cms_est
            FROM probes JOIN sketch USING (r, col)
            GROUP BY 1
        ),
        exact AS (
            SELECT user_id, count(*) AS exact_n FROM events GROUP BY 1
        )
        SELECT user_id, exact_n, cms_est
        FROM exact JOIN est USING (user_id)
"""


@query(
    "heavy_hitters_cms",
    oracle=_CMS_HH_SQL,
    doc=(
        "scale pattern: count-min sketch heavy hitters — per-user "
        "event frequencies estimated from a 4x32 mergeable counter "
        "grid (md5-derived row hashes). The grid groupBy moves at "
        "most d*w partial counters per map task regardless of item "
        "cardinality; estimates probe the broadcast grid, min over "
        "rows. Deterministic hashing makes this sketch fully "
        "ORACLE-CHECKED (DuckDB reproduces the identical grid); "
        "exact_n rides along to exhibit est >= true. Mergeability "
        "pinned in pytest."
    ),
    tags=("bench", "agg", "approx", "scale"),
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.sketch import cms_build, cms_estimate_col

    events = load_table(spark, sf_dir, "events")
    sketch = cms_build(events, "user_id")
    exact = events.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    # the grid-literal estimate folds into the exact-count projection:
    # no probe explode, no broadcast build, no est regroup, and no
    # exact-vs-est self-join — every user in `exact` contributed to
    # the sketch, so its cells are present and the old inner join's
    # row set is reproduced by the not-null filter
    est = cms_estimate_col(sketch, F.col("user_id"))
    return (
        exact.withColumn("cms_est", est)
        .filter(F.col("cms_est").isNotNull())
        .select("user_id", "exact_n", "cms_est")
    )


@query(
    "salted_enrichment_join",
    oracle="""
        SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
    """,
    doc=(
        "scale pattern: skew-safe SALTED equi-join — the big (fact) "
        "side carries a deterministic row-hash salt, the dimension "
        "replicates across the 16 salt values, and the shuffle key "
        "becomes (key, salt) so a hot key spreads over 16 reducers. "
        "The explicit form of what AQE's skew split cannot do for a "
        "single giant key; result must equal the plain join exactly "
        "(inner/left only — see operators/skew.py::salted_join)."
    ),
    tags=("join", "scale"),
)
def salted_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
    )
    return salted_join(events, cust, ["user_id"]).select(
        "event_id", "user_id", "c_name", "c_mktsegment"
    )


@query(
    "incremental_doc_views",
    oracle=f"""
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER)
                   AS doc_key,
               count(*) AS n_rows,
               {dsum_sql('value', 'sum_value')},
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        GROUP BY 1
    """,
    doc=(
        "scale pattern: INCREMENTAL aggregate maintenance — the "
        "rollup is computed as merge(agg(history), agg(delta)) where "
        "history/delta split the corpus by time; merge cost is "
        "proportional to the state (key count), never the historical "
        "data. Mergeable state: counts/decimal sums/min/max (exact "
        "bit-parity with the from-scratch oracle), HLL sketches for "
        "uniques (pytest-gated, not in this projection). The batch "
        "form of the reference's Redis INCR/PFADD counters."
    ),
    tags=("agg", "scale"),
)
def incremental_doc_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import agg_state, finalize, merge_states

    events = load_table(spark, sf_dir, "events").select(
        F.get_json_object("props", "$.k").cast("int").alias("doc_key"),
        "value",
        "ts",
    )
    cut = "2024-01-15"
    hist = agg_state(
        events.filter(F.col("ts") < cut), ["doc_key"], "value"
    )
    delta = agg_state(
        events.filter(F.col("ts") >= cut), ["doc_key"], "value"
    )
    return finalize(merge_states(hist, delta, ["doc_key"]))


@query(
    "incremental_doc_views_streamed",
    # same oracle as a from-scratch aggregation over ALL events: the
    # streaming state table, merged micro-batch by micro-batch, must
    # converge to exactly the full-corpus rollup
    oracle=f"""
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER)
                   AS doc_key,
               count(*) AS n_rows,
               {dsum_sql('value', 'sum_value')},
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        GROUP BY 1
    """,
    doc=(
        "scale pattern: STREAMING incremental view maintenance — "
        "foreachBatch folds each micro-batch's mergeable state "
        "(counts/decimal sums/min/max) into a persistent state table "
        "via merge_states; per-batch cost is the delta aggregation + "
        "a state-sized merge, history never re-read. The drained "
        "state must equal the from-scratch batch rollup bit-for-bit "
        "— the streaming twin of incremental_doc_views and the true "
        "materialized-view form of the reference's Redis counters."
    ),
    tags=("streaming", "agg", "scale"),
)
def incremental_doc_views_streamed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile

    from ..operators.incremental import (
        agg_state,
        finalize,
        fold_state_dir,
        read_state_dir,
    )

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_incr_")
    src = os.path.join(work, "in")
    state_dir = os.path.join(work, "state")
    events.repartition(6).write.mode("overwrite").parquet(src)

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        keyed = batch.select(
            F.get_json_object("props", "$.k").cast("int").alias("doc_key"),
            "value",
        )
        delta = agg_state(keyed, ["doc_key"], "value")
        # versioned, replay-idempotent fold (state is key-bounded)
        fold_state_dir(
            batch.sparkSession, state_dir, delta, batch_id, ["doc_key"]
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
    return finalize(read_state_dir(spark, state_dir))


@query(
    "events_zorder_key",
    oracle="""
        WITH e AS (
            SELECT event_id, user_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS doc_key
            FROM events
        )
        SELECT event_id, user_id, doc_key,
               CAST(((user_id >> 0) & 1) * 1 + ((doc_key >> 0) & 1) * 2 + ((user_id >> 1) & 1) * 4 + ((doc_key >> 1) & 1) * 8 + ((user_id >> 2) & 1) * 16 + ((doc_key >> 2) & 1) * 32 + ((user_id >> 3) & 1) * 64 + ((doc_key >> 3) & 1) * 128 + ((user_id >> 4) & 1) * 256 + ((doc_key >> 4) & 1) * 512 + ((user_id >> 5) & 1) * 1024 + ((doc_key >> 5) & 1) * 2048 + ((user_id >> 6) & 1) * 4096 + ((doc_key >> 6) & 1) * 8192 + ((user_id >> 7) & 1) * 16384 + ((doc_key >> 7) & 1) * 32768 + ((user_id >> 8) & 1) * 65536 + ((doc_key >> 8) & 1) * 131072 + ((user_id >> 9) & 1) * 262144 + ((doc_key >> 9) & 1) * 524288 + ((user_id >> 10) & 1) * 1048576 + ((doc_key >> 10) & 1) * 2097152 + ((user_id >> 11) & 1) * 4194304 + ((doc_key >> 11) & 1) * 8388608 + ((user_id >> 12) & 1) * 16777216 + ((doc_key >> 12) & 1) * 33554432 + ((user_id >> 13) & 1) * 67108864 + ((doc_key >> 13) & 1) * 134217728 + ((user_id >> 14) & 1) * 268435456 + ((doc_key >> 14) & 1) * 536870912 + ((user_id >> 15) & 1) * 1073741824 + ((doc_key >> 15) & 1) * 2147483648 AS BIGINT) AS zkey
        FROM e
    """,
    doc=(
        "beyond-reference lakehouse maintenance: Z-ORDER clustering "
        "key (Morton interleave of user_id and doc_key, 16+16 bits) - "
        "sorting + range-splitting output files by zkey clusters BOTH "
        "columns so per-file min/max stats prune scans on either "
        "predicate (the OPTIMIZE ZORDER primitive); pure integer "
        "expression, bit-identical in the DuckDB oracle"
    ),
    tags=("scale",),
)
def events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.maintenance import zorder_key

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("doc_key"),
    )
    return ev.withColumn("zkey", zorder_key("user_id", "doc_key"))


@query(
    "orders_table_checksum",
    oracle="""
        WITH h AS (
            SELECT CAST(('0x' || substr(md5(concat_ws('|',
                       CAST(o_orderkey AS VARCHAR),
                       CAST(o_custkey AS VARCHAR),
                       o_orderstatus,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                       CAST(o_orderdate AS VARCHAR),
                       o_orderpriority)), 1, 15)) AS BIGINT) AS rh
            FROM orders
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               bit_xor(rh) AS xor_hash,
               CAST(sum(rh % 2147483647) % 2147483647 AS BIGINT)
                   AS sum_hash
        FROM h
    """,
    doc=(
        "beyond-reference reconciliation: ORDER-INSENSITIVE TABLE "
        "CHECKSUM - per-row md5 digest folded with commutative "
        "aggregates (count + xor + modular sum), so two replicas / "
        "two engines can verify table equality with one scan each and "
        "a 3-value exchange, regardless of row order or partitioning. "
        "xor alone cancels duplicate row pairs; the modular sum "
        "catches that, and count catches cardinality. Doubles ride as "
        "DECIMAL(18,2) strings because raw double->string formatting "
        "is not engine-portable. Scale: pure map + partial agg - the "
        "cheapest possible anti-entropy pass."
    ),
    tags=("scale",),
)
def orders_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        F.col("o_orderdate").cast("string"),
        F.col("o_orderpriority"),
    )
    rh = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("long")
    h = scan_parallel(orders).select(rh.alias("rh"))
    return h.agg(
        F.count("*").alias("n_rows"),
        F.bit_xor("rh").alias("xor_hash"),
        (F.sum(F.col("rh") % 2147483647) % 2147483647)
        .cast("long")
        .alias("sum_hash"),
    )


@query(
    "bloom_prefiltered_orders",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM customer
            WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING'
        )
    """,
    doc=(
        "beyond-reference scale pattern: BLOOM-PREFILTERED SEMI-JOIN "
        "- the manual form of Spark's runtime bloom filter, for key "
        "sets too large to broadcast as rows but whose filter fits in "
        "KBs. Fact rows are pruned at the SCAN by a codegen'd "
        "literal-bitmap bit test (no shuffle, no Python), then the "
        "exact semi-join removes the ~1% false positives - so the "
        "result IS the plain semi-join, bit for bit (this oracle), "
        "while the shuffle sees only ~segment-fraction of the fact. "
        "Bitmap build is one tiny word-index groupBy + a bounded "
        "collect (ivf.py's k-row convention)."
    ),
    tags=("join", "scale"),
)
def bloom_prefiltered_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import bloom_semi_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    seg = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return bloom_semi_join(orders, seg, "o_custkey")


_KMV_SKETCH_CTE = """
kmv_d AS (
    SELECT DISTINCT event_type,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS u
    FROM events
),
kmv_r AS (
    SELECT event_type, u,
           row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn
    FROM kmv_d
),
kmv_sk AS (SELECT event_type, u FROM kmv_r WHERE rn <= 64)
"""

_KMV_EST = (
    "CAST(63 AS DOUBLE) * 1152921504606846976.0 / CAST({uk} AS DOUBLE)"
)


@query(
    "kmv_distinct_users",
    oracle=f"""
        WITH {_KMV_SKETCH_CTE},
        s AS (
            SELECT event_type, count(*) AS n_sketch, max(u) AS u_k
            FROM kmv_sk
            GROUP BY 1
        ),
        x AS (
            SELECT event_type, count(DISTINCT user_id) AS n_exact
            FROM events
            GROUP BY 1
        )
        SELECT event_type, n_exact, n_sketch,
               CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE)
                    ELSE {_KMV_EST.format(uk='u_k')} END AS est_distinct
        FROM x JOIN s USING (event_type)
    """,
    doc=(
        "extension: KMV (k-minimum-values) distinct sketch per "
        "event_type next to the HLL path (C2) — k=64 smallest 60-bit "
        "md5 hashes per key, estimate (k-1)/u_k, EXACT when the set "
        "fits the sketch. Unlike HLL the sketch supports set "
        "intersection (kmv_user_overlap); md5-determinism gives a "
        "full value oracle, unusual for a sketch. Exact distinct "
        "rides along as the error report."
    ),
    tags=("agg", "approx", "scale"),
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.sketch import kmv_estimates, kmv_sketch

    events = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(events, "event_type", "user_id")
    est = kmv_estimates(sk, "event_type")
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_exact", "n_sketch", "est_distinct"
    )


@query(
    "kmv_user_overlap",
    oracle=f"""
        WITH {_KMV_SKETCH_CTE},
        pairs AS (
            SELECT a.event_type AS key_a, b.event_type AS key_b
            FROM (SELECT DISTINCT event_type FROM events) a
            JOIN (SELECT DISTINCT event_type FROM events) b
              ON a.event_type < b.event_type
        ),
        sides AS (
            SELECT key_a, key_b, u, 1 AS in_a, 0 AS in_b
            FROM pairs JOIN kmv_sk ON kmv_sk.event_type = key_a
            UNION ALL
            SELECT key_a, key_b, u, 0 AS in_a, 1 AS in_b
            FROM pairs JOIN kmv_sk ON kmv_sk.event_type = key_b
        ),
        merged AS (
            SELECT key_a, key_b, u,
                   max(in_a) AS in_a, max(in_b) AS in_b
            FROM sides
            GROUP BY 1, 2, 3
        ),
        kept AS (
            SELECT *,
                   row_number() OVER (PARTITION BY key_a, key_b
                                      ORDER BY u) AS rn
            FROM merged
        ),
        agg AS (
            SELECT key_a, key_b,
                   CAST(count(*) AS BIGINT) AS k_used,
                   max(u) AS u_k,
                   CAST(sum(in_a * in_b) AS BIGINT) AS n_both
            FROM kept
            WHERE rn <= 64
            GROUP BY 1, 2
        )
        SELECT key_a, key_b, k_used, n_both,
               CAST(n_both AS DOUBLE) / CAST(k_used AS DOUBLE)
                   AS est_jaccard,
               CASE WHEN k_used < 64 THEN CAST(k_used AS DOUBLE)
                    ELSE {_KMV_EST.format(uk='u_k')} END AS est_union,
               CAST(n_both AS DOUBLE) / CAST(k_used AS DOUBLE)
                   * (CASE WHEN k_used < 64 THEN CAST(k_used AS DOUBLE)
                           ELSE {_KMV_EST.format(uk='u_k')} END)
                   AS est_intersection
        FROM agg
    """,
    doc=(
        "extension: pairwise audience-overlap estimation between "
        "event types from their KMV sketches — merged sketch = k "
        "smallest of the union (a valid KMV of A∪B), Jaccard = "
        "fraction of merged values in BOTH sketches, intersection = "
        "jaccard x union (Beyer et al. SIGMOD'07). The set-operation "
        "capability HLL lacks; every stage works on sketch-sized "
        "frames (#keys x k rows), never re-touching the corpus. The "
        "keys-squared pair frame is a tiny-dimension nested-loop, "
        "allowlisted like the 1-row bounds frames."
    ),
    tags=("agg", "approx", "scale"),
)
def kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.sketch import kmv_pairwise_overlap, kmv_sketch

    events = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(events, "event_type", "user_id")
    return kmv_pairwise_overlap(sk, "event_type")


@query(
    "kmv_distinct_users_streamed",
    # oracle = the batch KMV sketch over ALL events: k-min-of-union
    # folding must converge to exactly the from-scratch sketch
    oracle=f"""
        WITH {_KMV_SKETCH_CTE},
        s AS (
            SELECT event_type, count(*) AS n_sketch, max(u) AS u_k
            FROM kmv_sk
            GROUP BY 1
        )
        SELECT event_type, n_sketch,
               CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE)
                    ELSE {_KMV_EST.format(uk='u_k')} END AS est_distinct
        FROM s
    """,
    doc=(
        "extension: STREAMING KMV distinct maintenance — the true "
        "mergeable-bounded-state form of the reference's Redis "
        "PFADD/PFCOUNT (C2): each micro-batch's k-min sketch folds "
        "into versioned state via k-min-of-union (state stays k rows "
        "per key FOREVER, independent of stream length), versions "
        "derive only from strictly-older versions so at-least-once "
        "replays are byte-identical. The drained sketch must equal "
        "the from-scratch batch sketch exactly."
    ),
    tags=("streaming", "agg", "approx", "scale"),
)
def kmv_distinct_users_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql.window import Window as W

    from ..extensions.sketch import KMV_K, kmv_estimates, kmv_sketch

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_kmv_")
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

    def fold_kmv(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        delta = kmv_sketch(batch, "event_type", "user_id")
        prior_vs = [v for v in _versions() if v < batch_id]
        if prior_vs:
            prior = sp.read.parquet(
                os.path.join(state_dir, f"v{prior_vs[-1]}")
            )
            delta = prior.unionByName(delta).distinct()
        w = W.partitionBy("event_type").orderBy("u")
        merged = (
            delta.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= KMV_K)
            .select("event_type", "u")
        )
        out = os.path.join(state_dir, f"v{batch_id}")
        tmp = out + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(out):
            shutil.rmtree(out)
        os.rename(tmp, out)
        for v in prior_vs[:-1]:
            shutil.rmtree(os.path.join(state_dir, f"v{v}"), True)

    q = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(fold_kmv)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = _versions()[-1]
    state = spark.read.parquet(os.path.join(state_dir, f"v{latest}"))
    return kmv_estimates(state, "event_type").select(
        "event_type", "n_sketch", "est_distinct"
    )


@query(
    "heavy_hitters_cms_streamed",
    oracle=_CMS_HH_SQL,
    doc=(
        "scale pattern, STREAMING form: the count-min grid is the "
        "canonical mergeable-sketch state — each micro-batch reduces "
        "to its own 4x32 grid and folds into the versioned state "
        "store (operators/incremental.py: replay-safe, history never "
        "re-read, per-batch cost bounded by the GRID size, not the "
        "stream). The drained grid feeds the same probe/min estimate "
        "and hits the batch query's oracle bit-for-bit — a live "
        "heavy-hitter monitor with O(d*w) standing state."
    ),
    tags=("streaming", "agg", "approx", "scale"),
)
def heavy_hitters_cms_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..extensions.sketch import cms_build, cms_estimate_col
    from ..operators.incremental import fold_state_dir, read_state_dir

    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_cms_")
    src = os.path.join(work, "in")
    state_dir = os.path.join(work, "state")
    ev.repartition(6).write.mode("overwrite").parquet(src)

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        delta = cms_build(batch, "user_id").select(
            "r",
            "col",
            "n",
            # shoehorn into the shared mergeable-state schema: the
            # fold sums n per (r, col); s/mn/mx ride along unused
            F.lit(0).cast("decimal(28,6)").alias("s"),
            F.lit(0.0).alias("mn"),
            F.lit(0.0).alias("mx"),
        )
        fold_state_dir(
            batch.sparkSession, state_dir, delta, batch_id, ["r", "col"]
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
    sketch = read_state_dir(spark, state_dir).select("r", "col", "n")
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    # grid-literal estimate folded into the exact projection (see
    # heavy_hitters_cms)
    est = cms_estimate_col(sketch, F.col("user_id"))
    return (
        exact.withColumn("cms_est", est)
        .filter(F.col("cms_est").isNotNull())
        .select("user_id", "exact_n", "cms_est")
    )


@query(
    "rollup_cascade",
    oracle=f"""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               event_type,
               count(*) AS n_events,
               {dsum_sql('value', 'sum_value')},
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        GROUP BY 1, 2
    """,
    doc=(
        "scale pattern: MULTI-RESOLUTION rollup cascade (continuous-"
        "aggregate / hypertable-downsample analogue): minute-level "
        "aggregates are built from raw events ONCE, hourly rolls up "
        "the minute table, daily rolls up the hourly table - each "
        "coarser level reads only the level below (key-bounded, "
        "thousands of rows), never the raw corpus. Mergeable state "
        "only (counts, decimal sums, min/max), so the cascaded daily "
        "result is bit-identical to a from-scratch daily aggregation "
        "- which is exactly what the oracle computes. At 100 TB the "
        "raw scan happens once per ingest window and every "
        "dashboard-resolution query reads the tiny rollup tables; "
        "the batch form of chained materialized views "
        "(TimescaleDB continuous aggregates, Druid rollup)."
    ),
    tags=("agg", "scale"),
)
def rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(28,6)")
    minute = events.groupBy(
        F.date_trunc("minute", "ts").alias("minute"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(dec).alias("sum_dec"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    hour = minute.groupBy(
        F.date_trunc("hour", "minute").alias("hour"),
        "event_type",
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
    return (
        hour.groupBy(
            F.date_trunc("day", "hour").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_dec").alias("sum_dec"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .select(
            "day",
            "event_type",
            "n_events",
            F.col("sum_dec").cast("double").alias("sum_value"),
            "min_value",
            "max_value",
        )
    )


@query(
    "forget_users",
    oracle=f"""
        SELECT event_type,
               count(*) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               {dsum_sql('value', 'total_value')}
        FROM events
        WHERE user_id % 97 <> 3
        GROUP BY event_type
    """,
    doc=(
        "scale pattern: GDPR right-to-be-forgotten DELETE propagation "
        "(operators/maintenance.py::forget_keys): the events table is "
        "laid out partitioned by day, a user-deletion list arrives, "
        "and the operator rewrites ONLY the day-partitions containing "
        "those users (partition-pruned scan -> broadcast anti-join -> "
        "dynamic partition overwrite; fully-emptied partitions "
        "dropped). The surviving table must equal a logical "
        "DELETE WHERE user_id IN (...) exactly - which is what the "
        "oracle computes. At 100 TB the rewrite touches the deleted "
        "users' active days, never the corpus; the untouched "
        "partitions' files are byte-identical (pytest-gated)."
    ),
    tags=("scale", "maintenance"),
)
def forget_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..operators.maintenance import forget_keys

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_forget_")
    table_dir = os.path.join(work, "events_by_day")
    (
        events.withColumn("day", F.to_date(F.date_trunc("day", "ts")))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(table_dir)
    )
    deletion_list = events.select("user_id").filter(
        F.col("user_id") % 97 == 3
    )
    forget_keys(spark, table_dir, "day", "user_id", deletion_list)
    survivors = spark.read.parquet(table_dir)
    return survivors.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(28,6)"))
        .cast("double")
        .alias("total_value"),
    )


@query(
    "rollup_cascade_streamed",
    # same oracle as rollup_cascade: the streamed minute-state table,
    # cascaded up on read, must equal the from-scratch daily rollup
    oracle=f"""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               event_type,
               count(*) AS n_events,
               {dsum_sql('value', 'sum_value')},
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        GROUP BY 1, 2
    """,
    doc=(
        "scale pattern: STREAMED continuous aggregate - foreachBatch "
        "folds each micro-batch's minute-level mergeable state "
        "(count/decimal-sum/min/max keyed by minute x event_type) "
        "into the versioned state store (replay-idempotent "
        "fold_state_dir); hour and day resolutions are derived from "
        "the minute state ON READ, never from raw history. Per-batch "
        "cost = delta aggregation + state-sized merge; the cascaded "
        "daily readout must be bit-identical to rollup_cascade's "
        "batch answer - which is what the oracle checks. The "
        "streaming twin of TimescaleDB continuous-aggregate refresh."
    ),
    tags=("streaming", "agg", "scale"),
)
def rollup_cascade_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..operators.incremental import (
        agg_state,
        fold_state_dir,
        read_state_dir,
    )

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_cascade_")
    src = os.path.join(work, "in")
    state_dir = os.path.join(work, "state")
    events.repartition(6).write.mode("overwrite").parquet(src)

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        keyed = batch.select(
            F.date_trunc("minute", "ts").alias("minute"),
            "event_type",
            "value",
        )
        delta = agg_state(keyed, ["minute", "event_type"], "value")
        fold_state_dir(
            batch.sparkSession,
            state_dir,
            delta,
            batch_id,
            ["minute", "event_type"],
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

    minute_state = read_state_dir(spark, state_dir)
    hour = minute_state.groupBy(
        F.date_trunc("hour", "minute").alias("hour"), "event_type"
    ).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    return (
        hour.groupBy(
            F.date_trunc("day", "hour").alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").cast("double").alias("sum_value"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
        )
        .select(
            "day",
            "event_type",
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


@query(
    "bucketed_revenue_join",
    oracle=f"""
        SELECT c_mktsegment,
               count(*) AS n_orders,
               {dsum_sql('o_totalprice', 'revenue')}
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    doc=(
        "scale pattern: BUCKETED co-located join - both sides are "
        "written bucketBy(8, custkey) + sortBy, so the recurring "
        "orders-joins-customer runs with ZERO exchanges (each bucket "
        "pair joins locally; the plan's only shuffle is the final "
        "small aggregation). The physical-design answer to every "
        "nightly fact-dim join at 100 TB: pay the bucketing once at "
        "write time, skip the 100 TB shuffle on every subsequent "
        "join. Values must equal the plain join exactly; the "
        "no-Exchange property is pinned by "
        "test_bucketed_tables_join_without_shuffle and the merge "
        "hint keeps AQE from broadcasting the demo away."
    ),
    tags=("join", "scale"),
)
def bucketed_revenue_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid as _uuid

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    work = tempfile.mkdtemp(prefix="csdp_bucket_")
    suffix = _uuid.uuid4().hex[:8]
    ot, ct = f"orders_bk_{suffix}", f"customer_bk_{suffix}"
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", os.path.join(work, ot))
        .saveAsTable(ot)
    )
    (
        cust.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", os.path.join(work, ct))
        .saveAsTable(ct)
    )
    return (
        spark.table(ot)
        .join(
            spark.table(ct).hint("merge"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "revenue"),
        )
    )


@query(
    "forget_users_streamed",
    # same oracle as forget_users: the table after draining the
    # deletion-request stream equals a logical bulk DELETE
    oracle=f"""
        SELECT event_type,
               count(*) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               {dsum_sql('value', 'total_value')}
        FROM events
        WHERE user_id % 97 <> 3
        GROUP BY event_type
    """,
    doc=(
        "scale pattern: STREAMED GDPR delete propagation - deletion "
        "requests arrive as a stream and each micro-batch drives "
        "forget_keys against the partitioned table (partition-pruned "
        "rewrite of just that batch's users' active days). "
        "forget_keys is a set-difference fixpoint, so at-least-once "
        "replay of a request batch is a natural no-op - idempotence "
        "without a commit log. The drained table must equal the bulk "
        "logical DELETE exactly. This is the compliance pipeline "
        "shape: requests queue continuously, rewrites stay "
        "proportional to each batch's dirty partitions, the table "
        "never goes offline."
    ),
    tags=("streaming", "scale", "maintenance"),
)
def forget_users_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..operators.maintenance import forget_keys

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_forgetstr_")
    table_dir = os.path.join(work, "events_by_day")
    req_dir = os.path.join(work, "requests")
    (
        events.withColumn("day", F.to_date(F.date_trunc("day", "ts")))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(table_dir)
    )
    requests = (
        events.select("user_id")
        .filter(F.col("user_id") % 97 == 3)
        .distinct()
    )
    requests.repartition(3).write.mode("overwrite").parquet(req_dir)

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        forget_keys(
            batch.sparkSession, table_dir, "day", "user_id", batch
        )

    q = (
        spark.readStream.schema(requests.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(req_dir)
        .writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    survivors = spark.read.parquet(table_dir)
    return survivors.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(28,6)"))
        .cast("double")
        .alias("total_value"),
    )


_SYNC_ROW_SQL = """CAST(('0x' || substr(md5(concat_ws('|',
    CAST(event_id AS VARCHAR), event_type,
    CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR))), 1, 15))
    AS BIGINT)"""


@query(
    "partition_sync_plan",
    oracle=f"""
        WITH src AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   {_SYNC_ROW_SQL} AS rh
            FROM events
        ),
        dst AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(('0x' || substr(md5(concat_ws('|',
                       CAST(event_id AS VARCHAR), event_type,
                       CAST(CAST(CASE WHEN event_id % 1000 = 7
                                      THEN value + 1 ELSE value END
                            AS DECIMAL(18,2)) AS VARCHAR))), 1, 15))
                       AS BIGINT) AS rh
            FROM events
            WHERE event_id % 997 <> 5
        ),
        sc AS (
            SELECT day, count(*) AS n_src, bit_xor(rh) AS x_src,
                   CAST(sum(rh % 2147483647) % 2147483647 AS BIGINT)
                       AS s_src
            FROM src GROUP BY day
        ),
        dc AS (
            SELECT day, count(*) AS n_dst, bit_xor(rh) AS x_dst,
                   CAST(sum(rh % 2147483647) % 2147483647 AS BIGINT)
                       AS s_dst
            FROM dst GROUP BY day
        )
        SELECT sc.day, n_src, coalesce(n_dst, 0) AS n_dst
        FROM sc LEFT JOIN dc ON sc.day = dc.day
        WHERE dc.day IS NULL OR n_src <> n_dst
              OR x_src <> x_dst OR s_src <> s_dst
    """,
    doc=(
        "scale pattern: INCREMENTAL SYNC PLANNING - per-partition "
        "order-insensitive checksums (count + xor + modular sum of "
        "row digests, the orders_table_checksum fold, keyed by day) "
        "computed on source and replica; only days whose triples "
        "differ need re-shipping. The rsync/anti-entropy primitive "
        "for 100 TB replication: one map+partial-agg scan per side, "
        "a days-sized exchange, and the backfill_partitions rewrite "
        "list falls out. The replica here is the source with planted "
        "drift (one value corrupted per ~1000 rows, one row in ~997 "
        "missing) so the plan provably catches both corruption and "
        "loss; clean days provably stay off the list."
    ),
    tags=("scale", "agg"),
)
def partition_sync_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def rowhash(value_col):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("event_id").cast("string"),
                        F.col("event_type"),
                        value_col.cast("decimal(18,2)").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")

    day = F.to_date(F.date_trunc("day", "ts")).alias("day")

    def sums(df, rh):
        return df.select(day, rh.alias("rh")).groupBy("day").agg(
            F.count("*").alias("n"),
            F.bit_xor("rh").alias("x"),
            (F.sum(F.col("rh") % 2147483647) % 2147483647)
            .cast("bigint")
            .alias("s"),
        )

    src = sums(events, rowhash(F.col("value")))
    drifted = F.when(
        F.col("event_id") % 1000 == 7, F.col("value") + 1
    ).otherwise(F.col("value"))
    dst = sums(
        events.filter(F.col("event_id") % 997 != 5), rowhash(drifted)
    )
    j = src.alias("s").join(
        dst.alias("d"), F.col("s.day") == F.col("d.day"), "left"
    )
    return j.filter(
        F.col("d.day").isNull()
        | (F.col("s.n") != F.col("d.n"))
        | (F.col("s.x") != F.col("d.x"))
        | (F.col("s.s") != F.col("d.s"))
    ).select(
        F.col("s.day").alias("day"),
        F.col("s.n").alias("n_src"),
        F.coalesce(F.col("d.n"), F.lit(0)).alias("n_dst"),
    )


@query(
    "consistent_sample",
    oracle=f"""
        WITH se AS (
            SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS doc_key, value
            FROM events
            WHERE substr(md5(json_extract_string(props, '$.k')), 1, 2)
                  < '1a'
        ),
        sd AS (
            SELECT doc_id, n_chars FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
        )
        SELECT CAST(count(*) AS BIGINT) AS n_sampled_events,
               (SELECT CAST(count(*) AS BIGINT) FROM sd)
                   AS n_sampled_docs,
               CAST(count(sd.doc_id) AS BIGINT) AS n_joined,
               {dsum_sql('se.value', 'sampled_value')}
        FROM se LEFT JOIN sd ON sd.doc_id = se.doc_key
    """,
    doc=(
        "scale pattern: CORRELATED (join-consistent) sampling - "
        "events and documents are sampled by the SAME hash predicate "
        "on the JOIN KEY, so every sampled event's document is "
        "guaranteed present in the sampled dimension (n_joined == "
        "n_sampled_events here, because the key hash decides both "
        "sides). Independent row sampling would break ~90% of the "
        "joins; key-hash sampling gives a coherent 10% universe - "
        "the only way debugging/dev copies of a 100 TB star schema "
        "stay queryable. Deterministic, no RNG; predicate is "
        "scan-pushable on both sides."
    ),
    tags=("scale", "scan", "join"),
)
def consistent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    key = F.get_json_object("props", "$.k")
    se = events.select(
        key.cast("bigint").alias("doc_key"), "value"
    ).filter(F.substring(F.md5(key), 1, 2) < "1a")
    sd = docs.select("doc_id", "n_chars").filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a"
    )
    n_docs = sd.agg(F.count("*").alias("n_sampled_docs"))
    return (
        se.join(F.broadcast(sd), se.doc_key == sd.doc_id, "left")
        .crossJoin(F.broadcast(n_docs))
        .agg(
            F.count("*").alias("n_sampled_events"),
            F.max("n_sampled_docs").alias("n_sampled_docs"),
            F.count("doc_id").alias("n_joined"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("sampled_value"),
        )
        .select(
            "n_sampled_events", "n_sampled_docs", "n_joined",
            "sampled_value",
        )
    )


@query(
    "capped_user_sample",
    oracle="""
        SELECT user_id, event_id, event_type
        FROM (
            SELECT user_id, event_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY md5(CAST(event_id AS VARCHAR)),
                                event_id
                   ) AS rn
            FROM events
        ) WHERE rn <= 20
    """,
    doc=(
        "scale pattern: PER-KEY FAN-OUT CAP - each user keeps at "
        "most 20 events, chosen by md5(event_id) rank (an unbiased, "
        "deterministic, reshard-stable within-user sample - NOT "
        "first-N, which biases toward early activity). The standing "
        "defense against power-law keys: co-visitation, journey "
        "regexes, per-user folds all go quadratic or unbounded on a "
        "bot with 10M events; capping first bounds every downstream "
        "per-key cost. Plans as WindowGroupLimit (partial top-k "
        "below the shuffle), so the cap itself never materializes a "
        "hot user's full history on one reducer."
    ),
    tags=("scale", "window"),
)
def capped_user_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    return (
        events.select(
            "user_id",
            "event_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 20)
        .select("user_id", "event_id", "event_type")
    )
