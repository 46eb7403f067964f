"""Extended TPC-H-shape analytics: the classic warehouse plans not yet
covered by catalog_core (Q7/Q10/Q14/Q15/Q19/Q22 shapes).

Each query exercises a distinct Catalyst capability at 100 TB scale —
disjunctive-pair dim filters, conditional-aggregate ratios, scalar
subquery broadcast, OR-of-ANDs predicate pushdown, window-max argmax
with ties, and anti-join against a filtered fact. Reference parity:
these are generic warehouse query shapes the reference's relational
surface (SURVEY.md section 2 C/D/E) implies; exact math follows
functions/exact.py so every oracle is a bit-identical hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import davg_sql, dsum, dsum_sql, query

_REVENUE_SQL = "l_extendedprice * (1 - l_discount)"


@query(
    "returned_item_customers",
    oracle=f"""
        SELECT c_custkey, c_name,
               {dsum_sql(_REVENUE_SQL, 'revenue')},
               c_acctbal, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    doc=(
        "TPC-H Q10 shape: top-20 customers by returned-item revenue in "
        "a year — fact-fact shuffle join + broadcast dim + top-k"
    ),
    tags=("join", "sort"),
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: both date and returnflag predicates push into the scans
    (orders prunes ~86% of partitions on a date-partitioned layout);
    nation broadcasts; final top-20 is TakeOrderedAndProject, never a
    global sort."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "nation_trade_volume",
    oracle=f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               {dsum_sql(_REVENUE_SQL, 'volume')}
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """,
    doc=(
        "TPC-H Q7 shape: bilateral trade volume between two nations by "
        "ship year — two broadcast copies of one dim under a "
        "disjunctive pair predicate"
    ),
    tags=("join", "agg"),
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the nation pair filter cuts supplier/customer to 2/25 of
    rows BEFORE the fact joins (Catalyst pushes each disjunct's
    equality into the dim scans); lineitem⋈orders shuffles on
    orderkey; both nation copies broadcast."""
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(dsum(revenue, "volume"))
    )


@query(
    "promo_revenue_share",
    oracle=f"""
        SELECT CAST(100.0 AS DOUBLE) * promo / total AS promo_pct,
               promo AS promo_revenue, total AS total_revenue
        FROM (
            SELECT
                {dsum_sql(
                    "CASE WHEN p_type = 'PROMO' THEN " + _REVENUE_SQL
                    + " ELSE 0 END",
                    "promo",
                )},
                {dsum_sql(_REVENUE_SQL, 'total')}
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-03-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
        )
    """,
    doc=(
        "TPC-H Q14 shape: promo revenue share — conditional-aggregate "
        "ratio in one pass (sum of CASE / sum), broadcast part dim"
    ),
    tags=("join", "agg"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: ONE scan computes both the conditional and the total sum
    (no second pass, no self-join); the month filter pushes into the
    lineitem scan; part broadcasts."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0))
    agg = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        dsum(promo, "promo"), dsum(revenue, "total")
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo") / F.col("total")).alias("promo_pct"),
        F.col("promo").alias("promo_revenue"),
        F.col("total").alias("total_revenue"),
    )


@query(
    "top_revenue_suppliers",
    oracle=f"""
        WITH srev AS (
            SELECT l_suppkey AS suppkey,
                   {dsum_sql(_REVENUE_SQL, 'total_revenue')}
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY 1
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM srev JOIN supplier ON suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM srev)
        ORDER BY s_suppkey
    """,
    doc=(
        "TPC-H Q15 shape: supplier(s) with max quarterly revenue — "
        "argmax over an aggregate with ties kept (window max, no "
        "second scan of the fact)"
    ),
    tags=("agg", "window"),
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one fact scan → per-supplier partial agg; the global max
    is a window over the (tiny) aggregate, not a re-scan; supplier dim
    broadcasts onto the winners."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    srev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        dsum(revenue, "total_revenue")
    )
    w = Window.partitionBy()
    winners = srev.withColumn(
        "__mx", F.max("total_revenue").over(w)
    ).filter(F.col("total_revenue") == F.col("__mx"))
    return (
        winners.join(F.broadcast(sup), winners.suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "brand_size_revenue",
    oracle=f"""
        SELECT {dsum_sql(_REVENUE_SQL, 'revenue')},
               count(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
               AND l_quantity >= 10 AND l_quantity <= 35)
           OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50
               AND l_quantity >= 20 AND l_quantity <= 50)
    """,
    doc=(
        "TPC-H Q19 shape: OR-of-ANDs mixed-table predicate — Catalyst "
        "factors the common part-side/lineitem-side conjuncts out of "
        "the disjunction and pushes them below the join"
    ),
    tags=("join", "agg"),
)
def brand_size_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the derived `p_brand IN (...)`/`p_size <= 50` and
    `l_quantity BETWEEN 1 AND 50` bounds reach the scans (visible as
    PushedFilters), so the join sees a fraction of both tables; part
    broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & (q >= 1) & (q <= 20))
        | ((b == "Brand#3") & s.between(10, 30) & (q >= 10) & (q <= 35))
        | ((b == "Brand#5") & s.between(20, 50) & (q >= 20) & (q <= 50))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(dsum(revenue, "revenue"), F.count("*").alias("n_lines"))
    )


@query(
    "rich_idle_customers",
    oracle=f"""
        WITH cutoff AS (
            SELECT {davg_sql('c_acctbal', 'avg_bal')}
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c_mktsegment,
               count(*) AS numcust,
               {dsum_sql('c_acctbal', 'totacctbal')}
        FROM customer, cutoff
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderpriority = '1-URGENT'
          )
        GROUP BY c_mktsegment
    """,
    doc=(
        "TPC-H Q22 shape: above-average-balance customers with no "
        "urgent orders — scalar-subquery broadcast + anti-join against "
        "a filtered fact + group count"
    ),
    tags=("join", "agg"),
)
def rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the global average reduces to ONE row (partial agg) and
    cross-joins back as a broadcast literal; the no-urgent-orders test
    is a shuffle anti-join on custkey (orders pre-filtered on priority
    and projected to the key column — pushdown + pruning make the anti
    side narrow)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    cutoff = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(28,6)")).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


@query(
    "shipping_priority",
    oracle=f"""
        SELECT l_orderkey,
               {dsum_sql(_REVENUE_SQL, 'revenue')},
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > TIMESTAMP '1997-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
        LIMIT 10
    """,
    doc=(
        "TPC-H Q3 shape: top-10 unshipped-order revenue for one "
        "market segment - the canonical two-fact join with "
        "complementary date predicates on EACH side (both push into "
        "the scans), partial-agg on orderkey, TakeOrderedAndProject "
        "top-k (never a global sort)"
    ),
    tags=("join", "sort", "agg"),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
        )
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
        )
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
    )


@query(
    "local_supplier_volume",
    oracle=f"""
        SELECT n_name,
               {dsum_sql(_REVENUE_SQL, 'revenue')}
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    doc=(
        "TPC-H Q5 shape: per-nation revenue where customer and "
        "supplier share a nation, restricted to one region and year - "
        "the 6-table star-with-a-twist join (the c_nationkey = "
        "s_nationkey equality is BETWEEN two dimension paths, which "
        "join reordering must handle); dims broadcast, facts shuffle "
        "once on orderkey"
    ),
    tags=("join", "agg"),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
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
    "nation_market_share",
    oracle=f"""
        WITH all_orders AS (
            SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   s_nationkey
            FROM part
            JOIN lineitem ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region ON cn.n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        )
        SELECT o_year,
               {dsum_sql("CASE WHEN s_nationkey = 7 THEN volume ELSE 0 END", 'nation_volume')},
               {dsum_sql('volume', 'total_volume')},
               CAST({dsum_sql("CASE WHEN s_nationkey = 7 THEN volume ELSE 0 END", 'x')[:-5]} AS DOUBLE)
                   / CAST({dsum_sql('volume', 'y')[:-5]} AS DOUBLE)
                   AS market_share
        FROM all_orders
        GROUP BY o_year
    """,
    doc=(
        "TPC-H Q8 shape: one supplier nation's yearly share of PROMO-"
        "part revenue sold into a region - conditional-vs-total "
        "decimal-exact sums in ONE pass with a single final division "
        "(no self-join for the denominator); the 7-table join tree "
        "broadcasts every dim and shuffles the two facts once"
    ),
    tags=("join", "agg"),
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice",
        "l_discount",
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "s_nationkey",
        )
    )
    is7 = F.when(F.col("s_nationkey") == 7, F.col("volume")).otherwise(0)
    return base.groupBy("o_year").agg(
        dsum(is7, "nation_volume"),
        dsum(F.col("volume"), "total_volume"),
        (
            F.sum(is7.cast("decimal(28,6)")).cast("double")
            / F.sum(F.col("volume").cast("decimal(28,6)")).cast("double")
        ).alias("market_share"),
    )


@query(
    "waiting_suppliers",
    oracle="""
        WITH late AS (
            SELECT l_orderkey, l_suppkey
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        )
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
        )
        AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
        )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 10
    """,
    doc=(
        "TPC-H Q21 shape (adapted to the available columns: 'late' = "
        "shipped >90 days after ordering): suppliers who were the "
        "SOLE late supplier on a multi-supplier order - the classic "
        "semi-join + anti-join against the same fact, which Catalyst "
        "must plan as two hash joins on orderkey reusing one "
        "exchange, never correlated per-row subqueries"
    ),
    tags=("join", "agg"),
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    others = li.select("l_orderkey", "l_suppkey").alias("l2")
    late3 = late.alias("l3")
    semi = l1.join(
        others,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    anti = semi.alias("l1").join(
        late3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        anti.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


@query(
    "large_quantity_orders",
    oracle=f"""
        WITH big AS (
            SELECT l_orderkey
            FROM lineitem
            GROUP BY 1
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)))
                        AS DOUBLE) > 250
        )
        SELECT c_name, c_custkey, o_orderkey,
               CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
               o_totalprice,
               {dsum_sql('l_quantity', 'sum_qty')}
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM big)
        GROUP BY 1, 2, 3, 4, 5
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 100
    """,
    doc=(
        "TPC-H Q18 shape: semi-join against an AGGREGATED subquery "
        "(orders whose lineitems sum past a quantity threshold, "
        "HAVING over a groupBy) feeding a three-table join and a "
        "top-100 composite sort. Catalyst plans the IN-subquery as a "
        "left-semi hash join on the pre-aggregated key set — the "
        "filter collapses the fact table before the wide join; "
        "deterministic via the orderkey tie-break at the LIMIT edge."
    ),
    tags=("join", "agg", "sort"),
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "__sq"))
        .filter(F.col("__sq") > 250)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(dsum("l_quantity", "sum_qty"))
        .orderBy(
            F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey"
        )
        .limit(100)
    )


@query(
    "customer_order_distribution",
    oracle="""
        WITH per_cust AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders
              ON c_custkey = o_custkey
             AND o_orderpriority <> '1-URGENT'
            GROUP BY 1
        )
        SELECT c_count, count(*) AS custdist
        FROM per_cust
        GROUP BY 1
        ORDER BY custdist DESC, c_count DESC
    """,
    doc=(
        "TPC-H Q13 shape: order-count-per-customer distribution via a "
        "LEFT OUTER join whose exclusion predicate lives in the ON "
        "clause (customers with only urgent orders must still appear "
        "with count 0 — moving the filter to WHERE would wrongly drop "
        "them), then a second aggregation over the first. Two "
        "shuffles: custkey, then the tiny count-histogram key."
    ),
    tags=("join", "agg"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "linestatus_priority_counts",
    oracle="""
        SELECT l_linestatus,
               count(*) FILTER (
                   WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
               ) AS high_line_count,
               count(*) FILTER (
                   WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               ) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    doc=(
        "TPC-H Q12 shape (adapted: this lineitem carries no shipmode, "
        "so linestatus is the classification column): per-status "
        "high/low-priority order-line counts in a ship year — "
        "conditional counts in ONE pass over the join (no per-branch "
        "re-scan); the year filter pushes into the lineitem scan"
    ),
    tags=("join", "agg"),
)
def linestatus_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: orderkey equi-join shuffles both facts once; the two
    CASE-counts fold in the same partial aggregate, so adding more
    priority buckets costs no extra scans. The tiny 2-row result
    ends with a negligible sort."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "product_type_profit",
    oracle=f"""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               {dsum_sql(
                   _REVENUE_SQL + " - p_retailprice * l_quantity * 0.1",
                   "sum_profit",
               )}
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%bolt%'
        GROUP BY 1, 2
    """,
    doc=(
        "TPC-H Q9 shape (adapted: no partsupp table, so supply cost is "
        "proxied as 10% of p_retailprice per unit): product-line "
        "profit by supplier nation and order year for parts matching "
        "a name pattern — the classic 5-table snowflake with a "
        "substring dim filter that prunes the fact through the join"
    ),
    tags=("join", "agg"),
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: part is filtered on the name pattern BEFORE joining (the
    LIKE pushes into the dim scan; only matching partkeys reach the
    fact join, and with AQE the shrunken part side broadcasts).
    supplier/nation broadcast; lineitem⋈orders is the one big
    orderkey shuffle. The profit expression keeps double
    multiplication order identical to the oracle (left-assoc), so the
    decimal-accumulated sum is bit-identical."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(profit, "sum_profit"))
    )


@query(
    "important_part_values",
    oracle=f"""
        WITH val AS (
            SELECT l_partkey AS partkey,
                   SUM(CAST({_REVENUE_SQL} AS DECIMAL(28,6))) AS dec_value
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_1'
            GROUP BY 1
        )
        SELECT partkey, CAST(dec_value AS DOUBLE) AS value
        FROM (
            SELECT partkey, dec_value,
                   SUM(dec_value) OVER () AS dec_total
            FROM val
        )
        WHERE CAST(dec_value AS DOUBLE)
              > CAST(dec_total AS DOUBLE) * 0.001
    """,
    doc=(
        "TPC-H Q11 shape (adapted: no partsupp, so 'stock value' is "
        "shipped revenue per part from one nation's suppliers): parts "
        "whose value exceeds a fraction of the nation-wide total — "
        "aggregate, then a scalar global total compared back against "
        "every group (HAVING over a scalar subquery)"
    ),
    tags=("join", "agg", "window"),
)
def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: ONE fact scan: the per-part aggregate is computed once
    in decimal, and the global total is a window-sum over that
    |parts|-sized aggregate — never a second pass over lineitem.
    Decimal accumulation in both stages keeps the threshold compare
    bit-identical across engines. The empty-frame window means every
    partition ships its one partial total — fine because the input is
    the aggregate, not the fact; at extreme |parts| swap in a
    broadcast scalar agg."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_1")
        .select("n_nationkey")
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    val = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(revenue).alias("dec_value"))
    )
    w = Window.partitionBy()
    return (
        val.withColumn("dec_total", F.sum("dec_value").over(w))
        .filter(
            F.col("dec_value").cast("double")
            > F.col("dec_total").cast("double") * F.lit(0.001)
        )
        .select("partkey", F.col("dec_value").cast("double").alias("value"))
    )


@query(
    "supplier_count_by_part",
    oracle="""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 10, 15, 20, 25)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY 1, 2, 3
    """,
    doc=(
        "TPC-H Q16 shape (adapted: supplier-part pairs come from "
        "shipped lineitems instead of partsupp, and the excluded-"
        "supplier set is the negative-balance ones instead of "
        "complaint comments): distinct-supplier counts per part "
        "attribute triple with a NOT-IN exclusion — anti-join + "
        "distinct aggregate"
    ),
    tags=("join", "agg"),
)
def supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the NOT IN is a broadcast anti-join (the excluded set is
    a filtered dim — tiny); part's three predicates push into its
    scan; count(DISTINCT) expands to the standard two-phase
    partial-distinct aggregate, shuffling (brand,type,size,suppkey)
    once, never collecting raw pairs."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "excess_shipped_suppliers",
    oracle="""
        WITH shipped AS (
            SELECT l_suppkey AS suppkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)))
                        AS DOUBLE) AS qty
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE 'small%'
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1
        )
        SELECT s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
          AND s_suppkey IN (SELECT suppkey FROM shipped WHERE qty > 50)
        ORDER BY s_name
    """,
    doc=(
        "TPC-H Q20 shape (adapted: no partsupp availqty, so the "
        "volume test is shipped quantity above a threshold): one "
        "nation's suppliers who moved > 50 units of name-matched "
        "parts in a year — a nested aggregate feeding a semi-join "
        "feeding a dim filter"
    ),
    tags=("join", "agg"),
)
def excess_shipped_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: part's name LIKE prunes before the fact join (prefix
    pattern even reaches the scan as a range PushedFilter); the
    per-supplier aggregate is over the doubly-filtered fact only; the
    final IN is a broadcast semi-join of the (tiny) qualifying
    supplier keys onto the nation-filtered dim."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    shipped = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("suppkey")
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_1")
        .select("n_nationkey")
    )
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(shipped), sup.s_suppkey == shipped.suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
