"""Adversarial-relational conformance (fourth leg, next to the
texts/embeddings/events suites): the TPC-H-shaped lanes are the most
driver-exposed family, and their cross-engine discipline rests on
cent-space rounding (``round(x * 100)`` tie semantics), DESC
pagination tie-breaks, and boundary-date predicates (``l_shipdate <=
TIMESTAMP '2001-09-02'``). This corpus hits exactly those seams:
half-cent ties at binary-exact values (x.125, x.5 — both engines see
the identical double, so only the ROUNDING rule is under test),
duplicate (totalprice, orderdate) pairs for pagination ordering,
timestamps exactly at and one microsecond past the predicate
constants, zero/negative/huge prices, and quantity exactly at the
``> 50`` threshold.

Values whose shortest-repr-vs-binary decimal rounding diverges (e.g.
0.0000005, repr '5e-07' but binary ...4999) are deliberately NOT
included: that cast-level divergence class is documented in README
conformance notes and guarded by generated-data precision, not by
per-lane code.

Dimension tables are the real sf0.001 parquet (valid FK targets);
only orders and lineitem are adversarial.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime

import duckdb
import pytest

from click_streaming_data_pipeline_spark.plans import QUERIES

from tools.driver_check import value_hash

from .conftest import SF_TEST

_D = datetime

ADVERSARIAL_ORDERS = [
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    # half-cent tie, binary-exact: 100.125 * 100 = 10012.5 exactly
    (1, 1, "O", 100.125, _D(2001, 9, 1), "1-URGENT"),
    (2, 2, "O", 100.125, _D(2001, 9, 1), "2-HIGH"),     # full tie w/ key 1
    (3, 1, "F", 0.005, _D(2001, 9, 2), "3-MEDIUM"),     # sub-cent price
    (4, 4, "F", -50.5, _D(2001, 9, 2), "4-NOT SPECIFIED"),  # negative .5 tie
    (5, 5, "P", 0.0, _D(2001, 9, 2, 0, 0, 0, 1), "5-LOW"),  # 1us past boundary
    (6, 6, "O", 9.9e12, _D(1992, 1, 1), "1-URGENT"),    # huge price, early date
    (7, 7, "F", 123.25, _D(1998, 12, 31, 23, 59, 59, 999999), "2-HIGH"),
    (8, 8, "O", 123.25, _D(1998, 12, 31, 23, 59, 59, 999999), "2-HIGH"),
    (9, 2, "O", 55.5, _D(2001, 9, 1), "3-MEDIUM"),      # repeat customer 2
    (10, 2, "F", 55.5, _D(2001, 9, 1), "3-MEDIUM"),
]

ADVERSARIAL_LINEITEM = [
    # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
    #  l_shipdate)
    (1, 1, 1, 1, 50.0, 100.125, 0.05, 0.0, "R", "F", _D(2001, 9, 2)),
    (1, 2, 2, 2, 50.125, 200.5, 0.07, 0.02, "A", "F", _D(2001, 9, 2)),
    (2, 3, 3, 1, 0.0, 0.0, 0.0, 0.0, "N", "O", _D(2001, 9, 2, 0, 0, 0, 1)),
    (2, 4, 4, 2, 1.0, -25.125, 1.0, 0.5, "R", "F", _D(2001, 9, 1)),
    (3, 5, 5, 1, 51.0, 9.9e12, 0.05, 0.04, "A", "F", _D(1992, 1, 1)),
    (4, 6, 6, 1, 49.5, 10.5, 0.06, 0.01, "N", "O", _D(2001, 9, 3)),
    (5, 7, 7, 1, 50.0, 10.5, 0.06, 0.01, "N", "F", _D(2001, 9, 3)),
    (6, 8, 8, 1, 2.0, 33.25, 0.0, 0.0, "R", "O", _D(1998, 12, 31)),
    (7, 9, 9, 1, 3.0, 44.125, 0.02, 0.03, "A", "O", _D(2001, 9, 2)),
    (8, 10, 10, 1, 3.0, 44.125, 0.02, 0.03, "A", "O", _D(2001, 9, 2)),
    (9, 1, 2, 1, 7.25, 77.5, 0.05, 0.02, "N", "O", _D(2001, 9, 1)),
    (10, 2, 3, 1, 7.25, 77.5, 0.05, 0.02, "R", "F", _D(2001, 9, 1)),
]

# lanes reading only {orders, lineitem} + real dims, each oracled
RELATIONAL_QUERIES = [
    "pricing_summary",
    "paginate_orders",
    "paginate_orders_keyset",
    "top_orders",
    "nation_revenue",
    "shipping_priority",
    "large_quantity_orders",
    "table_profile",
    "orders_table_checksum",
    "repeat_customers",
    "lapsed_customers",
    "price_quantity_correlation",
]

_DIM_TABLES = ("region", "nation", "customer", "supplier", "part")


@pytest.fixture(scope="module")
def adversarial_rel_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adv_rel"))
    for t in _DIM_TABLES:
        shutil.copy(
            os.path.join(SF_TEST, f"{t}.parquet"),
            os.path.join(d, f"{t}.parquet"),
        )
    spark.createDataFrame(
        ADVERSARIAL_ORDERS,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        ADVERSARIAL_LINEITEM,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.parquet(os.path.join(d, "lineitem.parquet"))
    return d


@pytest.mark.parametrize("name", RELATIONAL_QUERIES)
def test_adversarial_relational_match_oracle(spark, adversarial_rel_dir, name):
    if name not in QUERIES or not QUERIES[name].oracle:
        pytest.skip(f"{name} not in catalog or not oracled")
    sdf = QUERIES[name].fn(spark, adversarial_rel_dir)
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in _DIM_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{adversarial_rel_dir}/{t}.parquet'"
        )
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{adversarial_rel_dir}/{t}.parquet/*.parquet'"
        )
    cur = con.execute(QUERIES[name].oracle)
    ocols = [d_[0] for d_ in cur.description]
    orows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows), (len(srows), len(orows))
    assert value_hash(srows, sdf.columns) == value_hash(orows, ocols), (
        f"{name}: engines diverge on adversarial orders/lineitem; "
        f"spark sample={sorted(srows, key=repr)[:4]} "
        f"oracle sample={sorted(orows, key=repr)[:4]}"
    )
