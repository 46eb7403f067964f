"""Adversarial-events conformance (the third leg next to the
adversarial-texts and adversarial-embeddings suites): the driver can
regenerate events.parquet at any round, and today's tables happen to
contain no (user_id, ts) ties, no exact window-boundary timestamps
and no day-edge microseconds — properties dozens of ordering-
sensitive lanes implicitly enjoy. Every ordering in the engine
tie-breaks by event_id BY DESIGN; this suite proves the design holds
engine-to-engine on a corpus made of exactly those hazards: same-ts
event bursts, event_id order opposing time order, exact tumbling/
session boundary hits, day-edge microseconds, duplicate-type change
runs, zero/negative values, and props with and without the '$.k'
page key.
"""

from __future__ import annotations

import os
from datetime import datetime

import duckdb
import pytest

from click_streaming_data_pipeline_spark.plans import QUERIES

from tools.driver_check import value_hash


def _ts(d, h=0, m=0, s=0, us=0):
    return datetime(2024, 1, d, h, m, s, us)


ADVERSARIAL_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    # user 1: five events at the SAME instant — ordering must fall
    # back to event_id identically in both engines
    (101, _ts(1, 10, 0, 0), 1, "view", 1.0, '{"k": 1}'),
    (102, _ts(1, 10, 0, 0), 1, "click", 2.0, '{"k": 2}'),
    (103, _ts(1, 10, 0, 0), 1, "view", 0.0, '{"k": 3}'),
    (104, _ts(1, 10, 0, 0), 1, "purchase", -5.5, '{"k": 1}'),
    (105, _ts(1, 10, 0, 0), 1, "view", 3.25, '{"k": 2}'),
    # user 2: exact window-boundary hits (tumbling [start, end))
    (201, _ts(2, 0, 0, 0), 2, "view", 1.0, '{"k": 4}'),
    (202, _ts(2, 0, 5, 0), 2, "click", 1.0, '{"k": 5}'),
    (203, _ts(2, 1, 0, 0), 2, "error", 0.0, '{"k": 4}'),
    (204, _ts(2, 23, 59, 59, 999999), 2, "purchase", 9.75, '{"k": 5}'),
    (205, _ts(3, 0, 0, 0), 2, "view", 2.0, '{"k": 4}'),
    # user 3: event_id order OPPOSES time order
    (309, _ts(3, 9, 0, 0), 3, "view", 1.0, '{"k": 6}'),
    (308, _ts(3, 9, 30, 0), 3, "click", 2.0, '{"k": 7}'),
    (307, _ts(3, 10, 0, 0), 3, "purchase", 3.0, '{"k": 6}'),
    # user 4: single event, props WITHOUT the '$.k' page key
    (401, _ts(4, 12, 0, 0), 4, "signup", 0.0, '{"other": true}'),
    # user 5: same ts AND same type twice (change-detection ties)
    (501, _ts(5, 8, 0, 0), 5, "view", 1.0, '{"k": 8}'),
    (502, _ts(5, 8, 0, 0), 5, "view", 1.0, '{"k": 8}'),
    (503, _ts(5, 9, 0, 0), 5, "click", 2.0, '{"k": 9}'),
    (504, _ts(5, 9, 0, 0), 5, "view", 1.5, '{"k": 8}'),
    # user 6: long same-type run then alternation (scd2 segments)
    (601, _ts(6, 1, 0, 0), 6, "view", 1.0, '{"k": 1}'),
    (602, _ts(6, 2, 0, 0), 6, "view", 1.0, '{"k": 2}'),
    (603, _ts(6, 3, 0, 0), 6, "view", 1.0, '{"k": 1}'),
    (604, _ts(6, 4, 0, 0), 6, "click", 0.5, '{"k": 2}'),
    (605, _ts(6, 5, 0, 0), 6, "view", 1.0, '{"k": 1}'),
    (606, _ts(6, 6, 0, 0), 6, "purchase", 100.0, '{"k": 2}'),
]

# events-only catalog queries with full value oracles, chosen for
# ordering/tie/boundary sensitivity
EVENT_QUERIES = [
    "latest_event_per_user",
    "user_status_scd2",
    "funnel_steps",
    "cep_funnel_regex",
    "window_tumbling",
    "window_session",
    "page_transitions",
    "event_id_gaps",
    "user_state_batch",
    "hourly_error_spine",
    "event_type_mode_value",
    "value_cusum_changepoint",
    "asof_attribution",
    "linear_attribution",
    "item_cooccurrence",
    "event_type_funnel",
    "heavy_hitters_cms",
    # graph lanes walk (ts, event_id)-ordered transitions: same-ts
    # bursts and the missing-'$.k' props doc exercise their edges
    "page_rank",
    "markov_transitions",
    "window_sliding",
]


@pytest.fixture(scope="module")
def adversarial_events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adv_ev"))
    spark.createDataFrame(
        ADVERSARIAL_EVENTS,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_adversarial_events_match_oracle(spark, adversarial_events_dir, name):
    if name not in QUERIES or not QUERIES[name].oracle:
        pytest.skip(f"{name} not in catalog or not oracled")
    sdf = QUERIES[name].fn(spark, adversarial_events_dir)
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{adversarial_events_dir}/events.parquet/*.parquet'"
    )
    cur = con.execute(QUERIES[name].oracle)
    ocols = [d_[0] for d_ in cur.description]
    orows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows), (len(srows), len(orows))
    assert value_hash(srows, sdf.columns) == value_hash(orows, ocols), (
        f"{name}: engines diverge on adversarial events; "
        f"spark sample={sorted(srows, key=repr)[:4]} "
        f"oracle sample={sorted(orows, key=repr)[:4]}"
    )
