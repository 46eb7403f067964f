"""Replay-discipline chaos tests (VERDICT r3 item 5): foreachBatch is
at-least-once, so every state store folded from micro-batches must
tolerate a failed-then-retried batch id — the retry re-runs with the
SAME batch_id and must leave the drained result byte-identical to the
no-failure run. The stores under test claim this via per-batch subdirs
(written overwrite, excluded from their own prior read) + keyed
upserts; here a duplicate batch is injected deliberately to prove it.
"""

from __future__ import annotations

import pytest

import os
import tempfile

from pyspark.sql import functions as F

from click_streaming_data_pipeline_spark.sources import load_table

from .conftest import SF_TEST

# chaos replay sweeps re-run whole streams several times each —
# slow bucket (run per round via `pytest -m slow`)
pytestmark = pytest.mark.slow


def _doc_batches(spark, n=3, limit=120):
    docs = (
        load_table(spark, SF_TEST, "documents")
        .orderBy("doc_id")
        .limit(limit)
        .select("doc_id", "text")
        .collect()
    )
    per = (len(docs) + n - 1) // n
    schema = "doc_id string, text string"
    return [
        spark.createDataFrame(docs[i * per : (i + 1) * per], schema)
        for i in range(n)
    ]


def _drain_neardup(spark, batches, schedule, work):
    """Run process_batch over (batch_id, frame-index) pairs; returns
    the sorted drained pairs plus the postings-store row count."""
    from click_streaming_data_pipeline_spark.extensions.dedup_streaming import (
        process_batch,
    )

    stores = {k: os.path.join(work, k) for k in ("sh", "po", "pa")}
    for bid, idx in schedule:
        process_batch(
            batches[idx],
            batch_id=bid,
            shingle_store=stores["sh"],
            postings_store=stores["po"],
            pairs_store=stores["pa"],
            threshold=0.8,
        )
    pairs = sorted(
        map(tuple, spark.read.parquet(stores["pa"]).collect())
    )
    postings_rows = spark.read.parquet(
        os.path.join(stores["po"], "*")
    ).count()
    return pairs, postings_rows


def test_neardup_stream_replayed_batch_is_idempotent(spark):
    batches = _doc_batches(spark)
    clean = [(0, 0), (1, 1), (2, 2)]
    # batch 1 "fails" after committing its stores and is retried with
    # the same batch_id before batch 2 runs — the at-least-once path
    retry = [(0, 0), (1, 1), (1, 1), (2, 2)]
    with tempfile.TemporaryDirectory() as d1, tempfile.TemporaryDirectory() as d2:
        p1, n1 = _drain_neardup(spark, batches, clean, d1)
        p2, n2 = _drain_neardup(spark, batches, retry, d2)
    assert len(p1) > 0  # the corpus has near-dup pairs to protect
    assert p1 == p2
    assert n1 == n2  # no double-appended postings after the replay


def test_linkage_stream_replayed_batch_is_idempotent(spark):
    from click_streaming_data_pipeline_spark.extensions.linkage import (
        process_linkage_batch,
    )

    rows = [
        (1, "miller"), (2, "milller"), (3, "smith"),
        (4, "smyth"), (5, "jones"), (6, "jomes"),
        (7, "brown"), (8, "browne"), (9, "taylor"),
    ]
    frames = [
        spark.createDataFrame(rows[i : i + 3], "id long, name string")
        for i in (0, 3, 6)
    ]

    def drain(schedule, work):
        ks, ps = os.path.join(work, "k"), os.path.join(work, "p")
        for bid, idx in schedule:
            process_linkage_batch(
                frames[idx],
                batch_id=bid,
                id_col="id",
                s_col="name",
                key_store=ks,
                pairs_store=ps,
            )
        return sorted(map(tuple, spark.read.parquet(ps).collect()))

    with tempfile.TemporaryDirectory() as d1, tempfile.TemporaryDirectory() as d2:
        p1 = drain([(0, 0), (1, 1), (2, 2)], d1)
        p2 = drain([(0, 0), (1, 1), (1, 1), (2, 2)], d2)
    assert len(p1) >= 3  # miller/milller, smith/smyth, jones/jomes...
    assert p1 == p2


def test_cluster_state_replayed_batch_is_idempotent(spark):
    """fold_cluster_state versions commits as v{batch_id} reading only
    strictly-older versions: replaying a batch id must re-derive the
    identical label map and leave the final clustering unchanged."""
    from click_streaming_data_pipeline_spark.extensions.dedup_streaming import (
        fold_cluster_state,
    )

    edge_batches = [
        [(1, 2), (3, 4)],
        [(2, 3), (10, 11)],   # merges {1,2} with {3,4}
        [(4, 10)],            # merges everything but 20/21
        [(20, 21)],
    ]
    frames = [
        spark.createDataFrame(e, "id_a long, id_b long")
        for e in edge_batches
    ]

    def drain(schedule, work):
        store = os.path.join(work, "cl")
        for bid, idx in schedule:
            fold_cluster_state(spark, store, frames[idx], bid)
        latest = max(
            int(v[1:]) for v in os.listdir(store) if v.startswith("v")
        )
        return sorted(
            map(
                tuple,
                spark.read.parquet(os.path.join(store, f"v{latest}")).collect(),
            )
        )

    sched_clean = [(0, 0), (1, 1), (2, 2), (3, 3)]
    sched_retry = [(0, 0), (1, 1), (2, 2), (2, 2), (3, 3)]
    with tempfile.TemporaryDirectory() as d1, tempfile.TemporaryDirectory() as d2:
        c1 = drain(sched_clean, d1)
        c2 = drain(sched_retry, d2)
    assert c1 == c2
    labels = {doc: cl for doc, cl in c1}
    assert labels[1] == labels[2] == labels[3] == labels[4] == labels[10] == labels[11]
    assert labels[20] == labels[21] != labels[1]
