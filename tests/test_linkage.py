"""Semantics tests for the linkage / skyline / retractable-view
operators (plans/catalog_linkage.py): candidate-completeness of the
deletion-neighborhood join, skyline dominance + tie handling, and
abelian-group retraction folds with replay idempotence."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from click_streaming_data_pipeline_spark.extensions.linkage import (
    edit_distance_pairs,
)
from click_streaming_data_pipeline_spark.operators.incremental import (
    finalize_signed,
    fold_state_dir,
    merge_signed,
    read_state_dir,
    signed_state,
)
from click_streaming_data_pipeline_spark.operators.skyline import skyline_2d


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_complete_on_all_edit_kinds(spark):
    # substitution, insertion, deletion, identical, far-apart — the
    # blocking scheme must find every ed<=1 pair brute force finds
    names = [
        (1, "martha stuart"),
        (2, "martha stuartt"),  # insertion vs 1
        (3, "marta stuart"),  # deletion vs 1
        (4, "marsha stuart"),  # substitution vs 1
        (5, "martha stuart"),  # exact duplicate of 1 (dist 0)
        (6, "completely other"),
        (7, "x"),
        (8, ""),  # empty string edge: D("") = {""}
        (9, "y"),  # ed("x","y")=1 via substitution; ed("","x")=1
    ]
    df = spark.createDataFrame(names, ["id", "name"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, "id", "name").collect()
    }
    want = set()
    for i, (ia, na) in enumerate(names):
        for ib, nb in names[i + 1 :]:
            d = _lev(na, nb)
            if d <= 1:
                want.add((min(ia, ib), max(ia, ib), d))
    assert got == want
    assert (1, 5, 0) in got and (1, 2, 1) in got and (1, 3, 1) in got


def test_edit_distance_pairs_rejects_wide_radius(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "id", "name", max_dist=3)


def test_edit_distance_pairs_tau2_complete_on_all_edit_kinds(spark):
    """ed<=2 blocking must find every pair brute force finds, across
    every distance-2 edit COMBINATION: sub+sub, sub+ins, sub+del,
    ins+ins, del+del, ins+del (adjacent and apart, boundary and
    interior), repeated characters, unicode, and the empty/1-char
    edges where the 2-deletion neighborhood degenerates."""
    from click_streaming_data_pipeline_spark.extensions.linkage import (
        edit_distance_pairs_tau2,
    )

    names = [
        (1, "martha stuart"),
        (2, "marsha spuart"),    # sub+sub vs 1
        (3, "martha sstuartt"),  # ins+ins vs 1
        (4, "mrtha stuat"),      # del+del vs 1
        (5, "marthaa stuar"),    # ins+del vs 1
        (6, "msrtha stuarts"),   # sub+ins vs 1
        (7, "martha staart"),    # sub(+0): dist 1 vs 1
        (8, "xmartha stuartx"),  # boundary ins+ins vs 1
        (9, "artha stuar"),      # boundary del+del vs 1
        (10, "martha stuart"),   # duplicate of 1 (dist 0)
        (11, "completely other"),
        (12, "ab"),
        (13, "ba"),              # the classic shift: dist 2 vs 12
        (14, ""),                # ed("", "ab") = 2 via two inserts
        (15, "x"),
        (16, "aabb"),            # repeated chars
        (17, "abab"),            # dist 2 vs 16
        (18, "café bar"),
        (19, "cafe baar"),       # unicode sub + ins vs 18
    ]
    df = spark.createDataFrame(names, ["id", "name"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs_tau2(df, "id", "name").collect()
    }
    want = set()
    for i, (ia, na) in enumerate(names):
        for ib, nb in names[i + 1 :]:
            d = _lev(na, nb)
            if d <= 2:
                want.add((min(ia, ib), max(ia, ib), d))
    assert got == want
    for probe in [(1, 2, 2), (1, 3, 2), (1, 4, 2), (1, 5, 2), (1, 6, 2),
                  (1, 7, 1), (1, 8, 2), (1, 9, 2), (1, 10, 0),
                  (12, 13, 2), (12, 14, 2), (16, 17, 2), (18, 19, 2)]:
        assert probe in want and probe in got, probe


def test_edit_distance_pairs_tau2_randomized_vs_brute(spark):
    """Property sweep: random short strings over a tiny alphabet
    (maximizing edit collisions) — blocking+banded-verify must equal
    brute-force exactly, including dist values."""
    import random

    rng = random.Random(1234)
    names = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 6))))
        for i in range(120)
    ]
    from click_streaming_data_pipeline_spark.extensions.linkage import (
        edit_distance_pairs_tau2,
    )

    df = spark.createDataFrame(names, ["id", "name"])
    got = {
        (r.id_a, r.id_b): r.dist
        for r in edit_distance_pairs_tau2(df, "id", "name").collect()
    }
    want = {}
    for i, (ia, na) in enumerate(names):
        for ib, nb in names[i + 1 :]:
            d = _lev(na, nb)
            if d <= 2:
                want[(min(ia, ib), max(ia, ib))] = d
    assert got == want


def _brute_skyline(points):
    out = []
    for p in points:
        dominated = any(
            q[1] <= p[1]
            and q[2] >= p[2]
            and (q[1] < p[1] or q[2] > p[2])
            for q in points
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def test_skyline_matches_brute_force_and_keeps_ties(spark):
    rng = random.Random(7)
    pts = [(i, rng.randrange(50), rng.randrange(50)) for i in range(300)]
    # planted exact tie on both axes: both rows must survive if the
    # point is on the frontier
    pts += [(1000, -1, 999), (1001, -1, 999)]
    df = spark.createDataFrame(pts, ["id", "lo", "hi"]).repartition(7)
    got = sorted(tuple(r) for r in skyline_2d(df, "lo", "hi").collect())
    assert got == _brute_skyline(pts)
    assert (1000, -1, 999) in got and (1001, -1, 999) in got


def test_skyline_prune_phase_is_semantics_free(spark):
    rng = random.Random(11)
    pts = [(i, rng.randrange(20), rng.randrange(20)) for i in range(200)]
    df = spark.createDataFrame(pts, ["id", "lo", "hi"]).repartition(5)
    with_prune = sorted(
        tuple(r) for r in skyline_2d(df, "lo", "hi", prune=True).collect()
    )
    without = sorted(
        tuple(r) for r in skyline_2d(df, "lo", "hi", prune=False).collect()
    )
    assert with_prune == without


def test_signed_fold_retracts_and_replays(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    log1 = spark.createDataFrame(
        [("a", 1, 100), ("a", 1, 50), ("b", 1, 10)],
        ["k", "sign", "cents"],
    )
    # batch 2 fully retracts key b and updates one a row (+25)
    log2 = spark.createDataFrame(
        [("b", -1, 10), ("a", -1, 50), ("a", 1, 75)],
        ["k", "sign", "cents"],
    )
    for bid, log in [(0, log1), (1, log2)]:
        delta = signed_state(log, ["k"], "sign", "cents")
        fold_state_dir(
            spark, state_dir, delta, bid, ["k"], merge_fn=merge_signed
        )
    live = {
        (r.k, r.n_live, r.sum_live)
        for r in finalize_signed(
            read_state_dir(spark, state_dir), ["k"]
        ).collect()
    }
    assert live == {("a", 2, 175.0)}  # b fully retracted, a updated

    # at-least-once replay of batch 1: state must not double-retract
    delta2 = signed_state(log2, ["k"], "sign", "cents")
    fold_state_dir(
        spark, state_dir, delta2, 1, ["k"], merge_fn=merge_signed
    )
    replayed = {
        (r.k, r.n_live, r.sum_live)
        for r in finalize_signed(
            read_state_dir(spark, state_dir), ["k"]
        ).collect()
    }
    assert replayed == live


def test_linkage_stream_replay_idempotent(spark, tmp_path):
    from click_streaming_data_pipeline_spark.extensions.linkage import (
        process_linkage_batch,
    )

    key_store = str(tmp_path / "keys")
    pairs_store = str(tmp_path / "pairs")
    b0 = spark.createDataFrame(
        [(1, "alpha"), (2, "alpho")], ["id", "name"]
    )
    b1 = spark.createDataFrame(
        [(3, "alpha"), (4, "zeta")], ["id", "name"]
    )

    def fold(batch, bid):
        process_linkage_batch(
            batch,
            batch_id=bid,
            id_col="id",
            s_col="name",
            key_store=key_store,
            pairs_store=pairs_store,
        )

    fold(b0, 0)
    fold(b1, 1)
    want = {
        (r.id_a, r.id_b, r.dist)
        for r in spark.read.parquet(pairs_store).collect()
    }
    # cross-batch pair (1,3) dist 0 and (2,3) dist 1 must be present
    assert (1, 3, 0) in want and (2, 3, 1) in want and (1, 2, 1) in want

    fold(b1, 1)  # at-least-once replay of the last batch
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in spark.read.parquet(pairs_store).collect()
    }
    assert got == want


def test_join_view_delta_bilinear_telescoping(spark):
    # V maintained batch-by-batch must equal the direct join of final
    # z-sets for ANY batch assignment — including one where a retract
    # arrives BEFORE the insert it cancels (negative transient weight)
    from click_streaming_data_pipeline_spark.operators.incremental import (
        join_view_delta,
        merge_zset,
        zset_reduce,
    )

    a_rows = [  # (custkey, orderkey, cents, sign, batch)
        (1, 100, 500, 1, 0),
        (1, 101, 700, 1, 1),
        (1, 101, 700, -1, 2),  # cancelled later
        (2, 200, 900, 1, 0),
        (2, 200, 900, -1, 1),  # retract...
        (2, 200, 1400, 1, 2),  # ...reprice
        (3, 300, 100, -1, 0),  # retract arrives FIRST
        (3, 300, 100, 1, 1),  # its insert arrives later -> nets 0... 
        (3, 300, 100, 1, 2),  # ...then a true insert
    ]
    b_rows = [  # (custkey, segment, sign, batch)
        (1, "S1", 1, 0),
        (2, "S1", 1, 1),
        (2, "S1", -1, 2),
        (2, "S2", 1, 2),  # segment move
        (3, "S3", 1, 2),
    ]
    A_log = spark.createDataFrame(
        a_rows, "custkey long, o_orderkey long, cents long, sign int, batch int"
    )
    B_log = spark.createDataFrame(
        b_rows, "custkey long, segment string, sign int, batch int"
    )
    ak = ["custkey", "o_orderkey", "cents"]
    bk = ["custkey", "segment"]
    A = zset_reduce(A_log.filter(F.lit(False)), ak)
    B = zset_reduce(B_log.filter(F.lit(False)), bk)
    V = []
    for t in range(3):
        dA = zset_reduce(A_log.filter(F.col("batch") == t), ak)
        dB = zset_reduce(B_log.filter(F.col("batch") == t), bk)
        A_new = merge_zset(A, dA, ak).localCheckpoint(eager=True)
        V.append(join_view_delta(dA, A_new, B, dB, on="custkey"))
        B = merge_zset(B, dB, bk).localCheckpoint(eager=True)
        A = A_new
    dV = V[0]
    for piece in V[1:]:
        dV = dV.unionByName(piece)
    got = {
        (r["custkey"], r["o_orderkey"], r["segment"]): r["w"]
        for r in dV.groupBy("custkey", "o_orderkey", "cents", "segment")
        .agg(F.sum("w").alias("w"))
        .filter(F.col("w") != 0)
        .collect()
    }
    # direct join of the final live sides
    want = {(1, 100, "S1"): 1, (2, 200, "S2"): 1, (3, 300, "S3"): 1}
    assert got == want


def test_incremental_join_view_streamed_replay_idempotent(spark):
    # re-running a committed batch fold must not change the state: the
    # v{batch_id} discipline reads only versions < batch_id
    import os

    from click_streaming_data_pipeline_spark.operators.incremental import (
        merge_zset,
        read_prior_zset,
        write_zset_version,
        zset_reduce,
    )

    import tempfile

    d = tempfile.mkdtemp(prefix="csdp_ijv_test_")
    log = spark.createDataFrame(
        [(1, "x", 1), (1, "x", 1), (2, "y", -1)],
        "k long, v string, sign int",
    )
    dz = zset_reduce(log, ["k", "v"])
    prev0 = read_prior_zset(spark, d, 0, dz)
    assert prev0.count() == 0 and prev0.schema == dz.schema
    write_zset_version(merge_zset(prev0, dz, ["k", "v"]), d, 0)
    once = sorted(
        map(tuple, spark.read.parquet(os.path.join(d, "v0")).collect())
    )
    # replay batch 0: must reproduce byte-identical state
    prev0b = read_prior_zset(spark, d, 0, dz)
    write_zset_version(merge_zset(prev0b, dz, ["k", "v"]), d, 0)
    again = sorted(
        map(tuple, spark.read.parquet(os.path.join(d, "v0")).collect())
    )
    assert once == again == [(1, "x", 2), (2, "y", -1)]


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_join_view_delta_fuzz_equals_direct_join(spark, seed):
    # random two-sided changelogs with arbitrary batch assignment,
    # retracts that may precede inserts, and keys that fully net out:
    # the maintained view must equal the direct join of net z-sets
    import random

    from click_streaming_data_pipeline_spark.operators.incremental import (
        join_view_delta,
        merge_zset,
        zset_reduce,
    )

    rng = random.Random(seed)
    a_rows = [
        (
            rng.randint(1, 4),          # custkey
            rng.randint(100, 104),      # orderkey
            rng.choice([500, 700]),     # cents
            rng.choice([1, 1, -1]),     # sign (insert-biased)
            rng.randint(0, 2),          # batch
        )
        for _ in range(rng.randint(4, 14))
    ]
    b_rows = [
        (
            rng.randint(1, 4),
            rng.choice(["S1", "S2"]),
            rng.choice([1, 1, -1]),
            rng.randint(0, 2),
        )
        for _ in range(rng.randint(3, 10))
    ]
    A_log = spark.createDataFrame(
        a_rows, "custkey long, o_orderkey long, cents long, sign int, batch int"
    )
    B_log = spark.createDataFrame(
        b_rows, "custkey long, segment string, sign int, batch int"
    )
    ak = ["custkey", "o_orderkey", "cents"]
    bk = ["custkey", "segment"]
    A = zset_reduce(A_log.filter(F.lit(False)), ak)
    B = zset_reduce(B_log.filter(F.lit(False)), bk)
    pieces = []
    for t in range(3):
        dA = zset_reduce(A_log.filter(F.col("batch") == t), ak)
        dB = zset_reduce(B_log.filter(F.col("batch") == t), bk)
        A_new = merge_zset(A, dA, ak).localCheckpoint(eager=True)
        pieces.append(join_view_delta(dA, A_new, B, dB, on="custkey"))
        B = merge_zset(B, dB, bk).localCheckpoint(eager=True)
        A = A_new
    dV = pieces[0]
    for p in pieces[1:]:
        dV = dV.unionByName(p)
    keys = ["custkey", "o_orderkey", "cents", "segment"]
    got = {
        tuple(r[k] for k in keys): r["w"]
        for r in dV.groupBy(*keys)
        .agg(F.sum("w").alias("w"))
        .filter(F.col("w") != 0)
        .collect()
    }
    # direct join of final net z-sets (weights multiply)
    want = {}
    a_net, b_net = {}, {}
    for ck, ok, c, s, _ in a_rows:
        a_net[(ck, ok, c)] = a_net.get((ck, ok, c), 0) + s
    for ck, seg, s, _ in b_rows:
        b_net[(ck, seg)] = b_net.get((ck, seg), 0) + s
    for (ck, ok, c), wa in a_net.items():
        if wa == 0:
            continue
        for (ck2, seg), wb in b_net.items():
            if ck2 == ck and wb != 0 and wa * wb != 0:
                want[(ck, ok, c, seg)] = wa * wb
    assert got == want, (seed, got, want)
