"""Property-based tests (hypothesis) for engine invariants that the
fixed test corpus can't sweep: last-write-wins resolution, exact
decimal aggregation, uuid7 ordering, and salted-distinct equality.
Small generated frames, spark-round-tripped."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from click_streaming_data_pipeline_spark.functions.exact import dsum
from click_streaming_data_pipeline_spark.functions.scalars import (
    uuid7_deterministic,
)
from click_streaming_data_pipeline_spark.operators.skew import (
    salted_distinct_count,
)
from click_streaming_data_pipeline_spark.operators.upsert import latest_rows

_SETTINGS = dict(
    max_examples=12,  # each example round-trips through the JVM
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),  # key
        st.integers(0, 8),  # version
        st.integers(0, 3),  # payload
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_latest_rows_is_max_version_per_key(spark, rows):
    df = spark.createDataFrame(rows, ["id", "version", "payload"])
    got = {
        r["id"]: r["version"]
        for r in latest_rows(df, ["id"], ["version", "payload"]).collect()
    }
    expected = {}
    for k, v, _ in rows:
        expected[k] = max(expected.get(k, -1), v)
    assert got == expected
    # idempotence: resolving an already-resolved frame is a no-op
    once = latest_rows(df, ["id"], ["version", "payload"])
    twice = latest_rows(once, ["id"], ["version", "payload"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


@given(
    vals=st.lists(
        st.decimals(
            min_value=Decimal("-99999.99"),
            max_value=Decimal("99999.99"),
            places=2,
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_dsum_is_exact_regardless_of_partitioning(spark, vals):
    """Decimal-exact sums must equal the true decimal sum and be
    invariant under repartitioning (double sums are neither)."""
    truth = float(sum(vals))
    df = spark.createDataFrame(
        [(float(v),) for v in vals], ["x"]
    )
    a = df.agg(dsum("x", "s")).collect()[0]["s"]
    b = df.repartition(7).agg(dsum("x", "s")).collect()[0]["s"]
    assert a == b == pytest.approx(truth, abs=1e-9)


@given(
    pairs=st.lists(
        st.tuples(
            st.datetimes(
                min_value=dt.datetime(2000, 1, 1),
                max_value=dt.datetime(2030, 1, 1),
            ),
            st.integers(0, 10_000),
        ),
        min_size=2,
        max_size=30,
        unique_by=lambda p: p,
    )
)
@settings(**_SETTINGS)
def test_uuid7_lexicographic_order_matches_time_order(spark, pairs):
    df = spark.createDataFrame(pairs, ["ts", "entropy"])
    got = (
        df.select(
            "ts", uuid7_deterministic(F.col("ts"), F.col("entropy")).alias("u")
        )
        .collect()
    )
    by_time = [r["u"] for r in sorted(got, key=lambda r: (r["ts"], r["u"]))]
    by_uuid = sorted(r["u"] for r in got)
    assert by_time == by_uuid


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 50)),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_salted_distinct_equals_plain_distinct(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    salted = {
        r["k"]: r["n_distinct"]
        for r in salted_distinct_count(df, "k", "v").collect()
    }
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    assert salted == plain


def test_cohort_retention_semantics(spark):
    """Planted three-week corpus: cohort A (users 1,2) starts week 0,
    user 2 churns after week 1; cohort B (user 3) starts week 1."""
    import datetime as dt

    from pyspark.sql import functions as F

    def t(day, uid, eid):
        return (eid, dt.datetime(2024, 1, 1 + day, 12, 0, 0), uid, "view", 1.0, "{}")

    rows = [
        t(0, 1, 1), t(1, 2, 2),            # week 0: users 1,2 (cohort A)
        t(7, 1, 3), t(8, 2, 4), t(9, 3, 5),  # week 1: all; user 3 = cohort B
        t(14, 1, 6), t(15, 3, 7),           # week 2: users 1,3
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import click_streaming_data_pipeline_spark.plans.catalog_temporal as ct

    # drive the same plan the catalog runs, on the planted frame
    from pyspark.sql.window import Window

    active = events.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("active_week")
    ).distinct()
    withc = active.withColumn(
        "cohort_week", F.min("active_week").over(Window.partitionBy("user_id"))
    )
    per = withc.groupBy(
        "cohort_week",
        F.expr("CAST(datediff(active_week, cohort_week) DIV 7 AS INT)").alias(
            "week_offset"
        ),
    ).agg(F.count("*").alias("n_active"))
    w = Window.partitionBy("cohort_week").orderBy("week_offset")
    out = per.select(
        "cohort_week", "week_offset", "n_active",
        F.first("n_active").over(w).alias("cohort_size"),
        (F.col("n_active").cast("double") / F.first("n_active").over(w)).alias(
            "retention_rate"
        ),
    ).collect()
    cells = {(str(r["cohort_week"]), r["week_offset"]): r for r in out}
    a, b = "2024-01-01", "2024-01-08"
    assert cells[(a, 0)]["n_active"] == 2 and cells[(a, 0)]["cohort_size"] == 2
    assert cells[(a, 1)]["n_active"] == 2      # both cohort-A users active
    assert cells[(a, 2)]["n_active"] == 1      # user 2 churned
    assert cells[(a, 2)]["retention_rate"] == 0.5
    assert cells[(b, 0)]["n_active"] == 1 and cells[(b, 1)]["n_active"] == 1
    assert (b, 2) not in cells                 # no third week for cohort B
    assert all(r["retention_rate"] <= 1.0 for r in out)
    assert ct.cohort_retention is not None     # catalog wiring exists


def test_value_quantiles_approx_error_bound(spark):
    """The deterministic bottom-k sample sketch (k=2048) must land
    each percentile within the sampling-error neighborhood of the
    exact interpolated percentile IN RANK TERMS: rank error of a
    k-subsample quantile is O(sqrt(q(1-q)/k)) — allow 5 sigma. Also
    keeps percentile_approx (Greenwald-Khanna) as a CONFORMANCE PROBE
    computed here in-test (its engine-internal sketch can't be
    value-oracled, so it no longer backs the catalog lane)."""
    import bisect
    import collections

    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.plans.catalog_core import (
        VQ_APPROX_K,
        value_quantiles,
        value_quantiles_approx,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    exact = {r["event_type"]: r for r in value_quantiles(spark, SF_TEST).collect()}
    approx = {
        r["event_type"]: r for r in value_quantiles_approx(spark, SF_TEST).collect()
    }
    assert set(exact) == set(approx)
    events = load_table(spark, SF_TEST, "events")
    vals = collections.defaultdict(list)
    for r in events.select("event_type", "value").collect():
        vals[r["event_type"]].append(r["value"])
    for et, a in approx.items():
        xs = sorted(vals[et])
        n = len(xs)
        k_eff = min(n, VQ_APPROX_K)
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            got = a[col]
            # rank of the estimate in the FULL multiset vs target q*n,
            # tolerance = 5 sigma of the subsample quantile rank error
            lo = bisect.bisect_left(xs, got)
            hi = bisect.bisect_right(xs, got)
            sigma = (q * (1 - q) / k_eff) ** 0.5 * n
            slack = 5 * sigma + 2
            target = q * n
            assert lo - slack <= target <= hi + slack, (et, col, got)

    # GK conformance probe (the 100-TB alternative the lane documents):
    # an actual data point within eps*n rank error
    gk = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("p50"),
            F.percentile_approx("value", 0.9, 10000).alias("p90"),
            F.percentile_approx("value", 0.99, 10000).alias("p99"),
        )
        .collect()
    }
    for et, a in gk.items():
        xs = sorted(vals[et])
        n = len(xs)
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            got = a[col]
            assert got in vals[et]  # GK returns an actual data point
            lo = bisect.bisect_left(xs, got)
            hi = bisect.bisect_right(xs, got)
            target = q * n
            slack = n / 10000 + 1
            assert lo - slack <= target <= hi + slack, (et, col, got)


def test_cms_overestimates_and_merges(spark):
    from click_streaming_data_pipeline_spark.extensions.sketch import (
        cms_build,
        cms_estimate,
        cms_merge,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    events = load_table(spark, SF_TEST, "events")
    sketch = cms_build(events, "user_id")
    grid = sketch.collect()
    assert len(grid) <= 4 * 32
    assert sum(r["n"] for r in grid) == 4 * events.count()

    exact = {r["user_id"]: r["n"] for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    items = events.select("user_id").distinct()
    est = {r["user_id"]: r["cms_est"] for r in cms_estimate(items, sketch, "user_id").collect()}
    assert set(est) == set(exact)
    # CMS law: never underestimates
    assert all(est[u] >= exact[u] for u in exact)
    # and with d=4 rows the min usually lands close: median error small
    errs = sorted(est[u] - exact[u] for u in exact)
    assert errs[len(errs) // 2] <= sum(exact.values()) // 16

    # mergeability: sketch(A) + sketch(B) == sketch(A union B)
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    merged = {
        (r["r"], r["col"]): r["n"]
        for r in cms_merge(cms_build(a, "user_id"), cms_build(b, "user_id")).collect()
    }
    full = {(r["r"], r["col"]): r["n"] for r in grid}
    assert merged == full


def test_salted_join_equals_plain_join(spark):
    """Skewed fact (one hot key) joined to a dim with broadcast
    disabled — the salted path must equal the plain join for inner
    and left, including unmatched fact rows appearing exactly once."""
    from click_streaming_data_pipeline_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1, i) for i in range(500)]  # hot key 1
        + [(k, k * 1000) for k in range(2, 30)]  # long tail
        + [(99, 0)],  # key missing from dim
        ["k", "payload"],
    )
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(0, 40)], ["k", "name"]
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for how in ("inner", "left"):
            got = sorted(
                map(tuple, salted_join(fact, dim, ["k"], how=how).collect())
            )
            want = sorted(map(tuple, fact.join(dim, ["k"], how).collect()))
            assert got == want, how
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="full")


def test_incremental_merge_equals_full_agg(spark):
    """merge(agg(A), agg(B)) == agg(A U B) — including HLL sketch
    union and keys that exist in only one slice."""
    from click_streaming_data_pipeline_spark.operators.incremental import (
        agg_state,
        finalize,
        merge_states,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    events = load_table(spark, SF_TEST, "events").select(
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        "value",
        "user_id",
        "event_id",
    )
    a = events.filter(F.col("event_id") % 3 == 0)
    b = events.filter(F.col("event_id") % 3 != 0)
    merged = finalize(
        merge_states(
            agg_state(a, ["k"], "value", uniq="user_id"),
            agg_state(b, ["k"], "value", uniq="user_id"),
            ["k"],
        )
    )
    full = finalize(agg_state(events, ["k"], "value", uniq="user_id"))
    mrows = {r["k"]: r for r in merged.collect()}
    frows = {r["k"]: r for r in full.collect()}
    assert set(mrows) == set(frows)
    for k, f in frows.items():
        m = mrows[k]
        assert m["n_rows"] == f["n_rows"]
        assert m["sum_value"] == f["sum_value"]  # decimal-exact merge
        assert m["min_value"] == f["min_value"]
        assert m["max_value"] == f["max_value"]
        # HLL register-state union == sketch of the union, so the
        # ESTIMATES are identical, not merely close
        assert m["approx_uniques"] == f["approx_uniques"]

    # a slice with keys absent from the other merges cleanly
    only_b = finalize(
        merge_states(
            agg_state(a.filter(F.lit(False)), ["k"], "value", uniq="user_id"),
            agg_state(b, ["k"], "value", uniq="user_id"),
            ["k"],
        )
    ).count()
    assert only_b == b.select("k").distinct().count()


def test_incremental_fold_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-folding the same batch_id
    must reproduce identical state, never double-merge its delta."""
    from click_streaming_data_pipeline_spark.operators.incremental import (
        agg_state,
        finalize,
        fold_state_dir,
        read_state_dir,
    )

    rows = [(k, float(v)) for k in range(3) for v in range(5)]
    df = spark.createDataFrame(rows, "k int, value double")
    d0 = agg_state(df.filter("value < 2"), ["k"], "value")
    d1 = agg_state(df.filter("value >= 2"), ["k"], "value")
    sd = str(tmp_path / "state")

    fold_state_dir(spark, sd, d0, 0, ["k"])
    fold_state_dir(spark, sd, d1, 1, ["k"])
    once = sorted(map(tuple, finalize(read_state_dir(spark, sd)).collect()))
    # replay batch 1 (crash-after-commit scenario)
    fold_state_dir(spark, sd, d1, 1, ["k"])
    replayed = sorted(map(tuple, finalize(read_state_dir(spark, sd)).collect()))
    assert once == replayed
    # and the state equals the from-scratch aggregation
    full = sorted(map(tuple, finalize(agg_state(df, ["k"], "value")).collect()))
    assert once == full


def test_table_checksum_detects_single_value_change(spark):
    """The reconciliation checksum must differ when any one value
    changes, and be invariant to row order/partitioning."""
    from click_streaming_data_pipeline_spark.plans import QUERIES

    from .conftest import SF_TEST

    base = QUERIES["orders_table_checksum"].fn(spark, SF_TEST).collect()[0]

    from click_streaming_data_pipeline_spark.sources import load_table
    from pyspark.sql import functions as F

    orders = load_table(spark, SF_TEST, "orders")
    # same rows, different order/partitioning -> identical checksum
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        orders.orderBy(F.rand(7)).repartition(13).write.parquet(d + "/o")
        shuffled = spark.read.parquet(d + "/o")
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

        def checksum(df):
            return df.select(rh.alias("rh")).agg(
                F.count("*").alias("n_rows"),
                F.bit_xor("rh").alias("xor_hash"),
                (F.sum(F.col("rh") % 2147483647) % 2147483647)
                .cast("long")
                .alias("sum_hash"),
            ).collect()[0]

        same = checksum(shuffled)
        assert tuple(same) == tuple(base)
        # flip one value -> all three-tuple must differ in hash parts
        mutated = shuffled.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") == 1, F.col("o_totalprice") + 0.01)
            .otherwise(F.col("o_totalprice")),
        )
        diff = checksum(mutated)
        assert diff["n_rows"] == same["n_rows"]
        assert (diff["xor_hash"], diff["sum_hash"]) != (
            same["xor_hash"], same["sum_hash"]
        )


def test_zorder_key_roundtrip_and_locality(spark):
    """Morton interleave: de-interleaving the key recovers both
    inputs exactly (bit-level inverse), for the full 16-bit domain
    corners and a lattice of interior points."""
    from click_streaming_data_pipeline_spark.operators.maintenance import (
        ZORDER_BITS,
        zorder_key,
    )
    from pyspark.sql import functions as F

    pts = [(a, b) for a in (0, 1, 2, 65535, 32768, 12345)
           for b in (0, 1, 3, 65535, 21845, 54321)]
    df = spark.createDataFrame(pts, "a long, b long")
    z = zorder_key("a", "b")
    back_a = sum(
        (F.shiftright(F.col("z"), 2 * i).bitwiseAND(F.lit(1)) * (1 << i))
        for i in range(ZORDER_BITS)
    )
    back_b = sum(
        (F.shiftright(F.col("z"), 2 * i + 1).bitwiseAND(F.lit(1)) * (1 << i))
        for i in range(ZORDER_BITS)
    )
    out = df.withColumn("z", z).select(
        "a", "b", back_a.alias("ra"), back_b.alias("rb")
    )
    for r in out.collect():
        assert r["ra"] == r["a"] and r["rb"] == r["b"]


symbols_strategy = st.lists(
    st.sampled_from(["a", "b", "ab", "</w>"]), min_size=0, max_size=9
)


@settings(**_SETTINGS)
@given(
    syms=symbols_strategy,
    x=st.sampled_from(["a", "b", "ab"]),
    y=st.sampled_from(["a", "b", "</w>"]),
)
def test_bpe_merge_expression_matches_python(spark, syms, x, y):
    """The fold-expression pair merge must equal the classic
    left-to-right non-overlapping python merge on arbitrary symbol
    arrays — including x==y runs ('a a a' -> ['aa','a']) and empty
    inputs."""
    from click_streaming_data_pipeline_spark.extensions.text import (
        _merge_pair_expr,
    )

    def py_merge(s):
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == x and s[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(s[i])
                i += 1
        return out

    df = spark.createDataFrame([(syms,)], "symbols array<string>")
    got = df.select(
        _merge_pair_expr(F.col("symbols"), x, y).alias("m")
    ).collect()[0]["m"]
    assert list(got) == py_merge(syms)


# --- exact-substring spans vs a plain-python reference ---------------

_substr_docs = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]),  # tiny alphabet => collisions
        min_size=0,
        max_size=12,
    ),
    min_size=2,
    max_size=6,
)


def _python_spans(token_lists, window):
    """Reference implementation: mark every W-window repeated across
    >=2 distinct docs, merge overlapping marks into maximal spans."""
    from collections import defaultdict

    where = defaultdict(set)
    for did, toks in enumerate(token_lists):
        for p in range(len(toks) - window + 1):
            where[tuple(toks[p : p + window])].add(did)
    dup = {w for w, dids in where.items() if len(dids) >= 2}
    out = set()
    for did, toks in enumerate(token_lists):
        marks = [
            p + 1  # 1-based
            for p in range(len(toks) - window + 1)
            if tuple(toks[p : p + window]) in dup
        ]
        spans = []
        for p in marks:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + window)
            else:
                spans.append([p, p + window])
        for s, e in spans:
            out.add((did, s, e, e - s))
    return out


@given(docs=_substr_docs, window=st.sampled_from([2, 3]))
@settings(**_SETTINGS)
def test_substring_spans_match_python_reference(spark, docs, window):
    from click_streaming_data_pipeline_spark.extensions.dedup import (
        duplicate_substring_spans,
    )

    frame = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_substring_spans(frame, window=window).collect()
    }
    # guard: split(" ") of an empty string is [""], one empty token —
    # mirror that in the reference input
    ref = _python_spans(
        [toks if toks else [""] for toks in docs], window
    )
    assert got == ref


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["start", "view", "click", "signup", "error"]),
            st.sampled_from(["view", "click", "signup", "error",
                             "conv", "null"]),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=3,
        max_size=25,
    )
)
@settings(max_examples=60, deadline=None)
def test_markov_removal_effects_fuzz(edges):
    """On random transition-count chains: the linear solve agrees
    with long power iteration, effects stay in [0, 1], and shares
    normalize (when any conversion path exists)."""
    import numpy as np

    from click_streaming_data_pipeline_spark.plans.catalog_clickstream import (
        markov_removal_effects,
    )

    # ensure a converting path and a start edge exist so P(conv) > 0
    counts = {}
    for f, t, n in edges + [("start", "view", 5), ("view", "conv", 1)]:
        if f == t:
            continue
        counts[(f, t)] = counts.get((f, t), 0) + n
    rows = [(f, t, n) for (f, t), n in counts.items()]

    effects = markov_removal_effects(rows)
    channels = [c for c, _, _ in effects]
    assert channels == sorted(channels)
    for _, e, s in effects:
        assert -1e-9 <= e <= 1.0 + 1e-9
        assert -1e-9 <= s <= 1.0 + 1e-9
    total_share = sum(s for _, _, s in effects)
    assert abs(total_share - 1.0) < 1e-6 or total_share == 0.0

    # independent check: power-iteration absorption for the full chain
    def p_conv_power(removed):
        states = ["start"] + [c for c in channels if c != removed]
        idx = {s: i for i, s in enumerate(states)}
        k = len(states)
        q = np.zeros((k, k))
        r = np.zeros(k)
        for s in states:
            out = {t: n for (f, t), n in counts.items() if f == s}
            tot = sum(out.values())
            for t, n in out.items():
                p = n / tot
                if t == "conv":
                    r[idx[s]] += p
                elif t in idx and t != removed:
                    q[idx[s], idx[t]] += p
        v = np.zeros(k)
        # iterate to a fixpoint, not a fixed count: near-cyclic chains
        # (e.g. view<->click with p~0.98 each way) contract so slowly
        # that 600 steps leave a ~1e-6 residual and the EXACT linear
        # solve under test gets blamed for the reference's error
        for _ in range(200_000):
            nxt = r + q @ v
            if np.max(np.abs(nxt - v)) < 1e-13:
                v = nxt
                break
            v = nxt
        return v[idx["start"]]

    base = p_conv_power(None)
    for c, e, _ in effects:
        expected = 1.0 - p_conv_power(c) / base
        assert abs(e - expected) < 1e-6, (c, e, expected)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
def test_seeded_noise_matches_python_reference(spark, keys):
    """hex_uniform / laplace_noise / gumbel_noise over arbitrary
    unicode keys equal an independent python md5 reimplementation:
    the seed fold is byte-exact, uniforms sit strictly inside (0,1),
    and the inverse CDFs agree to the 9-dp contract."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.extensions.privacy import (
        NOISE_DECIMALS,
        gumbel_noise,
        hex_uniform,
        laplace_noise,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["k"]: (r["u"], r["lap"], r["gum"])
        for r in df.select(
            "k",
            hex_uniform(F.col("k"), "t:").alias("u"),
            laplace_noise(F.col("k"), "t:", 2.5).alias("lap"),
            gumbel_noise(F.col("k"), "t:").alias("gum"),
        ).collect()
    }
    for k in keys:
        v = int(
            hashlib.md5(("t:" + k).encode("utf-8")).hexdigest()[:8], 16
        )
        u = (v + 0.5) / 4294967296.0
        assert 0.0 < u < 1.0
        w = u - 0.5
        lap = round(
            -2.5 * math.copysign(1.0, w) * math.log(1.0 - 2.0 * abs(w)),
            NOISE_DECIMALS,
        )
        gum = round(-math.log(-math.log(u)), NOISE_DECIMALS)
        gu, gl, gg = got[k]
        assert gu == u, (k, gu, u)
        assert abs(gl - lap) <= 10 ** -NOISE_DECIMALS, (k, gl, lap)
        assert abs(gg - gum) <= 10 ** -NOISE_DECIMALS, (k, gg, gum)
