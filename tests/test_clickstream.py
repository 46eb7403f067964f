"""Clickstream-analytics catalog: semantic invariants beyond the
oracle hash-match (conservation, split sanity, plan shape)."""

from __future__ import annotations

import pytest

import duckdb

from click_streaming_data_pipeline_spark.plans import QUERIES

from .conftest import SF_TEST


def test_linear_attribution_conserves_revenue(spark):
    """Every attributed purchase's micro-cent shares must sum back to
    its price up to the per-touch floor loss (< n_touch micro-cents),
    and un-clicked purchases receive nothing."""
    rows = QUERIES["linear_attribution"].fn(spark, SF_TEST).collect()
    attributed = sum(r["attributed_microcents"] for r in rows)
    per_purchase = duckdb.sql(
        f"""
        WITH c AS (SELECT user_id, ts FROM '{SF_TEST}/events.parquet'
                   WHERE event_type = 'click'),
        p AS (SELECT user_id, ts, event_id,
                     CAST(round(value*100) AS BIGINT) AS cents
              FROM '{SF_TEST}/events.parquet'
              WHERE event_type = 'purchase')
        SELECT p.cents, count(*) AS n_touch
        FROM p JOIN c ON c.user_id = p.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '1 hour'
        GROUP BY p.event_id, p.cents
        """
    ).fetchall()
    exact = sum(c * 10000 for c, _ in per_purchase)
    floor_loss_bound = sum(n for _, n in per_purchase)
    assert exact - floor_loss_bound < attributed <= exact
    assert attributed > 0


def test_ab_split_covers_all_users(spark):
    df = QUERIES["ab_test_report"].fn(spark, SF_TEST)
    row = df.collect()[0]
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF_TEST}/events.parquet'"
    ).fetchone()[0]
    assert row["n_control"] + row["n_treatment"] == n_users
    assert row["n_control"] > 0 and row["n_treatment"] > 0
    assert row["conv_control"] <= row["n_control"]
    assert row["conv_treatment"] <= row["n_treatment"]


def test_top_events_per_type_plans_window_group_limit(spark):
    """The per-group top-k must push a partial limit below the
    shuffle (WindowGroupLimit), not rank the full partition."""
    df = QUERIES["top_events_per_type"].fn(spark, SF_TEST)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_suspect_bots_one_row_per_user(spark):
    df = QUERIES["suspect_bots"].fn(spark, SF_TEST)
    rows = df.collect()
    users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF_TEST}/events.parquet'"
    ).fetchone()[0]
    assert len(rows) == users
    for r in rows:
        if r["n_events"] == 1:
            assert r["min_gap_us"] is None and r["span_us"] == 0


def test_bloom_prefilter_is_exact_and_selective(spark):
    """The bloom prefilter alone must pass every true match (no
    false negatives) and prune most non-matches at ~1% fpp."""
    import duckdb

    from click_streaming_data_pipeline_spark.operators.bloom import (
        build_bloom,
        might_contain,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST
    from pyspark.sql import functions as F

    orders = load_table(spark, SF_TEST, "orders")
    seg = (
        load_table(spark, SF_TEST, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
        .distinct()
    )
    n_keys = seg.count()
    m_bits = max(64, n_keys * 10)
    bitmap = build_bloom(seg, "o_custkey", m_bits=m_bits)
    assert len(bitmap) == (m_bits + 63) // 64

    passed = orders.filter(
        might_contain(F.col("o_custkey"), bitmap, m_bits=m_bits)
    ).count()
    true_matches = duckdb.sql(
        f"""
        SELECT count(*) FROM '{SF_TEST}/orders.parquet' o
        WHERE EXISTS (SELECT 1 FROM '{SF_TEST}/customer.parquet' c
                      WHERE c.c_custkey = o.o_custkey
                        AND c.c_mktsegment = 'BUILDING')
        """
    ).fetchone()[0]
    total = orders.count()
    # no false negatives, and false positives well under 5% of the
    # non-matching population (sized for ~1%)
    assert passed >= true_matches
    assert passed - true_matches <= max(5, 0.05 * (total - true_matches))


def test_snapshot_diff_roundtrip_reproduces_new(spark):
    """Applying the generated change set onto the old snapshot must
    reproduce the new snapshot exactly (delete 'd' keys, upsert 'c'
    and 'u' afters)."""
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.operators.diff import (
        snapshot_diff,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    docs = load_table(spark, SF_TEST, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 3).select(
        "doc_id", "text", "n_chars"
    )
    new = (
        docs.filter(F.col("doc_id") % 5 != 2)
        .select(
            "doc_id",
            "text",
            F.when(F.col("doc_id") % 3 == 1, F.col("n_chars") + 10)
            .otherwise(F.col("n_chars"))
            .alias("n_chars"),
        )
    )
    deltas = snapshot_diff(old, new, ["doc_id"]).collect()
    ops = {r["op"] for r in deltas}
    assert ops == {"c", "u", "d"}

    old_rows = {r["doc_id"]: (r["text"], r["n_chars"]) for r in old.collect()}
    for r in deltas:
        if r["op"] == "d":
            del old_rows[r["before"]["doc_id"]]
        else:
            a = r["after"]
            old_rows[a["doc_id"]] = (a["text"], a["n_chars"])
    new_rows = {r["doc_id"]: (r["text"], r["n_chars"]) for r in new.collect()}
    assert old_rows == new_rows


def test_tpch_new_shapes_plan_properties(spark):
    """Q5 broadcasts every dimension (no cartesian, no dim shuffle
    join); Q21 plans the EXISTS/NOT-EXISTS as semi/anti hash joins,
    never correlated subqueries."""
    from .conftest import SF_TEST

    q5 = QUERIES["local_supplier_volume"].fn(spark, SF_TEST)
    plan5 = q5._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan5
    assert "CartesianProduct" not in plan5

    q21 = QUERIES["waiting_suppliers"].fn(spark, SF_TEST)
    plan21 = q21._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan21
    assert "LeftAnti" in plan21


def test_observation_metrics_without_second_scan(spark):
    """df.observe() collects pipeline health metrics (rows seen,
    rows rejected) as a side-effect of the SAME job — the production
    alternative to a second count() scan over 100 TB."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    docs = load_table(spark, SF_TEST, "documents")
    obs = Observation("gate")
    gated = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_seen"),
        F.sum((F.col("n_chars") < 50).cast("long")).alias("n_short"),
    ).filter(F.col("n_chars") >= 50)
    kept = gated.count()
    metrics = obs.get
    assert metrics["n_seen"] == docs.count()
    assert metrics["n_seen"] - metrics["n_short"] == kept


@pytest.mark.slow
def test_random_projection_preserves_distances(spark):
    """JL sanity: for a sample of pairs, the scaled projected
    distance approximates the original distance (loose bound — 16
    dims gives coarse but unbiased preservation)."""
    import numpy as np

    from click_streaming_data_pipeline_spark.extensions.similarity import (
        random_projection,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    emb = load_table(spark, SF_TEST, "embeddings")
    orig = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in emb.limit(40).collect()
    }
    proj = {
        r["vec_id"]: np.array([r[f"p{j}"] for j in range(16)])
        for r in random_projection(emb).collect()
    }
    ratios = []
    ids = sorted(orig)
    for a in ids[:20]:
        for b in ids[20:40]:
            d_orig = np.linalg.norm(orig[a] - orig[b])
            d_proj = np.linalg.norm(proj[a] - proj[b]) / np.sqrt(16.0)
            if d_orig > 0:
                ratios.append(d_proj / d_orig)
    mean = sum(ratios) / len(ratios)
    # unbiased in expectation; 16 dims => wide but bounded spread
    assert 0.7 < mean < 1.3
    assert all(0.2 < r < 2.5 for r in ratios)


def test_backfill_overwrites_only_target_partitions(spark, tmp_path):
    """Dynamic-partition backfill: rewriting one day leaves the other
    days' files untouched (same paths, same mtimes) and replaces the
    target day's content exactly."""
    import os

    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.operators.maintenance import (
        backfill_partitions,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    table = str(tmp_path / "events_by_day")
    ev = load_table(spark, SF_TEST, "events").withColumn(
        "day", F.to_date("ts")
    )
    days = [r["day"] for r in ev.select("day").distinct().limit(3).collect()]
    base = ev.filter(F.col("day").isin(days))
    base.write.mode("overwrite").partitionBy("day").parquet(table)

    def files_with_mtimes(day):
        d = os.path.join(table, f"day={day}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    target, keep = days[0], days[1:]
    before_keep = {d: files_with_mtimes(d) for d in keep}

    fixed = base.filter(F.col("day") == target).withColumn(
        "value", F.col("value") + 1000.0
    )
    backfill_partitions(fixed, table, "day")

    # untouched partitions: identical files and mtimes
    for d in keep:
        assert files_with_mtimes(d) == before_keep[d]
    # target partition: new content, other partitions' rows unchanged
    got = spark.read.parquet(table)
    assert (
        got.filter(F.col("day") == target)
        .filter(F.col("value") < 1000.0)
        .count()
        == 0
    )
    assert got.count() == base.count()
    # idempotent: re-running the same backfill keeps the row set
    backfill_partitions(fixed, table, "day")
    assert spark.read.parquet(table).count() == base.count()


def test_ivf_saved_index_matches_fresh_and_prunes(spark, tmp_path):
    """The persisted IVF index must return exactly what a fresh
    train+probe returns (training is deterministic), and the probed
    read must touch only the probed partitions' files."""
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.extensions.ivf import (
        ivf_index_topk,
        ivf_topk,
        load_ivf_centroids,
        save_ivf_index,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    emb = load_table(spark, SF_TEST, "embeddings")
    idx = str(tmp_path / "ivf_index")
    save_ivf_index(emb, idx)
    centroids = load_ivf_centroids(spark, idx)

    qids = [0, 1, 2, 3, 4]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
    )
    from_index = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cos"], 9))
        for r in ivf_index_topk(spark, idx, queries, k=10).collect()
    }
    fresh = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cos"], 9))
        for r in ivf_topk(emb, qids, k=10, centroids=centroids).collect()
    }
    assert from_index == fresh

    # partition pruning: one probed partition reads only its files
    import os

    corpus = spark.read.parquet(os.path.join(idx, "corpus"))
    one = corpus.filter(F.col("centroid_id") == centroids[0][0])
    read_files = {
        r[0]
        for r in one.select(F.input_file_name()).distinct().collect()
    }
    all_files = set(corpus.inputFiles())
    assert 0 < len(read_files) < len(all_files)
    assert all(f"centroid_id={centroids[0][0]}" in f for f in read_files)


def test_forget_keys_surgical_rewrite(spark, tmp_path):
    """GDPR delete: rows for forgotten keys are gone, clean
    partitions' files are byte-untouched, a fully-forgotten partition
    is dropped, and re-running is a no-op."""
    import os

    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.operators.maintenance import (
        forget_keys,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    table = str(tmp_path / "events_by_day")
    ev = load_table(spark, SF_TEST, "events").withColumn(
        "day", F.to_date("ts")
    )
    days = sorted(
        r["day"] for r in ev.select("day").distinct().limit(4).collect()
    )
    # controlled layout: days[0] belongs entirely to forgotten user
    # 999999 (partition must be dropped), half of days[1] to forgotten
    # user 888888 (partition must be rewritten), days[2:] contain no
    # forgotten keys (files must stay byte-untouched)
    base = ev.filter(F.col("day").isin(days)).withColumn(
        "user_id",
        F.when(F.col("day") == days[0], F.lit(999999))
        .when(
            (F.col("day") == days[1]) & (F.col("event_id") % 2 == 0),
            F.lit(888888),
        )
        .otherwise(F.col("user_id")),
    )
    base.write.mode("overwrite").partitionBy("day").parquet(table)

    doomed_set = {999999, 888888}
    doomed = spark.createDataFrame(
        [(u,) for u in sorted(doomed_set)], "user_id bigint"
    )

    def files_with_mtimes(day):
        d = os.path.join(table, f"day={day}")
        if not os.path.isdir(d):
            return None
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    clean_before = {d: files_with_mtimes(d) for d in days[2:]}
    expected = base.filter(~F.col("user_id").isin(doomed_set))

    stats = forget_keys(spark, table, "day", "user_id", doomed)

    got = spark.read.parquet(table)
    assert got.filter(F.col("user_id").isin(doomed_set)).count() == 0
    assert got.count() == expected.count()
    # clean partitions byte-untouched
    for d in days[2:]:
        assert files_with_mtimes(d) == clean_before[d]
    # fully-forgotten partition dropped from disk
    if expected.filter(F.col("day") == days[0]).count() == 0:
        assert files_with_mtimes(days[0]) is None
        assert stats["partitions_dropped"] >= 1
    assert stats["rows_deleted"] == base.count() - expected.count()

    # idempotent: nothing left to forget
    again = forget_keys(spark, table, "day", "user_id", doomed)
    assert again["rows_deleted"] == 0
    assert spark.read.parquet(table).count() == expected.count()


def test_markov_attribution_matches_independent_oracle(spark):
    """Removal effects from the catalog query must match an
    independent recomputation: journeys rebuilt in pandas, absorption
    probabilities by long power iteration instead of the linear
    solve."""
    import numpy as np

    from click_streaming_data_pipeline_spark.plans import QUERIES
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    # independent journey/transition build (pure pandas)
    ev = (
        load_table(spark, SF_TEST, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    trans: dict[tuple[str, str], int] = {}
    for _, g in ev.groupby("user_id"):
        states = [
            "conv" if t == "purchase" else t for t in g["event_type"]
        ]
        if "conv" in states:
            states = states[: states.index("conv") + 1]
        path = ["start"] + states + (
            [] if states[-1] == "conv" else ["null"]
        )
        for a, b in zip(path, path[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1

    channels = sorted(
        {s for s, _ in trans} - {"start", "conv", "null"}
    )

    def p_conv_power(removed):
        states = ["start"] + [c for c in channels if c != removed]
        idx = {s: i for i, s in enumerate(states)}
        k = len(states)
        q = np.zeros((k, k))
        r = np.zeros(k)
        for s in states:
            out = {t: n for (f, t), n in trans.items() if f == s}
            tot = sum(out.values())
            for t, n in out.items():
                p = n / tot
                if t == "conv":
                    r[idx[s]] += p
                elif t in idx and t != removed:
                    q[idx[s], idx[t]] += p
        # absorption by power iteration: t = r + Q t, iterated
        t_vec = np.zeros(k)
        for _ in range(400):
            t_vec = r + q @ t_vec
        return t_vec[idx["start"]]

    base = p_conv_power(None)
    effects = {c: 1.0 - p_conv_power(c) / base for c in channels}
    total = sum(effects.values())

    got = {
        r["channel"]: (r["removal_effect"], r["share"])
        for r in QUERIES["markov_attribution"].fn(spark, SF_TEST).collect()
    }
    assert set(got) == set(channels)
    for c in channels:
        assert abs(got[c][0] - effects[c]) < 1e-6, c
        assert abs(got[c][1] - effects[c] / total) < 1e-6, c
    # invariants: effects in [0, 1], shares normalize
    assert all(0.0 <= e <= 1.0 for e, _ in got.values())
    assert abs(sum(s for _, s in got.values()) - 1.0) < 1e-9


def test_markov_attribution_credits_the_only_converting_channel(spark):
    """Synthetic chain where only journeys touching 'click' convert:
    click must carry ~all the removal effect."""
    from click_streaming_data_pipeline_spark.plans.catalog_clickstream import (
        markov_removal_effects,
    )

    counts = [
        ("start", "view", 50),
        ("start", "click", 50),
        ("view", "null", 50),
        ("click", "conv", 50),
    ]
    rows = markov_removal_effects(counts)
    by = {c: (e, s) for c, e, s in rows}
    assert by["click"][0] == 1.0
    assert by["view"][0] == 0.0
    assert by["click"][1] == 1.0


def test_vacuum_orphans_removes_only_uncommitted(spark, tmp_path):
    """Orphan GC: committed files and too-fresh files survive, stale
    orphans are deleted, and the table's committed rows are intact."""
    import os
    import time

    from click_streaming_data_pipeline_spark.operators.maintenance import (
        vacuum_orphans,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    table = str(tmp_path / "t")
    docs = load_table(spark, SF_TEST, "documents").limit(100)
    docs.write.mode("overwrite").parquet(table)
    committed = {
        f for f in os.listdir(table) if f.endswith(".parquet")
    }
    n_rows = spark.read.parquet(table).count()

    # plant debris: a stale orphan and a fresh (in-flight) orphan
    stale = os.path.join(table, "part-orphan-stale.parquet")
    fresh = os.path.join(table, "part-orphan-fresh.parquet")
    for p in (stale, fresh):
        with open(p, "wb") as fh:
            fh.write(b"not-a-real-parquet")
    old = time.time() - 3600
    os.utime(stale, (old, old))

    stats = vacuum_orphans(table, committed, min_age_seconds=600)
    assert stats["files_removed"] == 1
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)
    # committed files untouched; with the debris gone the table
    # reads back exactly its committed rows
    for f in committed:
        assert os.path.exists(os.path.join(table, f))
    os.remove(fresh)
    assert spark.read.parquet(table).count() == n_rows


def test_write_audit_publish_gates_bad_data(spark, tmp_path):
    """WAP: clean data publishes atomically; data failing an audit is
    quarantined and the published table is untouched."""
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.operators.maintenance import (
        write_audit_publish,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    table = str(tmp_path / "published")
    ev = load_table(spark, SF_TEST, "events")
    audits = [
        ("no_null_users", lambda d: d.filter(
            F.col("user_id").isNull()).count()),
        ("positive_values", lambda d: d.filter(
            F.col("value") < 0).count()),
    ]

    r1 = write_audit_publish(spark, ev, table, audits)
    assert r1["published"] and all(v == 0 for v in r1["violations"].values())
    n_good = spark.read.parquet(table).count()
    assert n_good == ev.count()

    # poisoned update: nulls in user_id must NOT reach the table
    bad = ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 == 0, None).otherwise(
            F.col("user_id")
        ),
    )
    r2 = write_audit_publish(spark, bad, table, audits)
    assert not r2["published"]
    assert r2["violations"]["no_null_users"] > 0
    # published table untouched; quarantine holds the rejected data
    assert spark.read.parquet(table).count() == n_good
    assert spark.read.parquet(table).filter(
        F.col("user_id").isNull()
    ).count() == 0
    import os

    assert os.path.isdir(table + ".quarantine")


def test_schema_drift_report_flags_all_change_kinds(spark):
    """Added/removed/type-changed columns and a >5% null-rate shift
    are each reported; stable columns stay silent."""
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.operators.diff import (
        schema_drift_report,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    docs = load_table(spark, SF_TEST, "documents")
    old = docs.select("doc_id", "text", "lang", "n_chars")
    new = docs.select(
        "doc_id",
        # type change
        F.col("text").cast("binary").alias("text"),
        # null-rate shift on lang
        F.when(F.col("doc_id") % 3 == 0, None)
        .otherwise(F.col("lang"))
        .alias("lang"),
        # n_chars removed; source added
        "source",
    )
    rep = {(r["column"], r["change"]) for r in schema_drift_report(old, new)}
    assert ("source", "added") in rep
    assert ("n_chars", "removed") in rep
    assert ("text", "type_changed") in rep
    assert ("lang", "null_rate_shift") in rep
    assert ("doc_id", "null_rate_shift") not in rep
    assert not any(col == "doc_id" for col, _ in rep)


def test_forget_keys_edge_cases(spark, tmp_path):
    """Empty deletion list is a no-op; deleting every key empties and
    drops every partition without erroring."""
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.operators.maintenance import (
        forget_keys,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    table = str(tmp_path / "t")
    ev = load_table(spark, SF_TEST, "events").limit(500).withColumn(
        "day", F.to_date("ts")
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(table)
    n = spark.read.parquet(table).count()

    empty = spark.createDataFrame([], "user_id bigint")
    r = forget_keys(spark, table, "day", "user_id", empty)
    assert r == {
        "partitions_rewritten": 0,
        "partitions_dropped": 0,
        "rows_deleted": 0,
    }
    assert spark.read.parquet(table).count() == n

    everyone = ev.select("user_id").distinct()
    r2 = forget_keys(spark, table, "day", "user_id", everyone)
    assert r2["rows_deleted"] == n
    assert r2["partitions_rewritten"] == 0
    assert r2["partitions_dropped"] > 0
    import os

    assert not any(
        d.startswith("day=") for d in os.listdir(table)
    )


def test_streamed_asof_corrects_on_late_click(spark, tmp_path):
    # a click that ARRIVES after the purchase it should attribute must
    # overwrite the earlier (worse or null) match via the keyed upsert
    import datetime as dt
    import os

    import pyspark.sql.functions as F

    from click_streaming_data_pipeline_spark.operators.asof import asof_join
    from click_streaming_data_pipeline_spark.operators.upsert import (
        upsert_parquet,
    )

    out = str(tmp_path / "out")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def df(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long"
        )

    # batch 0: purchase at 12:10, only an old click at 11:00 known
    c_all = df([(1, t0.replace(hour=11), 100)])
    p_all = df([(1, t0.replace(minute=10), 500)])
    r0 = asof_join(c_all, p_all, left_val_cols=["event_id"]).withColumn(
        "__bid", F.lit(0)
    )
    upsert_parquet(spark, out, r0, ["event_id"], ["__bid"])
    first = spark.read.parquet(out).collect()[0]
    assert first["asof_event_id"] == 100

    # batch 1: a BETTER click (12:05, event 200) arrives late — the
    # recompute for the touched user must correct the stored match
    c_all = c_all.unionByName(df([(1, t0.replace(minute=5), 200)]))
    r1 = asof_join(c_all, p_all, left_val_cols=["event_id"]).withColumn(
        "__bid", F.lit(1)
    )
    upsert_parquet(spark, out, r1, ["event_id"], ["__bid"])
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0]["asof_event_id"] == 200
    # replaying batch 1 (at-least-once) leaves the table unchanged
    upsert_parquet(spark, out, r1, ["event_id"], ["__bid"])
    rows2 = spark.read.parquet(out).collect()
    assert len(rows2) == 1 and rows2[0]["asof_event_id"] == 200


def test_markov_iter_solver_matches_linalg(spark):
    """The lane's fixed-160-round decimal-exact power iteration (the
    SQL-replayable semantics) must agree with the np.linalg absorbing
    -chain solve far inside the 9-dp released rounding — the
    iteration tail is rho^160 with rho ~0.78 on this corpus."""
    from click_streaming_data_pipeline_spark.plans.catalog_clickstream import (
        markov_removal_effects,
        markov_removal_effects_iter,
        markov_transition_counts,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    counts = markov_transition_counts(
        load_table(spark, SF_TEST, "events")
    ).collect()
    ref = {c: (e, s) for c, e, s in markov_removal_effects(counts)}
    it = {c: (e, s) for c, e, s in markov_removal_effects_iter(counts)}
    assert set(ref) == set(it)
    for c in ref:
        assert abs(ref[c][0] - it[c][0]) < 1e-8, c
        assert abs(ref[c][1] - it[c][1]) < 1e-8, c
