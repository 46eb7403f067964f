"""Physical-design behaviors (SURVEY 2 D3, section 4): partitioned
writes give partition pruning; scans prune columns and push filters.
These are plan-level assertions — the properties that decide whether
a query touches 100 TB or 100 GB."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from click_streaming_data_pipeline_spark.sources import load_table

from .conftest import SF_TEST


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_partitions(spark):
    """Date-partitioned layout (the analogue of the reference's
    (status, created_at) indexes, init-db.sql:61-70): a day filter
    must read only that day's directory."""
    events = load_table(spark, SF_TEST, "events").withColumn(
        "day", F.to_date("ts")
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "events_by_day")
        events.write.partitionBy("day").parquet(path)
        n_days = len(
            [p for p in os.listdir(path) if p.startswith("day=")]
        )
        assert n_days > 1
        df = spark.read.parquet(path).filter(
            F.col("day") == "2024-01-02"
        )
        plan = _plan(df)
        assert "PartitionFilters" in plan
        # correctness of the pruned read
        want = events.filter(F.to_date("ts") == "2024-01-02").count()
        assert df.count() == want


def test_scan_prunes_columns_and_pushes_filters(spark):
    li = load_table(spark, SF_TEST, "lineitem")
    df = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
    plan = _plan(df)
    assert "PushedFilters" in plan and "l_quantity" in plan
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema
    assert "l_orderkey" in read_schema


def test_bucketed_tables_join_without_shuffle(spark):
    """SCALE.md claim: pre-bucketing both sides of a recurring join on
    the join key removes the shuffle entirely (the 100 TB answer to
    orders-joins-lineitem-every-night)."""
    import uuid

    orders = load_table(spark, SF_TEST, "orders")
    lineitem = load_table(spark, SF_TEST, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    suffix = uuid.uuid4().hex[:8]
    ot, lt = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    try:
        orders.write.bucketBy(8, "o_orderkey").sortBy(
            "o_orderkey"
        ).saveAsTable(ot)
        lineitem.write.bucketBy(8, "l_orderkey").sortBy(
            "l_orderkey"
        ).saveAsTable(lt)
        joined = spark.table(ot).join(
            spark.table(lt),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _plan(joined)
        # bucketed join: sort-merge (or shuffle-free hash) with NO
        # Exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == lineitem.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
        spark.sql(f"DROP TABLE IF EXISTS {lt}")


def test_aqe_splits_skewed_join_partitions(spark):
    """SCALE.md claim: AQE skew-join splits a hot key's partition at
    runtime. Thresholds lowered so the local corpus triggers it; the
    executed plan must carry the skew marker."""
    from pyspark.sql import functions as F2

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # heavily skewed key: 90% of left rows share one key
        left = spark.range(0, 20000).select(
            F2.when(F2.col("id") % 10 < 9, F2.lit(7))
            .otherwise(F2.col("id"))
            .alias("k"),
            F2.col("id").alias("payload"),
        )
        right = spark.range(0, 2000).select(
            (F2.col("id") % 500).alias("k"),
            F2.col("id").alias("r_payload"),
        )
        joined = left.join(right, "k")
        # act on the SAME Dataset so its cached QueryExecution holds
        # the final adaptive plan (a write plans a fresh instance)
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_compaction_rightsizes_files_and_preserves_rows(spark):
    """Many tiny files -> one right-sized file; content identical."""
    from click_streaming_data_pipeline_spark.operators.maintenance import (
        compact_parquet,
        plan_compaction,
    )

    events = load_table(spark, SF_TEST, "events")
    with tempfile.TemporaryDirectory() as d:
        src, dst = os.path.join(d, "src"), os.path.join(d, "dst")
        # simulate a micro-batch sink: 64 tiny files
        events.repartition(64).write.parquet(src)
        assert plan_compaction(src)["n_files"] == 64
        report = compact_parquet(spark, src, dst)
        assert report["after"]["n_files"] == 1  # well under 128M total
        assert report["after"]["n_files"] == report["before"][
            "target_partitions"
        ]
        a = sorted(map(tuple, spark.read.parquet(src).collect()))
        b = sorted(map(tuple, spark.read.parquet(dst).collect()))
        assert a == b
        # target_bytes knob: forcing a tiny target splits the rewrite
        tiny = compact_parquet(spark, src, os.path.join(d, "dst2"), target_bytes=64 * 1024)
        assert tiny["after"]["n_files"] > 1


def test_schema_evolution_merge_and_defaults(spark):
    """Lake reality: files written before a column existed must read
    alongside evolved files — mergeSchema unions the schemas, old rows
    surface NULL, and the B6 default-projection pattern fills them."""
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t")
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, name string"
        ).write.parquet(p)
        spark.createDataFrame(
            [(3, "c", 9.5)], "id long, name string, score double"
        ).write.mode("append").parquet(p)
        merged = spark.read.option("mergeSchema", "true").parquet(p)
        assert set(merged.columns) == {"id", "name", "score"}
        rows = {r["id"]: r for r in merged.collect()}
        assert rows[1]["score"] is None and rows[3]["score"] == 9.5
        filled = merged.select(
            "id", "name", F.coalesce("score", F.lit(0.0)).alias("score")
        )
        got = {r["id"]: r["score"] for r in filled.collect()}
        assert got == {1: 0.0, 2: 0.0, 3: 9.5}


def test_dynamic_partition_pruning_fires(spark):
    """The runtime filter that matters most at 100 TB: a filtered dim
    joined on the fact's partition column must inject a dynamic
    pruning subquery into the fact scan, so only the dim's surviving
    days are read — without it the join scans every partition."""
    events = load_table(spark, SF_TEST, "events").withColumn(
        "day", F.to_date("ts")
    )
    with tempfile.TemporaryDirectory() as d:
        fact_p, dim_p = os.path.join(d, "fact"), os.path.join(d, "dim")
        events.write.partitionBy("day").parquet(fact_p)
        events.select(
            F.to_date("ts").alias("day"), "event_type"
        ).distinct().write.parquet(dim_p)
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).filter(
            F.col("event_type") == "purchase"
        )
        plan = _plan(fact.join(dim, "day"))
        assert "dynamicpruning" in plan.lower()
        # and the join still answers correctly
        n = fact.join(dim, "day").count()
        assert n > 0


def test_tpch_shapes_plan_properties(spark):
    """The catalog_tpch queries must keep their 100 TB plan shapes:
    dims broadcast, anti-join stays anti, OR-of-ANDs bounds reach the
    scan, and the Q15 argmax never rescans the fact."""
    from click_streaming_data_pipeline_spark.plans import QUERIES

    # Q22: anti-join present, no cartesian explosion besides the
    # 1-row scalar broadcast
    plan = _plan(QUERIES["rich_idle_customers"].fn(spark, SF_TEST))
    assert "LeftAnti" in plan

    # Q19: derived bounds pushed into the lineitem scan
    plan = _plan(QUERIES["brand_size_revenue"].fn(spark, SF_TEST))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_quantity" in ln for ln in pushed)
    assert any("p_brand" in ln or "p_size" in ln for ln in pushed)
    assert "BroadcastHashJoin" in plan

    # Q7: both nation copies broadcast; facts never broadcast
    plan = _plan(QUERIES["nation_trade_volume"].fn(spark, SF_TEST))
    assert plan.count("BroadcastHashJoin") >= 3  # sup + n1 + n2

    # Q15: exactly ONE lineitem scan (window over the aggregate,
    # not a max-subquery rescan)
    plan = _plan(QUERIES["top_revenue_suppliers"].fn(spark, SF_TEST))
    assert plan.count("lineitem.parquet") == 1

    # Q10: top-20 is TakeOrderedAndProject, never a global sort
    plan = _plan(QUERIES["returned_item_customers"].fn(spark, SF_TEST))
    assert "TakeOrderedAndProject" in plan


def test_zorder_layout_skips_on_both_dimensions(spark):
    """Writing range-split files sorted by the Morton key bounds the
    per-file min/max span of BOTH interleaved columns, so footer
    stats prune scans on either predicate; a single-column sort only
    prunes its own column."""
    import pyarrow.parquet as pq

    from click_streaming_data_pipeline_spark.operators.maintenance import (
        zorder_key,
    )

    ev = (
        load_table(spark, SF_TEST, "events")
        .select(
            "event_id",
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("doc_key"),
        )
        .withColumn("zkey", zorder_key("user_id", "doc_key"))
    )

    def spans(path):
        out = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(path, f))
            mins = {c: None for c in ("user_id", "doc_key")}
            maxs = {c: None for c in ("user_id", "doc_key")}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in mins and col.statistics is not None:
                        s = col.statistics
                        mins[name] = (
                            s.min if mins[name] is None
                            else min(mins[name], s.min)
                        )
                        maxs[name] = (
                            s.max if maxs[name] is None
                            else max(maxs[name], s.max)
                        )
            out.append(
                {c: maxs[c] - mins[c] for c in ("user_id", "doc_key")}
            )
        return out

    with tempfile.TemporaryDirectory() as d:
        zpath = os.path.join(d, "zorder")
        upath = os.path.join(d, "bysingle")
        # range-split into 16 files along the sort key
        ev.repartitionByRange(16, "zkey").sortWithinPartitions(
            "zkey"
        ).write.parquet(zpath)
        ev.repartitionByRange(16, "user_id").sortWithinPartitions(
            "user_id"
        ).write.parquet(upath)
        zs, us = spans(zpath), spans(upath)
        full_doc_span = 99  # doc_key domain 0..99
        mean = lambda xs: (lambda l: sum(l) / len(l))(list(xs))  # noqa: E731
        # user_id-sorted files know nothing about doc_key: full span
        assert mean(s["doc_key"] for s in us) > 0.9 * full_doc_span
        # z-ordered files bound BOTH dimensions well below full span
        assert mean(s["doc_key"] for s in zs) < 0.6 * full_doc_span
        assert mean(s["user_id"] for s in zs) < 0.6 * 149


def test_runtime_bloom_filter_injected_on_fact_join(spark):
    """Selective dim filter + shuffle join must inject a runtime
    bloom filter on the fact scan (Spark's InjectRuntimeFilter). This
    is the config regression test for inferTimestampNTZ=false: a
    compatibility cast Project over the scan silently disables the
    rewrite (no might_contain in the plan)."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        # load FIRST: load_table's apply_runtime_conf would reset the
        # broadcast threshold we disable below
        orders = load_table(spark, SF_TEST, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, SF_TEST, "lineitem")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_optimize_zorder_compacts_and_clusters(spark):
    """One rewrite must both right-size the files AND bound per-file
    min/max spans on both z-ordered columns, preserving rows."""
    from click_streaming_data_pipeline_spark.operators.maintenance import (
        optimize_zorder,
    )

    ev = load_table(spark, SF_TEST, "events").select(
        "event_id",
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("doc_key"),
    )
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        dst = os.path.join(d, "dst")
        # fragmented input: many tiny files
        ev.repartition(64).write.parquet(src)
        report = optimize_zorder(
            spark, src, dst, "user_id", "doc_key",
            target_bytes=16 * 1024,
        )
        assert report["before"]["n_files"] == 64
        assert report["after"]["n_files"] < 64
        out = spark.read.parquet(dst)
        assert out.count() == ev.count()
        # both-dimension clustering: no file spans the full doc_key
        # domain (a plain compaction would)
        import pyarrow.parquet as pq

        spans = []
        for f in os.listdir(dst):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(dst, f))
            lo = hi = None
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    if c.path_in_schema == "doc_key" and c.statistics:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            spans.append(hi - lo)
        assert len(spans) > 1
        assert sum(spans) / len(spans) < 0.7 * 99


def test_scd2_build_is_single_shuffle(spark):
    """user_status_scd2's two window passes (change detection, then
    interval close) must reuse ONE hashpartitioning(user_id) exchange
    — the claim its docstring makes."""
    import re

    from click_streaming_data_pipeline_spark.plans import QUERIES

    plan = (
        QUERIES["user_status_scd2"]
        .fn(spark, SF_TEST)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_bucketed_revenue_join_single_exchange(spark):
    """The bucketed catalog query's only shuffle is the final
    aggregation — the join itself must consume the bucketed layout
    with no Exchange on either input."""
    import re

    from click_streaming_data_pipeline_spark.plans import QUERIES

    plan = _plan(QUERIES["bucketed_revenue_join"].fn(spark, SF_TEST))
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchanges <= 1, plan


def test_scan_parallel_is_noop_on_well_split_input(spark):
    """scan_parallel's 100-TB contract (VERDICT r3 item 2): on input
    that already yields enough splits the code itself must decide to
    skip the round-robin Exchange — right-sized warehouse files reach
    the aggregation with scan-level pushdown intact. On the driver's
    single-row-group files it must still redistribute."""
    import re

    from click_streaming_data_pipeline_spark.plans import QUERIES
    from click_streaming_data_pipeline_spark.sources import (
        load_table,
        scan_parallel,
    )

    li = load_table(spark, SF_TEST, "lineitem")
    # the test file is one row group -> starved scan -> repartition
    assert li.rdd.getNumPartitions() < 2
    assert scan_parallel(li).rdd.getNumPartitions() >= 2

    with tempfile.TemporaryDirectory() as d:
        li.repartition(8).write.parquet(os.path.join(d, "lineitem.parquet"))
        well_split = load_table(spark, d, "lineitem")
        assert well_split.rdd.getNumPartitions() >= 2
        # self-deciding no-op: same object, no Exchange added
        assert scan_parallel(well_split) is well_split
        plan = _plan(QUERIES["pricing_summary"].fn(spark, d))
        assert not re.findall(r"Exchange rangepartitioning|RoundRobin", plan), plan


def test_ivf_index_probe_uses_dynamic_partition_pruning(spark):
    """The persistent IVF index's probe must prune corpus PARTITIONS,
    not post-filter a full scan: the probe join on centroid_id (the
    partitionBy column of save_ivf_index) has to inject a dynamic
    pruning subquery into the corpus FileScan, so a query touches only
    its nprobe partition directories."""
    import tempfile

    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.extensions.ivf import (
        ivf_index_topk,
        save_ivf_index,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    emb = load_table(spark, SF_TEST, "embeddings")
    with tempfile.TemporaryDirectory() as idx:
        save_ivf_index(emb, idx)
        queries = emb.filter(F.col("vec_id").isin([0, 1])).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_vec"),
        )
        df = ivf_index_topk(spark, idx, queries, k=5)
        plan = _plan(df)
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        # the pruning expression must hang off the partition column
        assert "centroid_id" in plan
        # and the probe still returns k rows per query
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], []).append(r["neighbor_id"])
        assert set(got) == {0, 1}
        assert all(len(v) == 5 for v in got.values())


def test_ranking_windows_get_partial_group_limit(spark):
    """Literal rank<=k filters over per-key ranking windows must plan a
    PARTIAL WindowGroupLimit BEFORE the exchange (Spark 3.5+'s
    map-side top-k): this is what keeps per-query ANN candidate
    ranking off the one-reducer-per-key cliff, and why those lanes do
    NOT use operators/topk.py (reserved for non-literal bounds like
    stratified quotas, where the optimizer cannot infer a limit)."""
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        brute_force_topk,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    from click_streaming_data_pipeline_spark.extensions.ivf import (
        ivf_topk,
        train_kmeans,
    )
    from click_streaming_data_pipeline_spark.extensions.pq import (
        pq_topk,
        train_pq_codebooks,
    )

    emb = load_table(spark, SF_TEST, "embeddings")
    cents = train_kmeans(emb, k=8)
    books = train_pq_codebooks(emb)
    shapes = {
        "brute_force": brute_force_topk(emb, [0, 1], k=5),
        # bigint-cast rank + broadcast probe join upstream
        "ivf": ivf_topk(emb, [0, 1], k=5, centroids=cents),
        # ADC shortlist window (rank <= rerank*k) + rerank window
        "pq": pq_topk(emb, [0, 1], k=5, codebooks=books),
    }
    for name, df in shapes.items():
        plan = _plan(df)
        partials = [
            ln for ln in plan.splitlines()
            if "WindowGroupLimit" in ln and "Partial" in ln
        ]
        assert partials, f"{name}: no Partial WindowGroupLimit\n" + plan[:2000]
        assert "row_number" in partials[0], name
