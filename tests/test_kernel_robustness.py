"""Null / ragged / heterogeneous-input robustness of the Arrow
kernels (r4 ADVICE items): kernels that replaced expression paths
must keep the expression's semantics on degenerate vectors instead
of silently zeroing (cosine) or raising opaque executor ValueErrors
(vstack), and re-scoring an already-scored frame must replace, not
duplicate, the quality columns."""

import math

import pytest
from pyspark.sql import functions as F


def test_cosine_arrow_mixed_dims_match_expression(spark):
    """A batch whose rows carry DIFFERENT (but per-row matched)
    dimensions must get each row's true cosine — the expression
    computes per-row, so the kernel must too (r4 ADVICE medium:
    the old kernel locked d to the first row and emitted 0.0)."""
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        cosine,
        cosine_arrow,
    )

    rows = [
        (1, [1.0, 2.0], [3.0, 4.0]),                   # dim 2
        (2, [1.0] * 8, [0.5] * 8),                     # dim 8
        (3, [1.0, 0.0, 0.0, 1.0], [0.0, 1.0, 1.0, 0.0]),  # dim 4, ortho
        (4, [1.0, 2.0, 3.0], [1.0, 2.0]),              # per-row mismatch
        (5, None, [1.0, 2.0]),                          # null side
        (6, [], []),                                    # zero-length
        (7, [2.0] * 16, [2.0] * 16),                    # dim 16
    ]
    df = spark.createDataFrame(
        rows, "id long, x array<double>, y array<double>"
    ).coalesce(1)  # one Arrow batch: forces the heterogeneous case
    got = {
        r["id"]: (r["e"], r["k"])
        for r in df.select(
            "id",
            cosine(F.col("x"), F.col("y")).alias("e"),
            cosine_arrow(F.col("x"), F.col("y")).alias("k"),
        ).collect()
    }
    for i, (e, k) in got.items():
        assert e == k, f"row {i}: expression {e} != kernel {k}"
    assert got[3] == (0.0, 0.0)  # orthogonal, not batch-zeroed
    assert got[1][1] != 0.0 and got[2][1] != 0.0 and got[7][1] == 1.0
    assert got[4][1] == 0.0 and got[5][1] == 0.0 and got[6][1] == 0.0


def test_lsh_buckets_arrow_null_and_ragged(spark):
    """NULL/ragged vectors: the expression path stamps every bit "0"
    (NULL dot -> otherwise branch); the kernel must match, not raise
    from np.vstack (r4 ADVICE low)."""
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        N_PLANES,
        N_TABLES,
        lsh_bucket,
        lsh_buckets_arrow,
    )

    rows = [
        (1, [((j * 7) % 13 - 6) / 6.0 for j in range(64)]),
        (2, None),
        (3, [1.0, 2.0, 3.0]),  # ragged (dim 3 != 64)
        (4, [0.0] * 64),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1)
    out = df.select(
        "vec_id",
        F.array(
            *[lsh_bucket(F.col("embedding"), 64, t) for t in range(N_TABLES)]
        ).alias("e"),
        lsh_buckets_arrow(64, N_PLANES, N_TABLES)(
            F.col("embedding")
        ).alias("k"),
    ).collect()
    for r in out:
        assert r["e"] == r["k"], f"vec {r['vec_id']}: {r['e']} != {r['k']}"
    by_id = {r["vec_id"]: r["k"] for r in out}
    assert by_id[2] == ["0" * N_PLANES] * N_TABLES
    assert by_id[3] == ["0" * N_PLANES] * N_TABLES


def test_ivf_assign_null_and_ragged(spark):
    """NULL/ragged vectors assign to the smallest centroid id (the
    expression's cosine-0.0-everywhere tie rule), not an executor
    ValueError (r4 ADVICE low)."""
    from click_streaming_data_pipeline_spark.extensions.ivf import _assign

    centroids = [
        (3, [1.0, 0.0, 0.0, 0.0]),
        (7, [0.0, 1.0, 0.0, 0.0]),
    ]
    rows = [
        (1, [0.9, 0.1, 0.0, 0.0]),   # -> 3
        (2, None),                    # null -> smallest cid 3
        (3, [1.0, 2.0]),              # ragged -> smallest cid 3
        (4, [0.1, 0.9, 0.0, 0.0]),   # -> 7
        (5, [0.0, 0.0, 0.0, 0.0]),   # zero vector -> ties -> 3
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1)
    got = {
        r["vec_id"]: r["centroid_id"]
        for r in _assign(df, centroids, "embedding").collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 7, 5: 3}


def test_pq_encode_null_embedding_raises_clearly(spark):
    """A NULL embedding reaching pq_encode must fail with a named
    error telling the user what to filter, not an opaque numpy
    broadcast error (r4 ADVICE low)."""
    from click_streaming_data_pipeline_spark.extensions.pq import pq_encode

    ds, m = 2, 2
    codebooks = [
        [[0.0, 0.0], [1.0, 1.0]] for _ in range(m)
    ]
    df = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3, 0.4]), (2, None)],
        "vec_id long, embedding array<double>",
    ).coalesce(1)
    with pytest.raises(Exception, match="null or ragged embedding"):
        pq_encode(df, codebooks).collect()


def test_with_quality_columns_rescore_replaces_not_duplicates(spark):
    """Re-scoring an already-scored frame keeps exactly one copy of
    each quality column, with the fresh values (r4 ADVICE low:
    select('*', alias) used to emit duplicates)."""
    from click_streaming_data_pipeline_spark.functions.quality import (
        with_quality_columns,
    )

    df = spark.createDataFrame(
        [("hello world this is a test of the scorer", 41)],
        "text string, n_chars int",
    )
    once = with_quality_columns(df)
    twice = with_quality_columns(once)
    assert sorted(once.columns) == sorted(twice.columns)
    assert len(twice.columns) == len(set(twice.columns))
    r1, r2 = once.collect()[0], twice.collect()[0]
    assert r1["quality_score"] == r2["quality_score"]
    assert r1["has_pii"] == r2["has_pii"]


def test_quantize_kernel_matches_expression(spark):
    """quantize_embeddings (Arrow kernel) must be bit-identical to
    _quantize_embeddings_expr on normal / huge / denormal / constant
    dims; null and ragged rows NULL-poison on both paths."""
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        _quantize_embeddings_expr,
        quantize_embeddings,
    )

    dim = 8
    rows = [
        (1, [0.1 * j for j in range(dim)]),
        (2, [1e15 * (1 + j % 3) for j in range(dim)]),
        (3, [5e-324 if j == 0 else 0.0 for j in range(dim)]),
        (4, [(-1.0) ** j for j in range(dim)]),
        (5, [7.5] * dim),  # when combined: dims still vary; see (7)
        (6, None),
        (7, [1.0, 2.0]),  # ragged
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want = {
        r["vec_id"]: tuple(r)[1:]
        for r in _quantize_embeddings_expr(df, dim=dim).collect()
    }
    got = {
        r["vec_id"]: tuple(r)[1:]
        for r in quantize_embeddings(df, dim=dim).collect()
    }
    assert want == got
    assert got[6] == (None, None, None, None, None)
    assert got[7] == (None, None, None, None, None)

    # constant-dimension corpus: every dim has mx == mn -> code 0
    const = spark.createDataFrame(
        [(i, [3.25] * dim) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    w2 = {
        r["vec_id"]: tuple(r)[1:]
        for r in _quantize_embeddings_expr(const, dim=dim).collect()
    }
    g2 = {
        r["vec_id"]: tuple(r)[1:]
        for r in quantize_embeddings(const, dim=dim).collect()
    }
    assert w2 == g2
    assert g2[0][0] == 0 and g2[0][4] == 0.0

    # NaN element in ONE row: Spark min/max order NaN above every
    # value, so maxs[dim0] becomes NaN — the kernel must fall back to
    # the expression path instead of coding floor(NaN) on every row
    # (r5 ADVICE medium). Parity must hold for the clean rows too.
    nan_rows = [
        (1, [float("nan") if j == 0 else 0.5 * j for j in range(dim)]),
        (2, [0.25 * j for j in range(dim)]),
        (3, [1.0 - 0.125 * j for j in range(dim)]),
    ]
    ndf = spark.createDataFrame(
        nan_rows, "vec_id long, embedding array<double>"
    )
    w3 = {
        r["vec_id"]: tuple(r)[1:]
        for r in _quantize_embeddings_expr(ndf, dim=dim).collect()
    }
    g3 = {
        r["vec_id"]: tuple(r)[1:]
        for r in quantize_embeddings(ndf, dim=dim).collect()
    }

    def _eq(a, b):
        return a == b or (
            isinstance(a, float) and isinstance(b, float)
            and math.isnan(a) and math.isnan(b)
        )

    assert set(w3) == set(g3)
    for k in w3:
        assert all(_eq(x, y) for x, y in zip(w3[k], g3[k])), (
            k, w3[k], g3[k],
        )


def test_semdedup_cluster_kernel_matches_join(spark):
    """The applyInPandas within-cluster dup kernel must produce
    exactly the join form's (id_b, dup_of) set — including across
    block boundaries (corpus > SEMDEDUP_BLOCK per cluster is
    exercised with a shrunken block size) and on zero vectors."""

    from click_streaming_data_pipeline_spark.extensions.similarity import (
        _as_double,
        _cluster_dup_of_fn,
        _semdedup_dup_of_join,
    )

    dim = 8
    rows = []
    # three planted clusters with internal near-dups + noise + a zero
    # vector and a null vector
    for i in range(90):
        base = [((i % 3) * 31 + j * 7 % 13 - 6) / 6.0 for j in range(dim)]
        jitter = [x + (0.001 * ((i * 17) % 5)) for x in base]
        rows.append((i, jitter, i % 3))
    rows.append((90, [0.0] * dim, 0))
    rows.append((91, None, 1))
    # mixed-dimension cluster members (r5 ADVICE low): two dim-4
    # near-dup vectors inside a dim-8 cluster must get their TRUE
    # cosine (the join twin computes per dimension-group), not a
    # silent zero from max-dim padding
    rows.append((92, [1.0, 2.0, 3.0, 4.0], 2))
    rows.append((93, [1.0, 2.0, 3.0, 4.001], 2))
    rows.append((94, [9.0, -7.0, 0.5, 1.0], 2))  # same dim, far away
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cluster int"
    )
    assigned = df.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("__v"),
        F.col("cluster").cast("int").alias("cluster_id"),
    )
    want = {
        (r["id_b"], r["dup_of"])
        for r in _semdedup_dup_of_join(assigned, 0.45).collect()
    }
    got = {
        (r["id_b"], r["dup_of"])
        for r in assigned.select("cluster_id", F.col("vec_id").alias("__id"), "__v")
        .groupBy("cluster_id")
        .applyInPandas(_cluster_dup_of_fn(0.45), "id_b long, dup_of long")
        .collect()
    }
    assert want == got and got
    # the mixed-dim near-dup pair must actually be detected
    assert (93, 92) in got

    # force multi-block paths: shrink the block edge below the
    # cluster size and require identical output
    got_small = {
        (r["id_b"], r["dup_of"])
        for r in assigned.select(
            "cluster_id", F.col("vec_id").alias("__id"), "__v"
        )
        .groupBy("cluster_id")
        .applyInPandas(
            _cluster_dup_of_fn(0.45, block=7), "id_b long, dup_of long"
        )
        .collect()
    }
    assert got_small == want


@pytest.mark.slow
def test_semdedup_mega_cluster_routes_multi_task(spark):
    """A planted mega-cluster (size > split_rows) must leave the
    one-task applyInPandas kernel for the tiled cogroup path — many
    independent block-pair tasks — with the dup_of output unchanged
    bit-for-bit (r5 VERDICT watch item: one cluster = one task
    serializes a skewed mega-cluster)."""
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        _cluster_dup_of_fn,
        _semdedup_dup_of,
        _semdedup_dup_of_tiled,
    )

    dim = 8
    rows = []
    # one 240-row mega-cluster with planted near-dup structure and a
    # 30-row normal cluster; ids interleaved so block hashing mixes
    for i in range(240):
        base = [((i % 40) * 13 + j * 5 % 11 - 5) / 5.0 for j in range(dim)]
        rows.append((i, [x + 0.0005 * ((i * 7) % 4) for x in base], 0))
    for i in range(240, 270):
        base = [((i % 5) * 17 + j * 3 % 7 - 3) / 4.0 for j in range(dim)]
        rows.append((i, [x + 0.001 * (i % 3) for x in base], 1))
    rows.append((270, None, 0))          # null vector in the mega-cluster
    rows.append((271, [1.0, 2.0], 0))    # short-dim member
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cluster int"
    )
    assigned = df.select(
        "vec_id",
        F.col("embedding").alias("__v"),
        F.col("cluster").cast("int").alias("cluster_id"),
    )

    # ground truth: one-task kernel over every cluster
    want = {
        (r["id_b"], r["dup_of"])
        for r in assigned.select(
            "cluster_id", F.col("vec_id").alias("__id"), "__v"
        )
        .groupBy("cluster_id")
        .applyInPandas(_cluster_dup_of_fn(0.9), "id_b long, dup_of long")
        .collect()
    }
    assert want  # the planted structure must actually contain dups

    # routed: split at 100 rows -> cluster 0 goes tiled (tile_rows=64
    # -> 4 blocks -> 10 tiles), cluster 1 stays on the kernel
    got = {
        (r["id_b"], r["dup_of"])
        for r in _semdedup_dup_of(
            assigned, 0.9, "vec_id", split_rows=100, tile_rows=64
        ).collect()
    }
    assert got == want

    # multi-task evidence: the tiled path's pair stage runs as many
    # cogroup tasks spread over multiple shuffle partitions
    sizes = assigned.groupBy("cluster_id").agg(
        F.count("*").alias("__csize")
    )
    big = (
        assigned.select(
            "cluster_id", F.col("vec_id").alias("__id"), "__v"
        )
        .join(F.broadcast(sizes), "cluster_id")
        .filter(F.col("__csize") > 100)
    )
    pairs = _semdedup_dup_of_tiled(big, 0.9, tile_rows=64)
    import pyspark.sql.functions as SF

    n_parts = (
        big.withColumn(
            "__nb", F.ceil(F.col("__csize") / F.lit(64.0)).cast("int")
        )
        .select(
            SF.pmod(SF.xxhash64("__id"), F.col("__nb")).alias("g")
        )
        .distinct()
        .count()
    )
    assert n_parts > 1  # hashing really spreads rows over blocks
    # and the cogroup stage itself executes in >1 partition
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        _bipartite_pairs_fn,
    )

    # KB-scale test data lets AQE coalesce all tile tasks into one
    # partition — disable coalescing for the assertion so the
    # partition spread the plan provides at real sizes is visible
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    try:
        spark.conf.set(coalesce_key, "false")
        tile_pids = (
            _tiled_pairs_with_pid(big, 0.9, 64, _bipartite_pairs_fn)
            .select("pid")
            .distinct()
            .count()
        )
    finally:
        spark.conf.set(coalesce_key, prev)
    assert tile_pids > 1
    assert pairs.groupBy("id_b").count().count() > 0


def _tiled_pairs_with_pid(big, threshold, tile_rows, kernel_factory):
    """The tiled path's cogroup stage — built by the PRODUCTION
    frame builder — with spark_partition_id stamped on its OUTPUT
    rows (before any further shuffle), exposing how many partitions
    the pair work actually executed in."""
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        _tile_pair_frames,
    )

    left, right = _tile_pair_frames(big, tile_rows)
    return (
        left.groupBy("cluster_id", "p", "q")
        .cogroup(right.groupBy("cluster_id", "p", "q"))
        .applyInPandas(
            kernel_factory(float(threshold)),
            "id_a long, id_b long, cos double",
        )
        .withColumn("pid", F.spark_partition_id())
    )


def test_lsh_auto_planes_bounds_candidate_growth(spark):
    """Fixed-plane SRP-LSH is quadratic in candidates (sum c^2 with
    2^planes buckets — the 64x probe ground unboundedly on the (4, 8)
    config); lsh_planes_for sizes planes so expected occupancy stays
    constant. Gate: 4x the corpus under auto-sizing grows candidates
    by well under 4^2 (quadratic), and occupancy-based sizing picks
    strictly more planes for the bigger corpus."""
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        _lsh_candidates,
        lsh_planes_for,
        LSH_TARGET_BUCKET,
    )

    def corpus(n):
        import numpy as np

        rng = np.random.RandomState(42)
        vecs = rng.randn(n, 16)
        return spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        )

    n_small, n_big = 2048, 8192
    p_small = lsh_planes_for(n_small, 64)
    p_big = lsh_planes_for(n_big, 64)
    assert p_big == p_small + 2  # 4x corpus -> +2 planes
    c_small = _lsh_candidates(
        corpus(n_small), id_col="vec_id", vec_col="embedding",
        dim=16, n_planes=p_small, n_tables=4,
    ).count()
    c_big = _lsh_candidates(
        corpus(n_big), id_col="vec_id", vec_col="embedding",
        dim=16, n_planes=p_big, n_tables=4,
    ).count()
    assert c_small > 0
    # quadratic would be 16x; occupancy-constant sizing keeps the
    # growth near-linear (allow generous slack for carving imbalance)
    assert c_big / c_small < 8, (c_small, c_big)
    # default floor: tiny corpora keep the catalog config
    assert lsh_planes_for(100) == 4
    assert lsh_planes_for(100, LSH_TARGET_BUCKET) == 4


def test_lsh_tables_for_holds_default_recall():
    """Auto-raised planes must raise tables enough to hold the
    default (4-plane, 8-table) config's recall (r5 ADVICE low), stay
    bit-stable at or below the default plane count, and clamp the
    degenerate-threshold and runaway cases."""
    import math

    from click_streaming_data_pipeline_spark.extensions.similarity import (
        LSH_MAX_TABLES,
        N_PLANES,
        N_TABLES,
        lsh_tables_for,
    )

    # non-raised plane counts: untouched (fixed catalog lanes)
    assert lsh_tables_for(3) == N_TABLES
    assert lsh_tables_for(N_PLANES) == N_TABLES

    for thr in (0.4, 0.6, 0.8, 0.95):
        p = 1.0 - math.acos(thr) / math.pi
        base_recall = 1.0 - (1.0 - p**N_PLANES) ** N_TABLES
        for planes in (5, 6, 8, 10):
            t = lsh_tables_for(planes, threshold=thr)
            assert N_TABLES <= t <= LSH_MAX_TABLES
            got_recall = 1.0 - (1.0 - p**planes) ** t
            # recall held (up to the LSH_MAX_TABLES clamp)
            if t < LSH_MAX_TABLES:
                assert got_recall >= base_recall - 1e-9, (
                    thr, planes, t, got_recall, base_recall,
                )

    # degenerate thresholds: nothing to hold, default returned
    assert lsh_tables_for(10, threshold=-1.0) == N_TABLES
    assert lsh_tables_for(10, threshold=1.0) == N_TABLES
