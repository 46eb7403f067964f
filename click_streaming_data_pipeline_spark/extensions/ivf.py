"""IVF (inverted-file) approximate nearest-neighbor search: a
deterministic mini k-means coarse quantizer + probe-nearest-partitions
search. The second ANN strategy next to SRP-LSH
(``extensions/similarity.py``) — IVF adapts to the data distribution
(centroids follow density) where LSH is data-oblivious.

This is also the repo's iterative-algorithm representative: k-means
loops driver-side over DataFrame jobs — each iteration is one assign
(broadcast centroids, argmin over K distances) + one re-center
(groupBy decimal-exact sum + one IEEE division) — the classic Spark
iterative shape. Determinism: centroids initialize from the K
smallest vec_ids (no RNG), iterate a fixed number of rounds, and
re-center order-free — which is what lets the DuckDB oracle unroll
the loop and replay training bit-for-bit
(plans/catalog_extensions.py ``_kmeans_chain``).

Scale: the corpus is written partitioned by centroid id; a query
probes ``nprobe`` nearest centroids → reads ~nprobe/K of the data.
Candidate generation is a broadcast semi-join on centroid id — no
all-pairs anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import _as_double, cosine, cosine_arrow

N_ITER = 3
#: cap on the k-means training-set size: above this the trainer
#: down-samples deterministically (id % mod == 0). Centroid quality
#: needs a representative sample, not the full corpus — full-corpus
#: assign/re-center rounds at 100 TB would be n_iter extra passes.
TRAIN_SAMPLE_CAP = 65_536
#: cap on K for the catalog defaults: auto_k clamps here so centroids
#: stay a literal expression array (fine to a few hundred). _assign
#: itself is NOT capped — above ASSIGN_LITERAL_MAX it switches to the
#: broadcast-table-join path, so a warehouse-scale caller can raise K
#: with sqrt(N) (keeping SemDeDup's per-cluster work bounded) without
#: hitting a literal-size wall.
K_MAX = 256
#: centroid count above which _assign swaps the Arrow-kernel argmax
#: for a broadcast join + partial-agg argmax (same semantics,
#: pytest-pinned). Since round 4 the small-K path is a kernel, not a
#: literal expression array, so the cap is a closure-size/flops bound
#: (K x dim doubles ride in the UDF pickle; per-batch work is K x dim
#: numpy column ops), not a Catalyst literal-size bound.
ASSIGN_LITERAL_MAX = 4096


def _centroid_array_col(centroids: list[tuple[int, list[float]]]):
    """Literal array<struct<cid,vec>> for broadcast-free argmin."""
    return F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(x) for x in vec]).alias("cvec"),
            )
            for cid, vec in centroids
        ]
    )


def _nearest_centroid_arrow(centroids):
    """Arrow kernel for the small-K assign path: per batch, one
    numpy pass per (centroid, dimension) reproducing the expression
    fold bit-for-bit (same IEEE op order as ``similarity.cosine`` —
    see ``similarity._fold_cosine_rows``). Comparison semantics match
    ``array_max`` over struct(cos, neg_cid, cid): max cosine with
    Spark's NaN-greatest double ordering, ties to the smaller cid
    (centroids iterate in ascending cid; strict > keeps the first).
    The old literal-transform expression did the same math interpreted
    per element — ~0.2us x K x dim per row, the dominant cost of every
    k-means iteration."""
    import math

    cents = sorted(
        ((int(cid), [float(x) for x in vec]) for cid, vec in centroids)
    )  # ascending cid: strict > then keeps the smaller cid on ties

    def _kernel(v):
        import numpy as np
        import pandas as pd

        # NULL/ragged rows: the expression path yields cosine 0.0 to
        # every centroid (NULL fold -> coalesce 0.0), so the smallest
        # cid wins. A zeros row reproduces that exactly (den == 0 ->
        # cos 0.0 for all centroids) — substitute instead of letting
        # vstack raise an opaque executor ValueError.
        d = len(cents[0][1])
        V = np.vstack(
            [
                np.asarray(x, np.float64)
                if x is not None and len(x) == d
                else np.zeros(d)
                for x in v
            ]
        )
        n = V.shape[0]
        nv = np.zeros(n)
        for i in range(d):
            nv = nv + V[:, i] * V[:, i]
        nq = np.sqrt(nv)
        best_key = np.full(n, -np.inf)
        best_cid = np.zeros(n, dtype=np.int32)
        first = True
        for cid, cvec in cents:
            dot = np.zeros(n)
            nc = 0.0
            for i in range(d):
                ci = cvec[i]
                dot = dot + V[:, i] * ci
                nc = nc + ci * ci
            den = nq * math.sqrt(nc)
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = dot / den
            cos = np.where(den == 0.0, 0.0, cos)
            key = np.where(np.isnan(cos), np.inf, cos)  # NaN sorts greatest
            if first:
                best_key, best_cid, first = key, np.full(n, cid, np.int32), False
            else:
                win = key > best_key
                best_key = np.where(win, key, best_key)
                best_cid = np.where(win, cid, best_cid)
        return pd.Series(best_cid, dtype="int32")

    from pyspark.sql.pandas.functions import pandas_udf

    return pandas_udf(_kernel, "int")


def _assign(emb: DataFrame, centroids, vec_col: str) -> DataFrame:
    """Nearest-centroid id per vector (max cosine, min cid ties).

    K <= ASSIGN_LITERAL_MAX: an Arrow kernel scores all K centroids
    per batch with the exact expression-fold op order (no join, no
    shuffle, no per-element interpretation). Larger K: centroids
    become a BROADCAST table, each vector scores K rows, and the
    argmax is a partial-aggregable max-of-struct groupBy on a
    transient row key — the shape that scales to thousands of
    centroids. Same semantics (max cosine, ties to the smaller cid),
    pinned by a parity pytest.
    """
    if len(centroids) <= ASSIGN_LITERAL_MAX:
        return emb.withColumn(
            "centroid_id", _nearest_centroid_arrow(centroids)(F.col(vec_col))
        )
    spark = emb.sparkSession
    cents = spark.createDataFrame(
        [(cid, [float(x) for x in vec]) for cid, vec in centroids],
        "cid int, cvec array<double>",
    )
    keyed = emb.withColumn("__rk", F.monotonically_increasing_id())
    best = (
        keyed.select("__rk", F.col(vec_col).alias("__v"))
        .crossJoin(F.broadcast(cents))
        .groupBy("__rk")
        .agg(
            F.max(
                F.struct(
                    cosine(F.col("__v"), F.col("cvec")).alias("cos"),
                    (-F.col("cid")).alias("neg_cid"),
                    F.col("cid").alias("cid"),
                )
            )["cid"].alias("centroid_id")
        )
    )
    return keyed.join(best, "__rk").drop("__rk")


def auto_k(n: int, cap: int = K_MAX) -> int:
    """K sized to the corpus: the sqrt(N) rule of thumb, clamped to
    [4, cap]. The default cap keeps the IVF probe-side centroid
    literal bounded; callers that only ASSIGN (SemDeDup) can raise it
    — the Arrow-kernel assign has no literal-size constraint, it just
    ships the centroid matrix in the UDF closure."""
    return max(4, min(cap, int(round(n**0.5))))


def train_kmeans(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    k_cap: int = K_MAX,
    n_iter: int = N_ITER,
    sample_mod: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Deterministic k-means (cosine/spherical): init = the k smallest
    ids; each round assigns and re-centers via element-wise mean
    (aggregate over array positions).

    ``k=None`` sizes K to the corpus (sqrt(N), clamped to ``k_cap``);
    ``sample_mod=None`` picks the smallest deterministic sample
    (``id % mod == 0``) that fits TRAIN_SAMPLE_CAP, so training cost
    is bounded regardless of corpus size. Both remain overridable."""
    e = emb.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    )
    n = e.count()
    if k is None:
        k = auto_k(n, k_cap)
    if sample_mod is None:
        sample_mod = max(1, -(-n // TRAIN_SAMPLE_CAP))  # ceil division
    if sample_mod > 1:
        e = e.filter(F.col(id_col) % sample_mod == 0)
    init = (
        e.orderBy(F.col(id_col).asc()).limit(k).collect()
    )
    centroids = [(i, list(r["v"])) for i, r in enumerate(init)]
    dim = len(centroids[0][1])
    for _ in range(n_iter):
        assigned = _assign(e, centroids, "v")
        # decimal-exact per-position sums (order-free, like graph.
        # pagerank) + one driver-side IEEE division per component:
        # identical doubles on any partitioning AND in the DuckDB
        # oracle twin, where F.avg's float summation order is not.
        means = (
            assigned.groupBy("centroid_id")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                *[
                    F.sum(F.col("v")[i].cast("decimal(38,18)"))
                    .cast("double")
                    .alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new = {
            r["centroid_id"]: [r[f"s{i}"] / r["__n"] for i in range(dim)]
            for r in means
        }
        # empty clusters keep their previous centroid (deterministic)
        centroids = [
            (cid, new.get(cid, vec)) for cid, vec in centroids
        ]
    return centroids


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    nprobe: int | None = None,
) -> DataFrame:
    """Approximate top-k: probe the query's nprobe nearest centroids,
    rank only vectors assigned there. Recall < 1 by construction
    (neighbors assigned to unprobed partitions are missed); raise
    nprobe to trade cost for recall. ``nprobe=None`` probes K/4
    partitions (a fixed fraction keeps the recall characteristics
    stable as auto-K grows with the corpus)."""
    centroids = centroids or train_kmeans(
        emb, id_col=id_col, vec_col=vec_col
    )
    if nprobe is None:
        nprobe = max(1, len(centroids) // 4)
    corpus = _assign(
        emb.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("n_vec"),
        ),
        centroids,
        "n_vec",
    )
    carr = _centroid_array_col(centroids)
    queries = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
        .withColumn(
            "__ranked",
            F.reverse(
                F.array_sort(
                    F.transform(
                        carr,
                        lambda c: F.struct(
                            cosine(F.col("q_vec"), c["cvec"]).alias("cos"),
                            (-c["cid"]).alias("neg_cid"),
                            c["cid"].alias("cid"),
                        ),
                    )
                )
            ),
        )
        .withColumn(
            "probe_cids",
            F.transform(
                F.slice(F.col("__ranked"), 1, nprobe), lambda s: s["cid"]
            ),
        )
        .select("query_id", "q_vec", F.explode("probe_cids").alias("centroid_id"))
    )
    cand = corpus.join(F.broadcast(queries), "centroid_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn(
        "cos", cosine_arrow(F.col("q_vec"), F.col("n_vec"))
    ).select("query_id", "neighbor_id", "cos")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# Index persistence: build once, probe many times

def save_ivf_index(
    emb: DataFrame,
    index_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index as TABLES: the centroid codebook and
    the corpus partitioned-by-centroid — so the (expensive) k-means
    train + assign runs once and every later query is a partition-
    pruned read. ``partitionBy(centroid_id)`` is the point: a probe
    of nprobe partitions lists only those directories, touching
    ~nprobe/K of the corpus FILES (file-level pruning, not a
    post-scan filter)."""
    import os

    centroids = train_kmeans(emb, id_col=id_col, vec_col=vec_col)
    spark = emb.sparkSession
    spark.createDataFrame(
        [(cid, list(map(float, vec))) for cid, vec in centroids],
        "centroid_id int, cvec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, "centroids")
    )
    assigned = _assign(
        emb.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("n_vec"),
        ),
        centroids,
        "n_vec",
    )
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
        os.path.join(index_dir, "corpus")
    )


def load_ivf_centroids(spark, index_dir: str) -> list[tuple[int, list[float]]]:
    import os

    rows = (
        spark.read.parquet(os.path.join(index_dir, "centroids"))
        .orderBy("centroid_id")
        .collect()
    )
    return [(int(r["centroid_id"]), list(r["cvec"])) for r in rows]


def ivf_index_topk(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    *,
    nprobe: int | None = None,
) -> DataFrame:
    """Top-k from a SAVED index: rank centroids for each query
    (codebook is a literal — no corpus access), then read ONLY the
    probed partitions of the corpus table and score those. The
    centroid_id filter prunes at the directory level, which is the
    persistent-index form of ivf_topk's probe join."""
    import os

    centroids = load_ivf_centroids(spark, index_dir)
    if nprobe is None:
        nprobe = max(1, len(centroids) // 4)
    carr = _centroid_array_col(centroids)
    probed = (
        queries.withColumn(
            "__ranked",
            F.reverse(
                F.array_sort(
                    F.transform(
                        carr,
                        lambda c: F.struct(
                            cosine(F.col("q_vec"), c["cvec"]).alias("cos"),
                            (-c["cid"]).alias("neg_cid"),
                            c["cid"].alias("cid"),
                        ),
                    )
                )
            ),
        )
        .withColumn(
            "probe_cids",
            F.transform(
                F.slice(F.col("__ranked"), 1, nprobe), lambda s: s["cid"]
            ),
        )
        .select(
            "query_id", "q_vec", F.explode("probe_cids").alias("centroid_id")
        )
    )
    corpus = spark.read.parquet(os.path.join(index_dir, "corpus"))
    cand = corpus.join(F.broadcast(probed), "centroid_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn(
        "cos", cosine_arrow(F.col("q_vec"), F.col("n_vec"))
    ).select("query_id", "neighbor_id", "cos")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
