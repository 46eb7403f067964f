"""Incremental (streaming) near-duplicate detection.

The batch MinHash+LSH pipeline (``extensions/dedup.py``) assumes the
whole corpus is present. A training-data ingest pipeline instead sees
documents arrive continuously and must answer "is this new document a
near-dup of ANYTHING seen so far" without re-running the full corpus
— the shape this module provides:

per micro-batch (foreachBatch):
  1. shingle + minhash + band the batch's documents;
  2. candidate pairs = batch postings ⋈ (store ∪ batch) postings on
     (band, band_key) — new docs only ever join the accumulated
     bucket store, never the full corpus;
  3. verify candidates with exact Jaccard against the accumulated
     shingle store (``jaccard_for_pairs`` — cost tracks candidates);
  4. append verified pairs + the batch's postings/shingles to the
     stores.

Because every pair of banded-together docs is examined exactly when
the later one arrives, the accumulated pairs after the stream drains
MUST equal the batch pipeline's output — that equivalence is the
driver oracle for ``dedup_neardup_streamed``.

Scale: the stores are the state. Postings are tiny (4 rows/doc);
shingles are ~corpus-sized — at 100 TB keep them partitioned by a
shingle-hash prefix so the verify join prunes, and compact
periodically. State lives in storage, not the streaming state store,
so it survives restarts and is shared by other consumers.

Boilerplate df-cap: the batch pipeline drops >max_df shingles from
the SIGNATURE input (``dedup.LSH_MAX_DF`` — without it a corpus-wide
shingle that wins a minhash seed turns one band bucket quadratic).
The incremental pipeline deliberately does NOT apply it: a streaming
signature is computed once at arrival, when the shingle's final df is
unknowable, so any cap here would depend on arrival order and break
the drained-equals-batch oracle. At 100 TB, either pre-train a
boilerplate blocklist offline (the CCNet arrangement: df stats from a
prior snapshot, broadcast as the drop set) or periodically re-run the
batch pipeline over the accumulated store — both keep signatures a
pure function of (doc, blocklist), order-independent.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.upsert import upsert_parquet
from .dedup import (
    band_postings,
    doc_shingle_hashes,
    jaccard_for_pairs,
    minhash_signatures_fast,
)


def _batch_dir(store: str, batch_id: int) -> str:
    return os.path.join(store, f"b{batch_id}")


def _read_prior(spark: SparkSession, store: str, batch_id: int):
    """Read every batch subdirectory EXCEPT the current batch's own.

    foreachBatch is at-least-once: a failed-then-retried micro-batch
    re-runs with the same batch_id. Plain mode('append') stores would
    double-append its rows (inflating shingle/posting counts and hence
    Jaccard); per-batch subdirs written with overwrite + excluding the
    current id at read time make the step idempotent — the retry sees
    exactly the pre-batch state and overwrites its own output.
    """
    if not os.path.isdir(store):
        return None
    parts = [
        os.path.join(store, d)
        for d in os.listdir(store)
        if d.startswith("b") and d != f"b{batch_id}"
    ]
    if not parts:
        return None
    return spark.read.parquet(*parts)


def process_batch(
    batch_docs: DataFrame,
    *,
    batch_id: int,
    shingle_store: str,
    postings_store: str,
    pairs_store: str,
    threshold: float,
) -> None:
    """One incremental step; see module docstring."""
    spark = batch_docs.sparkSession
    # the persisted shingle store carries (doc_id, h1, h2) LONGS, not
    # shingle strings — same win as the batch pipeline's all-numeric
    # shingle table, and the state the stream accumulates is ~3x
    # narrower (state size is the 100 TB constraint here)
    sh_new = doc_shingle_hashes(batch_docs)
    post_new = band_postings(minhash_signatures_fast(sh_new))

    post_prev = _read_prior(spark, postings_store, batch_id)
    if post_prev is not None:
        post_all = post_prev.unionByName(post_new)
        sh_all = _read_prior(spark, shingle_store, batch_id).unionByName(sh_new)
    else:
        post_all, sh_all = post_new, sh_new

    a = post_all.select(
        F.col("band"),
        F.col("band_key"),
        F.col("doc_id").alias("id_x"),
    )
    b = post_new.select(
        F.col("band"),
        F.col("band_key"),
        F.col("doc_id").alias("id_y"),
    )
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_x") != F.col("id_y"))
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
        )
        .distinct()
    )
    verified = jaccard_for_pairs(sh_all, cand).filter(
        F.col("jaccard") >= threshold
    )
    # keyed upsert: a pair re-candidated by a later batch (same docs,
    # other band) resolves to one row
    upsert_parquet(
        spark, pairs_store, verified, ["id_a", "id_b"], ["jaccard"]
    )
    post_new.write.mode("overwrite").parquet(_batch_dir(postings_store, batch_id))
    sh_new.write.mode("overwrite").parquet(_batch_dir(shingle_store, batch_id))
    return verified


def run_streaming_neardup(
    spark: SparkSession,
    sf_dir: str,
    *,
    threshold: float = 0.8,
    files_per_trigger: int = 2,
    n_files: int = 6,
    work_dir: str | None = None,
) -> DataFrame:
    """Drive the incremental dedup over a file stream of the documents
    table (availableNow, several micro-batches); returns the final
    accumulated near-dup pairs."""
    from ..sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    work = work_dir or tempfile.mkdtemp(prefix="csdp_ndup_")
    src = os.path.join(work, "in")
    shingle_store = os.path.join(work, "shingles")
    postings_store = os.path.join(work, "postings")
    pairs_store = os.path.join(work, "pairs")
    ckpt = os.path.join(work, "ckpt")

    docs.repartition(n_files).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )

    def on_batch(batch_docs: DataFrame, batch_id: int) -> None:
        process_batch(
            batch_docs,
            batch_id=batch_id,
            shingle_store=shingle_store,
            postings_store=postings_store,
            pairs_store=pairs_store,
            threshold=threshold,
        )

    q = (
        stream.writeStream.queryName(f"ndup_{uuid.uuid4().hex[:8]}")
        .foreachBatch(on_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(pairs_store)


# ---------------------------------------------------------------------------
# incremental connected components (near-dup clusters over a stream)


def fold_cluster_state(
    spark: SparkSession,
    cluster_store: str,
    new_pairs: DataFrame,
    batch_id: int,
) -> None:
    """Incremental CONNECTED COMPONENTS: maintain near-dup clusters as
    edges stream in, without ever re-running propagation over the
    accumulated pair set.

    State = the label map (doc_id, cluster_id), which doubles as a
    STAR FOREST: each component contracted to edges (member -> root).
    A batch's propagation graph is (new verified pairs) UNION (prior
    stars) — size bounded by nodes-seen + batch edges, never the
    accumulated edge count, and prior components enter at diameter 2
    so min-label propagation converges in O(length of the chain the
    NEW edges create), not O(component diameter from scratch).
    Versioned v{batch_id} commits (reads strictly below batch_id)
    make an at-least-once replay re-derive identical state."""
    import shutil

    from .dedup import neardup_clusters

    edges = new_pairs.select("id_a", "id_b")
    prior_versions = []
    if os.path.isdir(cluster_store):
        prior_versions = sorted(
            int(d[1:])
            for d in os.listdir(cluster_store)
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < batch_id
        )
    if prior_versions:
        prior = spark.read.parquet(
            os.path.join(cluster_store, f"v{prior_versions[-1]}")
        )
        stars = prior.filter(F.col("doc_id") != F.col("cluster_id")).select(
            F.col("doc_id").alias("id_a"), F.col("cluster_id").alias("id_b")
        )
        edges = edges.unionByName(stars)
    state = neardup_clusters(edges).localCheckpoint(eager=True)
    state.write.mode("overwrite").parquet(
        os.path.join(cluster_store, f"v{batch_id}")
    )
    for v in prior_versions[:-1]:
        shutil.rmtree(
            os.path.join(cluster_store, f"v{v}"), ignore_errors=True
        )


def run_streaming_clusters(
    spark: SparkSession,
    sf_dir: str,
    *,
    threshold: float = 0.8,
    files_per_trigger: int = 2,
    n_files: int = 6,
) -> DataFrame:
    """Incremental near-dup clustering: the streaming LSH dedup
    produces each batch's newly-verified pairs, and the cluster state
    folds them into the maintained component labels — so cluster ids
    are current after every micro-batch, not just at drain time."""
    from ..sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="csdp_ndcl_")
    src = os.path.join(work, "in")
    stores = {
        k: os.path.join(work, k)
        for k in ("shingles", "postings", "pairs", "clusters")
    }
    ckpt = os.path.join(work, "ckpt")
    docs.repartition(n_files).write.mode("overwrite").parquet(src)

    def on_batch(batch_docs: DataFrame, batch_id: int) -> None:
        verified = process_batch(
            batch_docs,
            batch_id=batch_id,
            shingle_store=stores["shingles"],
            postings_store=stores["postings"],
            pairs_store=stores["pairs"],
            threshold=threshold,
        ).localCheckpoint(eager=True)
        fold_cluster_state(
            batch_docs.sparkSession, stores["clusters"], verified, batch_id
        )

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
        .writeStream.queryName(f"ndcl_{uuid.uuid4().hex[:8]}")
        .foreachBatch(on_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = max(
        int(d[1:])
        for d in os.listdir(stores["clusters"])
        if d.startswith("v") and d[1:].isdigit()
    )
    return spark.read.parquet(
        os.path.join(stores["clusters"], f"v{latest}")
    )


# ---------------------------------------------------------------------------
# incremental SEMANTIC dedup (embedding-space SemDeDup over a stream)


def process_semdedup_batch(
    batch_emb: DataFrame,
    centroids,
    *,
    batch_id: int,
    vec_store: str,
    pairs_store: str,
    threshold: float,
    tile_rows: int | None = None,
) -> None:
    """One incremental SemDeDup step: assign the batch's vectors to
    the FIXED centroid codebook, compare them against the accumulated
    per-cluster store (plus the batch itself), and upsert verified
    semantic-dup pairs. Mirrors process_batch: new vectors only ever
    join their own cluster's accumulated members, never the corpus."""
    from .similarity import (
        SEMDEDUP_TILE_ROWS,
        _as_double,
        _bipartite_pairs_fn,
    )
    from .ivf import _assign

    spark = batch_emb.sparkSession
    e = batch_emb.select(
        F.col("vec_id"), _as_double(F.col("embedding")).alias("v")
    )
    new = _assign(e, centroids, "v").select(
        "vec_id", F.col("centroid_id").alias("cluster_id"), "v"
    )
    prev = _read_prior(spark, vec_store, batch_id)
    allv = prev.unionByName(new) if prev is not None else new

    # within-cluster verify as a cogrouped kernel: each accumulated
    # vector crosses the wire once per micro-batch instead of once
    # per candidate pair (the join form's sum(c_all*c_new) x 2 x dim
    # bytes — the same super-linear term the batch path shed in r5);
    # bit-identical cos doubles, parity pinned by the drained-equals-
    # batch oracle. Both-new pairs arrive in both orientations, so
    # the dropDuplicates stays.
    #
    # Mega-cluster skew (round 6): the accumulated side of a skewed
    # cluster grows without bound while one cogroup key = one task.
    # The tile split from the batch path applies directly — hash the
    # ACCUMULATED side into ceil(csize/TILE) blocks and replicate the
    # (micro-batch-bounded) new side to every block, so a mega-
    # cluster's verify runs as independent block tasks. nb == 1 for
    # ordinary clusters, which IS the untiled grouping — one code
    # path, no routing, identical output set.
    T = int(tile_rows or SEMDEDUP_TILE_ROWS)
    sizes = allv.groupBy("cluster_id").agg(
        F.count("*").alias("__csize")
    )
    nb = F.ceil(F.col("__csize") / F.lit(float(T))).cast("int")
    left = allv.join(F.broadcast(sizes), "cluster_id").select(
        "cluster_id",
        F.pmod(F.xxhash64("vec_id"), nb).cast("int").alias("__g"),
        F.col("vec_id").alias("__id"),
        F.col("v").alias("__v"),
    )
    # same-name aliases mint fresh attribute ids: both sides descend
    # from the micro-batch frame, and the cogroup's analyzer rejects
    # ambiguous self-lineage otherwise
    right = new.join(F.broadcast(sizes), "cluster_id").select(
        F.col("cluster_id").alias("cluster_id"),
        F.explode(
            F.sequence(F.lit(0), nb - F.lit(1))
        ).alias("__g"),
        F.col("vec_id").alias("__id"),
        F.col("v").alias("__v"),
    )
    cand = (
        left.groupBy("cluster_id", "__g")
        .cogroup(right.groupBy("cluster_id", "__g"))
        .applyInPandas(
            _bipartite_pairs_fn(float(threshold)),
            "id_a long, id_b long, cos double",
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    upsert_parquet(spark, pairs_store, cand, ["id_a", "id_b"], ["cos"])
    new.write.mode("overwrite").parquet(_batch_dir(vec_store, batch_id))


def run_streaming_semdedup(
    spark: SparkSession,
    sf_dir: str,
    *,
    threshold: float | None = None,
    files_per_trigger: int = 2,
    n_files: int = 6,
    tile_rows: int | None = None,
) -> DataFrame:
    """Incremental SemDeDup over a stream of embeddings: the centroid
    codebook is trained ONCE up front (deterministic sampled k-means —
    at warehouse scale a separate offline job, exactly like an IVF/PQ
    index build), then each micro-batch assigns, verifies within its
    clusters against the accumulated store, and upserts pairs. The
    drained keep/drop result must equal batch semdedup exactly: every
    within-cluster pair is examined when its LATER-ARRIVING member
    shows up, and the keep rule (min smaller-id neighbor) is computed
    from the full accumulated pair set at drain time — arrival-order
    independent."""
    from ..sources import load_table
    from .ivf import train_kmeans
    from .similarity import SEMDEDUP_COS, SEMDEDUP_K_CAP

    thr = SEMDEDUP_COS if threshold is None else threshold
    emb = load_table(spark, sf_dir, "embeddings")
    # same K sizing as batch semdedup: drained result must equal it
    centroids = train_kmeans(emb, k_cap=SEMDEDUP_K_CAP)

    work = tempfile.mkdtemp(prefix="csdp_semdd_")
    src = os.path.join(work, "in")
    vec_store = os.path.join(work, "vecs")
    pairs_store = os.path.join(work, "pairs")
    ckpt = os.path.join(work, "ckpt")
    emb.repartition(n_files).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )

    def on_batch(batch_emb: DataFrame, batch_id: int) -> None:
        process_semdedup_batch(
            batch_emb,
            centroids,
            batch_id=batch_id,
            vec_store=vec_store,
            pairs_store=pairs_store,
            threshold=thr,
            tile_rows=tile_rows,
        )

    q = (
        stream.writeStream.queryName(f"semdd_{uuid.uuid4().hex[:8]}")
        .foreachBatch(on_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    vecs = spark.read.parquet(os.path.join(vec_store, "*"))
    pairs = spark.read.parquet(pairs_store)
    dup_of = pairs.groupBy("id_b").agg(F.min("id_a").alias("dup_of"))
    return vecs.join(dup_of, vecs.vec_id == dup_of.id_b, "left").select(
        "vec_id",
        "cluster_id",
        F.col("dup_of").isNull().alias("is_kept"),
        "dup_of",
    )
