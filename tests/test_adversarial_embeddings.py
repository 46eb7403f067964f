"""Adversarial-embeddings conformance (the vector twin of
test_adversarial_texts): the driver can regenerate embeddings.parquet
with edge-case vectors at any round, and the vector lanes' oracles
depend on IEEE-sensitive machinery — sequential-fold cosine, NaN
ordering (zero vectors), float32 storage, decimal-exact k-means
re-centering. Run every embeddings-only oracled query against a
synthetic table of exactly those vectors and require the
driver-strict value hash to match — if the engine pair ever disagrees
on a zero vector or a denormal, it fails HERE, not in the round gate.

Constraint documented by this corpus: ``train_pq_codebooks`` indexes
``codebooks[m][code]`` for code < K_CODES=16, so the corpus must hold
at least 16 vectors (the driver tables always do); this suite uses 20.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from click_streaming_data_pipeline_spark.plans import QUERIES

from tools.driver_check import value_hash

DIM = 64


def _vec(fn) -> list[float]:
    return [float(fn(j)) for j in range(DIM)]


ADVERSARIAL_VECS = [
    # query ids 0-4 (the knn lanes' fixed query set) stay "normal"
    (0, _vec(lambda j: 0.1 + 0.01 * j), 0),
    (1, _vec(lambda j: -0.5 + 0.02 * j), 0),          # negatives
    (2, _vec(lambda j: 1e-30 * (j + 1)), 1),          # tiny magnitudes
    (3, _vec(lambda j: 1e15 * (1 + j % 3)), 1),       # huge magnitudes
    (4, _vec(lambda j: (-1.0) ** j), 0),              # alternating signs
    (5, _vec(lambda j: 0.1 + 0.01 * j), 0),           # exact dup of 0
    (6, _vec(lambda j: 2 * (0.1 + 0.01 * j)), 0),     # scalar multiple of 0
    (7, _vec(lambda j: 0.0), 1),                      # zero vector
    (8, _vec(lambda j: 0.0), 1),                      # second zero vector
    (9, _vec(lambda j: 1.0 if j == 0 else 0.0), 0),   # one-hot
    (10, _vec(lambda j: 5e-324 if j == 0 else 0.0), 1),  # denormal -> 0.0f
    (11, _vec(lambda j: 0.25 if j % 2 else -0.25), 0),
] + [
    # fillers so PQ's 16-smallest-ids codebook init is well-defined
    (12 + i, _vec(lambda j, i=i: ((i * 31 + j * 7) % 13 - 6) / 6.0), i % 2)
    for i in range(8)
]

# embeddings-only catalog queries with full value oracles
VECTOR_QUERIES = [
    "knn_topk",
    "knn_lsh_pairs",
    # NOT knn_lsh_pairs_auto: its oracle is rendered for the GATE
    # corpus's auto-sizing (lsh_planes_for(N)) at import time, so it
    # cannot follow this 20-row fixture's different derived config —
    # the fixed-config knn_lsh_pairs covers hostile vectors for the
    # LSH shape, and test_lsh_auto_* pins the sizing rule itself
    "knn_ivf_topk",
    "knn_pq_topk",
    "knn_ivfpq_topk",
    "knn_int8_topk",
    # persisted / incremental / streaming index paths: hostile
    # vectors must survive save -> (append | micro-batch ingest ->
    # compact) -> pruned probe identically to the in-memory lanes
    "knn_ivf_index_topk",
    "knn_ivf_append_topk",
    "knn_ivf_ingest_streamed",
    "pq_codes",
    "semdedup_keep",
    "semdedup_streamed",
    "embedding_neardup",
    "embedding_quantize",
    "embedding_random_projection",
    "embedding_label_outliers",
    "ann_recall_report",
]


@pytest.fixture(scope="module")
def adversarial_emb_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adv_emb"))
    spark.createDataFrame(
        ADVERSARIAL_VECS,
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.parquet(os.path.join(d, "embeddings.parquet"))
    return d


@pytest.mark.slow
def test_adversarial_vectors_auto_lsh(spark, adversarial_emb_dir):
    """The AUTO-SIZED LSH path (count -> lsh_planes_for ->
    lsh_tables_for -> bucketing) on the adversarial corpus, compared
    against a replay oracle GENERATED for this corpus's count — the
    static catalog oracle pins the 500-row gate derivation and cannot
    cover other corpora (r6 self-review finding). Two configs: the
    default target (degenerates to the floor config at n=20) and a
    forced-tiny target that RAISES planes (5) and tables (14), so the
    recall-holding path runs on zero/denormal/huge vectors too."""
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        lsh_bucketed_pairs,
    )
    from click_streaming_data_pipeline_spark.plans.catalog_extensions import (
        _AUTO_TARGET_BUCKET,
        _srp_auto_oracle,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    n = len(ADVERSARIAL_VECS)
    emb = load_table(spark, adversarial_emb_dir, "embeddings")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{adversarial_emb_dir}/embeddings.parquet/*.parquet'"
    )
    for target in (_AUTO_TARGET_BUCKET, 1):
        sdf = lsh_bucketed_pairs(
            emb,
            threshold=0.40,
            n_planes=None,
            n_tables=None,
            target_bucket=target,
        )
        srows = [tuple(r) for r in sdf.collect()]
        cur = con.execute(_srp_auto_oracle(n, target))
        ocols = [d_[0] for d_ in cur.description]
        orows = cur.fetchall()
        assert sorted(sdf.columns) == sorted(ocols)
        assert len(srows) == len(orows), (target, len(srows), len(orows))
        assert value_hash(srows, sdf.columns) == value_hash(
            orows, ocols
        ), f"auto LSH diverges at target_bucket={target}"


_SLOW_VECTOR = {
    "ann_recall_report",
    "embedding_random_projection",
    "semdedup_streamed",
    "knn_ivf_ingest_streamed",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_VECTOR else n
        for n in VECTOR_QUERIES
    ],
)
def test_adversarial_vectors_match_oracle(spark, adversarial_emb_dir, name):
    if name not in QUERIES or not QUERIES[name].oracle:
        pytest.skip(f"{name} not in catalog or not oracled")
    sdf = QUERIES[name].fn(spark, adversarial_emb_dir)
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{adversarial_emb_dir}/embeddings.parquet/*.parquet'"
    )
    cur = con.execute(QUERIES[name].oracle)
    ocols = [d_[0] for d_ in cur.description]
    orows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows), (len(srows), len(orows))
    assert value_hash(srows, sdf.columns) == value_hash(orows, ocols), (
        f"{name}: engines diverge on adversarial vectors; "
        f"spark sample={sorted(srows, key=repr)[:4]} "
        f"oracle sample={sorted(orows, key=repr)[:4]}"
    )
