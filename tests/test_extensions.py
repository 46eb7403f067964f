"""Stronger checks for the approximate extension operators that the
DuckDB oracle can't express: python-oracle for simhash, recall for
LSH variants, determinism/shape for the multimodal stub."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from click_streaming_data_pipeline_spark.extensions.dedup import (
    doc_shingles,
    jaccard_pairs,
    minhash_lsh_dedup,
    simhash_pairs,
)
from click_streaming_data_pipeline_spark.extensions.multimodal import (
    assets_from_documents,
    extract_features,
)
from click_streaming_data_pipeline_spark.extensions.similarity import (
    brute_force_topk,
    lsh_bucketed_pairs,
    neardup_pairs,
)
from click_streaming_data_pipeline_spark.sources import load_table

from .conftest import SF_TEST


def _py_simhash(text: str, bits: int = 32) -> int:
    toks = text.lower().split(" ")
    feats = sorted(
        {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    )
    sums = [0] * bits
    for t in feats:
        h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        for b in range(bits):
            sums[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(bits):
        if sums[b] > 0:
            out |= 1 << b
    return out


def test_simhash_matches_python_oracle(spark):
    docs = load_table(spark, SF_TEST, "documents").limit(50)
    from click_streaming_data_pipeline_spark.extensions.dedup import simhash

    got = {
        r["doc_id"]: r["fp"]
        for r in docs.select("doc_id", simhash("text").alias("fp")).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, text in texts.items():
        assert got[did] == _py_simhash(text), f"doc {did}"


def test_simhash_pairs_align_with_jaccard(spark):
    """SimHash near-dups should be (mostly) the high-Jaccard pairs."""
    docs = load_table(spark, SF_TEST, "documents")
    sim = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(docs, max_hamming=4).collect()
    }
    jac = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(doc_shingles(docs), threshold=0.8).collect()
    }
    assert jac, "corpus should contain planted near-dups"
    # every planted near-dup must be found by simhash at this radius
    missed = jac - sim
    assert len(missed) <= len(jac) * 0.2, f"simhash missed {missed}"


def test_simhash_banded_equals_allpairs(spark):
    """Pigeonhole chunk banding is EXACT (not probabilistic): the
    banded plan must reproduce the all-pairs result identically."""
    from click_streaming_data_pipeline_spark.extensions.dedup import (
        simhash_pairs_allpairs,
    )

    docs = load_table(spark, SF_TEST, "documents")
    banded = sorted(map(tuple, simhash_pairs(docs, max_hamming=4).collect()))
    allp = sorted(
        map(tuple, simhash_pairs_allpairs(docs, max_hamming=4).collect())
    )
    assert banded == allp
    assert banded  # non-trivial corpus


def test_jaccard_max_df_cap(spark):
    """The default cap leaves the test corpus untouched; a tiny cap
    drops high-df shingles from the representation and changes pairs."""
    docs = load_table(spark, SF_TEST, "documents")
    sh = doc_shingles(docs)
    capped = sorted(map(tuple, jaccard_pairs(sh, threshold=0.8).collect()))
    uncapped = sorted(
        map(tuple, jaccard_pairs(sh, threshold=0.8, max_df=None).collect())
    )
    assert capped == uncapped and capped
    # df cap of 1 keeps only unique shingles: planted near-dups (which
    # by definition share shingles with df >= 2) can no longer match
    tiny = jaccard_pairs(sh, threshold=0.8, max_df=1).count()
    assert tiny == 0


def test_embedding_lsh_neardup_equals_allpairs(spark):
    """The catalog's LSH near-dup config (3 planes x 32 tables) must
    reproduce the exact all-pairs cosine result on the gate corpus
    (32 tables: the weakest true pair sits at the threshold, where 16
    tables dropped one of sf0.1's 144 pairs)."""
    emb = load_table(spark, SF_TEST, "embeddings")
    lsh = sorted(
        map(
            tuple,
            lsh_bucketed_pairs(
                emb, threshold=0.45, n_planes=3, n_tables=32
            ).collect(),
        )
    )
    exact = sorted(map(tuple, neardup_pairs(emb, threshold=0.45).collect()))
    assert lsh == exact
    assert lsh  # non-trivial corpus


def test_minhash_lsh_equals_exact_jaccard(spark):
    docs = load_table(spark, SF_TEST, "documents")
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dedup(docs, threshold=0.8).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(doc_shingles(docs), threshold=0.8).collect()
    }
    assert lsh == exact


def test_minhash_lsh_sound_and_complete_at_sf01(spark):
    """Scale-safe LSH gate at sf0.1 (r4 VERDICT #3): pair-set EQUALITY
    with the exact-Jaccard oracle is probabilistic — a true pair at
    jaccard j escapes all 8 two-row bands with (1-j^2)^8, so equality
    eventually flakes as the true-pair count grows. The invariants
    that CANNOT flake:

    - soundness: every emitted pair passed the exact-Jaccard verify,
      so lsh ⊆ exact must hold exactly (a verify bug breaks this);
    - bounded completeness: observed misses stay within a generous
      multiple of the corpus's own expected-miss budget
      Σ (1-j²)^8 over the true pairs (a banding/candidate bug drops
      MANY pairs and blows through it; P(misses > 10·E + 3) is a
      vanishing Poisson tail);
    - miss profile: any escaped pair sits near the threshold — a
      j ≥ 0.95 pair escapes with p ≤ 8e-9, so a high-j miss means a
      candidate-generation bug, not banding luck.
    """
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dedup(docs, threshold=0.8).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(doc_shingles(docs), threshold=0.8).collect()
    }
    assert exact, "gate corpus has no true near-dup pairs"
    assert lsh <= set(exact), (
        f"unsound pairs (failed exact verify): {sorted(lsh - set(exact))[:5]}"
    )
    misses = set(exact) - lsh
    expected = sum((1.0 - j * j) ** 8 for j in exact.values())
    budget = 10.0 * expected + 3.0
    assert len(misses) <= budget, (
        f"{len(misses)} misses vs banding budget {budget:.2f} "
        f"(expected {expected:.3f} over {len(exact)} true pairs)"
    )
    for pair in misses:
        assert exact[pair] < 0.95, (
            f"high-jaccard pair {pair} (j={exact[pair]:.3f}) escaped "
            "banding — candidate generation bug, not banding luck"
        )


def test_knn_lsh_recall_against_brute_force(spark):
    emb = load_table(spark, SF_TEST, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, [0, 1, 2, 3, 4], k=10).collect()
    }
    # bucketed pairs at a loose threshold; count how many exact top-k
    # pairs fall in a shared bucket (recall of the candidate stage)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_bucketed_pairs(emb, threshold=-1.0).collect()
    }
    sym = pairs | {(b, a) for a, b in pairs}
    hit = sum(1 for p in exact if p in sym)
    recall = hit / len(exact)
    # 8 tables x 4 planes: candidate recall should be solid even for
    # the moderate-cosine neighbors this corpus has
    assert recall >= 0.6, f"candidate recall {recall:.2f} too low"


def test_multimodal_features_shape_and_determinism(spark):
    docs = load_table(spark, SF_TEST, "documents").limit(64)
    feats = extract_features(assets_from_documents(docs))
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert len(rows) == 64
    for r in rows.values():
        assert len(r["feature"]) == 8
        assert r["byte_len"] > 0
    # byte_len must equal UTF-8 octet length of the source text
    expected = {
        r["doc_id"]: r["blen"]
        for r in docs.select(
            "doc_id", F.octet_length("text").alias("blen")
        ).collect()
    }
    for did, blen in expected.items():
        assert rows[did]["byte_len"] == blen
    # repartitioning must not change results (Arrow batch independence)
    again = {
        r["asset_id"]: r["feature"]
        for r in extract_features(
            assets_from_documents(docs).repartition(7)
        ).collect()
    }
    for did, r in rows.items():
        assert again[did] == r["feature"]


def test_stub_raises_without_decoder(spark):
    docs = load_table(spark, SF_TEST, "documents").limit(2)
    feats = extract_features(assets_from_documents(docs), decode_stub=False)
    with pytest.raises(Exception, match="NotImplementedError|real media"):
        feats.collect()


def test_hll_sketch_estimates_within_error(spark):
    """Sketch uniques (the Redis-PFADD analogue) must land within a
    few percent of exact, and the global rollup must come from the
    per-key sketches (doc_key = -1 row)."""
    from click_streaming_data_pipeline_spark.plans import QUERIES

    rows = {
        r["doc_key"]: r
        for r in QUERIES["hll_sketch_views"].fn(spark, SF_TEST).collect()
    }
    exact = {
        r["doc_key"]: r["unique_views"]
        for r in QUERIES["doc_views"].fn(spark, SF_TEST).collect()
    }
    assert -1 in rows
    for k, want in exact.items():
        got = rows[k]["unique_views"]
        assert abs(got - want) <= max(2, 0.05 * want), (k, got, want)


def test_ivf_recall_against_brute_force(spark):
    from click_streaming_data_pipeline_spark.extensions.ivf import ivf_topk

    emb = load_table(spark, SF_TEST, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, [0, 1, 2, 3, 4], k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, [0, 1, 2, 3, 4], k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 16 centroids / probe 4 => reads ~25% of the corpus; near-random
    # embeddings make this the hard case - still expect most of top-10
    assert recall >= 0.5, f"IVF recall {recall:.2f} too low"


def test_ivf_deterministic(spark):
    from click_streaming_data_pipeline_spark.extensions.ivf import ivf_topk

    emb = load_table(spark, SF_TEST, "embeddings")
    a = sorted(map(tuple, ivf_topk(emb, [0, 1], k=5).collect()))
    b = sorted(map(tuple, ivf_topk(emb, [0, 1], k=5).collect()))
    assert a == b


def test_ivf_sampled_training_knobs(spark):
    """Sampled training (id % mod) is deterministic and its centroids
    still power a sane search; auto-K follows sqrt(N)."""
    from click_streaming_data_pipeline_spark.extensions.ivf import (
        auto_k,
        ivf_topk,
        train_kmeans,
    )

    assert auto_k(1_000) == 32
    assert auto_k(1_000_000) == 256  # clamped at K_MAX
    assert auto_k(10) == 4  # floor
    emb = load_table(spark, SF_TEST, "embeddings")
    c1 = train_kmeans(emb, k=8, sample_mod=4)
    c2 = train_kmeans(emb, k=8, sample_mod=4)
    assert c1 == c2  # deterministic under sampling
    assert len(c1) == 8
    full = train_kmeans(emb, k=8, sample_mod=1)
    assert [cid for cid, _ in full] == [cid for cid, _ in c1]
    # sampled-centroid search still returns k results per query
    got = ivf_topk(emb, [0, 1], k=5, centroids=c1, nprobe=4).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(per_q) == {0, 1}
    assert all(len(v) == 5 for v in per_q.values())


def test_streaming_neardup_equals_batch(spark):
    from click_streaming_data_pipeline_spark.extensions.dedup_streaming import (
        run_streaming_neardup,
    )

    docs = load_table(spark, SF_TEST, "documents")
    batch = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dedup(docs, threshold=0.8).collect()
    }
    streamed = {
        (r["id_a"], r["id_b"])
        for r in run_streaming_neardup(spark, SF_TEST).collect()
    }
    assert streamed == batch
    assert batch  # non-trivial corpus


def test_streaming_neardup_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a micro-batch with the
    same batch_id must not change the stores or the pair set."""
    from click_streaming_data_pipeline_spark.extensions.dedup_streaming import (
        process_batch,
    )

    docs = load_table(spark, SF_TEST, "documents")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    stores = dict(
        shingle_store=str(tmp_path / "sh"),
        postings_store=str(tmp_path / "post"),
        pairs_store=str(tmp_path / "pairs"),
        threshold=0.8,
    )
    process_batch(b0, batch_id=0, **stores)
    process_batch(b1, batch_id=1, **stores)
    pairs_once = sorted(
        map(tuple, spark.read.parquet(stores["pairs_store"]).collect())
    )
    sh_once = spark.read.option("recursiveFileLookup", "true").parquet(
        stores["shingle_store"]
    ).count()
    # replay batch 1 (simulated failure recovery)
    process_batch(b1, batch_id=1, **stores)
    pairs_twice = sorted(
        map(tuple, spark.read.parquet(stores["pairs_store"]).collect())
    )
    sh_twice = spark.read.option("recursiveFileLookup", "true").parquet(
        stores["shingle_store"]
    ).count()
    assert pairs_twice == pairs_once and pairs_once
    assert sh_twice == sh_once


def test_quantize_embeddings_bounds_and_error(spark):
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        QMAX,
        quantize_embeddings,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    emb = load_table(spark, SF_TEST, "embeddings")
    out = quantize_embeddings(emb).collect()
    assert len(out) == emb.count()
    # codes live in the symmetric int8 range and use most of it
    assert all(-QMAX <= r["q_lo"] <= r["q_hi"] <= QMAX for r in out)
    assert min(r["q_lo"] for r in out) == -QMAX  # some dim hits its min
    assert max(r["q_hi"] for r in out) == QMAX  # and its max
    # reconstruction error bound: per element <= range_d/(2*254);
    # bound the mean by the widest dim's step
    rows = emb.select(F.col("embedding").cast("array<double>").alias("v")).collect()
    dims = len(rows[0]["v"])
    widest = max(
        max(r["v"][d] for r in rows) - min(r["v"][d] for r in rows)
        for d in range(dims)
    )
    step = widest / 254
    assert all(0.0 <= r["recon_mae"] <= step / 2 + 1e-12 for r in out)
    # deterministic: identical digests across independent runs
    again = {r["vec_id"]: r["q_digest"] for r in quantize_embeddings(emb).collect()}
    assert {r["vec_id"]: r["q_digest"] for r in out} == again


def test_pq_codes_bounds_and_determinism(spark):
    from click_streaming_data_pipeline_spark.extensions.pq import (
        K_CODES,
        M_SUB,
        pq_encode,
        train_pq_codebooks,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    emb = load_table(spark, SF_TEST, "embeddings")
    cbs = train_pq_codebooks(emb)
    assert len(cbs) == M_SUB and all(len(cb) == K_CODES for cb in cbs)
    enc = pq_encode(emb, cbs).collect()
    assert len(enc) == emb.count()
    for r in enc:
        assert len(r["codes"]) == M_SUB
        assert all(0 <= c < K_CODES for c in r["codes"])
        # unit vectors, per-element squared error well under signal
        assert 0.0 <= r["recon_mse"] < 0.05
    # deterministic end-to-end: retrain + re-encode reproduces codes
    again = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, train_pq_codebooks(emb)).collect()
    }
    assert {r["vec_id"]: list(r["codes"]) for r in enc} == again


def test_pq_adc_recall_and_rerank(spark):
    from click_streaming_data_pipeline_spark.extensions.pq import (
        pq_topk,
        train_pq_codebooks,
    )
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        brute_force_topk,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    emb = load_table(spark, SF_TEST, "embeddings")
    cbs = train_pq_codebooks(emb)
    qids = [0, 1, 2, 3, 4]
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, qids, k=10).collect()
    }
    reranked = pq_topk(emb, qids, k=10, codebooks=cbs).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in reranked}
    recall = len(bf & got) / len(bf)
    assert recall >= 0.8, recall  # measured 0.90; margin for corpus drift
    # the exact-rerank stage orders by true cosine descending
    by_q = {}
    for r in reranked:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert all(
            a["cos"] >= b["cos"] for a, b in zip(rows, rows[1:])
        )
    # raw ADC is strictly coarser but never empty
    raw = pq_topk(emb, qids, k=10, codebooks=cbs, rerank=0).collect()
    raw_recall = len(bf & {(r["query_id"], r["neighbor_id"]) for r in raw}) / len(bf)
    assert 0.0 < raw_recall <= recall


def test_sample_frames_semantics(spark):
    from click_streaming_data_pipeline_spark.extensions.multimodal import (
        sample_frames,
    )

    rows = [
        (1, "video/mp4", b"a" * 100),   # 4 frames of 32 -> idx 0 (every=4)
        (2, "video/mp4", b"b" * 300),   # 10 frames -> idx 0, 4, 8
        (3, "video/mp4", b""),          # empty blob -> no frames
        (4, "video/mp4", b"c" * 33),    # 2 frames -> idx 0 only; tail frame len 1
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, content binary"
    )
    got = sample_frames(assets).collect()
    by_asset = {}
    for r in got:
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert sorted(by_asset) == [1, 2, 4]
    assert [r["frame_idx"] for r in sorted(by_asset[2], key=lambda r: r["frame_idx"])] == [0, 4, 8]
    # frame 8 of asset 2: bytes 256..287 -> full 32; sum = 32*98 % 997
    f8 = next(r for r in by_asset[2] if r["frame_idx"] == 8)
    assert f8["frame_len"] == 32 and f8["frame_sum"] == (32 * ord("b")) % 997
    assert by_asset[1][0]["frame_sum"] == (32 * ord("a")) % 997
    # every=1 emits ALL frames including the short tail
    all_frames = sample_frames(assets, every=1).collect()
    a4 = sorted(
        (r for r in all_frames if r["asset_id"] == 4),
        key=lambda r: r["frame_idx"],
    )
    assert [(r["frame_idx"], r["frame_len"]) for r in a4] == [(0, 32), (1, 1)]
    # stub gate: decode_stub=False raises where the decoder would run
    import pytest as _pytest

    with _pytest.raises(Exception):
        sample_frames(assets, decode_stub=False).collect()


def test_pagerank_matches_python_oracle(spark):
    """Spark PageRank == a pure-python implementation of the same
    simplified variant (weighted shares, dangling mass dropped),
    within float tolerance; ranks are bit-stable across runs."""
    from click_streaming_data_pipeline_spark.extensions.graph import (
        DAMPING,
        N_ITER,
        pagerank,
        transition_edges,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    edges_df = transition_edges(load_table(spark, SF_TEST, "events"))
    edges = [(r["src"], r["dst"], r["n_transitions"]) for r in edges_df.collect()]
    got = {r["node"]: r["rank"] for r in pagerank(edges_df).collect()}

    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(N_ITER):
        in_sum = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            in_sum[d] += rank[s] * (w / out_w[s])
        rank = {
            v: (1 - DAMPING) / n + DAMPING * in_sum[v] for v in nodes
        }
    assert set(got) == set(rank)
    for v in nodes:
        assert abs(got[v] - rank[v]) < 1e-9, v
    # probability-ish mass: positive ranks, total <= 1 (dangling leak)
    assert all(r > 0 for r in got.values())
    assert sum(got.values()) <= 1.0 + 1e-9
    # deterministic across independent runs (decimal sums): exact bits
    again = {r["node"]: r["rank"] for r in pagerank(edges_df).collect()}
    assert got == again


def test_ivf_pq_recall(spark):
    """The composed layout must keep most of brute force's top-10
    while touching only probed partitions' codes."""
    from click_streaming_data_pipeline_spark.extensions.pq import ivf_pq_topk
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        brute_force_topk,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    emb = load_table(spark, SF_TEST, "embeddings")
    qids = [0, 1, 2, 3, 4]
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, qids, k=10).collect()
    }
    rows = ivf_pq_topk(emb, qids, k=10).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(bf & got) / len(bf)
    assert recall >= 0.7, recall  # measured 0.86; margin for drift
    assert all(r["adc_dist"] is not None for r in rows)
    # per-query exact-rerank ordering holds
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rank"])
        assert all(a["cos"] >= b["cos"] for a, b in zip(rs, rs[1:]))


def test_audio_energy_windows_semantics(spark):
    from click_streaming_data_pipeline_spark.extensions.multimodal import (
        audio_energy,
    )

    rows = [
        (1, "audio/wav", b"a" * 40),  # windows at 0 (32 bytes), 16 (24), 32 (8)
        (2, "audio/wav", b""),        # empty blob -> no windows
        (3, "audio/wav", b"z" * 8),   # single short window
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, content binary"
    )
    got = audio_energy(assets).collect()
    a1 = sorted(
        (r for r in got if r["asset_id"] == 1), key=lambda r: r["win_idx"]
    )
    # overlapping hop-16/win-32 windows over 40 bytes
    assert [(r["win_idx"], r["win_len"]) for r in a1] == [
        (0, 32), (1, 24), (2, 8),
    ]
    sq = ord("a") * ord("a")
    assert [r["energy"] for r in a1] == [
        (32 * sq) % 9973, (24 * sq) % 9973, (8 * sq) % 9973,
    ]
    assert not [r for r in got if r["asset_id"] == 2]
    a3 = [r for r in got if r["asset_id"] == 3]
    assert len(a3) == 1 and a3[0]["win_len"] == 8
    assert a3[0]["energy"] == (8 * ord("z") * ord("z")) % 9973
    # overlap property: consecutive windows share win-hop bytes, so
    # a constant blob gives monotone-equal energies until the tail
    import pytest as _pytest

    with _pytest.raises(Exception):
        audio_energy(assets, decode_stub=False).collect()


def test_minhash_array_path_equals_explode_path(spark):
    """The transform-array signature path must produce bit-identical
    signatures to the explode+groupBy path (regression: the binary-
    lambda index capture silently replaced the seed prefix with a
    plan-internal variable name, making the hash family depend on
    expression numbering)."""
    from click_streaming_data_pipeline_spark.extensions.dedup import (
        doc_shingles,
        minhash_signatures,
        minhash_signatures_from_docs,
    )

    docs = load_table(spark, SF_TEST, "documents")
    a = minhash_signatures(doc_shingles(docs))
    b = minhash_signatures_from_docs(docs)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_semdedup_matches_python_replay(spark):
    """semdedup's cluster assignment + keep-lowest rule must be
    replayable in pure python/numpy from the same centroids."""
    import numpy as np

    from click_streaming_data_pipeline_spark.extensions.ivf import (
        train_kmeans,
    )
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        SEMDEDUP_COS,
        semdedup,
    )

    emb = load_table(spark, SF_TEST, "embeddings")
    got = {
        r["vec_id"]: (r["cluster_id"], r["is_kept"], r["dup_of"])
        for r in semdedup(emb).collect()
    }

    cents = train_kmeans(emb)
    C = {cid: np.array(v) for cid, v in cents}
    rows = emb.select("vec_id", "embedding").collect()
    V = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in rows}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assign = {}
    for i, v in V.items():
        best = max(C, key=lambda c: (cos(v, C[c]), -c))
        assign[i] = best
    clusters = {}
    for i, c in assign.items():
        clusters.setdefault(c, []).append(i)
    for i in V:
        assert assign[i] == got[i][0], f"cluster mismatch vec {i}"
    for c, members in clusters.items():
        for i in members:
            sims = [
                j for j in members
                if j < i and cos(V[i], V[j]) >= SEMDEDUP_COS
            ]
            kept, dup_of = got[i][1], got[i][2]
            assert kept == (not sims), f"keep mismatch vec {i}"
            if sims:
                assert dup_of == min(sims), f"dup_of mismatch vec {i}"
    # non-trivial: at least one drop on the gate corpus
    assert any(not k for _, k, _ in got.values())


@pytest.mark.slow
def test_semdedup_streamed_equals_batch(spark):
    """Incremental SemDeDup drained over micro-batches must equal the
    all-batch result row-for-row (same clusters, keeps, lineage)."""
    from click_streaming_data_pipeline_spark.extensions.dedup_streaming import (
        run_streaming_semdedup,
    )
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        semdedup,
    )

    emb = load_table(spark, SF_TEST, "embeddings")
    batch = sorted(map(tuple, semdedup(emb).collect()))
    streamed = sorted(
        map(tuple, run_streaming_semdedup(spark, SF_TEST).collect())
    )
    assert streamed == batch

    # mega-cluster tile split (round 6): a tile edge far below the
    # cluster sizes forces every accumulated side through multi-block
    # cogroups; the drained result must not move a single row
    tiled = sorted(
        map(
            tuple,
            run_streaming_semdedup(spark, SF_TEST, tile_rows=7).collect(),
        )
    )
    assert tiled == batch


@pytest.mark.slow
def test_ann_recall_report_matches_recompute(spark):
    """The recall report must equal an independent python recompute
    from the methods' own top-k outputs (and keep the known floors)."""
    from click_streaming_data_pipeline_spark.extensions.ivf import ivf_topk
    from click_streaming_data_pipeline_spark.extensions.pq import (
        ivf_pq_topk,
        pq_topk,
    )
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        brute_force_topk,
    )
    from click_streaming_data_pipeline_spark.plans import QUERIES

    emb = load_table(spark, SF_TEST, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, qids, k=10).collect()
    }
    got = {
        r["method"]: (r["n_hits"], r["recall"])
        for r in QUERIES["ann_recall_report"].fn(spark, SF_TEST).collect()
    }
    for name, fn in (
        ("ivf", ivf_topk),
        ("pq_adc", pq_topk),
        ("ivf_pq", ivf_pq_topk),
    ):
        mine = {
            (r["query_id"], r["neighbor_id"])
            for r in fn(emb, qids, k=10).collect()
        }
        hits = len(mine & exact)
        assert got[name] == (hits, hits / len(exact)), name
    assert got["brute_force"] == (len(exact), 1.0)
    assert got["ivf"][1] >= 0.8 and got["ivf_pq"][1] >= 0.8


def test_prefix_filter_equals_allpairs_jaccard(spark):
    """Prefix filtering is LOSSLESS: the candidate scheme may not drop
    any pair the all-pairs join finds, at any threshold — including
    low thresholds where prefixes get long and doc-size ratios widen."""
    from click_streaming_data_pipeline_spark.extensions.dedup import (
        prefix_filter_pairs,
    )

    sh = doc_shingles(load_table(spark, SF_TEST, "documents")).localCheckpoint(
        eager=True
    )
    for t in (0.8, 0.5):
        exact = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 12))
            for r in jaccard_pairs(sh, threshold=t, max_df=None).collect()
        }
        pf = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 12))
            for r in prefix_filter_pairs(sh, threshold=t).collect()
        }
        assert exact, "corpus should contain planted near-dups"
        assert pf == exact, f"t={t}: {pf ^ exact}"


def test_kmv_sketch_merge_validity_and_error(spark):
    """KMV invariants on the events corpus: (1) merging two keys'
    sketches (k smallest of the union of k-min sets) equals the
    sketch built directly from the unioned hash sets — the mergeable-
    state contract; (2) distinct estimates land within the estimator's
    error bounds; (3) pairwise Jaccard estimates track the exact
    set Jaccard."""
    from click_streaming_data_pipeline_spark.extensions.sketch import (
        KMV_K,
        kmv_estimates,
        kmv_hash,
        kmv_pairwise_overlap,
        kmv_sketch,
    )

    events = load_table(spark, SF_TEST, "events")
    sk = kmv_sketch(events, "event_type", "user_id")
    rows = sk.collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["event_type"], []).append(r["u"])

    hashed = events.select(
        "event_type", kmv_hash(F.col("user_id")).alias("u")
    ).distinct()
    full = {}
    for r in hashed.collect():
        full.setdefault(r["event_type"], set()).add(r["u"])

    keys = sorted(by_key)
    for a in keys:
        assert sorted(by_key[a]) == sorted(full[a])[: KMV_K], a
        for b in keys:
            if a >= b:
                continue
            merged = sorted(set(by_key[a]) | set(by_key[b]))[:KMV_K]
            direct = sorted(full[a] | full[b])[:KMV_K]
            assert merged == direct, (a, b)

    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in kmv_estimates(sk, "event_type").collect():
        n = exact[r["event_type"]]
        assert abs(r["est_distinct"] - n) <= max(3.0, 0.4 * n), r

    users = {}
    for r in events.select("event_type", "user_id").distinct().collect():
        users.setdefault(r["event_type"], set()).add(r["user_id"])
    for r in kmv_pairwise_overlap(sk, "event_type").collect():
        ua, ub = users[r["key_a"]], users[r["key_b"]]
        true_j = len(ua & ub) / len(ua | ub)
        assert abs(r["est_jaccard"] - true_j) <= 0.25, (r, true_j)


def test_substring_spans_planted_duplicates(spark):
    from click_streaming_data_pipeline_spark.extensions.dedup import (
        duplicate_substring_spans,
    )

    run = " ".join(f"tok{i}" for i in range(12))  # exactly one window
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {run} gamma delta"),
            (2, f"{run} unrelated tail words here"),
            (3, "a totally different document with no shared spans at all"),
        ],
        "doc_id long, text string",
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_substring_spans(docs, window=12).collect()
    }
    # doc 1: run starts at token 3 (1-based), doc 2: at token 1
    assert spans == {1: (3, 15, 12), 2: (1, 13, 12)}


def test_substring_spans_merge_overlapping_windows(spark):
    from click_streaming_data_pipeline_spark.extensions.dedup import (
        duplicate_substring_spans,
    )

    # 16 shared tokens => 5 overlapping 12-token windows in each doc,
    # which must merge into ONE maximal span of 16 tokens.
    run = " ".join(f"tok{i}" for i in range(16))
    docs = spark.createDataFrame(
        [(1, f"{run} x y z"), (2, f"p q {run}")],
        "doc_id long, text string",
    )
    rows = duplicate_substring_spans(docs, window=12).collect()
    spans = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in rows}
    assert len(rows) == 2  # one merged span per doc, not 5
    assert spans == {1: (1, 17), 2: (3, 19)}


def test_pgm_decode_real_parser_and_deadletter(spark):
    """The PGM lane does REAL format parsing: valid synthetic images
    decode to exact pixel stats; malformed blobs (bad magic, truncated
    payload, comment-bearing header, oversized maxval) produce
    decode_ok=false dead-letter rows, never exceptions."""
    from click_streaming_data_pipeline_spark.extensions.multimodal import (
        _parse_pgm,
        decode_pgm,
    )

    # direct parser checks
    ok = _parse_pgm(b"P5\n3 2\n255\nABCDEF")
    assert ok is not None
    w, h, maxval, px = ok
    assert (w, h, maxval) == (3, 2, 255)
    assert px.tolist() == [[65, 66, 67], [68, 69, 70]]
    assert _parse_pgm(b"P6\n3 2\n255\nABCDEF") is None  # wrong magic
    assert _parse_pgm(b"P5\n3 2\n255\nABC") is None  # truncated
    assert _parse_pgm(b"P5\n# c\n3 2\n255\nABCDEF") is None  # comment
    assert _parse_pgm(b"P5\n3 2\n70000\nABCDEF") is None  # maxval
    assert _parse_pgm(b"P5\n0 2\n255\n") is None  # degenerate dims

    # end-to-end: one valid, one corrupt
    assets = spark.createDataFrame(
        [(1, bytearray(b"P5\n3 1\n255\nXYZ")), (2, bytearray(b"garbage"))],
        "asset_id long, content binary",
    )
    rows = {r["asset_id"]: r for r in decode_pgm(assets).collect()}
    assert rows[1]["decode_ok"] and rows[1]["px_sum"] == 88 + 89 + 90
    assert rows[1]["width"] == 3 and rows[1]["height"] == 1
    assert not rows[2]["decode_ok"] and rows[2]["px_sum"] is None


def test_wav_decode_real_parser_and_deadletter(spark):
    """RIFF walker: valid synthesized WAVs decode exactly; corrupt
    magic/size/format variants dead-letter."""
    import struct

    from click_streaming_data_pipeline_spark.extensions.multimodal import (
        _parse_wav,
        decode_wav,
        synth_wav_assets,
    )

    def wav(data: bytes, rate=8000, bits=8, channels=1, fmt_code=1):
        fmt = struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, fmt_code, channels,
            rate, rate, 1, bits,
        )
        payload = fmt + struct.pack("<4sI", b"data", len(data)) + data
        return struct.pack("<4sI4s", b"RIFF", 4 + len(payload), b"WAVE") + payload

    ok = _parse_wav(wav(b"AZ"))
    assert ok is not None and ok[0] == 8000
    assert ok[1].tolist() == [65, 90]
    assert _parse_wav(b"RIFX" + wav(b"AZ")[4:]) is None  # magic
    assert _parse_wav(wav(b"AZ")[:-1]) is None  # size mismatch
    assert _parse_wav(wav(b"AZ", bits=16)) is None  # unsupported bits
    assert _parse_wav(wav(b"AZ", channels=2)) is None  # stereo
    assert _parse_wav(wav(b"AZ", fmt_code=3)) is None  # non-PCM

    # synth -> decode round-trip equals direct text stats
    docs = spark.createDataFrame(
        [(1, "abc"), (2, "Z")], "doc_id long, text string"
    )
    rows = {
        r["asset_id"]: r
        for r in decode_wav(synth_wav_assets(docs)).collect()
    }
    assert rows[1]["decode_ok"] and rows[1]["n_samples"] == 3
    assert rows[1]["amp_sum"] == ord("a") + ord("b") + ord("c")
    assert rows[1]["amp_sumsq"] == sum(ord(c) ** 2 for c in "abc")
    assert rows[2]["amp_min"] == rows[2]["amp_max"] == 90


def test_y4m_decode_real_parser(spark):
    """Y4M walker: valid streams decode per-frame; bad magic, missing
    FRAME marker, truncated plane, and non-mono colorspace reject."""
    from click_streaming_data_pipeline_spark.extensions.multimodal import (
        _parse_y4m,
        decode_y4m,
        synth_y4m_assets,
    )

    good = b"YUV4MPEG2 W4 H1 F25:1 Cmono\nFRAME\nABCDFRAME\nWXYZ"
    ok = _parse_y4m(good)
    assert ok is not None
    w, h, frames = ok
    assert (w, h, len(frames)) == (4, 1, 2)
    assert frames[0].tolist() == [65, 66, 67, 68]
    assert _parse_y4m(b"YUV4MPEG3" + good[9:]) is None
    assert _parse_y4m(good.replace(b"Cmono", b"C420")) is None
    assert _parse_y4m(good[:-1]) is None  # truncated plane
    assert _parse_y4m(
        b"YUV4MPEG2 W4 H1 F25:1 Cmono\nXRAME\nABCD"
    ) is None

    docs = spark.createDataFrame(
        [(1, "0123456789abcdef0123456789abcdefZZ")],
        "doc_id long, text string",
    )
    rows = decode_y4m(synth_y4m_assets(docs)).collect()
    # 34 chars -> 2 full 16-byte frames, tail dropped
    assert len(rows) == 2
    assert rows[0]["luma_sum"] == sum(ord(c) for c in "0123456789abcdef")


def test_png_all_filters_roundtrip_and_deadletter(spark):
    from click_streaming_data_pipeline_spark.extensions.multimodal import (
        _parse_png,
        decode_png,
        encode_png_gray8,
    )

    rows = [bytes((i * 31 + r * 7) % 256 for i in range(40)) for r in range(5)]
    blob = encode_png_gray8(rows, filters=[0, 1, 2, 3, 4])
    w, h, px = _parse_png(blob)
    assert (w, h) == (40, 5)
    assert all(bytes(px[i]) == rows[i] for i in range(5))

    corrupt = bytearray(blob)
    corrupt[-5] ^= 0xFF  # break IEND CRC
    truncated = blob[: len(blob) // 2]
    assets = spark.createDataFrame(
        [(1, bytearray(blob)), (2, corrupt), (3, bytearray(truncated))],
        "asset_id long, content binary",
    )
    got = {r.asset_id: r.decode_ok for r in decode_png(assets).collect()}
    assert got == {1: True, 2: False, 3: False}


@pytest.mark.slow
def test_incremental_cluster_fold_merges_components_across_batches(
    spark, tmp_path
):
    # batches 1 and 2 build two separate components; batch 3's single
    # bridging edge must merge them into one — via the star-forest
    # state, never re-reading the earlier edges
    from click_streaming_data_pipeline_spark.extensions.dedup_streaming import (
        fold_cluster_state,
    )

    store = str(tmp_path / "clusters")

    def pairs(rows):
        return spark.createDataFrame(rows, "id_a long, id_b long")

    fold_cluster_state(spark, store, pairs([(1, 2), (2, 3)]), 0)
    fold_cluster_state(spark, store, pairs([(10, 11)]), 1)
    mid = {
        (r["doc_id"], r["cluster_id"])
        for r in spark.read.parquet(f"{store}/v1").collect()
    }
    assert mid == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    fold_cluster_state(spark, store, pairs([(3, 10)]), 2)
    end = {
        (r["doc_id"], r["cluster_id"])
        for r in spark.read.parquet(f"{store}/v2").collect()
    }
    assert end == {(1, 1), (2, 1), (3, 1), (10, 1), (11, 1)}
    # replay of batch 2 (at-least-once) re-derives identical state
    fold_cluster_state(spark, store, pairs([(3, 10)]), 2)
    again = {
        (r["doc_id"], r["cluster_id"])
        for r in spark.read.parquet(f"{store}/v2").collect()
    }
    assert again == end
    # an empty batch must carry the state forward unchanged
    fold_cluster_state(spark, store, pairs([]), 3)
    assert {
        (r["doc_id"], r["cluster_id"])
        for r in spark.read.parquet(f"{store}/v3").collect()
    } == end


def test_substring_keep_one_preserves_canonical_copy(spark):
    from click_streaming_data_pipeline_spark.extensions.dedup import (
        remove_duplicate_spans,
    )

    shared = " ".join(f"w{i}" for i in range(12))  # one full window
    docs = spark.createDataFrame(
        [
            (1, f"{shared} tail one"),
            (2, f"head two {shared}"),
            (3, f"{shared} tail three"),
            (4, "completely unrelated text with no duplicate window"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            docs, window=12, min_docs=2, keep_first=True
        ).collect()
    }
    # canonical doc 1 keeps everything; 2 and 3 lose the shared window
    assert out[1]["cleaned_text"] == f"{shared} tail one"
    assert out[2]["cleaned_text"] == "head two"
    # doc 3 also shares the "...w11 tail" window with doc 1, so the
    # merged span swallows "tail" too
    assert out[3]["cleaned_text"] == "three"
    assert out[4]["n_tokens_after"] == out[4]["n_tokens_before"]
    # remove-everywhere policy cuts it from doc 1 as well
    all_cut = {
        r["doc_id"]: r["cleaned_text"]
        for r in remove_duplicate_spans(
            docs, window=12, min_docs=2, keep_first=False
        ).collect()
    }
    assert all_cut[1] == "one"


def test_mmr_rerank_diversifies(spark):
    """MMR semantics the value oracle can't show: a redundant
    candidate that plain top-k would keep is displaced by a more
    diverse one, the first pick is the relevance argmax, and no
    pick repeats."""
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        mmr_rerank,
    )

    # query 0 on the x axis; candidates 1/2 are near-identical twins
    # (sim ~ 0.99997, both rel ~ 0.98), 3 is a different direction
    # with decent relevance, 4 trails
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.98, 0.20, 0.0]),
        (2, [0.98, 0.21, 0.0]),
        (3, [0.70, -0.70, 0.15]),
        (4, [0.40, 0.10, 0.90]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # lam=0.5 weighs redundancy heavily enough that the twin of the
    # first pick scores NEGATIVE (0.5*0.978 - 0.5*0.99997 < 0)
    out = mmr_rerank(emb, [0], n_candidates=4, k=3, lam=0.5, mu=0.5).collect()
    by_rank = {r["rnk"]: r for r in sorted(out, key=lambda r: r["rnk"])}
    assert len(by_rank) == 3
    # rank 1 = pure relevance argmax = candidate 1
    assert by_rank[1]["vec_id"] == 1
    # pure top-k would put the twin (2) second; MMR displaces it with
    # the diverse candidate 3
    assert by_rank[2]["vec_id"] == 3
    picked = [r["vec_id"] for r in out]
    assert len(picked) == len(set(picked))
    # deterministic under resharding
    again = mmr_rerank(
        emb.repartition(5), [0], n_candidates=4, k=3, lam=0.5, mu=0.5
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


import pytest as _pytest


@_pytest.mark.parametrize("seed", [7, 23, 91])
def test_mmr_oracle_fuzz_random_corpora(spark, seed, tmp_path):
    """Fuzz the recursive-CTE MMR oracle: on random corpora the
    greedy loop's every pick must still match DuckDB bit-for-bit
    (the driver only exercises one corpus; near-ties in the
    marginal-score argmax are where an oracle bug would hide)."""
    import random

    import duckdb

    from click_streaming_data_pipeline_spark.plans import QUERIES

    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(8)], i % 3)
        for i in range(15)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    emb.write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")

    q = QUERIES["rag_mmr_rerank"]
    df = q.fn(spark, sf)
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; glob the part files for DuckDB
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf}/embeddings.parquet/*.parquet'"
    )
    from .conftest import assert_df_matches_oracle

    assert_df_matches_oracle(df, con, q.oracle)
    con.close()


def test_resize_png_nearest_neighbor_semantics(spark):
    """Pin the integer NN map on a known 4x4 image -> 2x2 picks rows
    {0,2} x cols {0,2}; corrupt blobs dead-letter with the original
    bytes; the resized blob is itself a decodable spec PNG."""
    from click_streaming_data_pipeline_spark.extensions.multimodal import (
        _parse_png,
        decode_png,
        encode_png_gray8,
        resize_png_gray8,
    )

    img = [bytes([r * 16 + c for c in range(4)]) for r in range(4)]
    good = encode_png_gray8(img)
    assets = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a png"))],
        "asset_id long, content binary",
    )
    out = {
        r["asset_id"]: r
        for r in resize_png_gray8(assets, out_h=2, out_w=2).collect()
    }
    assert out[1]["resize_ok"] and out[1]["out_w"] == 2
    assert not out[2]["resize_ok"]
    assert bytes(out[2]["content"]) == b"not a png"  # dead-letter
    w, h, px = _parse_png(bytes(out[1]["content"]))
    assert (w, h) == (2, 2)
    # src = (dst * 4) // 2 -> rows/cols {0, 2}
    assert [list(r) for r in px] == [[0x00, 0x02], [0x20, 0x22]]
    # and the resized asset flows through the decode lane
    dec = decode_png(
        spark.createDataFrame(
            [(1, bytearray(bytes(out[1]["content"])))],
            "asset_id long, content binary",
        )
    ).collect()[0]
    assert dec["decode_ok"] and dec["px_sum"] == 0x00 + 0x02 + 0x20 + 0x22


def test_lsh_boilerplate_df_cap_bounds_candidates(spark):
    """SCALING probe r4 finding: a corpus-wide boilerplate shingle
    whose hash wins a minhash seed puts EVERY doc carrying it into one
    band bucket — the candidate self-join goes quadratic in the
    boilerplate's df. The max_df signature guard must (a) keep the
    candidate count bounded on such a corpus and (b) still find a
    planted true near-dup pair through its unique content shingles."""
    import random

    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.extensions.dedup import (
        band_postings,
        doc_shingle_hashes,
        minhash_lsh_dedup,
        minhash_signatures_fast,
        pairs_from_postings,
    )

    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(5000)]
    boiler = "terms of service apply all rights reserved contact us here"
    rows = []
    for i in range(600):
        unique = " ".join(rng.choice(vocab) for _ in range(30))
        # boilerplate first: its shingles are shared by ALL docs
        rows.append((f"d{i:04d}", f"{boiler} {unique}"))
    # planted near-dup pair: same unique content, one word changed
    base = " ".join(rng.choice(vocab) for _ in range(40))
    rows.append(("dup_a", f"{boiler} {base}"))
    rows.append(("dup_b", f"{boiler} {base} extraword"))
    docs = spark.createDataFrame(rows, "doc_id string, text string")

    # without the guard the boilerplate bucket is corpus-sized
    sh = doc_shingle_hashes(docs)
    raw_cand = pairs_from_postings(
        band_postings(minhash_signatures_fast(sh))
    ).count()
    assert raw_cand > 10_000  # quadratic: ~600^2/2 boilerplate pairs

    # with the guard (cap far below the corpus size) candidates are
    # bounded and the planted pair still verifies
    out = minhash_lsh_dedup(docs, threshold=0.8, max_df=64)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert ("dup_a", "dup_b") in pairs
    capped_cand = pairs_from_postings(
        band_postings(
            minhash_signatures_fast(
                sh.join(
                    sh.groupBy("h1", "h2")
                    .agg(F.count("*").alias("f"))
                    .filter(F.col("f") <= 64)
                    .select("h1", "h2"),
                    ["h1", "h2"],
                )
            )
        )
    ).count()
    assert capped_cand < raw_cand / 20


def test_assign_join_path_matches_literal(spark):
    """The broadcast-join assign (K > ASSIGN_LITERAL_MAX) must agree
    with the literal-array assign row for row — same max-cosine,
    ties-to-smaller-cid semantics, different physical shape."""
    from click_streaming_data_pipeline_spark.extensions import ivf
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    emb = load_table(spark, SF_TEST, "embeddings").select(
        "vec_id", "embedding"
    )
    cents = ivf.train_kmeans(emb)
    literal = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf._assign(emb, cents, "embedding").collect()
    }
    prev = ivf.ASSIGN_LITERAL_MAX
    ivf.ASSIGN_LITERAL_MAX = 0  # force the join path
    try:
        joined = {
            r["vec_id"]: r["centroid_id"]
            for r in ivf._assign(emb, cents, "embedding").collect()
        }
    finally:
        ivf.ASSIGN_LITERAL_MAX = prev
    assert literal == joined


@pytest.mark.slow
def test_local_kmeans_matches_spark_loop_bit_for_bit(spark):
    """The driver-local trainer (one collect, zero per-iteration jobs)
    must replay the distributed loop EXACTLY: shared assign-kernel
    math plus a shortest-repr HALF_UP decimal re-centering. Any
    float inequality here breaks the DuckDB oracle replay of every
    trained-index lane."""
    from click_streaming_data_pipeline_spark.extensions.ivf import (
        train_kmeans,
    )

    emb = load_table(spark, SF_TEST, "embeddings")
    assert train_kmeans(emb, k=8, driver_local=True) == train_kmeans(
        emb, k=8, driver_local=False
    )
    # sampled training takes the same fork
    assert train_kmeans(
        emb, k=6, sample_mod=4, driver_local=True
    ) == train_kmeans(emb, k=6, sample_mod=4, driver_local=False)


def test_local_kmeans_parity_on_degenerate_vectors(spark):
    """NULL vectors and NaN elements: both trainer paths must agree on
    the zeros-substitution assign rule AND on NULL-skipping decimal
    sums (NULL/NaN cast to decimal NULL even under ANSI). A ragged
    (short) vector kills the distributed loop's ANSI re-center with
    INVALID_ARRAY_INDEX — the local path raises the same way."""
    import pytest as _pytest

    from click_streaming_data_pipeline_spark.extensions.ivf import (
        train_kmeans,
    )

    rows = [
        (i, [float((i * 7 + j) % 5) / 3.0 + 0.1 for j in range(4)])
        for i in range(18)
    ]
    rows += [
        (18, None),                               # NULL vector
        (19, [0.1, float("nan"), 0.3, 0.4]),      # NaN element
        # 5-dim vs centroid dim 4: zeros-substituted in assign; the
        # sum leg reads only positions 0..3, so no ANSI index error
        (20, [0.2, 0.3, 0.4, 0.5, 9.9]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert train_kmeans(emb, k=5, driver_local=True) == train_kmeans(
        emb, k=5, driver_local=False
    )

    ragged = spark.createDataFrame(
        rows[:18] + [(18, [0.5, 0.25])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(Exception, match="INVALID_ARRAY_INDEX"):
        train_kmeans(ragged, k=5, driver_local=True)
    with _pytest.raises(Exception, match="INVALID_ARRAY_INDEX"):
        train_kmeans(ragged, k=5, driver_local=False)


def test_local_pq_codebooks_match_spark_loop_bit_for_bit(spark):
    from click_streaming_data_pipeline_spark.extensions.pq import (
        train_pq_codebooks,
    )

    emb = load_table(spark, SF_TEST, "embeddings")
    assert train_pq_codebooks(emb, driver_local=True) == train_pq_codebooks(
        emb, driver_local=False
    )


def test_dec_units_matches_spark_cast(spark):
    """_dec_units is the driver-side twin of cast(double as
    decimal(38,18)): spot-check against the JVM on adversarial values
    (shortest-repr vs binary-expansion divergers, HALF_UP boundaries,
    subnormal-ish exponents)."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.extensions.ivf import (
        _dec_units,
    )

    vals = [
        0.1, 0.3, 1.0 / 3.0, 2.0**-30, 123.456, 1e-19, 7e-18, 5e-30,
        -0.1, -2.0**-30, 0.0, -0.0, 1.5e-18, 2.5e-18, -2.5e-18,
        9.9999999999999e19 / 1e19, 12345.678901234567, 1e17,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.select(
        F.col("x").cast("decimal(38,18)").alias("d")
    ).collect()
    for v, r in zip(vals, got):
        jvm = None if r["d"] is None else int(
            Decimal(str(r["d"])).scaleb(18)
        )
        assert _dec_units(v) == jvm, f"divergence at {v!r}"

    # the int-parser implementation vs BOTH a Decimal-quantize
    # reference AND the running JVM's cast on a seeded random sweep
    # across magnitudes. The JVM leg pins the repr(float) ==
    # Double.toString assumption (shortest repr, guaranteed JDK 19+;
    # legacy pre-Ryu FloatingDecimal emits non-shortest reprs for
    # rare doubles — ADVICE r6, observed live on this JDK 17 at
    # 8.078571431197864e+18): any divergence must (a) come from a
    # round-trip-equal non-shortest JVM repr, never a parse bug, and
    # (b) be absorbed by the dec_rows path the trainers actually use
    # (test_local_kmeans_parity_on_repr_divergent_values).
    import random
    from decimal import ROUND_HALF_UP, localcontext

    rng = random.Random(42)
    sweep = (
        [rng.uniform(-2.0, 2.0) for _ in range(300)]
        + [rng.uniform(-1e19, 1e19) for _ in range(50)]
        + [rng.random() * 10.0 ** rng.randint(-25, 19) for _ in range(200)]
        + [8.078571431197864e18]  # known JDK-17 non-shortest repr
    )
    in_range = []
    for v in sweep:
        with localcontext() as ctx:
            ctx.prec = 60
            ref = int(
                Decimal(repr(float(v))).scaleb(18).to_integral_value(
                    rounding=ROUND_HALF_UP
                )
            )
        if abs(ref) >= 10**38:
            continue
        assert _dec_units(v) == ref, f"int parser diverges at {v!r}"
        in_range.append(v)
    jdf = spark.createDataFrame([(v,) for v in in_range], "x double")
    jgot = jdf.select(
        F.col("x").cast("decimal(38,18)").alias("d"),
        F.col("x").cast("string").alias("s"),
    ).collect()
    with localcontext() as ctx:
        ctx.prec = 60
        for v, r in zip(in_range, jgot):
            jvm = None if r["d"] is None else int(Decimal(str(r["d"])).scaleb(18))
            if _dec_units(v) == jvm:
                continue
            # divergence: legal ONLY for a non-shortest JVM repr that
            # still round-trips to the same double (count mantissa
            # digits — exponent spelling differs: 'e+18' vs 'E18')
            def _ndigits(s):
                return sum(c.isdigit() for c in s.lower().partition("e")[0])

            assert float(r["s"]) == v and _ndigits(r["s"]) > _ndigits(
                repr(v)
            ), (
                f"JVM cast diverges at {v!r} with a SHORTEST JVM repr "
                f"{r['s']!r} — parse bug, not a JDK repr artifact"
            )
            # and the JVM's own string must reproduce the JVM units
            # under the same HALF_UP quantize the parser implements
            ref_from_jvm_str = int(
                Decimal(r["s"]).scaleb(18).to_integral_value(
                    rounding=ROUND_HALF_UP
                )
            )
            assert ref_from_jvm_str == jvm, f"quantize drift at {v!r}"


def test_partial_topk_combiner_exactness(spark):
    """The map-side top-k combiner must be invisible: window-ranked
    output over the combined frame == over the raw frame, including
    NaN (Spark-greatest), -0.0 == 0.0, and tie-break rows straddling
    partition boundaries."""
    from pyspark.sql.window import Window

    from click_streaming_data_pipeline_spark.operators.topk import (
        partial_topk_per_key,
    )

    rows = []
    for q in (1, 2):
        for i in range(200):
            rows.append((q, i, float((i * 37) % 19) / 7.0))
        rows += [
            (q, 900, float("nan")),      # NaN: greatest, first under DESC
            (q, 901, -0.0),              # -0.0 ties 0.0; id breaks it
            (q, 902, 0.0),
            (q, 903, 2.7142857142857144),  # exact duplicates of a top
            (q, 904, 2.7142857142857144),  # value: tie rows
        ]
    df = spark.createDataFrame(
        rows, "query_id int, neighbor_id int, cos double"
    ).repartition(16)  # ties and NaN scattered across partitions

    def ranked(frame, desc):
        order = (
            [F.col("cos").desc(), F.col("neighbor_id").asc()]
            if desc
            else [F.col("cos").asc(), F.col("neighbor_id").asc()]
        )
        w = Window.partitionBy("query_id").orderBy(*order)
        return sorted(
            # repr-compare: tuple equality would fail on nan != nan
            repr(tuple(r))
            for r in frame.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 12)
            .collect()
        )

    for desc in (True, False):
        combined = partial_topk_per_key(
            df, order_col="cos", descending=desc, k=12, compact_at=64
        )
        assert ranked(combined, desc) == ranked(df, desc)


def test_pq_query_prep_kernel_matches_literal_expressions(spark):
    """The Arrow query-prep kernel replaced the codebook/centroid
    LITERAL trees on the ANN query side; the lanes' DuckDB oracles pin
    parity on well-formed data, so this pins the degenerate inputs the
    oracles never see: NULL vector, short vector (partial subspaces ->
    NULL dtab entries), long vector (unit-normalized over its own
    length), NaN element, all-zeros."""
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.extensions.ivf import (
        _centroid_array_col,
        train_kmeans,
    )
    from click_streaming_data_pipeline_spark.extensions.pq import (
        _as_double,
        _codebook_lit,
        _l2sq,
        _pq_prep_queries,
        _unit,
        train_pq_codebooks,
    )
    from click_streaming_data_pipeline_spark.sources import load_table as _lt

    emb = _lt(spark, SF_TEST, "embeddings")
    books = train_pq_codebooks(emb)
    cents = train_kmeans(emb, k=8)
    m, ds = len(books), len(books[0][0])
    nprobe = max(1, len(cents) // 2)

    base = [r["embedding"] for r in emb.limit(3).collect()]
    rows = [(i, v) for i, v in enumerate(base)] + [
        (10, None),
        (11, base[0][:30]),                       # short: ragged subspaces
        (12, base[1] + [0.25, -0.5, 0.75]),       # long: norm over 67 dims
        (13, [float("nan")] + base[2][1:]),       # NaN element
        (14, [0.0] * 64),                         # zero vector
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # --- legacy literal path, reconstructed exactly as the old code
    cb = _codebook_lit(books)
    carr = _centroid_array_col(cents)
    q = df.select("vec_id", _unit(_as_double(F.col("embedding"))).alias("qv"))

    def _dtab_m(mi):
        sub_q = F.slice("qv", mi * ds + 1, ds)
        return F.transform(F.element_at(cb, mi + 1), lambda c: _l2sq(sub_q, c))

    lit = (
        q.withColumn("dtab", F.array(*[_dtab_m(mi) for mi in range(m)]))
        .withColumn(
            "__ranked",
            F.reverse(
                F.array_sort(
                    F.transform(
                        carr,
                        lambda c: F.struct(
                            F.coalesce(
                                F.aggregate(
                                    F.zip_with(
                                        F.col("qv"),
                                        c["cvec"],
                                        lambda x, y: x * y,
                                    ),
                                    F.lit(0.0),
                                    lambda a, x: a + x,
                                )
                                / F.nullif(
                                    F.sqrt(
                                        F.aggregate(
                                            F.transform(
                                                F.col("qv"), lambda x: x * x
                                            ),
                                            F.lit(0.0),
                                            lambda a, x: a + x,
                                        )
                                    )
                                    * F.sqrt(
                                        F.aggregate(
                                            F.transform(
                                                c["cvec"], lambda x: x * x
                                            ),
                                            F.lit(0.0),
                                            lambda a, x: a + x,
                                        )
                                    ),
                                    F.lit(0.0),
                                ),
                                F.lit(0.0),
                            ).alias("cos"),
                            (-c["cid"]).alias("neg_cid"),
                            c["cid"].alias("cid"),
                        ),
                    )
                )
            ),
        )
        .withColumn(
            "probe",
            F.transform(
                F.slice(F.col("__ranked"), 1, nprobe), lambda s: s["cid"]
            ),
        )
        .select("vec_id", "dtab", "probe")
    )

    ker = _pq_prep_queries(
        df, books, cents, nprobe, id_col="vec_id", vec_col="embedding"
    )

    want = {r["vec_id"]: (repr(r["dtab"]), repr(r["probe"])) for r in lit.collect()}
    got = {r["query_id"]: (repr(r["dtab"]), repr(r["probe"])) for r in ker.collect()}
    assert got == want


def test_local_kmeans_big_magnitude_exact_path(spark):
    """Element magnitudes beyond ~4.61 overflow the two-limb int64
    fast path (|units| >= 2**62), flipping _units_matrix to the
    python-int exact path — which must still replay the distributed
    loop bit-for-bit. Magnitudes here reach 1e6 (units ~1e24)."""
    from click_streaming_data_pipeline_spark.extensions.ivf import (
        _units_matrix,
        train_kmeans,
    )

    rows = [
        (
            i,
            [
                ((i * 13 + j * 7) % 11 - 5) * 1.0e6 + float(j) / 3.0
                for j in range(4)
            ],
        )
        for i in range(24)
    ]
    _, _, big = _units_matrix([r[1] for r in rows], 4)
    assert big, "fixture must actually trigger the big path"
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert train_kmeans(emb, k=4, driver_local=True) == train_kmeans(
        emb, k=4, driver_local=False
    )


def test_ensure_partial_limit_guards_above_threshold(spark):
    """Above spark.sql.optimizer.windowGroupLimitThreshold (default
    1000) the optimizer plans NO partial phase, so the guard must
    insert the Arrow combiner — and the guarded result must equal the
    bare window's. Below the threshold it must be a no-op."""
    from pyspark.sql.window import Window

    from click_streaming_data_pipeline_spark.operators.topk import (
        ensure_partial_limit,
    )

    df = spark.range(5000).select(
        (F.col("id") % 3).alias("query_id"),
        F.col("id").alias("neighbor_id"),
        ((F.col("id") * 37 % 1009) / 7.0).alias("cos"),
    ).repartition(8)
    small = ensure_partial_limit(df, order_col="cos", descending=True, k=10)
    assert small is df  # no-op within the threshold
    big = ensure_partial_limit(df, order_col="cos", descending=True, k=1200)
    assert big is not df
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )

    def topk(frame):
        return sorted(
            map(
                tuple,
                frame.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 1200)
                .collect(),
            )
        )

    assert topk(big) == topk(df)


def test_partial_topk_plain_handles_nulls_like_spark(spark):
    """NULL order values (md5 of a NULL id), NULL tie values and NULL
    keys must rank exactly as Spark's window defaults (asc: NULLS
    FIRST) — a NULL-source row forms its own window partition, a NULL
    doc_id consumes rank 1 of its source. The combiner previously
    raised TypeError on the first such row."""
    from pyspark.sql.window import Window

    from click_streaming_data_pipeline_spark.operators.topk import (
        partial_topk_per_key,
    )

    rows = [(i, f"src{i % 3}") for i in range(60)]
    rows += [(900, None), (None, "src0"), (None, None)]
    df = (
        spark.createDataFrame(rows, "doc_id long, source string")
        .withColumn("__h", F.md5(F.col("doc_id").cast("string")))
        .repartition(8)
    )
    comb = partial_topk_per_key(
        df, key="source", order_col="__h", descending=False,
        tie_col="doc_id", k=5, plain=True, compact_at=16,
    )
    w = Window.partitionBy("source").orderBy(F.col("__h"), F.col("doc_id"))

    def ranked(frame):
        return sorted(
            repr(tuple(r))
            for r in frame.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .collect()
        )

    assert ranked(comb) == ranked(df)


def test_partial_topk_double_handles_null_order_like_spark(spark):
    """NULL order values in the DOUBLE comparator (pq_topk's adc_dist
    is NULL for NULL/short query vectors) must take Spark's NULL
    placement — first under ASC, last under DESC — not rank as
    Spark-NaN (greatest). Before the fix, to_numpy folded NULL into
    NaN and the combiner could drop rows the downstream window keeps
    (ADVICE r6)."""
    from pyspark.sql.window import Window

    from click_streaming_data_pipeline_spark.operators.topk import (
        partial_topk_per_key,
    )

    rows = []
    for q in (1, 2):
        for i in range(80):
            rows.append((q, i, float((i * 37) % 19) / 7.0))
        rows += [
            (q, 900, None),             # NULL: first asc / last desc
            (q, 901, None),
            (q, 902, float("nan")),     # NaN: last asc / first desc
            (q, 903, -0.0),
            (q, 904, 0.0),
        ]
    df = spark.createDataFrame(
        rows, "query_id int, neighbor_id int, cos double"
    ).repartition(16)

    def ranked(frame, desc):
        order = (
            [F.col("cos").desc(), F.col("neighbor_id").asc()]
            if desc
            else [F.col("cos").asc(), F.col("neighbor_id").asc()]
        )
        w = Window.partitionBy("query_id").orderBy(*order)
        return sorted(
            repr(tuple(r))
            for r in frame.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 8)
            .collect()
        )

    for desc in (True, False):
        comb = partial_topk_per_key(
            df, order_col="cos", descending=desc, k=8, compact_at=32
        )
        assert ranked(comb, desc) == ranked(df, desc)


def test_exact_group_means_raises_on_group_sum_overflow():
    """Per-VALUE magnitudes can each fit decimal(38,18) while their
    GROUP SUM overflows it — the distributed ANSI loop raises
    NUMERIC_VALUE_OUT_OF_RANGE on F.sum there, so the driver-local
    trainer must raise too, not silently return a mean (ADVICE r6)."""
    import numpy as np
    import pytest

    from click_streaming_data_pipeline_spark.extensions.ivf import (
        _exact_group_means,
        _units_matrix,
    )

    # 11 values of 1e19 (units 1e37 each, under the 1e38 per-value
    # cap) sum to 1.1e38 units — past decimal(38,18) capacity.
    vecs = [[1.0e19, 1.0] for _ in range(11)]
    U, NN, big = _units_matrix(vecs, 2)
    assert big  # 1e37 units >= 2**62 -> python-int exact path
    gids = np.zeros(len(vecs), dtype=np.int64)
    counts = np.asarray([len(vecs)], dtype=np.int64)
    with pytest.raises(ArithmeticError, match="overflows"):
        _exact_group_means(U, NN, big, gids, counts, 2)

    # the small-magnitude int64 path must also guard (synthetic units
    # just under the per-value cap would need ~10 values; int64 path
    # caps at |units| < 2**62 so a real overflow needs ~2e18 rows —
    # unreachable; assert the guard is still wired by driving the
    # big path with mixed signs staying IN range: no raise)
    vecs_ok = [[1.0e19, 1.0], [-1.0e19, 1.0]]
    U2, NN2, big2 = _units_matrix(vecs_ok, 2)
    out = _exact_group_means(
        U2, NN2, big2, np.zeros(2, np.int64), np.asarray([2]), 2
    )
    assert out[0][0] == 0.0 and out[0][1] == 1.0


def test_local_kmeans_parity_on_repr_divergent_values(spark):
    """8.078571431197864e18 prints differently under Python repr
    (shortest, 16 digits) and JDK 17's legacy Double.toString
    (non-shortest, 17 digits), so its decimal(38,18) cast differs by
    100e-18 between the two parses — the local trainer must still
    replay the distributed loop bit-for-bit, which it does by
    collecting the JVM's own decimal casts (dec_rows) instead of
    re-deriving units from Python repr (ADVICE r6)."""
    from click_streaming_data_pipeline_spark.extensions.ivf import (
        train_kmeans,
    )

    # v0 casts to ...63900 on JDK 17 (JVM repr ...78639E18, 17 digits)
    # but ...64000 under Python repr (...864e+18, 16 digits); w has a
    # 14-digit repr both engines agree on. k=1 puts both in one
    # cluster, where the near-cancellation (v0 - w = 63900 vs 64000)
    # surfaces the 100-unit cast gap as a different MEAN double
    # (15975.0 vs 16000.0) — unless the local trainer sums the JVM's
    # own decimals, which is the fix under test. (On a shortest-repr
    # JDK 19+ both paths agree trivially; the test stays valid.)
    v0 = 8.078571431197864e18
    w = 8.0785714311978e18
    rows = [
        (0, [v0, 1.0]),
        (1, [-w, 2.0]),
        (2, [0.0, 3.0]),
        (3, [0.0, 4.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    local = train_kmeans(emb, k=1, driver_local=True)
    dist = train_kmeans(emb, k=1, driver_local=False)
    assert local == dist


def test_hll_registers_merge_like_pfmerge(spark):
    """HLL register state must be a commutative idempotent monoid
    under elementwise max: sketch(A union B) == merge(sketch(A),
    sketch(B)) exactly — the PFMERGE property the hll_sketch_views
    global rollup and any partial re-aggregation rely on."""
    from click_streaming_data_pipeline_spark.extensions.sketch import (
        hll_registers,
    )

    a = spark.range(0, 4000).select(
        F.lit(1).alias("k"), (F.col("id") * 7 % 2900).alias("user_id")
    )
    b = spark.range(0, 4000).select(
        F.lit(1).alias("k"), (F.col("id") * 11 % 3700 + 1500).alias("user_id")
    )
    ra = hll_registers(a, ["k"], "user_id")
    rb = hll_registers(b, ["k"], "user_id")
    merged = {
        (r["ridx"],): r["rho"]
        for r in ra.unionByName(rb)
        .groupBy("k", "ridx")
        .agg(F.max("rho").alias("rho"))
        .collect()
    }
    union = {
        (r["ridx"],): r["rho"]
        for r in hll_registers(a.unionByName(b), ["k"], "user_id").collect()
    }
    assert merged == union


def test_hll_estimate_raw_branch_accuracy(spark):
    """Past 2.5*m uniques the estimator leaves linear counting for the
    raw harmonic branch — pin its accuracy there (rsd ~3.25 % at
    m=1024; allow 4 sigma) and that the branch actually flips."""
    from click_streaming_data_pipeline_spark.extensions.sketch import (
        HLL_M,
        hll_estimate,
        hll_registers,
    )

    n = 50_000
    df = spark.range(0, n).select(
        F.lit(1).alias("k"), F.col("id").alias("user_id")
    )
    est = hll_estimate(hll_registers(df, ["k"], "user_id"), ["k"]).collect()
    got = est[0]["unique_views"]
    assert got > 2.5 * HLL_M  # raw branch territory
    rsd = 1.04 / (HLL_M ** 0.5)
    assert abs(got - n) <= 4 * rsd * n, got


def test_int8_prefilter_recall_against_brute_force(spark):
    """SQ prefilter + exact rerank: with a 50-wide shortlist over a
    ~4k corpus the exact top-10 should survive the int8 coarse pass
    almost entirely (reconstruction error ~ range/254 per dim)."""
    from click_streaming_data_pipeline_spark.extensions.similarity import (
        brute_force_topk,
        int8_prefilter_topk,
    )

    emb = load_table(spark, SF_TEST, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, [0, 1, 2, 3, 4], k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in int8_prefilter_topk(emb, [0, 1, 2, 3, 4], k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"int8-prefilter recall {recall:.2f} too low"
    # reranked scores are EXACT cosines: any overlapping pair agrees
    ex = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in brute_force_topk(emb, [0, 1, 2, 3, 4], k=10).collect()
    }
    ap = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in int8_prefilter_topk(emb, [0, 1, 2, 3, 4], k=10).collect()
    }
    for key in exact & approx:
        assert ex[key] == ap[key], key


def test_ivf_append_equals_bulk_assign(spark, tmp_path):
    """append_ivf_index(delta) after save_ivf_index(initial) must
    yield the identical search results as assigning the FULL corpus
    against the same frozen centroids in one pass — append is pure
    ingestion, not a semantic fork — and appended (odd-id) vectors
    must actually be retrievable."""
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.extensions.ivf import (
        append_ivf_index,
        ivf_index_topk,
        ivf_topk,
        load_ivf_centroids,
        save_ivf_index,
    )

    emb = load_table(spark, SF_TEST, "embeddings")
    idx = str(tmp_path / "index")
    save_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), idx)
    append_ivf_index(emb.filter(F.col("vec_id") % 2 == 1), idx)
    queries = emb.filter(F.col("vec_id").isin([0, 1, 2, 3, 4])).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
    )
    got = {
        (r["query_id"], r["neighbor_id"], r["cos"])
        for r in ivf_index_topk(spark, idx, queries, k=10).collect()
    }
    # bulk twin: same frozen centroids, whole corpus assigned at once
    cents = load_ivf_centroids(spark, idx)
    want = {
        (r["query_id"], r["neighbor_id"], r["cos"])
        for r in ivf_topk(
            emb, [0, 1, 2, 3, 4], k=10, centroids=cents
        ).collect()
    }
    assert got == want
    assert any(n % 2 == 1 for _q, n, _c in got), (
        "no appended (odd-id) vector ever surfaces in the top-10 — "
        "append is not being searched"
    )


def test_ivf_streaming_ingest_replay_safe(spark, tmp_path):
    """append_ivf_index_batch must be idempotent under micro-batch
    REPLAY (foreachBatch is at-least-once): re-running a batch
    rewrites its own corpus/batch=N directory instead of
    double-appending, so the drained index equals the once-each run
    exactly — and equals the frozen-codebook bulk assignment."""
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.extensions.ivf import (
        append_ivf_index_batch,
        ivf_index_topk,
        ivf_topk,
        load_ivf_centroids,
        save_ivf_centroids,
    )

    emb = load_table(spark, SF_TEST, "embeddings")
    idx = str(tmp_path / "index")
    save_ivf_centroids(emb.filter(F.col("vec_id") % 2 == 0), idx)
    b0 = emb.filter(F.col("vec_id") % 3 == 0)
    b1 = emb.filter(F.col("vec_id") % 3 == 1)
    b2 = emb.filter(F.col("vec_id") % 3 == 2)
    append_ivf_index_batch(b0, idx, 0)
    append_ivf_index_batch(b1, idx, 1)
    append_ivf_index_batch(b1, idx, 1)  # replayed micro-batch
    append_ivf_index_batch(b2, idx, 2)
    queries = emb.filter(F.col("vec_id").isin([0, 1, 2, 3, 4])).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
    )
    got = {
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in ivf_index_topk(spark, idx, queries, k=10).collect()
    }
    cents = load_ivf_centroids(spark, idx)
    want = {
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in ivf_topk(
            emb, [0, 1, 2, 3, 4], k=10, centroids=cents
        ).collect()
    }
    assert got == want


def test_verify_units_rows_certifies_and_detects(spark):
    """The per-row JVM hash that rides the training collect must (a)
    certify clean samples — returning units identical to a direct
    _dec_units derivation, null vectors as None — and (b) return None
    (triggering the JVM-decimal re-collect) when any element's
    Python-repr units disagree with the JVM's decimal cast."""
    from click_streaming_data_pipeline_spark.extensions.ivf import (
        _dec_units,
        _verify_units_rows,
        _with_dec_hash,
    )

    df = spark.createDataFrame(
        [(0, [0.1, 2.5]), (1, [1e-30, -3.75]), (2, None)],
        "vec_id long, v array<double>",
    )
    rows = _with_dec_hash(df, "vec_id").collect()
    rows.sort(key=lambda r: r["vec_id"])
    units = _verify_units_rows(rows, "vec_id")
    if units is not None:  # repr-divergent JDKs legitimately return None
        assert units[0] == [_dec_units(0.1), _dec_units(2.5)]
        assert units[2] is None
    # a poisoned element (units off by one) must always fail the hash
    import copy

    bad = [r.asDict() for r in rows]

    class R(dict):
        def __getitem__(self, k):
            return dict.__getitem__(self, k)

    bad_rows = [R(d) for d in copy.deepcopy(bad)]
    bad_rows[0]["v"] = [0.1, 2.5 + 1e-9]
    assert _verify_units_rows(bad_rows, "vec_id") is None


def test_compact_ivf_index_flattens_batches_identically(spark, tmp_path):
    """Compacting a streaming-built IVF index must (a) produce the
    flat centroid_id=* layout with one file per centroid dir, (b)
    leave no batch= subtrees, and (c) change NOTHING about query
    results."""
    import os

    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.extensions.ivf import (
        append_ivf_index_batch,
        compact_ivf_index,
        ivf_index_topk,
        save_ivf_centroids,
    )

    emb = load_table(spark, SF_TEST, "embeddings")
    idx = str(tmp_path / "index")
    save_ivf_centroids(emb.filter(F.col("vec_id") % 2 == 0), idx)
    for b in range(3):
        append_ivf_index_batch(
            emb.filter(F.col("vec_id") % 3 == b), idx, b
        )
    queries = emb.filter(F.col("vec_id").isin([0, 1, 2, 3, 4])).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
    )
    before = {
        tuple(r)
        for r in ivf_index_topk(spark, idx, queries, k=10).collect()
    }
    compact_ivf_index(spark, idx)
    corpus = os.path.join(idx, "corpus")
    subdirs = sorted(os.listdir(corpus))
    assert not any(d.startswith("batch=") for d in subdirs)
    cdirs = [d for d in subdirs if d.startswith("centroid_id=")]
    assert cdirs, subdirs
    for d in cdirs:
        files = [
            f
            for f in os.listdir(os.path.join(corpus, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)
    after = {
        tuple(r)
        for r in ivf_index_topk(spark, idx, queries, k=10).collect()
    }
    assert after == before


def test_arrow_unit_lists_decodes_decimal128_exactly(spark):
    """r8: the trainer collect ships decimal(38,18) casts as raw
    decimal128 arrays; the int64 fast path must equal the exact
    Decimal slow path, and both must equal _dec_units of the doubles,
    across negatives, None rows/elements, empty vectors, and values
    past the int64 limb (forcing the slow path)."""
    from click_streaming_data_pipeline_spark.extensions.ivf import (
        _arrow_unit_lists,
        _dec_units,
        _with_dec_arrays,
    )

    vecs = [
        [0.1, -2.5, 0.0, 1e-18],
        None,
        [],
        [123.456, -0.000001],
        # |units| ~ 1.1e19 > 2**63: decimal128 high limb in use
        [11.0e0 * 2**60, -3.25],
        [float("nan"), 1.0],  # NaN casts to NULL element
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id int, v array<double>"
    )
    tbl = _with_dec_arrays(df, "v").toArrow()
    got = _arrow_unit_lists(tbl.column("__jvm_dec_a"))
    ids = tbl.column("id").to_pylist()
    want_by_id = {
        0: [_dec_units(x) for x in vecs[0]],
        1: None,
        2: [],
        3: [_dec_units(x) for x in vecs[3]],
        4: [_dec_units(x) for x in vecs[4]],
        5: [None, _dec_units(1.0)],
    }
    assert got == [want_by_id[i] for i in ids]
    # sliced-array offset handling: decode a mid-table slice
    sl = tbl.column("__jvm_dec_a").combine_chunks().slice(2, 2)
    got_slice = _arrow_unit_lists(sl)
    by_id = dict(zip(ids, got))
    assert got_slice == [by_id[i] for i in ids[2:4]]


def test_minmax_stats_matches_expression_aggs(spark):
    """r8: the quantize stats kernel must reproduce
    F.min/F.max(element_at(v, i)) — NULL rows skipped — and route
    NaN/NULL-element corpora into non-finite bounds (the expression
    fallback trigger)."""
    import math

    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.extensions.similarity import (
        _minmax_stats,
    )

    dim = 3
    rows = [
        ([1.5, -2.0, 0.25],),
        (None,),
        ([-7.0, 4.0, 0.25],),
        ([0.5, 0.0, -0.125],),
    ]
    df = spark.createDataFrame(rows, "v array<double>")
    mins, maxs = _minmax_stats(df, dim)
    srow = df.agg(
        F.array(
            *[F.min(F.element_at("v", i + 1)) for i in range(dim)]
        ).alias("mins"),
        F.array(
            *[F.max(F.element_at("v", i + 1)) for i in range(dim)]
        ).alias("maxs"),
    ).collect()[0]
    assert mins == list(srow["mins"])
    assert maxs == list(srow["maxs"])
    # NaN element => non-finite bounds => caller falls back
    dfn = spark.createDataFrame(
        [([1.0, float("nan"), 0.0],)], "v array<double>"
    )
    mn, mx = _minmax_stats(dfn, dim)
    assert any(not math.isfinite(x) for x in mn + mx)
    # all-NULL => (None, None), like the empty aggregation
    dfe = spark.createDataFrame([(None,)], "v array<double>")
    assert _minmax_stats(dfe, dim) == (None, None)


def test_cms_estimate_col_replays_join_semantics(spark):
    """r8: the grid-literal CMS estimate must equal the broadcast
    probe-join form cell for cell, and an item probing only absent
    cells must yield NULL (the inner join's dropped row)."""
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.extensions.sketch import (
        _probe_structs,
        cms_build,
        cms_estimate,
        cms_estimate_col,
    )
    from click_streaming_data_pipeline_spark.sources import load_table

    from .conftest import SF_TEST

    events = load_table(spark, SF_TEST, "events")
    sketch = cms_build(events, "user_id")
    items = events.select("user_id").distinct()
    # join-form reference, inlined (the library now uses the literal)
    probes = items.select(
        "user_id",
        F.explode(_probe_structs(F.col("user_id"), 4, 32)).alias("rc"),
    ).select("user_id", "rc.r", "rc.col")
    ref = {
        r["user_id"]: r["cms_est"]
        for r in probes.join(F.broadcast(sketch), ["r", "col"])
        .groupBy("user_id")
        .agg(F.min("n").alias("cms_est"))
        .collect()
    }
    got = {
        r["user_id"]: r["cms_est"]
        for r in cms_estimate(items, sketch, "user_id").collect()
    }
    assert got == ref
    # an empty sketch has no present cells: every estimate is NULL
    empty = sketch.filter(F.lit(False))
    est = cms_estimate_col(empty, F.col("user_id"))
    n = items.withColumn("e", est).filter(F.col("e").isNotNull()).count()
    assert n == 0
