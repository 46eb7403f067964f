"""Scale-up probe: do the bench plans actually scale linearly?

SCALE.md argues each plan's cost tracks either the corpus (one scan +
partial agg) or a bounded frame (key domain, candidates, sketches).
This probe MEASURES it: it replicates the sf0.1 tables 8x with
disjoint key ranges (a synthetic sf0.8 written as normally-sized
multi-row-group parquet under /tmp — measurement input only, never an
oracle input), runs a representative bench subset at 1x and 8x, and
reports the wall ratio. A plan whose non-scan work is bounded should
come in well under 8x on 32 cores; anything super-linear is a scale
bug to chase.

Usage: python tools/scaling_probe.py   (writes SCALING.md)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = int(os.environ.get("SPARK_GRAFT_REPLICAS", "8"))
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = f"/tmp/csdp_scaling_x{REPLICAS}"

#: per-table key columns to offset so replicas occupy disjoint key
#: ranges (FK pairs share one offset constant, keeping joins exact)
OFFSETS = {
    "events": {"event_id": 10**12, "user_id": 10**7},
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**7},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**7},
    "lineitem": {
        "l_orderkey": 10**9,
        "l_partkey": 10**6,
        "l_suppkey": 10**6,
    },
    "customer": {"c_custkey": 10**7},
    "supplier": {"s_suppkey": 10**6},
    "part": {"p_partkey": 10**6},
    # dimension spine tables are shared, not replicated
    "nation": {},
    "region": {},
}

PROBE_QUERIES = [
    "pricing_summary",
    "doc_views",
    "top_orders",
    "nation_revenue",
    "latest_event_per_user",
    "heavy_hitters_cms",
    "window_tumbling",
    "dp_event_counts",
    "knn_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_substring_spans",
    "fuzzy_name_matches",
    "fuzzy_name_matches_ed2",
    "lm_quality_score",
    "embedding_quantize",
    "rag_mmr_rerank",
    "cep_funnel_regex",
    "pareto_frontier",
    "search_fuzzy",
    "knn_ivf_topk",
    "knn_ivfpq_topk",
    "knn_int8_topk",
    "knn_ivf_append_topk",
    "knn_ivf_ingest_streamed",
    "cdc_kafka_wire_streamed",
    "cdc_kafka_wire_consume_streamed",
    "semdedup_keep",
    # NOT embedding_neardup: that lane IS the documented O(N^2)
    # all-pairs baseline (neardup_pairs docstring); the scale path it
    # verifies against is knn_lsh_pairs
    "knn_lsh_pairs",
    # round-6 window-topk audit lanes: TakeOrdered global top-k and
    # the quota sampler's map-side combine
    "search_bm25_topk",
    "search_hybrid_rrf",
    "mixture_allocation_sample",
]


def build_replicated(spark) -> None:
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.sources.tables import (
        load_table,
    )

    os.makedirs(OUT_DIR, exist_ok=True)
    # SPARK_GRAFT_PROBE_TABLES=embeddings,customer limits the build to
    # the tables the probed queries actually read — a 128x replica of
    # every table is GBs of parquet nothing will scan
    want = os.environ.get("SPARK_GRAFT_PROBE_TABLES")
    tables = (
        {t.strip() for t in want.split(",")} if want else set(OFFSETS)
    )
    for table, offs in OFFSETS.items():
        if table not in tables:
            continue
        dst = os.path.join(OUT_DIR, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        base = load_table(spark, BASE, table)
        if not offs:
            base.write.mode("overwrite").parquet(dst)
            continue
        copies = []
        for i in range(REPLICAS):
            c = base
            for col, step in offs.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * step))
            if table == "documents":
                # verbatim replicas would make every doc a j=1.0
                # near-dup of its 7 clones — quadratic OUTPUT by
                # construction of the copy, not the plan. TAG every
                # token with a per-replica prefix: cross-replica
                # shingle/window overlap collapses while within-replica
                # duplicate structure is preserved, AND each shingle
                # still carries 12 distinct-vocabulary tokens. (The
                # earlier scheme — INSERTING rep{i} between words —
                # halved shingle entropy: every window held only 6 real
                # tokens, so common shingles hit thousands of docs and
                # minhash buckets went quadratic; that was a probe
                # artifact, not a plan property, though it did flush
                # out the engine's missing boilerplate df-cap.)
                c = c.withColumn(
                    "text",
                    F.concat(
                        F.lit(f"r{i}x"),
                        F.regexp_replace("text", " ", f" r{i}x"),
                    ),
                )
            if table == "embeddings" and i > 0:
                # verbatim replicas would make every vector a cos=1.0
                # twin of its clones — quadratic semdedup/near-dup
                # OUTPUT by construction of the copy, not the plan.
                # A per-replica CYCLIC DIMENSION SHIFT is orthogonal:
                # every within-replica cosine is preserved exactly
                # while cross-replica copies decorrelate to ~0.
                # 64 dims allow 64 distinct rotations; replicas past
                # that reuse rotation i % 64 but NEGATE the vector —
                # negation also preserves within-replica cosines
                # (cos(-a,-b) = cos(a,b)) while the reused-rotation
                # twin pair lands at cos = -1, below any positive
                # near-dup threshold. Supports up to 128 replicas.
                rot = i % 64
                shifted = F.concat(
                    F.slice(F.col("embedding"), rot + 1, 64 - rot),
                    F.slice(F.col("embedding"), 1, rot),
                )
                if i >= 64:
                    shifted = F.transform(shifted, lambda x: -x)
                c = c.withColumn("embedding", shifted)
            if table == "customer":
                # same reasoning for the edit-distance lanes: verbatim
                # name clones would be ed=0 matches of their 7 copies
                # (quadratic OUTPUT by construction). A per-replica
                # 3-char-distinct suffix pushes every cross-replica
                # pair to ed>=3 (> both max_dist=1 AND the ed2 lane's
                # radius) while a shared suffix within a replica
                # preserves within-replica distances.
                c = c.withColumn(
                    "c_name",
                    F.concat(F.col("c_name"), F.lit(f"#{i}{i}{i}")),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        # repartition so the copy lands as many right-sized files —
        # the layout a warehouse actually has (the single-row-group
        # driver parquet is the pathological case scan_parallel works
        # around)
        out.repartition(32).write.mode("overwrite").parquet(dst)
        print(f"# built {table} x{REPLICAS}", file=sys.stderr)


def time_query(q, spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from click_streaming_data_pipeline_spark.plans import QUERIES
    from click_streaming_data_pipeline_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("csdp-scaling-probe")
    build_replicated(spark)

    rows = []
    for name in PROBE_QUERIES:
        if only and name not in only:
            continue
        q = QUERIES[name]
        # warm codegen at the smallest SF
        q.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        t1 = time_query(q, spark, BASE)
        t8 = time_query(q, spark, OUT_DIR)
        rows.append((name, t1, t8, t8 / t1))
        print(
            f"# {name}: 1x={t1:.3f}s {REPLICAS}x={t8:.3f}s "
            f"ratio={t8/t1:.2f}",
            file=sys.stderr,
        )
    spark.stop()

    if only or REPLICAS != 8:
        # partial / non-default run: report, never clobber SCALING.md
        print(json.dumps({n: round(r, 2) for n, _, _, r in rows}))
        return

    lines = [
        "# SCALING — measured 1x vs 8x wall clock (local[32])",
        "",
        f"`tools/scaling_probe.py`: the sf0.1 tables replicated "
        f"{REPLICAS}x with disjoint key ranges (multi-row-group "
        "layout, so BOTH sides scan in parallel), best-of-2 per "
        "query. Ratio well under 8 = the non-scan work is bounded "
        "(key domains, candidate frames, sketches) exactly as "
        "SCALE.md claims; ~8 = scan-dominated (linear, the best a "
        "full pass can do); >8 = super-linear scale bug.",
        "",
        "| query | 1x wall (s) | 8x wall (s) | ratio |",
        "|---|---|---|---|",
    ]
    for name, t1, t8, r in rows:
        lines.append(f"| {name} | {t1:.3f} | {t8:.3f} | {r:.2f} |")
    text = "\n".join(lines) + "\n"
    with open("SCALING.md", "w", encoding="utf-8") as fh:
        fh.write(text)
    print(text)
    print(json.dumps({n: round(r, 2) for n, _, _, r in rows}))


if __name__ == "__main__":
    main()
