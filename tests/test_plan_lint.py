"""Repo-wide plan linter: no catalog query may plan an all-pairs
join (CartesianProduct / BroadcastNestedLoopJoin) or a row-at-a-time
Python UDF unless it is on the explicit allowlist with a documented
reason. This is the automated form of the scale review — a quadratic
plan sneaking into any query fails CI, not a human read of PLANS.md.

Streaming queries are exercised by their own oracle tests (building
them here would run real streams); batch queries only get PLANNED
(executedPlan), so the sweep is cheap.
"""

from __future__ import annotations

import pytest

from click_streaming_data_pipeline_spark.plans import QUERIES

from .conftest import SF_TEST

#: queries allowed to plan an all-pairs join, each with the reason it
#: is deliberate and bounded.
ALLPAIRS_ALLOWED = {
    # exact ANN baseline: tiny broadcast query side x one corpus scan
    "knn_topk",
    # reuses the knn_topk candidate generator (broadcast query side x
    # one corpus scan); everything downstream is bounded by the
    # 20-candidate frame
    "rag_mmr_rerank",
    # 1-row tau-threshold frame broadcast onto the 50-row selected
    # set (the value_histogram bounds pattern)
    "priority_sample_dlt",
    # same shape as knn_topk: broadcast bounded anchor batch x one
    # corpus scan (at corpus-scale anchors the IVF/LSH probes feed it)
    "hard_negative_pairs",
    # keys-squared pair frame over the tiny event_type dimension
    # (sketch-sized inputs, never the corpus)
    "kmv_user_overlap",
    # ADC brute-scan baseline: broadcast query side x coded corpus
    # (IVF-PQ is the scale path)
    "knn_pq_topk",
    # 1-row min/max codebook frame broadcast onto the corpus (the
    # value_histogram bounds pattern) + the 5-row dequantized-query
    # frame broadcast for the shortlist pass (knn_topk's shape)
    "knn_int8_topk",
    # broadcast single-row query embedding x one corpus scan for the
    # dense leg (same shape as knn_topk's anchor batch)
    "search_hybrid_rrf",
    # 1-row bounds/stats frames crossJoined back onto the corpus
    # (broadcast of a single row, not an N^2 pair join)
    "value_histogram",
    "dsir_weights",
    "search_eval_ndcg",
    "rfm_features",
    "item_decay_popularity",
    "association_rules",
    "paginate_orders_keyset",
    "consistent_sample",
    "embedding_quantize",
    "weekly_value_drift",
    "weekly_value_drift_streamed",
    "value_anomalies",
    "hourly_error_spine",
    "value_stats",
    "ab_test_report",
    "table_profile",
    "orders_table_checksum",
    "rich_idle_customers",
    "corpus_health_report",
    "source_mixture_weights",
    "filter_attrition",
    "contamination_check",
    "page_triangles",
    "ann_recall_report",
    "embedding_label_outliers",
    "price_quantity_correlation",
    "priority_order_counts",
    "customer_order_distribution",
    "top_revenue_suppliers",
    "nation_market_share",
    "search_result_count",
    "value_quantiles",
    "value_quantiles_approx",
    # 1-row merged-register estimate x 1-row grand-total frame (the
    # PFMERGE rollup) — constant-size cross, never the corpus
    "hll_sketch_views",
    "heavy_hitters_cms",
    "stratified_sample",
    "dataset_split",
    "lm_quality_score",
    "bigram_fluency",
    "tfidf_keywords",
    "corpus_vocabulary",
    "bpe_merge_ranks",
    "bpe_encode",
    # Theil-Sen: the O(n^2) slope pair join runs on the AGGREGATED
    # day dimension (tens of rows), never the events; the 1-row
    # median/n_days frames broadcast back
    "revenue_trend_theilsen",
    # 1-row (n1, n2) totals frame broadcast onto the CDF step table
    # (distinct-value dimension, not the corpus)
    "value_drift_ks",
    # conformance probe over VALUES literals (3x2 rows): the
    # correlated `<` scalar subquery decorrelates to a non-equi
    # join by definition — constant-size, never touches a table
    "scalar_subquery_semantics",
    # 1-row grand-total frame broadcast onto the corpus (the
    # value_histogram bounds pattern, not an N^2 pair join)
    "pps_systematic_sample",
    # 1-row count frames broadcast onto the ranked dimension (prefix
    # -sum rank replaces the ORDER-BY-only window)
    "revenue_concentration",
    "customer_spend_deciles",
    # Theil-Sen pair frame over the top-100 aggregated token rows,
    # plus 1-row median/vocab-size broadcasts
    "token_zipf_fit",
}

# streaming queries execute real streams in their builder; driver-loop
# queries execute collects — both are covered by the oracle suite, so
# the linter plans only the pure-batch rest.
SKIP_NAMES = {
    "page_rank",
    "page_communities",
    "bpe_merge_ranks",
    "bpe_encode",
    "dedup_clusters",
    "dedup_cluster_sizes",
    "dedup_keep_best",
    "knn_ivf_topk",
    "knn_ivfpq_topk",
    "semdedup_keep",
    "optimize_zorder",
}

BATCH_QUERIES = sorted(
    n
    for n, q in QUERIES.items()
    if "streaming" not in q.tags and n not in SKIP_NAMES
)


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name in BATCH_QUERIES:
        df = QUERIES[name].fn(spark, SF_TEST)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_unapproved_allpairs_join(plans, name):
    plan = plans[name]
    has_allpairs = (
        "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
    )
    if has_allpairs:
        assert name in ALLPAIRS_ALLOWED, (
            f"{name} plans an all-pairs join and is not allowlisted:\n"
            + plan[:2000]
        )


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_row_at_a_time_python_udf(plans, name):
    # BatchEvalPython = per-row Python UDF (the slow path). Arrow
    # forms (ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas)
    # are fine and deliberately used.
    assert "BatchEvalPython" not in plans[name], name


# -- expression-duplication guard (round 4) ---------------------------------
# Filter-pushdown alias substitution can inline an expensive computed
# column's WHOLE tree into predicates/projections once per reference —
# higher-order expressions get no common-subexpression elimination, so
# the tokenizer/regex chain re-evaluates per row per reference
# (measured: 24 split() rebuilds and a 17x wall blow-up in
# corpus_build_pipeline before the explode fence). This guard counts
# expensive-pattern occurrences in the OPTIMIZED plan of the lanes
# that compose quality signals and fails if duplication creeps back.
DUP_GUARD = {
    # name: (pattern, max occurrences in optimizedPlan)
    "corpus_build_pipeline": [("split(", 6), ("regexp_replace", 10)],
    "corpus_export_manifest": [("split(", 6), ("regexp_replace", 10)],
    "filter_attrition": [("split(", 6)],
    "corpus_quality_heuristics": [("split(", 6)],
    "lm_quality_score": [("split(", 4)],
    "pack_sequences": [("split(", 4)],
    "quality_with_fallback": [("regexp_count", 8), ("regexp_replace", 8)],
    "embedding_random_projection": [("transform(", 4)],
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow)
        if n == "embedding_random_projection"
        else n
        for n in sorted(DUP_GUARD)
    ],
)
def test_no_expression_duplication_blowup(spark, name):
    df = QUERIES[name].fn(spark, SF_TEST)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for pattern, cap in DUP_GUARD[name]:
        n = plan.count(pattern)
        assert n <= cap, (
            f"{name}: {pattern!r} appears {n}x in the optimized plan "
            f"(cap {cap}) — expression-duplication blow-up; fence the "
            f"computed columns behind a Generate (see "
            f"extensions/corpus.py::quality_heuristics)"
        )


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_duplicated_python_kernel_eval(plans, name):
    """r8: a filter referencing a Python-UDF output can be pushed
    below the producing projection, making the optimizer evaluate the
    WHOLE kernel twice per row (guide 4.4 — found live on the IVF
    assign kernel and the cosine/LSH verify kernels). Every physical
    plan must evaluate each distinct kernel expression (same function,
    same arguments, same expression id) exactly once."""
    import collections
    import re

    args = re.findall(r"\[(\w+)\(([^\]]*?)\)#(\d+)\]", plans[name])
    cnt = collections.Counter(args)
    dups = {
        k: v
        for k, v in cnt.items()
        if v > 1 and ("kernel" in k[0] or "_fn" in k[0])
    }
    assert not dups, (name, dups)
