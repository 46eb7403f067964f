"""Corpus-curation operator tests: split determinism/proportions,
quality-heuristic semantics, contamination hits, stratified quotas.
(The exact values are oracle-gated via catalog_corpus; these tests pin
the *semantics* that the oracle can't express.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from click_streaming_data_pipeline_spark.extensions.corpus import (
    contamination_counts,
    dataset_split,
    quality_heuristics,
    stratified_sample_summary,
)
from click_streaming_data_pipeline_spark.sources import load_table

from .conftest import SF_TEST


def test_dataset_split_proportions_and_stability(spark):
    docs = load_table(spark, SF_TEST, "documents")
    split = dataset_split(docs)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    # ~80/10/10 with sampling noise on 500 docs
    assert 0.70 <= counts["train"] / n <= 0.90
    assert counts["val"] / n <= 0.20 and counts["test"] / n <= 0.20
    # stable under repartitioning: assignment depends only on the id
    again = {
        r["doc_id"]: r["split"]
        for r in dataset_split(docs.repartition(7)).collect()
    }
    first = {r["doc_id"]: r["split"] for r in split.collect()}
    assert first == again


def test_quality_heuristics_semantics(spark):
    varied = (
        "the quick brown fox jumps over a lazy dog while seven wizards "
        "brew strong coffee and twelve sailors watch distant ships "
        "cross the calm harbor at dawn"
    )
    rows = [
        (1, varied),  # varied 27-token doc -> passes every gate
        (2, "word " * 400),  # pure repetition -> dup_3gram_frac ~ 1
        (3, "tiny doc"),  # too short
    ]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in quality_heuristics(docs).collect()}
    assert got[2]["dup_3gram_frac"] > 0.9
    assert not got[2]["quality_ok"]  # repetition gate
    assert got[3]["n_tokens"] == 2
    assert not got[3]["quality_ok"]  # length gate
    assert got[1]["quality_ok"]
    assert got[1]["dup_3gram_frac"] == 0.0
    assert got[1]["stopword_frac"] > 0  # 'the'/'a'/'and' present


def test_contamination_counts(spark):
    docs = load_table(spark, SF_TEST, "documents")
    got = {
        r["probe"]: r["n_docs"]
        for r in contamination_counts(
            docs, ["spark", "definitely absent probe"]
        ).collect()
    }
    assert got["spark"] > 0
    assert got["definitely absent probe"] == 0


def test_stratified_sample_quota_monotone(spark):
    docs = load_table(spark, SF_TEST, "documents")
    rep = {
        r["lang"]: r
        for r in stratified_sample_summary(
            docs, {"en": "cd", "es": "40"}
        ).collect()
    }
    # en keeps ~80%, es ~25%; unlisted strata keep nothing
    assert 0.6 <= rep["en"]["n_kept"] / rep["en"]["n_docs"] <= 0.95
    assert rep["es"]["n_kept"] / rep["es"]["n_docs"] <= 0.45
    assert rep["de"]["n_kept"] == 0 and rep["de"]["tokens_kept"] == 0
    assert all(r["tokens_kept"] <= r["tokens_total"] for r in rep.values())
