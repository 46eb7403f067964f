"""Adversarial-text conformance (VERDICT r3 item 1c): the driver can
regenerate documents.parquet with edge-case texts at any round, and
Spark ``split`` vs DuckDB ``string_split`` are a known divergence risk
on empty/multi-space strings. Run every documents-only oracled query
against a synthetic corpus of exactly those texts and require the
driver-strict value-hash to match — if an engine pair ever disagrees
on '' or '  ', it fails HERE, not in the round gate.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from click_streaming_data_pipeline_spark.plans import QUERIES

from tools.driver_check import value_hash

ADVERSARIAL_DOCS = [
    # (doc_id, text, lang, source)
    ("d00", "", "en", "web"),                       # empty text
    ("d01", " ", "en", "web"),                      # single space
    ("d02", "  ", "en", "web"),                     # double space only
    ("d03", " a", "en", "web"),                     # leading space
    ("d04", "a ", "en", "web"),                     # trailing space
    ("d05", "a  b", "en", "web"),                   # interior run
    ("d06", "the the the", "en", "web"),            # pure repetition
    ("d07", "tab\tand\nnewline chars", "en", "web"),
    ("d08", "café naïve 中文 \U0001f600", "zh", "web"),
    ("d09", "MiXeD CaSe MIXED mixed", "en", "web"),
    ("d10", "a b c d e f g h i j", "en", "web"),    # normal control doc
    ("d11", "the quick brown fox jumps", "en", "pdf"),
    ("d12", "the quick brown fox jumps", "es", "pdf"),  # exact dup, other shard
    ("d13", "z" * 2000, "de", "web"),               # one long token
    ("d14", " ".join(["tok"] * 300), "fr", "web"),  # long repetitive doc
]

# documents-only catalog queries with full value oracles that consume
# the text column (the split/tokenize surface the driver could break)
TEXT_QUERIES = [
    "lm_quality_score",
    "pack_sequences",
    "tfidf_keywords",
    "bigram_fluency",
    "normalize_text",
    "stratified_sample",
    "dedup_exact",
    "dataset_split",
    "token_stats",
    "lang_id",
    "doc_fingerprint",
    # round-4 upgrades: the unrolled BPE oracles exercise per-char
    # indexing (DuckDB w[i] vs Spark split('')) on unicode/emoji and
    # empty/space-only docs — exactly this corpus
    "bpe_merge_ranks",
    "bpe_encode",
]


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adv"))
    rows = [(i, t, lang, src, len(t)) for i, t, lang, src in ADVERSARIAL_DOCS]
    spark.createDataFrame(
        rows,
        "doc_id string, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_adversarial_corpus_matches_oracle(spark, adversarial_dir, name):
    if name not in QUERIES or not QUERIES[name].oracle:
        pytest.skip(f"{name} not in catalog or not oracled")
    sdf = QUERIES[name].fn(spark, adversarial_dir)
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{adversarial_dir}/documents.parquet/*.parquet'"
    )
    cur = con.execute(QUERIES[name].oracle)
    ocols = [d_[0] for d_ in cur.description]
    orows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows), (len(srows), len(orows))
    # None-safe sample ordering: rows may hold NULLs, which plain
    # sorted() can't compare — sort by repr so a real divergence still
    # reports samples instead of dying in the assert message
    assert value_hash(srows, sdf.columns) == value_hash(orows, ocols), (
        f"{name}: engines diverge on adversarial texts; "
        f"spark sample={sorted(srows, key=repr)[:4]} "
        f"oracle sample={sorted(orows, key=repr)[:4]}"
    )


# ---- CDC + wire lanes on hostile texts ---------------------------
#
# The CDC envelope leg serializes text through to_json and (wire
# lanes) RecordBatch v2 + gzip over a socket, then parses it back —
# JSON escaping of tabs/newlines/unicode/emoji and 2000-char tokens
# must survive every hop bit-exactly. The shared fixture's string
# doc_ids don't fit the synth rules (doc_id % 10 drives ops), so
# this fixture re-keys the same hostile texts by integer id, adding
# copies of the unicode and control-char docs at ids the op filter
# KEEPS (8/9 are dropped, 6/7 are updated by the synth rules).

CDC_LANES = [
    "cdc_pipeline",
    "cdc_kafka_wire_streamed",
    "cdc_kafka_wire_consume_streamed",
]


@pytest.fixture(scope="module")
def adversarial_cdc_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adv_cdc"))
    texts = [t for _i, t, _l, _s in ADVERSARIAL_DOCS]
    texts += [
        "café naïve 中文 \U0001f600",   # unicode survives (id 15)
        "tab\tand\nnewline chars",      # control chars survive (16)
        '"quoted" \\ backslash /',      # JSON-escape stress (17)
    ]
    rows = [
        (i, t, "en", "web", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow)
        if n == "cdc_kafka_wire_consume_streamed"
        else n
        for n in CDC_LANES
    ],
)
def test_cdc_and_wire_lanes_on_adversarial_texts(
    spark, adversarial_cdc_dir, name
):
    if name not in QUERIES or not QUERIES[name].oracle:
        pytest.skip(f"{name} not in catalog or not oracled")
    sdf = QUERIES[name].fn(spark, adversarial_cdc_dir)
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{adversarial_cdc_dir}/documents.parquet/*.parquet'"
    )
    oracle = QUERIES[name].oracle
    cur = con.execute(oracle() if callable(oracle) else oracle)
    ocols = [d_[0] for d_ in cur.description]
    orows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows), (len(srows), len(orows))
    assert value_hash(srows, sdf.columns) == value_hash(orows, ocols), (
        f"{name}: engines diverge on adversarial texts through the "
        f"CDC/wire path; spark sample={sorted(srows, key=repr)[:4]} "
        f"oracle sample={sorted(orows, key=repr)[:4]}"
    )
