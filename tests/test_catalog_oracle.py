"""Every catalog query with an oracle must match it exactly at
sf0.001 (the driver runs the same comparison at sf0.01). Queries
without an oracle get a smoke check (runs, stable schema, >=0 rows)."""

from __future__ import annotations

import pytest

from click_streaming_data_pipeline_spark.plans import QUERIES

from .conftest import SF_TEST, assert_df_matches_oracle

#: oracle cases over ~10 s each (measured r8 durations sweep): marked
#: slow so the DEFAULT suite fits the driver's verify window. They
#: still run once per round via `pytest -m slow`, and the driver's own
#: CORRECTNESS sample checks the full catalog independently of pytest.
SLOW_ORACLE = {
    "ann_recall_report",
    "markov_attribution",
    "embedding_random_projection",
    "click_purchase_full_outer_streamed",
    "dedup_clusters_streamed",
    "bpe_encode",
    "cep_funnel_regex_streamed",
    "semdedup_streamed",
}

ORACLE_QUERIES = [
    pytest.param(n, marks=pytest.mark.slow) if n in SLOW_ORACLE else n
    for n in sorted(n for n, q in QUERIES.items() if q.oracle)
]
ROWS_ONLY_QUERIES = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_TEST)
    assert_df_matches_oracle(df, duck, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_TEST)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0
    assert set(se.oracle_sql()) <= set(se.queries())
