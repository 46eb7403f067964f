"""Search scoring tests: BM25-idf semantics (term rarity matters,
mirroring ES multi_match scoring, reference search main.py:90-99) and
cross-strategy equivalence of the idf-weighted paths."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from click_streaming_data_pipeline_spark.operators.search import (
    bm25_idf,
    build_inverted_index,
    score_columns,
    search_via_index,
    term_doc_frequencies,
)

from .conftest import SF_TEST  # noqa: F401  (session fixture wiring)


def _toy_docs(spark):
    # 'common' appears in 9/10 docs, 'rare' in 1/10
    rows = [(i, "common filler", "common filler words here") for i in range(9)]
    rows.append((9, "rare filler", "rare filler words here"))
    return spark.createDataFrame(rows, "doc_id long, title string, body string")


def test_idf_ranks_rare_term_over_common(spark):
    docs = _toy_docs(spark)
    n, dfs = term_doc_frequencies(docs, ["common", "rare"])
    assert (n, dfs["common"], dfs["rare"]) == (10, 9, 1)
    idf = {t: bm25_idf(n, dfs[t]) for t in dfs}
    assert idf["rare"] > idf["common"] > 0
    scored = docs.select(
        "doc_id",
        score_columns("title", "body", ["common", "rare"], idf=idf).alias(
            "score"
        ),
    ).collect()
    by_id = {r["doc_id"]: r["score"] for r in scored}
    # same tf pattern (1x title + 1x body), but the rare-term doc must
    # outrank every common-term doc — the whole point of idf
    assert by_id[9] > by_id[0]
    # raw TF scoring cannot distinguish them (control)
    flat = docs.select(
        "doc_id", score_columns("title", "body", ["common", "rare"]).alias("s")
    ).collect()
    flat_by_id = {r["doc_id"]: r["s"] for r in flat}
    assert flat_by_id[9] == flat_by_id[0]


def test_index_strategy_matches_expression_with_idf(spark):
    docs = _toy_docs(spark)
    n, dfs = term_doc_frequencies(docs, ["common", "rare"])
    idf = {t: bm25_idf(n, dfs[t]) for t in dfs}
    expr = {
        r["doc_id"]: r["score"]
        for r in docs.select(
            "doc_id",
            score_columns("title", "body", ["common", "rare"], idf=idf).alias(
                "score"
            ),
        )
        .filter(F.col("score") > 0)
        .collect()
    }
    index = build_inverted_index(docs, fields={"title": 2.0, "body": 1.0})
    via = {
        r["doc_id"]: r["score"]
        for r in search_via_index(index, ["common", "rare"], idf=idf).collect()
    }
    assert expr == via  # bit-identical, not approximately


def test_bm25_idf_formula():
    assert bm25_idf(1000, 1) == math.log(1.0 + (1000 - 1 + 0.5) / 1.5)
    # monotone decreasing in df
    assert bm25_idf(1000, 1) > bm25_idf(1000, 10) > bm25_idf(1000, 999)


def test_phrase_search_semantics(spark):
    """Planted docs: overlapping occurrences, repeated-token phrases,
    phrase at string boundaries, near-miss orderings."""
    from click_streaming_data_pipeline_spark.operators.search import (
        build_positional_index,
        phrase_search,
    )

    rows = [
        (1, "a b c a b c"),      # 'a b c' twice, non-overlapping
        (2, "x x x x"),          # 'x x' three times (overlapping starts)
        (3, "c b a"),            # right tokens, wrong order
        (4, "a b"),              # too short for 'a b c'
    ]
    docs = spark.createDataFrame(rows, "doc_id long, body string")
    idx = build_positional_index(docs)

    got = {r["doc_id"]: r["phrase_freq"] for r in phrase_search(idx, ["a", "b", "c"]).collect()}
    assert got == {1: 2}
    got2 = {r["doc_id"]: r["phrase_freq"] for r in phrase_search(idx, ["x", "x"]).collect()}
    assert got2 == {2: 3}
    got3 = {r["doc_id"]: r["phrase_freq"] for r in phrase_search(idx, ["a", "b"]).collect()}
    assert got3 == {1: 2, 4: 1}


def test_fuzziness_auto_length_ladder(spark):
    """ES fuzziness:AUTO semantics (reference search main.py:96):
    allowed edits follow the QUERY term's length — 0 below 3 chars,
    1 for 3-5, 2 from 6 up. A 6+-char misspelling two edits away must
    match under AUTO but not under a fixed distance of 1."""
    from click_streaming_data_pipeline_spark.operators.search import (
        auto_fuzziness,
        fuzzy_term_frequency,
        tokenize,
    )

    assert [auto_fuzziness(t) for t in ("ab", "abc", "abcde", "abcdef")] == [
        0, 1, 1, 2,
    ]

    rows = [
        (1, "stream processing"),   # 1 edit from 'streem'
        (2, "striim of events"),    # 2 edits from 'streem'
        (3, "scream quietly"),      # 2 edits from 'streem'
        (4, "totally unrelated"),
        (5, "ab cd"),               # short-term probe below
    ]
    docs = spark.createDataFrame(rows, "doc_id long, body string")
    toks = tokenize("body")

    def hits(term, dist=None):
        return {
            r["doc_id"]
            for r in docs.filter(
                fuzzy_term_frequency(toks, term, dist) > 0
            ).collect()
        }

    assert hits("streem") == {1, 2, 3}        # AUTO: 6 chars -> 2 edits
    assert hits("streem", 1) == {1}           # fixed 1 keeps old behavior
    assert hits("ab") == {5}                  # AUTO: <3 chars -> exact only
    assert hits("ac", 1) == {5}               # distance 1 would have matched
    assert hits("ac") == set()                # AUTO forbids edits at len 2


def test_cosine_arrow_matches_expression(spark):
    """The Arrow cosine kernel must be BIT-identical to the
    zip_with/aggregate expression fold — including the zero-norm ->
    0.0 rule, denormals, huge magnitudes, and mixed signs (the
    adversarial-embeddings shapes). Equality is ==, not approx."""
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.extensions.similarity import (
        cosine,
        cosine_arrow,
    )

    rows = [
        (1, [0.0] * 64, [1.0] * 64),                       # zero vector
        (2, [5e-324] + [0.0] * 63, [1.0] * 64),            # denormal
        (3, [1e15 * (1 + j % 3) for j in range(64)],
            [0.1 + 0.01 * j for j in range(64)]),          # huge
        (4, [(-1.0) ** j for j in range(64)],
            [(-1.0) ** (j + 1) for j in range(64)]),       # alternating
        (5, [0.0] * 64, [0.0] * 64),                       # both zero
        (6, [((j * 37) % 13 - 6) / 7.0 for j in range(64)],
            [((j * 11) % 17 - 8) / 9.0 for j in range(64)]),
    ]
    df = spark.createDataFrame(rows, "id long, x array<double>, y array<double>")
    bad = df.select(
        (cosine(F.col("x"), F.col("y"))
         == cosine_arrow(F.col("x"), F.col("y"))).alias("eq")
    ).filter(~F.col("eq")).count()
    assert bad == 0


def test_lsh_buckets_arrow_matches_expression(spark):
    """lsh_buckets_arrow (all tables in one kernel pass) must emit the
    same bucket strings as per-table lsh_bucket expressions."""
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.extensions.similarity import (
        N_PLANES,
        N_TABLES,
        lsh_bucket,
        lsh_buckets_arrow,
    )

    rows = [
        (i, [((i * 31 + j * 7) % 13 - 6) / 6.0 for j in range(64)])
        for i in range(50)
    ] + [(50, [0.0] * 64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    expr = df.select(
        "vec_id",
        F.array(
            *[lsh_bucket(F.col("embedding"), 64, t) for t in range(N_TABLES)]
        ).alias("b"),
    )
    kern = df.select(
        "vec_id",
        lsh_buckets_arrow(64, N_PLANES, N_TABLES)(F.col("embedding")).alias("b"),
    )
    e = {r["vec_id"]: r["b"] for r in expr.collect()}
    k = {r["vec_id"]: list(r["b"]) for r in kern.collect()}
    assert e == k


def test_pq_encode_kernel_matches_expression(spark):
    """pq_encode's Arrow kernel must reproduce the expression form
    (_unit -> per-subspace _assign_code argmin -> recon fold)
    bit-for-bit: codes equal, recon_mse == (not approx)."""
    from pyspark.sql import functions as F

    from click_streaming_data_pipeline_spark.extensions import pq

    rows = [
        (i, [((i * 31 + j * 7) % 13 - 6) / 6.0 for j in range(64)])
        for i in range(40)
    ] + [(40, [0.0] * 64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq.train_pq_codebooks(emb)
    got = {
        r["vec_id"]: (list(r["codes"]), r["recon_mse"])
        for r in pq.pq_encode(emb, books).collect()
    }
    # expression reference: the pre-kernel formulation
    cb = pq._codebook_lit(books)
    m, ds = len(books), len(books[0][0])
    v = pq._unit(pq._as_double(F.col("embedding")))
    coded = emb.select(F.col("vec_id"), v.alias("v")).withColumn(
        "codes",
        F.array(
            *[
                pq._assign_code(
                    F.slice("v", mi * ds + 1, ds), F.element_at(cb, mi + 1)
                )
                for mi in range(m)
            ]
        ),
    )
    recon = F.aggregate(
        F.array(
            *[
                pq._l2sq(
                    F.slice("v", mi * ds + 1, ds),
                    F.element_at(
                        F.element_at(cb, mi + 1), F.col("codes")[mi] + 1
                    ),
                )
                for mi in range(m)
            ]
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.lit(float(m * ds))
    want = {
        r["vec_id"]: (list(r["codes"]), r["r"])
        for r in coded.select("vec_id", "codes", recon.alias("r")).collect()
    }
    assert got == want
