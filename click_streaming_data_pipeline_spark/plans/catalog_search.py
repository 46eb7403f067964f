"""Search catalog (SURVEY 2 F): the reference's /search endpoint
(services/search/app/main.py:72-147) decomposed into oracle-checked
queries over the ``documents`` table.

Field mapping onto the test corpus: ``title`` = first 64 chars of
``text`` (boost 2.0, mirroring ES ``title^2``), ``body`` = full
``text`` (boost 1.0); ``lang``/``source`` stand in for the
``status``/``created_by.keyword`` filter fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.quality import quality_check_columns, quality_oracle_exprs
from ..operators.search import (
    bm25_idf,
    build_inverted_index,
    fuzzy_term_frequency,
    highlight,
    score_columns,
    search_via_index,
    term_doc_frequencies,
    tokenize,
)
from ..sources import load_table
from .registry import query

_TERMS = ["spark", "stream"]


def _docs_with_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.withColumn("title", F.substring("text", 1, 64)).withColumn(
        "body", F.col("text")
    )


def _term_idf(docs: DataFrame) -> dict[str, float]:
    """BM25 idf per query term from one corpus aggregation (the ln is
    Python/libm so the DuckDB oracle's ln() matches bit-for-bit)."""
    n_docs, dfs = term_doc_frequencies(docs, _TERMS, body_col="body")
    return {t: bm25_idf(n_docs, dfs[t]) for t in _TERMS}


def _sql_tf(field_sql: str, term: str) -> str:
    """DuckDB twin of operators.search.term_frequency (exact token)."""
    return (
        f"len(list_filter(string_split(lower({field_sql}), ' '), "
        f"t -> t = '{term}'))"
    )


def _sql_idf(term: str) -> str:
    """DuckDB twin of bm25_idf: all operands cast to DOUBLE so the
    arithmetic is IEEE (DuckDB numeric literals are DECIMAL), matching
    Python's float math exactly; ln() is libm on both sides."""
    df = (
        f"(SELECT CAST(count(*) AS DOUBLE) FROM documents "
        f"WHERE {_sql_tf('text', term)} > 0)"
    )
    n = "(SELECT CAST(count(*) AS DOUBLE) FROM documents)"
    return (
        f"ln(1 + ({n} - {df} + CAST(0.5 AS DOUBLE)) / "
        f"({df} + CAST(0.5 AS DOUBLE)))"
    )


def _sql_score() -> str:
    """DuckDB twin of score_columns(idf=...) over title/body for
    _TERMS: per-term (2*tf_title + 1*tf_body) * idf, summed in term
    order (matching Spark's expression-tree association)."""
    parts = []
    for t in _TERMS:
        parts.append(
            f"({_sql_tf('substr(text, 1, 64)', t)} * CAST(2.0 AS DOUBLE)"
            f" + {_sql_tf('text', t)} * CAST(1.0 AS DOUBLE))"
            f" * {_sql_idf(t)}"
        )
    return "(CAST(0.0 AS DOUBLE) + " + " + ".join(parts) + ")"


@query(
    "search_bool_filters",
    oracle=f"""
        SELECT doc_id, lang, source, quality_score
        FROM (
            SELECT doc_id, lang, source,
                   ({quality_oracle_exprs()['quality_score']}) AS quality_score,
                   ({quality_oracle_exprs()['has_pii']}) AS has_pii
            FROM documents
        )
        WHERE lang = 'en'
          AND source = 'src1'
          AND quality_score >= 50.0
          AND NOT has_pii
    """,
    doc=(
        "F2 exact term filter + F3 keyword-subfield filter + F4 range "
        "predicate + F5 bool must/filter composition (search "
        "main.py:100-113: status/created_by.keyword/min_quality_score/"
        "exclude_pii)"
    ),
    tags=("search", "filter"),
)
def search_bool_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bool.filter as a predicate conjunction — unscored, fully
    pushable into the scan."""
    from ..functions.quality import with_quality_columns

    docs = load_table(spark, sf_dir, "documents")
    return (
        with_quality_columns(docs, names=("quality_score", "has_pii"))
        .filter(
            (F.col("lang") == "en")
            & (F.col("source") == "src1")
            & (F.col("quality_score") >= 50.0)
            & ~F.col("has_pii")
        )
        .select("doc_id", "lang", "source", "quality_score")
    )


@query(
    "search_rank_topk",
    oracle=f"""
        SELECT doc_id, score, title,
               regexp_replace(
                 regexp_replace(title, '(?i)(spark)', '<em>\\1</em>', 'g'),
                 '(?i)(stream)', '<em>\\1</em>', 'g'
               ) AS title_highlight
        FROM (
            SELECT doc_id, substr(text, 1, 64) AS title,
                   {_sql_score()} AS score
            FROM documents
        )
        WHERE score > 0
        ORDER BY score DESC, doc_id ASC
        LIMIT 10
    """,
    doc=(
        "F1 multi-field match w/ title^2 boost + BM25 idf per term "
        "(search main.py:90-99 scores via ES BM25: term rarity "
        "matters) + F6 relevance sort + highlight (:116-124) + F7 hit "
        "reshape (:133-147) + D2 top-k"
    ),
    tags=("bench", "search", "sort"),
)
def search_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression-strategy search: one df-aggregation scan + one
    scoring scan, boosted TF-IDF score, top-10. Scale:
    TakeOrderedAndProject; for repeated queries use the inverted-index
    strategy instead (search_via_index)."""
    docs = _docs_with_fields(spark, sf_dir)
    idf = _term_idf(docs)
    return (
        docs.withColumn(
            "score", score_columns("title", "body", _TERMS, idf=idf)
        )
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
        .select(
            "doc_id",
            "score",
            "title",
            highlight("title", _TERMS).alias("title_highlight"),
        )
    )


@query(
    "search_fuzzy",
    oracle="""
        SELECT doc_id,
               len(list_filter(string_split(lower(text), ' '),
                   t -> levenshtein(t, 'streem') <= 2)) AS n_fuzzy_hits
        FROM documents
        WHERE len(list_filter(string_split(lower(text), ' '),
                  t -> levenshtein(t, 'streem') <= 2)) > 0
    """,
    doc=(
        "F1 fuzziness AUTO (search main.py:96: multi_match fuzziness) "
        "as levenshtein(token, term) <= D over tokenized text, D from "
        "the ES AUTO length ladder (0 below 3 chars / 1 for 3-5 / 2 "
        "from 6; 'streem' is 6 chars -> 2)"
    ),
    tags=("search",),
)
def search_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant match under the AUTO ladder: 6-char 'streem'
    allows 2 edits, so 'stream' (1 edit) and e.g. 'strem' (2) match.
    Scale: distance predicates don't prune; production path is a
    candidate set from the inverted index over n-gram keys, then exact
    levenshtein verify — the same shape ES uses."""
    docs = load_table(spark, sf_dir, "documents")
    hits = fuzzy_term_frequency(tokenize("text"), "streem")
    return (
        docs.withColumn("n_fuzzy_hits", hits)
        .filter(F.col("n_fuzzy_hits") > 0)
        .select("doc_id", "n_fuzzy_hits")
    )


@query(
    "search_via_index",
    oracle=f"""
        SELECT doc_id, score
        FROM (
            SELECT doc_id, {_sql_score()} AS score
            FROM documents
        )
        WHERE score > 0
    """,
    doc=(
        "F1 via materialized inverted index (the ES-index analogue, "
        "event main.py:79-127 mapping): explode->postings->join query "
        "terms with the idf riding the broadcast query table; must "
        "equal the expression-strategy TF-IDF scores exactly"
    ),
    tags=("search", "join"),
)
def search_via_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-strategy search. The oracle is the *expression* strategy's
    result — a cross-strategy equivalence check (bit-exact: per-doc
    term contributions are identical doubles and IEEE addition of the
    two is commutative). Scale: postings bucketed by token turn
    full-corpus scans into per-term bucket reads."""
    docs = _docs_with_fields(spark, sf_dir)
    idf = _term_idf(docs)
    index = build_inverted_index(docs, fields={"title": 2.0, "body": 1.0})
    return search_via_index(index, _TERMS, idf=idf)


@query(
    "search_result_count",
    oracle=f"""
        SELECT count(*) AS total
        FROM (
            SELECT doc_id, substr(text, 1, 64) AS title,
                   {_sql_score()} AS score
            FROM documents
            WHERE lang = 'en'
        )
        WHERE score > 0
    """,
    doc=(
        "C5 result-set total count (search main.py:133-135: ES "
        "hits.total returned with every page): count over the full "
        "filtered+matched set, independent of from/size"
    ),
    tags=("search", "agg"),
)
def search_result_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_fields(spark, sf_dir).filter(F.col("lang") == "en")
    idf = _term_idf(_docs_with_fields(spark, sf_dir))
    return (
        docs.withColumn(
            "score", score_columns("title", "body", _TERMS, idf=idf)
        )
        .filter(F.col("score") > 0)
        .agg(F.count("*").alias("total"))
    )


_PHRASE = ["spark", "window", "window"]
_PHRASE_PRED = " AND ".join(
    f"t[i+{j}] = '{w}'" for j, w in enumerate(_PHRASE)
)


@query(
    "search_phrase",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, string_split(lower(text), ' ') AS t
            FROM documents
        )
        SELECT doc_id,
               len(list_filter(
                   generate_series(1, len(t) - {len(_PHRASE) - 1}),
                   i -> {_PHRASE_PRED})) AS phrase_freq
        FROM tok
        WHERE len(list_filter(
                  generate_series(1, len(t) - {len(_PHRASE) - 1}),
                  i -> {_PHRASE_PRED})) > 0
    """,
    doc=(
        "F1 companion: exact-phrase match (ES match_phrase) via a "
        "POSITIONAL inverted index — k-way positional self-join where "
        "each leg is pruned to one phrase term before joining on "
        "(doc, normalized start); repeated tokens in the phrase are "
        "handled positionally. Oracle scans token arrays for adjacent "
        "runs. The phrase has matches at every test scale factor."
    ),
    tags=("search",),
)
def search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import build_positional_index, phrase_search

    docs = _docs_with_fields(spark, sf_dir)
    idx = build_positional_index(docs, body_col="body")
    return phrase_search(idx, _PHRASE)


def _bm25_score_sql() -> str:
    """The full-BM25 document score as one SQL expression. The avgdl
    literal depends on the corpus, but ORACLE strings must be fixed at
    registration — so avgdl is expressed in pure SQL (exact integer
    sum / count, the same float the driver-side python division
    produces); only the Spark side computes it at call time."""
    avgdl_sql = (
        "(SELECT CAST(SUM(len(string_split(lower(text), ' '))) AS DOUBLE)"
        " / CAST(count(*) AS DOUBLE) FROM documents)"
    )
    dl = "CAST(len(string_split(lower(text), ' ')) AS DOUBLE)"
    norm = (
        f"CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)"
        f" + CAST(0.75 AS DOUBLE) * ({dl} / {avgdl_sql}))"
    )
    parts = []
    for t in _TERMS:
        wtf = (
            f"({_sql_tf('substr(text, 1, 64)', t)} * CAST(2.0 AS DOUBLE)"
            f" + {_sql_tf('text', t)} * CAST(1.0 AS DOUBLE))"
        )
        parts.append(
            f"{_sql_idf(t)} * ({wtf} * CAST(2.2 AS DOUBLE) / ({wtf} + {norm}))"
        )
    return "(CAST(0.0 AS DOUBLE) + " + " + ".join(parts) + ")"


def _bm25_scored_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) under full BM25 — the Spark twin of
    :func:`_bm25_score_sql` (shared by the top-k and hybrid lanes)."""
    from ..operators.search import corpus_search_stats, score_columns_bm25

    docs = _docs_with_fields(spark, sf_dir)
    n_docs, dfs, avgdl = corpus_search_stats(docs, _TERMS, body_col="body")
    idf = {t: bm25_idf(n_docs, dfs[t]) for t in _TERMS}
    return docs.select(
        "doc_id",
        score_columns_bm25(
            "title", "body", _TERMS, idf=idf, avgdl=avgdl
        ).alias("score"),
    )


def _make_search_bm25():
    score_sql = _bm25_score_sql()

    oracle = f"""
        SELECT doc_id, score, rn FROM (
            SELECT doc_id, {score_sql} AS score,
                   CAST(row_number() OVER (
                       ORDER BY {score_sql} DESC, doc_id ASC
                   ) AS INT) AS rn
            FROM documents
        ) WHERE rn <= 10 AND score > CAST(0.0 AS DOUBLE)
    """

    @query(
        "search_bm25_topk",
        oracle=oracle,
        doc=(
            "F1/F6 upgraded to FULL BM25 (what ES actually runs, "
            "reference search main.py:90-99): the boosted multi-field "
            "TF goes through k1=1.2 saturation and b=0.75 document-"
            "length normalization before the idf weighting - spammy "
            "term repetition caps out and long docs stop winning on "
            "bulk, so rankings track ES where raw TF-IDF diverges. "
            "idf/avgdl come from ONE corpus aggregation (bounded "
            "single-row collect); the oracle recomputes both in exact "
            "integer space + ln (libm both sides), with every IEEE op "
            "in the same order. Top-10 with unique tie-break."
        ),
        tags=("search",),
    )
    def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql.window import Window

        from ..operators.topk import ranked_topn

        scored = _bm25_scored_frame(spark, sf_dir)
        # top-10 never global-sorts (TakeOrderedAndProject): the bare
        # global window shipped every scored doc to ONE reducer
        return ranked_topn(
            scored, [F.col("score").desc(), F.col("doc_id").asc()], 10
        ).filter(F.col("score") > 0.0)

    return search_bm25_topk


_make_search_bm25()


def _make_search_hybrid_rrf():
    """Hybrid search via reciprocal-rank fusion — the production
    RAG retrieval shape (ES/OpenSearch `rrf`, Vespa/Weaviate hybrid):
    a lexical BM25 ranking and a dense embedding ranking each
    nominate their top-20, and a document's fused score is
    sum(1/(60+rank)) over the legs it appears in. Rank fusion needs
    no score calibration between legs — only the two rank integers —
    which is why it is the default hybrid everywhere; k=60 is the
    constant from Cormack et al. 2009.

    Exactness: both legs rank with unique tie-breaks, 1/(60+rank) is
    one correctly-rounded double division per leg, and the fused sum
    adds the legs in a fixed order — bit-identical across engines, so
    the lane carries a full value oracle."""
    from .catalog_extensions import _dot_sql, _norm_sql

    score_sql = _bm25_score_sql()
    oracle = f"""
        WITH ev AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ),
        qv AS (
            SELECT v AS q, {_norm_sql('v')} AS nq FROM ev WHERE vec_id = 0
        ),
        bm AS (
            SELECT doc_id, rb FROM (
                SELECT doc_id, CAST(row_number() OVER (
                    ORDER BY {score_sql} DESC, doc_id ASC) AS INT) AS rb
                FROM documents
                WHERE {score_sql} > CAST(0.0 AS DOUBLE)
            ) WHERE rb <= 20
        ),
        vec AS (
            SELECT e.vec_id AS doc_id,
                   coalesce({_dot_sql('e.v', 'qv.q')}
                            / nullif({_norm_sql('e.v')} * qv.nq,
                                     CAST(0.0 AS DOUBLE)),
                            CAST(0.0 AS DOUBLE)) AS cos
            FROM ev e, qv WHERE e.vec_id <> 0
        ),
        vr AS (
            SELECT doc_id, rv FROM (
                SELECT doc_id, CAST(row_number() OVER (
                    ORDER BY cos DESC, doc_id ASC) AS INT) AS rv
                FROM vec
            ) WHERE rv <= 20
        ),
        fused AS (
            SELECT coalesce(bm.doc_id, vr.doc_id) AS doc_id,
                   bm.rb AS bm25_rank, vr.rv AS vec_rank,
                   coalesce(CAST(1.0 AS DOUBLE)
                            / CAST(60 + bm.rb AS DOUBLE),
                            CAST(0.0 AS DOUBLE))
                   + coalesce(CAST(1.0 AS DOUBLE)
                              / CAST(60 + vr.rv AS DOUBLE),
                              CAST(0.0 AS DOUBLE)) AS rrf
            FROM bm FULL OUTER JOIN vr ON bm.doc_id = vr.doc_id
        )
        SELECT doc_id, bm25_rank, vec_rank, rrf, rn FROM (
            SELECT *, CAST(row_number() OVER (
                ORDER BY rrf DESC, doc_id ASC) AS INT) AS rn
            FROM fused
        ) WHERE rn <= 10
    """

    @query(
        "search_hybrid_rrf",
        oracle=oracle,
        doc=(
            "beyond-reference RAG retrieval: HYBRID SEARCH via "
            "reciprocal-rank fusion — full-BM25 lexical top-20 and "
            "dense cosine top-20 (query = doc 0's embedding, itself "
            "excluded) fuse by sum(1/(60+rank)); docs nominated by "
            "one leg keep that leg's term alone. Each leg is a "
            "TakeOrdered top-k (no global sort, no single-reducer "
            "window); the fuse joins two 20-row frames. Scale: leg "
            "cost is the scan (BM25) / ANN probe (vector), fusion "
            "cost is O(k)"
        ),
        tags=("search", "similarity"),
    )
    def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql.window import Window

        from ..extensions.similarity import cosine_arrow
        from ..operators.topk import ranked_topn

        # the lexical leg nominates only documents it actually
        # RETRIEVED (score > 0) — production RRF fuses retrieved sets,
        # never zero-score padding (which would grant non-matching
        # docs 1/(60+rank) weight whenever < 20 docs match)
        scored = _bm25_scored_frame(spark, sf_dir).filter(
            F.col("score") > 0.0
        )
        bm = ranked_topn(
            scored, [F.col("score").desc(), F.col("doc_id").asc()], 20,
            rank_name="bm25_rank",
        ).select("doc_id", "bm25_rank")

        emb = load_table(spark, sf_dir, "embeddings")
        qv = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("q_vec")
        )
        vec = (
            emb.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(qv))
            .select(
                F.col("vec_id").alias("doc_id"),
                cosine_arrow(F.col("embedding"), F.col("q_vec")).alias("cos"),
            )
        )
        vr = ranked_topn(
            vec, [F.col("cos").desc(), F.col("doc_id").asc()], 20,
            rank_name="vec_rank",
        ).select("doc_id", "vec_rank")

        rrf = (
            F.coalesce(
                F.lit(1.0) / (F.lit(60) + F.col("bm25_rank")).cast("double"),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(60) + F.col("vec_rank")).cast("double"),
                F.lit(0.0),
            )
        )
        fused = bm.join(vr, "doc_id", "full_outer").select(
            "doc_id", "bm25_rank", "vec_rank", rrf.alias("rrf")
        )
        wf = Window.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        return (
            fused.withColumn("rn", F.row_number().over(wf).cast("int"))
            .filter(F.col("rn") <= 10)
        )

    return search_hybrid_rrf


_make_search_hybrid_rrf()


@query(
    "search_index_streamed",
    # oracle = the SAME full-corpus TF-IDF expression score as
    # search_via_index: the incrementally-maintained index + collection
    # stats must converge to exactly the batch-built index's results.
    oracle=f"""
        SELECT doc_id, score
        FROM (
            SELECT doc_id, {_sql_score()} AS score
            FROM documents
        )
        WHERE score > 0
    """,
    doc=(
        "STREAMING index maintenance (the reference's ES ingestion, "
        "event main.py:71-136, as incremental inverted-index upkeep): "
        "each micro-batch appends its postings AND its collection "
        "statistics (per-token body df, doc count) to batch-versioned "
        "stores — replay-idempotent, history never re-read; BM25 idf "
        "is derived from the folded stats at query time exactly like "
        "ES computes idf from segment stats. The drained index must "
        "score bit-identically to the batch expression strategy."
    ),
    tags=("streaming", "search"),
)
def search_index_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..operators.search import tokenize

    docs = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="csdp_sidx_")
    src = os.path.join(work, "in")
    postings_store = os.path.join(work, "postings")
    stats_store = os.path.join(work, "stats")
    docs.repartition(6).write.mode("overwrite").parquet(src)

    def index_batch(batch: DataFrame, batch_id: int) -> None:
        fields = batch.withColumn(
            "title", F.substring("text", 1, 64)
        ).withColumn("body", F.col("text"))
        postings = build_inverted_index(
            fields, fields={"title": 2.0, "body": 1.0}
        )
        # per-token body document frequency + the batch doc count
        # (carried as token='' so one store folds both statistics)
        stats = (
            fields.select(
                "doc_id", F.explode(tokenize("body")).alias("token")
            )
            .distinct()
            .groupBy("token")
            .agg(F.count("*").alias("df"))
            .unionByName(
                fields.select(
                    F.lit("").alias("token"),
                    F.count("*").alias("df"),
                )
            )
        )
        # batch-versioned subdirectories: an at-least-once replay
        # overwrites its own directory instead of double-appending
        postings.write.mode("overwrite").parquet(
            os.path.join(postings_store, f"b{batch_id}")
        )
        stats.write.mode("overwrite").parquet(
            os.path.join(stats_store, f"b{batch_id}")
        )

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(index_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # fold the stats (doc_ids are stream-unique, so summing per-batch
    # contributions is the exact global statistic), then query the
    # union-of-batches postings exactly like the batch index path
    stats = (
        spark.read.parquet(os.path.join(stats_store, "b*"))
        .filter(F.col("token").isin([""] + _TERMS))
        .groupBy("token")
        .agg(F.sum("df").alias("df"))
    )
    folded = {r["token"]: int(r["df"]) for r in stats.collect()}
    n_docs = folded.pop("", 0)
    idf = {t: bm25_idf(n_docs, folded.get(t, 0)) for t in _TERMS}
    index = spark.read.parquet(os.path.join(postings_store, "b*"))
    return search_via_index(index, _TERMS, idf=idf)


@query(
    "search_prefix",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split(lower(substr(text, 1, 64)), ' '))
                       AS token,
                   CAST(2.0 AS DOUBLE) AS boost
            FROM documents
            UNION ALL
            SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS token,
                   CAST(1.0 AS DOUBLE)
            FROM documents
        ),
        postings AS (
            SELECT doc_id, token, sum(boost) AS wtf
            FROM tok
            GROUP BY 1, 2
        )
        SELECT doc_id,
               count(*) AS n_prefix_tokens,
               CAST(sum(wtf) AS DOUBLE) AS prefix_tf
        FROM postings
        WHERE token LIKE 'spa%'
        GROUP BY 1
    """,
    doc=(
        "ES prefix query analogue (the DSL's {'prefix': {...}}, "
        "constant-score family next to F1's scored match): matching "
        "tokens come from a StartsWith range predicate over the "
        "postings table — with postings RANGE-partitioned by token "
        "(not hashed), a prefix is a contiguous partition slice, so "
        "the scan prunes to the prefix's files; per-doc boosted tf "
        "sums are integer-valued doubles (exact in any order)."
    ),
    tags=("search",),
)
def search_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_fields(spark, sf_dir)
    index = build_inverted_index(docs, fields={"title": 2.0, "body": 1.0})
    return (
        index.filter(F.col("token").startswith("spa"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_prefix_tokens"),
            F.sum("weighted_tf").alias("prefix_tf"),
        )
    )


@query(
    "search_facets",
    oracle="""
        WITH hits AS (
            SELECT source,
                   CAST(floor(n_chars / 500) * 500 AS BIGINT) AS bin
            FROM documents
            WHERE list_contains(string_split(lower(text), ' '), 'spark')
        )
        SELECT CASE WHEN GROUPING(source) = 0 THEN 'source'
                    ELSE 'n_chars_hist' END AS facet,
               coalesce(CAST(source AS VARCHAR), CAST(bin AS VARCHAR))
                   AS bucket,
               count(*) AS doc_count
        FROM hits
        GROUP BY GROUPING SETS ((source), (bin))
    """,
    doc=(
        "F-extension: ES-style search AGGREGATIONS (facets) computed "
        "alongside the hit set - a terms facet on source and a "
        "fixed-interval histogram on n_chars (ES terms/histogram "
        "aggs), both from ONE pass via GROUPING SETS: Spark's Expand "
        "duplicates each hit row per facet map-side, so the filtered "
        "scan happens once no matter how many facets the search UI "
        "asks for. At 100 TB facets are the expensive half of every "
        "search page; one-Expand-shuffle beats per-facet re-scans "
        "#facets-fold. Reference surface: the /search endpoint "
        "(services/search/app/main.py:72-147) returns hits+total; "
        "facets are the standard ES companion the engine exposes."
    ),
    tags=("search", "agg"),
)
def search_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hits = docs.filter(
        F.array_contains(F.split(F.lower("text"), " "), "spark")
    ).select(
        "source",
        (F.floor(F.col("n_chars") / 500) * 500).cast("long").alias("bin"),
    )
    return (
        hits.groupingSets([["source"], ["bin"]], "source", "bin")
        .agg(
            F.count("*").alias("doc_count"),
            F.grouping("source").cast("int").alias("g_src"),
        )
        .select(
            F.when(F.col("g_src") == 0, F.lit("source"))
            .otherwise(F.lit("n_chars_hist"))
            .alias("facet"),
            F.coalesce(
                F.col("source").cast("string"),
                F.col("bin").cast("string"),
            ).alias("bucket"),
            "doc_count",
        )
    )


def _ndcg_weights(k: int = 10) -> list[str]:
    """1/log2(rank+1) discount as 12-decimal literals, computed ONCE
    in python and embedded verbatim in BOTH engines' plans — DCG then
    needs only exact decimal multiply/add, dodging cross-engine libm."""
    import math

    return [f"{1.0 / math.log2(i + 1):.12f}" for i in range(1, k + 1)]


def _make_search_eval():
    k = 10
    ws = _ndcg_weights(k)
    w_cases_rn = " ".join(
        f"WHEN {i + 1} THEN CAST({w} AS DECIMAL(14,12))"
        for i, w in enumerate(ws)
    )
    rel_sql = (
        "(CAST(list_contains(string_split(lower(text), ' '), 'spark') "
        "AS INT) + "
        "CAST(list_contains(string_split(lower(text), ' '), 'stream') "
        "AS INT))"
    )
    oracle = f"""
        WITH rels AS (
            SELECT doc_id, {rel_sql} AS rel FROM documents
        ),
        ranked AS (
            SELECT doc_id, rn FROM (
                SELECT doc_id, {_sql_score()} AS score,
                       CAST(row_number() OVER (
                           ORDER BY {_sql_score()} DESC, doc_id ASC
                       ) AS INT) AS rn
                FROM documents
            ) WHERE rn <= {k} AND score > CAST(0.0 AS DOUBLE)
        ),
        dcg_t AS (
            SELECT SUM(r.rel * CASE ranked.rn {w_cases_rn} END) AS dcg_dec,
                   min(CASE WHEN r.rel >= 1 THEN ranked.rn END)
                       AS first_rel_rank
            FROM ranked JOIN rels r USING (doc_id)
        ),
        ideal AS (
            SELECT rel, CAST(row_number() OVER (
                       ORDER BY rel DESC, doc_id ASC
                   ) AS INT) AS irn
            FROM rels
        ),
        idcg_t AS (
            SELECT SUM(rel * CASE irn {w_cases_rn} END) AS idcg_dec
            FROM ideal WHERE irn <= {k}
        )
        SELECT CAST(dcg_dec AS DOUBLE) AS dcg,
               CAST(idcg_dec AS DOUBLE) AS idcg,
               (CAST(dcg_dec AS DOUBLE) / CAST(idcg_dec AS DOUBLE))
                   AS ndcg,
               CAST(first_rel_rank AS INT) AS first_rel_rank,
               (CAST(1.0 AS DOUBLE) / first_rel_rank) AS mrr
        FROM dcg_t, idcg_t
    """

    @query(
        "search_eval_ndcg",
        oracle=oracle,
        doc=(
            "F-extension: search-quality EVALUATION - nDCG@10 and MRR "
            "of the boosted TF-IDF ranking against graded relevance "
            "labels "
            "(rel = #query terms the document contains, the standard "
            "pseudo-qrel when no human labels exist). Rank discounts "
            "1/log2(rank+1) are python-computed 12-decimal literals "
            "embedded in both engines, so DCG/IDCG accumulate in "
            "EXACT decimal space and only the final ndcg/mrr "
            "divisions are (correctly-rounded) IEEE ops - fully "
            "hash-oracled, unlike a libm-log formulation. Scale: "
            "ranking + ideal ranking are the existing top-k plans "
            "(TakeOrderedAndProject); the metric math happens on "
            "k rows. The eval harness every search-relevance "
            "iteration at 100 TB needs next to its index."
        ),
        tags=("search", "agg"),
    )
    def search_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql.window import Window

        docs = _docs_with_fields(spark, sf_dir)
        idf = _term_idf(docs)
        toks = F.split(F.lower("text"), " ")
        rel = (
            F.array_contains(toks, "spark").cast("int")
            + F.array_contains(toks, "stream").cast("int")
        )
        rels = docs.select("doc_id", rel.alias("rel"))

        scored = docs.select(
            "doc_id",
            score_columns(
                "title", "body", _TERMS, idf=idf
            ).alias("score"),
        )
        from ..operators.topk import ranked_topn

        # TakeOrdered top-k, then rank the k rows (see search_bm25_topk)
        ranked = (
            ranked_topn(
                scored, [F.col("score").desc(), F.col("doc_id").asc()], k
            )
            .filter(F.col("score") > 0.0)
            .select("doc_id", "rn")
        )

        def weight_of(rank_col):
            expr = F.lit(None).cast("decimal(14,12)")
            for i, wlit in enumerate(ws):
                expr = F.when(
                    rank_col == i + 1,
                    F.lit(wlit).cast("decimal(14,12)"),
                ).otherwise(expr)
            return expr

        dcg_t = (
            ranked.join(rels, "doc_id")
            .agg(
                F.sum(F.col("rel") * weight_of(F.col("rn"))).alias(
                    "dcg_dec"
                ),
                F.min(
                    F.when(F.col("rel") >= 1, F.col("rn"))
                ).alias("first_rel_rank"),
            )
        )
        iw = Window.orderBy(F.col("rel").desc(), F.col("doc_id").asc())
        idcg_t = (
            rels.select(
                "rel", F.row_number().over(iw).cast("int").alias("irn")
            )
            .filter(F.col("irn") <= k)
            .agg(
                F.sum(F.col("rel") * weight_of(F.col("irn"))).alias(
                    "idcg_dec"
                )
            )
        )
        return dcg_t.crossJoin(idcg_t).select(
            F.col("dcg_dec").cast("double").alias("dcg"),
            F.col("idcg_dec").cast("double").alias("idcg"),
            (
                F.col("dcg_dec").cast("double")
                / F.col("idcg_dec").cast("double")
            ).alias("ndcg"),
            F.col("first_rel_rank").cast("int").alias("first_rel_rank"),
            (F.lit(1.0) / F.col("first_rel_rank")).alias("mrr"),
        )

    return search_eval_ndcg


_make_search_eval()


@query(
    "search_more_like_this",
    oracle="""
        WITH src AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM (
                SELECT unnest(string_split(lower(text), ' ')) AS tok
                FROM documents WHERE doc_id = 1) u
            WHERE tok <> ''
            GROUP BY 1
        ),
        corpus AS (
            SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS tok
            FROM documents
        ),
        df AS (
            SELECT s.tok, CAST(count(DISTINCT c.doc_id) AS BIGINT) AS df
            FROM src s JOIN corpus c ON c.tok = s.tok
            GROUP BY 1
        ),
        q AS (
            SELECT s.tok, s.tf,
                   CAST(floor(ln(1 + (
                       (SELECT CAST(count(*) AS DOUBLE) FROM documents)
                       - CAST(d.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                       / (CAST(d.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                       * CAST(1000000.0 AS DOUBLE)
                       + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qidf
            FROM src s JOIN df d USING (tok)
        ),
        top5 AS (
            SELECT tok, qidf FROM q
            ORDER BY tf * qidf DESC, tok
            LIMIT 5
        ),
        scored AS (
            SELECT c.doc_id, CAST(SUM(t.qidf) AS BIGINT) AS mlt_score
            FROM corpus c JOIN top5 t ON c.tok = t.tok
            WHERE c.doc_id <> 1
            GROUP BY 1
        )
        SELECT doc_id, mlt_score
        FROM scored
        WHERE mlt_score > 0
        ORDER BY mlt_score DESC, doc_id
        LIMIT 10
    """,
    doc=(
        "ES-surface parity: MORE_LIKE_THIS — the reference's ES "
        "index supports ES's more_like_this similarity query "
        "(services/event/app/main.py:79-127 mapping) though /search "
        "never exposes it; this is the engine form. Source doc 1's "
        "top-5 terms by tf x idf seed a corpus scoring pass; idf is "
        "quantized to integer micro-units (floor(idf*1e6+0.5)) so "
        "ranking sums are BIGINTs — order-insensitive, bit-identical "
        "cross-engine, immune to float-sum association. Two bounded "
        "driver collects (source row, one df aggregation row — the "
        "ivf.py pattern); scoring is one codegen'd corpus scan."
    ),
    tags=("search",),
)
def search_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import more_like_this

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return more_like_this(docs, 1, id_col="doc_id", body_col="text")


@query(
    "search_suggest",
    oracle="""
        WITH vocab AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM (
                SELECT unnest(string_split(lower(text), ' ')) AS tok
                FROM documents) u
            WHERE tok <> ''
            GROUP BY 1
        ),
        q(term) AS (VALUES
            ('spak'), ('strem'), ('joinn'), ('windo'), ('qury')),
        cand AS (
            SELECT q.term, v.tok AS suggestion,
                   CAST(levenshtein(q.term, v.tok) AS INTEGER) AS dist,
                   v.tf
            FROM q JOIN vocab v ON levenshtein(q.term, v.tok) <= 1
        ),
        ranked AS (
            SELECT term, suggestion, dist, tf,
                   CAST(row_number() OVER (
                       PARTITION BY term
                       ORDER BY dist, tf DESC, suggestion
                   ) AS INTEGER) AS rank
            FROM cand
        )
        SELECT term, suggestion, dist, tf, rank
        FROM ranked WHERE rank <= 3
    """,
    doc=(
        "ES-surface parity: TERM SUGGESTER ('did you mean') — ES's "
        "suggest API corrects query typos against the index "
        "vocabulary by edit distance; the reference's ES index "
        "carries the analyzed vocabulary for it (event "
        "main.py:79-127). Engine form: corpus vocabulary (one "
        "tokenize+groupBy pass) joins the misspelled terms through "
        "DELETION-NEIGHBORHOOD keys (extensions/linkage.py — "
        "provably complete for ed<=1, no vocab scan per term), "
        "candidates verify with levenshtein, and suggestions rank "
        "by (distance, corpus frequency desc) with top-3 per term "
        "via a per-term WindowGroupLimit. The oracle brute-forces "
        "the vocab with levenshtein; the plan never does."
    ),
    tags=("search", "linkage"),
)
def search_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..extensions.linkage import deletion_keys
    from ..sources.tables import scan_parallel

    docs = scan_parallel(load_table(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(tokenize("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("tf"))
    )
    terms = spark.createDataFrame(
        [("spak",), ("strem",), ("joinn",), ("windo",), ("qury",)],
        ["term"],
    )
    v_keys = deletion_keys(vocab, "tok").withColumnRenamed(
        "_dpos", "_pv"
    )
    t_keys = deletion_keys(terms, "term").withColumnRenamed(
        "_dpos", "_pt"
    )
    # position-aware exact candidates (extensions/linkage.py): same
    # position = substitution-only difference, either side full =
    # one insertion — so dist needs no DP, 0 iff equal else 1
    cand = (
        v_keys.join(F.broadcast(t_keys), "_dkey")
        .filter(
            (F.col("_pv") == F.col("_pt"))
            | (F.col("_pv") == 0)
            | (F.col("_pt") == 0)
        )
        .withColumn(
            "dist",
            F.when(F.col("term") == F.col("tok"), F.lit(0))
            .otherwise(F.lit(1))
            .cast("int"),
        )
        .select(
            "term", F.col("tok").alias("suggestion"), "dist", "tf"
        )
        .distinct()
    )
    w = W.partitionBy("term").orderBy(
        "dist", F.col("tf").desc(), "suggestion"
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
    )
