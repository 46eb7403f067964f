"""Search operator library (SURVEY.md section 2 F).

Re-expresses the reference's Elasticsearch query surface
(``services/search/app/main.py:72-147``) as DataFrame transformations:

- F1 multi-field match with boost (``:90-99``: ``title^2``): token
  term-frequency scoring, title weighted 2.0 over body 1.0.
- F1 fuzziness AUTO: ``levenshtein(token, term) <= 1``.
- F2-F5 term/keyword/range/bool filters (``:100-113``): plain column
  predicates (unscored, like ES ``bool.filter``).
- F6 relevance sort + highlight (``:116-124``): score-desc top-k and
  ``regexp_replace`` wrapping matches in ``<em>``.
- F7 hit reshaping (``:133-147``): projection of source fields +
  score + highlight.

Two physical strategies, same semantics:

1. ``score_columns`` — per-row expression scoring, one scan. Right
   when the query set is fixed and the corpus is scanned anyway.
2. ``build_inverted_index`` + ``search_via_index`` — explode to a
   (token, doc) postings table and join query terms against it. At
   100 TB the postings table is bucketed by token, so a search touches
   only matching buckets instead of scanning every document; this is
   the Spark analogue of the ES inverted index.

Scoring follows ES toward BM25: a per-term IDF factor
(``ln(1 + (N - df + 0.5)/(df + 0.5))``, the BM25 idf) weights rare
terms over common ones, so a query mixing one rare and one common term
ranks like ES does (reference search main.py:90-99 delegates to ES
BM25). Document frequencies come from one corpus aggregation
(``term_doc_frequencies``, a Q-column single-row collect — the same
bounded driver-side step as IVF centroids); the ``ln`` is evaluated
driver-side in Python so both engines (libm) agree bit-for-bit —
Spark receives the idf as a literal. Pass ``idf=None`` for raw
boosted-TF scoring (kept for fixed-corpus pipelines whose score only
gates match/no-match).

Everything else is built-in expressions (codegen-friendly); no UDFs.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TITLE_BOOST = 2.0  # reference: "title^2" (search main.py:95)
BODY_BOOST = 1.0


def tokenize(col: Column | str) -> Column:
    """Lowercase whitespace tokenizer (the engine's analyzer)."""
    return F.split(F.lower(col), " ")


def term_frequency(tokens: Column, term: str) -> Column:
    """Occurrences of ``term`` among ``tokens`` (exact match)."""
    return F.size(F.filter(tokens, lambda t: t == F.lit(term)))


def auto_fuzziness(term: str) -> int:
    """ES ``fuzziness: AUTO`` length ladder (search main.py:96): the
    allowed edit distance depends on the length of the QUERY term —
    0 edits below 3 chars, 1 for 3-5, 2 from 6 up. Computed in Python
    because the term is a query-time literal, exactly as ES derives it
    from the query string."""
    n = len(term)
    return 0 if n < 3 else (1 if n <= 5 else 2)


def fuzzy_term_frequency(
    tokens: Column, term: str, max_dist: int | None = None
) -> Column:
    """Occurrences within edit distance ``max_dist``; ``None`` applies
    the ES fuzziness=AUTO ladder for the term's length."""
    if max_dist is None:
        max_dist = auto_fuzziness(term)
    if max_dist == 0:
        return term_frequency(tokens, term)
    return F.size(
        F.filter(tokens, lambda t: F.levenshtein(t, F.lit(term)) <= max_dist)
    )


def bm25_idf(n_docs: int, df: int) -> float:
    """The BM25 idf (what ES scores with): ln(1 + (N-df+0.5)/(df+0.5)).
    Evaluated in Python (libm) so Spark literals and the DuckDB oracle
    agree bit-for-bit."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def term_doc_frequencies(
    docs: DataFrame, terms: list[str], *, body_col: str = "body"
) -> tuple[int, dict[str, int]]:
    """(corpus size, per-term document frequency) in ONE corpus scan:
    a single aggregation emits count(*) plus one df column per term.
    The single-row collect is the bounded driver-side step that turns
    dfs into idf literals (compare ivf.py's k-row centroid collect)."""
    toks = tokenize(body_col)
    aggs = [F.count("*").alias("__n")] + [
        F.sum((term_frequency(toks, t) > 0).cast("long")).alias(f"__df_{i}")
        for i, t in enumerate(terms)
    ]
    row = docs.agg(*aggs).collect()[0]
    return int(row["__n"]), {
        t: int(row[f"__df_{i}"]) for i, t in enumerate(terms)
    }


def score_columns(
    title_col: str,
    body_col: str,
    terms: list[str],
    *,
    idf: dict[str, float] | None = None,
) -> Column:
    """Boosted multi-field score: sum over terms of
    ``(2.0*tf(title) + 1.0*tf(body)) * idf(term)`` (F1). With
    ``idf=None`` the factor is omitted (raw boosted TF)."""
    title_toks = tokenize(title_col)
    body_toks = tokenize(body_col)
    score = F.lit(0.0)
    for t in terms:
        contrib = term_frequency(title_toks, t) * F.lit(
            TITLE_BOOST
        ) + term_frequency(body_toks, t) * F.lit(BODY_BOOST)
        if idf is not None:
            contrib = contrib * F.lit(idf[t])
        score = score + contrib
    return score


def highlight(col: Column | str, terms: list[str]) -> Column:
    """Wrap case-insensitive matches in <em> tags (F6,
    search main.py:120-124)."""
    out = F.col(col) if isinstance(col, str) else col
    for t in terms:
        out = F.regexp_replace(out, f"(?i)({t})", "<em>$1</em>")
    return out


def search(
    docs: DataFrame,
    terms: list[str],
    *,
    title_col: str = "title",
    body_col: str = "body",
    id_col: str = "doc_id",
    filters: list[Column] | None = None,
    size: int = 10,
    offset: int = 0,
    idf: dict[str, float] | None = None,
) -> DataFrame:
    """The full /search pipeline: bool filters (F2-F5) -> score (F1,
    TF-IDF when ``idf`` given) -> score>0 match -> sort score desc w/
    unique id tie-break (D2) -> from/size pagination -> highlight +
    reshape (F6/F7).

    Scale: filters and column pruning push into the scan; top-k is
    TakeOrderedAndProject (per-partition heads, no global sort).
    """
    df = docs
    for f in filters or []:
        df = df.filter(f)
    df = df.withColumn(
        "score", score_columns(title_col, body_col, terms, idf=idf)
    )
    df = df.filter(F.col("score") > 0)
    df = df.orderBy(F.col("score").desc(), F.col(id_col).asc())
    if offset:
        df = df.offset(offset)
    return df.limit(size).select(
        id_col,
        "score",
        F.col(title_col).alias("title"),
        highlight(title_col, terms).alias("title_highlight"),
    )


# ---------------------------------------------------------------------------
# Inverted-index strategy


def build_inverted_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    fields: dict[str, float] | None = None,
) -> DataFrame:
    """Postings table: (token, doc_id, weighted_tf).

    ``fields`` maps column name -> boost (default title^2/body^1,
    mirroring the ES mapping in event main.py:79-127). At scale, write
    this bucketed/partitioned by token so query joins prune to the
    buckets of the query's terms.
    """
    fields = fields or {"title": TITLE_BOOST, "body": BODY_BOOST}
    parts = []
    for colname, boost in fields.items():
        parts.append(
            docs.select(
                F.col(id_col),
                F.explode(tokenize(colname)).alias("token"),
            )
            .groupBy(id_col, "token")
            .agg((F.count("*") * F.lit(boost)).alias("weighted_tf"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy(id_col, "token").agg(
        F.sum("weighted_tf").alias("weighted_tf")
    )


def search_via_index(
    index: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    idf: dict[str, float] | None = None,
) -> DataFrame:
    """Score docs by joining query terms against the postings table —
    touches only rows whose token matches (partition-pruned when the
    index is bucketed by token). With ``idf``, each term's weighted tf
    is multiplied by its idf before the per-doc sum (the idf rides the
    broadcast query table, so the postings side stays untouched) —
    bit-identical to the expression strategy's TF-IDF score."""
    spark = index.sparkSession
    if idf is None:
        q = spark.createDataFrame([(t,) for t in terms], ["token"])
        contrib = F.col("weighted_tf")
    else:
        q = spark.createDataFrame(
            [(t, float(idf[t])) for t in terms], ["token", "idf"]
        )
        contrib = F.col("weighted_tf") * F.col("idf")
    return (
        index.join(F.broadcast(q), "token")
        .groupBy(id_col)
        .agg(F.sum(contrib).alias("score"))
    )


# ---------------------------------------------------------------------------
# positional index + phrase matching (ES match_phrase analogue)


def build_positional_index(
    docs: DataFrame, *, id_col: str = "doc_id", body_col: str = "body"
) -> DataFrame:
    """Positional postings: (token, doc_id, pos), 1-based positions.

    The positional sibling of ``build_inverted_index`` — what ES
    stores to answer match_phrase (reference search main.py exposes
    multi_match; phrase is the standard companion). At scale, write
    bucketed by token so a phrase query's legs prune to its terms'
    buckets.
    """
    return docs.select(
        F.col(id_col),
        F.posexplode(tokenize(body_col)).alias("pos0", "token"),
    ).select(id_col, "token", (F.col("pos0") + 1).alias("pos"))


def phrase_search(
    index: DataFrame, phrase: list[str], *, id_col: str = "doc_id"
) -> DataFrame:
    """Docs containing the exact token sequence, with its frequency.

    k-way positional self-join: leg i keeps postings of phrase[i] and
    normalizes to the would-be start position (pos - i); an occurrence
    exists where all k legs agree on (doc, start). Each leg is
    filtered to ONE token before any join — the scan prunes to the
    phrase's terms (never a full-postings join) and the equi-joins
    shuffle on (doc, start). Repeated phrase tokens work because legs
    are positionally disjoint by construction.
    """
    base = None
    for i, term in enumerate(phrase):
        leg = index.filter(F.col("token") == term).select(
            F.col(id_col), (F.col("pos") - i).alias("start")
        )
        base = leg if base is None else base.join(leg, [id_col, "start"])
    return base.groupBy(id_col).agg(F.count("*").alias("phrase_freq"))


# --- full BM25 (TF saturation + document-length normalization) -----------

BM25_K1 = 1.2
BM25_B = 0.75


def corpus_search_stats(
    docs: DataFrame, terms: list[str], *, body_col: str = "body"
) -> tuple[int, dict[str, int], float]:
    """(corpus size, per-term df, average body token length) in ONE
    corpus aggregation — the bounded single-row collect that feeds
    idf/avgdl literals. avgdl is exact-integer token totals divided
    once, so the DuckDB oracle (SUM(dl)::DOUBLE / COUNT) reproduces
    the identical float."""
    toks = tokenize(body_col)
    aggs = (
        [F.count("*").alias("__n"), F.sum(F.size(toks)).alias("__toks")]
        + [
            F.sum((term_frequency(toks, t) > 0).cast("long")).alias(
                f"__df_{i}"
            )
            for i, t in enumerate(terms)
        ]
    )
    row = docs.agg(*aggs).collect()[0]
    n = int(row["__n"])
    return (
        n,
        {t: int(row[f"__df_{i}"]) for i, t in enumerate(terms)},
        float(row["__toks"]) / float(n),
    )


def score_columns_bm25(
    title_col: str,
    body_col: str,
    terms: list[str],
    *,
    idf: dict[str, float],
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> Column:
    """FULL BM25 over the boosted multi-field TF (the BM25F-lite shape
    ES's combined-fields query uses): per term,

        idf * wtf*(k1+1) / (wtf + k1*(1 - b + b*dl/avgdl))

    with wtf = 2*tf(title) + 1*tf(body) and dl the body token count.
    Saturation caps a term's contribution (the 50th repetition of
    'spark' adds ~nothing — raw TF ranks spammy docs first) and the
    dl/avgdl norm stops long documents from winning on bulk. Every
    operand is cast/ordered exactly as the DuckDB oracle writes it, so
    the chained IEEE ops produce bit-identical doubles."""
    title_toks = tokenize(title_col)
    body_toks = tokenize(body_col)
    dl = F.size(body_toks).cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * (dl / F.lit(avgdl))
    )
    score = F.lit(0.0)
    for t in terms:
        wtf = (
            term_frequency(title_toks, t) * F.lit(TITLE_BOOST)
            + term_frequency(body_toks, t) * F.lit(BODY_BOOST)
        )
        sat = wtf * F.lit(k1 + 1.0) / (wtf + norm)
        score = score + F.lit(idf[t]) * sat
    return score


def more_like_this(
    docs: DataFrame,
    source_id,
    *,
    id_col: str = "doc_id",
    body_col: str = "text",
    max_terms: int = 5,
    k: int = 10,
) -> DataFrame:
    """ES ``more_like_this`` analogue (the similarity query the
    reference's ES index supports but /search never exposes): select
    the source document's most characteristic terms — top
    ``max_terms`` by tf(source) x idf — then rank the rest of the
    corpus by the summed idf-weight of matching term occurrences.

    Exactness spec: idf is QUANTIZED to integer micro-units
    (floor(bm25_idf * 1e6 + 0.5), the repo's floor(x+0.5) rounding
    convention), so every score is a BIGINT sum — order-insensitive
    and bit-identical cross-engine, unlike a float sum whose
    association order differs between a Spark expression tree and a
    SQL SUM. Driver-side steps are two bounded collects (the source
    row + one df aggregation row — the ivf.py centroid pattern);
    corpus scoring stays a single codegen'd scan.
    """
    src_tokens = (
        docs.filter(F.col(id_col) == source_id)
        .select(F.explode(tokenize(body_col)).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("tf"))
        .collect()
    )
    tf_src = {r["tok"]: int(r["tf"]) for r in src_tokens}
    n_docs, dfs = term_doc_frequencies(
        docs, sorted(tf_src), body_col=body_col
    )
    qidf = {
        t: int(math.floor(bm25_idf(n_docs, dfs[t]) * 1e6 + 0.5))
        for t in tf_src
    }
    top = sorted(tf_src, key=lambda t: (-tf_src[t] * qidf[t], t))[:max_terms]
    toks = tokenize(body_col)
    score = sum(
        (term_frequency(toks, t).cast("long") * F.lit(qidf[t])
         for t in top),
        F.lit(0).cast("long"),
    )
    return (
        docs.filter(F.col(id_col) != source_id)
        .withColumn("mlt_score", score)
        .filter(F.col("mlt_score") > 0)
        .orderBy(F.col("mlt_score").desc(), F.col(id_col))
        .select(id_col, "mlt_score")
        .limit(k)
    )
