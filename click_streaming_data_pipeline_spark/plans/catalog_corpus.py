"""Corpus-curation catalog (beyond-reference extension family, next to
catalog_extensions): deterministic dataset splits, C4/Gopher quality
heuristics, benchmark-contamination checks, stratified sampling —
the curation passes an LLM training-data pipeline runs over the raw
corpus before dedup/tokenization.

Oracle notes: buckets are md5-hex prefix ranges compared as strings
(engine-portable, like the MinHash oracle); fractions divide exact
integers so IEEE doubles match bit-for-bit; thresholds are cast to
DOUBLE (DuckDB numeric literals are DECIMAL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..extensions.corpus import (
    QUALITY_STOPWORDS,
    contamination_counts,
    dataset_split,
    dataset_split_col,
    quality_heuristics,
    stratified_sample_summary,
)
from ..extensions.text import (
    RARE_FRAC_MAX,
    RARE_PPM,
    lm_quality_score,
    tfidf_keywords,
)
from ..functions.quality import (
    EMAIL_RE,
    PHONE_RE,
    quality_check_columns,
    quality_oracle_exprs,
)
from ..sources import load_table
from .catalog_extensions import _JACCARD_SQL
from .registry import query

# ---------------------------------------------------------------------------
# shared oracle fragments

_BUCKET = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)"
_TOKS = "string_split(lower(text), ' ')"

_PROBES = [
    "batch batch batch",
    "merge part window",
    "spark window window",
    "gradient descent update",
    "held out benchmark",
]

_STRATA_HEX = {"en": "cd", "es": "80", "de": "80", "fr": "80", "zh": "40"}


def _bpe_train_ctes(n_merges: int = 10) -> str:
    """CTE chain replaying ``extensions.text.bpe_merges`` in SQL: the
    fixed merge count unrolls into one (pair-count, argmax, rewrite)
    CTE group per rank. All arithmetic is integer (weighted pair
    counts) and all tie-breaks are total orders (count desc, pair
    asc), so the replay is exact. The greedy left-to-right
    non-overlapping rewrite — a sequential fold on the Spark side —
    becomes a gaps-and-islands parity: a matched position is taken
    iff its offset inside its maximal run of consecutive matches is
    even, and a position is consumed iff its predecessor was taken
    (take at p and p+1 simultaneously is impossible: consecutive
    island members alternate). Ends with ``t1..t{n}`` (the learned
    merges) and ``wd{n}`` (every word's fully-rewritten symbols —
    which IS the encode-stage vocabulary, since the rewrite never
    depends on frequency)."""
    head = """
        wd0 AS MATERIALIZED (
            SELECT w, freq,
                   list_append(list_transform(
                       generate_series(1, length(w)), i -> w[i]),
                       '</w>') AS symbols
            FROM (
                SELECT w, CAST(count(*) AS BIGINT) AS freq
                FROM (
                    SELECT unnest(string_split(lower(text), ' ')) AS w
                    FROM documents
                ) WHERE w <> ''
                GROUP BY w
            )
        )"""
    its = []
    for j in range(1, n_merges + 1):
        its.append(f""",
        pc{j} AS (
            SELECT l, r, sum(freq) AS n FROM (
                SELECT freq, symbols[pos] AS l, symbols[pos + 1] AS r
                FROM (
                    SELECT freq, symbols,
                           unnest(generate_series(1, len(symbols) - 1))
                               AS pos
                    FROM wd{j - 1}
                )
            ) GROUP BY l, r
        ),
        t{j} AS MATERIALIZED (
            SELECT l, r, CAST(n AS BIGINT) AS n FROM pc{j}
            ORDER BY n DESC, l ASC, r ASC LIMIT 1
        ),
        rx{j} AS (
            SELECT w, freq, pos, symbols[pos] AS s,
                   coalesce(symbols[pos] = (SELECT l FROM t{j})
                        AND symbols[pos + 1] = (SELECT r FROM t{j}),
                        FALSE) AS m
            FROM (
                SELECT w, freq, symbols,
                       unnest(generate_series(1, len(symbols))) AS pos
                FROM wd{j - 1}
            )
        ),
        tk{j} AS (
            SELECT w, freq, pos, s, m,
                   CASE WHEN m THEN
                       (pos - min(pos) OVER (PARTITION BY w, grp))
                           % 2 = 0
                   ELSE FALSE END AS take
            FROM (
                SELECT *, pos - row_number() OVER (
                           PARTITION BY w, m ORDER BY pos) AS grp
                FROM rx{j}
            )
        ),
        wd{j} AS MATERIALIZED (
            SELECT w, freq,
                   list(CASE WHEN take THEN
                            (SELECT l FROM t{j}) || (SELECT r FROM t{j})
                        ELSE s END ORDER BY pos)
                       FILTER (WHERE take
                               OR NOT coalesce(prev_take, FALSE))
                       AS symbols
            FROM (
                SELECT *, lag(take) OVER (
                           PARTITION BY w ORDER BY pos) AS prev_take
                FROM tk{j}
            )
            GROUP BY w, freq
        )""")
    return head + "".join(its)


def _bpe_ranks_oracle(n_merges: int = 10) -> str:
    """SQL twin of ``bpe_merge_ranks``: the per-round argmax rows."""
    rows = "\n        UNION ALL\n".join(
        f"""        SELECT CAST({j - 1} AS BIGINT) AS rank,
               l AS "left", r AS "right", n AS pair_count
        FROM t{j}"""
        for j in range(1, n_merges + 1)
    )
    return f"""
        WITH {_bpe_train_ctes(n_merges)}
{rows}
    """


def _bpe_encode_oracle(n_merges: int = 10) -> str:
    """SQL twin of ``bpe_encode`` applied to the merges learned on
    the same corpus: the trained chain's ``wd{{n}}`` already holds
    every word's encoded form, so encoding = join the (doc, pos,
    word) spine to it and reassemble in word order."""
    return f"""
        WITH {_bpe_train_ctes(n_merges)},
        sp0 AS (
            SELECT doc_id, string_split(lower(text), ' ') AS t
            FROM documents
        ),
        spine AS (
            SELECT doc_id, pos, t[pos] AS w FROM (
                SELECT doc_id, t,
                       unnest(generate_series(1, len(t))) AS pos
                FROM sp0
            ) WHERE t[pos] <> ''
        ),
        assembled AS (
            SELECT s.doc_id,
                   flatten(list(e.symbols ORDER BY s.pos)) AS toks
            FROM spine s JOIN wd{n_merges} e ON e.w = s.w
            GROUP BY s.doc_id
        )
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               array_to_string(toks, ' ') AS tokens
        FROM assembled
    """


@query(
    "dataset_split",
    oracle=f"""
        SELECT doc_id,
               {_BUCKET} AS bucket,
               CASE WHEN {_BUCKET} < 'cd' THEN 'train'
                    WHEN {_BUCKET} < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    doc=(
        "extension (corpus curation): deterministic train/val/test "
        "split by hashed-id bucket range (~80/10/10) — stable under "
        "resharding/appends, no RNG; pure expression, one codegen pass"
    ),
    tags=("corpus",),
)
def dataset_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dataset_split(load_table(spark, sf_dir, "documents"))


_STOPS_SQL = ", ".join(f"'{s}'" for s in QUALITY_STOPWORDS)

_QH_CTE = f"""
base AS (
    SELECT doc_id, {_TOKS} AS t FROM documents
),
sh AS (
    SELECT doc_id, t,
           CASE WHEN len(t) >= 3
                THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                      for i in generate_series(1, len(t)-2)]
                ELSE CAST([] AS VARCHAR[]) END AS s
    FROM base
),
m AS (
    SELECT doc_id,
           len(t) AS n_tokens,
           CASE WHEN len(t) > 0
                THEN list_aggregate(list_transform(t, x -> len(x)), 'sum')
                     / len(t)
                ELSE CAST(0.0 AS DOUBLE) END AS mean_token_len,
           len(list_filter(t, x -> regexp_matches(x, '^[a-z]+$')))
               / len(t) AS alpha_frac,
           len(list_filter(t, x -> x IN ({_STOPS_SQL})))
               / len(t) AS stopword_frac,
           CASE WHEN len(s) > 0
                THEN CAST(1.0 AS DOUBLE)
                     - len(list_distinct(s)) / len(s)
                ELSE CAST(0.0 AS DOUBLE) END AS dup_3gram_frac
    FROM sh
)
"""


@query(
    "corpus_quality_heuristics",
    oracle=f"""
        WITH {_QH_CTE}
        SELECT doc_id, n_tokens, mean_token_len, alpha_frac,
               stopword_frac, dup_3gram_frac,
               (n_tokens >= 20 AND n_tokens <= 1000
                AND mean_token_len >= CAST(3.0 AS DOUBLE)
                AND mean_token_len <= CAST(10.0 AS DOUBLE)
                AND dup_3gram_frac <= CAST(0.25 AS DOUBLE))
               AS quality_ok
        FROM m
    """,
    doc=(
        "extension (corpus curation): C4/Gopher-style quality "
        "heuristics in one codegen pass — token count, mean token "
        "length, alphabetic/stopword fractions, duplicate-3-gram "
        "fraction (within-doc repetition), combined accept flag"
    ),
    tags=("corpus", "text"),
)
def corpus_quality_heuristics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_heuristics(load_table(spark, sf_dir, "documents"))


_CONTAM_SQL = "\nUNION ALL\n".join(
    f"SELECT '{p}' AS probe, "
    f"(SELECT count(*) FROM documents "
    f"WHERE strpos(lower(text), '{p}') > 0) AS n_docs"
    for p in _PROBES
)


@query(
    "contamination_check",
    oracle=_CONTAM_SQL,
    doc=(
        "extension (corpus curation): benchmark-contamination scan — "
        "per probe phrase, how many documents contain it verbatim; "
        "all probes tested in ONE corpus scan (literal probe array, "
        "no join); at scale large probe sets become an n-gram "
        "inverted-index semi-join like search_via_index"
    ),
    tags=("corpus",),
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return contamination_counts(docs, _PROBES)


_STRATA_CASE = "CASE " + " ".join(
    f"WHEN lang = '{s}' THEN '{h}'" for s, h in sorted(_STRATA_HEX.items())
) + " END"


@query(
    "pii_redaction",
    oracle=f"""
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
                   '{PHONE_RE}', '[PHONE]', 'g') AS redacted_text,
               len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones
        FROM documents
    """,
    doc=(
        "extension (corpus curation): PII redaction — the actionable "
        "transform behind G11/H2's pii_detection signal: replace "
        "every email/phone match with a placeholder token and count "
        "the redactions (RE2-compatible patterns shared with the "
        "quality scorer so both engines agree on every input); pure "
        "expressions, one codegen pass"
    ),
    tags=("corpus", "text"),
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_RE, "[EMAIL]"),
            PHONE_RE,
            "[PHONE]",
        ).alias("redacted_text"),
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)).alias(
            "n_phones"
        ),
    )


@query(
    "dedup_keep_best",
    # clusters from the LSH pipeline == the recursive-CTE closure of
    # the exact Jaccard pair graph (same equivalence dedup_clusters
    # relies on); the winner is the quality argmax with doc_id
    # tie-break — a total order, so the keep flag is deterministic.
    oracle=f"""
        WITH RECURSIVE pairs AS ({_JACCARD_SQL}),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach (id, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.lbl
            FROM reach r JOIN edges e ON e.src = r.id
        ),
        clusters AS (
            SELECT id AS doc_id, min(lbl) AS cluster_id
            FROM reach GROUP BY id
        ),
        scored AS (
            SELECT doc_id,
                   ({quality_oracle_exprs()['quality_score']})
                       AS quality_score
            FROM documents
        )
        SELECT c.cluster_id, c.doc_id, s.quality_score,
               (row_number() OVER (
                    PARTITION BY c.cluster_id
                    ORDER BY s.quality_score DESC, c.doc_id ASC
                ) = 1) AS keep
        FROM clusters c JOIN scored s ON s.doc_id = c.doc_id
    """,
    doc=(
        "extension (corpus curation): near-dup resolution END-TO-END — "
        "LSH clusters joined with the H2 quality score; each cluster "
        "keeps its highest-quality member (doc_id tie-break). The "
        "'which copy survives' operator a curation pipeline actually "
        "ships; the reference's LWW upsert (I4) keeps newest — this "
        "keeps best."
    ),
    tags=("corpus", "dedup"),
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import minhash_lsh_dedup, neardup_clusters

    from ..functions.quality import with_quality_columns

    docs = load_table(spark, sf_dir, "documents")
    clusters = neardup_clusters(minhash_lsh_dedup(docs, threshold=0.8))
    scored = with_quality_columns(docs, names=("quality_score",)).select(
        "doc_id", "quality_score"
    )
    member = clusters.join(scored, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return member.select(
        "cluster_id",
        "doc_id",
        "quality_score",
        (F.row_number().over(w) == 1).alias("keep"),
    )


@query(
    "stratified_sample",
    oracle=f"""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN {_BUCKET} < {_STRATA_CASE}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(len({_TOKS})) AS BIGINT) AS tokens_total,
               CAST(sum(CASE WHEN {_BUCKET} < {_STRATA_CASE}
                        THEN len({_TOKS}) ELSE 0 END) AS BIGINT)
                   AS tokens_kept
        FROM documents
        GROUP BY lang
    """,
    doc=(
        "extension (corpus curation): stratified deterministic "
        "downsampling report — per language, docs/tokens total and "
        "kept under per-stratum md5-bucket quotas (keep ~80% en, ~50% "
        "es/de/fr, ~25% zh): the 'balance the language mix to a token "
        "budget' operator; selection is a pure expression, summary is "
        "one partial-agg shuffle"
    ),
    tags=("corpus", "agg"),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample_summary(docs, _STRATA_HEX)


# empty tokens filtered on BOTH engines (twin: the F.filter in
# extensions/text.py::_doc_tokens) — makes every LM/TF-IDF count
# independent of how either engine's split treats ''/'  ' texts
_LM_CTE = f"""
tok AS (
    SELECT doc_id,
           unnest(list_filter({_TOKS}, x -> x != '')) AS token
    FROM documents
),
lm AS (
    SELECT token, count(*) AS tok_count FROM tok GROUP BY 1
),
tot AS (
    SELECT sum(tok_count) AS lm_total FROM lm
)
"""


@query(
    "lm_quality_score",
    oracle=f"""
        WITH {_LM_CTE}
        SELECT doc_id,
               count(*) AS n_tokens,
               CAST(sum(tok_count) AS BIGINT) AS sum_count,
               round(CAST(sum(tok_count) AS DOUBLE)
                   / (count(*) * (SELECT lm_total FROM tot)), 9)
                   AS mean_token_prob,
               CAST(sum(CASE WHEN tok_count * 1000000
                             < (SELECT lm_total FROM tot) * {RARE_PPM}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
               round(CAST(sum(CASE WHEN tok_count * 1000000
                             < (SELECT lm_total FROM tot) * {RARE_PPM}
                        THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 9)
                   AS rare_frac,
               (round(CAST(sum(CASE WHEN tok_count * 1000000
                              < (SELECT lm_total FROM tot) * {RARE_PPM}
                         THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 9)
                   <= CAST({RARE_FRAC_MAX} AS DOUBLE)) AS lm_accept
        FROM tok JOIN lm USING (token)
        GROUP BY doc_id
    """,
    doc=(
        "extension (corpus curation): CCNet-style corpus-LM quality "
        "filter — train a unigram LM over the corpus (one vocab-"
        "bounded groupBy), broadcast it back, score every document by "
        "mean token probability + rare-token fraction, emit the "
        "accept flag. Specified in probability space (integer sums, "
        "exactly-rounded divisions) because ln is not bit-portable "
        "across engines; the filter is a quantile cut either way. "
        "Only corpus-wide shuffle: the final groupBy on doc_id."
    ),
    tags=("bench", "corpus", "text"),
)
def lm_quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_quality_score(load_table(spark, sf_dir, "documents"))


@query(
    "tfidf_keywords",
    oracle=f"""
        WITH {_LM_CTE},
        tf AS (
            SELECT doc_id, token, count(*) AS tf
            FROM tok GROUP BY 1, 2
        ),
        dft AS (
            SELECT token, count(*) AS df FROM tf GROUP BY 1
        )
        SELECT doc_id, rank, token, tf, df, tfidf FROM (
            SELECT doc_id, token, tf, df,
                   CAST(tf AS DOUBLE) / df AS tfidf,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY CAST(tf AS DOUBLE) / df DESC, token ASC
                   ) AS rank
            FROM tf JOIN dft USING (token)
        )
        WHERE rank <= 3
    """,
    doc=(
        "extension (corpus curation): TF-IDF keyword extraction — "
        "top-3 tokens per document by rarity-weighted term frequency "
        "(tf/df; idf as 1/df keeps the score one exactly-rounded "
        "division, bit-portable where log(N/df) is not). tf is one "
        "(doc, token) groupBy; df derives from tf's vocab-bounded "
        "projection and broadcasts back; deterministic token ASC "
        "tie-break."
    ),
    tags=("corpus", "text"),
)
def tfidf_keywords_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_keywords(load_table(spark, sf_dir, "documents"))


@query(
    "normalize_text",
    oracle=r"""
        SELECT doc_id,
               trim(regexp_replace(
                   regexp_replace(text, '[\x00-\x1f\x7f]', ' ', 'g'),
                   ' {2,}', ' ', 'g')) AS normalized_text,
               length(text)
                 - length(trim(regexp_replace(
                       regexp_replace(text, '[\x00-\x1f\x7f]', ' ', 'g'),
                       ' {2,}', ' ', 'g'))) AS chars_removed
        FROM documents
    """,
    doc=(
        "extension (corpus curation): text normalization — control "
        "chars -> space, whitespace runs collapsed, trimmed; the "
        "canonical form every dedup/hash pass should consume "
        "(normalization drift is a classic source of missed exact "
        "dups). Pure expressions, one codegen pass; planted pytest "
        "exercises the dirty-input cases the clean corpus lacks."
    ),
    tags=("corpus", "text"),
)
def normalize_text_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.corpus import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text("text")
    return docs.select(
        "doc_id",
        norm.alias("normalized_text"),
        (F.length("text") - F.length(norm)).alias("chars_removed"),
    )


@query(
    "pack_sequences",
    oracle="""
        WITH toks AS (
            SELECT lang AS shard, doc_id,
                   len(list_filter(string_split(text, ' '),
                                   x -> x != '')) AS n_tokens
            FROM documents
        ),
        runs AS (
            SELECT shard, doc_id, n_tokens,
                   CAST(sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) - n_tokens AS BIGINT) AS start_offset
            FROM toks
        )
        SELECT shard, doc_id, n_tokens, start_offset,
               CAST(start_offset // 512 AS BIGINT) AS bin_id
        FROM runs
    """,
    doc=(
        "extension (corpus curation): SEQUENCE PACKING — docs line up "
        "per shard (language) in id order and 512-token bins start "
        "every budget tokens; the deterministic packing step that "
        "turns a ragged corpus into fixed-budget training sequences. "
        "Running sums are inherently sequential, so packing shards by "
        "a partition key (one window pass per shard, no global sort); "
        "all integer math — bit-exact across engines."
    ),
    tags=("corpus", "window"),
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.corpus import pack_sequences

    return pack_sequences(load_table(spark, sf_dir, "documents"))


_BIGRAM_KNOWN = (
    "sum(CASE WHEN c.bg_count IS NOT NULL THEN 1 ELSE 0 END)"
)


@query(
    "bigram_fluency",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, {_TOKS} AS t FROM documents
        ),
        bg0 AS (
            SELECT doc_id,
                   unnest(CASE WHEN len(t) >= 2
                          THEN [t[i] || ' ' || t[i+1]
                                for i in generate_series(1, len(t)-1)]
                          ELSE CAST([] AS VARCHAR[]) END) AS bigram
            FROM tok
        ),
        counts AS (
            SELECT bigram, count(*) AS bg_count
            FROM bg0 GROUP BY 1 HAVING count(*) >= 2
        )
        SELECT doc_id,
               count(*) AS n_bigrams,
               CAST({_BIGRAM_KNOWN} AS BIGINT) AS n_known,
               CAST({_BIGRAM_KNOWN} AS DOUBLE) / count(*) AS known_frac,
               (CAST({_BIGRAM_KNOWN} AS DOUBLE) / count(*)
                   >= CAST(0.5 AS DOUBLE)) AS fluency_accept
        FROM bg0 LEFT JOIN counts c USING (bigram)
        GROUP BY doc_id
    """,
    doc=(
        "extension (corpus curation): bigram-LM fluency filter — "
        "fraction of each document's token TRANSITIONS seen >= 2 "
        "times corpus-wide; the sequence-aware sibling of "
        "lm_quality_score (word-salad keeps a plausible unigram "
        "profile; its transitions don't). Bigram table is "
        "vocab^2-bounded/long-tail-sparse -> broadcast after the "
        "min-count filter; integer sums + one exact division."
    ),
    tags=("corpus", "text"),
)
def bigram_fluency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.text import bigram_fluency

    return bigram_fluency(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# cross-document boilerplate removal (CCNet-style segment dedup)


@query(
    "boilerplate_removal",
    oracle="""
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        idx AS (
            SELECT doc_id, t,
                   unnest(generate_series(
                       0, CAST((len(t) - 1) // 3 AS BIGINT))) AS seg_idx
            FROM base
        ),
        seg2 AS (
            SELECT doc_id, seg_idx,
                   array_to_string(
                       t[seg_idx * 3 + 1 : seg_idx * 3 + 3], ' ') AS seg
            FROM idx
        ),
        dfc AS (
            SELECT seg, count(DISTINCT doc_id) AS seg_df
            FROM seg2 GROUP BY seg
        ),
        j AS (
            SELECT s.doc_id, s.seg_idx, s.seg, d.seg_df
            FROM seg2 s JOIN dfc d USING (seg)
        )
        SELECT doc_id,
               count(*) AS n_segments,
               CAST(sum(CASE WHEN seg_df >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_boiler,
               coalesce(string_agg(CASE WHEN seg_df < 2 THEN seg END,
                                   ' ' ORDER BY seg_idx), '')
                   AS clean_text
        FROM j GROUP BY doc_id
    """,
    doc=(
        "extension (corpus curation): cross-document BOILERPLATE "
        "REMOVAL, the CCNet/RefinedWeb line-dedup pass — split docs "
        "into non-overlapping 3-token segments, count corpus-wide "
        "document frequency per segment, drop segments in >= 2 docs, "
        "reassemble clean text in order. One explode + one df groupBy "
        "+ one join back; never all-pairs."
    ),
    tags=("corpus", "dedup"),
)
def boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.corpus import boilerplate_segments

    return boilerplate_segments(load_table(spark, sf_dir, "documents"))


@query(
    "corpus_vocabulary",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        )
        SELECT token, count(*) AS tf,
               count(DISTINCT doc_id) AS df
        FROM tok GROUP BY token
        ORDER BY tf DESC, token LIMIT 100
    """,
    doc=(
        "extension (corpus curation): corpus VOCABULARY table — "
        "term frequency + document frequency per token, top-100 by "
        "frequency with the token itself as total-order tie-break. "
        "The df side feeds max_df caps (jaccard_pairs) and IDF "
        "weighting (search, tfidf_keywords); one explode + one "
        "groupBy + TakeOrdered — the word-count shape, never a "
        "global sort."
    ),
    tags=("corpus", "text"),
)
def corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), "token")
        .limit(100)
    )


@query(
    "source_mixture_weights",
    oracle="""
        WITH s AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents
            GROUP BY source
        )
        SELECT source, n_docs, n_tokens,
               CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE)
                   AS token_share,
               least(
                   CAST(1.0 AS DOUBLE),
                   CAST(sum(n_tokens) OVER () AS DOUBLE)
                       * CAST(0.05 AS DOUBLE)
                       / CAST(n_tokens AS DOUBLE)
               ) AS sample_weight
        FROM s
    """,
    doc=(
        "extension (corpus curation): domain-mixture rebalancing — "
        "per-source token totals and the min(1, target/actual) "
        "sampling weight that downsamples over-represented domains "
        "(the Pile/DoReMi mixture step); one partial-agg shuffle to "
        "#sources rows, global total via a window over the aggregate"
    ),
    tags=("corpus",),
)
def source_mixture_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.corpus import source_mixture_weights

    return source_mixture_weights(load_table(spark, sf_dir, "documents"))


@query(
    "filter_attrition",
    oracle=f"""
        WITH {_QH_CTE},
        agg AS (
            SELECT CAST(count(*) AS BIGINT) AS total,
                   CAST(sum(CASE WHEN n_tokens < 20
                            THEN 1 ELSE 0 END) AS BIGINT) AS f1,
                   CAST(sum(CASE WHEN n_tokens >= 20 AND n_tokens > 1000
                            THEN 1 ELSE 0 END) AS BIGINT) AS f2,
                   CAST(sum(CASE WHEN n_tokens >= 20 AND n_tokens <= 1000
                                  AND (mean_token_len < CAST(3.0 AS DOUBLE)
                                       OR mean_token_len > CAST(10.0 AS DOUBLE))
                            THEN 1 ELSE 0 END) AS BIGINT) AS f3,
                   CAST(sum(CASE WHEN n_tokens >= 20 AND n_tokens <= 1000
                                  AND mean_token_len >= CAST(3.0 AS DOUBLE)
                                  AND mean_token_len <= CAST(10.0 AS DOUBLE)
                                  AND dup_3gram_frac > CAST(0.25 AS DOUBLE)
                            THEN 1 ELSE 0 END) AS BIGINT) AS f4
            FROM m
        )
        SELECT CAST(1 AS BIGINT) AS stage_idx, 'min_tokens' AS stage,
               total AS n_in, f1 AS n_fail, total - f1 AS n_out FROM agg
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'max_tokens',
               total - f1, f2, total - f1 - f2 FROM agg
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'mean_token_len',
               total - f1 - f2, f3, total - f1 - f2 - f3 FROM agg
        UNION ALL
        SELECT CAST(4 AS BIGINT), 'repetition',
               total - f1 - f2 - f3, f4,
               total - f1 - f2 - f3 - f4 FROM agg
    """,
    doc=(
        "extension (corpus curation): filter-funnel ATTRITION report — "
        "per-stage n_in/n_fail/n_out with docs charged to the FIRST "
        "failing gate, pipeline order (Gopher token gates → repetition); "
        "the per-snapshot observability table a curation pipeline "
        "publishes; one conditional-count aggregate row exploded into "
        "stage rows"
    ),
    tags=("corpus",),
)
def filter_attrition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.corpus import filter_attrition

    return filter_attrition(load_table(spark, sf_dir, "documents"))


@query(
    "rag_passage_chunks",
    oracle="""
        WITH tok AS (
            SELECT doc_id, string_split(lower(text), ' ') AS t
            FROM documents
        ),
        p AS (
            SELECT doc_id, t,
                   unnest(generate_series(
                       0,
                       CAST(ceil(greatest(len(t) - 32, 0) / 24.0)
                            AS BIGINT)
                   )) AS passage_idx
            FROM tok
        )
        SELECT doc_id,
               CAST(passage_idx AS BIGINT) AS passage_idx,
               array_to_string(
                   t[passage_idx * 24 + 1 : passage_idx * 24 + 32], ' '
               ) AS passage,
               CAST(least(len(t) - passage_idx * 24, 32) AS BIGINT)
                   AS n_tokens
        FROM p
    """,
    doc=(
        "extension (RAG curation): overlapping fixed-token PASSAGE "
        "CHUNKS (window 32, stride 24) per document — the chunking "
        "step before embedding for retrieval; 1:N fan-out entirely "
        "inside the scan stage (sequence + transform + explode), no "
        "shuffle"
    ),
    tags=("corpus", "text"),
)
def rag_passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.corpus import passage_chunks

    return passage_chunks(load_table(spark, sf_dir, "documents"))


@query(
    "bpe_merge_ranks",
    # the fixed merge count unrolls: one argmax CTE group per rank,
    # greedy rewrite as a gaps-and-islands parity — exact replay
    oracle=_bpe_ranks_oracle(),
    doc=(
        "extension (tokenization): BPE TOKENIZER TRAINING - learn the "
        "first 10 merge ranks from the corpus (token_stats counts "
        "with a fixed tokenizer; this LEARNS one). Per iteration: "
        "explode word symbols into adjacent pairs, one partial-agg "
        "groupBy, deterministic argmax (count desc, pair asc), then "
        "rewrite every word by a pure fold expression - no UDF; the "
        "working set is the VOCABULARY (not the corpus) after the "
        "first groupBy, so iteration cost is corpus-size-independent "
        "at 100 TB. Rows-only at the driver; the pure-python oracle "
        "pytest replays the algorithm exactly."
    ),
    tags=("corpus", "text"),
)
def bpe_merge_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.text import bpe_merges

    return bpe_merges(load_table(spark, sf_dir, "documents"))


@query(
    "bpe_encode",
    # train+apply replay: the unrolled trainer's final word table IS
    # the encode vocabulary (rewrites don't depend on frequency)
    oracle=_bpe_encode_oracle(),
    doc=(
        "extension (tokenization): BPE ENCODE - tokenize the corpus "
        "with the merge table bpe_merge_ranks LEARNS (train->apply "
        "round-trip, replayed exactly by the pure-python oracle "
        "pytest). The merge chain runs over the DISTINCT word table "
        "(vocabulary-sized, corpus-byte-independent), encoded forms "
        "hash-join back to the (doc, pos, word) spine and re-assemble "
        "in word order - one vocab groupBy + one join + one doc "
        "aggregation, merges as pure fold expressions, no UDF. "
        "Rows-only at the driver (iterative spec)."
    ),
    tags=("corpus", "text"),
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.text import bpe_encode, bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in bpe_merges(docs).orderBy("rank").collect()
    ]
    return bpe_encode(docs, merges)


@query(
    "corpus_health_report",
    oracle=f"""
        WITH {_QH_CTE},
        per_doc AS (
            SELECT d.doc_id, d.source,
                   (m.n_tokens >= 20 AND m.n_tokens <= 1000
                    AND m.mean_token_len >= CAST(3.0 AS DOUBLE)
                    AND m.mean_token_len <= CAST(10.0 AS DOUBLE)
                    AND m.dup_3gram_frac <= CAST(0.25 AS DOUBLE))
                       AS q_ok,
                   m.n_tokens,
                   count(*) OVER (PARTITION BY md5(d.text)) > 1
                       AS is_exact_dup
            FROM documents d JOIN m ON d.doc_id = m.doc_id
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_quality_ok,
               CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS quality_ok_frac,
               CAST(sum(CASE WHEN is_exact_dup THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exact_dup,
               CAST(sum(CASE WHEN is_exact_dup THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*) AS exact_dup_frac
        FROM per_doc
        GROUP BY source
    """,
    doc=(
        "extension (corpus curation, capstone): per-source CORPUS "
        "HEALTH REPORT - one pass composes the Gopher quality gates, "
        "token totals, and exact-dup incidence (window count over the "
        "content hash) into the per-domain dashboard a curation "
        "pipeline publishes per snapshot; the dedup window shuffles "
        "on the 16-byte md5 key, everything else rides the "
        "quality_heuristics codegen pass + one source groupBy"
    ),
    tags=("corpus",),
)
def corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..extensions.corpus import quality_heuristics

    docs = load_table(spark, sf_dir, "documents")
    m = quality_heuristics(docs).select("doc_id", "n_tokens", "quality_ok")
    w = Window.partitionBy(F.md5("text"))
    per_doc = (
        docs.select("doc_id", "source", "text")
        .withColumn("is_exact_dup", F.count("*").over(w) > 1)
        .join(m, "doc_id")
    )
    q = F.col("quality_ok").cast("long")
    d = F.col("is_exact_dup").cast("long")
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long")).alias("n_tokens"),
        F.sum(q).alias("n_quality_ok"),
        (F.sum(q).cast("double") / F.count("*")).alias("quality_ok_frac"),
        F.sum(d).alias("n_exact_dup"),
        (F.sum(d).cast("double") / F.count("*")).alias("exact_dup_frac"),
    )


@query(
    "mixture_allocation_sample",
    oracle="""
        WITH s AS (
            SELECT source,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents
            GROUP BY source
        ),
        q0 AS (
            SELECT source,
                   (120 * n_tokens) // sum(n_tokens) OVER () AS q,
                   (120 * n_tokens) % sum(n_tokens) OVER () AS rem
            FROM s
        ),
        q1 AS (
            SELECT source,
                   q + CASE WHEN row_number()
                                OVER (ORDER BY rem DESC, source)
                            <= 120 - sum(q) OVER ()
                       THEN 1 ELSE 0 END AS quota
            FROM q0
        ),
        r AS (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS pick_rank
            FROM documents
        )
        SELECT doc_id, source, CAST(pick_rank AS BIGINT) AS pick_rank
        FROM r JOIN q1 USING (source)
        WHERE pick_rank <= quota
    """,
    doc=(
        "extension (corpus curation): EXACT-count mixture construction "
        "— select exactly k=120 documents allocated across sources by "
        "token mass via largest-remainder (Hamilton) apportionment, "
        "picked within source by ascending md5(doc_id). Integer quota "
        "math + hex selection order make it engine-exact; the "
        "count-exact companion to the rate-based stratified_sample."
    ),
    tags=("corpus",),
)
def mixture_allocation_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.corpus import mixture_allocation_sample

    out = mixture_allocation_sample(load_table(spark, sf_dir, "documents"), 120)
    return out.withColumn("pick_rank", F.col("pick_rank").cast("long"))


@query(
    "rag_passage_chunks_udtf",
    # same oracle as rag_passage_chunks: the UDTF surface must
    # reproduce the expression pipeline's chunks exactly
    oracle="""
        WITH tok AS (
            SELECT doc_id, string_split(lower(text), ' ') AS t
            FROM documents
        ),
        p AS (
            SELECT doc_id, t,
                   unnest(generate_series(
                       0,
                       CAST(ceil(greatest(len(t) - 32, 0) / 24.0)
                            AS BIGINT)
                   )) AS passage_idx
            FROM tok
        )
        SELECT doc_id,
               CAST(passage_idx AS BIGINT) AS passage_idx,
               array_to_string(
                   t[passage_idx * 24 + 1 : passage_idx * 24 + 32], ' '
               ) AS passage,
               CAST(least(len(t) - passage_idx * 24, 32) AS BIGINT)
                   AS n_tokens
        FROM p
    """,
    doc=(
        "extension (API surface): the passage chunker as a PYTHON "
        "UDTF (Spark 4 pyspark.sql.functions.udtf) applied with "
        "LATERAL — the 1:N fan-out expressed as a user-defined table "
        "function instead of sequence+explode expressions, gated by "
        "the SAME oracle as rag_passage_chunks. The UDTF is the "
        "escape hatch for fan-outs too irregular for expressions "
        "(stateful parsers, tokenizers); chunking is regular, which "
        "is exactly why it can pin the API against a bit-exact "
        "oracle. Executor-side row generation, Arrow-batched."
    ),
    tags=("corpus", "udf"),
)
def rag_passage_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from pyspark.sql.functions import udtf

    @udtf(
        returnType="passage_idx bigint, passage string, n_tokens bigint",
        useArrow=True,
    )
    class ChunkPassages:
        def eval(self, text: str):
            toks = (text or "").lower().split(" ")
            n = len(toks)
            last = math.ceil(max(n - 32, 0) / 24.0)
            for i in range(int(last) + 1):
                seg = toks[i * 24 : i * 24 + 32]
                yield i, " ".join(seg), min(n - i * 24, 32)

    spark.udtf.register("chunk_passages", ChunkPassages)
    from ..sources import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id, p.passage_idx, p.passage, p.n_tokens
        FROM documents, LATERAL chunk_passages(text) p
        """
    )


@query(
    "dsir_weights",
    oracle="""
        WITH tok AS (
            SELECT doc_id, lang = 'en' AS is_target,
                   unnest(string_split(lower(text), ' ')) AS tok
            FROM documents
        ),
        tb AS (
            SELECT doc_id, is_target,
                   CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
                       % 256 AS bucket
            FROM tok
        ),
        raw_counts AS (
            SELECT bucket, count(*) AS raw_cnt FROM tb GROUP BY 1
        ),
        target_counts AS (
            SELECT bucket, count(*) AS target_cnt
            FROM tb WHERE is_target GROUP BY 1
        ),
        totals AS (
            SELECT
                (SELECT CAST(sum(raw_cnt) AS BIGINT)
                 FROM raw_counts) AS total_raw,
                (SELECT CAST(sum(target_cnt) AS BIGINT)
                 FROM target_counts) AS total_target
        ),
        scored AS (
            SELECT doc_id,
                   CAST(SUM(coalesce(target_cnt, 0)) AS BIGINT)
                       AS target_hits,
                   CAST(SUM(raw_cnt) AS BIGINT) AS raw_hits
            FROM tb
            JOIN raw_counts USING (bucket)
            LEFT JOIN target_counts USING (bucket)
            GROUP BY doc_id
        )
        SELECT doc_id, target_hits, raw_hits,
               CAST(target_hits * total_raw AS DOUBLE)
                   / CAST(raw_hits * total_target AS DOUBLE)
                   AS dsir_weight
        FROM scored, totals
    """,
    doc=(
        "extension: DSIR-style importance weights (Xie et al. 2023) — "
        "per-document target-vs-raw likelihood ratio over md5-hashed "
        "token buckets (target = lang='en'); integer bucket counts, "
        "one IEEE division, bit-identical across engines; one "
        "tokenized pass, two tiny 256-key aggregates broadcast back"
    ),
    tags=("corpus", "text"),
)
def dsir_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.corpus import dsir_weights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(docs, target_filter=F.col("lang") == "en")


def _compression_signals_oracle() -> str:
    """LAZY oracle (rendered at oracle_dict() time, after the round's
    testdata regeneration): zlib itself is not expressible in DuckDB
    SQL, so the expected compressed lengths are precomputed with
    python-zlib over the gate corpora (sf0.001 smoke + sf0.01 driver
    gate) and embedded as a VALUES map keyed by md5(text) — corpus-
    portable across those SFs, and independent of the Spark plan
    under test (it gates the scan/schema/ratio plumbing; the zlib
    bytes themselves are additionally pinned row-by-row in
    tests/test_corpus.py)."""
    import os
    import zlib
    from hashlib import md5 as _md5

    import pyarrow.parquet as _pq

    from ..extensions.text import COMPRESSION_LEVEL

    vals: dict[str, int] = {}
    base = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    for sf in ("sf0.001", "sf0.01"):
        path = os.path.join(base, sf, "documents.parquet")
        if not os.path.exists(path):
            continue
        tbl = _pq.read_table(path, columns=["text"])
        for t in tbl.column("text").to_pylist():
            if t is None:
                continue
            b = t.encode("utf-8")
            h = _md5(b).hexdigest()
            if h not in vals:
                vals[h] = len(zlib.compress(b, COMPRESSION_LEVEL))
    rows = ",\n            ".join(
        f"('{h}', {n})" for h, n in sorted(vals.items())
    ) or "('__empty__', 0)"
    return f"""
        WITH zmap(h, clen) AS (VALUES
            {rows}
        )
        SELECT d.doc_id,
               CAST(octet_length(encode(d.text)) AS BIGINT) AS byte_len,
               z.clen AS compressed_len,
               CAST(octet_length(encode(d.text)) AS DOUBLE)
                   / CAST(z.clen AS DOUBLE) AS compression_ratio
        FROM documents d
        JOIN zmap z ON z.h = md5(d.text)
    """


@query(
    "compression_signals",
    oracle=_compression_signals_oracle,
    doc=(
        "extension: zlib compression-ratio quality signal (Dolma/"
        "RefinedWeb heuristic: too-compressible = boilerplate, "
        "incompressible = noise) — Arrow-batched pandas UDF in the "
        "scan stage, no shuffle; value-hash-gated via a lazy "
        "python-zlib VALUES oracle keyed by md5(text)"
    ),
    tags=("corpus", "text"),
)
def compression_signals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.text import compression_signals

    docs = load_table(spark, sf_dir, "documents")
    return compression_signals(docs)


@query(
    "corpus_export_manifest",
    oracle=f"""
        WITH {_QH_CTE},
        q AS (
            SELECT doc_id, n_tokens,
                   (n_tokens >= 20 AND n_tokens <= 1000
                    AND mean_token_len >= CAST(3.0 AS DOUBLE)
                    AND mean_token_len <= CAST(10.0 AS DOUBLE)
                    AND dup_3gram_frac <= CAST(0.25 AS DOUBLE))
                   AS quality_ok
            FROM m
        ),
        keep AS (
            SELECT min(doc_id) AS doc_id
            FROM documents GROUP BY md5(text)
        )
        SELECT d.doc_id, d.lang, d.source, q.n_tokens, q.quality_ok,
               (k.doc_id IS NOT NULL) AS is_canonical,
               CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2)
                         < 'cd' THEN 'train'
                    WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2)
                         < 'e6' THEN 'val'
                    ELSE 'test' END AS split,
               (q.quality_ok AND k.doc_id IS NOT NULL) AS exported
        FROM documents d
        JOIN q ON q.doc_id = d.doc_id
        LEFT JOIN keep k ON k.doc_id = d.doc_id
    """,
    doc=(
        "extension (corpus curation, flagship composition): the "
        "end-to-end per-document EXPORT DECISION a training pipeline "
        "materializes before tokenization — C4/Gopher quality gates + "
        "exact-dedup canonical winner + deterministic split, one "
        "row per doc with the combined exported flag. One base scan "
        "computes metrics/split/attrs in a single codegen pass "
        "(carry_cols), plus the content-hash winner aggregate joined "
        "back on the id key"
    ),
    tags=("corpus", "dedup"),
)
def corpus_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.corpus import export_manifest

    docs = load_table(spark, sf_dir, "documents")
    return export_manifest(docs)


@query(
    "k_anonymity_audit",
    oracle="""
        SELECT lang, source,
               CAST(floor(n_chars / 100) * 100 AS BIGINT) AS size_bin,
               count(*) AS n_docs,
               (count(*) < 5) AS at_risk
        FROM documents
        GROUP BY 1, 2, 3
    """,
    doc=(
        "governance extension: K-ANONYMITY audit over the "
        "quasi-identifier tuple (lang, source, coarse size bin) - "
        "every equivalence class with fewer than k=5 members is a "
        "re-identification risk the privacy review must clear before "
        "a corpus release (the standard privacy-audit companion to "
        "pii_redaction and forget_users). One partial-agg groupBy; "
        "the class count is bounded by the QI domain product, never "
        "the corpus. At 100 TB the same query also drives "
        "generalization choices (widen the bin until every class "
        "clears k)."
    ),
    tags=("agg",),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            "lang",
            "source",
            (F.floor(F.col("n_chars") / 100) * 100)
            .cast("long")
            .alias("size_bin"),
        )
        .agg(F.count("*").alias("n_docs"))
        .select(
            "lang",
            "source",
            "size_bin",
            "n_docs",
            (F.col("n_docs") < 5).alias("at_risk"),
        )
    )


@query(
    "group_aware_split",
    oracle="""
        SELECT doc_id, source,
               CASE WHEN substr(md5(source), 1, 2) < 'cd' THEN 'train'
                    WHEN substr(md5(source), 1, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    doc=(
        "extension (corpus curation): GROUP-AWARE train/val/test "
        "split - the bucket hash runs on the GROUP key (source), not "
        "the row id, so every document from one source lands in the "
        "same split and evaluation never sees near-copies of "
        "training material from a shared origin (the leakage mode a "
        "row-hash split invites when groups correlate content; same "
        "principle as GroupKFold / user-level splits). Pure "
        "expression, resharding-stable, zero RNG; the companion to "
        "dataset_split when rows cluster by origin."
    ),
    tags=("corpus",),
)
def group_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("source")), 1, 2)
    return docs.select(
        "doc_id",
        "source",
        F.when(bucket < "cd", "train")
        .when(bucket < "e6", "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "split_leakage_audit",
    oracle="""
        WITH s AS (
            SELECT doc_id, md5(text) AS h,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                             < 'cd' THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                             < 'e6' THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        )
        SELECT a.doc_id AS train_doc, b.doc_id AS eval_doc,
               b.split AS eval_split
        FROM s a JOIN s b
          ON a.h = b.h AND a.split = 'train' AND b.split <> 'train'
    """,
    doc=(
        "extension (corpus curation): SPLIT-LEAKAGE audit - exact "
        "duplicates that straddle the train/eval boundary (same "
        "content hash, different split), i.e. evaluation rows the "
        "model saw in training. The row-hash dataset_split makes "
        "this leakage possible by construction whenever the corpus "
        "has duplicates - this audit is the gate that catches it "
        "(fix: dedup before splitting, or group_aware_split on a "
        "content key). Hash-bucketed equi-join on md5(text), never "
        "all-pairs; swap the hash for MinHash bands to extend the "
        "audit to near-duplicates (the LSH machinery is already "
        "here). The contamination_check's internal twin: that one "
        "audits against external benchmarks, this one audits the "
        "corpus against itself."
    ),
    tags=("corpus", "join", "dedup"),
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.corpus import leakage_pairs

    return leakage_pairs(load_table(spark, sf_dir, "documents"))


def _split_sql(idc: str) -> str:
    return (
        f"CASE WHEN substr(md5(CAST({idc} AS VARCHAR)), 1, 2) < 'cd' "
        f"THEN 'train' WHEN substr(md5(CAST({idc} AS VARCHAR)), 1, 2) "
        f"< 'e6' THEN 'val' ELSE 'test' END"
    )


def _make_split_leakage_neardup():
    from .catalog_extensions import _JACCARD_SQL

    oracle = f"""
        WITH pairs AS ({_JACCARD_SQL})
        SELECT id_a, id_b, jaccard,
               {_split_sql('id_a')} AS split_a,
               {_split_sql('id_b')} AS split_b
        FROM pairs
        WHERE {_split_sql('id_a')} <> {_split_sql('id_b')}
    """

    @query(
        "split_leakage_neardup",
        oracle=oracle,
        doc=(
            "extension (corpus curation): NEAR-DUP split-leakage "
            "audit - >= 0.8-Jaccard document pairs whose members "
            "land in different splits (eval rows that are near-"
            "copies of training rows: the leakage exact-hash audits "
            "miss and the one that actually inflates benchmark "
            "scores). Candidates come from the LOSSLESS prefix-"
            "filter join (PPJoin) so the audit provably finds every "
            "qualifying pair - no LSH recall caveat - and the exact "
            "all-pairs Jaccard oracle hash-pins it. The fix the "
            "audit motivates: dedup before splitting "
            "(dedup_keep_best), or split on a content-cluster key."
        ),
        tags=("corpus", "dedup", "join"),
    )
    def split_leakage_neardup(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from ..extensions.dedup import doc_shingles, prefix_filter_pairs

        docs = load_table(spark, sf_dir, "documents")
        sh = doc_shingles(docs).localCheckpoint(eager=True)
        pairs = prefix_filter_pairs(sh, threshold=0.8)
        sa = dataset_split_col(F.col("id_a")).alias("split_a")
        sb = dataset_split_col(F.col("id_b")).alias("split_b")
        return pairs.select("id_a", "id_b", "jaccard", sa, sb).filter(
            F.col("split_a") != F.col("split_b")
        )

    return split_leakage_neardup


_make_split_leakage_neardup()


def _make_quality_calibration():
    qs = quality_oracle_exprs()["quality_score"]
    oracle = f"""
        WITH scored AS (
            SELECT doc_id, source, ({qs}) AS quality_score
            FROM documents
        )
        SELECT doc_id, source, quality_score,
               percent_rank() OVER (
                   PARTITION BY source
                   ORDER BY quality_score, doc_id
               ) AS calibrated_rank
        FROM scored
    """

    @query(
        "quality_score_calibration",
        oracle=oracle,
        doc=(
            "extension (corpus curation): WITHIN-SOURCE quality "
            "calibration - raw heuristic scores are not comparable "
            "across sources (a mediocre academic page outscores a "
            "great forum post), so mixture selection thresholds the "
            "per-source PERCENT RANK instead of the raw score ('keep "
            "each source's top 60%'), the standard cross-source "
            "normalization in corpus pipelines. Deterministic "
            "(score, doc_id) ordering; rank = (rows below)/(n-1) is "
            "one exact division. Scale: a PARTITION BY source window "
            "would put an entire source (most of the corpus, for a "
            "Common-Crawl-sized one) in ONE task, so the per-source "
            "rank comes from the grouped distributed prefix sum "
            "(operators/prefix.py) — a giant source spans range "
            "partitions — and percent_rank is the identical "
            "(r-1)/(n-1) division of the same integers."
        ),
        tags=("corpus", "window", "quality"),
    )
    def quality_score_calibration(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from ..operators.prefix import grouped_prefix_sum

        from ..functions.quality import with_quality_columns

        docs = load_table(spark, sf_dir, "documents")
        scored = with_quality_columns(docs, names=("quality_score",)).select(
            "doc_id", "source", "quality_score"
        )
        src_n = scored.groupBy("source").agg(
            F.count("*").cast("long").alias("n")
        )
        ranked = grouped_prefix_sum(
            scored.withColumn("__one", F.lit(1).cast("long")),
            ["source"],
            ["quality_score", "doc_id"],
            "__one",
            "r",
        ).join(F.broadcast(src_n), "source")
        return ranked.select(
            "doc_id",
            "source",
            "quality_score",
            (
                (F.col("r") - 1).cast("double")
                / (F.col("n") - 1).cast("double")
            ).alias("calibrated_rank"),
        )

    return quality_score_calibration


_make_quality_calibration()


@query(
    "l_diversity_audit",
    oracle="""
        SELECT source,
               CAST(floor(n_chars / 100) * 100 AS BIGINT) AS size_bin,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT lang) AS BIGINT) AS lang_diversity,
               (count(DISTINCT lang) < 2) AS at_risk
        FROM documents
        GROUP BY 1, 2
    """,
    doc=(
        "governance extension: L-DIVERSITY audit — k-anonymity's "
        "companion check (k_anonymity_audit): an equivalence class "
        "can clear k members yet still leak if every member shares "
        "the SAME sensitive value (here lang as the stand-in "
        "sensitive attribute); l-diversity requires >= l distinct "
        "sensitive values per quasi-identifier class (source, size "
        "bin). One distinct-agg groupBy, class count bounded by the "
        "QI domain; at 100 TB the distinct-agg partial-aggregates "
        "per partition before the class shuffle."
    ),
    tags=("agg",),
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            "source",
            (F.floor(F.col("n_chars") / 100) * 100)
            .cast("long")
            .alias("size_bin"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("lang_diversity"),
        )
        .select(
            "source",
            "size_bin",
            "n_docs",
            "lang_diversity",
            (F.col("lang_diversity") < 2).alias("at_risk"),
        )
    )


@query(
    "token_zipf_fit",
    oracle="""
        WITH vocab AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM (
                SELECT unnest(string_split(lower(text), ' ')) AS tok
                FROM documents) u
            WHERE tok <> ''
            GROUP BY 1
        ),
        top AS (
            SELECT tf,
                   CAST(row_number() OVER (ORDER BY tf DESC, tok)
                        AS BIGINT) AS r
            FROM vocab
            ORDER BY tf DESC, tok
            LIMIT 100
        ),
        pts AS (SELECT ln(CAST(r AS DOUBLE)) AS x,
                       ln(CAST(tf AS DOUBLE)) AS y
                FROM top),
        slopes AS (
            SELECT (b.y - a.y) / (b.x - a.x) AS slope
            FROM pts a JOIN pts b ON a.x < b.x
        ),
        m AS (SELECT quantile_cont(slope, 0.5) AS slope FROM slopes)
        SELECT m.slope AS zipf_slope,
               quantile_cont(pts.y - m.slope * pts.x, 0.5)
                   AS zipf_intercept,
               (SELECT CAST(count(*) AS BIGINT) FROM vocab)
                   AS vocab_size
        FROM pts, m
        GROUP BY m.slope
    """,
    doc=(
        "extension (corpus statistics): ZIPF-LAW FIT — Theil-Sen "
        "slope of ln(frequency) vs ln(rank) over the top-100 tokens; "
        "natural text sits near -1, and a corpus whose slope drifts "
        "(template spam flattens it, aggressive dedup steepens it) "
        "fails the health check. The pair frame is 100 aggregated "
        "rows (4950 slopes), never the corpus; ln is libm on both "
        "engines (the search-idf precedent) and each slope is one "
        "IEEE division, so the interpolated medians match "
        "bit-for-bit. Corpus-scale work: one tokenize+groupBy pass."
    ),
    tags=("corpus", "robust"),
)
def token_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import tokenize
    from ..sources.tables import scan_parallel

    docs = scan_parallel(load_table(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(tokenize("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("tf"))
    )
    top = (
        vocab.orderBy(F.col("tf").desc(), "tok")
        .limit(100)
        .select(
            "tf",
            F.row_number()
            .over(Window.orderBy(F.col("tf").desc(), "tok"))
            .cast("long")
            .alias("r"),
        )
    )
    pts = top.select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("tf").cast("double")).alias("y"),
    )
    a = pts.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = pts.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = a.join(b, F.col("xa") < F.col("xb")).select(
        ((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))).alias(
            "slope"
        )
    )
    m = slopes.agg(F.percentile("slope", F.lit(0.5)).alias("slope"))
    vocab_n = vocab.agg(F.count("*").alias("vocab_size"))
    resid = pts.join(F.broadcast(m)).select(
        "slope", (F.col("y") - F.col("slope") * F.col("x")).alias("rr")
    )
    return (
        resid.groupBy("slope")
        .agg(F.percentile("rr", F.lit(0.5)).alias("zipf_intercept"))
        .select(F.col("slope").alias("zipf_slope"), "zipf_intercept")
        .join(F.broadcast(vocab_n))
    )


_NORM_SQL = (
    r"trim(regexp_replace(regexp_replace(text, '[\x00-\x1f\x7f]', ' ', "
    r"'g'), ' {2,}', ' ', 'g'))"
)


def _make_corpus_build_pipeline():
    from ..functions.quality import EMAIL_RE as _EM, PHONE_RE as _PH

    oracle = f"""
        WITH norm AS (
            SELECT doc_id, lang, source, {_NORM_SQL} AS nt
            FROM documents
        ),
        sh AS (
            SELECT doc_id, lang, source, nt,
                   string_split(lower(nt), ' ') AS t,
                   CASE WHEN len(string_split(lower(nt), ' ')) >= 3
                        THEN [string_split(lower(nt), ' ')[i] || ' ' ||
                              string_split(lower(nt), ' ')[i+1] || ' ' ||
                              string_split(lower(nt), ' ')[i+2]
                              for i in generate_series(
                                  1, len(string_split(lower(nt), ' '))-2)]
                        ELSE CAST([] AS VARCHAR[]) END AS s
            FROM norm
        ),
        m AS (
            SELECT doc_id, lang, source, nt,
                   len(t) AS n_tokens,
                   CASE WHEN len(t) > 0
                        THEN list_aggregate(
                                 list_transform(t, x -> len(x)), 'sum')
                             / len(t)
                        ELSE CAST(0.0 AS DOUBLE) END AS mtl,
                   CASE WHEN len(s) > 0
                        THEN CAST(1.0 AS DOUBLE)
                             - len(list_distinct(s)) / len(s)
                        ELSE CAST(0.0 AS DOUBLE) END AS d3
            FROM sh
        ),
        kept AS (
            SELECT * FROM m
            WHERE n_tokens >= 20 AND n_tokens <= 1000
              AND mtl >= CAST(3.0 AS DOUBLE)
              AND mtl <= CAST(10.0 AS DOUBLE)
              AND d3 <= CAST(0.25 AS DOUBLE)
        ),
        uniq AS (
            SELECT *, row_number() OVER (
                PARTITION BY md5(nt) ORDER BY doc_id) AS rn
            FROM kept
        )
        SELECT doc_id, lang, source,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                        THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                        THEN 'val'
                    ELSE 'test' END AS split,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               regexp_replace(
                   regexp_replace(nt, '{_EM}', '[EMAIL]', 'g'),
                   '{_PH}', '[PHONE]', 'g') AS clean_text
        FROM uniq WHERE rn = 1
    """

    @query(
        "corpus_build_pipeline",
        oracle=oracle,
        doc=(
            "FLAGSHIP COMPOSITION (corpus curation): the full "
            "RefinedWeb-style corpus build as ONE declarative plan — "
            "normalize (control chars/whitespace) -> C4/Gopher "
            "quality gate -> exact dedup on the NORMALIZED hash "
            "(keep lowest doc_id) -> PII redaction -> deterministic "
            "train/val/test split -> token accounting. Every stage "
            "is the already-oracled operator (normalize_text, "
            "corpus_quality_heuristics, dedup_exact, pii_redaction, "
            "dataset_split) composed in a single DataFrame chain; "
            "Catalyst pipelines the scalar stages into one codegen "
            "pass over the corpus, and the only shuffle is the dedup "
            "hash partition. The oracle replays the identical chain "
            "as one CTE stack — proving stage composition preserves "
            "every stage's exact semantics."
        ),
        tags=("corpus", "quality", "dedup", "bench"),
    )
    def corpus_build_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..extensions.corpus import dataset_split_col, normalize_text

        docs = load_table(spark, sf_dir, "documents")
        norm = docs.select(
            "doc_id", "lang", "source",
            normalize_text("text").alias("norm_text"),
        )
        q = quality_heuristics(
            norm,
            text_col="norm_text",
            carry_cols=("lang", "source", "norm_text"),
        )
        kept = q.filter(F.col("quality_ok")).select(
            "doc_id", "lang", "source", "norm_text", "n_tokens"
        )
        w = Window.partitionBy(F.md5("norm_text")).orderBy("doc_id")
        uniq = (
            kept.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        clean = F.regexp_replace(
            F.regexp_replace(F.col("norm_text"), EMAIL_RE, "[EMAIL]"),
            PHONE_RE,
            "[PHONE]",
        )
        return uniq.select(
            "doc_id",
            "lang",
            "source",
            dataset_split_col(F.col("doc_id")).alias("split"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            clean.alias("clean_text"),
        )

    return corpus_build_pipeline


_make_corpus_build_pipeline()


def _make_corpus_build_pipeline_streamed():
    from ..functions.quality import EMAIL_RE as _EM, PHONE_RE as _PH

    from .registry import QUERIES as _Q

    oracle = _Q["corpus_build_pipeline"].oracle

    @query(
        "corpus_build_pipeline_streamed",
        oracle=oracle,
        doc=(
            "streamed corpus build: the flagship curation chain run "
            "incrementally — each micro-batch normalizes, quality-"
            "gates and then UPSERTS into a hash-keyed dedup store "
            "where the winner per normalized-text hash is the LOWEST "
            "doc_id (min-wins MERGE via a negated order key), so the "
            "drained store equals the batch pipeline REGARDLESS of "
            "arrival order — first-seen-wins without any cross-batch "
            "re-read; redaction/split are stateless projections on "
            "the drained store. Same oracle as corpus_build_pipeline "
            "bit-for-bit; replay-safe because the MERGE is "
            "idempotent per key."
        ),
        tags=("corpus", "streaming", "dedup"),
    )
    def corpus_build_pipeline_streamed(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        import os
        import tempfile

        from ..extensions.corpus import (
            dataset_split_col,
            normalize_text,
            quality_heuristics,
        )
        from ..operators.upsert import upsert_parquet

        docs = load_table(spark, sf_dir, "documents")
        work = tempfile.mkdtemp(prefix="csdp_cbs_")
        src = os.path.join(work, "in")
        store = os.path.join(work, "store")
        docs.repartition(6).write.mode("overwrite").parquet(src)

        def fold_batch(batch: DataFrame, batch_id: int) -> None:
            norm = batch.select(
                "doc_id", "lang", "source",
                normalize_text("text").alias("norm_text"),
            )
            q = quality_heuristics(
                norm,
                text_col="norm_text",
                carry_cols=("lang", "source", "norm_text"),
            )
            kept = q.filter(F.col("quality_ok")).select(
                "doc_id", "lang", "source", "norm_text", "n_tokens",
                F.md5("norm_text").alias("h"),
                (-F.col("doc_id")).alias("negdoc"),
            )
            upsert_parquet(
                batch.sparkSession, store, kept, ["h"], ["negdoc"]
            )

        q_ = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
            .writeStream.foreachBatch(fold_batch)
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
        uniq = spark.read.parquet(store)
        clean = F.regexp_replace(
            F.regexp_replace(F.col("norm_text"), _EM, "[EMAIL]"),
            _PH,
            "[PHONE]",
        )
        return uniq.select(
            "doc_id",
            "lang",
            "source",
            dataset_split_col(F.col("doc_id")).alias("split"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            clean.alias("clean_text"),
        )

    return corpus_build_pipeline_streamed


_make_corpus_build_pipeline_streamed()


# ---------------------------------------------------------------------------
# differential privacy: contribution-bounded Laplace releases
# (privacy family: the mechanism companion to k_anonymity_audit /
# l_diversity_audit, which only AUDIT; reference governance surface is
# pii handling, services/data-quality — the DP release is the
# beyond-reference extension a corpus publisher needs)

from ..extensions.privacy import (  # noqa: E402
    dp_noisy_counts,
    dp_noisy_sum,
    laplace_noise_sql,
)


@query(
    "dp_event_counts",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id, event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        ranked AS (
            SELECT user_id, event_type, n,
                   (row_number() OVER (PARTITION BY user_id
                                       ORDER BY n DESC, event_type ASC)
                        <= 3) AS kept
            FROM per_user
        )
        SELECT event_type,
               CAST(sum(n) AS BIGINT) AS true_count,
               CAST(sum(CASE WHEN kept THEN least(n, 8) ELSE 0 END)
                    AS BIGINT) AS clamped_count,
               CAST(sum(CASE WHEN kept THEN least(n, 8) ELSE 0 END)
                    AS DOUBLE)
                   + {laplace_noise_sql('event_type', 'dp-count', 24.0)}
                   AS noisy_count
        FROM ranked GROUP BY 1
    """,
    doc=(
        "governance extension: DIFFERENTIALLY-PRIVATE event histogram "
        "(Laplace mechanism, Dwork et al. 2006) with user-level "
        "contribution bounding - stage 1 caps each user at 8 events "
        "per type (a per-(user,type) partial agg), stage 1.5 keeps "
        "only each user's top-3 types (keys-per-user bound L=3, so "
        "the histogram-wide L1 sensitivity is 3*8=24, genuine "
        "USER-level DP), stage 2 sums the kept clamped contributions "
        "and adds Laplace(24/eps), eps=1, seeded "
        "from md5(event_type) so the release is deterministic and "
        "reshard-stable (extensions/privacy.py docstring covers the "
        "IEEE-exactness argument). Two partial-agg shuffles plus one "
        "window pass over the already-aggregated (user x type) frame "
        "for the key cap, output bounded by the key domain - the released number a 100 TB "
        "corpus publisher can hand out without the audit queries "
        "(k_anonymity_audit) flagging it."
    ),
    tags=("corpus", "agg", "bench"),
)
def dp_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return dp_noisy_counts(
        events,
        key_col="event_type",
        user_col="user_id",
        epsilon=1.0,
        max_per_user=8,
        max_keys_per_user=3,
        label="dp-count",
    )


@query(
    "dp_value_sums",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id, event_type,
                   sum(CAST(value AS DECIMAL(28,6))) AS s
            FROM events GROUP BY 1, 2
        ),
        clamped AS (
            SELECT user_id, event_type,
                   CASE WHEN s < CAST(0.0 AS DECIMAL(38,6))
                             THEN CAST(0.0 AS DECIMAL(38,6))
                        WHEN s > CAST(1000.0 AS DECIMAL(38,6))
                             THEN CAST(1000.0 AS DECIMAL(38,6))
                        ELSE s END AS c
            FROM per_user
        ),
        kept AS (
            SELECT event_type,
                   CASE WHEN rk <= 3 THEN c
                        ELSE CAST(0.0 AS DECIMAL(38,6)) END AS c
            FROM (
                SELECT event_type, c,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY c DESC,
                                                   event_type ASC) AS rk
                FROM clamped
            )
        )
        SELECT event_type,
               CAST(sum(c) AS DOUBLE) AS clamped_sum,
               CAST(sum(c) AS DOUBLE)
                   + {laplace_noise_sql('event_type', 'dp-sum', 3000.0)}
                   AS noisy_sum
        FROM kept GROUP BY 1
    """,
    doc=(
        "governance extension: DIFFERENTIALLY-PRIVATE value totals - "
        "each user's per-type value TOTAL is clamped into [0, 1000] "
        "(sum-level clamping caps many small rows the same as one big "
        "row) and only each user's top-3 types are released "
        "(keys-per-user bound L=3 -> L1 sensitivity 3*1000), then "
        "the key-level sum of kept totals gets Laplace(3000/eps), "
        "eps=1. Clamped totals "
        "accumulate in decimal(28,6) (the catalog dsum rule) so both "
        "engines agree bit-for-bit before the noise add. Same "
        "two-shuffle plan shape as dp_event_counts."
    ),
    tags=("corpus", "agg"),
)
def dp_value_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return dp_noisy_sum(
        events,
        key_col="event_type",
        user_col="user_id",
        value_col="value",
        lo=0.0,
        hi=1000.0,
        epsilon=1.0,
        max_keys_per_user=3,
        label="dp-sum",
    )


@query(
    "dp_event_counts_streamed",
    # oracle = the batch DP release over ALL events: per-(user,type)
    # count folding must converge to exactly the from-scratch counts,
    # so clamp + seeded noise at drain time reproduce the batch
    # release bit-for-bit
    oracle=f"""
        WITH per_user AS (
            SELECT user_id, event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        ranked AS (
            SELECT user_id, event_type, n,
                   (row_number() OVER (PARTITION BY user_id
                                       ORDER BY n DESC, event_type ASC)
                        <= 3) AS kept
            FROM per_user
        )
        SELECT event_type,
               CAST(sum(n) AS BIGINT) AS true_count,
               CAST(sum(CASE WHEN kept THEN least(n, 8) ELSE 0 END)
                    AS BIGINT) AS clamped_count,
               CAST(sum(CASE WHEN kept THEN least(n, 8) ELSE 0 END)
                    AS DOUBLE)
                   + {laplace_noise_sql('event_type', 'dp-count', 24.0)}
                   AS noisy_count
        FROM ranked GROUP BY 1
    """,
    doc=(
        "governance extension: STREAMING DP release - per-(user,type) "
        "counts fold incrementally into versioned state (a mergeable "
        "sum; state is bounded by the user x type domain, which "
        "user-level DP must track by definition - clamping or "
        "key-capping early would double-count a user who spans "
        "micro-batches), and the top-3-keys cap + clamp + seeded "
        "Laplace(24/eps) noise run once at release. Versions "
        "derive only from strictly-older versions, so at-least-once "
        "replays are byte-identical; the drained release must equal "
        "the batch dp_event_counts exactly."
    ),
    tags=("corpus", "streaming", "agg"),
)
def dp_event_counts_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..extensions.privacy import release_noisy_counts

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_dp_")
    src = os.path.join(work, "in")
    state_dir = os.path.join(work, "state")
    os.makedirs(state_dir)
    events.repartition(6).write.mode("overwrite").parquet(src)

    def _versions() -> list[int]:
        return sorted(
            int(d[1:])
            for d in os.listdir(state_dir)
            if d.startswith("v") and d[1:].isdigit()
        )

    def fold_counts(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        delta = batch.groupBy("user_id", "event_type").agg(
            F.count("*").cast("long").alias("n")
        )
        prior_vs = [v for v in _versions() if v < batch_id]
        if prior_vs:
            prior = sp.read.parquet(
                os.path.join(state_dir, f"v{prior_vs[-1]}")
            )
            delta = (
                prior.unionByName(delta)
                .groupBy("user_id", "event_type")
                .agg(F.sum("n").cast("long").alias("n"))
            )
        out = os.path.join(state_dir, f"v{batch_id}")
        tmp = out + ".tmp"
        delta.write.mode("overwrite").parquet(tmp)
        if os.path.exists(out):
            shutil.rmtree(out)
        os.rename(tmp, out)
        for v in prior_vs[:-1]:
            shutil.rmtree(os.path.join(state_dir, f"v{v}"), True)

    q_ = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(fold_counts)
        .trigger(availableNow=True)
        .start()
    )
    q_.awaitTermination()
    latest = _versions()[-1]
    state = spark.read.parquet(os.path.join(state_dir, f"v{latest}"))
    return release_noisy_counts(
        state,
        key_col="event_type",
        count_col="n",
        user_col="user_id",
        epsilon=1.0,
        max_per_user=8,
        max_keys_per_user=3,
        label="dp-count",
    )


from ..extensions.privacy import gumbel_noise_sql  # noqa: E402


@query(
    "dp_value_median",
    oracle=f"""
        WITH counts AS (
            SELECT greatest(CAST(0 AS BIGINT),
                            least(CAST(floor(value / 25.0) AS BIGINT),
                                  CAST(19 AS BIGINT))) AS bin,
                   count(*) AS cnt
            FROM events GROUP BY 1
        ),
        spine AS (SELECT CAST(x AS BIGINT) AS bin FROM range(20) t(x)),
        binned AS (
            SELECT s.bin, COALESCE(c.cnt, 0) AS cnt
            FROM spine s LEFT JOIN counts c ON c.bin = s.bin
        ),
        scored AS (
            SELECT bin,
                   SUM(cnt) OVER (ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum,
                   SUM(cnt) OVER () AS n
            FROM binned
        ),
        phi AS (
            SELECT bin, cum, n,
                   CAST(-abs(2 * cum - n) AS DOUBLE)
                       * (CAST(1.0 AS DOUBLE) / CAST(6.0 AS DOUBLE))
                       + {gumbel_noise_sql('CAST(bin AS VARCHAR)', 'dp-median')}
                       AS phi
            FROM scored
        ),
        sel AS (
            SELECT *,
                   row_number() OVER (ORDER BY phi DESC, bin ASC) AS rn,
                   (SELECT min(bin) FROM phi p2
                    WHERE 2 * p2.cum >= p2.n) AS true_bin
            FROM phi
        )
        SELECT CAST(n AS BIGINT) AS n, bin AS dp_bin,
               CAST(bin AS DOUBLE) * 25.0 AS dp_lo,
               CAST(bin AS DOUBLE) * 25.0 + 12.5 AS dp_mid,
               true_bin
        FROM sel WHERE rn = 1
    """,
    doc=(
        "governance extension: DP MEDIAN via the EXPONENTIAL "
        "MECHANISM (McSherry-Talwar 2007) - the selection-query "
        "mechanism family next to the additive-noise Laplace "
        "releases: utility u(bin) = -|2 cum - n| (integer rank "
        "distance from the median), seeded Gumbel-max realizes "
        "P(bin) proportional to exp(eps*u/(2*delta_u)) "
        "deterministically. One partial-agg groupBy(bin) reduces the "
        "corpus to <= 20 rows; spine join, cumulative sum, and "
        "argmax all run on that bounded frame. true_bin rides along "
        "for error audits like true_count in dp_event_counts."
    ),
    tags=("corpus", "agg"),
)
def dp_value_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.privacy import dp_median_bin

    events = load_table(spark, sf_dir, "events")
    return dp_median_bin(
        events,
        value_col="value",
        bin_width=25.0,
        n_bins=20,
        epsilon=1.0,
        label="dp-median",
    )


@query(
    "dp_value_median_streamed",
    # oracle = the batch exponential-mechanism release over ALL
    # events: bin-count folding must converge to the from-scratch
    # histogram, so the drain-time utility + seeded Gumbel selection
    # reproduces the batch release bit-for-bit
    oracle=f"""
        WITH counts AS (
            SELECT greatest(CAST(0 AS BIGINT),
                            least(CAST(floor(value / 25.0) AS BIGINT),
                                  CAST(19 AS BIGINT))) AS bin,
                   count(*) AS cnt
            FROM events GROUP BY 1
        ),
        spine AS (SELECT CAST(x AS BIGINT) AS bin FROM range(20) t(x)),
        binned AS (
            SELECT s.bin, COALESCE(c.cnt, 0) AS cnt
            FROM spine s LEFT JOIN counts c ON c.bin = s.bin
        ),
        scored AS (
            SELECT bin,
                   SUM(cnt) OVER (ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum,
                   SUM(cnt) OVER () AS n
            FROM binned
        ),
        phi AS (
            SELECT bin, cum, n,
                   CAST(-abs(2 * cum - n) AS DOUBLE)
                       * (CAST(1.0 AS DOUBLE) / CAST(6.0 AS DOUBLE))
                       + {gumbel_noise_sql('CAST(bin AS VARCHAR)', 'dp-median')}
                       AS phi
            FROM scored
        ),
        sel AS (
            SELECT *,
                   row_number() OVER (ORDER BY phi DESC, bin ASC) AS rn,
                   (SELECT min(bin) FROM phi p2
                    WHERE 2 * p2.cum >= p2.n) AS true_bin
            FROM phi
        )
        SELECT CAST(n AS BIGINT) AS n, bin AS dp_bin,
               CAST(bin AS DOUBLE) * 25.0 AS dp_lo,
               CAST(bin AS DOUBLE) * 25.0 + 12.5 AS dp_mid,
               true_bin
        FROM sel WHERE rn = 1
    """,
    doc=(
        "governance extension: STREAMING exponential-mechanism DP "
        "median - the fixed-domain bin histogram is the mergeable "
        "state (<= 20 rows FOREVER, independent of stream length; "
        "contrast the per-user state the count release needs), "
        "folded per micro-batch into replay-idempotent versions; "
        "utility + seeded Gumbel selection run once at drain and "
        "must equal the batch dp_value_median exactly."
    ),
    tags=("corpus", "streaming", "agg"),
)
def dp_value_median_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..extensions.privacy import bin_counts, release_median_bin

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_dpm_")
    src = os.path.join(work, "in")
    state_dir = os.path.join(work, "state")
    os.makedirs(state_dir)
    events.repartition(6).write.mode("overwrite").parquet(src)

    def _versions() -> list[int]:
        return sorted(
            int(d[1:])
            for d in os.listdir(state_dir)
            if d.startswith("v") and d[1:].isdigit()
        )

    def fold_bins(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        delta = bin_counts(
            batch, value_col="value", bin_width=25.0, n_bins=20
        )
        prior_vs = [v for v in _versions() if v < batch_id]
        if prior_vs:
            prior = sp.read.parquet(
                os.path.join(state_dir, f"v{prior_vs[-1]}")
            )
            delta = (
                prior.unionByName(delta)
                .groupBy("bin")
                .agg(F.sum("cnt").cast("long").alias("cnt"))
            )
        out = os.path.join(state_dir, f"v{batch_id}")
        tmp = out + ".tmp"
        delta.write.mode("overwrite").parquet(tmp)
        if os.path.exists(out):
            shutil.rmtree(out)
        os.rename(tmp, out)
        for v in prior_vs[:-1]:
            shutil.rmtree(os.path.join(state_dir, f"v{v}"), True)

    q_ = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(fold_bins)
        .trigger(availableNow=True)
        .start()
    )
    q_.awaitTermination()
    latest = _versions()[-1]
    state = spark.read.parquet(os.path.join(state_dir, f"v{latest}"))
    return release_median_bin(
        state, bin_width=25.0, n_bins=20, epsilon=1.0, label="dp-median"
    )


@query(
    "dp_value_sums_streamed",
    # oracle = the batch DP sum release over ALL events: per-user
    # decimal totals merge exactly across micro-batches, so the
    # drain-time clamp + seeded noise reproduce the batch release
    oracle=f"""
        WITH per_user AS (
            SELECT user_id, event_type,
                   sum(CAST(value AS DECIMAL(28,6))) AS s
            FROM events GROUP BY 1, 2
        ),
        clamped AS (
            SELECT user_id, event_type,
                   CASE WHEN s < CAST(0.0 AS DECIMAL(38,6))
                             THEN CAST(0.0 AS DECIMAL(38,6))
                        WHEN s > CAST(1000.0 AS DECIMAL(38,6))
                             THEN CAST(1000.0 AS DECIMAL(38,6))
                        ELSE s END AS c
            FROM per_user
        ),
        kept AS (
            SELECT event_type,
                   CASE WHEN rk <= 3 THEN c
                        ELSE CAST(0.0 AS DECIMAL(38,6)) END AS c
            FROM (
                SELECT event_type, c,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY c DESC,
                                                   event_type ASC) AS rk
                FROM clamped
            )
        )
        SELECT event_type,
               CAST(sum(c) AS DOUBLE) AS clamped_sum,
               CAST(sum(c) AS DOUBLE)
                   + {laplace_noise_sql('event_type', 'dp-sum', 3000.0)}
                   AS noisy_sum
        FROM kept GROUP BY 1
    """,
    doc=(
        "governance extension: STREAMING DP sum release - per-"
        "(user,type) DECIMAL(28,6) value totals fold incrementally "
        "(decimal sums merge exactly, so cross-engine bit parity "
        "survives any micro-batch split); the [0,1000] clamp, the "
        "top-3-keys cap, and the seeded Laplace(3000/eps) run once "
        "at drain. Clamping early "
        "would break the user-level bound for users spanning "
        "batches, exactly as in dp_event_counts_streamed."
    ),
    tags=("corpus", "streaming", "agg"),
)
def dp_value_sums_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..extensions.privacy import release_noisy_sums

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="csdp_dps_")
    src = os.path.join(work, "in")
    state_dir = os.path.join(work, "state")
    os.makedirs(state_dir)
    events.repartition(6).write.mode("overwrite").parquet(src)

    def _versions() -> list[int]:
        return sorted(
            int(d[1:])
            for d in os.listdir(state_dir)
            if d.startswith("v") and d[1:].isdigit()
        )

    def fold_sums(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        delta = batch.groupBy("user_id", "event_type").agg(
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("decimal(38,6)")
            .alias("s")
        )
        prior_vs = [v for v in _versions() if v < batch_id]
        if prior_vs:
            prior = sp.read.parquet(
                os.path.join(state_dir, f"v{prior_vs[-1]}")
            )
            delta = (
                prior.unionByName(delta)
                .groupBy("user_id", "event_type")
                .agg(F.sum("s").cast("decimal(38,6)").alias("s"))
            )
        out = os.path.join(state_dir, f"v{batch_id}")
        tmp = out + ".tmp"
        delta.write.mode("overwrite").parquet(tmp)
        if os.path.exists(out):
            shutil.rmtree(out)
        os.rename(tmp, out)
        for v in prior_vs[:-1]:
            shutil.rmtree(os.path.join(state_dir, f"v{v}"), True)

    q_ = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(fold_sums)
        .trigger(availableNow=True)
        .start()
    )
    q_.awaitTermination()
    latest = _versions()[-1]
    state = spark.read.parquet(os.path.join(state_dir, f"v{latest}"))
    return release_noisy_sums(
        state,
        key_col="event_type",
        sum_col="s",
        user_col="user_id",
        lo=0.0,
        hi=1000.0,
        epsilon=1.0,
        max_keys_per_user=3,
        label="dp-sum",
    )
