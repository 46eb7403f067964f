"""Text-analysis operators for training-data pipelines
(beyond-reference extension): token counting, language-ID heuristic,
document fingerprinting, corpus-LM quality scoring, TF-IDF keyword
extraction. Quality scoring lives in ``functions.quality`` (it doubles
as the reference's H2 scorer).

Scalar helpers are pure column expressions — the full text-analysis
pass over 100 TB is one codegen'd scan, no Python in the loop. The
corpus-relative operators (LM score, TF-IDF) add exactly one
vocab-bounded aggregate plus one doc-keyed shuffle each.

Cross-engine exactness note: ``ln`` is NOT correctly rounded and
verifiably differs between the JVM, DuckDB, and libm in the last ulp,
so the LM score and the TF-IDF weight are specified in probability /
rational space (integer sums, one exactly-rounded IEEE division) —
bit-identical across engines — rather than the textbook log-domain
forms. Rankings and quantile-based filtering are unaffected; the
docstrings state the substitution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import scan_parallel

#: BPE-ish pre-tokenizer: letter runs, digit runs, single other glyphs
#: (whitespace dropped) — the usual GPT-2-style pre-split shape.
BPE_SPLIT_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

#: tiny per-language function-word profiles for the n-gram/stopword
#: language-ID heuristic. Ordered dict: ties break by listing order.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "los"),
    "de": ("der", "die", "das", "und", "zu", "den", "ist"),
    "fr": ("le", "la", "de", "et", "les", "des", "est"),
    "zh": ("的", "是", "了", "在", "和", "有", "我"),
}


def whitespace_token_count(col: Column | str) -> Column:
    return F.size(F.split(col, " "))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Token count under the BPE-style regex pre-split — the cheap
    estimator for LLM token budgets."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_SPLIT_RE), 0))


def lang_hits(col: Column | str, lang: str) -> Column:
    """How many tokens hit the language's function-word profile."""
    toks = F.split(F.lower(col), " ")
    words = LANG_PROFILES[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def predicted_lang(col: Column | str) -> Column:
    """argmax over profile hit counts; first-listed language wins ties
    (deterministic). 'und' when nothing hits."""
    langs = list(LANG_PROFILES)
    hits = {lang: lang_hits(col, lang) for lang in langs}
    best = F.greatest(*[hits[lang] for lang in langs])
    expr = F.lit("und")
    # reverse order so earlier-listed languages win equal scores
    for lang in reversed(langs):
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(
            expr
        )
    return expr


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token multiset — robust to token reordering, the classic
    near-dup canonicalization (cheaper than shingles, coarser)."""
    return F.md5(
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.lower(col), " "))), " "
        )
    )


# ---------------------------------------------------------------------------
# corpus-relative scoring: unigram LM + TF-IDF keywords


def _doc_tokens(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, token) rows — explode is narrow (no shuffle); the scan is
    redistributed first because the test parquet is one row group.

    Empty tokens are filtered out: Spark ``split`` and DuckDB
    ``string_split`` agree on ''/'  ' edge texts in the engine pair
    tested here, but that equivalence is version-dependent — dropping
    empties on both sides makes every downstream count independent of
    how either engine treats empty fields (VERDICT r3 item 1b; the
    oracle twin is the list_filter in ``_LM_CTE``). The filter runs
    AFTER the explode as a plain predicate: a higher-order
    ``F.filter`` lambda is interpreted per array element (measured
    +70% CPU on this lane), while a post-explode WHERE stays inside
    whole-stage codegen."""
    return (
        scan_parallel(docs)
        .select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
        )
        .where(F.col("token") != "")
    )


def unigram_lm(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus unigram language model: (token, tok_count).

    One shuffle keyed on token with map-side partial aggregation; the
    output is vocab-bounded (millions of rows at 100 TB, not billions)
    — small enough to broadcast back onto the corpus, which is exactly
    what ``lm_quality_score`` does. The CCNet-style setup trains the
    LM on a trusted slice; pass that slice as ``docs`` to reproduce it.
    """
    return (
        _doc_tokens(docs, id_col=id_col, text_col=text_col)
        .groupBy("token")
        .agg(F.count("*").alias("tok_count"))
    )


#: rare-token cutoff in parts-per-million of corpus mass: a token with
#: tok_count/lm_total < RARE_PPM/1e6 counts as rare. 10_000 ppm = 1%.
#: Integer cross-multiplication keeps the comparison exact.
RARE_PPM = 10_000

#: accept a document when at most this fraction of its tokens is rare.
RARE_FRAC_MAX = 0.05


def lm_quality_score(
    docs: DataFrame,
    lm: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_ppm: int = RARE_PPM,
) -> DataFrame:
    """CCNet-style LM quality filter: score every document by how
    typical its tokens are under a corpus unigram LM.

    Per document: ``mean_token_prob`` = mean over token positions of
    p(token) = tok_count/lm_total (the arithmetic-mean analogue of the
    perplexity filter — specified in probability space because ``ln``
    is not bit-portable across engines; the filter use is a quantile
    cut either way), ``rare_frac`` = fraction of tokens rarer than
    ``rare_ppm`` of corpus mass, and the accept flag.

    Plan shape for 100 TB: LM table is vocab-bounded -> broadcast join
    (no shuffle of the corpus); explode is narrow; the only corpus
    shuffle is the final groupBy on the document key, with map-side
    partial aggregation. All sums are integers (order-independent);
    each output double is one exactly-rounded IEEE division.
    """
    if lm is None:
        # materialize the vocab-bounded LM once: without this the
        # totals aggregate and the broadcast join each re-derive it,
        # i.e. two extra full-corpus scans at 100 TB (same fix as the
        # MinHash-LSH shingle table). Checkpoint payload = vocab size.
        lm = unigram_lm(docs, id_col=id_col, text_col=text_col).localCheckpoint(
            eager=True
        )
    totals = lm.agg(F.sum("tok_count").alias("lm_total"))
    tok = _doc_tokens(docs, id_col=id_col, text_col=text_col)
    rare = (F.col("tok_count") * F.lit(1_000_000)) < (
        F.col("lm_total") * F.lit(rare_ppm)
    )
    per_doc = (
        tok.join(F.broadcast(lm), "token")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col, "lm_total")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("tok_count").alias("sum_count"),
            F.sum(rare.cast("long")).alias("n_rare"),
        )
    )
    # both score doubles are rounded to 9dp on BOTH engines (repo float
    # rule: "round(x,9) both sides when scores feed the value hash";
    # precedent dp_value_sums) — the divisions are exactly-rounded IEEE
    # either way, but rounding also immunizes the driver's value hash
    # against any float-repr delta in ITS DuckDB/pandas versions.
    rare_frac = F.round(F.col("n_rare").cast("double") / F.col("n_tokens"), 9)
    return per_doc.select(
        id_col,
        "n_tokens",
        "sum_count",
        F.round(
            F.col("sum_count").cast("double")
            / (F.col("n_tokens") * F.col("lm_total")),
            9,
        ).alias("mean_token_prob"),
        "n_rare",
        rare_frac.alias("rare_frac"),
        (rare_frac <= F.lit(RARE_FRAC_MAX)).alias("lm_accept"),
    )


def tfidf_keywords(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` keywords per document by rarity-weighted term
    frequency: score = tf / df (idf taken as 1/df rather than
    log(N/df) so the score is a single exactly-rounded division —
    bit-portable across engines; rare-term emphasis is preserved,
    the weighting curve is steeper than the log form).

    Plan shape for 100 TB: tf = one groupBy on (doc, token) with
    partial agg; df is derived from tf's vocab-bounded projection and
    broadcast back; the window top-k re-sorts within doc partitions.
    Ties break on token ASC — fully deterministic output.
    """
    tok = _doc_tokens(docs, id_col=id_col, text_col=text_col)
    tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    # df derives from tf; checkpoint the vocab-bounded projection so
    # the broadcast side doesn't replay the corpus scan + tf shuffle
    df_t = (
        tf.groupBy("token")
        .agg(F.count("*").alias("df"))
        .localCheckpoint(eager=True)
    )
    scored = tf.join(F.broadcast(df_t), "token").withColumn(
        "tfidf", F.col("tf").cast("double") / F.col("df")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.select(
            id_col,
            F.row_number().over(w).alias("rank"),
            "token",
            "tf",
            "df",
            "tfidf",
        )
        .filter(F.col("rank") <= k)
    )


#: a bigram is "known" when the corpus contains it at least this many
#: times; 2 excludes bigrams unique to a single position (a document's
#: own hapax transitions), the cheap fluency signal.
BIGRAM_MIN_COUNT = 2

#: accept a document when at least this fraction of its bigrams is
#: known corpus-wide.
KNOWN_FRAC_MIN = 0.5


def _doc_bigrams(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, bigram) rows — adjacent token pairs, space-joined. The
    token array materializes through a projection boundary so split
    evaluates once per row (the doc_shingles lesson)."""
    tok = scan_parallel(docs).select(
        F.col(id_col),
        F.split(F.lower(F.col(text_col)), " ").alias("__t"),
    )
    idx = F.sequence(F.lit(1), F.size("__t") - 1)
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", F.element_at("__t", i), F.element_at("__t", i + 1)
    )
    bigrams = F.when(F.size("__t") >= 2, F.transform(idx, mk)).otherwise(
        F.expr("CAST(array() AS array<string>)")
    )
    return tok.select(F.col(id_col), F.explode(bigrams).alias("bigram"))


def bigram_fluency(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = BIGRAM_MIN_COUNT,
) -> DataFrame:
    """Bigram-LM fluency filter: fraction of a document's token
    transitions that the corpus has seen at least ``min_count`` times
    — the sequence-aware sibling of ``lm_quality_score`` (shuffled or
    word-salad text keeps a plausible unigram profile but its
    TRANSITIONS go unseen). Integer counts and one exactly-rounded
    division: bit-portable, like the rest of the family.

    Plan shape: bigram counts are vocab^2-bounded (and long-tail
    sparse) — still broadcastable after the min_count filter at any
    realistic scale; checkpointed so the join doesn't replay the
    corpus scan; one doc-keyed shuffle for the final groupBy.
    """
    bg = _doc_bigrams(docs, id_col=id_col, text_col=text_col)
    counts = (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("bg_count"))
        .filter(F.col("bg_count") >= min_count)
        .localCheckpoint(eager=True)
    )
    per_doc = (
        bg.join(F.broadcast(counts), "bigram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(
                F.col("bg_count").isNotNull().cast("long")
            ).alias("n_known"),
        )
    )
    known_frac = F.col("n_known").cast("double") / F.col("n_bigrams")
    return per_doc.select(
        id_col,
        "n_bigrams",
        "n_known",
        known_frac.alias("known_frac"),
        (known_frac >= F.lit(KNOWN_FRAC_MIN)).alias("fluency_accept"),
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (merge-rank learning)

#: merge iterations for the catalog query (production: 30k-100k; the
#: SHAPE per iteration is identical, only the loop count grows).
BPE_N_MERGES = 10


def _merge_pair_expr(symbols: "Column", x: str, y: str) -> "Column":
    """Rewrite a symbol array replacing each non-overlapping adjacent
    (x, y) with the merged symbol x+y, left-to-right — pure fold
    expression (struct accumulator carries a skip flag), no UDF."""
    from pyspark.sql import functions as F

    merged = x + y
    init = F.struct(
        F.expr("CAST(array() AS array<string>)").alias("arr"),
        F.lit(False).alias("skip"),
    )

    def step(acc, pair):
        take_merge = (
            ~acc["skip"]
            & (pair["s"] == F.lit(x))
            & (pair["nxt"] == F.lit(y))
        )
        new_arr = (
            F.when(acc["skip"], acc["arr"])
            .when(take_merge, F.concat(acc["arr"], F.array(F.lit(merged))))
            .otherwise(F.concat(acc["arr"], F.array(pair["s"])))
        )
        return F.struct(
            new_arr.alias("arr"),
            (~acc["skip"] & take_merge).alias("skip"),
        )

    # the lookahead array must be EXACTLY size(symbols) long: padding
    # an empty input would make arrays_zip emit one phantom (null,
    # null) pair and the fold return [null] instead of []
    lookahead = F.when(
        F.size(symbols) > 0,
        F.concat(
            F.slice(symbols, 2, F.greatest(F.size(symbols) - 1, F.lit(0))),
            F.array(F.lit(None).cast("string")),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    paired = F.arrays_zip(symbols.alias("s"), lookahead.alias("nxt"))
    return F.aggregate(paired, init, step)["arr"]


def _apply_merges_kernel(merges: list[tuple[str, str]]):
    """Arrow kernel applying a ROUND of merges to each symbol array,
    in rank order, each as the same non-overlapping left-to-right
    rewrite ``_merge_pair_expr`` performs (the while-loop's i += 2 is
    the fold's skip flag). Used by the batched trainer so one kernel
    pass replaces ``batch`` chained fold expressions — Catalyst's
    analyzer cost and the interpreted-HOF eval both grow with every
    nested aggregate, while the kernel applies the whole round in one
    vocab-sized Arrow batch."""
    from pyspark.sql.pandas.functions import pandas_udf

    def _one(sym: list, x: str, y: str) -> list:
        out = []
        i = 0
        n = len(sym)
        while i < n:
            if i + 1 < n and sym[i] == x and sym[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        return out

    def _kernel(col):
        import pandas as pd

        res = []
        for sym in col:
            s = list(sym) if sym is not None else []
            for x, y in merges:
                s = _one(s, x, y)
            res.append(s)
        return pd.Series(res)

    return pandas_udf(_kernel, "array<string>")


def bpe_merges(docs: "DataFrame", *, n_merges: int = BPE_N_MERGES,
               text_col: str = "text", batch: int = 1) -> "DataFrame":
    """Learn the first ``n_merges`` BPE merges from the corpus — the
    tokenizer-TRAINING step (token_stats only counts with a fixed
    tokenizer; this learns one). Classic iterative driver-loop shape:

    1. word table: (word, freq) — one groupBy; the working set shrinks
       from corpus-size to vocabulary-size immediately, which is what
       makes per-iteration cost independent of corpus bytes at 100 TB.
    2. per iteration: explode each word's symbol array into adjacent
       pairs, one partial-agg groupBy sums weighted pair counts, the
       argmax pair (count desc, pair asc — deterministic tie-break)
       becomes the next merge, and every word's symbols are rewritten
       by a pure fold expression (no UDF). State localCheckpoints each
       round (flat lineage, the PageRank/k-means convention).

    ``batch`` > 1 is the 32k-vocab scale path: sequential training is
    a serial chain of ~3 tiny driver jobs PER MERGE (32k merges =
    ~100k jobs of pure scheduling latency over a vocab-sized table).
    A batched round computes pair counts ONCE, then greedily accepts
    up to ``batch`` top candidates whose symbols are DISJOINT from
    every earlier acceptee's symbols and merged concats — under that
    rule applying the earlier merges cannot create or destroy any
    occurrence of a later acceptee, so each accepted pair's count
    equals what sequential training would have measured at its turn.
    The accepted round is applied in one Arrow-kernel rewrite
    (2 jobs/round total). The SCHEDULE can differ from sequential in
    two ways: a merge's output symbol can immediately fuel a
    higher-count pair (the cascade lands in a later round), and a
    conflict-EXCLUDED pair is displaced by lower-count disjoint pairs
    within its round — so at an ``n_merges`` truncation boundary the
    batched merge SET itself can differ from sequential's, not just
    its order (e.g. counts (a,b)=100 > (b,c)=90 > (c,d)=80 with
    batch=2, n_merges=2 learn {(a,b),(c,d)} where sequential learns
    {(a,b),(b,c)}). Run to exhaustion or overshoot n_merges when
    set-equality matters. batch=1 — bit-exact, oracle-replayed —
    stays the default; the parity pytest pins agreement on a
    cascade-free corpus.

    Returns (rank, left, right, pair_count). Exactly reproduced by the
    pure-python oracle in tests (rows-only at the driver gate:
    iterative argmax is not ANSI-SQL-expressible)."""
    from pyspark.sql import functions as F

    from ..sources.tables import scan_parallel

    words = (
        scan_parallel(docs)
        .select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(
            F.concat(
                F.split(F.col("w"), ""), F.array(F.lit("</w>"))
            ).alias("symbols"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )
    out = []
    while len(out) < n_merges:
        room = n_merges - len(out)
        m = max(1, min(int(batch), room))
        pairs = words.select(
            F.col("freq"),
            F.explode(
                F.arrays_zip(
                    F.slice(
                        F.col("symbols"),
                        1,
                        F.greatest(F.size("symbols") - 1, F.lit(0)),
                    ).alias("l"),
                    F.slice(
                        F.col("symbols"),
                        2,
                        F.greatest(F.size("symbols") - 1, F.lit(0)),
                    ).alias("r"),
                )
            ).alias("p"),
        )
        ranked = pairs.groupBy(
            F.col("p.l").alias("l"), F.col("p.r").alias("r")
        ).agg(F.sum("freq").alias("n")).orderBy(
            F.col("n").desc(), F.col("l").asc(), F.col("r").asc()
        )
        # bounded driver pull: enough candidates to survive conflict
        # exclusions, still merge-batch-sized (never vocab-scale)
        top = ranked.limit(m if m == 1 else 4 * m + 16).collect()
        if not top:
            break
        accepted: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for row in top:
            if len(accepted) >= m:
                break
            l, r, n = row["l"], row["r"], int(row["n"])
            if l in used or r in used or (l + r) in used:
                continue
            accepted.append((l, r, n))
            used.update((l, r, l + r))
        for l, r, n in accepted:
            out.append((len(out), l, r, n))
        if m == 1 or len(accepted) == 1:
            l, r, _ = accepted[0]
            words = words.select(
                _merge_pair_expr(F.col("symbols"), l, r).alias("symbols"),
                "freq",
            ).localCheckpoint(eager=True)
        else:
            kern = _apply_merges_kernel([(l, r) for l, r, _ in accepted])
            words = words.select(
                kern(F.col("symbols")).alias("symbols"), "freq"
            ).localCheckpoint(eager=True)
    spark = docs.sparkSession
    return spark.createDataFrame(
        out, "rank long, left string, right string, pair_count long"
    )


#: merge-list length above which bpe_encode swaps the chained fold
#: expressions for the Arrow kernel (chained HOFs cost the analyzer
#: and the interpreter one pass PER MERGE).
BPE_ENCODE_EXPR_MAX = 32


def bpe_encode(
    docs: "DataFrame",
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Tokenize every document with a LEARNED merge list — the
    tokenizer-APPLY step that pairs with :func:`bpe_merges` (training
    learns the ranks; this encodes the corpus with them).

    Each merge is one non-overlapping left-to-right rewrite pass
    (:func:`_merge_pair_expr`), applied in rank order — exactly the
    per-rule application the trainer used, so train→encode round-trips
    bit-for-bit (pytest replays both against a pure-python reference).

    Scale shape: merges are applied to the DISTINCT word table
    (vocabulary-sized — corpus bytes don't multiply the merge work),
    then the encoded forms join back to the corpus-sized (doc, pos,
    word) spine and re-assemble in word order. One groupBy for the
    vocab, one hash join on word, one doc_id re-aggregation. Short
    merge lists (<= ``BPE_ENCODE_EXPR_MAX``) apply as chained pure
    fold expressions; longer — realistic — tokenizers switch to one
    Arrow-kernel pass over the vocab table (same rewrite, parity
    pytest-pinned), because a 1000-deep fold-expression chain is an
    analyzer/interpreted-eval blowup, not a plan.

    Returns (id_col, n_tokens, tokens) with ``tokens`` the
    space-joined token sequence.
    """
    spine = (
        scan_parallel(docs)
        .select(
            F.col(id_col),
            F.posexplode(
                F.split(F.lower(F.col(text_col)), " ")
            ).alias("pos", "w"),
        )
        .filter(F.col("w") != "")
    )
    vocab = spine.select("w").distinct().withColumn(
        "symbols",
        F.concat(F.split(F.col("w"), ""), F.array(F.lit("</w>"))),
    )
    if len(merges) <= BPE_ENCODE_EXPR_MAX:
        # expression chain: one fold per merge, all codegen-adjacent —
        # the reference semantics and the oracle-replayable form
        for left, right in merges:
            vocab = vocab.select(
                "w",
                _merge_pair_expr(
                    F.col("symbols"), left, right
                ).alias("symbols"),
            )
    else:
        # realistic tokenizers carry hundreds-to-32k merges: chaining
        # that many fold expressions explodes the analyzer/eval cost
        # (each _merge_pair_expr is an interpreted HOF pass), so apply
        # the whole rank-ordered list in ONE Arrow kernel pass over
        # the vocab-sized table — the identical per-rule
        # non-overlapping left-to-right rewrite (shared with the
        # batched trainer; parity pytest pins kernel == expression)
        kern = _apply_merges_kernel(list(merges))
        vocab = vocab.select(
            "w", kern(F.col("symbols")).alias("symbols")
        )
    encoded = vocab.select("w", F.col("symbols").alias("word_tokens"))
    return (
        spine.join(encoded, "w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "word_tokens"))
                )["word_tokens"]
            ).alias("toks")
        )
        .select(
            id_col,
            F.size("toks").cast("long").alias("n_tokens"),
            F.concat_ws(" ", "toks").alias("tokens"),
        )
    )


# ---------------------------------------------------------------------------
# compression-ratio quality signal (the classic "too compressible =
# repetitive boilerplate / too incompressible = noise" heuristic used
# by Dolma/RefinedWeb-style curation)

COMPRESSION_LEVEL = 6


def compressed_length(col: Column | str, *, level: int = COMPRESSION_LEVEL) -> Column:
    """zlib-compressed byte length of a string column, as an
    Arrow-batched pandas UDF (zlib is not expressible in Catalyst;
    per-row Python is banned, so the batch path is the right slow
    path). Deterministic for a fixed zlib build — the python oracle
    in tests shares the library, the driver gate is rows-only."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    # note: no type hints on the inner fn — under `from __future__
    # import annotations` they stringify and pyspark can't resolve
    # them against this closure's locals; the explicit return type on
    # the decorator is the contract.
    def _clen_fn(s):
        return s.map(
            lambda t: None
            if t is None
            else len(zlib.compress(t.encode("utf-8"), level))
        )

    _clen = pandas_udf(_clen_fn, "long")
    c = F.col(col) if isinstance(col, str) else col
    return _clen(c)


def compression_signals(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document compression diagnostics: raw/compressed byte
    lengths and their ratio (one IEEE division). High ratio flags
    templated/repetitive text; ratio near 1 flags high-entropy noise.
    100 TB: embarrassingly parallel scan-stage Arrow batches — no
    shuffle, no state."""
    out = scan_parallel(docs).select(
        F.col(id_col),
        F.octet_length(text_col).cast("long").alias("byte_len"),
        compressed_length(text_col).alias("compressed_len"),
    )
    return out.withColumn(
        "compression_ratio",
        F.col("byte_len").cast("double") / F.col("compressed_len").cast("double"),
    )
