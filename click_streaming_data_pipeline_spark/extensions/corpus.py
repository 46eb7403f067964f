"""Corpus-curation operators for LLM training-data pipelines
(beyond-reference extension, same family as ``extensions/text.py``):
deterministic dataset splits, C4/Gopher-style quality heuristics,
within-document repetition, benchmark-contamination checks, and
stratified downsampling.

Everything is a pure column expression over one scan — no Python, no
shuffles except the explicitly-aggregating summaries — so each pass
over 100 TB is a single codegen'd map stage.

Determinism/portability: split and sampling buckets come from md5-hex
PREFIX RANGES compared as strings (e.g. bucket < 'cd' keeps
205/256 = 80.1%), the same engine-portable md5 trick the MinHash
oracle uses — no RNG, no engine-specific hash, reshard-stable
(a document's split never changes when the corpus grows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import scan_parallel
from .dedup import _shingles_from_tokens

#: hex-prefix thresholds: first 2 md5 hex chars range over 256 values,
#: so '<cd' = 205/256 = 80.08% and '<e6' = 230/256 = 89.84%.
TRAIN_MAX_HEX = "cd"
VAL_MAX_HEX = "e6"

#: English stopwords for the quality heuristics (subset shared with
#: the corpus vocabulary so the fraction varies on test data).
QUALITY_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")

#: Gopher-ish acceptance thresholds, tuned so the test corpus lands on
#: both sides of every gate (the *shape* is what matters; production
#: tunes numbers per corpus).
MIN_TOKENS = 20
MAX_TOKENS = 1_000
MIN_MEAN_TOKEN_LEN = 3.0
MAX_MEAN_TOKEN_LEN = 10.0
MAX_DUP_3GRAM_FRAC = 0.25


def split_bucket(id_col: Column | str) -> Column:
    """2-hex-char md5 bucket of the id — 256 deterministic buckets."""
    return F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)


def dataset_split(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    train_max_hex: str = TRAIN_MAX_HEX,
    val_max_hex: str = VAL_MAX_HEX,
) -> DataFrame:
    """Assign train/val/test by hashed-id bucket range: ~80/10/10 with
    the default thresholds. Hash-of-id (not position) keeps the
    assignment stable under reshuffling, appends, and repartitioning —
    the property a training pipeline actually needs from a split."""
    b = split_bucket(id_col)
    return docs.select(
        F.col(id_col),
        b.alias("bucket"),
        F.when(b < train_max_hex, F.lit("train"))
        .when(b < val_max_hex, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def _tokens(text_col: str) -> Column:
    return F.split(F.lower(F.col(text_col)), " ")


def _quality_signals_kernel():
    """Arrow kernel computing the five quality signals per batch —
    the numpy/pure-python twin of the expression form below (which
    stays in ``quality_heuristics_expr`` as the reference semantics
    and the parity-test baseline). Replicated semantics, per row:

    - tokens = lower(text).split(' ') — Python ``str.split(' ')``
      keeps empty fields exactly like Spark ``split(_, ' ', -1)``
      (''.split(' ') == [''] on both).
    - n_tokens = len(tokens) (Spark ``F.size``); sum of ``len(tok)``
      counts CODE POINTS like Spark ``length`` (UTF8String.numChars).
    - alpha tokens: Java ``rlike '^[a-z]+$'`` == Python
      ``fullmatch('[a-z]+')`` (ASCII class on both engines).
    - 3-gram dup fraction over space-joined shingles, [] when <3
      tokens; every ratio is ONE IEEE division (bit-identical).
    - NULL text mirrors the expression path: size(null)=NULL ->
      n_tokens/alpha/stopword NULL, mean/dup fall to the 0.0
      ``otherwise`` branches.
    - lowercase: Python ``str.lower()`` is locale-independent; Java
      ``toLowerCase()`` behind Spark ``lower()`` follows the JVM
      default locale ('I' -> 'ı' on tr_TR). ``session.get_spark``
      pins ``-Duser.language=en`` on both driver and executors so
      the two agree; on a foreign pre-existing JVM the parity claim
      holds for ASCII + locale-insensitive mappings only.

    Why: the expression form's higher-order folds are interpreted per
    array element (~0.2us each; 5 signal passes per doc) — measured
    ~10 CPU-s per 5k docs at sf0.1. The kernel is also an optimizer
    FENCE (ArrowEvalPython), replacing the explode(array(struct))
    fence that previously stopped filter pushdown from re-inlining
    the signal trees (the plan-lint duplication guard covers both)."""
    import re

    alpha_re = re.compile(r"[a-z]+")
    stops = frozenset(QUALITY_STOPWORDS)

    def _kernel(texts):
        import pandas as pd

        n_toks, means, alphas, stopfs, dups = [], [], [], [], []
        for text in texts:
            if text is None:
                n_toks.append(None)
                means.append(0.0)
                alphas.append(None)
                stopfs.append(None)
                dups.append(0.0)
                continue
            t = text.lower().split(" ")
            n = len(t)
            sum_len = 0
            alpha = 0
            stop = 0
            for tok in t:
                sum_len += len(tok)
                if alpha_re.fullmatch(tok):
                    alpha += 1
                if tok in stops:
                    stop += 1
            n_toks.append(n)
            means.append(sum_len / n if n > 0 else 0.0)
            alphas.append(alpha / n)
            stopfs.append(stop / n)
            if n >= 3:
                n_sh = n - 2
                sh = {" ".join(t[i: i + 3]) for i in range(n_sh)}
                dups.append(1.0 - len(sh) / n_sh)
            else:
                dups.append(0.0)
        return pd.DataFrame(
            {
                "n_tokens": pd.array(n_toks, dtype="Int32"),
                "mean_token_len": pd.array(means, dtype="float64"),
                "alpha_frac": pd.array(alphas, dtype="float64"),
                "stopword_frac": pd.array(stopfs, dtype="float64"),
                "dup_3gram_frac": pd.array(dups, dtype="float64"),
            }
        )

    from pyspark.sql.pandas.functions import pandas_udf

    return pandas_udf(
        _kernel,
        "n_tokens int, mean_token_len double, alpha_frac double, "
        "stopword_frac double, dup_3gram_frac double",
    )


def quality_heuristics(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """C4/Gopher-style per-document quality signals in ONE Arrow
    batch pass (see ``_quality_signals_kernel`` for the replicated
    semantics); ``quality_heuristics_expr`` keeps the original
    pure-expression form as the reference, and a parity pytest pins
    kernel == expression row-for-row. ``carry_cols`` pass through
    untouched so composers (export_manifest) stay one-scan."""
    sig = _quality_signals_kernel()
    out = scan_parallel(docs).select(
        F.col(id_col),
        *carry_cols,
        sig(F.col(text_col)).alias("__sig"),
    ).select(F.col(id_col), *carry_cols, "__sig.*")
    ok = (
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("n_tokens") <= MAX_TOKENS)
        & (F.col("mean_token_len") >= MIN_MEAN_TOKEN_LEN)
        & (F.col("mean_token_len") <= MAX_MEAN_TOKEN_LEN)
        & (F.col("dup_3gram_frac") <= MAX_DUP_3GRAM_FRAC)
    )
    return out.withColumn("quality_ok", ok)


def quality_heuristics_expr(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """C4/Gopher-style per-document quality signals, one codegen pass:
    token count, mean token length, alphabetic-token fraction,
    stopword fraction, duplicate-3-gram fraction, and the combined
    accept flag. The duplicate-3-gram fraction is the classic
    within-doc repetition signal (Gopher's rep. filters); computed
    from the shingle array without exploding. ``carry_cols`` pass
    through untouched so composers (export_manifest) stay one-scan."""
    tok = scan_parallel(docs).select(
        F.col(id_col), *carry_cols, _tokens(text_col).alias("__t")
    )
    sh = tok.select(
        F.col(id_col),
        *carry_cols,
        F.col("__t"),
        _shingles_from_tokens(F.col("__t"), 3).alias("__sh"),
    )
    n_tokens = F.size("__t")
    sum_len = F.aggregate(
        F.col("__t"), F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    mean_token_len = F.when(n_tokens > 0, sum_len / n_tokens).otherwise(
        F.lit(0.0)
    )
    alpha_tokens = F.size(F.filter(F.col("__t"), lambda t: t.rlike("^[a-z]+$")))
    stop_tokens = F.size(
        F.filter(F.col("__t"), lambda t: t.isin(*QUALITY_STOPWORDS))
    )
    n_sh = F.size("__sh")
    n_sh_distinct = F.size(F.array_distinct("__sh"))
    dup_frac = F.when(
        n_sh > 0, F.lit(1.0) - n_sh_distinct / n_sh
    ).otherwise(F.lit(0.0))
    # The signal struct leaves this function through a 1-element
    # explode: a Generate node is an optimizer fence, so a downstream
    # .filter(quality_ok) cannot be alias-substituted below it.
    # Without the fence, PushPredicateThroughNonJoin inlines every
    # signal's full expression tree into the predicate (HOFs get no
    # common-subexpression elimination) — measured 24 rebuilds of the
    # tokenizer per row and a 17x wall blow-up in
    # corpus_build_pipeline. explode(array(struct)) itself is narrow,
    # codegen'd, and never drops rows (the array is always length 1).
    sig = F.struct(
        n_tokens.alias("n_tokens"),
        mean_token_len.alias("mean_token_len"),
        (alpha_tokens / n_tokens).alias("alpha_frac"),
        (stop_tokens / n_tokens).alias("stopword_frac"),
        dup_frac.alias("dup_3gram_frac"),
    )
    out = sh.select(
        F.col(id_col),
        *carry_cols,
        F.explode(F.array(sig)).alias("__sig"),
    ).select(F.col(id_col), *carry_cols, "__sig.*")
    ok = (
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("n_tokens") <= MAX_TOKENS)
        & (F.col("mean_token_len") >= MIN_MEAN_TOKEN_LEN)
        & (F.col("mean_token_len") <= MAX_MEAN_TOKEN_LEN)
        & (F.col("dup_3gram_frac") <= MAX_DUP_3GRAM_FRAC)
    )
    return out.withColumn("quality_ok", ok)


def contamination_counts(
    docs: DataFrame, probes: list[str], *, text_col: str = "text"
) -> DataFrame:
    """Benchmark-contamination scan: for each probe phrase, how many
    documents contain it verbatim (case-insensitive substring). One
    corpus scan computes all probes (P containment tests per row —
    the probe list is a literal, never a join); at 100 TB with large
    probe sets the shape becomes an n-gram inverted-index semi-join,
    same as search_via_index."""
    agg = [
        F.sum(
            (F.instr(F.lower(F.col(text_col)), p.lower()) > 0).cast("long")
        ).alias(f"__p{i}")
        for i, p in enumerate(probes)
    ]
    row = docs.agg(*agg)
    pairs = F.array(
        *[
            F.struct(
                F.lit(p).alias("probe"), F.col(f"__p{i}").alias("n_docs")
            )
            for i, p in enumerate(probes)
        ]
    )
    return row.select(F.explode(pairs).alias("pc")).select(
        "pc.probe", "pc.n_docs"
    )


def stratified_sample_summary(
    docs: DataFrame,
    keep_max_hex: dict[str, str],
    *,
    id_col: str = "doc_id",
    strat_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic per-stratum downsampling report: a document is
    kept when its md5 bucket falls below the stratum's hex threshold
    (e.g. {'en': 'cd', 'de': '80'} keeps ~80% of en, ~50% of de).
    Returns per-stratum totals/kept docs and token sums — the
    'balance the language mix to a token budget' operator. Selection
    is a pure expression; the summary is one partial-agg shuffle."""
    b = split_bucket(id_col)
    thr = F.lit(None).cast("string")
    for stratum, hexmax in sorted(keep_max_hex.items()):
        thr = F.when(F.col(strat_col) == stratum, F.lit(hexmax)).otherwise(thr)
    # null threshold (stratum not listed) -> keep nothing, not null
    kept = F.coalesce(b < thr, F.lit(False))
    n_tok = F.size(_tokens(text_col))
    return (
        docs.select(
            F.col(strat_col), kept.alias("__keep"), n_tok.alias("__nt")
        )
        .groupBy(strat_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("__keep").cast("long")).alias("n_kept"),
            F.sum("__nt").alias("tokens_total"),
            F.sum(F.when(F.col("__keep"), F.col("__nt")).otherwise(0)).alias(
                "tokens_kept"
            ),
        )
    )


# ---------------------------------------------------------------------------
# text normalization + sequence packing (pre-tokenization curation)

#: token budget per packed training sequence (stub scale; production
#: uses the model context length).
PACK_BUDGET = 512


def normalize_text(col: Column | str) -> Column:
    """Canonical cleaning before hashing/dedup/tokenization: collapse
    whitespace runs, strip control characters, trim. Deterministic
    pure expressions — normalization differences are a classic source
    of missed exact-dup matches, so every dedup pass should hash the
    NORMALIZED form."""
    c = F.col(col) if isinstance(col, str) else col
    no_ctl = F.regexp_replace(c, "[\\x00-\\x1f\\x7f]", " ")
    collapsed = F.regexp_replace(no_ctl, " {2,}", " ")
    return F.trim(collapsed)


def pack_sequences(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "lang",
    budget: int = PACK_BUDGET,
) -> DataFrame:
    """Contiguous sequence packing: docs line up in ``id_col`` order
    within each shard and bin ``bin_id`` starts every ``budget``
    tokens (a doc straddling a boundary belongs to the bin where it
    starts). The deterministic form of the packing step that turns a
    ragged corpus into fixed-budget training sequences.

    Scale: packing is a running sum — inherently sequential — so it
    shards by ``shard_col`` (language here; production uses a hash
    bucket sized to taste): one window pass per shard partition, no
    global sort. All integer math: bit-exact across engines.
    """
    from pyspark.sql.window import Window

    # count NON-EMPTY tokens: Spark split vs DuckDB string_split agree
    # on ''/'  ' edge texts in the engine pair tested here, but that is
    # version-dependent — filtering empties on both sides makes the
    # count divergence-proof (VERDICT r3 item 1b).
    n_tok = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    )
    toks = docs.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col),
        n_tok.alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    start = (
        F.sum("n_tokens").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        - F.col("n_tokens")
    )
    # integer division, not floor(double/): bit-exact at any magnitude
    # (float floor is only exact below 2^53; 100 TB offsets get close)
    return toks.select(
        "shard",
        id_col,
        "n_tokens",
        start.alias("start_offset"),
    ).select(
        "shard",
        id_col,
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset DIV {int(budget)}").alias("bin_id"),
    )


# ---------------------------------------------------------------------------
# cross-document boilerplate removal (CCNet-style segment dedup)

#: tokens per non-overlapping segment ("paragraph" analogue for the
#: whitespace-token corpus; production splits on newlines).
SEG_TOKENS = 3
#: a segment appearing in >= this many distinct docs is boilerplate.
BOILER_MIN_DF = 2


def boilerplate_segments(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = SEG_TOKENS,
    min_df: int = BOILER_MIN_DF,
) -> DataFrame:
    """Cross-document boilerplate removal, the CCNet/RefinedWeb line-
    dedup pass: split each doc into non-overlapping ``seg_tokens``
    segments, count each segment's document frequency over the WHOLE
    corpus, drop segments appearing in >= ``min_df`` distinct docs
    (headers/footers/nav chrome in a real web corpus), and reassemble
    the cleaned text in original segment order.

    Returns one row per doc: ``n_segments``, ``n_boiler`` (dropped),
    and ``clean_text`` (kept segments joined in order).

    Scale: one explode (inside the scan stage), one groupBy on the
    segment string for the df table, one shuffle join back on the
    segment, one per-doc groupBy. The df table is bounded by distinct
    segments (vocabulary-like: heavy hitters concentrate), never
    all-pairs; reassembly uses collect_list bounded by a single doc's
    segment count. Beyond-reference extension (LLM-corpus curation);
    no reference twin.
    """
    toks = F.split(F.col(text_col), " ")
    last_idx = F.floor((F.size(toks) - F.lit(1)) / F.lit(seg_tokens)).cast("int")
    seg_arr = F.transform(
        F.sequence(F.lit(0), last_idx),
        lambda i: F.array_join(
            F.slice(toks, i * seg_tokens + F.lit(1), seg_tokens), " "
        ),
    )
    segs = docs.select(
        F.col(id_col), F.posexplode(seg_arr).alias("seg_idx", "seg")
    )
    df_tab = segs.groupBy("seg").agg(
        F.countDistinct(id_col).alias("seg_df")
    )
    flagged = segs.join(df_tab, "seg")
    is_boiler = F.col("seg_df") >= F.lit(min_df)
    kept_struct = F.when(
        ~is_boiler, F.struct(F.col("seg_idx"), F.col("seg"))
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_segments"),
        F.sum(is_boiler.cast("bigint")).alias("n_boiler"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# mixture balancing + filter-funnel observability

#: target per-source token share for mixture rebalancing (uniform over
#: the 20 test sources; production passes per-domain targets).
TARGET_SOURCE_SHARE = 0.05


def source_mixture_weights(
    docs: DataFrame,
    *,
    target_share: float = TARGET_SOURCE_SHARE,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Domain-mixture rebalancing weights (the Pile/DoReMi-style
    mixture step): per source, token totals and the sampling weight
    ``min(1, target_tokens / actual_tokens)`` that downsamples
    over-represented domains to the target share.

    Scale: one partial-agg shuffle reduces the corpus to #sources
    rows; the global total is a window over that tiny aggregate (one
    single-row exchange), never a second corpus scan. All shares are
    exact integer-over-integer IEEE divisions — bit-identical in the
    DuckDB oracle."""
    n_tok = F.size(_tokens(text_col))
    per_src = (
        scan_parallel(docs)
        .select(F.col(source_col), n_tok.alias("__nt"))
        .groupBy(source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("__nt").cast("long")).alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    total = F.sum("n_tokens").over(w)
    target = total.cast("double") * F.lit(float(target_share))
    return per_src.select(
        F.col(source_col),
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / total).alias("token_share"),
        F.least(
            F.lit(1.0), target / F.col("n_tokens").cast("double")
        ).alias("sample_weight"),
    )


#: ordered filter stages for the attrition report; each is a
#: (stage_name, fail-predicate builder) over quality_heuristics cols.
ATTRITION_STAGES = ("min_tokens", "max_tokens", "mean_token_len", "repetition")


def filter_attrition(docs: DataFrame) -> DataFrame:
    """Filter-funnel observability: how many documents each quality
    gate removes, applied in pipeline order (docs failing an earlier
    stage are not re-counted later). Returns one row per stage with
    n_in / n_fail / n_out — the attrition report a curation pipeline
    publishes per snapshot.

    Scale: the per-doc flags ride the same single codegen pass as
    quality_heuristics; the funnel reduces to ONE aggregate row of
    conditional counts (map-side partial agg), then explodes into the
    per-stage report rows driver-side math never touches."""
    m = quality_heuristics(docs)
    f1 = F.col("n_tokens") < MIN_TOKENS
    f2 = F.col("n_tokens") > MAX_TOKENS
    f3 = (F.col("mean_token_len") < MIN_MEAN_TOKEN_LEN) | (
        F.col("mean_token_len") > MAX_MEAN_TOKEN_LEN
    )
    f4 = F.col("dup_3gram_frac") > MAX_DUP_3GRAM_FRAC
    fails = [f1, f2, f3, f4]
    # cumulative: a doc is charged to the FIRST stage it fails
    agg_cols = []
    survived = F.lit(True)
    for i, f in enumerate(fails):
        agg_cols.append(
            F.sum((survived & f).cast("long")).alias(f"__fail{i}")
        )
        survived = survived & ~f
    row = m.agg(F.count("*").alias("__total"), *agg_cols)
    stages = []
    n_in = F.col("__total")
    for i, name in enumerate(ATTRITION_STAGES):
        n_fail = F.col(f"__fail{i}")
        stages.append(
            F.struct(
                F.lit(i + 1).cast("long").alias("stage_idx"),
                F.lit(name).alias("stage"),
                n_in.alias("n_in"),
                n_fail.alias("n_fail"),
                (n_in - n_fail).alias("n_out"),
            )
        )
        n_in = n_in - n_fail
    return row.select(F.explode(F.array(*stages)).alias("s")).select(
        "s.stage_idx", "s.stage", "s.n_in", "s.n_fail", "s.n_out"
    )


# ---------------------------------------------------------------------------
# RAG passage chunking

#: default passage window/stride in whitespace tokens (overlap =
#: window - stride keeps boundary context in two passages).
PASSAGE_TOKENS = 32
PASSAGE_STRIDE = 24


def passage_chunks(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = PASSAGE_TOKENS,
    stride: int = PASSAGE_STRIDE,
) -> DataFrame:
    """Overlapping fixed-token passage windows per document — the
    chunking step a RAG / retrieval-training pipeline runs before
    embedding. Passage p covers tokens [p*stride, p*stride+window);
    the final passage may be short but is never empty; a doc shorter
    than one window yields exactly one passage.

    Scale: pure expressions — tokenize once per row behind a
    projection boundary (the 16x split-inlining trap, see
    _shingles_from_tokens), expand via transform over a precomputed
    index sequence, explode inside the scan stage. 1:N fan-out with
    no shuffle; the explode multiplies rows before any exchange, so
    downstream ops see an already-parallel passage table."""
    tok = scan_parallel(docs).select(
        F.col(id_col), _tokens(text_col).alias("__t")
    )
    n = F.size("__t")
    # number of passages: 1 + ceil(max(0, n - window) / stride)
    n_pass = F.lit(1) + F.ceil(
        F.greatest(n - window, F.lit(0)) / F.lit(stride)
    ).cast("int")
    idx = F.sequence(F.lit(0), n_pass - 1)
    mk = lambda p: F.struct(  # noqa: E731
        p.alias("passage_idx"),
        F.array_join(
            F.slice(F.col("__t"), p * stride + 1, window), " "
        ).alias("passage"),
        F.least(n - p * stride, F.lit(window)).alias("n_tokens"),
    )
    return (
        tok.select(F.col(id_col), F.explode(F.transform(idx, mk)).alias("p"))
        .select(
            id_col,
            F.col("p.passage_idx").cast("bigint").alias("passage_idx"),
            "p.passage",
            F.col("p.n_tokens").cast("bigint").alias("n_tokens"),
        )
    )


def mixture_allocation_sample(
    docs: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """EXACT-count training-mixture construction: select exactly ``k``
    documents, allocated across sources proportionally to their token
    mass by the largest-remainder method (Hamilton apportionment), and
    within each source picked by ascending md5(doc_id) — the
    count-exact companion to the rate-based samplers
    (``stratified_sample_summary`` keeps ~rate, this keeps =quota).

    All allocation math is integer (k*n_s div/mod total), so Spark and
    the SQL oracle agree exactly; selection order (md5 hex, then id)
    is engine-portable. Scale: quotas come from a #sources-row
    aggregate; selection ranks within source — a per-source sort. At
    warehouse scale replace the full rank with an md5-threshold
    prefilter at ~quota/n_s rate (the rate-based sibling) and rank
    only the surviving sliver.
    """
    n_tok = F.size(_tokens(text_col))
    per_src = (
        scan_parallel(docs)
        .select(F.col(source_col), n_tok.alias("__nt"))
        .groupBy(source_col)
        .agg(F.sum(F.col("__nt").cast("long")).alias("n_tokens"))
    )
    wall = Window.partitionBy()
    total = F.sum("n_tokens").over(wall)
    base = (F.lit(int(k)) * F.col("n_tokens"))
    quotas = per_src.select(
        F.col(source_col),
        F.floor(base / total).alias("__q"),
        (base % total).alias("__rem"),
        total.alias("__total"),
    )
    # distribute the k - sum(floor) leftover seats by largest
    # remainder, ties to the lexically-first source (deterministic)
    leftover = F.lit(int(k)) - F.sum("__q").over(wall)
    worder = Window.partitionBy().orderBy(
        F.col("__rem").desc(), F.col(source_col)
    )
    quotas = quotas.select(
        F.col(source_col),
        (
            F.col("__q")
            + (F.row_number().over(worder) <= leftover).cast("long")
        ).alias("quota"),
    )
    # per-source pick ranks: no quota can exceed k (the global seat
    # count), so a map-side per-source top-k on the hash order bounds
    # the window input to partitions x sources x k rows — the bare
    # window shipped EVERY doc of a source to one reducer (few
    # sources, corpus-scale rows: the skew cliff)
    from ..operators.topk import partial_topk_per_key

    cand = (
        scan_parallel(docs)
        .select(F.col(id_col), F.col(source_col))
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
    )
    cand = partial_topk_per_key(
        cand,
        key=source_col,
        order_col="__h",
        descending=False,
        tie_col=id_col,
        k=int(k),
        plain=True,
    )
    sel = Window.partitionBy(source_col).orderBy(
        F.col("__h"), F.col(id_col)
    )
    return (
        cand.withColumn("pick_rank", F.row_number().over(sel))
        .join(quotas, source_col)
        .filter(F.col("pick_rank") <= F.col("quota"))
        .select(id_col, source_col, "pick_rank")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score raw documents by
# how target-like their hashed-token distribution is

DSIR_BUCKETS = 256


def dsir_weights(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_filter: Column | None = None,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Hashed-unigram importance weight of every document against a
    target subcorpus (rows matching ``target_filter``).

    DSIR's estimator is the likelihood ratio of a document under
    hashed n-gram bag models of the target vs the raw corpus. The
    bit-portable spec here stays in integer space: per md5 bucket b,
    ``target_cnt[b]`` / ``raw_cnt[b]`` token counts; a document's
    weight is

        (sum_tok target_cnt[bucket(tok)] * total_raw)
        ---------------------------------------------   as ONE double
        (sum_tok raw_cnt[bucket(tok)]    * total_target)   division

    i.e. the ratio of mean per-token target-rate to raw-rate — exact
    bigint sums/products, a single exactly-rounded IEEE division, so
    Spark and DuckDB agree bit-for-bit (no ln(), per the repo's
    probability-space scoring rule).

    100 TB: ONE tokenized pass feeds two 256-key aggregates (tiny,
    map-side combined) that broadcast back onto the token stream; the
    per-doc sum shuffles on doc_id once. No Python, no all-pairs.
    """
    if target_filter is None:
        target_filter = F.col("lang") == "en"
    tok = scan_parallel(docs).select(
        F.col(id_col),
        target_filter.alias("__is_target"),
        F.explode(_tokens(text_col)).alias("__tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5("__tok"), 1, 8), 16, 10).cast("bigint")
        % n_buckets
    ).alias("bucket")
    tb = tok.select(F.col(id_col), "__is_target", bucket)
    raw_counts = tb.groupBy("bucket").agg(F.count("*").alias("raw_cnt"))
    target_counts = (
        tb.filter("__is_target")
        .groupBy("bucket")
        .agg(F.count("*").alias("target_cnt"))
    )
    totals = raw_counts.agg(
        F.sum("raw_cnt").alias("total_raw")
    ).crossJoin(
        target_counts.agg(F.sum("target_cnt").alias("total_target"))
    )
    scored = (
        tb.join(F.broadcast(raw_counts), "bucket")
        .join(F.broadcast(target_counts), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce("target_cnt", F.lit(0))).alias("target_hits"),
            F.sum("raw_cnt").alias("raw_hits"),
        )
    )
    return scored.crossJoin(F.broadcast(totals)).select(
        F.col(id_col),
        "target_hits",
        "raw_hits",
        (
            (F.col("target_hits") * F.col("total_raw")).cast("double")
            / (F.col("raw_hits") * F.col("total_target")).cast("double")
        ).alias("dsir_weight"),
    )


# ---------------------------------------------------------------------------
# end-to-end export manifest: the curation decision record a training
# pipeline materializes before tokenization — quality gates + exact
# dedup canonicalization + split assignment, per document


def export_manifest(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document export decision: quality_ok (C4/Gopher gates),
    is_canonical (exact-dedup winner = min id per content hash),
    train/val/test split, and the combined ``exported`` flag.

    100 TB shape: ONE base scan computes quality metrics, split
    bucket, and carried attributes in the same codegen pass
    (carry_cols); the only join is the doc-keyed equi-join against
    the winner set from the content-hash aggregate (second scan,
    ~16-byte keys) — both sides shuffle-partition on the id. No
    all-pairs anything; near-dup canonicalization plugs in by
    swapping the winner set for dedup_keep_best's."""
    from .dedup import exact_dedup_groups

    base = quality_heuristics(
        docs, id_col=id_col, text_col=text_col, carry_cols=("lang", "source")
    ).withColumn("split", dataset_split_col(F.col(id_col)))
    keep = exact_dedup_groups(docs, id_col=id_col, text_col=text_col).select(
        F.col("keep_id").alias(id_col), F.lit(True).alias("is_canonical")
    )
    out = base.join(keep, id_col, "left").withColumn(
        "is_canonical", F.coalesce("is_canonical", F.lit(False))
    )
    return out.select(
        id_col,
        "lang",
        "source",
        "n_tokens",
        "quality_ok",
        "is_canonical",
        "split",
        (F.col("quality_ok") & F.col("is_canonical")).alias("exported"),
    )


def dataset_split_col(id_col: Column) -> Column:
    """The split expression behind dataset_split, reusable inline."""
    b = F.substring(F.md5(id_col.cast("string")), 1, 2)
    return (
        F.when(b < TRAIN_MAX_HEX, F.lit("train"))
        .when(b < VAL_MAX_HEX, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def leakage_pairs(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact-duplicate pairs straddling the train/eval boundary: rows
    whose content hash matches a training row but whose own split is
    val/test (see split_leakage_audit catalog query)."""
    s = docs.select(
        F.col(id_col),
        F.md5(text_col).alias("h"),
        dataset_split_col(F.col(id_col)).alias("split"),
    )
    train = s.filter(F.col("split") == "train").select(
        F.col(id_col).alias("train_doc"), "h"
    )
    ev = s.filter(F.col("split") != "train").select(
        F.col(id_col).alias("eval_doc"),
        "h",
        F.col("split").alias("eval_split"),
    )
    return train.join(ev, "h").select(
        "train_doc", "eval_doc", "eval_split"
    )
