"""Deduplication operators for large-scale training-data pipelines
(beyond-reference extension, BASELINE.json north star; the reference's
only dedup is last-write-wins upsert, SURVEY 2 I4).

Four strategies, cheapest to most semantic:

- exact:   content-hash groupBy. One shuffle on a 16-byte key.
- n-gram Jaccard: word-shingle overlap. Exact similarity; the
  all-pairs shingle join is the scale bottleneck — at 100 TB drop
  ultra-frequent shingles (they generate quadratic candidate pairs and
  carry no signal) and salt the survivors.
- MinHash+LSH: signature bands -> candidate buckets -> verify. The
  scalable near-dup path: candidate generation is a band-key groupBy,
  not an all-pairs join.
- SimHash: 32-bit sign-random-projection fingerprint; hamming
  distance via xor/bit_count. Cheapest pairwise verify.

All hashing is md5-derived (deterministic, engine-independent), so
results are reproducible across runs and engines — no Date.now()/rand.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.tables import scan_parallel

# ---------------------------------------------------------------------------
# shingling


def _shingles_from_tokens(t: Column, n: int) -> Column:
    """Shingle array from an ALREADY-MATERIALIZED token-array column.

    Perf-critical detail: if ``t`` is the raw ``split(...)`` expression,
    Catalyst inlines it into every ``element_at`` call — n splits per
    shingle, ~16x slower end-to-end (measured 6.2s -> 0.4s at sf0.1).
    Callers must project the token array in a separate select first.
    """
    idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(t, i + j) for j in range(n)]
    )
    return F.when(F.size(t) >= n, F.transform(idx, mk)).otherwise(
        F.expr("CAST(array() AS array<string>)")
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Lowercased word n-gram shingles; empty array when too short.

    Convenience single-expression form — fine for small inputs/tests;
    hot paths should tokenize in a projection first (see
    ``doc_shingles``) so the split isn't re-evaluated per shingle."""
    return _shingles_from_tokens(F.split(F.lower(col), " "), n)


def doc_shingles(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct (id, shingle) pairs — the set representation used by
    Jaccard and MinHash. Tokenizes through a projection boundary so the
    split evaluates once per row, not once per shingle.

    Distinctness is PER DOCUMENT (id is in the pair), so it's enforced
    with ``array_distinct`` inside the row before the explode — a
    table-level ``.distinct()`` would add a full shuffle of the
    exploded postings to deduplicate what each row can deduplicate
    locally. At 100 TB that's an entire corpus-sized shuffle saved."""
    tok = scan_parallel(docs).select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("__t")
    )
    return tok.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(_shingles_from_tokens(F.col("__t"), n))
        ).alias("shingle"),
    )


def doc_shingle_hashes(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Distinct (id, h1, h2) shingle-hash postings — the all-numeric
    shingle table for the LSH hot path. ``h1``/``h2`` are the two
    seeded xxhash64s ``minhash_signatures_fast`` mixes into seed
    hashes; ``h1`` doubles as the set-membership key the exact-Jaccard
    verify intersects. Dropping the shingle STRING at the source means
    the materialized table, both groupBy shuffles, and the verify
    arrays all carry fixed-width longs (8 B vs ~25 B-string elements,
    and long equality instead of string compare in array_intersect).

    A 64-bit collision between two distinct shingles of the same doc
    pair would perturb the Jaccard estimate; at corpus scale the
    expected collision count is ~|pairs|·|set|²/2⁶⁴ — negligible, and
    the md5-string path (``doc_shingles`` + ``shingle_sets``) remains
    the engine-portable exact form."""
    sh = doc_shingles(docs, id_col=id_col, text_col=text_col, n=n)
    return sh.select(
        F.col(id_col),
        F.xxhash64("shingle").alias("h1"),
        F.xxhash64("shingle", F.lit(1)).alias("h2"),
    )


# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup_groups(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content with the
    id to keep (min) and the duplicate count."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard


#: default document-frequency cap: a shingle present in f docs emits
#: f^2/2 rows from the self-join, so ultra-frequent shingles are the
#: quadratic blow-up; they also carry no near-dup signal (boilerplate).
#: 4096 is far above any df on the test corpora (max df ~ tens), so
#: the capped result is identical there — the cap only bites at scale.
MAX_SHINGLE_DF = 4096


def jaccard_pairs(
    shingle_df: DataFrame,
    *,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_df: int | None = MAX_SHINGLE_DF,
) -> DataFrame:
    """All-pairs Jaccard over distinct shingle sets.

    |A ∩ B| via a self-join on shingle; |A|,|B| via per-doc counts.
    Scale guard: shingles whose document frequency exceeds ``max_df``
    are dropped from the set representation BEFORE the self-join (a
    shingle in f docs contributes f^2/2 candidate rows, unbounded).
    Both the counts and the intersection see the capped sets, so the
    result is exact Jaccard over the capped representation; with the
    default cap the test corpora are unaffected (no shingle comes
    close), which keeps the DuckDB oracle exact.
    """
    if max_df is not None:
        df_counts = shingle_df.groupBy("shingle").agg(
            F.count("*").alias("__df")
        )
        shingle_df = (
            shingle_df.join(
                df_counts.filter(F.col("__df") > max_df), "shingle", "left_anti"
            )
        )
    counts = shingle_df.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = shingle_df.alias("a")
    b = shingle_df.alias("b")
    inter = (
        a.join(
            b,
            (F.col(f"a.shingle") == F.col(f"b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    ca = counts.select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")
    )
    cb = counts.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH

N_HASHES = 16
#: 8 bands x 2 rows: P(candidate) = 1-(1-j^2)^8, S-curve threshold
#: (1/b)^(1/r) ~= 0.35. The earlier 4x4 banding (threshold ~0.7)
#: missed a true j>=0.8 pair ~12% of the time per pair — measured as
#: one dropped pair vs the exact-Jaccard oracle at sf0.1 (255/256).
#: At 2-row bands a j=0.8 pair escapes all 8 bands with p~=3e-4, and
#: the extra j-in-[0.35,0.8) candidates are bounded on real corpora
#: (unrelated docs sit at j~0, colliding per band with p=j^2) and are
#: discarded by the exact verify.
N_BANDS = 8


def minhash_signatures(
    shingle_df: DataFrame, *, id_col: str = "doc_id", n_hashes: int = N_HASHES
) -> DataFrame:
    """Per-doc MinHash signature: for seed s, min(md5('s:' || shingle))
    over the doc's shingle set. Lexicographic min over md5 hex is a
    uniform min-hash; md5 keeps it engine-portable and deterministic.
    One groupBy produces all n_hashes components (no n passes)."""
    aggs = [
        F.min(
            F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))
        ).alias(f"mh_{s}")
        for s in range(n_hashes)
    ]
    return shingle_df.groupBy(id_col).agg(*aggs)


def minhash_signatures_fast(
    shingle_df: DataFrame, *, id_col: str = "doc_id", n_hashes: int = N_HASHES
) -> DataFrame:
    """Numeric MinHash for the LSH hot path: two xxhash64 bases per
    shingle, mixed into ``n_hashes`` seed hashes by XOR/bit-rotation
    (the Kirsch-Mitzenmacher two-hash scheme, expressed with
    overflow-free bit ops so ANSI mode cannot throw). Two wins over
    the md5 form: the hash work per shingle drops from 16 md5s to 2
    xxhash64s + bit mixing, and min over LONGS keeps the aggregation
    in fixed-width HashAggregate where 16 string buffers fall back to
    sort-based aggregation.

    NOT oracle-portable (DuckDB has no xxhash64): the md5 form
    (``minhash_signatures``) remains the cross-engine-oracled catalog
    surface; this family's banding recall is gated by the recall
    tests in tests/test_extensions.py and the downstream exact-Jaccard
    verify makes candidate-set differences invisible in output.

    Accepts either shingle-table form: the string table
    (``doc_shingles``: hashes computed here) or the pre-hashed numeric
    table (``doc_shingle_hashes``: ``h1``/``h2`` reused directly, so
    the strings never exist downstream of the tokenizer)."""
    if "h1" in shingle_df.columns and "h2" in shingle_df.columns:
        h1, h2 = F.col("h1"), F.col("h2")
    else:
        h1 = F.xxhash64(F.col("shingle"))
        h2 = F.xxhash64(F.col("shingle"), F.lit(1))

    return shingle_df.groupBy(id_col).agg(
        *[
            F.min(_seed_mix(h1, h2, s)).alias(f"mh_{s}")
            for s in range(n_hashes)
        ]
    )


def _seed_mix(h1: Column, h2: Column, s: int) -> Column:
    """Seed hash s from the two xxhash64 bases — the
    Kirsch-Mitzenmacher mixer ``minhash_signatures_fast`` and the
    fused ``minhash_lsh_dedup`` aggregation share (XOR with a
    bit-rotation of h2, overflow-free under ANSI)."""
    rot = F.shiftleft(h2, s).bitwiseOR(F.shiftrightunsigned(h2, 64 - s))
    return h1.bitwiseXOR(rot)


def band_postings(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """(id, band, band_key) postings from a signature table — the unit
    the LSH bucket-join and the incremental streaming dedup share."""
    rows_per_band = n_hashes // n_bands
    return signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        # band key = one xxhash64 over the band's
                        # minhash columns (works for the md5-string
                        # and numeric signature forms alike); a LONG
                        # join key, and a rare 64-bit bucket collision
                        # only ADDS a candidate the exact-Jaccard
                        # verify then discards
                        F.xxhash64(
                            *[
                                F.col(f"mh_{band * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ]
                        ).alias("band_key"),
                    )
                    for band in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.band_key")


def minhash_signatures_from_docs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """Signature computation WITHOUT the shingle explode: per-doc
    shingle array -> ``array_min`` over per-seed hash transforms, all
    inside one codegen'd projection — skips the explode+distinct+
    groupBy shuffle of ``minhash_signatures``.

    Hash: md5 (engine-portable, same as ``minhash_signatures`` so both
    paths band identically). Measured trade-offs on this corpus: a
    seeded xxhash64 bought no wall-clock (join/scheduling bound) and
    its banding recall differed; this array form itself lost to the
    explode+groupBy path inside ``minhash_lsh_dedup`` (transform-array
    allocation cost) — kept for callers that need signatures without
    an exploded shingle table."""
    tok = scan_parallel(docs).select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("__t")
    )
    feats = tok.select(
        F.col(id_col),
        F.array_distinct(_shingles_from_tokens(F.col("__t"), 3)).alias("__f"),
    ).filter(F.size("__f") > 0)
    def seed_hash(s: int):
        # closure factory, NOT `lambda x, s=s`: a second lambda param
        # (even defaulted) selects transform's BINARY (element, index)
        # form and the "seed" silently becomes the index column
        prefix = f"{s}:"
        return lambda x: F.md5(F.concat(F.lit(prefix), x))

    hashed = feats.select(
        F.col(id_col),
        *[
            F.array_min(F.transform(F.col("__f"), seed_hash(s))).alias(
                f"mh_{s}"
            )
            for s in range(n_hashes)
        ],
    )
    return hashed


def pairs_from_postings(
    banded: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Self-join a (id, band, band_key) postings table into distinct
    candidate (id_a, id_b) pairs. Split out so callers that already
    hold a materialized postings table (``minhash_lsh_dedup``) join it
    twice instead of re-deriving it per side."""
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """Band the signature and bucket-join: docs sharing any band's
    concatenated minhashes become candidates. This replaces the
    quadratic all-pairs join with (band_key -> ids) groupBys."""
    banded = band_postings(
        signatures, id_col=id_col, n_hashes=n_hashes, n_bands=n_bands
    )
    return pairs_from_postings(banded, id_col=id_col)


def jaccard_for_pairs(
    shingle_df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard restricted to the given (id_a, id_b) pairs —
    cost proportional to the candidate set, NOT all pairs. This is
    what makes LSH worthwhile.

    Shape: fold each doc's shingles into ONE array row (bounded by a
    single document's length, so safe at any corpus scale), then two
    equi-joins land both sets on the candidate row and
    ``array_intersect`` computes the overlap in-row. Compared to the
    previous postings-level (id, shingle)=(id, shingle) join this
    removes the widest shuffle of the verify stage — the join keys
    are doc ids, never the shingle strings. Pairs with zero overlap
    emit jaccard 0.0 (callers threshold-filter)."""
    sets = shingle_sets(shingle_df, id_col=id_col)
    return jaccard_from_sets(sets, pairs, id_col=id_col)


def shingle_sets(
    shingle_df: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Fold (id, shingle) postings into one (id, __set, __n) row per
    doc — the unit the pairwise-Jaccard join consumes. Works for the
    string table and the hashed table alike (set elements are whatever
    the postings carry: shingle strings, or ``h1`` longs)."""
    set_col = "h1" if "h1" in shingle_df.columns else "shingle"
    return shingle_df.groupBy(id_col).agg(
        F.collect_set(set_col).alias("__set"),
        F.count("*").alias("__n"),
    )


def jaccard_from_sets(
    sets: DataFrame, pairs: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard for (id_a, id_b) pairs from a prebuilt
    ``shingle_sets`` table; callers that materialize the sets join
    them twice instead of re-aggregating per side."""
    a = sets.select(
        F.col(id_col).alias("id_a"),
        F.col("__set").alias("__set_a"),
        F.col("__n").alias("__n_a"),
    )
    b = sets.select(
        F.col(id_col).alias("id_b"),
        F.col("__set").alias("__set_b"),
        F.col("__n").alias("__n_b"),
    )
    inter = F.size(F.array_intersect(F.col("__set_a"), F.col("__set_b")))
    jac = inter / (F.col("__n_a") + F.col("__n_b") - inter)
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
    )


#: shingles appearing in more documents than this are dropped from
#: the SIGNATURE input (verify always uses the full sets). A shingle
#: shared corpus-wide is boilerplate, not a near-dup signal — and when
#: such a shingle's hash wins a minhash seed, every doc containing it
#: shares that signature component, so band buckets (and the candidate
#: self-join) go quadratic in the boilerplate's df. Measured on the
#: 8x scaling corpus before the guard: 17.5M candidates from 40k docs
#: (buckets of ~2k docs) vs 941 candidates at 1x. Gate corpora df is
#: orders of magnitude below the cap, so oracle behavior is
#: bit-identical; same precedent as ``jaccard_pairs(max_df)``.
#: Caveat: a doc consisting ENTIRELY of >max_df boilerplate drops out
#: of candidate generation — exact dedup (hash of normalized text) is
#: the right tool for those, not LSH.
LSH_MAX_DF = 4096


def minhash_lsh_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    materialize: bool = True,
    max_df: int | None = LSH_MAX_DF,
) -> DataFrame:
    """Full near-dup pipeline: shingle -> minhash -> LSH candidates ->
    exact-Jaccard verify of the candidates only (never all pairs).

    Signatures come from the exploded shingle table (shared with the
    verify branch) — measured faster than the array-projection variant
    (``minhash_signatures_from_docs``), whose 16 per-seed transform
    arrays allocate more than the explode+groupBy they avoid.

    The shingle table feeds FOUR consumers (signatures, per-doc counts,
    and both sides of the intersection join); left lazy, each one
    re-scans and re-shingles the corpus — five full-corpus reads per
    run, which is the 100 TB killer. ``materialize`` (default) runs the
    shingle job once and pins the result via ``localCheckpoint`` — a
    bounded, lineage-truncating materialization whose blocks are freed
    when the DataFrame is garbage-collected, unlike a leaked
    ``.persist()`` that would squat in the cache for the session. At
    warehouse scale the equivalent is writing the shingle table to
    storage between stages.

    Even with the shingle table pinned, the lazy composition walks it
    FOUR times — the band self-join recomputes the 16-way minhash
    aggregation for each side, and the verify stage recomputes the
    collect_set aggregation for each side (measured: the two duplicate
    SortAggregate/ObjectHashAggregate branches dominate task CPU).
    ``materialize`` therefore also pins the two derived tables each
    self-join consumes — band postings (4 rows/doc, tiny) and per-doc
    shingle sets (one row/doc, bounded by document length) — so every
    aggregation over the shingle table runs exactly once.

    The shingle table here is the ALL-NUMERIC form
    (``doc_shingle_hashes``): shingle strings die at the tokenizer, so
    the pinned table, both aggregations, and the verify-side
    array_intersect all move fixed-width longs."""
    sh = doc_shingle_hashes(docs, id_col=id_col, text_col=text_col)
    if materialize:
        sh = sh.localCheckpoint(eager=True)
    sig_in = sh
    if max_df is not None:
        # shingle rows are distinct per doc, so count(*) per shingle
        # IS document frequency. The DROP set (df > cap) is tiny by
        # construction — only corpus-wide boilerplate crosses the cap
        # — so it broadcasts and the filter is a broadcast anti-join:
        # the shingle table itself never reshuffles. (The keep-set
        # inner-join formulation shuffles the whole shingle table a
        # second time; at 100 TB the blocklist broadcast is exactly
        # the CCNet arrangement.)
        drop = (
            sh.groupBy("h1", "h2")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("h1", "h2")
        )
        sig_in = sh.join(F.broadcast(drop), ["h1", "h2"], "left_anti")
    # NB (r8): fusing the two aggregations below into ONE grouped pass
    # (flag-guarded min + collect_set in a single groupBy) was built
    # and A/B-measured: 1.48 s -> 1.82 s min-of-4 at sf0.1. collect_set
    # forces the whole fused agg through ObjectHashAggregate (the 16
    # long-min columns lose their fixed-width HashAggregate), and the
    # fused plan serializes what the thread pool below overlaps. Both
    # shapes partial-aggregate identically at scale, so the split +
    # overlapped form is kept.
    banded = band_postings(
        minhash_signatures_fast(sig_in, id_col=id_col), id_col=id_col
    )
    sets = shingle_sets(sh, id_col=id_col)
    if materialize:
        # the two derived tables are independent jobs over the pinned
        # shingles; submitted from one thread they run back-to-back,
        # so overlap them — neither aggregation saturates the cluster
        # (the minhash agg is bounded by the shingle partition count)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_banded = pool.submit(banded.localCheckpoint, eager=True)
            f_sets = pool.submit(sets.localCheckpoint, eager=True)
            banded = f_banded.result()
            sets = f_sets.result()
    cand = pairs_from_postings(banded, id_col=id_col)
    return jaccard_from_sets(sets, cand, id_col=id_col).filter(
        F.col("jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# SimHash

SIMHASH_BITS = 32


def simhash(col: Column | str, bits: int = SIMHASH_BITS) -> Column:
    """Sign-random-projection fingerprint over 3-word shingles.

    Shingle hash = first 8 md5 hex chars as a 32-bit int; bit b of the
    fingerprint is the sign of sum over shingles of (2*bit_b(hash)-1).
    Shingles (not tokens) are the feature set: on small-vocabulary
    corpora token sets are near-identical across unrelated docs, and a
    token-level simhash collapses (measured: ~1k hamming-0 pairs among
    unrelated docs on the test corpus; shingle-level separates
    cleanly). Pure expressions — the 32 per-bit sums collapse into one
    whole-stage-codegen'd projection.
    """
    features = F.array_distinct(word_shingles(col, 3))
    h = F.transform(
        features,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    out = F.lit(0).cast("long")
    for b in range(bits):
        contrib = F.aggregate(
            h,
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + (F.shiftright(x, b).bitwiseAND(F.lit(1)) * 2 - 1),
        )
        out = out + F.when(contrib > 0, F.lit(1 << b)).otherwise(0).cast(
            "long"
        )
    return out


def simhash_fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Staged fingerprint computation: tokenize -> shingle -> hash
    array -> 32 bit-sums, each through a projection boundary so no
    expensive expression is re-inlined per use (same pitfall as
    ``_shingles_from_tokens``)."""
    tok = scan_parallel(docs).select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("__t")
    )
    feats = tok.select(
        F.col(id_col),
        F.array_distinct(_shingles_from_tokens(F.col("__t"), 3)).alias("__f"),
    )
    hashes = feats.select(
        F.col(id_col),
        F.transform(
            F.col("__f"),
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
        ).alias("__h"),
    )
    h = F.col("__h")
    out = F.lit(0).cast("long")
    for b in range(bits):
        contrib = F.aggregate(
            h,
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + (F.shiftright(x, b).bitwiseAND(F.lit(1)) * 2 - 1),
        )
        out = out + F.when(contrib > 0, F.lit(1 << b)).otherwise(0).cast(
            "long"
        )
    return hashes.select(F.col(id_col), out.alias("fp"))


def _fp_chunks(fp: Column, n_chunks: int, bits: int = SIMHASH_BITS) -> list[Column]:
    """Split a ``bits``-wide fingerprint into ``n_chunks`` contiguous
    bit ranges (widths as equal as possible)."""
    base, extra = divmod(bits, n_chunks)
    out, lo = [], 0
    for i in range(n_chunks):
        w = base + (1 if i < extra else 0)
        out.append(F.shiftright(fp, lo).bitwiseAND(F.lit((1 << w) - 1)))
        lo += w
    return out


def simhash_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 4,
) -> DataFrame:
    """Near-dup pairs by hamming distance on simhash fingerprints —
    EXACT result via pigeonhole chunk banding, never an all-pairs join.

    The fingerprint is split into ``max_hamming + 1`` contiguous bit
    chunks; two fingerprints within hamming distance d <= max_hamming
    differ in at most d chunks, so they agree exactly on at least one
    chunk (pigeonhole). Candidates therefore come from equi-joins on
    (chunk_index, chunk_value) — the same groupBy-shaped plan as LSH
    bands, but with recall 1 by construction. Hamming is then verified
    on candidates only (xor + bit_count). Parity with the all-pairs
    form is asserted in tests/test_extensions.py.
    """
    n_chunks = max_hamming + 1
    fp = simhash_fingerprints(docs, id_col=id_col, text_col=text_col)
    chunked = fp.select(
        F.col(id_col),
        F.col("fp"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("ck"), c.alias("ckv"))
                    for i, c in enumerate(_fp_chunks(F.col("fp"), n_chunks))
                ]
            )
        ).alias("c"),
    ).select(id_col, "fp", "c.ck", "c.ckv")
    a = chunked.select(
        "ck", "ckv", F.col(id_col).alias("id_a"), F.col("fp").alias("fp_a")
    )
    b = chunked.select(
        "ck", "ckv", F.col(id_col).alias("id_b"), F.col("fp").alias("fp_b")
    )
    cand = (
        a.join(b, ["ck", "ckv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs_allpairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 4,
) -> DataFrame:
    """All-pairs reference form of ``simhash_pairs`` — O(N^2); kept as
    the parity oracle for the pigeonhole-banded plan (pytest), never
    the path a catalog query runs."""
    fp = simhash_fingerprints(docs, id_col=id_col, text_col=text_col)
    a, b = fp.alias("a"), fp.alias("b")
    ham = F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# near-dup clustering (connected components)


def neardup_clusters(pairs: DataFrame, *, max_iter: int = 20) -> DataFrame:
    """Connected components over near-dup pairs: every doc in a
    component gets ``cluster_id`` = the component's minimum doc_id
    (the survivor a dedup pass would keep).

    Iterative min-label propagation — labels flow across edges until
    fixpoint, a driver-side loop of join+groupBy jobs (the classic
    Spark iterative-graph shape; converges in O(component diameter)
    rounds, and near-dup components are tiny by construction). The
    loop materializes each round via localCheckpoint to cut the
    growing lineage.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("id_b").alias("src"), F.col("id_a").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("nid"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == F.col("nid"), "left")
            .select(
                "id",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("id").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )


# ---------------------------------------------------------------------------
# prefix-filtering exact set-similarity join (AllPairs / PPJoin family)


def prefix_filter_pairs(
    shingle_df: DataFrame,
    *,
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT Jaccard >= ``threshold`` pairs via prefix filtering — the
    AllPairs/PPJoin candidate scheme (Bayardo et al. WWW'07; Vernica et
    al. SIGMOD'10 for the MapReduce shape), the third scale-safe dedup
    path next to MinHash-LSH (probabilistic recall) and pigeonhole
    SimHash (hamming only). Unlike LSH there is NO recall loss: the
    filter is lossless, so the output equals the all-pairs join's.

    Why it is complete: order all shingles by a fixed global total
    order (ascending document frequency, then shingle text — rare
    first, so prefixes land on low-fan-out join keys). Give each doc's
    sorted shingle list a prefix of length ``n - ceil(t*n) + 1``. If
    J(A,B) >= t then |A∩B| >= t*|A∪B| >= t*max(|A|,|B|), so fewer than
    ``n - ceil(t*n) + 1`` of either side's smallest shingles can be
    unshared — the globally-first shared shingle sits inside BOTH
    prefixes and the prefix equi-join finds the pair.

    Plan shape (every stage a bounded-key shuffle, no all-pairs join):
    df-count groupBy -> per-doc sort (collect_list is per-doc bounded)
    -> prefix explode -> equi-join on shingle (prefixes only: ~(1-t)
    of the corpus postings, rarest shingles => smallest groups) with a
    symmetric size filter -> exact intersection count restricted to
    candidate pairs. Callers should localCheckpoint ``shingle_df``
    (it feeds four subtrees).
    """
    dfc = shingle_df.groupBy("shingle").agg(F.count("*").alias("__df"))
    per_doc = (
        shingle_df.join(dfc, "shingle")
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("__df", "shingle"))
            ).alias("__ord"),
            F.count("*").alias("n_sh"),
        )
    )
    plen = (
        F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    ).cast("int")
    prefix = per_doc.select(
        F.col(id_col),
        F.col("n_sh"),
        F.explode(F.slice("__ord", F.lit(1), plen)).alias("__e"),
    ).select(id_col, "n_sh", F.col("__e.shingle").alias("shingle"))
    a = prefix.select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"), "shingle"
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"), "shingle"
    )
    # J >= t forces t*|A| <= |B| and t*|B| <= |A|: prune size-skewed
    # candidates before the distinct
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_b") >= F.ceil(F.lit(threshold) * F.col("n_a")))
            & (F.col("n_a") >= F.ceil(F.lit(threshold) * F.col("n_b")))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sa = shingle_df.select(F.col(id_col).alias("id_a"), "shingle")
    sb = shingle_df.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    counts = shingle_df.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# exact substring dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better": find verbatim token spans repeated
# across documents, as maximal per-doc spans ready for removal)

SUBSTRING_WINDOW = 12


def duplicate_substring_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = SUBSTRING_WINDOW,
    min_docs: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """Maximal cross-document verbatim token spans per document.

    ``keep_first=True`` applies the keep-one-copy policy at the
    window level: the canonical document (min id) for each duplicated
    window hash is EXEMPT from that window's mark, so a later removal
    pass preserves exactly one copy of every duplicated passage
    (Lee et al.'s actual dedup rule, vs. remove-everywhere).

    The suffix-array pass of Lee et al. re-expressed as dataflow:
    tokenize -> posexplode every ``window``-token sliding window ->
    two seeded xxhash64 window hashes (128 effective bits, so window
    equality is collision-safe at corpus scale like Lee et al.'s
    md5-truncated keys, but the group/join keys are two LONGS: the
    hash itself is ~5x cheaper than md5 and the shuffle rows carry 16
    bytes instead of a 32-char string) -> ONE groupBy(hash) marks
    hashes seen in >= ``min_docs`` distinct docs -> semi-join the
    marks back onto the positions -> per-doc gaps-and-islands merge
    of overlapping windows into maximal spans. Output:
    (id, span_start, span_end, span_tokens) with 1-based token
    indices and exclusive end — exactly the spans a remover would cut.

    100 TB: the window table is ~|tokens| rows of (id, pos, hash);
    both the duplicate-marking aggregate and the semi-join shuffle on
    the hash key — never an all-pairs join, and fan-out is linear in
    corpus tokens. The island merge partitions by doc (bounded by doc
    length). Ultra-frequent boilerplate windows are precisely the
    spans this operator exists to surface, so unlike ``jaccard_pairs``
    no df cap applies — a hash's row count is its true duplication
    mass and flows through one aggregate, not a self-join.
    """
    from pyspark.sql.window import Window

    tok = scan_parallel(docs).select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("__t")
    )
    win = (
        tok.select(
            F.col(id_col),
            F.posexplode(_shingles_from_tokens(F.col("__t"), window)).alias(
                "pos0", "wtext"
            ),
        )
        .select(
            F.col(id_col),
            (F.col("pos0") + 1).cast("bigint").alias("pos"),
            F.xxhash64("wtext").alias("wh1"),
            F.xxhash64("wtext", F.lit(1)).alias("wh2"),
        )
        # the window table feeds BOTH the duplicate-marking aggregate
        # and the semi-join back; materialize it once so the corpus is
        # scanned (and tokenized/hashed) once, not twice — the same
        # single-materialization rule as the LSH shingle table
        .localCheckpoint(eager=True)
    )
    dup = (
        win.groupBy("wh1", "wh2")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.min(id_col).alias("__canon"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
    if keep_first:
        marked = (
            win.join(dup.select("wh1", "wh2", "__canon"), ["wh1", "wh2"])
            .filter(F.col(id_col) != F.col("__canon"))
            .select(id_col, "pos")
        )
    else:
        marked = win.join(
            dup.select("wh1", "wh2"), ["wh1", "wh2"], "left_semi"
        )
    w = Window.partitionBy(id_col).orderBy("pos")
    stepped = marked.withColumn(
        "__step",
        F.when(F.col("pos") > F.lag("pos", 1).over(w) + window, 1).otherwise(0),
    )
    isl = stepped.withColumn("__isl", F.sum("__step").over(w))
    return (
        isl.groupBy(id_col, "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + window).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = SUBSTRING_WINDOW,
    min_docs: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """The FIX half of exact-substring dedup (Lee et al. 2022): cut
    the cross-document duplicate spans out of every document and
    re-emit the cleaned (lowercased) token stream.

    One non-shuffling pass after the span find: spans fold to a
    per-doc array (bounded by doc length), join back on the doc id,
    and a single indexed higher-order filter drops token positions
    covered by any span — no explode of the token stream, no second
    corpus shuffle. Docs with no spans pass through via the null
    coalesce. Policy: default removes EVERY occurrence of a
    duplicated span; ``keep_first=True`` exempts the canonical
    (min-id) document per duplicated window, preserving exactly one
    copy of each passage (Lee et al.'s actual dedup rule)."""
    spans = duplicate_substring_spans(
        docs,
        id_col=id_col,
        text_col=text_col,
        window=window,
        min_docs=min_docs,
        keep_first=keep_first,
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("__spans")
    )
    tok = docs.select(
        F.col(id_col),
        F.split(F.lower(F.col(text_col)), " ").alias("__t"),
    )
    joined = tok.join(per_doc, id_col, "left").select(
        F.col(id_col),
        "__t",
        F.coalesce(
            "__spans", F.expr("CAST(array() AS array<struct<s:bigint,e:bigint>>)")
        ).alias("__sp"),
    )
    # indexed (element, index) lambda: position i is 0-based, spans
    # are 1-based start / exclusive end
    kept = F.filter(
        F.col("__t"),
        lambda x, i: ~F.exists(
            F.col("__sp"),
            lambda s: (i + 1 >= s["s"]) & (i + 1 < s["e"]),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.size("__t").cast("int").alias("n_tokens_before"),
        F.size(kept).cast("int").alias("n_tokens_after"),
        F.concat_ws(" ", kept).alias("cleaned_text"),
    )
