"""Map-side top-k combine for ranking windows the optimizer can't
partial-limit.

Spark 3.5+ DOES have a partial phase for the common case: a
``row_number() OVER (PARTITION BY key ORDER BY ...)`` followed by
``filter(rank <= LITERAL)`` infers a ``WindowGroupLimit(Partial)``
BEFORE the exchange (verified in tests/test_physical_design.py), so
those windows already shuffle at most ``partitions x keys x k`` rows
— do NOT wrap them in this combiner; it would only add an Arrow
round-trip (this was measured, and the ANN lanes that briefly used it
here were reverted). ``InferWindowGroupLimit`` cannot fire, though,
when the rank bound is NOT a foldable literal — e.g. stratified
sampling's ``pick_rank <= quota`` where quota is a per-key COLUMN.
There every row of a key still funnels through one reducer (few
sources x corpus-scale rows: the skew cliff), and this module
supplies the missing partial phase: ``partial_topk_per_key`` keeps,
INSIDE each upstream partition, only the k best rows per key
(Arrow-batched ``mapInArrow`` — no shuffle), for any k that upper-
bounds the caller's data-dependent rank cutoff.

``InferWindowGroupLimit`` also silently stops firing when the rank
bound exceeds ``spark.sql.optimizer.windowGroupLimitThreshold``
(default 1000) — verified: limit 1000 plans a Partial node, 1001
plans none. :func:`ensure_partial_limit` covers that seam: a no-op
while the bound is within the threshold (the built-in partial phase
is JVM-side and cheaper), it applies the Arrow combiner above it, so
caller-controlled bounds (a PQ ``rerank * k`` shortlist, a large
brute-force k) never fall off the cliff unannounced.

EXACTNESS: the global top-k under a total order is a subset of every
partition's per-key top-k under the same order, so pre-filtering
changes nothing — the DuckDB oracles of every lane that adopted this
are byte-identical (CORRECTNESS gate). Rows pass through as Arrow
``Table.take`` selections, never a pandas round-trip: pandas folds
NaN and NULL together, which would corrupt a NaN score into a NULL
(observed: the NaN-greatest row silently dropped from desc top-k).
The ``double`` comparator reproduces Spark SQL's double ordering: NaN
greatest (first under DESC, last under ASC), -0.0 == 0.0, ties
ascending; NULL order values take Spark's NULL placement (first under
ASC, last under DESC) via an explicit Arrow null mask taken BEFORE
``to_numpy`` folds null into NaN — so a nullable score column (e.g.
pq_topk's adc_dist for NULL/short query vectors) combines exactly as
the downstream window would rank it. The ``plain`` comparator handles
NULLs exactly like Spark's
defaults: first under ASC, last under DESC, for the order, tie, and
key columns alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: compact the per-partition buffer whenever it exceeds this many
#: rows: bounds combiner memory at O(compact_at + batch) per task
#: regardless of how many candidate rows stream through it
COMPACT_AT = 131_072


def _plain_codes(col):
    """NULL-safe ascending rank codes for one Arrow column: non-null
    values factorize by sorted uniques (Python ``sorted`` equals
    Spark's ordering for the string/int values used here — binary
    UTF-8 for ASCII strings, numeric for ints); NULL gets code -1, so
    it sorts FIRST ascending (Spark asc default) and — after the
    descending negation — LAST descending (Spark desc default)."""
    import numpy as np

    vals = col.to_pylist()
    rank = {v: i for i, v in enumerate(sorted({x for x in vals if x is not None}))}
    return np.asarray(
        [rank[v] if v is not None else -1 for v in vals], dtype=np.int64
    )


def _keep_topk(table, key: str, order_col: str, descending: bool,
               tie_col: str, k: int, plain: bool = False):
    """The k best rows per key within one Arrow table, under Spark's
    double total order (NaN greatest, -0.0 == 0.0, ties by
    ``tie_col`` ascending) — or, with ``plain``, the natural total
    order of a non-float orderable column with Spark's NULL placement
    (see :func:`_plain_codes`). Returns a row-selection ``take`` of
    the input — every column, NaN included, passes through
    bit-exact."""
    import numpy as np
    import pyarrow as pa

    n = table.num_rows
    kcode = _plain_codes(table[key])  # NULL key = its own group
    if plain:
        tie = _plain_codes(table[tie_col])
        vkey = _plain_codes(table[order_col])
        if descending:
            vkey = -vkey
        nanflag = np.zeros(n, dtype=np.int8)
    else:
        tie = table[tie_col].to_numpy(zero_copy_only=False)
        ocol = table[order_col]
        # Arrow numeric NULL becomes NaN through to_numpy — mask it
        # FIRST so NULL keeps Spark's NULL placement (first asc / last
        # desc) instead of silently ranking as Spark-NaN (greatest).
        if ocol.null_count:
            nullmask = ocol.is_null().to_numpy(zero_copy_only=False)
        else:
            nullmask = np.zeros(n, dtype=bool)
        v = ocol.to_numpy(zero_copy_only=False).astype(np.float64)
        nan = np.isnan(v) & ~nullmask
        vkey = np.where(nan | nullmask, 0.0, v) + 0.0  # -0.0 -> 0.0
        # primary flag: asc NULL < values < NaN; desc NaN < values < NULL
        nanflag = np.zeros(n, dtype=np.int8)
        if descending:
            vkey = -vkey
            nanflag[nan] = -1       # NaN greatest -> first under DESC
            nanflag[nullmask] = 1   # NULL -> last under DESC
        else:
            nanflag[nan] = 1        # NaN greatest -> last under ASC
            nanflag[nullmask] = -1  # NULL -> first under ASC
    # global rank of each row under the order (lexsort: last key primary)
    order_rank = np.empty(n, dtype=np.int64)
    order_rank[np.lexsort((tie, vkey, nanflag))] = np.arange(n)
    # group rows by key, best-first inside each group
    idx2 = np.lexsort((order_rank, kcode))
    ks = kcode[idx2]
    starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    sizes = np.diff(np.r_[starts, n])
    occurrence = np.arange(n) - np.repeat(starts, sizes)
    sel = np.sort(idx2[occurrence < k])  # keep original row order
    return table.take(pa.array(sel))


def partial_topk_per_key(
    df: DataFrame,
    *,
    key: str = "query_id",
    order_col: str,
    descending: bool,
    tie_col: str = "neighbor_id",
    k: int,
    compact_at: int = COMPACT_AT,
    plain: bool = False,
) -> DataFrame:
    """Per-partition, per-key exact top-k pre-filter (see module doc).

    Returns a frame with the SAME schema and the same global-top-k
    content: feed it to the unchanged ranking window. ``k`` must be
    at least the largest rank the caller will keep (e.g. the
    ``rerank * k`` shortlist size, not the final k). ``plain`` ranks
    a non-float order column by its natural ascending order instead
    of the Spark double order."""
    schema = df.schema

    def _fn(batches):
        import pyarrow as pa

        buf = None
        for b in batches:
            t = pa.Table.from_batches([b])
            buf = t if buf is None else pa.concat_tables([buf, t])
            if buf.num_rows > compact_at:
                buf = _keep_topk(
                    buf, key, order_col, descending, tie_col, k, plain
                )
        if buf is not None and buf.num_rows:
            yield from _keep_topk(
                buf, key, order_col, descending, tie_col, k, plain
            ).to_batches()

    return df.mapInArrow(_fn, schema)


def ensure_partial_limit(
    df: DataFrame,
    *,
    key: str = "query_id",
    order_col: str,
    descending: bool,
    tie_col: str = "neighbor_id",
    k: int,
    plain: bool = False,
) -> DataFrame:
    """Guarantee a map-side phase for a downstream per-``key`` ranking
    window filtered at ``rank <= k``: a NO-OP while k is within
    ``spark.sql.optimizer.windowGroupLimitThreshold`` (the optimizer's
    own Partial WindowGroupLimit is JVM-side and cheaper), the Arrow
    combiner above it — where InferWindowGroupLimit silently declines
    and every candidate row would funnel through one reducer per key."""
    thr = int(
        df.sparkSession.conf.get(
            "spark.sql.optimizer.windowGroupLimitThreshold", "1000"
        )
    )
    if k <= thr:
        return df
    return partial_topk_per_key(
        df,
        key=key,
        order_col=order_col,
        descending=descending,
        tie_col=tie_col,
        k=k,
        plain=plain,
    )


def ranked_topn(df: DataFrame, order_cols, n: int, *,
                rank_name: str = "rn", rank_type: str = "int") -> DataFrame:
    """GLOBAL top-n with a rank column, without the global-window
    cliff: ``orderBy(cols).limit(n)`` plans TakeOrderedAndProject
    (per-partition top-n + driver merge — global ranking windows infer
    NO group limit at all), and ``row_number`` then ranks only the n
    survivors. One order list drives both steps, so the limited set
    and the ranks cannot drift apart."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    top = df.orderBy(*order_cols).limit(n)
    w = Window.orderBy(*order_cols)
    return top.withColumn(
        rank_name, F.row_number().over(w).cast(rank_type)
    )
