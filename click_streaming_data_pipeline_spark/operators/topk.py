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

EXACTNESS: the global top-k under a total order is a subset of every
partition's per-key top-k under the same order, so pre-filtering
changes nothing — the DuckDB oracles of every lane that adopted this
are byte-identical (CORRECTNESS gate). Rows pass through as Arrow
``Table.take`` selections, never a pandas round-trip: pandas folds
NaN and NULL together, which would corrupt a NaN score into a NULL
(observed: the NaN-greatest row silently dropped from desc top-k).
The comparator reproduces Spark SQL's double ordering: NaN greatest
(first under DESC, last under ASC), -0.0 == 0.0, ties resolved by an
integer column ascending. Order values must be NON-NULL (Spark sorts
NULL smallest under ASC / last under DESC, which this comparator does
not model; every call site's score is non-null by construction —
``cosine`` coalesces to 0.0, ADC folds over non-null code lookups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: compact the per-partition buffer whenever it exceeds this many
#: rows: bounds combiner memory at O(compact_at + batch) per task
#: regardless of how many candidate rows stream through it
COMPACT_AT = 131_072


def _keep_topk(table, key: str, order_col: str, descending: bool,
               tie_col: str, k: int, plain: bool = False):
    """The k best rows per key within one Arrow table, under Spark's
    double total order (NaN greatest, -0.0 == 0.0, ties by
    ``tie_col`` ascending) — or, with ``plain``, the natural total
    order of a non-float orderable column (strings compare as Python
    str, which equals Spark's binary UTF-8 ordering for the ASCII
    hex/id values used at the call sites). Returns a row-selection
    ``take`` of the input — every column, NaN included, passes
    through bit-exact."""
    import numpy as np
    import pyarrow as pa

    n = table.num_rows
    _, kcode = np.unique(
        table[key].to_numpy(zero_copy_only=False), return_inverse=True
    )
    tie = table[tie_col].to_numpy(zero_copy_only=False)
    if plain:
        # rank via ascending-sorted unique codes; descending negates
        _, vkey = np.unique(
            table[order_col].to_numpy(zero_copy_only=False),
            return_inverse=True,
        )
        if descending:
            vkey = -vkey
        nanflag = np.zeros(n, dtype=bool)
    else:
        v = table[order_col].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        nan = np.isnan(v)
        vkey = np.where(nan, 0.0, v) + 0.0  # -0.0 -> 0.0, like Spark
        if descending:
            vkey = -vkey
            nanflag = ~nan  # NaN greatest -> first under DESC
        else:
            nanflag = nan  # NaN greatest -> last under ASC
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
