"""Similarity search over embedding columns (beyond-reference
extension): brute-force cosine top-k as the exact baseline, plus a
sign-random-projection LSH bucketed variant as the scale path.

Cosine is computed with explicit sequential folds (``zip_with`` +
``aggregate``) over double-cast arrays so the result is a
deterministic left-to-right IEEE sum — reproducible across engines
(the DuckDB oracle uses ``list_reduce`` with the same order).

Scale: brute force is O(Q x N) dot products — fine when Q is small
and N is scanned anyway (it vectorizes well); for N in the billions,
the LSH variant buckets vectors by hyperplane sign-bits so each query
probes ~N/2^bits candidates. An IVF variant would replace the
hyperplanes with k-means centroids; same join shape.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import scan_parallel


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _fold_cosine_rows(a_rows, b_rows):
    """numpy twin of ``cosine()`` for a batch of row pairs: the SAME
    per-row operation sequence as the expression fold — one multiply
    and one add per dimension, accumulated left-to-right — just
    vectorized ACROSS rows, so every output double is bit-identical
    to the zip_with/aggregate form (elementwise numpy float64 ops are
    the same exactly-rounded IEEE ops codegen emits)."""
    import numpy as np

    n, d = a_rows.shape
    dot = np.zeros(n)
    na = np.zeros(n)
    nb = np.zeros(n)
    for i in range(d):
        ai = a_rows[:, i]
        bi = b_rows[:, i]
        dot = dot + ai * bi
        na = na + ai * ai
        nb = nb + bi * bi
    den = np.sqrt(na) * np.sqrt(nb)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = dot / den
    return np.where(den == 0.0, 0.0, out)


def _cosine_kernel_fn(a, b):
    """Batch entry for the Arrow cosine kernel (pd.Series in/out).

    Mirrors the expression's null/ragged semantics exactly: a NULL
    array or a per-row length mismatch poisons the fold to NULL, which
    ``cosine()``'s coalesce turns into 0.0. Any row whose two arrays
    DO match in length gets the true cosine — even when different rows
    in the batch carry different dimensions (a heterogeneous-dim batch
    is computed per dimension-group, never silently zeroed)."""
    import numpy as np
    import pandas as pd

    av = list(a)
    bv = list(b)
    n = len(av)
    out = np.zeros(n, dtype=np.float64)
    by_dim: dict[int, list[int]] = {}
    for j, (x, y) in enumerate(zip(av, bv)):
        if x is not None and y is not None and len(x) == len(y):
            by_dim.setdefault(len(x), []).append(j)
    for d, idx in by_dim.items():
        if d == 0:  # zero-length arrays: dot=0, den=0 -> 0.0
            continue
        rows_a = np.vstack([np.asarray(av[j], np.float64) for j in idx])
        rows_b = np.vstack([np.asarray(bv[j], np.float64) for j in idx])
        out[idx] = _fold_cosine_rows(rows_a, rows_b)
    return pd.Series(out)


def cosine_arrow(a: Column, b: Column) -> Column:
    """Arrow-vectorized twin of :func:`cosine` — bit-identical doubles
    (same fold order, same zero-norm -> 0.0 rule; parity pinned by
    ``tests/test_search.py::test_cosine_arrow_matches_expression`` and
    every swapped lane's value-hash oracle).

    Why it exists: the expression fold is interpreted per array
    element (higher-order functions never enter codegen), measured
    ~0.2us/element — candidate-verify lanes burn tens of CPU-seconds
    on thousands of vectors. The kernel runs the same IEEE op sequence
    over whole Arrow batches (~ms). Use it on hot per-pair paths; the
    expression form remains the reference semantics and the oracle
    documentation.

    asNondeterministic: threshold filters over the result
    (``filter(cos >= t)``) otherwise push below the projection and
    the optimizer DUPLICATES the kernel — the verify stage of the
    neardup/LSH/hard-negative lanes computed every pair cosine TWICE
    (guide §4.4; r8 catalog plan sweep). The kernel is deterministic;
    the marker only pins one evaluation, and no unrelated predicate
    needs to cross this projection in any call site."""
    from pyspark.sql.pandas.functions import pandas_udf

    return pandas_udf(_cosine_kernel_fn, "double").asNondeterministic()(
        a, b
    )


def cosine(a: Column, b: Column) -> Column:
    """dot / (|a| * |b|) over double-cast arrays.

    A zero-norm operand (an all-zero embedding — a certainty
    somewhere in a 100 TB corpus) makes the denominator 0, which
    under Spark's default ANSI mode is a hard DIVIDE_BY_ZERO job
    failure, not a NaN. Defined here as similarity 0.0 ("no
    direction, no similarity"): thresholds exclude it, top-k ranks
    it below every positive match, and — unlike NULL/NaN — it has no
    cross-engine ordering semantics to diverge on (the DuckDB twin
    is ``coalesce(dot / nullif(den, 0), 0.0)``)."""
    da, db = _as_double(a), _as_double(b)
    den = norm(da) * norm(db)
    return F.coalesce(
        dot(da, db) / F.nullif(den, F.lit(0.0)), F.lit(0.0)
    )


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query id.

    The query side is tiny -> broadcast; the corpus side streams
    through one scan computing Q cosines per row; per-query top-k via
    window row_number (ties broken by neighbor id for determinism).
    """
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    cand = scan_parallel(emb).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )
    scored = (
        cand.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_arrow(F.col("q_vec"), F.col("n_vec")))
        .select("query_id", "neighbor_id", "cos")
    )
    # the rank<=k filter below infers a PARTIAL WindowGroupLimit
    # (map-side per-query top-k before the exchange; pinned in
    # tests/test_physical_design.py) — but only up to the optimizer's
    # windowGroupLimitThreshold, so the guard adds the Arrow combiner
    # for larger caller-chosen k
    from ..operators.topk import ensure_partial_limit

    scored = ensure_partial_limit(
        scored, order_col="cos", descending=True, k=k
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def neardup_pairs(
    emb: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup dedup).

    Scale: this all-pairs form is O(N^2) — use lsh_bucketed_pairs for
    the candidate-generation step at scale and keep this as the
    verifier on candidates.
    """
    a = scan_parallel(emb).select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_arrow(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# ---------------------------------------------------------------------------
# LSH (sign random projection, multi-table)

N_PLANES = 4  # bits per table
N_TABLES = 8  # OR over tables: recall = 1-(1-p^planes)^tables


def _plane(table: int, i: int, dim: int) -> list[float]:
    """Deterministic hyperplane with md5-derived components — no RNG
    at plan time, yet statistically independent across (table, plane)
    (a simple affine congruence is NOT: its planes are shifted copies
    of one periodic sequence and collapse recall)."""
    import hashlib

    out = []
    for j in range(dim):
        h = hashlib.md5(f"{table}:{i}:{j}".encode()).hexdigest()[:4]
        out.append((int(h, 16) - 32767.5) / 32768.0)
    return out


def lsh_bucket(
    vec_col: Column, dim: int, table: int, n_planes: int = N_PLANES
) -> Column:
    """Bucket id for one table = sign-bit string over its planes."""
    v = _as_double(vec_col)
    bits = []
    for i in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _plane(table, i, dim)])
        bits.append(F.when(dot(v, plane) >= 0, F.lit("1")).otherwise("0"))
    return F.concat(*bits)


def lsh_buckets_arrow(dim: int, n_planes: int, n_tables: int):
    """Arrow kernel computing ALL tables' bucket ids per vector in one
    batch pass (array<string>, index = table). Bit-exact twin of
    ``lsh_bucket``: the same sequential-fold dot per plane, and the
    sign test mirrors Spark's NaN-as-greatest comparison (NaN >= 0 is
    TRUE in Spark SQL, false in IEEE — reproduced via isnan OR).
    The expression form evaluates n_tables x n_planes x dim elements
    interpreted per row (6k evals/row at the 32-table setting); the
    kernel replaces that with numpy column ops."""
    planes = [
        [_plane(t, i, dim) for i in range(n_planes)] for t in range(n_tables)
    ]

    def _kernel(v):
        import numpy as np
        import pandas as pd

        # NULL/ragged rows: the expression path folds them to a NULL
        # dot, and when(NULL >= 0).otherwise("0") stamps every bit
        # "0" — reproduce that (zeros substitution alone would flip
        # the sign test to "1": 0 >= 0).
        vv = list(v)
        ok = np.array(
            [x is not None and len(x) == dim for x in vv], dtype=bool
        )
        V = np.vstack(
            [
                np.asarray(x, np.float64) if k else np.zeros(dim)
                for x, k in zip(vv, ok)
            ]
        )
        n, d = V.shape
        # bits[t][i] = boolean column for plane i of table t
        out_bits = []
        for t in range(n_tables):
            tbits = []
            for i in range(n_planes):
                p = planes[t][i]
                acc = np.zeros(n)
                for j in range(d):
                    acc = acc + V[:, j] * p[j]
                tbits.append((acc >= 0.0) | np.isnan(acc))
            out_bits.append(tbits)
        zero_row = ["0" * n_planes] * n_tables
        rows = []
        for r in range(n):
            if not ok[r]:
                rows.append(list(zero_row))
                continue
            rows.append(
                [
                    "".join("1" if out_bits[t][i][r] else "0"
                            for i in range(n_planes))
                    for t in range(n_tables)
                ]
            )
        return pd.Series(rows)

    from pyspark.sql.pandas.functions import pandas_udf

    # asNondeterministic: Generate-derived null filters on the bucket
    # array otherwise duplicate the kernel below the explode (guide
    # §4.4; r8 catalog plan sweep) — deterministic output, marker
    # pins one evaluation
    return pandas_udf(_kernel, "array<string>").asNondeterministic()


#: target expected bucket occupancy for auto-sized SRP-LSH carving
LSH_TARGET_BUCKET = 256


def lsh_planes_for(n: int, target_bucket: int = LSH_TARGET_BUCKET) -> int:
    """Planes needed so a table's EXPECTED bucket occupancy stays at
    ``target_bucket`` for an ``n``-vector corpus: ceil(log2(n/target)),
    floored at the default ``N_PLANES``.

    Why this must grow with N: a table with p planes has only 2^p
    buckets, so candidate work per table is sum(c_b^2) ~ n^2 / 2^p —
    QUADRATIC in n whenever p is fixed (measured: the fixed 4-plane
    config that is exact at sf0.1 ground unboundedly at the 64x scale
    probe — 409k vectors / 16 buckets ~ 25k per bucket ~ 4e10
    candidate pairs). With p = log2(n/target), occupancy is constant
    and candidates grow ~n * target — linear.

    The recall trade: more planes lowers per-table collision
    probability for true pairs (P = p_angle^planes), so a deployment
    raising planes should raise ``n_tables`` to hold recall
    (t ~ ln(1/(1-R)) / p_angle^planes) or adopt multi-probe. The
    oracle-gated catalog lane keeps the FIXED (4, 8) config — its
    static SQL twin replays those exact hyperplanes — and this helper
    is the documented sizing rule for scale deployments.

    The law assumes roughly ISOTROPIC vectors: an angularly clustered
    corpus concentrates occupancy no matter how many planes carve it
    (measured: lattice-structured vectors held near-quadratic
    candidate growth under auto-sizing while seeded gaussians came in
    near-linear). AQE skew-splitting bounds the per-task damage of a
    hot bucket; the candidate VOLUME on such data is an input
    property, not a knob."""
    if n <= target_bucket:
        return N_PLANES
    return max(N_PLANES, math.ceil(math.log2(n / target_bucket)))


#: hard cap on auto-sized table count: beyond this the bucket pass
#: dominates wall and a deployment should adopt multi-probe instead.
LSH_MAX_TABLES = 64


def lsh_tables_for(n_planes: int, *, threshold: float = 0.8) -> int:
    """Tables needed so auto-RAISED planes keep the DEFAULT config's
    recall for a true pair at ``threshold`` cosine (r5 ADVICE low:
    auto-sizing planes while holding tables fixed silently decays
    per-table collision probability p_angle^planes and with it
    recall).

    The rule holds the (N_PLANES, N_TABLES) recall invariant rather
    than chasing an absolute target: with p = 1 - acos(threshold)/pi
    the default config recalls 1-(1-p^N_PLANES)^N_TABLES; solving
    1-(1-p^n_planes)^t >= that gives
    t = N_TABLES * ln(1-p^N_PLANES) / ln(1-p^n_planes)
    (~ N_TABLES * p^(N_PLANES-n_planes) for small p^planes). Capped
    at ``LSH_MAX_TABLES`` — past that, multi-probe is the right tool.
    Degenerate thresholds (p -> 0 or 1, nothing to hold) and
    non-raised plane counts return ``N_TABLES`` unchanged, so the
    fixed catalog config is bit-stable."""
    if n_planes <= N_PLANES:
        return N_TABLES
    p = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    base = p**N_PLANES
    cur = p**n_planes
    if cur <= 0.0 or base >= 1.0:
        return N_TABLES
    t = math.ceil(N_TABLES * math.log1p(-base) / math.log1p(-cur))
    return max(N_TABLES, min(LSH_MAX_TABLES, t))


def _lsh_candidates(
    emb: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int,
    n_tables: int,
) -> DataFrame:
    """Deduplicated (id_a < id_b) bucket-collision candidates across
    all tables — the ids-only stage of ``lsh_bucketed_pairs``, split
    out so scale tests can count candidates without the verify."""
    tabled = (
        scan_parallel(emb)
        .select(
            F.col(id_col),
            lsh_buckets_arrow(dim, n_planes, n_tables)(
                F.col(vec_col)
            ).alias("__buckets"),
        )
        .select(
            id_col, F.posexplode("__buckets").alias("tbl", "bucket")
        )
    )
    a = tabled.select("tbl", "bucket", F.col(id_col).alias("id_a"))
    b = tabled.select("tbl", "bucket", F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_bucketed_pairs(
    emb: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int | None = N_PLANES,
    n_tables: int | None = None,
    target_bucket: int = LSH_TARGET_BUCKET,
) -> DataFrame:
    """Approximate similar-pairs: vectors are compared only when they
    share a bucket in at least one of ``n_tables`` independent tables
    (OR of ANDs — the standard recall knob for SRP-LSH). Candidate
    generation is a per-table equi-join on the bucket key; the
    all-pairs O(N^2) join never happens.

    Scale: each table's join shuffles on a short bucket string; hot
    buckets (skew) split via AQE. The candidate join carries IDS ONLY
    (two longs per row) — carrying the vectors through the exploded
    per-table join would multiply shuffle width by 2 x dim x n_tables;
    instead the (much smaller) deduplicated candidate set re-joins the
    embedding table twice to fetch vectors for the cosine verify.

    The plane count is the REAL scale knob: candidates per table are
    sum(c_b^2) ~ N^2/2^planes, quadratic whenever planes are fixed —
    see :func:`lsh_planes_for`. Pass ``n_planes=None`` to auto-size
    from a corpus count (one cheap count job; ``target_bucket`` tunes
    the occupancy the carve aims for). ``n_tables=None`` (the
    default) resolves through :func:`lsh_tables_for`, which holds the
    default config's recall when planes are auto-RAISED — at the
    default plane count it returns ``N_TABLES`` unchanged, so fixed
    callers (including the oracle-gated catalog lane, whose SQL twin
    replays the fixed config) are bit-stable."""
    if n_planes is None:
        n_planes = lsh_planes_for(emb.count(), target_bucket)
    if n_tables is None:
        n_tables = lsh_tables_for(n_planes, threshold=threshold)
    cand = _lsh_candidates(
        emb,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        n_planes=n_planes,
        n_tables=n_tables,
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", cosine_arrow(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization (vector compression for 100 TB embedding stores)

#: symmetric int8 code range: q in [-QMAX, QMAX], 255 levels.
QMAX = 127
_LEVELS = 2 * QMAX  # 254 quantization steps across each dim's range


def _quantize_embeddings_expr(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Expression-form int8 scalar quantization — the REFERENCE
    semantics for :func:`quantize_embeddings` (which swaps the hot
    per-element transforms for an Arrow kernel; parity pinned by
    ``test_quantize_kernel_matches_expression`` and the adversarial
    vector suite).

    Two-pass plan, both cheap: (1) one corpus scan reduces to a single
    row of per-dim mins/maxs (partial agg, no shuffle of the data);
    (2) the stats row broadcasts back (crossJoin of a 1-row frame) and
    a second scan codes every vector.

    Exactness: q_i = floor((x_i-mn_i)/(mx_i-mn_i)*254 + 0.5) - 127
    uses only exactly-rounded IEEE ops + floor, so codes are
    bit-portable across engines (F.round's HALF_UP would not be); the
    reconstruction error folds left-to-right like ``cosine``.
    Output keeps the driver-hashable scalar forms: integer sum, code
    extrema, an md5 digest of the code array, and mean |error|.

    Ragged rows (len != dim) are nulled at the scan — under ANSI mode
    ``element_at`` past the end is a hard job failure, and a 100 TB
    corpus will contain a malformed vector somewhere; NULL outputs
    (same as a NULL vector) are the graceful contract.
    """
    v = _as_double(F.col(vec_col))
    base = scan_parallel(emb).select(
        F.col(id_col),
        F.when(F.size(v) == F.lit(dim), v).alias("v"),
    )
    stats = base.agg(
        F.array(
            *[F.min(F.element_at("v", i + 1)) for i in range(dim)]
        ).alias("mins"),
        F.array(
            *[F.max(F.element_at("v", i + 1)) for i in range(dim)]
        ).alias("maxs"),
    )

    def _mn(i: Column) -> Column:
        return F.element_at(F.col("mins"), (i + 1).cast("int"))

    def _mx(i: Column) -> Column:
        return F.element_at(F.col("maxs"), (i + 1).cast("int"))

    def _code(x: Column, i: Column) -> Column:
        scaled = (x - _mn(i)) / (_mx(i) - _mn(i)) * F.lit(float(_LEVELS)) + F.lit(
            0.5
        )
        return F.when(_mx(i) == _mn(i), F.lit(0).cast("long")).otherwise(
            F.floor(scaled) - QMAX
        )

    def _err(x: Column, i: Column) -> Column:
        q = F.element_at(F.col("q"), (i + 1).cast("int"))
        dq = _mn(i) + (q + QMAX).cast("double") / F.lit(float(_LEVELS)) * (
            _mx(i) - _mn(i)
        )
        return F.abs(dq - x)

    coded = base.crossJoin(F.broadcast(stats)).withColumn(
        "q", F.transform(F.col("v"), _code)
    )
    err = F.transform(F.col("v"), _err)
    return coded.select(
        id_col,
        F.aggregate(
            "q", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("q_sum"),
        F.array_min("q").alias("q_lo"),
        F.array_max("q").alias("q_hi"),
        F.md5(
            F.array_join(F.transform("q", lambda x: x.cast("string")), ",")
        ).alias("q_digest"),
        (
            F.aggregate(err, F.lit(0.0), lambda a, x: a + x)
            / F.lit(float(dim))
        ).alias("recon_mae"),
    )


def _quantize_kernel(mins: list[float], maxs: list[float], dim: int):
    """Arrow kernel twin of ``_quantize_embeddings_expr``'s code/err
    transforms: the SAME IEEE op sequence per dimension
    ((x-mn)/(mx-mn)*254.0 + 0.5 -> floor -> -127; reconstruction
    mn + (q+127)/254.0*(mx-mn), |err| folded left-to-right), just
    vectorized across the batch — codes and digests are bit-identical
    (gated by the oracle value hash and the adversarial vector suite).

    Why: the expression's F.transform/F.aggregate lambdas are
    interpreted per array element (HOFs never enter codegen) —
    measured 10.3 CPU-s for 4k rows x 64 dims (PERF_AUDIT r4), the
    last interpreted-HOF hot path in the repo.

    Null/ragged/NaN-element rows emit NULL for every output (the
    expression path also NULL-poisons whole-array NULLs; per-element
    nulls — absent from every corpus — differ: the expression emits
    partial extrema, the kernel full NULL, documented deviation)."""
    import hashlib

    import numpy as np

    mn = np.asarray(mins, np.float64)
    mx = np.asarray(maxs, np.float64)

    def _kernel(v):
        import pandas as pd

        vv = list(v)
        n = len(vv)
        if n == 0:
            return pd.DataFrame(
                {
                    "q_sum": pd.array([], dtype="Int64"),
                    "q_lo": pd.array([], dtype="Int64"),
                    "q_hi": pd.array([], dtype="Int64"),
                    "q_digest": pd.Series([], dtype="object"),
                    "recon_mae": pd.array([], dtype="Float64"),
                }
            )
        ok = np.empty(n, dtype=bool)
        rows = []
        for j, x in enumerate(vv):
            good = x is not None and len(x) == dim
            if good:
                r = np.asarray(x, np.float64)
                good = not np.isnan(r).any()
            ok[j] = good
            rows.append(r if good else np.zeros(dim))
        V = np.vstack(rows)
        Q = np.empty((n, dim), np.int64)
        for i in range(dim):
            if mx[i] == mn[i]:
                Q[:, i] = 0
            else:
                scaled = (V[:, i] - mn[i]) / (mx[i] - mn[i]) * 254.0 + 0.5
                Q[:, i] = np.floor(scaled).astype(np.int64) - QMAX
        acc = np.zeros(n)
        for i in range(dim):
            qd = (Q[:, i] + QMAX).astype(np.float64)
            dq = mn[i] + qd / 254.0 * (mx[i] - mn[i])
            acc = acc + np.abs(dq - V[:, i])
        mae = acc / float(dim)
        digests = [
            hashlib.md5(
                ",".join(str(int(q)) for q in Q[r]).encode()
            ).hexdigest()
            if ok[r]
            else None
            for r in range(n)
        ]
        mask = ~ok
        q_sum = pd.array(Q.sum(axis=1), dtype="Int64")
        q_lo = pd.array(Q.min(axis=1), dtype="Int64")
        q_hi = pd.array(Q.max(axis=1), dtype="Int64")
        recon = pd.array(mae, dtype="Float64")
        q_sum[mask] = pd.NA
        q_lo[mask] = pd.NA
        q_hi[mask] = pd.NA
        recon[mask] = pd.NA
        return pd.DataFrame(
            {
                "q_sum": q_sum,
                "q_lo": q_lo,
                "q_hi": q_hi,
                "q_digest": digests,
                "recon_mae": recon,
            }
        )

    from pyspark.sql.pandas.functions import pandas_udf

    return pandas_udf(
        _kernel,
        "q_sum bigint, q_lo bigint, q_hi bigint, "
        "q_digest string, recon_mae double",
    )


def _minmax_stats(vdf: DataFrame, dim: int):
    """(mins, maxs) per dimension of a single-column frame of
    ``array<double>`` rows that are either NULL or exactly ``dim``
    long — the codebook job of :func:`quantize_embeddings`, computed
    as one per-partition numpy reduction instead of 2 x dim
    interpreted agg expressions.

    Exactness contract vs ``F.min/F.max(element_at(v, i))``: NULL rows
    are skipped (like the aggs); min/max over finite doubles is
    order-free and rounding-free, so the numpy fold is bit-identical
    (the -0.0/0.0 pick may differ, but every consumer — ``x - mn``,
    ``mx == mn`` — is insensitive to the zero's sign). Rows carrying
    NULL or NaN ELEMENTS make the partition report NaN bounds, which
    sends the caller down the expression fallback — exactly where
    Spark's NaN-greatest max (NaN anywhere => max NaN => non-finite
    stats) already routes those corpora.
    """

    def _fn(batches):
        import numpy as np
        import pyarrow as pa

        mn = None
        mx = None
        bad = False
        for b in batches:
            col = b.column(0)
            if col.null_count == len(col):
                continue
            col = col.drop_null()
            flat = col.flatten()
            if flat.null_count:
                bad = True
                break
            arr = flat.to_numpy(zero_copy_only=False).reshape(-1, dim)
            bmn = arr.min(axis=0)
            bmx = arr.max(axis=0)
            if mn is None:
                mn, mx = bmn, bmx
            else:
                # np.minimum/maximum propagate NaN, which only feeds
                # the caller's non-finite fallback check
                mn = np.minimum(mn, bmn)
                mx = np.maximum(mx, bmx)
        if bad:
            mn = mx = [float("nan")] * dim
        if mn is None:
            return
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([list(map(float, mn))],
                         type=pa.list_(pa.float64())),
                pa.array([list(map(float, mx))],
                         type=pa.list_(pa.float64())),
            ],
            names=["mins", "maxs"],
        )

    import numpy as np

    rows = vdf.mapInArrow(
        _fn, "mins array<double>, maxs array<double>"
    ).collect()
    if not rows:
        return None, None
    mins = np.asarray(rows[0]["mins"])
    maxs = np.asarray(rows[0]["maxs"])
    for r in rows[1:]:
        mins = np.minimum(mins, np.asarray(r["mins"]))
        maxs = np.maximum(maxs, np.asarray(r["maxs"]))
    return [float(x) for x in mins], [float(x) for x in maxs]


def quantize_embeddings(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-dimension min/max int8 scalar quantization — the standard
    4x (float32) / 8x (float64) compression for warehouse-scale vector
    storage; ANN pre-filters can score int8 codes and re-rank the
    shortlist with full-precision vectors.

    Two-pass plan: (1) one corpus scan reduces to a single row of
    per-dim mins/maxs (partial agg; collected — 2 x dim doubles, a
    codebook-sized reduction, same driver footprint as the k-means
    centroids); (2) a second scan codes every vector in one Arrow
    batch pass (``_quantize_kernel``). Semantics and exactness are
    defined by :func:`_quantize_embeddings_expr`; the kernel is
    bit-identical (parity pytest + adversarial suite + oracle hash).
    Degenerate stats fall back to the expression path, which
    NULL-poisons exactly: an all-NULL dimension makes min/max NULL,
    and a single NaN element makes max NaN (Spark orders NaN above
    every value) — feeding NaN bounds to the kernel would corrupt
    EVERY row's codes on that dimension, so non-finite stats are
    guarded like NULL ones. Ragged rows are nulled at the scan like
    the expression path."""
    v = _as_double(F.col(vec_col))
    base = scan_parallel(emb).select(
        F.col(id_col),
        F.when(F.size(v) == F.lit(dim), v).alias("v"),
    )
    # stats pass reads the RAW scan: min/max reduces to one row per
    # partition, so redistributing the corpus first would shuffle
    # every vector to save nothing (guide section 2.3 — aggregate
    # before you shuffle). The reduction itself is a vectorized Arrow
    # kernel, not 2 x dim per-element agg expressions: that many agg
    # functions exceed codegen limits and run INTERPRETED, which made
    # the single-task stats job the lane's local bottleneck (guide
    # section 4.2 — hand whole batches to numpy). Any irregularity the
    # numpy fold cannot replay exactly (NULL/NaN elements) routes to
    # the expression path below, same as non-finite stats always have.
    mins, maxs = _minmax_stats(
        emb.select(F.when(F.size(v) == F.lit(dim), v).alias("v")), dim
    )
    if (
        mins is None
        or maxs is None
        or any(
            x is None or not math.isfinite(x)
            for x in list(mins) + list(maxs)
        )
    ):
        return _quantize_embeddings_expr(
            emb, id_col=id_col, vec_col=vec_col, dim=dim
        )
    enc = _quantize_kernel(list(mins), list(maxs), dim)
    return base.select(
        id_col, enc(F.col("v")).alias("__q")
    ).select(
        id_col,
        "__q.q_sum",
        "__q.q_lo",
        "__q.q_hi",
        "__q.q_digest",
        "__q.recon_mae",
    )


def int8_prefilter_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    *,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Scalar-quantization ANN: int8-code PREFILTER + full-precision
    rerank — the deployment shape :func:`quantize_embeddings`'s
    docstring promises (4-8x smaller scan for the shortlist pass; the
    exact vectors touched only for shortlist x queries rows).

    Pipeline: (1) per-dim min/max codebook (one partial-agg pass,
    2 x dim doubles); (2) the corpus codes + DEQUANTIZES in one scan
    (symmetric SQ: both sides scored in code space, so at scale the
    scan reads int8 codes, not floats) and scores approx cosine
    against the broadcast dequantized queries; (3) per-query top-
    ``shortlist`` by (approx desc, id) — a partial WindowGroupLimit;
    (4) the shortlist joins back to the ORIGINAL vectors for exact
    cosine, ranked to top-k. Every arithmetic step is exactly-rounded
    IEEE in a pinned fold order (the quantize/dequant ops and the
    cosine fold are the same spellings the embedding_quantize /
    knn_topk oracles replay), so the DuckDB twin is bit-exact;
    recall-vs-brute-force is gated separately in pytest."""
    v = _as_double(F.col(vec_col))
    base = scan_parallel(emb).select(
        F.col(id_col),
        F.when(F.size(v) == F.lit(dim), v).alias("v"),
    )
    stats = base.agg(
        F.array(
            *[F.min(F.element_at("v", i + 1)) for i in range(dim)]
        ).alias("mins"),
        F.array(
            *[F.max(F.element_at("v", i + 1)) for i in range(dim)]
        ).alias("maxs"),
    )

    def _mn(i: Column) -> Column:
        return F.element_at(F.col("mins"), (i + 1).cast("int"))

    def _mx(i: Column) -> Column:
        return F.element_at(F.col("maxs"), (i + 1).cast("int"))

    def _code(x: Column, i: Column) -> Column:
        scaled = (x - _mn(i)) / (_mx(i) - _mn(i)) * F.lit(
            float(_LEVELS)
        ) + F.lit(0.5)
        return F.when(_mx(i) == _mn(i), F.lit(0).cast("long")).otherwise(
            F.floor(scaled) - QMAX
        )

    def _dq(q: Column, i: Column) -> Column:
        return _mn(i) + (q + QMAX).cast("double") / F.lit(
            float(_LEVELS)
        ) * (_mx(i) - _mn(i))

    coded = (
        base.crossJoin(F.broadcast(stats))
        .withColumn("q", F.transform(F.col("v"), _code))
        .withColumn("dv", F.transform(F.col("q"), _dq))
    )
    corpus = coded.select(
        F.col(id_col).alias("neighbor_id"), F.col("dv").alias("n_dv")
    )
    queries = coded.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("dv").alias("q_dv")
    )
    ascored = corpus.join(
        F.broadcast(queries), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine_arrow(F.col("q_dv"), F.col("n_dv")).alias("acos"),
    )
    sw = Window.partitionBy("query_id").orderBy(
        F.col("acos").desc(), F.col("neighbor_id").asc()
    )
    short = (
        ascored.withColumn("srank", F.row_number().over(sw))
        .filter(F.col("srank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    orig_q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("q_vec"),
    )
    orig_n = emb.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("n_vec"),
    )
    rer = (
        F.broadcast(short)
        .join(orig_n, "neighbor_id")
        .join(F.broadcast(orig_q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_arrow(F.col("q_vec"), F.col("n_vec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


#: own-centroid cosine below this marks an embedding-space outlier
#: (candidate mislabel / noise document in a curation pass).
OUTLIER_COS = 0.0


def label_centroid_distance(
    emb: DataFrame,
    *,
    dim: int = 64,
    outlier_cos: float = OUTLIER_COS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid + each vector's cosine to its own centroid —
    the embedding-space outlier/mislabel detector a curation pipeline
    runs before training (SemDeDup-adjacent: far-from-centroid docs
    are noise candidates).

    Exactness: the centroid is a SEQUENTIAL fold over vectors sorted
    by id (collect_list → sort_array → aggregate), so Spark and the
    DuckDB oracle produce bit-identical doubles. Scale: the fold
    collects each label's vectors into one task — the oracle-exact
    form for the gate; at warehouse scale swap the fold for per-dim
    partial-agg means (same output column, order-dependent last bits)
    and broadcast the #labels×dim centroid table, which is what the
    join below already does."""
    e = scan_parallel(emb).select(
        F.col(id_col),
        F.col(label_col),
        _as_double(F.col(vec_col)).alias("__v"),
    )
    zero = F.array(*[F.lit(0.0) for _ in range(dim)])
    folded = (
        e.groupBy(label_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("__v").alias("v")))
            ).alias("__vs"),
            F.count("*").alias("__n"),
        )
        .select(
            F.col(label_col).alias("__lbl"),
            F.transform(
                F.aggregate(
                    F.col("__vs"),
                    zero,
                    lambda acc, s: F.zip_with(acc, s["v"], lambda a, b: a + b),
                ),
                lambda x: x / F.col("__n"),
            ).alias("__cen"),
        )
    )
    return (
        e.join(F.broadcast(folded), e[label_col] == folded["__lbl"])
        .withColumn("cos_centroid", cosine_arrow(F.col("__v"), F.col("__cen")))
        .select(
            id_col,
            label_col,
            "cos_centroid",
            (F.col("cos_centroid") < F.lit(float(outlier_cos))).alias(
                "is_outlier"
            ),
        )
    )


#: SemDeDup: within-cluster cosine above this marks a semantic
#: duplicate; the smaller id survives (0.45 = the corpus's planted
#: near-dup band, same threshold as embedding_neardup).
SEMDEDUP_COS = 0.45

#: SemDeDup-specific K cap: the within-cluster pair work is N^2/K, so
#: K must keep growing with sqrt(N) well past IVF's probe-side
#: K_MAX=256 (that cap bounds the probe-ranking literal, which
#: SemDeDup never builds — it only ASSIGNS, and the Arrow-kernel /
#: broadcast-join assign paths both handle thousands of centroids).
#: Measured: at 64x sf0.1 (256k vectors) the 256-cap made cluster
#: populations grow linearly and the 64x wall ratio hit 10.5; sqrt(N)
#: K keeps expected pair work at N^1.5.
SEMDEDUP_K_CAP = 4096


def semdedup(
    emb: DataFrame,
    *,
    threshold: float = SEMDEDUP_COS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023 shape): k-means-cluster the
    embedding space, then compare pairs ONLY within each cluster and
    drop every vector that has a more-similar-than-threshold neighbor
    with a smaller id (deterministic keep-lowest rule).

    Scale: the quadratic pair step is confined to single clusters —
    sum(c_k^2) work instead of N^2, the paper's entire point — and
    size-routed by ``_semdedup_dup_of``: typical clusters run the
    one-task Arrow kernel, while a skewed mega-cluster (above
    ``SEMDEDUP_SPLIT_ROWS``) fans out as independent block-pair tile
    tasks instead of serializing one core. K sizes itself to sqrt(N)
    via the IVF trainer, so expected cluster size grows as sqrt(N),
    not N. Returns (vec_id, cluster_id, is_kept, dup_of) where dup_of
    is the smallest more-similar neighbor id for dropped rows (null
    when kept)."""
    from .ivf import _assign, train_kmeans

    info: dict = {}
    cents = train_kmeans(
        emb, id_col=id_col, vec_col=vec_col, k_cap=SEMDEDUP_K_CAP,
        _out=info,
    )
    e = scan_parallel(emb).select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    )
    # four consumers after size-routing (cluster sizes, both routing
    # branches, and the final keep join) — left lazy, each one re-runs
    # the assign kernel over the corpus; pin the assignment once
    # (N x (id, vec, cluster) rows, the same bounded materialization
    # the minhash pipeline uses for its shingle table)
    assigned = (
        _assign(e, cents, "__v")
        .select(
            F.col(id_col),
            F.col("__v"),
            F.col("centroid_id").alias("cluster_id"),
        )
        .localCheckpoint(eager=True)
    )
    dup_of = _semdedup_dup_of(
        assigned, float(threshold), id_col, n_hint=info.get("n")
    )
    return (
        assigned.join(dup_of, assigned[id_col] == dup_of.id_b, "left")
        .select(
            id_col,
            "cluster_id",
            F.col("dup_of").isNull().alias("is_kept"),
            "dup_of",
        )
    )


def _semdedup_dup_of_join(
    assigned: DataFrame, threshold: float, id_col: str = "vec_id"
) -> DataFrame:
    """REFERENCE form of the within-cluster pair step: a self-join on
    cluster id, one cosine per candidate pair, min smaller-id neighbor
    per duplicate. Semantically exact but ships BOTH full vectors per
    candidate pair — sum(c^2) * 2 * dim * 8 bytes of pair traffic,
    measured as the super-linear term at the 128x probe (94 s vs the
    kernel's one-vector-per-row transfer). Kept as the parity twin
    for ``_cluster_dup_of_fn`` and the shape AQE can skew-split if a
    deployment ever prefers it."""
    a = assigned.select(
        F.col("cluster_id"),
        F.col(id_col).alias("id_a"),
        F.col("__v").alias("__va"),
    )
    b = assigned.select(
        F.col("cluster_id"),
        F.col(id_col).alias("id_b"),
        F.col("__v").alias("__vb"),
    )
    dup_pairs = (
        a.join(b, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_arrow(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos") >= F.lit(float(threshold)))
        .select("id_b", "id_a")
    )
    return dup_pairs.groupBy("id_b").agg(F.min("id_a").alias("dup_of"))


#: pairwise-block edge for the in-kernel SemDeDup matrix: bounds the
#: kernel's working set at B^2 doubles (~33 MB) regardless of cluster
#: size, so a mega-cluster costs time, never memory.
SEMDEDUP_BLOCK = 2048

#: clusters above this row count leave the one-task applyInPandas
#: kernel for the tiled cogroup path — the kernel's caveat is one
#: cluster = one task, which serializes a skewed mega-cluster on a
#: single core (~m^2/2 dots; at 64k rows that is minutes of one-core
#: work while the rest of the stage idles).
SEMDEDUP_SPLIT_ROWS = 65536

#: rows per tile block in the tiled mega-cluster path: each (p, q)
#: block-pair is one cogroup task of ~TILE^2 dots (seconds of numpy),
#: and each vector is shuffled ceil(m/TILE) times — versus ONCE for
#: the one-task kernel and once PER CANDIDATE PAIR for the join form
#: (the measured super-linear term the kernel replaced).
SEMDEDUP_TILE_ROWS = 8192


def _tile_pair_frames(
    big: DataFrame, tile_rows: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """(left, right) block-pair sides for the tiled within-cluster
    pair step: rows hash into ceil(__csize/TILE) blocks ``__g``; the
    left side owns tiles (p=g, q in [g, nb)) and the right side tiles
    (p in [0, g], q=g), so every block PAIR (p <= q) meets in exactly
    one cogroup key. Input must carry (cluster_id, __id, __v,
    __csize). Split out so the multi-task pytest certifies THIS
    builder rather than a hand copy."""
    T = int(tile_rows or SEMDEDUP_TILE_ROWS)
    base = big.withColumn(
        "__nb",
        F.ceil(F.col("__csize") / F.lit(float(T))).cast("int"),
    ).withColumn(
        "__g",
        F.pmod(F.xxhash64(F.col("__id")), F.col("__nb")).cast("int"),
    )
    left = base.select(
        "cluster_id",
        F.col("__g").alias("p"),
        F.explode(
            F.sequence(F.col("__g"), F.col("__nb") - F.lit(1))
        ).alias("q"),
        "__id",
        "__v",
    )
    # same-name aliases mint fresh attribute ids, keeping the
    # cogroup's self-lineage unambiguous to the analyzer
    right = base.select(
        F.col("cluster_id").alias("cluster_id"),
        F.explode(
            F.sequence(F.lit(0), F.col("__g"))
        ).alias("p"),
        F.col("__g").alias("q"),
        F.col("__id").alias("__id"),
        F.col("__v").alias("__v"),
    )
    return left, right


def _semdedup_dup_of_tiled(
    big: DataFrame,
    threshold: float,
    *,
    tile_rows: int | None = None,
    block: int | None = None,
) -> DataFrame:
    """Multi-task within-cluster dup step for mega-clusters: rows are
    hashed into ceil(csize/TILE) blocks, every block-PAIR (p <= q)
    becomes one cogroup key, and ``_bipartite_pairs_fn`` — the same
    bit-exact blocked cosine kernel the streaming twin uses — emits
    that tile's qualifying pairs; a final groupBy(id_b).min(id_a)
    applies the keep-lowest rule. Input must carry
    (cluster_id, __id, __v, __csize).

    Exactness: a pair in blocks (gx, gy) is examined in exactly tile
    (min, max) — same-block pairs surface in both orientations inside
    the diagonal tile and collapse under the min — and the kernel's
    per-dimension fold is the one the one-task kernel and the oracle
    replay share, so routing NEVER changes the value hash.

    Scale: tile count grows as (m/TILE)^2 per mega-cluster — the
    m^2/2 dot work is unchanged but spread over independent tasks —
    while shuffle traffic is m * ceil(m/TILE) vectors, the classic
    triangle-tile trade (the per-pair join form would ship
    sum(c^2) * 2 * dim * 8 bytes; at m = 256k that is tens of TB,
    this path ~GBs)."""
    left, right = _tile_pair_frames(big, tile_rows)
    pairs = (
        left.groupBy("cluster_id", "p", "q")
        .cogroup(right.groupBy("cluster_id", "p", "q"))
        .applyInPandas(
            _bipartite_pairs_fn(float(threshold), block=block),
            "id_a long, id_b long, cos double",
        )
    )
    return pairs.groupBy("id_b").agg(F.min("id_a").alias("dup_of"))


def _semdedup_dup_of(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    *,
    split_rows: int | None = None,
    tile_rows: int | None = None,
    block: int | None = None,
    n_hint: int | None = None,
) -> DataFrame:
    """Size-routed within-cluster dup step: clusters at or under
    ``split_rows`` run the one-task ``_cluster_dup_of_fn`` kernel
    (each vector crosses the wire once — optimal when clusters fit a
    core); bigger clusters run the tiled cogroup path so a skewed
    mega-cluster executes as many independent tile tasks instead of
    serializing one executor thread. Both paths share the same fold
    arithmetic and keep-lowest rule, so routing is invisible in the
    output (pytest-pinned on a planted mega-cluster; the catalog
    oracle hash is unchanged because gate-scale clusters all route
    small)."""
    split = int(split_rows or SEMDEDUP_SPLIT_ROWS)
    # ``n_hint`` (total row count, e.g. read back from the trainer's
    # collect) bounds every cluster size from above: when the WHOLE
    # corpus fits under the split threshold no cluster can be skewed,
    # so the max-size probe job is skipped outright
    if n_hint is not None and n_hint <= split:
        return (
            assigned.select(
                "cluster_id", F.col(id_col).alias("__id"), "__v"
            )
            .groupBy("cluster_id")
            .applyInPandas(
                _cluster_dup_of_fn(float(threshold), block=block),
                "id_b long, dup_of long",
            )
        )
    sizes = assigned.groupBy("cluster_id").agg(
        F.count("*").alias("__csize")
    )
    # bounded driver pull (one long): when no cluster is skewed —
    # K ~ sqrt(N) sizing makes this the overwhelmingly common case —
    # skip the routing join and the (empty) tiled branch entirely and
    # run the exact single-path plan
    mx_row = sizes.agg(F.max("__csize")).collect()[0]
    if (mx_row[0] or 0) <= split:
        return (
            assigned.select(
                "cluster_id", F.col(id_col).alias("__id"), "__v"
            )
            .groupBy("cluster_id")
            .applyInPandas(
                _cluster_dup_of_fn(float(threshold), block=block),
                "id_b long, dup_of long",
            )
        )
    tagged = assigned.select(
        "cluster_id", F.col(id_col).alias("__id"), "__v"
    ).join(F.broadcast(sizes), "cluster_id")
    dup_small = (
        tagged.filter(F.col("__csize") <= split)
        .groupBy("cluster_id")
        .applyInPandas(
            _cluster_dup_of_fn(float(threshold), block=block),
            "id_b long, dup_of long",
        )
    )
    dup_big = _semdedup_dup_of_tiled(
        tagged.filter(F.col("__csize") > split),
        threshold,
        tile_rows=tile_rows,
        block=block,
    )
    return dup_small.unionByName(dup_big)


def _bipartite_pairs_fn(threshold: float, block: int | None = None):
    """Cogrouped-applyInPandas kernel: qualifying cosine pairs between
    ONE cluster's accumulated members (left) and its new micro-batch
    members (right) — the streaming SemDeDup twin of
    ``_cluster_dup_of_fn``. Emits normalized (id_a=min, id_b=max,
    cos) rows; a pair whose BOTH members are new appears in both
    orientations, so callers keep their dropDuplicates.

    Same scale shape as the batch kernel: each vector crosses the
    wire once per micro-batch (the cogroup shuffles rows, not
    candidate pairs), blocked matrices bound memory, and the per-dim
    fold order reproduces ``cosine()`` bit-for-bit — the drained
    stream must equal batch semdedup exactly, and the stored cos
    doubles participate in the pairs store's idempotent upsert.

    Mixed-dimension groups are computed per dimension-group, like
    ``_cosine_kernel_fn``: two same-length vectors get their true
    cosine regardless of the group's max dim, and cross-dim /
    NULL / zero-length pairs are cos 0.0 under the expression
    semantics — never >= a positive threshold, so they are skipped
    (the factory asserts threshold > 0, same as the batch kernel)."""
    B = int(block or SEMDEDUP_BLOCK)
    if not threshold > 0.0:
        raise ValueError(
            "_bipartite_pairs_fn requires threshold > 0.0: cross-dim "
            "and NULL pairs are cos 0.0 and the kernel prunes them"
        )

    def _fn(left, right):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {"id_a": [], "id_b": [], "cos": []}
        ).astype({"id_a": "int64", "id_b": "int64", "cos": "float64"})
        nl, nr = len(left), len(right)
        if nl == 0 or nr == 0:
            return empty
        lid = left["__id"].to_numpy()
        rid = right["__id"].to_numpy()
        lvecs = list(left["__v"])
        rvecs = list(right["__v"])

        def group_by_dim(col):
            by_dim: dict[int, list[int]] = {}
            for j, x in enumerate(col):
                if x is not None and len(x) > 0:
                    by_dim.setdefault(len(x), []).append(j)
            return by_dim

        lgroups = group_by_dim(lvecs)
        rgroups = group_by_dim(rvecs)

        out_a, out_b, out_c = [], [], []
        for d, lidx in lgroups.items():
            ridx = rgroups.get(d)
            if not ridx:
                continue
            L = np.vstack(
                [np.asarray(lvecs[j], np.float64) for j in lidx]
            )
            R = np.vstack(
                [np.asarray(rvecs[j], np.float64) for j in ridx]
            )
            glid = lid[lidx]
            grid = rid[ridx]
            ml, mr = len(lidx), len(ridx)

            def roots(V):
                nv = np.zeros(len(V))
                for i in range(d):
                    nv = nv + V[:, i] * V[:, i]
                return np.sqrt(nv)

            lroot, rroot = roots(L), roots(R)
            for p0 in range(0, ml, B):
                p1 = min(p0 + B, ml)
                A = L[p0:p1]
                for q0 in range(0, mr, B):
                    q1 = min(q0 + B, mr)
                    Bm = R[q0:q1]
                    dot = np.zeros((p1 - p0, q1 - q0))
                    for i in range(d):
                        dot = dot + A[:, i][:, None] * Bm[:, i][None, :]
                    den = lroot[p0:p1][:, None] * rroot[q0:q1][None, :]
                    with np.errstate(invalid="ignore", divide="ignore"):
                        cos = dot / den
                    cos = np.where(den == 0.0, 0.0, cos)
                    qual = (cos >= threshold) & (
                        glid[p0:p1][:, None] != grid[q0:q1][None, :]
                    )
                    if not qual.any():
                        continue
                    pi, qi = np.nonzero(qual)
                    xa = glid[p0:p1][pi]
                    xb = grid[q0:q1][qi]
                    out_a.append(np.minimum(xa, xb))
                    out_b.append(np.maximum(xa, xb))
                    out_c.append(cos[pi, qi])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos": np.concatenate(out_c),
            }
        )

    return _fn


def _cluster_dup_of_fn(threshold: float, block: int | None = None):
    """applyInPandas kernel: all within-cluster semantic-dup lookups
    for ONE cluster, emitted as (id_b, dup_of = min smaller-id
    neighbor with cos >= threshold). ``block`` overrides
    ``SEMDEDUP_BLOCK`` (tests shrink it to force multi-block paths);
    it is captured driver-side at factory time.

    Scale shape: each vector crosses the wire ONCE (the groupBy
    shuffles N rows of dim doubles); the sum(c^2) pair work happens
    in-kernel over numpy blocks of ``SEMDEDUP_BLOCK`` rows, so memory
    is B^2-bounded and there is no sum(c^2)-row join materialization
    (the join form moves 2*dim*8 bytes per CANDIDATE PAIR — the
    measured super-linear term at the 128x scale probe). One cluster
    = one task: a skewed mega-cluster serializes on one core, the
    standard applyInPandas caveat; k-means with K ~ sqrt(N) keeps
    expected cluster size sqrt(N).

    Bit-exactness: dot/norm accumulate per dimension in index order
    over the block matrices — elementwise numpy float64 ops in the
    same sequence as the ``cosine()`` fold (see ``_fold_cosine_rows``)
    — and the zero-denominator -> 0.0 rule matches. Mixed-dimension
    clusters are computed per dimension-group, like
    ``_cosine_kernel_fn``: two same-length vectors get their true
    cosine even when the cluster's max dim is larger, and cross-dim /
    NULL / zero-length pairs are cos 0.0 under the expression
    semantics (zip_with pads with NULL -> fold poisons -> coalesce
    0.0) — never >= a positive threshold, so the factory asserts
    threshold > 0 and the kernel prunes them. The min over qualifying
    smaller ids is integer and order-free. Parity with
    ``_semdedup_dup_of_join`` is pytest-pinned; the DuckDB oracle
    (pair replay in SQL) gates the composed query's value hash."""
    B = int(block or SEMDEDUP_BLOCK)
    if not threshold > 0.0:
        raise ValueError(
            "_cluster_dup_of_fn requires threshold > 0.0: cross-dim "
            "and NULL pairs are cos 0.0 and the kernel prunes them"
        )

    def _fn(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"id_b": [], "dup_of": []}).astype(
            {"id_b": "int64", "dup_of": "int64"}
        )
        n = len(pdf)
        if n < 2:
            return empty
        order = np.argsort(pdf["__id"].to_numpy(), kind="stable")
        ids = pdf["__id"].to_numpy()[order]
        vecs = pdf["__v"].to_numpy()[order]
        by_dim: dict[int, list[int]] = {}
        for j, x in enumerate(vecs):
            if x is not None and len(x) > 0:
                by_dim.setdefault(len(x), []).append(j)

        INT64_MAX = np.iinfo(np.int64).max
        dup_min = np.full(n, INT64_MAX, dtype=np.int64)
        for d, idx in by_dim.items():
            m = len(idx)
            if m < 2:
                continue
            # idx ascending over id-sorted rows -> sub_ids ascending
            sub_ids = ids[idx]
            V = np.vstack(
                [np.asarray(vecs[j], np.float64) for j in idx]
            )
            # per-row norm via the sequential fold
            nv = np.zeros(m)
            for i in range(d):
                nv = nv + V[:, i] * V[:, i]
            root = np.sqrt(nv)

            sub_min = np.full(m, INT64_MAX, dtype=np.int64)
            n_blocks = (m + B - 1) // B
            for p in range(n_blocks):
                p0, p1 = p * B, min((p + 1) * B, m)
                A = V[p0:p1]
                for q in range(p, n_blocks):
                    q0, q1 = q * B, min((q + 1) * B, m)
                    Bm = V[q0:q1]
                    dot = np.zeros((p1 - p0, q1 - q0))
                    for i in range(d):
                        dot = dot + A[:, i][:, None] * Bm[:, i][None, :]
                    den = root[p0:p1][:, None] * root[q0:q1][None, :]
                    with np.errstate(invalid="ignore", divide="ignore"):
                        cos = dot / den
                    cos = np.where(den == 0.0, 0.0, cos)
                    qual = cos >= threshold
                    # ids are sorted: id_a < id_b wherever row index <
                    # col index (strict upper triangle within p == q;
                    # everything in p < q blocks)
                    if p == q:
                        qual &= np.triu(
                            np.ones_like(qual, dtype=bool), k=1
                        )
                    if not qual.any():
                        continue
                    cand = np.where(
                        qual,
                        sub_ids[p0:p1][:, None],
                        INT64_MAX,
                    ).min(axis=0)
                    np.minimum(
                        sub_min[q0:q1], cand, out=sub_min[q0:q1]
                    )
            # dimension-groups are disjoint row sets: direct scatter
            dup_min[idx] = sub_min
        hit = dup_min < INT64_MAX
        return pd.DataFrame(
            {"id_b": ids[hit], "dup_of": dup_min[hit]}
        ).astype({"id_b": "int64", "dup_of": "int64"})

    return _fn


# ---------------------------------------------------------------------------
# Random projection (Johnson-Lindenstrauss dimensionality reduction)

RP_OUT_DIM = 16


def rp_signs(out_dim: int, in_dim: int) -> list[list[float]]:
    """Deterministic Rademacher (+-1) projection matrix from md5
    parity — the Achlioptas construction (signs suffice for JL; no
    Gaussians needed), reproducible on any engine with md5."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"rp:{j}:{i}".encode()).hexdigest()[-1], 16)
            % 2
            == 0
            else -1.0
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dim: int = 64,
    out_dim: int = RP_OUT_DIM,
) -> DataFrame:
    """Project embeddings to ``out_dim`` dims with a +-1 Rademacher
    matrix — 4x smaller vectors whose pairwise distances are
    JL-preserved in expectation (the cheap first stage before
    LSH/IVF when the raw dimension is high).

    Each output component is a FIXED-ORDER chain of fused
    multiply-adds over the input components (one codegen'd expression
    per dim, no shuffle, no UDF), so Spark and the DuckDB oracle
    produce bit-identical doubles. The (out_dim x in_dim) sign matrix
    is a compile-time literal — nothing is collected or broadcast.
    """
    signs = rp_signs(out_dim, in_dim)
    # index the raw array and cast the SCALAR element: putting
    # _as_double's transform here instead gets inlined into all
    # out_dim x in_dim references by the optimizer (no CSE for
    # higher-order expressions) — measured 1024 array-transform
    # rebuilds per row. float->double is exact either way.
    cols = []
    for j in range(out_dim):
        expr = F.lit(0.0)
        for i in range(in_dim):
            expr = expr + (
                F.element_at(F.col(vec_col), i + 1).cast("double")
                * F.lit(signs[j][i])
            )
        cols.append(expr.alias(f"p{j}"))
    return scan_parallel(emb).select(F.col(id_col), *cols)


def hard_negative_pairs(
    emb: DataFrame,
    query_ids: list[int],
    *,
    k: int = 8,
    max_cos: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive-training HARD-NEGATIVE MINING: for each anchor,
    the k most similar vectors with a DIFFERENT label and cosine
    below the near-dup threshold — confusable-but-wrong examples,
    the negatives that actually move a contrastive loss (random
    negatives are trivially separable; near-dups above ``max_cos``
    are likely label noise, so they're excluded).

    Same plan as ``brute_force_topk``: broadcast anchor batch, one
    corpus scan, per-anchor window top-k — exact for a bounded
    anchor set; at corpus-scale anchors, candidates come from the
    IVF/LSH probes instead and this stays the per-batch scorer.
    """
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("q_label"),
    )
    cand = scan_parallel(emb).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("n_vec"),
        F.col(label_col).alias("n_label"),
    )
    scored = (
        cand.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .filter(F.col("q_label") != F.col("n_label"))
        .withColumn("cos", cosine_arrow(F.col("q_vec"), F.col("n_vec")))
        .filter(F.col("cos") < F.lit(max_cos))
        .select("query_id", "q_label", "neighbor_id", "n_label", "cos")
    )
    from ..operators.topk import ensure_partial_limit

    scored = ensure_partial_limit(
        scored, order_col="cos", descending=True, k=k
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# MMR diversified re-ranking


def mmr_rerank(
    emb: DataFrame,
    query_ids: list[int],
    *,
    n_candidates: int = 20,
    k: int = 8,
    lam: float = 0.7,
    mu: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-Marginal-Relevance re-rank (Carbonell & Goldstein 1998)
    of the brute-force top-``n_candidates`` down to a diversified
    top-``k``: greedily pick argmax ``lam*rel(c) - mu*max_sim(c, S)``,
    ties to the smaller id.

    The RAG retrieval pattern: ANN recalls candidates, MMR removes the
    near-duplicate hits an LLM context window shouldn't waste tokens
    on. The selection loop is inherently sequential *per query* but
    embarrassingly parallel *across* queries, so the dataflow shape is
    a cogrouped ``applyInPandas`` over ``query_id`` — relevance and
    candidate-pair similarity both arrive pre-computed by the exact
    fold-cosine expressions (JVM-side, oracle-portable); Python only
    compares and multiplies, so every score is bit-reproducible (lam
    and mu are passed as the same decimal literals the DuckDB oracle
    casts to DOUBLE — never derived as ``1 - lam``, which rounds
    differently than the literal).

    100 TB: candidates per query are bounded (n_candidates from the
    ANN stage), so group state is O(n_candidates^2) and the job is one
    shuffle of the candidate table by query_id; the corpus itself is
    touched only by the upstream candidate generator.
    """
    import pandas as pd

    # top-k candidates (cos-only through the window — vectors never
    # ride the ranking shuffle), then ONE join fetches the shortlist
    # vectors; the bounded candidate-pair similarities are computed
    # INSIDE the per-query kernel from those vectors with the exact
    # same batch-cosine code path ``cosine_arrow`` runs
    # (_cosine_kernel_fn — bit-identical folds), which deletes the
    # pair self-join stage and both checkpoint materializations the
    # three-consumer composition needed. Group state stays
    # O(n_candidates^2); the corpus is touched only by the top-k
    # generator and the shortlist vector fetch.
    cands = brute_force_topk(
        emb, query_ids, k=n_candidates, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id", F.col("cos").alias("rel"))
    vecs = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("v"))
    cv = cands.join(vecs, F.col("neighbor_id") == F.col("nid")).select(
        "query_id", "neighbor_id", "rel", "v"
    )

    lam_f, mu_f, k_f = float(lam), float(mu), int(k)

    def _mmr(cdf: pd.DataFrame) -> pd.DataFrame:
        if cdf.empty:
            return pd.DataFrame(
                columns=["query_id", "rnk", "vec_id", "mmr_score"]
            )
        qid = int(cdf["query_id"].iloc[0])
        rel = {
            int(n): float(r)
            for n, r in zip(cdf["neighbor_id"], cdf["rel"])
        }
        vec_by_id = dict(zip((int(n) for n in cdf["neighbor_id"]), cdf["v"]))
        ids_sorted = sorted(vec_by_id)
        pair_keys = [
            (x, y)
            for xi, x in enumerate(ids_sorted)
            for y in ids_sorted[xi + 1:]
        ]
        if pair_keys:
            sims = _cosine_kernel_fn(
                pd.Series([vec_by_id[x] for x, _ in pair_keys]),
                pd.Series([vec_by_id[y] for _, y in pair_keys]),
            )
            sim = {
                kxy: float(s) for kxy, s in zip(pair_keys, sims)
            }
        else:
            sim = {}

        def pair(x: int, y: int) -> float:
            return sim[(x, y)] if x < y else sim[(y, x)]

        picked: list[int] = []
        remaining = sorted(rel)
        out = []
        while remaining and len(picked) < k_f:
            best_id, best_score = None, None
            for cid in remaining:  # ascending id => ties keep min id
                if picked:
                    ms = max(pair(cid, p) for p in picked)
                    score = lam_f * rel[cid] - mu_f * ms
                else:
                    score = rel[cid]
                if best_score is None or score > best_score:
                    best_id, best_score = cid, score
            picked.append(best_id)
            remaining.remove(best_id)
            out.append((qid, len(picked), best_id, best_score))
        return pd.DataFrame(
            out, columns=["query_id", "rnk", "vec_id", "mmr_score"]
        )

    return cv.groupBy("query_id").applyInPandas(
        _mmr,
        "query_id bigint, rnk bigint, vec_id bigint, mmr_score double",
    )
