"""Product quantization (PQ): the third leg of the ANN toolkit next to
SRP-LSH (data-oblivious buckets) and IVF (coarse partitions) —
completing the canonical billion-scale layout (IVF-PQ: coarse
partition, then scan compressed codes).

A vector splits into M subvectors; each subspace gets its own K-entry
k-means codebook; a vector stores M small codes (here 8 x 4 bits = 4
bytes for a 64-dim vector, 64x smaller than float32). Queries score
candidates with ASYMMETRIC DISTANCE (ADC): per subspace, precompute
the K distances from the query's subvector to the codebook entries
(an M x K table, tiny), then a candidate's distance is the sum of M
table lookups — no float vector is ever read at scan time.

Spark shape: codebook training is the driver-loop iterative pattern
(like ivf.py's k-means) but ALL M subspaces train in one job per
iteration — subvectors explode to (vec, m, s) rows once, assignment
is an argmin against the combined codebook literal, re-centering is a
single groupBy (m, code). Coding and ADC search are pure codegen'd
expressions over the broadcast codebook/table literals.

Determinism: init = the K smallest ids' subvectors, fixed iteration
count, min-code tie-breaks, decimal-exact (order-free) re-centering —
no RNG and no partition-order float drift. That makes the fixed
iteration count UNROLLABLE: the DuckDB oracle replays training,
encoding, and ADC search bit-for-bit (plans/catalog_extensions.py
``_pq_chain``); pytest keeps the recall-vs-brute-force and
reconstruction-MSE properties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .ivf import TRAIN_SAMPLE_CAP
from .similarity import _as_double, cosine_arrow, norm

M_SUB = 16
K_CODES = 16
N_ITER = 3


def _unit(v: Column) -> Column:
    """L2-normalize (zero vectors pass through): PQ codes unit vectors
    so ADC's L2 is monotone with cosine (||q-x||^2 = 2 - 2cos on the
    unit sphere) — the similarity family's common currency.

    NB: referencing ``norm(v)`` from inside the ``transform`` lambda
    re-evaluates the whole fold per ELEMENT (higher-order lambdas are
    interpreted; no subexpression elimination) — a 64-dim vector pays
    64 norm folds. Prefer :func:`_unit_frame` on any per-row hot path;
    this single-expression form remains for column-level composition
    where a frame boundary is unavailable."""
    n = norm(v)
    return F.when(n == 0, v).otherwise(
        F.transform(v, lambda x: x / n)
    )


def _unit_frame(
    emb: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, v=unit-normalized double vector) with the norm factored
    through a projection boundary so the fold evaluates ONCE per row,
    not once per element inside the transform lambda (measured ~10x
    on the training collect; identical IEEE ops, so bit-identical
    values — the `_unit` fold semantics with zero-norm pass-through)."""
    pre = emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("__v0")
    ).select("id", "__v0", norm(F.col("__v0")).alias("__n"))
    return pre.select(
        "id",
        F.when(F.col("__n") == 0, F.col("__v0"))
        .otherwise(F.transform("__v0", lambda x: x / F.col("__n")))
        .alias("v"),
    )


def _l2sq(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _codebook_lit(codebooks: list[list[list[float]]]) -> Column:
    """array<array<array<double>>> literal: [m][k][ds]."""
    return F.array(
        *[
            F.array(
                *[F.array(*[F.lit(x) for x in c]) for c in cb]
            )
            for cb in codebooks
        ]
    )


def _assign_code(s: Column, cb_m: Column) -> Column:
    """argmin code for subvector ``s`` against one subspace codebook
    (array<array<double>>): min (dist, code) struct — ties take the
    smaller code."""
    scored = F.transform(
        cb_m,
        lambda c, i: F.struct(
            _l2sq(s, c).alias("d"), i.cast("int").alias("code")
        ),
    )
    return F.array_min(scored)["code"]


def _np_unit(V):
    """Unit-normalize the rows of a (n, d) float64 matrix with the
    exact ``_unit`` expression fold: sequential per-dimension norm
    accumulation, sqrt, one division per element, zero-norm rows pass
    through (NaN rows propagate NaN, like the expression)."""
    import numpy as np

    n, d = V.shape
    nv = np.zeros(n)
    for j in range(d):
        nv = nv + V[:, j] * V[:, j]
    nrm = np.sqrt(nv)
    with np.errstate(invalid="ignore", divide="ignore"):
        U = V / nrm[:, None]
    return np.where((nrm == 0.0)[:, None], V, U)


def _np_argmin_code(S, codebook):
    """Vectorized argmin over one codebook for a (n, ds) subvector
    matrix — the numpy twin of ``_assign_code``: per code, the same
    sequential (x-y)^2 fold as ``_l2sq``; comparison mirrors
    array_min over struct(d, code) (min d, Spark NaN-greatest so NaN
    never wins over a finite d; ties keep the smaller code via
    ascending iteration + strict <)."""
    import numpy as np

    n, ds = S.shape
    best_d = None
    best_c = np.zeros(n, dtype=np.int32)
    for ci, c in enumerate(codebook):
        d = np.zeros(n)
        for j in range(ds):
            t = S[:, j] - c[j]
            d = d + t * t
        d = np.where(np.isnan(d), np.inf, d)
        if best_d is None:
            best_d = d
        else:
            win = d < best_d
            best_d = np.where(win, d, best_d)
            best_c = np.where(win, ci, best_c)
    return best_c, best_d


def _assign_code_arrow(codebooks: list[list[list[float]]]):
    """Arrow twin of ``_assign_code`` for the training loop: takes
    (subvector, m) and picks the argmin code against codebook[m] —
    one numpy pass per (code, dimension) instead of interpreted
    per-element folds."""
    cbs = [[list(map(float, c)) for c in cb] for cb in codebooks]

    def _kernel(s, m):
        import numpy as np
        import pandas as pd

        ds = len(cbs[0][0])
        for x in s:
            if x is None or len(x) != ds:
                raise ValueError(
                    "pq trainer: null or ragged subvector "
                    f"(expected dim {ds}, got "
                    f"{'NULL' if x is None else len(x)}) — "
                    "filter null/short embeddings before training"
                )
        S = np.vstack([np.asarray(x, np.float64) for x in s])
        mv = np.asarray(m, dtype=np.int64)
        out = np.zeros(len(S), dtype=np.int32)
        for mi in np.unique(mv):
            mask = mv == mi
            codes, _ = _np_argmin_code(S[mask], cbs[int(mi)])
            out[mask] = codes
        return pd.Series(out, dtype="int32")

    from pyspark.sql.pandas.functions import pandas_udf

    return pandas_udf(_kernel, "int")


def _local_pq_codebooks(
    rows, dim: int, m: int, k: int, n_iter: int, unit_rows=None
):
    """Driver-local replay of ``train_pq_codebooks``'s Spark loop on
    the collected (id, unit-normalized vec[, jvm_decimals]) sample:
    init = the k smallest ids' subvectors, assign = the shared
    :func:`_np_argmin_code` kernel math per subspace, re-center =
    ``ivf._exact_group_means`` fed the JVM's own decimal(38,18) casts
    when the 3rd tuple slot carries them (exact on any JDK — see
    ``ivf._units_matrix``). Bit-for-bit identical output
    (parity-pinned in tests/test_extensions.py) with one collect
    instead of the checkpoint + 2*n_iter jobs."""
    import numpy as np

    from .ivf import _exact_group_means, _units_matrix

    ds = dim // m
    for r in rows:
        v = r[1]
        if v is None or len(v) < dim:
            # the Arrow trainer kernel raises on any ragged subvector;
            # a vector shorter than dim always produces one
            raise ValueError(
                "pq trainer: null or ragged subvector "
                f"(expected dim {ds}, vector is "
                f"{'NULL' if v is None else f'{len(v)}-dim, need {dim}'}) — "
                "filter null/short embeddings before training"
            )
    ordered = sorted(rows, key=lambda r: r[0])[:k]
    codebooks = [
        [
            [float(x) for x in r[1][mi * ds: (mi + 1) * ds]]
            for r in ordered
        ]
        for mi in range(m)
    ]
    decs = [r[2] for r in rows] if rows and len(rows[0]) > 2 else None
    V = np.vstack([np.asarray(r[1][:dim], np.float64) for r in rows])
    subs = [V[:, mi * ds: (mi + 1) * ds] for mi in range(m)]
    units = [
        _units_matrix(
            [list(s) for s in subs[mi]],
            ds,
            dec_rows=(
                None
                if decs is None
                else [d[mi * ds: (mi + 1) * ds] for d in decs]
            ),
            unit_rows=(
                None
                if unit_rows is None
                else [u[mi * ds: (mi + 1) * ds] for u in unit_rows]
            ),
        )
        for mi in range(m)
    ]
    for _ in range(n_iter):
        new = {}
        for mi in range(m):
            codes, _ = _np_argmin_code(subs[mi], codebooks[mi])
            counts = np.bincount(codes, minlength=k)
            U, NN, big = units[mi]
            means = _exact_group_means(U, NN, big, codes, counts, ds)
            for ci, vals in means.items():
                new[(mi, ci)] = vals
        codebooks = [
            [
                new.get((mi, ci), codebooks[mi][ci])  # empty: keep old
                for ci in range(k)
            ]
            for mi in range(m)
        ]
    return codebooks


def train_pq_codebooks(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = M_SUB,
    k: int = K_CODES,
    n_iter: int = N_ITER,
    sample_mod: int | None = None,
    driver_local: bool | None = None,
    _sample: dict | None = None,
) -> list[list[list[float]]]:
    """Per-subspace L2 k-means codebooks, [m][k][dim/m].

    One exploded (vec, subspace, subvector) frame trains every
    subspace simultaneously: each iteration is ONE assign + ONE
    groupBy (m, code) job, not M of them. The frame is bounded by the
    deterministic training sample (id % mod == 0, cap like IVF's) and
    checkpointed so iterations never replay the corpus scan.

    ``driver_local=None`` auto-picks like ``ivf.train_kmeans``: the
    CAP-bounded sample collects once and the loop runs on the driver
    (:func:`_local_pq_codebooks`, bit-identical) unless the
    (sample x codes x subspaces) budget argues for the distributed
    loop. PQ's budget (sample x 16 x 16) stays under the cell cap even
    at the full TRAIN_SAMPLE_CAP, so the local path is the norm.
    """
    from .ivf import (
        LOCAL_TRAIN_CELLS_MAX,
        _collect_train_sample,
    )

    ds = dim // m
    e = _unit_frame(emb, id_col, vec_col)
    # The local replay trains on the JVM's decimal(38,18) casts
    # shipped with the ONE training collect as raw decimal128 arrays
    # (see ivf._collect_train_sample): exact on any JDK, no verify
    # pass, no fallback re-collect.
    sample = None
    n = None
    if _sample is not None:
        sample, n, sample_mod = _sample, _sample["n"], 1
    if sample_mod is None and driver_local is not False:
        # one pass for cap-sized corpora, bounded by the cells budget
        # (see ivf.train_kmeans)
        probe_cap = min(
            TRAIN_SAMPLE_CAP, LOCAL_TRAIN_CELLS_MAX // max(1, k * m)
        )
        sample = _collect_train_sample(e, "id", probe_cap)
        if sample is not None:
            n, sample_mod = sample["n"], 1
    if n is None:
        n = e.count()
    if sample_mod is None:
        sample_mod = max(1, -(-n // TRAIN_SAMPLE_CAP))
    if driver_local is None:
        est = n if sample_mod <= 1 else n // sample_mod + 1
        driver_local = est * k * m <= LOCAL_TRAIN_CELLS_MAX
    if sample_mod > 1:
        e = e.filter(F.col("id") % sample_mod == 0)
        sample = None
    if driver_local:
        if sample is None:
            sample = _collect_train_sample(e, "id", n)
        return _local_pq_codebooks(
            list(zip(sample["ids"], sample["vecs_v"])),
            dim=dim, m=m, k=k, n_iter=n_iter,
            unit_rows=sample["units_v"],
        )
    sub = e.select(
        "id",
        F.posexplode(
            F.array(*[F.slice("v", mi * ds + 1, ds) for mi in range(m)])
        ).alias("m", "s"),
    ).localCheckpoint(eager=True)

    init = (
        sub.filter(
            F.col("id").isin(
                [r["id"] for r in e.orderBy(F.col("id").asc()).limit(k).collect()]
            )
        )
        .collect()
    )
    by_m: dict[int, list[tuple[int, list[float]]]] = {}
    for r in init:
        by_m.setdefault(r["m"], []).append((r["id"], list(r["s"])))
    codebooks = [
        [s for _, s in sorted(by_m[mi])[:k]] for mi in range(m)
    ]

    for _ in range(n_iter):
        assigned = sub.withColumn(
            "code", _assign_code_arrow(codebooks)(F.col("s"), F.col("m"))
        )
        # decimal-exact sums + driver-side IEEE division (see
        # ivf.train_kmeans): order-free, bit-stable, oracle-replayable
        means = (
            assigned.groupBy("m", "code")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                *[
                    F.sum(F.col("s")[i].cast("decimal(38,18)"))
                    .cast("double")
                    .alias(f"a{i}")
                    for i in range(ds)
                ],
            )
            .collect()
        )
        new = {
            (r["m"], r["code"]): [r[f"a{i}"] / r["__n"] for i in range(ds)]
            for r in means
        }
        codebooks = [
            [
                new.get((mi, ci), codebooks[mi][ci])  # empty: keep old
                for ci in range(k)
            ]
            for mi in range(m)
        ]
    return codebooks


def _pq_encode_udf(codebooks: list[list[list[float]]]):
    """Arrow kernel column for PQ encoding — struct(codes, recon_mse)
    per vector. Split out of :func:`pq_encode` so composed lanes
    (``ivf_pq_topk``) can stamp codes onto an already-assigned frame
    in the SAME corpus pass instead of join-merging two scans."""
    m = len(codebooks)
    ds = len(codebooks[0][0])
    cbs = [[list(map(float, c)) for c in cb] for cb in codebooks]

    def _kernel(v):
        import numpy as np
        import pandas as pd

        want = m * ds
        for x in v:
            if x is None or len(x) != want:
                raise ValueError(
                    "pq_encode: null or ragged embedding "
                    f"(expected dim {want}, got "
                    f"{'NULL' if x is None else len(x)}) — "
                    "filter null/short embeddings before encoding"
                )
        V = np.vstack([np.asarray(x, np.float64) for x in v])
        n, d = V.shape
        U = _np_unit(V)  # sequential-fold norm, zero rows pass through
        codes = np.zeros((n, m), dtype=np.int32)
        # recon fold: subspace distances accumulate in m order, same
        # as the expression's aggregate over the per-subspace array
        recon = np.zeros(n)
        for mi in range(m):
            S = U[:, mi * ds: (mi + 1) * ds]
            c, dmin = _np_argmin_code(S, cbs[mi])
            codes[:, mi] = c
            # dmin carries the NaN->inf surrogate; rebuild the exact
            # chosen-code distance with the fold so recon matches the
            # expression bit-for-bit
            dm = np.zeros(n)
            cb_arr = np.asarray(cbs[mi])  # (k, ds)
            chosen = cb_arr[c]            # (n, ds)
            for j in range(ds):
                t = S[:, j] - chosen[:, j]
                dm = dm + t * t
            recon = recon + dm
        recon = recon / float(m * ds)
        return pd.DataFrame(
            {"codes": list(codes), "recon_mse": recon}
        )

    from pyspark.sql.pandas.functions import pandas_udf

    return pandas_udf(_kernel, "codes array<int>, recon_mse double")


def _assign_encode_udf(
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
):
    """FUSED corpus kernel for ``ivf_pq_topk``: coarse assignment and
    PQ codes from ONE Arrow pass (struct<centroid_id, codes>), so the
    corpus vectors cross the JVM->Python boundary once instead of
    twice (guide §4 — the two stacked ArrowEvalPython nodes each
    shipped the full vector column). Math is the exact shared kernels:
    :func:`ivf._np_nearest_matrix` for the assignment and the
    ``_pq_encode_udf`` loops for the codes — bit-identical outputs.

    Contract: raises on NULL/ragged vectors with ``_pq_encode_udf``'s
    message (the sequential pipeline also failed on such corpora, in
    its encode kernel); after that guard every row is exactly
    centroid-dimensional, so ``_assign_matrix``'s zeros substitution
    is unreachable and the direct vstack is equivalent. Only valid
    for the Arrow-kernel assign regime (K <= ASSIGN_LITERAL_MAX);
    the caller guards."""
    from .ivf import _np_nearest_matrix

    cents = [(int(cid), [float(x) for x in vec]) for cid, vec in centroids]
    m = len(codebooks)
    ds = len(codebooks[0][0])
    cbs = [[list(map(float, c)) for c in cb] for cb in codebooks]

    def _kernel(v):
        import numpy as np
        import pandas as pd

        want = m * ds
        vv = list(v)
        for x in vv:
            if x is None or len(x) != want:
                raise ValueError(
                    "pq_encode: null or ragged embedding "
                    f"(expected dim {want}, got "
                    f"{'NULL' if x is None else len(x)}) — "
                    "filter null/short embeddings before encoding"
                )
        V = np.vstack([np.asarray(x, np.float64) for x in vv])
        cids = _np_nearest_matrix(V, cents)
        U = _np_unit(V)
        n = len(vv)
        codes = np.zeros((n, m), dtype=np.int32)
        for mi in range(m):
            S = U[:, mi * ds: (mi + 1) * ds]
            c, _ = _np_argmin_code(S, cbs[mi])
            codes[:, mi] = c
        return pd.DataFrame(
            {"centroid_id": pd.Series(cids, dtype="int32"),
             "codes": list(codes)}
        )

    from pyspark.sql.pandas.functions import pandas_udf

    # asNondeterministic: the probe join's null-rejection on
    # centroid_id otherwise pushes a filter BELOW the projection and
    # the optimizer duplicates the whole kernel (two ArrowEvalPython
    # evals of the same batch — guide §4.4); the kernel is in fact
    # deterministic, the marker only pins a single evaluation.
    return pandas_udf(
        _kernel, "centroid_id int, codes array<int>"
    ).asNondeterministic()


def _pq_prep_queries(
    qdf: DataFrame,
    codebooks: list[list[list[float]]],
    centroids: list[tuple[int, list[float]]] | None = None,
    nprobe: int | None = None,
    *,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Arrow prep replacing the query side's codebook LITERAL dtab
    (``_codebook_lit`` + m x k ``_l2sq`` folds) and — with
    ``centroids`` — the centroid-literal probe ranking: those literals
    are thousands of py4j ``F.lit`` calls whose tree construction
    dominated the IVF-PQ lane's wall (measured ~6 s at sf0.1).
    Returns (query_id, dtab array<array<double>>[, probe array<int>])
    per raw embedding, replaying the expression semantics exactly:

    - qv = unit-normalize over the vector's OWN length
      (:func:`_np_unit`, the ``_unit`` fold twin);
    - dtab[mi][code] = the sequential ``_l2sq`` fold when subspace mi
      is complete ((mi+1)*ds <= len), else NULL (``F.slice`` of a
      short vector null-pads ``zip_with``, and any null term nulls the
      fold); a NULL vector yields all-NULL entries the same way;
    - probe = ``reverse(array_sort(struct(cos, neg_cid, cid)))`` ids
      over qv (``ivf._np_probe_matrix``): NULL or dimension-mismatched
      qv coalesces to cosine 0.0 against every centroid, which the
      zeros row reproduces bit-for-bit; NaN propagates (greatest).

    Implemented over ``mapInArrow`` with explicitly-typed arrays: the
    pandas serializer's from_pandas conversion folds NaN into NULL in
    nested lists, which would corrupt a NaN-element query's dtab.
    Bit-parity with the literal form is pinned by a degenerate-input
    pytest and the lanes' DuckDB value-hash oracles (literal SQL)."""
    from .ivf import _np_probe_matrix

    m = len(codebooks)
    ds = len(codebooks[0][0])
    cbs = [[list(map(float, c)) for c in cb] for cb in codebooks]
    cents = (
        None
        if centroids is None
        else [(int(c), [float(x) for x in v]) for c, v in centroids]
    )
    # the probe leg ranks against the CENTROID dimension, which a
    # caller passing pre-trained centroids may have set differently
    # from the codebook's m*ds: a qv of any other length coalesces to
    # cosine 0.0 against every centroid (zip_with null-pad), which the
    # zeros row reproduces — gate on cent_dim, not dim
    cent_dim = len(cents[0][1]) if cents else 0
    id_type = qdf.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {id_type}, dtab array<array<double>>" + (
        ", probe array<int>" if cents is not None else ""
    )
    id_idx = qdf.columns.index(id_col)
    vec_idx = qdf.columns.index(vec_col)

    def _fn(batches):
        import pyarrow as pa

        for b in batches:
            vecs = b.column(vec_idx).to_pylist()  # NaN/NULL preserved
            dtabs, probes = _dtab_probe_rows(
                vecs, cbs, cents, nprobe, cent_dim
            )
            cols = [
                b.column(id_idx),
                pa.array(dtabs, type=pa.list_(pa.list_(pa.float64()))),
            ]
            names = ["query_id", "dtab"]
            if probes is not None:
                cols.append(pa.array(probes, type=pa.list_(pa.int32())))
                names.append("probe")
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return qdf.mapInArrow(_fn, out_schema)


def _dtab_probe_rows(vecs, cbs, cents, nprobe, cent_dim):
    """Shared math of the query prep (see :func:`_pq_prep_queries`
    for the replicated expression semantics): per raw vector the ADC
    distance table and — with ``cents`` — the probe ranking. Called
    per Arrow batch by the kernel AND directly on the driver when the
    trainer's un-sampled collect already holds the query vectors."""
    import numpy as np

    from .ivf import _np_probe_matrix

    m = len(cbs)
    ds = len(cbs[0][0])
    n = len(vecs)
    dtabs = []
    units = np.zeros((n, cent_dim)) if cents is not None else None
    for r, x in enumerate(vecs):
        if x is None:
            dtabs.append(
                [[None] * len(cbs[mi]) for mi in range(m)]
            )
            continue  # zeros unit row: cosine-0.0 coalesce twin
        qu = _np_unit(np.asarray(x, np.float64)[None, :])[0]
        if units is not None and len(qu) == cent_dim:
            units[r] = qu
        # else: zeros row — zip_with null-pads the shorter
        # side, the cosine folds NULL and coalesces to 0.0
        row = []
        for mi in range(m):
            lo = mi * ds
            if lo + ds <= len(qu):
                s = qu[lo:lo + ds]
                drow = []
                for c in cbs[mi]:
                    d_ = 0.0
                    for j in range(ds):
                        t = s[j] - c[j]
                        d_ = d_ + t * t
                    drow.append(float(d_))
                row.append(drow)
            else:
                row.append([None] * len(cbs[mi]))
        dtabs.append(row)
    probes = (
        _np_probe_matrix(units, cents, nprobe)
        if cents is not None
        else None
    )
    return dtabs, probes


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>, recon_mse) in one Arrow-kernel pass —
    plus the dequantized-reconstruction MSE so storage loss is
    observable next to the codes."""
    enc = _pq_encode_udf(codebooks)
    out = emb.select(
        F.col(id_col), enc(F.col(vec_col)).alias("__e")
    )
    return out.select(id_col, "__e.codes", "__e.recon_mse")


def pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
    dim: int = 64,
    rerank: int = 5,
) -> DataFrame:
    """ADC top-k: corpus rows carry only their M codes; each query
    broadcasts an M x K distance table (computed from ITS subvectors
    once) and candidate distance = sum of M table lookups. The float
    corpus is read once to encode; the SCAN touches codes only — the
    100 TB property. With ``rerank`` (default 5) the ADC pass keeps a
    rerank*k shortlist that re-ranks by exact cosine — the standard
    two-stage PQ deployment (coarse prune on 4-byte codes, precise
    order on shortlist-many float fetches); ``rerank=0`` returns the
    raw ADC ranking.
    """
    codebooks = codebooks or train_pq_codebooks(
        emb, id_col=id_col, vec_col=vec_col, dim=dim
    )
    coded = pq_encode(
        emb, codebooks, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col).alias("neighbor_id"), "codes")

    # dtab via the Arrow prep — the codebook-literal fold tree it
    # replaces dominated lane BUILD time (see _pq_prep_queries)
    queries = _pq_prep_queries(
        emb.filter(F.col(id_col).isin(query_ids)),
        codebooks,
        id_col=id_col,
        vec_col=vec_col,
    )
    cand = coded.crossJoin(F.broadcast(queries)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("dtab"),
            F.col("codes"),
            lambda t, c: F.element_at(t, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = cand.select(
        "query_id", "neighbor_id", dist.alias("adc_dist")
    )
    # the rank<=shortlist filter infers a PARTIAL WindowGroupLimit
    # map-side (up to the optimizer threshold; the guard covers larger
    # rerank*k), so ADC candidates never funnel through one reducer
    from ..operators.topk import ensure_partial_limit

    scored = ensure_partial_limit(
        scored,
        order_col="adc_dist",
        descending=False,
        k=(rerank * k if rerank else k),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    ranked = scored.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    )
    if not rerank:
        return ranked.filter(F.col("rank") <= k)

    # production shape: ADC prunes to a shortlist (rerank*k), then the
    # shortlist re-ranks with exact full-precision cosine — only
    # shortlist-many float vectors are ever fetched per query. The
    # shortlist is queries x rerank x k rows at ANY corpus size:
    # broadcast it so the float fetch is a corpus-scan probe, not a
    # corpus-wide shuffle
    shortlist = ranked.filter(F.col("rank") <= rerank * k).select(
        "query_id", "neighbor_id", "adc_dist"
    )
    nvec = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )
    # only the query rows join the shortlist: broadcasting the
    # unfiltered corpus projection here was a corpus-sized broadcast
    # build for a queries-sized relation
    qvec = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    exact = (
        F.broadcast(shortlist).join(nvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn("cos", cosine_arrow(F.col("q_vec"), F.col("n_vec")))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the composed billion-scale layout

def ivf_pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nprobe: int | None = None,
    rerank: int = 5,
    centroids: list[tuple[int, list[float]]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """The canonical composed ANN layout: IVF restricts the search to
    ``nprobe`` coarse partitions, PQ-ADC scores only the CODES inside
    them, and the shortlist re-ranks with exact cosine. Per query the
    scan cost is (nprobe/K of the corpus) x 8-byte codes — both
    pruning levers at once; neither the full corpus nor any float
    vector outside the shortlist is touched.

    Built by composition: ``ivf.train_kmeans``'s centroids partition
    the coded corpus; candidate generation is the same broadcast
    probe-join as ``ivf_topk``; scoring/re-rank are ``pq_topk``'s.
    """
    from .ivf import _assign, train_kmeans

    shared = None
    if centroids is None and codebooks is None:
        # both trainers sample the SAME corpus: collect raw + unit
        # vectors (and their JVM decimal strings) in ONE scan/job and
        # feed each trainer its domain — halves the training collects
        # of the composed lane; falls back to the independent sampled
        # trainers when the corpus exceeds the shared-probe cap
        from .ivf import (
            K_MAX,
            LOCAL_TRAIN_CELLS_MAX,
            _collect_train_sample,
            _probe_cap_auto_k,
        )

        pre = emb.select(
            F.col(id_col).alias("id"),
            _as_double(F.col(vec_col)).alias("__v0"),
        ).select("id", "__v0", norm(F.col("__v0")).alias("__n"))
        comb = pre.select(
            "id",
            F.col("__v0").alias("v"),
            F.when(F.col("__n") == 0, F.col("__v0"))
            .otherwise(F.transform("__v0", lambda x: x / F.col("__n")))
            .alias("vu"),
        )
        cap = min(
            _probe_cap_auto_k(K_MAX),
            LOCAL_TRAIN_CELLS_MAX // (K_CODES * M_SUB),
        )
        shared = _collect_train_sample(comb, "id", cap, vec_cols=("v", "vu"))
        if shared is not None:
            centroids = train_kmeans(
                emb, id_col=id_col, vec_col=vec_col,
                _sample={
                    "ids": shared["ids"], "n": shared["n"],
                    "vecs_v": shared["vecs_v"],
                    "units_v": shared["units_v"],
                },
            )
            codebooks = train_pq_codebooks(
                emb, id_col=id_col, vec_col=vec_col, dim=dim,
                _sample={
                    "ids": shared["ids"], "n": shared["n"],
                    "vecs_v": shared["vecs_vu"],
                    "units_v": shared["units_vu"],
                },
            )
    if centroids is None:
        centroids = train_kmeans(emb, id_col=id_col, vec_col=vec_col)
    if nprobe is None:
        # PQ scoring is cheap per candidate, so probe deeper than
        # ivf_topk's K/4 default: recall comes from coverage here
        nprobe = max(1, len(centroids) // 2)
    if codebooks is None:
        codebooks = train_pq_codebooks(
            emb, id_col=id_col, vec_col=vec_col, dim=dim
        )
    # codes and coarse assignment are both ROW-WISE transforms of the
    # same table: stamp both in ONE corpus pass instead of
    # join-merging two separate scans — the join form shuffles the
    # whole coded corpus on neighbor_id, a corpus-wide shuffle that
    # buys nothing at any scale. In the kernel-assign regime
    # (K <= ASSIGN_LITERAL_MAX, every catalog configuration) the two
    # transforms FUSE into one Arrow kernel so the vectors cross the
    # Python boundary once (guide §4; _assign_encode_udf); the
    # big-K broadcast-join assign keeps the two-step form.
    from .ivf import ASSIGN_LITERAL_MAX

    nv = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("n_vec"),
    )
    if len(centroids) <= ASSIGN_LITERAL_MAX:
        corpus = nv.select(
            "neighbor_id",
            _assign_encode_udf(centroids, codebooks)(
                F.col("n_vec")
            ).alias("__ae"),
        ).select(
            "neighbor_id", "__ae.codes", "__ae.centroid_id"
        )
    else:
        corpus = (
            _assign(nv, centroids, "n_vec")
            .withColumn(
                "codes",
                _pq_encode_udf(codebooks)(F.col("n_vec"))["codes"],
            )
            .select("neighbor_id", "codes", "centroid_id")
        )

    # dtab + probe ranking prep. When the shared training collect is
    # available it holds the WHOLE corpus (sample_mod==1 by
    # construction), so selecting the query rows from it replicates
    # the scan filter exactly and the prep math (same helper the
    # Arrow kernel runs) executes DRIVER-side: no extra corpus scan,
    # no Python-worker stage inside the broadcast build. Queries stay
    # a handful of vectors at any corpus size — client-side prep is
    # the production shape too.
    qvec_local = None
    if shared is not None:
        qset = set(query_ids)
        qvec_local = [
            (i, v)
            for i, v in zip(shared["ids"], shared["vecs_v"])
            if i in qset
        ]
    if qvec_local is not None:
        from .ivf import (
            _sql_darray,
            _sql_iarray,
            _sql_idlit,
            _sql_values_frame,
        )

        idt = emb.schema[id_col].dataType
        if not qvec_local or any(
            _sql_idlit(i, idt) is None for i, _ in qvec_local
        ):
            qvec_local = None  # unrenderable/empty: scan path below
    if qvec_local is not None:
        cbs_l = [[list(map(float, c)) for c in cb] for cb in codebooks]
        cents_l = [
            (int(c), [float(x) for x in v]) for c, v in centroids
        ]
        dtabs, probes = _dtab_probe_rows(
            [v for _, v in qvec_local],
            cbs_l,
            cents_l,
            nprobe,
            len(cents_l[0][1]),
        )

        def _dtab_sql(rowtab):
            return "array({})".format(
                ",".join(_sql_darray(dr) for dr in rowtab)
            )

        rows_sql = [
            f"({_sql_idlit(i, idt)}, {_dtab_sql(dtabs[j])},"
            f" {_sql_iarray(probes[j])})"
            for j, (i, _) in enumerate(qvec_local)
        ]
        queries = _sql_values_frame(
            emb.sparkSession, rows_sql, "query_id, dtab, probe"
        ).select(
            "query_id", "dtab", F.explode("probe").alias("centroid_id")
        )
    else:
        # one Arrow prep pass — replaces the codebook AND centroid
        # literal trees (see _pq_prep_queries)
        queries = _pq_prep_queries(
            emb.filter(F.col(id_col).isin(query_ids)),
            codebooks,
            centroids,
            nprobe,
            id_col=id_col,
            vec_col=vec_col,
        ).select(
            "query_id", "dtab", F.explode("probe").alias("centroid_id")
        )
    cand = corpus.join(F.broadcast(queries), "centroid_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("dtab"),
            F.col("codes"),
            lambda t, c: F.element_at(t, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = cand.select("query_id", "neighbor_id", dist.alias("adc_dist"))
    from ..operators.topk import ensure_partial_limit

    scored = ensure_partial_limit(
        scored, order_col="adc_dist", descending=False, k=rerank * k
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    ranked = scored.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    )
    shortlist = ranked.filter(F.col("rank") <= rerank * k).select(
        "query_id", "neighbor_id", "adc_dist"
    )
    nvec = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )
    if qvec_local is not None:
        qvec = _sql_values_frame(
            emb.sparkSession,
            [
                f"({_sql_idlit(i, idt)}, {_sql_darray(v)})"
                for i, v in qvec_local
            ],
            "query_id, q_vec",
        )
    else:
        # only the query rows join the shortlist: broadcasting the
        # unfiltered corpus projection here was a corpus-sized
        # broadcast build for a queries-sized relation
        qvec = emb.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    exact = (
        F.broadcast(shortlist).join(nvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn("cos", cosine_arrow(F.col("q_vec"), F.col("n_vec")))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "cos", "rank")
    )
