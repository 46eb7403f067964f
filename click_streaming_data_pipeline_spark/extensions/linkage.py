"""Edit-distance similarity join (record linkage / fuzzy matching).

The missing join type in both the reference (ES ``fuzziness:"AUTO"``
approximates it per-query, ``services/search/app/main.py:90-99``) and
in the existing dedup toolkit (PPJoin/`dedup_prefix_filter` covers
set-overlap Jaccard, not character-level edit distance). Finding all
string pairs within Levenshtein distance tau is the core of entity
resolution over names/addresses.

Candidate generation is the DELETION NEIGHBORHOOD (FastSS; Bocek et
al. 2007): for tau = 1, define D(s) = {s} union {s with one character
deleted}. If ed(a, b) <= 1 then D(a) and D(b) intersect:

- ed = 0: a itself is shared;
- substitution at position i: deleting position i from both yields
  the same string;
- insertion (b = a + one char at i): a is in D(a), and deleting
  position i from b yields a, so a is in D(b) too.

So an equi-join on deletion keys finds EVERY candidate pair — no
all-pairs join, no recall loss. Each row emits len(s)+1 keys (a
linear, not quadratic, blow-up), buckets are equi-join-shuffled on
the key, and the exact ``levenshtein`` verifier runs only on
candidates. Bucket sizes are bounded by how many strings collapse to
the same deletion key (near-identical strings), the same df profile
as LSH bands — at 100 TB the join is shuffle-partitioned on the key
and AQE splits skewed buckets.

For tau = 1 the keys carry their DELETION POSITION, which upgrades
the filter from "necessary" to "exact": two equal-length strings
sharing delete@i differ ONLY at position i (ed <= 1 by construction),
and a full string equal to delete@i of another is one insertion away.
The position-aware join therefore yields ZERO false candidates and
the distance needs no DP at all — dist = 0 iff the strings are equal,
else 1 (measured: 977k -> 262k candidate rows at sf0.1, 1.7x wall).

For tau = 2 the scheme generalizes to 2-deletion neighborhoods
(1 + L + C(L,2) keys per string, FastSS) whose keys carry VARIANT-GAP
coordinates: a shared key alone is only necessary for ed <= 2, but
the gap multisets make each join row a concrete edit-script witness
of length n_a + n_b - overlap, and the MINIMUM witness bound over a
pair's keys equals the exact edit distance — so tau = 2 also needs
no DP, just integer gap math in codegen and a grouped min (see
edit_distance_pairs_tau2 for the proof sketch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: position-carrying deletion-neighborhood keys: struct(k = the
#: string with one character deleted, p = 1-based deletion position;
#: p = 0 is the string itself). SQL-expression form — stays inside
#: whole-stage codegen, no Python UDF. Keys stay STRINGS
#: deliberately: an xxhash64-long key (the LSH-postings trick) was
#: measured at 11.37 vs 11.31 CPU-s per sf0.1 run — names are too
#: short for the narrower key to beat the hash's own cost, unlike
#: 12-token shingles.
_DELETION_KEYS_POS = (
    "concat(array(struct({s} AS k, 0 AS p)), "
    "transform(sequence(1, length({s})), "
    "i -> struct(concat(left({s}, i - 1), substring({s}, i + 1)) AS k, "
    "i AS p)))"
)

#: 2-deletion neighborhood (FastSS, tau=2) with VARIANT-GAP
#: coordinates: struct(k = the string with 0/1/2 characters deleted,
#: g1/g2 = the 1-based gaps IN THE VARIANT where the deleted
#: characters sat, ascending, 0 = unused). Deleting original
#: positions i < j lands at variant gaps (i, j-1) — the second
#: deletion shifts left past the first. Gap coordinates are what
#: make the candidate filter EXACT (see edit_distance_pairs_tau2).
#: Guards keep sequence() monotone (Spark's sequence(3, 2) DESCENDS,
#: it does not return empty) for length-0/1 strings.
_EMPTY_KGG = "CAST(array() AS array<struct<k:string,g1:int,g2:int>>)"
_DELETION_KEYS_TAU2 = (
    "concat("
    "array(struct({s} AS k, 0 AS g1, 0 AS g2)), "
    "CASE WHEN length({s}) >= 1 THEN transform(sequence(1, length({s})), "
    "i -> struct(concat(left({s}, i - 1), substring({s}, i + 1)) AS k, "
    "i AS g1, 0 AS g2)) "
    f"ELSE {_EMPTY_KGG} END, "
    "CASE WHEN length({s}) >= 2 THEN "
    "flatten(transform(sequence(1, length({s}) - 1), "
    "i -> transform(sequence(i + 1, length({s})), "
    "j -> struct(concat(left({s}, i - 1), "
    "substring({s}, i + 1, j - i - 1), substring({s}, j + 1)) AS k, "
    "i AS g1, j - 1 AS g2)))) "
    f"ELSE {_EMPTY_KGG} END)"
)


def deletion_keys(df: DataFrame, s_col: str) -> DataFrame:
    """Explode each row into its position-carrying deletion keys
    (+2 cols ``_dkey`` string, ``_dpos`` int; 0 = the string
    itself)."""
    kp = F.explode(F.expr(_DELETION_KEYS_POS.format(s=s_col)))
    return (
        df.withColumn("_kp", kp)
        .withColumn("_dkey", F.col("_kp.k"))
        .withColumn("_dpos", F.col("_kp.p"))
        .drop("_kp")
    )


def deletion_keys_tau2(df: DataFrame, s_col: str) -> DataFrame:
    """Explode each row into its 2-deletion-neighborhood keys
    (+3 cols: ``_dkey`` string, ``_g1``/``_g2`` variant-gap ints,
    0 = unused; one row per (positions) CHOICE — identical variant
    strings from different deletion positions stay separate, each is
    its own witness)."""
    kp = F.explode(F.expr(_DELETION_KEYS_TAU2.format(s=s_col)))
    return (
        df.withColumn("_kp", kp)
        .withColumn("_dkey", F.col("_kp.k"))
        .withColumn("_g1", F.col("_kp.g1"))
        .withColumn("_g2", F.col("_kp.g2"))
        .drop("_kp")
    )


def edit_distance_pairs(
    df: DataFrame, id_col: str, s_col: str, max_dist: int = 1
) -> DataFrame:
    """All pairs (id_a < id_b) with levenshtein(s_a, s_b) <= max_dist.

    Plan shape: explode position-keyed deletions -> equi-join on key
    filtered to (same position | either side is the full string) ->
    distinct pair. The position filter makes candidates EXACT (module
    doc: delete@i == delete@i means the strings differ at position i
    only; full == delete@i means one insertion), so no verify DP runs
    — a dist-2 'shift' pair like (ab, ba) that shares delete strings
    at DIFFERENT positions never joins. Returns columns ``id_a, id_b,
    name_a, name_b, dist`` (dist int). ``max_dist=2`` routes to
    :func:`edit_distance_pairs_tau2`.
    """
    if max_dist == 2:
        return edit_distance_pairs_tau2(df, id_col, s_col)
    if max_dist != 1:
        raise ValueError(
            "deletion-neighborhood blocking supports max_dist in "
            "(1, 2); use tau-deletion neighborhoods for larger radii"
        )
    # the NAME strings never ride the candidate join (guide §2.3:
    # shuffle keys/metadata, re-attach payloads by id at the end):
    # the exploded stream carries only (id, key, pos), the wide
    # 5-column distinct becomes a narrow (id_a, id_b) grouped min,
    # and dist needs no string compare at all — a pair has dist 0
    # iff it joins at (pa=0, pb=0), i.e. the FULL strings collide as
    # keys (key == name_a == name_b); every other witness proves
    # exactly one edit, so dist = min over witnesses of the
    # (0 if pa=0 and pb=0 else 1) indicator.
    from ..sources.tables import scan_parallel

    base = df.select(id_col, s_col)
    # only the explode/join side needs the starved-scan redistribution
    # (the name re-attach sides are broadcast probes — an Exchange
    # inside their broadcast builds would be pure latency)
    keyed = deletion_keys(scan_parallel(base), s_col).select(
        id_col, "_dkey", "_dpos"
    )
    a = keyed.select(
        F.col(id_col).alias("id_a"), "_dkey", F.col("_dpos").alias("_pa")
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"), "_dkey", F.col("_dpos").alias("_pb")
    )
    wit = (
        F.when((F.col("_pa") == 0) & (F.col("_pb") == 0), F.lit(0))
        .otherwise(F.lit(1))
    )
    pairs = (
        a.join(b, "_dkey")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                (F.col("_pa") == F.col("_pb"))
                | (F.col("_pa") == 0)
                | (F.col("_pb") == 0)
            )
        )
        .select("id_a", "id_b", wit.alias("_w"))
        .groupBy("id_a", "id_b")
        .agg(F.min("_w").cast("int").alias("dist"))
    )
    names_a = base.select(
        F.col(id_col).alias("id_a"), F.col(s_col).alias("name_a")
    )
    names_b = base.select(
        F.col(id_col).alias("id_b"), F.col(s_col).alias("name_b")
    )
    return pairs.join(names_a, "id_a").join(names_b, "id_b").select(
        "id_a", "id_b", "name_a", "name_b", "dist"
    )


def edit_distance_pairs_tau2(
    df: DataFrame, id_col: str, s_col: str
) -> DataFrame:
    """All pairs (id_a < id_b) with levenshtein(s_a, s_b) <= 2 — the
    ES ``fuzziness:AUTO`` radius for long terms
    (/root/reference/services/search/app/main.py:90-99).

    FastSS completeness (Bocek et al. 2007): ed(a, b) <= 2 implies
    the 2-deletion neighborhoods intersect — each edit consumes at
    most one deletion per side (substitution: delete the position on
    both sides; insertion/deletion: delete the inserted character on
    the longer side).

    The VARIANT-GAP coordinates each key carries make the candidate
    math exact WITHOUT a verify DP: a join row witnesses an edit
    script of length ``bound = n_a + n_b - overlap`` (matched gaps on
    both sides cancel a delete+insert into one substitution; multiset
    overlap over the <=2-element gap sets). Every witness's bound is
    a VALID script length, so bound >= ed; an optimal script's
    canonical witness (delete each edit's characters) has
    bound == ed (a del and an ins at the same gap in an optimal
    script would contradict optimality); hence
    ``min(bound) over witnesses == ed`` exactly — pinned by the
    randomized brute-force pytest. The plan filters ``bound <= 2``
    BEFORE the pair shuffle (measured at sf0.1: 31.7M joined rows,
    ~4M survive) and computes dist as the grouped min — integer
    compares in codegen, no levenshtein, and names re-attach by id
    join at the end so the candidate stream stays skinny.

    Never all-pairs: key blow-up is 1 + L + C(L,2) per row
    (quadratic in the SHORT string length, linear in N), buckets
    shuffle on the key string — the same df/skew profile as LSH
    bands; AQE splits hot buckets."""
    from ..sources.tables import scan_parallel

    base = df.select(id_col, s_col)
    # pin the join's partitioning explicitly: the 1 -> 1+L+C(L,2) key
    # explode means shuffle BYTES wildly underestimate join CPU, so
    # AQE's byte-sized coalesce would funnel the 30M-row candidate
    # generation through a handful of tasks (measured: 12.0 -> 5.5 s
    # at sf0.1 by pinning). Hash-partitioning both sides on the key
    # also co-locates the self-join — one exchange, reused twice.
    # scan_parallel spreads the explode itself (it runs BELOW the key
    # repartition, in the scan tasks); the name re-attach sides read
    # ``base`` raw so their broadcast builds stay exchange-free.
    par = df.sparkSession.sparkContext.defaultParallelism
    keyed = (
        deletion_keys_tau2(scan_parallel(base), s_col)
        .drop(s_col)
        .repartition(par, "_dkey")
    )
    a = keyed.select(
        F.col(id_col).alias("id_a"),
        "_dkey",
        F.col("_g1").alias("_a1"),
        F.col("_g2").alias("_a2"),
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"),
        F.col("_dkey").alias("_dkey"),
        F.col("_g1").alias("_b1"),
        F.col("_g2").alias("_b2"),
    )
    a1, a2 = F.col("_a1"), F.col("_a2")
    b1, b2 = F.col("_b1"), F.col("_b2")
    n_a = (a1 > 0).cast("int") + (a2 > 0).cast("int")
    n_b = (b1 > 0).cast("int") + (b2 > 0).cast("int")
    eq11 = (a1 == b1) & (a1 > 0)
    eq12 = (a1 == b2) & (a1 > 0)
    eq21 = (a2 == b1) & (a2 > 0)
    eq22 = (a2 == b2) & (a2 > 0)
    overlap = (
        F.when((eq11 & eq22) | (eq12 & eq21), F.lit(2))
        .when(eq11 | eq12 | eq21 | eq22, F.lit(1))
        .otherwise(F.lit(0))
    )
    bound = n_a + n_b - overlap
    pairs = (
        a.join(b, "_dkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", bound.alias("_bound"))
        .filter(F.col("_bound") <= 2)
        .groupBy("id_a", "id_b")
        .agg(F.min("_bound").cast("int").alias("dist"))
    )
    names_a = base.select(
        F.col(id_col).alias("id_a"), F.col(s_col).alias("name_a")
    )
    names_b = base.select(
        F.col(id_col).alias("id_b"), F.col(s_col).alias("name_b")
    )
    return pairs.join(names_a, "id_a").join(names_b, "id_b").select(
        "id_a", "id_b", "name_a", "name_b", "dist"
    )


# ----------------------------------------------------------- streaming

def _batch_dir(store: str, batch_id: int) -> str:
    import os

    return os.path.join(store, f"b{batch_id}")


def _read_prior(spark, store: str, batch_id: int):
    """Accumulated key store excluding the current batch's own subdir
    (at-least-once replay safety — same commit discipline as
    dedup_streaming._read_prior)."""
    import os

    if not os.path.isdir(store):
        return None
    parts = [
        os.path.join(store, d)
        for d in os.listdir(store)
        if d.startswith("b") and d != f"b{batch_id}"
    ]
    if not parts:
        return None
    return spark.read.parquet(*parts)


def process_linkage_batch(
    batch: DataFrame,
    *,
    batch_id: int,
    id_col: str,
    s_col: str,
    key_store: str,
    pairs_store: str,
) -> None:
    """Incremental entity-linkage step: the batch's records match
    against everything seen so far (accumulated deletion-key store ∪
    the batch itself), never the full corpus. Every ed<=1 pair is
    examined exactly when its later record arrives, so the drained
    pairs store equals the batch `edit_distance_pairs` output — the
    driver oracle for `fuzzy_name_matches_streamed`."""
    from ..operators.upsert import upsert_parquet

    spark = batch.sparkSession
    keyed_new = deletion_keys(batch.select(id_col, s_col), s_col).select(
        F.col(id_col).alias("id"), F.col(s_col).alias("name"), "_dkey"
    )
    prior = _read_prior(spark, key_store, batch_id)
    keyed_all = (
        keyed_new if prior is None else prior.unionByName(keyed_new)
    )
    a = keyed_all.select(
        F.col("id").alias("id_x"), F.col("name").alias("name_x"), "_dkey"
    )
    b = keyed_new.select(
        F.col("id").alias("id_y"), F.col("name").alias("name_y"), "_dkey"
    )
    ordered = F.when(
        F.col("id_x") < F.col("id_y"),
        F.struct(
            F.col("id_x").alias("id_a"),
            F.col("id_y").alias("id_b"),
            F.col("name_x").alias("name_a"),
            F.col("name_y").alias("name_b"),
        ),
    ).otherwise(
        F.struct(
            F.col("id_y").alias("id_a"),
            F.col("id_x").alias("id_b"),
            F.col("name_y").alias("name_a"),
            F.col("name_x").alias("name_b"),
        )
    )
    cand = (
        a.join(b, "_dkey")
        .filter(F.col("id_x") != F.col("id_y"))
        .withColumn("dist", F.levenshtein("name_x", "name_y").cast("int"))
        .filter(F.col("dist") <= 1)  # verify-then-dedupe (see above)
        .select(ordered.alias("p"), "dist")
        .select("p.*", "dist")
        .distinct()
    )
    verified = cand
    upsert_parquet(
        spark, pairs_store, verified, ["id_a", "id_b"], ["dist"]
    )
    keyed_new.write.mode("overwrite").parquet(
        _batch_dir(key_store, batch_id)
    )
