"""Differentially-private release operators (beyond-reference
extension, privacy family next to the k-anonymity / l-diversity audits
and ``forget_users``): contribution-bounded counts and sums with
seeded Laplace noise.

A corpus release at 100 TB pairs the *audit* queries (k-anonymity,
l-diversity) with *mechanisms* that make the released statistics safe:
the classic Laplace mechanism over user-level-bounded aggregates
(Dwork et al. 2006). Two properties matter for a distributed engine:

- **Contribution bounding is a pre-aggregation**, not a row filter:
  user-level sensitivity requires capping what any one user adds
  BEFORE the global aggregate, i.e. a per-(user, key) partial
  aggregate, a clamp, then the key-level aggregate. Both stages are
  partial-agg shuffles on their keys — the plan a 1000-executor
  cluster wants (no window over the full corpus, no collect).
- **The noise must be deterministic for the correctness gate** but
  keep the Laplace shape: it is seeded from md5 of the group key
  (engine-portable, reshard-stable — adding executors cannot change
  a released number), folded to a 32-bit integer, mapped through the
  exact inverse CDF. A production deployment swaps the seed column
  for a secure RNG; the dataflow is unchanged.

IEEE notes (the oracle is bit-exact): the hex fold and the uniform
``(v + 0.5) / 2^32`` are exact in binary64 (power-of-two divisor);
``u - 0.5`` and ``1 - 2|u - 0.5|`` are exact by construction (the
numerators stay below 2^33); ``ln`` is libm on both engines (the
search-idf precedent) and the result is rounded to 9 dp on both sides
so a last-ulp libm divergence cannot reach the value hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = "0123456789abcdef"

#: decimal places the noise is rounded to on both engines (belt over
#: the ln libm parity; 1e-9 is far below any analytic use of the noise)
NOISE_DECIMALS = 9


def hex_uniform(key: Column, label: str) -> Column:
    """Deterministic uniform in (0,1): fold the first 8 md5 hex chars
    of ``label || key`` to a 32-bit integer v, return (v + 0.5)/2^32.

    The +0.5 keeps the value strictly inside (0,1) so the Laplace
    inverse CDF below never hits ln(0). Exact in binary64.
    """
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit(label), key)), 1, 8), 16, 10
    ).cast("long")
    return (v.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)


def hex_uniform_sql(key_sql: str, label: str) -> str:
    """DuckDB twin of :func:`hex_uniform` (DuckDB has no hex->int
    cast, so the 8 hex digits are folded positionally)."""
    h = f"md5('{label}' || {key_sql})"
    fold = " + ".join(
        f"(strpos('{_HEX_DIGITS}', substr({h}, {i}, 1)) - 1) "
        f"* {16 ** (8 - i)}"
        for i in range(1, 9)
    )
    return f"((CAST({fold} AS BIGINT) + 0.5) / 4294967296.0)"


def laplace_noise(key: Column, label: str, scale: float) -> Column:
    """Seeded Laplace(0, scale) noise via the inverse CDF
    ``-scale * sign(u - 1/2) * ln(1 - 2|u - 1/2|)``, rounded to
    :data:`NOISE_DECIMALS` dp."""
    w = hex_uniform(key, label) - F.lit(0.5)
    raw = (
        F.lit(-float(scale))
        * F.signum(w)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(w))
    )
    return F.round(raw, NOISE_DECIMALS)


def laplace_noise_sql(key_sql: str, label: str, scale: float) -> str:
    """DuckDB twin of :func:`laplace_noise`."""
    u = hex_uniform_sql(key_sql, label)
    w = f"({u} - 0.5)"
    return (
        f"round({-float(scale)!r} * sign({w}) "
        f"* ln(1.0 - 2.0 * abs({w})), {NOISE_DECIMALS})"
    )


def dp_noisy_counts(
    df: DataFrame,
    *,
    key_col: str,
    user_col: str,
    epsilon: float = 1.0,
    max_per_user: int = 8,
    max_keys_per_user: int | None = None,
    label: str = "dp-count",
) -> DataFrame:
    """(ε, 0)-DP histogram of ``key_col`` with contribution bounding.

    Stage 1 caps each user's contribution to each key at
    ``max_per_user``. With ``max_keys_per_user=L`` set, stage 1.5 also
    keeps only each user's top-L keys (by count, key-ascending
    tie-break — a function of that user's own data, so the selection
    spends no extra privacy): the user's total L1 contribution is then
    bounded by ``L * max_per_user``, which is the noise scale the
    key-level Laplace uses — genuine USER-level DP. Without the L cap
    a user appearing under many keys has unbounded histogram-wide
    sensitivity, so the guarantee is only per-(user, key) —
    event-level-style. Output: (key, true_count, clamped_count,
    noisy_count) — true_count (uncapped) rides along so the released
    error is auditable in tests; a production release would drop it.

    100 TB: two partial-agg shuffles, first on (user, key) then on
    key, plus (L set) one window over the already-aggregated
    (user x key) frame. No corpus-wide windows, no collect.
    """
    per_user = df.groupBy(user_col, key_col).agg(
        F.count("*").alias("__n")
    )
    return release_noisy_counts(
        per_user,
        key_col=key_col,
        count_col="__n",
        user_col=user_col,
        epsilon=epsilon,
        max_per_user=max_per_user,
        max_keys_per_user=max_keys_per_user,
        label=label,
    )


def _keep_top_keys(
    per_user: DataFrame, user_col: str, key_col: str, rank_col, limit: int
):
    """Per-user top-``limit`` keys marker (rank desc, key asc): the
    keys-per-user bound that turns per-(user,key) clamping into a
    user-level L1 bound. Returns the frame with a ``__kept`` flag so
    audit columns can still aggregate the uncapped rows."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(rank_col).desc(), F.col(key_col).asc()
    )
    return per_user.withColumn(
        "__kept", F.row_number().over(w) <= limit
    )


def release_noisy_counts(
    per_user: DataFrame,
    *,
    key_col: str,
    count_col: str = "__n",
    user_col: str | None = None,
    epsilon: float = 1.0,
    max_per_user: int = 8,
    max_keys_per_user: int | None = None,
    label: str = "dp-count",
) -> DataFrame:
    """Release stage of :func:`dp_noisy_counts`, split out so the
    streaming twin can fold the per-(user, key) counts incrementally
    (a mergeable sum — state is bounded by the user x key domain,
    which user-level DP needs to track by definition) and run the
    key cap + clamp + noise only at release time (capping or clamping
    mid-stream would double-count a user who spans micro-batches)."""
    if max_keys_per_user is not None:
        if user_col is None:
            raise ValueError("max_keys_per_user requires user_col")
        per_user = _keep_top_keys(
            per_user, user_col, key_col, count_col, max_keys_per_user
        )
        kept = F.col("__kept")
        scale = max_keys_per_user * max_per_user / float(epsilon)
    else:
        kept = F.lit(True)
        scale = max_per_user / float(epsilon)
    clamped = F.when(
        kept, F.least(F.col(count_col), F.lit(max_per_user))
    ).otherwise(F.lit(0))
    return (
        per_user.groupBy(key_col)
        .agg(
            F.sum(count_col).cast("long").alias("true_count"),
            F.sum(clamped).cast("long").alias("clamped_count"),
        )
        .select(
            F.col(key_col),
            "true_count",
            "clamped_count",
            (
                F.col("clamped_count").cast("double")
                + laplace_noise(F.col(key_col), label, scale)
            ).alias("noisy_count"),
        )
    )


def dp_noisy_sum(
    df: DataFrame,
    *,
    key_col: str,
    user_col: str,
    value_col: str,
    lo: float,
    hi: float,
    epsilon: float = 1.0,
    max_keys_per_user: int | None = None,
    label: str = "dp-sum",
) -> DataFrame:
    """(ε, 0)-DP sum of ``value_col`` per key with contribution
    bounding.

    Each user's total contribution to a key is clamped into [lo, hi]
    (per-key sensitivity = max(|lo|, hi)); clamping sums (not rows) is
    the per-key bound: a user with many small rows is capped the same
    as one large row. With ``max_keys_per_user=L`` set, only each
    user's top-L keys (by clamped total, key-ascending tie-break) are
    released and the Laplace scale becomes ``L * max(|lo|, hi) / ε`` —
    genuine USER-level DP; without it the guarantee is per-(user, key).

    The clamped per-user totals accumulate in decimal(28,6) so both
    engines sum bit-identically (the catalog's dsum rule); the noise
    addition happens in double at the very end.
    """
    per_user = df.groupBy(user_col, key_col).agg(
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("__s")
    )
    return release_noisy_sums(
        per_user,
        key_col=key_col,
        sum_col="__s",
        user_col=user_col,
        lo=lo,
        hi=hi,
        epsilon=epsilon,
        max_keys_per_user=max_keys_per_user,
        label=label,
    )


def release_noisy_sums(
    per_user: DataFrame,
    *,
    key_col: str,
    sum_col: str = "__s",
    user_col: str | None = None,
    lo: float,
    hi: float,
    epsilon: float = 1.0,
    max_keys_per_user: int | None = None,
    label: str = "dp-sum",
) -> DataFrame:
    """Release stage of :func:`dp_noisy_sum` over a per-(user, key)
    decimal-sum frame — split out so the streaming twin can fold the
    per-user totals incrementally (decimal sums merge exactly) and
    key-cap + clamp + noise only at release."""
    sensitivity = max(abs(float(lo)), abs(float(hi)))
    if max_keys_per_user is not None:
        if user_col is None:
            raise ValueError("max_keys_per_user requires user_col")
        scale = max_keys_per_user * sensitivity / float(epsilon)
    else:
        scale = sensitivity / float(epsilon)
    # bounds pinned to the accumulator's own type, decimal(38,6):
    # DuckDB's least/greatest promote MIXED decimal widths to DOUBLE
    # (measured), which would leak float rounding into the clamp
    clamped = per_user.select(
        F.col(key_col),
        *([user_col] if max_keys_per_user is not None else []),
        F.least(
            F.greatest(F.col(sum_col), F.lit(lo).cast("decimal(38,6)")),
            F.lit(hi).cast("decimal(38,6)"),
        ).alias("__c"),
    )
    if max_keys_per_user is not None:
        # zero out (don't drop) un-kept contributions so the released
        # key domain matches release_noisy_counts' — a key nobody
        # keeps still gets its zero+noise row, and joining the count
        # and sum releases on key never loses rows
        clamped = _keep_top_keys(
            clamped, user_col, key_col, "__c", max_keys_per_user
        ).select(
            key_col,
            F.when(F.col("__kept"), F.col("__c"))
            .otherwise(F.lit(0).cast("decimal(38,6)"))
            .alias("__c"),
        )
    return (
        clamped.groupBy(key_col)
        .agg(F.sum("__c").cast("double").alias("clamped_sum"))
        .select(
            F.col(key_col),
            "clamped_sum",
            (
                F.col("clamped_sum")
                + laplace_noise(F.col(key_col), label, scale)
            ).alias("noisy_sum"),
        )
    )


def gumbel_noise(key: Column, label: str) -> Column:
    """Seeded standard Gumbel noise ``-ln(-ln(u))``, rounded to
    :data:`NOISE_DECIMALS` dp. Gumbel-max over utility scores IS the
    exponential mechanism: argmax(score/b + Gumbel) samples
    P(i) ∝ exp(score_i / b)."""
    u = hex_uniform(key, label)
    return F.round(-F.log(-F.log(u)), NOISE_DECIMALS)


def gumbel_noise_sql(key_sql: str, label: str) -> str:
    """DuckDB twin of :func:`gumbel_noise`."""
    u = hex_uniform_sql(key_sql, label)
    return f"round(-ln(-ln({u})), {NOISE_DECIMALS})"


def dp_median_bin(
    df: DataFrame,
    *,
    value_col: str,
    bin_width: float,
    n_bins: int,
    epsilon: float = 1.0,
    label: str = "dp-median",
) -> DataFrame:
    """(ε, 0)-DP median via the EXPONENTIAL MECHANISM (McSherry &
    Talwar 2007) over a fixed bin domain — the second mechanism
    family next to the Laplace releases: selection queries (which
    bin holds the median?) get utility scoring + Gumbel-max sampling
    instead of additive noise.

    Utility u(b) = -|2·cum_le(b) - n| (twice the rank distance of
    bin b's upper edge from the median rank; integer-exact). One
    event moves cum_le by ≤1 and n by 1, so Δu ≤ 3 (event-level DP;
    a user-level variant would pre-aggregate per user like
    :func:`dp_noisy_counts`). The mechanism samples
    P(b) ∝ exp(ε·u(b)/(2Δu)); deterministically seeded Gumbel-max
    realizes the draw: argmax(ε·u/(2Δu) + Gumbel_b), ties to the
    lower bin.

    Plan: one partial-agg groupBy(bin) reduces the corpus to ≤n_bins
    rows; the bin spine (range join), cumulative sum, and argmax all
    run on that bounded frame — at 100 TB the corpus contributes one
    aggregation pass, everything after is O(n_bins).

    Output (1 row): n, dp_bin, dp_lo, dp_mid, true_bin — the true
    median bin rides along for error audits exactly like
    ``true_count`` in the count release.
    """
    counts = bin_counts(
        df, value_col=value_col, bin_width=bin_width, n_bins=n_bins
    )
    return release_median_bin(
        counts,
        bin_width=bin_width,
        n_bins=n_bins,
        epsilon=epsilon,
        label=label,
    )


def bin_counts(
    df: DataFrame,
    *,
    value_col: str,
    bin_width: float,
    n_bins: int,
) -> DataFrame:
    """The corpus-touching stage of :func:`dp_median_bin`: one
    partial-agg histogram over the fixed bin domain. Mergeable (sum
    per bin), so the streaming twin folds it incrementally. Both ends
    clamp into [0, n_bins-1]: without the lower clamp a negative value
    would land in a negative bin that the release's 0..n_bins-1 spine
    join silently drops, excluding it from n and shifting the median."""
    b = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.floor(F.col(value_col) / F.lit(float(bin_width))),
            F.lit(n_bins - 1),
        ),
    ).cast("long")
    return (
        df.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def release_median_bin(
    counts: DataFrame,
    *,
    bin_width: float,
    n_bins: int,
    epsilon: float = 1.0,
    label: str = "dp-median",
) -> DataFrame:
    """Release stage of :func:`dp_median_bin` over a (bin, cnt)
    frame: spine join, cumulative rank utility, seeded Gumbel-max —
    everything O(n_bins)."""
    from pyspark.sql.window import Window

    scale = float(epsilon) / 6.0  # eps / (2 * delta_u), delta_u = 3
    spark = counts.sparkSession
    spine = spark.range(n_bins).select(F.col("id").alias("bin"))
    binned = spine.join(counts, "bin", "left").select(
        "bin", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scored = binned.select(
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    ).select(
        "bin",
        "cum",
        "n",
        (
            (-F.abs(F.lit(2) * F.col("cum") - F.col("n"))).cast("double")
            * F.lit(scale)
            + gumbel_noise(F.col("bin").cast("string"), label)
        ).alias("phi"),
    )
    sel = Window.orderBy(F.col("phi").desc(), F.col("bin").asc())
    return (
        scored.select(
            "bin",
            "cum",
            "n",
            "phi",
            F.row_number().over(sel).alias("__rn"),
            F.min(
                F.when(
                    F.lit(2) * F.col("cum") >= F.col("n"), F.col("bin")
                )
            )
            .over(wall)
            .alias("true_bin"),
        )
        .filter(F.col("__rn") == 1)
        .select(
            F.col("n"),
            F.col("bin").alias("dp_bin"),
            (F.col("bin").cast("double") * F.lit(float(bin_width))).alias(
                "dp_lo"
            ),
            (
                F.col("bin").cast("double") * F.lit(float(bin_width))
                + F.lit(float(bin_width) / 2.0)
            ).alias("dp_mid"),
            F.col("true_bin"),
        )
    )
