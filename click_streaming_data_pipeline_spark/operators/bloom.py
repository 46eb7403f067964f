"""Bloom-filter semi-join prefilter (beyond-reference scale pattern).

The scenario: a fact table must be semi-joined against a key set that
is too large to broadcast as rows but whose BLOOM FILTER fits in a few
hundred KB. Shipping the filter to every fact partition prunes most
non-matching rows BEFORE the shuffle; the exact semi-join afterwards
removes the false positives, so the composition is exactly the
semi-join (a Bloom filter has no false negatives). This is the manual
form of what Spark's InjectRuntimeFilter rule does when
``spark.sql.optimizer.runtime.bloomFilter.enabled`` applies — exposed
as an operator so plans can use it deliberately (e.g. across stages
the optimizer can't see through, or on a pre-computed key set).

Implementation is pure DataFrame + expression (``bloom_filter_agg`` is
not in the public function registry): positions come from
Kirsch-Mitzenmacher double hashing over ``xxhash64``, the bitmap is
OR-folded into ``m_bits/64`` longs by a tiny groupBy, collected
(bounded: 256 KiB of longs for m=2^21 — the same k-row-collect
convention as ivf.py's centroids), and membership is a literal-array
bit test that runs inside whole-stage codegen on the fact scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash functions; with m/n ≈ 10 bits/key this gives ~1% fpp.
N_HASHES = 5


def _positions(key: Column, m_bits: int, n_hashes: int) -> list[Column]:
    """Kirsch-Mitzenmacher: h_i = (h1 + i*h2) mod m — two xxhash64
    evaluations give all n positions (standard, provably preserves
    the fpp bound)."""
    # reduce both hashes mod m BEFORE combining: i*h2 on the raw
    # 64-bit hash overflows long (ANSI mode raises); mod-m first keeps
    # every intermediate ≤ n_hashes*m without changing the positions.
    h1 = F.pmod(F.xxhash64(key), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), F.lit(m_bits))
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(n_hashes)
    ]


def build_bloom(
    keys: DataFrame,
    key: str,
    *,
    m_bits: int,
    n_hashes: int = N_HASHES,
) -> list[int]:
    """OR-fold the key set's bit positions into a list of
    ``m_bits/64`` longs. The groupBy key space is word indices
    (m/64 rows), so the aggregate is tiny regardless of key count."""
    n_words = (m_bits + 63) // 64
    pos = F.explode(
        F.array(*_positions(F.col(key), m_bits, n_hashes))
    ).alias("p")
    words = (
        keys.select(pos)
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("p") % 64).cast("int"),
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def might_contain(
    key: Column,
    bitmap: list[int],
    *,
    m_bits: int,
    n_hashes: int = N_HASHES,
) -> Column:
    """True iff every hash position's bit is set — an expression over
    a literal long array, codegen'd into the scan stage (no join, no
    shuffle, no Python)."""
    lit = F.lit(bitmap)
    cond = F.lit(True)
    for p in _positions(key, m_bits, n_hashes):
        word = F.get(lit, (p / 64).cast("int"))
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    key: str,
    *,
    bits_per_key: int = 10,
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """EXACT semi-join of ``fact`` against ``keys`` with a Bloom
    prefilter: prune fact rows at the scan, then the real semi-join
    (which only sees the survivors) removes false positives. m is
    sized from the key count at ``bits_per_key`` bits (~1% fpp at
    10); both driver actions (count, bitmap) are bounded-size."""
    distinct_keys = keys.select(key).distinct()
    n_keys = distinct_keys.count()
    m_bits = max(64, n_keys * bits_per_key)
    bitmap = build_bloom(
        distinct_keys, key, m_bits=m_bits, n_hashes=n_hashes
    )
    pre = fact.filter(
        might_contain(
            F.col(key), bitmap, m_bits=m_bits, n_hashes=n_hashes
        )
    )
    return pre.join(distinct_keys, key, "left_semi")
