"""Portable bloom-filter join pre-filtering.

The 100 TB pattern: before shuffling a huge fact table into a join, prune
rows whose key cannot possibly match — a bloom filter built from the small
side eliminates the bulk of the shuffle for selective joins.  Spark's
built-in runtime bloom join does this only when the optimizer elects to;
this operator makes the pattern explicit and deterministic (the reference
has no joins at all, so this is [EXT] scale machinery — SURVEY.md §2f).

Construction is pure column expressions end-to-end:

- build: k positions per key from the seeded xxhash64 family (JVM-side,
  codegen — the positions never surface in any result, so no portable-md5
  parity tax), folded into an m-bit array represented as ``m/64`` longs
  via a bit_or aggregation — one tiny shuffle of at most ``m/64`` partial
  rows;
- probe: the 1-row word array broadcasts; membership is ``k`` shift/mask
  expressions inside whole-stage codegen — no UDF, no Python.

Bloom filters have NO false negatives, so
``bloom_prefilter_join(big, small, key)`` returns exactly
``big ⋈ small`` — false positives survive the pre-filter but die in the
exact join.  That identity is the oracle for the registered query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default filter geometry: 2^16 bits / 4 hashes ≈ 1% FP at ~6.5 k keys
DEFAULT_M_BITS = 1 << 16
DEFAULT_K_HASHES = 4


def _positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    # seeded via an extra hashed literal; pmod because xxhash64 is signed
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits)) for i in range(k_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """One-row DataFrame ``[words: map<int,bigint>]`` — the set bits of the
    filter, keyed by word index (absent word = 0).  A map rather than a
    dense array keeps the row proportional to the bits actually set."""
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k_hashes)))
    words = (
        keys.select(pos.alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("word", "bits")))
        ).alias("words")
    )


def might_contain(
    key: Column, m_bits: int = DEFAULT_M_BITS, k_hashes: int = DEFAULT_K_HASHES
) -> Column:
    """Membership predicate against the broadcast ``words`` column (all k
    bits set).  False ⇒ definitely absent; True ⇒ probably present."""
    conds = None
    for p in _positions(key, m_bits, k_hashes):
        word = F.coalesce(
            F.col("words")[(p / 64).cast("int")], F.lit(0).cast("long")
        )
        mask_hit = _bit_is_set(word, p % 64)
        conds = mask_hit if conds is None else (conds & mask_hit)
    return conds


def _bit_is_set(word: Column, bit: Column) -> Column:
    """``(word >>> bit) & 1 == 1`` — shift the *word* by the column-valued
    bit index (a mask ladder ``1 << bit`` nests CASE WHENs exponentially
    and blows the 64 KB codegen method limit)."""
    # the Python wrapper accepts only a literal int shift; the SQL builtin
    # takes two expressions
    shifted = F.call_function("shiftrightunsigned", word, bit.cast("int"))
    return shifted.bitwiseAND(F.lit(1)) != 0


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    key_big: str,
    key_small: str,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """``big ⋈ small`` with a bloom pre-filter on the big side.

    Result is IDENTICAL to the plain inner join (no false negatives; false
    positives are removed by the exact join) — at scale the filter runs
    scan-side BEFORE the shuffle, so the exchange carries only probable
    matches."""
    bloom = bloom_build(small, key_small, m_bits, k_hashes)
    pruned = big.crossJoin(F.broadcast(bloom)).filter(
        might_contain(F.col(key_big), m_bits, k_hashes)
    ).drop("words")
    return pruned.join(small, pruned[key_big] == small[key_small])
