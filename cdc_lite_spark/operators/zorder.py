"""Z-order (Morton) data layout for multi-dimensional data skipping.

The 100 TB pattern: parquet min/max pruning only helps on the sort column.
Sorting by a Z-order curve key interleaves the bits of several columns, so
ONE range-partitioned layout gives locality on ALL of them — a filter on
any participating dimension prunes most files.  (Delta/Iceberg expose this
as ``OPTIMIZE ZORDER BY``; here it is a plain column expression + a
``repartitionByRange``, so it works on any DataFrame.)  The reference has
no layout machinery at all — this is [EXT] scale machinery (SURVEY.md §2f).

The curve key is pure bit arithmetic (shift/mask/or, all literal shift
amounts), stays inside whole-stage codegen, and is reproducible verbatim
in DuckDB SQL — :func:`zorder_key_sql` emits the twin expression, so the
key itself is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default bits per dimension — 2 dims * 16 bits = 32-bit key, well clear
#: of the 63-bit signed-long ceiling
DEFAULT_BITS = 16


def zorder_key(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave the low ``bits`` bits of each column into one
    BIGINT.  Dimension j's bit i lands at position ``i*n + j``, so the
    curve alternates dimensions at every bit level (the classic Z curve).

    Inputs are clamped to ``[0, 2^bits)`` via a non-negative modulus —
    callers should pre-scale real values (epoch days, bucketed doubles)
    into that range for meaningful locality.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds a signed long")
    key: Column | None = None
    for j, c in enumerate(cols):
        x = F.pmod(c.cast("long"), F.lit(1 << bits))
        for i in range(bits):
            bit = F.shiftleft(
                F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1).cast("long")),
                i * n + j,
            )
            key = bit if key is None else key.bitwiseOR(bit)
    assert key is not None
    return key


def zorder_key_sql(exprs: list[str], bits: int = DEFAULT_BITS) -> str:
    """DuckDB SQL twin of :func:`zorder_key` over the given column
    expressions — bit-identical by construction."""
    n = len(exprs)
    m = 1 << bits
    terms = []
    for j, e in enumerate(exprs):
        x = f"(((CAST({e} AS BIGINT) % {m}) + {m}) % {m})"
        for i in range(bits):
            terms.append(f"((({x} >> {i}) & 1) << {i * n + j})")
    return "(" + " | ".join(terms) + ")"


def zorder_repartition(
    df: DataFrame,
    cols: list[Column],
    num_partitions: int,
    bits: int = DEFAULT_BITS,
    key_col: str = "__zorder",
) -> DataFrame:
    """Range-partition + sort ``df`` along the Z curve so every output
    file covers a tight hyper-rectangle of the participating dimensions.

    ``repartitionByRange`` samples the key distribution (one pass), so
    partitions are balanced even when the dimensions are skewed.  Write
    the result with ``partitionBy``-free parquet and min/max footer stats
    do the pruning.
    """
    keyed = df.withColumn(key_col, zorder_key(cols, bits))
    return keyed.repartitionByRange(num_partitions, key_col).sortWithinPartitions(
        key_col
    )
