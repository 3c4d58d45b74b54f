"""Z-order (Morton) data-layout keys for multi-column locality.

The lakehouse layout problem: a table bucketed/sorted on ONE column
prunes scans on that column only; queries filtering BOTH host and time
(the two crawl-table access paths — "this host's pages" and "this
week's captures") need a clustering key that keeps rows close in both
dimensions. The standard answer (Delta/Iceberg ``OPTIMIZE ZORDER BY``)
is the Morton code: interleave the bits of the two dimensions, sort by
the result, and any contiguous z-range touches a bounded rectangle of
(host, time) space — so file-level min/max stats stay tight on BOTH
columns and either predicate prunes.

Everything here is a pure JVM integer expression (bit shifts + adds of
disjoint bits) — no UDF, no shuffle; the write-side clustering is one
``repartitionByRange`` + in-partition sort, exactly the shape of the
engine's training-shard shuffle (``fn/shuffling.shuffle_shards``).

Reference analogue: none (single-machine folder walks); this is the
storage-layout layer under the snapshot/compaction family
(``pipeline.prepare_bucketed_input``, ``compact_small_files``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 21  # per dimension; 2*21 = 42 result bits stay long-safe


def zorder_key_col(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: bit i of ``a`` lands at 2i, bit i of ``b`` at
    2i+1. Values are masked to ``bits`` first (callers range-reduce —
    e.g. ``pmod(xxhash64(host), 2^21)`` and a day number). The sum of
    disjoint single-bit terms compiles to one codegen expression."""
    mask = (1 << bits) - 1
    am, bm = a.bitwiseAND(F.lit(mask)), b.bitwiseAND(F.lit(mask))
    out: Column = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(
            F.shiftrightunsigned(am, i).bitwiseAND(F.lit(1)), 2 * i)
        out = out + F.shiftleft(
            F.shiftrightunsigned(bm, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return out


# DuckDB mirror over column expressions {a} / {b} — generated from the
# SAME (bits, bit-placement) scheme so the engines cannot drift
def zorder_key_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    mask = (1 << bits) - 1
    # NB: SQL `+` binds tighter than `<<` — every shift term is fully
    # parenthesized or the adder corrupts the shift amounts
    return (
        "list_sum(list_transform(range(0, %d), i -> "
        "(((((%s) & %d) >> i) & 1)::BIGINT << (2 * i)) "
        "+ (((((%s) & %d) >> i) & 1)::BIGINT << (2 * i + 1))))"
        % (bits, a, mask, b, mask)
    )


def cluster_by_zorder(df: DataFrame, zval: Column,
                      n_files: int = 64) -> DataFrame:
    """Layout pass before a write: range-partition on the z-value and
    sort within partitions, so each output file holds one contiguous
    z-range and its parquet min/max stats are tight on BOTH interleaved
    dimensions. One range shuffle — the OPTIMIZE ZORDER shape."""
    return (df.withColumn("__z", zval)
            .repartitionByRange(n_files, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z"))
