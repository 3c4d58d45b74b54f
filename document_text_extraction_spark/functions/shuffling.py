"""Deterministic global shuffle into training shards.

The data-ordering step every LLM pretraining pipeline runs last:
examples must reach the trainer in pseudo-random order, yet a re-run
(or a resumed writer) must produce byte-identical shards. Randomness
therefore comes from a keyed hash, never an RNG — the same md5-hex
technique as ``sampling.hash_bucket_col`` (a different seed
decorrelates the shuffle from every sampling/split decision).

Scale shape: shard assignment is a pure projection; the ONLY shuffle
is ``repartition(n_shards, shard)`` and the in-shard order comes from
``sortWithinPartitions`` — an external (spilling) sort, never a
single-task global window. 100 TB / 10k shards = 10 GB per sort task,
the standard shard-writer layout. Because the shard id is the TOP hex
digits of the same md5 sort key, traversing shards 0..n-1 each in key
order replays exactly ONE global md5 sort — a reader that concatenates
shards in order sees the full global permutation.

Exercised by the ``train_shuffle_shards`` registry query, which
derives in-shard positions with a window at test scale so DuckDB can
replay the permutation byte-for-byte; production writers never
materialize positions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shuffle_key_col(key: Column, seed: str = "") -> Column:
    """Deterministic pseudo-random sort key: md5 hex of
    ``seed || key``."""
    return F.md5(F.encode(F.concat(F.lit(seed), key.cast("string")),
                          "UTF-8"))


def shuffle_shards(df: DataFrame, key_col: str, n_shards: int,
                   seed: str = "") -> DataFrame:
    """Assign every row a ``shard`` and lay rows out in deterministic
    pseudo-random order (see module docstring). Adds ``shuffle_key``
    and ``shard`` columns; rows arrive repartitioned by shard and
    sorted by (shuffle_key, key) within it, ready for a shard writer.

    The shard id RANGE-partitions the top 8 hex digits of the md5 key
    (``v * n_shards div 2^32``) — uniform because md5 is, and shard i
    holds exactly the i-th contiguous slice of the key space, which is
    what makes shard-major traversal equal the global key order (a
    ``mod`` shard would interleave slices and break that property).
    The multiply stays < 2^53, exact in the double division both
    engines perform.
    """
    k = shuffle_key_col(F.col(key_col), seed)
    v = F.conv(F.substring(k, 1, 8), 16, 10).cast("long")
    shard = ((v * F.lit(n_shards)) / F.lit(2 ** 32)).cast("int")
    return (df.withColumn("shuffle_key", k)
            .withColumn("shard", shard)
            .repartition(n_shards, F.col("shard"))
            .sortWithinPartitions("shuffle_key", key_col))
