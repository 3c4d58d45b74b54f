"""SURT keys and the deterministic training shuffle: Spark vs the
adjacent DuckDB mirrors, plus the structural guarantees each module
documents (range-sharding = global order; determinism under
repartitioning)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from document_text_extraction_spark.functions.shuffling import (
    shuffle_key_col,
    shuffle_shards,
)
from document_text_extraction_spark.functions.surt import (
    SURT_KEY_SQL,
    surt_key_col,
)

URLS = [
    "https://www.Example.org:443/a/b?z=1&a=2",
    "https://u:p@site02.example.org:8080/Src2/342/",
    "http://example.com",
    "https://www3.blog.example.co.uk/x#frag",
    "http://host.test/p?b=2&a=1&a=0",
    "https://example.org/",
]


def test_surt_matches_duckdb_mirror(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "u string")
    got = [r[0] for r in df.select(surt_key_col(F.col("u"))).collect()]
    con = duckdb.connect()
    exp = [con.execute(f"SELECT {SURT_KEY_SQL} FROM (SELECT ? AS u)",
                       [u]).fetchone()[0] for u in URLS]
    assert got == exp


def test_surt_shape(spark):
    df = spark.createDataFrame(
        [("https://www.Example.org:443/a/b?z=1&a=2",)], "u string")
    assert df.select(surt_key_col(F.col("u"))).first()[0] == \
        "org,example)/a/b?a=2&z=1"


def test_surt_groups_subdomains_contiguously(spark):
    # the point of SURT: all *.example.org keys share one prefix range
    urls = ["https://a.example.org/1", "https://z.example.org/2",
            "https://b.other.net/3", "https://example.org/4"]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    keys = sorted(r[0] for r in
                  df.select(surt_key_col(F.col("u"))).collect())
    grp = [k for k in keys if k.startswith("org,example")]
    i = keys.index(grp[0])
    assert keys[i:i + len(grp)] == grp  # contiguous in sorted order


def test_shuffle_shards_range_property(spark):
    # range sharding: every key in shard i sorts before every key in
    # shard j>i — shard-major traversal IS the global md5 order
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = shuffle_shards(df, "doc_id", 8, seed="s").collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["shuffle_key"])
    shards = sorted(by_shard)
    assert shards == list(range(8))  # uniform enough to hit all 8
    for a, b in zip(shards, shards[1:]):
        assert max(by_shard[a]) < min(by_shard[b])


def test_shuffle_deterministic_under_partitioning(spark):
    df1 = spark.range(0, 300, numPartitions=3)
    df2 = spark.range(0, 300, numPartitions=17)
    rows1 = sorted(map(tuple, shuffle_shards(
        df1.withColumnRenamed("id", "doc_id"), "doc_id", 4).collect()))
    rows2 = sorted(map(tuple, shuffle_shards(
        df2.withColumnRenamed("id", "doc_id"), "doc_id", 4).collect()))
    assert rows1 == rows2


def test_shuffle_seed_decorrelates(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    k1 = [r[0] for r in df.select(
        shuffle_key_col(F.col("doc_id"), "a")).collect()]
    k2 = [r[0] for r in df.select(
        shuffle_key_col(F.col("doc_id"), "b")).collect()]
    assert k1 != k2


def test_shuffle_plan_has_no_global_sort(spark):
    # the ONLY exchange is hash-by-shard; in-shard order must come from
    # a partition-local Sort (global=false), never a range exchange
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = shuffle_shards(df, "doc_id", 4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
    assert "Sort [" in plan and "false, 0" in plan
