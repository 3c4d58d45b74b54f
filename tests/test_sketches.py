"""KMV distinct-count sketches (operators/sketches.py)."""

import pytest
from pyspark.sql import functions as F

from document_text_extraction_spark.operators import sketches as sk


@pytest.fixture(scope="module")
def vals(spark):
    # 4000 rows, each value repeated twice -> 2000 distinct per group g0,
    # 40 distinct (with repeats) in the small group g1
    rows = [(f"v{i // 2}", "g0") for i in range(4000)]
    rows += [(f"s{i % 40}", "g1") for i in range(200)]
    return spark.createDataFrame(rows, "v string, g string")


def test_exact_below_k(spark, vals):
    """A group with fewer distinct values than k reports the EXACT
    count (the sketch holds the whole value set)."""
    out = {r.g: r.n_distinct_est
           for r in sk.kmv_sketch(vals, ["g"], "v", k=64).collect()}
    assert out["g1"] == 40


def test_estimate_accuracy(spark, vals):
    """KMV with k=256 on 2000 distinct values: relative standard error
    is ~1/sqrt(k-2) ~ 6%; assert a generous 4-sigma band."""
    out = {r.g: r.n_distinct_est
           for r in sk.kmv_sketch(vals, ["g"], "v", k=256).collect()}
    assert 1500 <= out["g0"] <= 2500
    # repeats must not inflate the estimate: same data unioned with
    # itself gives the identical sketch
    doubled = vals.unionAll(vals)
    out2 = {r.g: r.n_distinct_est
            for r in sk.kmv_sketch(doubled, ["g"], "v", k=256).collect()}
    assert out2 == out


def test_merge_equals_direct(spark):
    """Merging per-subkey sketches == sketching the union directly —
    the mergeability contract that makes the sketch cube-friendly."""
    rows = [(f"v{i}", "g", f"day{i % 5}") for i in range(3000)]
    df = spark.createDataFrame(rows, "v string, g string, d string")
    per_day = sk.kmv_sketch(df, ["g", "d"], "v", k=128)
    merged = sk.kmv_merge(per_day, ["g"], k=128).collect()[0]
    direct = sk.kmv_sketch(df, ["g"], "v", k=128).collect()[0]
    assert merged.kmv_hashes == direct.kmv_hashes
    assert merged.n_distinct_est == direct.n_distinct_est


def test_banded_skew_path_parity(spark, vals):
    """The skew-safe ranked_in_key path (hot keys banded by hash value)
    must produce the identical sketch."""
    plain = sk.kmv_sketch(vals, ["g"], "v", k=64).collect()
    banded = sk.kmv_sketch(vals, ["g"], "v", k=64,
                           skew_threshold=100).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, banded))


def test_sketch_rows_are_bounded(spark, vals):
    """Output arrays never exceed k and arrive sorted ascending."""
    for r in sk.kmv_sketch(vals, ["g"], "v", k=64).collect():
        assert len(r.kmv_hashes) <= 64
        assert r.kmv_hashes == sorted(r.kmv_hashes)
