"""Region geometry operators: interval clustering, envelope merge,
oversized split, span filters, bbox clip (O41/O42/O11/O13)."""

from pyspark.sql import functions as F

from document_text_extraction_spark.operators import regions


def _spans(spark, rows):
    return spark.createDataFrame(
        rows, "url string, page int, block int, x0 double, y0 double, "
              "x1 double, y1 double, text string")


def test_cluster_and_envelope_merge(spark):
    rows = [
        # cluster A: three lines 10pt apart
        ("u", 0, 0, 72.0, 700.0, 300.0, 700.0, "a1"),
        ("u", 0, 1, 80.0, 690.0, 280.0, 690.0, "a2"),
        ("u", 0, 2, 72.0, 680.0, 310.0, 680.0, "a3"),
        # cluster B: far below (gap 180 > 50)
        ("u", 0, 3, 72.0, 500.0, 300.0, 500.0, "b1"),
        ("u", 0, 4, 72.0, 495.0, 300.0, 495.0, "b2"),
    ]
    env = regions.merge_nearby_spans(_spans(spark, rows), gap=50.0)
    got = {r["region_id"]: r for r in env.collect()}
    assert len(got) == 2
    a = max(got.values(), key=lambda r: r["y1"])
    b = min(got.values(), key=lambda r: r["y1"])
    assert a["n_spans"] == 3 and a["text"] == "a1\na2\na3"
    assert (a["x0"], a["y0"], a["x1"], a["y1"]) == (72.0, 680.0, 310.0, 700.0)
    assert b["n_spans"] == 2 and b["text"] == "b1\nb2"


def test_merge_is_transitive_chain(spark):
    """A chain a-b-c where a,c are far apart but each neighbor is close
    must merge into ONE region (reference's pairwise loop is transitive
    via the 'used' set; the sweep must match)."""
    rows = [("u", 0, i, 72.0, 700.0 - 40.0 * i, 300.0, 700.0 - 40.0 * i,
             f"t{i}") for i in range(5)]
    env = regions.merge_nearby_spans(_spans(spark, rows), gap=50.0)
    assert env.count() == 1
    assert env.first()["n_spans"] == 5


def test_split_oversized_regions(spark):
    rows = (
        # one tall region: lines 30pt apart over 300pt with a 120pt gap
        [("u", 0, i, 72.0, 700.0 - 30.0 * i, 300.0, 700.0 - 30.0 * i,
          f"top{i}") for i in range(4)]
        + [("u", 0, 4 + i, 72.0, 490.0 - 30.0 * i, 300.0, 490.0 - 30.0 * i,
            f"bot{i}") for i in range(4)]
    )
    clustered = regions.cluster_spans_1d(_spans(spark, rows), gap=150.0)
    assert clustered.select("region_id").distinct().count() == 1
    split = regions.split_oversized_regions(
        clustered, max_height=200.0, fine_gap=50.0)
    subs = split.select("region_id", "sub_region").distinct().count()
    assert subs == 2, "the 120pt internal gap must split the tall region"
    # a short region is untouched
    short = [("u", 0, i, 72.0, 700.0 - 20.0 * i, 300.0, 700.0 - 20.0 * i,
              f"s{i}") for i in range(3)]
    c2 = regions.cluster_spans_1d(_spans(spark, short), gap=150.0)
    s2 = regions.split_oversized_regions(c2, max_height=200.0,
                                         fine_gap=10.0)
    assert s2.select("sub_region").distinct().collect()[0][0] == 0


def test_min_span_filter_and_clip(spark):
    df = spark.createDataFrame(
        [([{"page": 0, "block": 0, "x0": -5.0, "y0": 0.0, "x1": 700.0,
            "y1": 800.0, "kind": "main", "text": "long enough text"},
           {"page": 0, "block": 1, "x0": 0.0, "y0": 0.0, "x1": 1.0,
            "y1": 1.0, "kind": "main", "text": "xs"}],)],
        "spans array<struct<page:int,block:int,x0:double,y0:double,"
        "x1:double,y1:double,kind:string,text:string>>")
    kept = df.select(
        regions.min_span_filter(F.col("spans"), 5).alias("s")).first()["s"]
    assert len(kept) == 1 and kept[0]["text"] == "long enough text"
    clipped = df.select(regions.clip_bbox_cols(
        F.lit(-5.0), F.lit(100.0), F.lit(700.0), F.lit(900.0),
        612.0, 792.0).alias("b")).first()["b"]
    assert (clipped["x0"], clipped["y0"], clipped["x1"],
            clipped["y1"]) == (0.0, 100.0, 612.0, 792.0)
