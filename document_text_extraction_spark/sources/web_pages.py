"""Sources producing the ``web_pages`` input table.

Two producers, both **executor-side** (payload bytes are generated inside
``mapInPandas`` from row ids — the driver never materializes a corpus, so
generation scales with the cluster exactly like a real table scan would):

* :func:`synth_web_pages` — standalone corpus of N rows (pipeline tests,
  scale benches);
* :func:`web_pages_from_documents` — deterministically wraps the driver's
  ``documents.parquet`` rows into pages, which makes extraction results
  predictable from the source table (the basis of the DuckDB-checkable
  roundtrip queries in ``__spark_entry__``).

Reference analogue: the folder scan work-list
(``/root/reference/batch_multi_column.py:496-509``) — here, partition
planning over a table instead of a glob loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .. import corpus

WEB_PAGES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def _rows_to_pages(ids: pd.Series, texts: pd.Series, sources: pd.Series,
                   langs: pd.Series | None) -> pd.DataFrame:
    recs = []
    for i in range(len(ids)):
        doc_id = int(ids.iloc[i])
        page = corpus.make_page(
            doc_id, texts.iloc[i], sources.iloc[i],
            lang=None if langs is None else langs.iloc[i],
        )
        page["doc_id"] = doc_id
        recs.append(page)
    return pd.DataFrame(
        recs, columns=["doc_id", "url", "warc_ts", "html", "text", "lang"]
    )


def synth_web_pages(spark: SparkSession, n: int,
                    partitions: int = 32) -> DataFrame:
    """N synthetic pages, generated executor-side from ``spark.range``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"]
            texts = pd.Series([
                corpus.synth_text(int(i), 600, 1200)
                if int(i) % 97 == 96 else corpus.synth_text(int(i))
                for i in ids
            ])
            srcs = pd.Series(["src"] * len(b))
            yield _rows_to_pages(ids, texts, srcs, None)

    return (
        spark.range(0, n, numPartitions=partitions)
        .mapInPandas(gen, schema=WEB_PAGES_SCHEMA)
    )


def web_pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap the driver's ``documents`` table into deterministic pages.

    The source table is one parquet file with a single row group, so
    without the repartition the per-doc Python generator (and any
    Python extraction kernel above it) runs as ONE scan task — the
    repartition spreads the cheap (id, text) rows across the cluster
    first (guide §2.5 "unsplittable input file"; scale-adaptive — a
    no-op for a production table that already has enough splits).
    Page content is a pure per-row function of the doc row, so
    partitioning never changes values."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source", "lang")
    want = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < want:
        docs = docs.repartition(want)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _rows_to_pages(b["doc_id"], b["text"], b["source"],
                                 b["lang"])

    return docs.mapInPandas(gen, schema=WEB_PAGES_SCHEMA)
