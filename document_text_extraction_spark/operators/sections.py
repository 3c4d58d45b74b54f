"""Section segmentation over extracted spans — the dataset-level form of
the reference's section state machine (O58, ``/root/reference/
new_approaches/final.py:120-149`` and ``parse_cv_docling.py:91-210``).

The reference streams blocks in reading order and switches
``current_section`` on each heading; in Spark that sequential fold is a
gaps-and-islands window: headings flag section starts, a running sum over
the reading order assigns section ids, one groupBy concatenates — no
Python, no state machine object.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# single source of truth for O48 keyword normalization (the per-doc
# form in oracle.sections_from_spans shares it)
from ..oracle import SECTION_KEYWORDS  # noqa: F401


def normalize_section_name(col) -> F.Column:
    """O48 keyword → canonical section name; else lowercased/underscored
    (``final.py:171-186``)."""
    low = F.lower(col)
    expr = None
    for kw, canon in SECTION_KEYWORDS.items():
        cond = low.contains(kw)
        expr = F.when(cond, F.lit(canon)) if expr is None else \
            expr.when(cond, F.lit(canon))
    return expr.otherwise(F.regexp_replace(F.trim(low), r"\s+", "_"))


def sections_df(extracted: DataFrame) -> DataFrame:
    """(url, spans) → one row per (url, section): heading + body text.

    Blocks before the first heading fall into section 0 ('_preamble').
    """
    spans = extracted.select(
        "url", F.explode("spans").alias("s")
    ).select(
        "url",
        F.col("s.block").alias("block"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
    ).filter(F.col("kind").isin("main", "heading", "list_item"))
    w = W.partitionBy("url").orderBy("block")
    flagged = spans.withColumn(
        "section_id",
        F.sum((F.col("kind") == "heading").cast("int")).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        flagged.groupBy("url", "section_id")
        .agg(
            F.max(F.when(F.col("kind") == "heading", F.col("text")))
            .alias("heading"),
            F.array_join(
                F.array_sort(
                    F.collect_list(  # nulls (heading rows) are skipped
                        F.when(F.col("kind") != "heading",
                               F.struct("block", "text"))
                    )
                ).getField("text"),
                "\n",
            ).alias("body"),
            F.count("*").alias("n_blocks"),
        )
        .withColumn(
            "section",
            F.when(F.col("heading").isNull(), F.lit("_preamble"))
            .otherwise(normalize_section_name(F.col("heading"))),
        )
    )
