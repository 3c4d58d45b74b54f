"""Host-level template (boilerplate) line detection and scrubbing.

Corpus-wide line dedup (``queries.q_line_dedup``, the C4/CCNet pass)
catches lines repeated ANYWHERE; what it under-weights is the site
template — the nav bar / footer / cookie banner that appears on most
pages of ONE host but nowhere else. The standard web-curation fix
(CCNet, RefinedWeb) is per-host: a line present in at least
``min_frac`` of a host's documents (with a minimum document count so
two-page hosts don't template-flag everything) is boilerplate for that
host and is stripped from its pages only.

Scale shape: one explode (line occurrences, distinct per doc), one
map-side-combined groupBy on ``(host, line)``, host totals as a tiny
host-keyed aggregate broadcast back, and a scrub join keyed on
``(host, line)`` whose right side is the template set — a small
fraction of distinct lines, broadcast-able exactly like the
line-dedup dup set. No window over a bare host (a 10M-page host never
serializes into one task).

Reference analogue: the per-page repeated-block suppression
(``grid_detector_v1.py:24-85``) lifted to host scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def doc_lines(docs: DataFrame, lines_col: Column,
              id_col: str = "doc_id",
              host_col: str = "host") -> DataFrame:
    """(host, doc_id, pos, line): one row per line occurrence, from an
    array<string> line-split expression (callers pass the engine's
    canonical 10-word chunker so detector and scrubber agree)."""
    return docs.select(
        F.col(host_col).alias("host"), F.col(id_col),
        F.posexplode(lines_col).alias("pos", "line"))


def host_template_lines(lines: DataFrame, min_frac: float = 0.5,
                        min_docs: int = 3,
                        id_col: str = "doc_id") -> DataFrame:
    """(host, line, n_docs, host_docs): lines occurring in >=
    ``min_frac`` of the host's documents, hosts with >= ``min_docs``
    documents only. ``n_docs`` counts distinct documents (a line
    repeated within one page is one vote)."""
    per_line = (lines.groupBy("host", "line")
                .agg(F.countDistinct(id_col).cast("long")
                     .alias("n_docs")))
    per_host = (lines.groupBy("host")
                .agg(F.countDistinct(id_col).cast("long")
                     .alias("host_docs"))
                .filter(F.col("host_docs") >= min_docs))
    return (per_line.join(F.broadcast(per_host), "host")
            .filter(F.col("n_docs") * F.lit(1.0)
                    >= F.lit(min_frac) * F.col("host_docs"))
            .select("host", "line", "n_docs", "host_docs"))


def scrub_template_lines(lines: DataFrame, templates: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """(host, doc_id, n_lines, n_template_lines, cleaned_text):
    documents reassembled in line order with their host's template
    lines removed. ``templates`` is the (host, line) set from
    :func:`host_template_lines` (joined broadcast — duplicates only)."""
    t = templates.select("host", "line", F.lit(True).alias("__tpl"))
    j = lines.join(F.broadcast(t), ["host", "line"], "left")
    is_tpl = F.col("__tpl").isNotNull()
    return j.groupBy("host", id_col).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(is_tpl.cast("int")).cast("long")
        .alias("n_template_lines"),
        F.concat_ws("\n", F.transform(
            F.array_sort(F.collect_list(
                F.when(~is_tpl, F.struct("pos", "line")))),
            lambda s: s["line"])).alias("cleaned_text"),
    )
