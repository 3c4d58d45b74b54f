"""Sitemap XML parsing — the discovery side of the crawl-hygiene
family (sitemaps.org protocol, referenced by robots.txt ``Sitemap:``
lines that :func:`.robots.parse_robots_meta` already extracts).

A frontier planner consumes two per-host inputs: what a crawler MAY
fetch (robots rules) and what the site ASKS it to fetch (its sitemap:
URL list with last-modification, change frequency, and priority
hints). This module parses fetched sitemap bodies as a dataset — one
``(host, body)`` row per sitemap document, the same table shape the
robots parser uses — into the rows :func:`.frontier.frontier_plan`
can rank directly (priority hint as the sort key, lastmod vs the
capture history from :mod:`.captures` for recrawl scheduling).

Pure JVM expressions end to end: one ``regexp_extract_all`` per body
splits the ``<url>``/``<sitemap>`` blocks (linear scan), one explode,
then per-block field extracts — no XML library, no UDF, no shuffle
until the caller aggregates. The subset parsed is the closed element
grammar sitemaps.org defines (loc / lastmod / changefreq / priority;
index files: sitemap / loc), tolerant of attribute-bearing root tags
and arbitrary whitespace. ``loc`` values are XML-entity-unescaped
(the five predefined entities — the spec REQUIRES escaping them in
URLs), numeric character references excluded by design (urlset locs
are ASCII-safe URLs).

Reference analogue: none (no crawler in the reference); this belongs
with robots.py / frontier.py / captures.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_URL_BLOCK_RE = r"(?s)<url\b[^>]*>(.*?)</url>"
_SM_BLOCK_RE = r"(?s)<sitemap\b[^>]*>(.*?)</sitemap>"
_LOC_RE = r"(?s)<loc\b[^>]*>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?s)<lastmod\b[^>]*>\s*(.*?)\s*</lastmod>"
_CHANGEFREQ_RE = r"(?s)<changefreq\b[^>]*>\s*(.*?)\s*</changefreq>"
_PRIORITY_RE = r"(?s)<priority\b[^>]*>\s*(.*?)\s*</priority>"


def _xml_unescape(col: Column) -> Column:
    """The five predefined XML entities, longest-first so ``&amp;lt;``
    decodes to ``&lt;`` (one pass, literal replaces — no regex)."""
    out = F.replace(col, F.lit("&lt;"), F.lit("<"))
    out = F.replace(out, F.lit("&gt;"), F.lit(">"))
    out = F.replace(out, F.lit("&quot;"), F.lit('"'))
    out = F.replace(out, F.lit("&apos;"), F.lit("'"))
    return F.replace(out, F.lit("&amp;"), F.lit("&"))


def _entry(block: Column) -> dict[str, Column]:
    empty_null = lambda c: F.when(c != "", c)  # noqa: E731
    return {
        "loc": _xml_unescape(
            F.regexp_extract(block, _LOC_RE, 1)),
        "lastmod": F.to_date(empty_null(
            F.substring(F.regexp_extract(block, _LASTMOD_RE, 1),
                        1, 10))),
        "changefreq": empty_null(F.lower(
            F.regexp_extract(block, _CHANGEFREQ_RE, 1))),
        "priority": F.regexp_extract(block, _PRIORITY_RE, 1)
        .try_cast("double"),
    }


def parse_sitemap_entries(sitemaps: DataFrame, host_col: str = "host",
                          body_col: str = "body") -> DataFrame:
    """``<urlset>`` bodies → one row per ``<url>`` entry:
    ``(host, loc, lastmod: date, changefreq, priority)``. Entries with
    no ``<loc>`` are dropped (spec: loc is required); missing optional
    fields are null. Index files produce no rows here — route them
    through :func:`parse_sitemap_index`."""
    blocks = F.regexp_extract_all(F.col(body_col),
                                  F.lit(_URL_BLOCK_RE), 1)
    ex = sitemaps.select(F.col(host_col).alias("host"),
                         F.explode(blocks).alias("__b"))
    e = _entry(F.col("__b"))
    return (ex.select("host", e["loc"].alias("loc"),
                      e["lastmod"].alias("lastmod"),
                      e["changefreq"].alias("changefreq"),
                      e["priority"].alias("priority"))
            .filter(F.col("loc") != ""))


def parse_sitemap_index(sitemaps: DataFrame, host_col: str = "host",
                        body_col: str = "body") -> DataFrame:
    """``<sitemapindex>`` bodies → one row per child reference:
    ``(host, child_loc, lastmod: date)`` — the fetch list for the next
    sitemap round (a crawler iterates: fetch children, parse entries,
    never recurse unboundedly — indexes may not nest per spec)."""
    blocks = F.regexp_extract_all(F.col(body_col),
                                  F.lit(_SM_BLOCK_RE), 1)
    ex = sitemaps.select(F.col(host_col).alias("host"),
                         F.explode(blocks).alias("__b"))
    e = _entry(F.col("__b"))
    return (ex.select("host", e["loc"].alias("child_loc"),
                      e["lastmod"].alias("lastmod"))
            .filter(F.col("child_loc") != ""))
