"""Sitemap XML parsing (operators/sitemaps.py): urlset entries, index
refs, entity unescape, grammar tolerance."""

import datetime

import pandas as pd

from document_text_extraction_spark.operators import sitemaps as SM


def _tbl(spark, body):
    return spark.createDataFrame(
        pd.DataFrame([("h.example", body)], columns=["host", "body"]))


def test_urlset_full_and_optional_fields(spark):
    body = """<?xml version="1.0" encoding="UTF-8"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url>
        <loc> https://h.example/a?x=1&amp;y=2 </loc>
        <lastmod>2024-03-05T12:30:00+02:00</lastmod>
        <changefreq>DAILY</changefreq>
        <priority>0.8</priority>
      </url>
      <url><loc>https://h.example/b</loc></url>
      <url><priority>0.1</priority></url>
    </urlset>"""
    got = sorted((r.loc, r.lastmod, r.changefreq, r.priority)
                 for r in SM.parse_sitemap_entries(
                     _tbl(spark, body)).collect())
    # loc trimmed + entity-unescaped; lastmod date part; changefreq
    # lowercased; loc-less entry dropped (spec: loc required)
    assert got == [
        ("https://h.example/a?x=1&y=2",
         datetime.date(2024, 3, 5), "daily", 0.8),
        ("https://h.example/b", None, None, None),
    ]


def test_index_refs_and_no_cross_matching(spark):
    body = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <sitemap><loc>https://h.example/s1.xml</loc>
        <lastmod>2024-02-01</lastmod></sitemap>
      <sitemap><loc>https://h.example/s2.xml</loc></sitemap>
    </sitemapindex>"""
    refs = sorted((r.child_loc, r.lastmod)
                  for r in SM.parse_sitemap_index(
                      _tbl(spark, body)).collect())
    assert refs == [
        ("https://h.example/s1.xml", datetime.date(2024, 2, 1)),
        ("https://h.example/s2.xml", None),
    ]
    # an index body yields NO urlset entries (word-boundary regexes:
    # '<sitemapindex' is not a '<sitemap' block, '<urlset' not '<url')
    assert SM.parse_sitemap_entries(_tbl(spark, body)).count() == 0


def test_urlset_root_is_not_an_entry(spark):
    body = "<urlset><url><loc>https://h.example/x</loc></url></urlset>"
    assert SM.parse_sitemap_index(_tbl(spark, body)).count() == 0
    assert SM.parse_sitemap_entries(_tbl(spark, body)).count() == 1


def test_bad_priority_is_null_not_error(spark):
    body = ("<urlset><url><loc>https://h.example/x</loc>"
            "<priority>high</priority></url></urlset>")
    [r] = SM.parse_sitemap_entries(_tbl(spark, body)).collect()
    assert r.priority is None
