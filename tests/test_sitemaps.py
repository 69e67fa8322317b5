"""Sitemap XML parsing (frontier/sitemaps.py): urlset vs sitemapindex
classification, field extraction/normalization, entity decoding, and the
protocol's defaulting rules."""

import pyspark.sql.functions as F

from cord19_crawler_spark.frontier.sitemaps import (
    parse_sitemaps,
    xml_unescape_expr,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.example.com/p?x=1&amp;y=2</loc>
    <lastmod>2026-01-05</lastmod>
    <changefreq>Daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc> https://a.example.com/bare </loc></url>
  <url>
    <loc>https://a.example.com/bad</loc>
    <changefreq>sometimes</changefreq>
    <priority>7</priority>
  </url>
  <url><lastmod>2026-01-01</lastmod></url>
</urlset>"""

INDEX = (
    "<sitemapindex>\r\n"
    "  <sitemap><loc>https://b.example.com/sm1.xml</loc>"
    "<lastmod>2026-02-01T10:00:00Z</lastmod></sitemap>\r\n"
    "  <sitemap>\n<loc>https://b.example.com/sm2.xml</loc>\n</sitemap>\r\n"
    "</sitemapindex>"
)


def _rows(spark, pairs):
    df = spark.createDataFrame(pairs, "url string, body string")
    return {
        (r["sitemap_url"], r["entry_pos"]): r
        for r in parse_sitemaps(df).collect()
    }


def test_urlset_fields_and_defaults(spark):
    got = _rows(spark, [("https://a.example.com/sitemap.xml", URLSET)])
    # the loc-less 4th entry is dropped; three survive
    assert len(got) == 3
    full = got[("https://a.example.com/sitemap.xml", 0)]
    assert full["kind"] == "urlset"
    assert full["loc"] == "https://a.example.com/p?x=1&y=2"  # &amp; decoded
    assert full["lastmod"] == "2026-01-05"
    assert full["changefreq"] == "daily"  # case-normalized
    assert full["priority"] == 0.8
    bare = got[("https://a.example.com/sitemap.xml", 1)]
    assert bare["loc"] == "https://a.example.com/bare"  # trimmed
    assert bare["lastmod"] is None
    assert bare["changefreq"] is None
    assert bare["priority"] == 0.5  # protocol default
    bad = got[("https://a.example.com/sitemap.xml", 2)]
    assert bad["changefreq"] is None  # not in the closed vocabulary
    assert bad["priority"] == 0.5  # out-of-range value -> default


def test_index_entries_and_unknown_body(spark):
    got = _rows(
        spark,
        [
            ("https://b.example.com/sitemap.xml", INDEX),
            ("https://c.example.com/x", "<html>not a sitemap</html>"),
            ("https://d.example.com/y", None),
        ],
    )
    assert len(got) == 2  # unknown/NULL bodies emit nothing
    one = got[("https://b.example.com/sitemap.xml", 0)]
    assert one["kind"] == "index"
    assert one["loc"] == "https://b.example.com/sm1.xml"
    assert one["lastmod"] == "2026-02-01T10:00:00Z"
    # changefreq/priority are not part of <sitemap> entries
    assert one["changefreq"] is None and one["priority"] is None
    two = got[("https://b.example.com/sitemap.xml", 1)]
    assert two["loc"] == "https://b.example.com/sm2.xml"
    assert two["lastmod"] is None


def test_xml_unescape_order(spark):
    """&amp; decodes LAST: double-escaped input single-decodes."""
    df = spark.createDataFrame(
        [("&amp;lt;", "&lt;"), ("a&amp;b", "a&b"), ("&quot;x&apos;", "\"x'")],
        "raw string, want string",
    )
    bad = df.filter(
        xml_unescape_expr(F.col("raw")) != F.col("want")
    ).count()
    assert bad == 0


def test_scan_side_plan_no_exchange(spark):
    """Extraction is a pure projection: no shuffle in the plan."""
    df = spark.createDataFrame(
        [("u", URLSET)] * 4, "url string, body string"
    )
    plan = (
        parse_sitemaps(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
