"""RSS 2.0 / Atom feed parsing (frontier/feeds.py): format detection,
field extraction, the Atom alternate-link precedence, link-less entry
handling, and the scan-side plan shape."""

from cord19_crawler_spark.frontier.feeds import parse_feeds

RSS = """<rss version="2.0"><channel>
<title>Channel title decoy</title>
<link>https://h.example.com/</link>
<item><title>First &amp; best</title>
<link> https://h.example.com/a?x=1&amp;y=2 </link>
<guid isPermaLink="false">tag:h,1</guid>
<pubDate>Mon, 01 Jun 2026 10:00:00 GMT</pubDate></item>
<item><title>linkless</title></item>
<item><link>https://h.example.com/b</link></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
<title>Feed decoy</title>
<link href="https://h.example.com/feed.xml" rel="self"/>
<entry><title>E1</title>
<link rel="self" href="https://h.example.com/meta"/>
<link rel="alternate" href="https://h.example.com/e1"/>
<id>urn:e:1</id>
<updated>2026-06-01T10:00:00Z</updated>
<published>2020-01-01T00:00:00Z</published></entry>
<entry><link href="https://h.example.com/e2" rel="alternate"/></entry>
<entry><link href="https://h.example.com/e3"/>
<published>2026-02-02T00:00:00Z</published></entry>
</feed>"""


def _rows(spark, pairs):
    df = spark.createDataFrame(pairs, "url string, body string")
    return parse_feeds(df).orderBy("feed_url", "entry_pos").collect()


def test_rss_fields_and_linkless_drop(spark):
    rows = _rows(spark, [("https://h.example.com/rss.xml", RSS)])
    assert [r["entry_pos"] for r in rows] == [0, 2]  # pos 1 dropped, counted
    r0 = rows[0]
    assert r0["kind"] == "rss"
    assert r0["link"] == "https://h.example.com/a?x=1&y=2"  # trimmed+decoded
    assert r0["title"] == "First & best"
    assert r0["entry_id"] == "tag:h,1"
    assert r0["published"] == "Mon, 01 Jun 2026 10:00:00 GMT"
    r2 = rows[1]
    assert r2["link"] == "https://h.example.com/b"
    assert r2["title"] is None and r2["entry_id"] is None
    assert r2["published"] is None


def test_atom_alternate_precedence_and_fallback(spark):
    rows = _rows(spark, [("https://h.example.com/atom.xml", ATOM)])
    assert [r["entry_pos"] for r in rows] == [0, 1, 2]
    e1, e2, e3 = rows
    # rel=self decoy must not win; updated preferred over published
    assert e1["link"] == "https://h.example.com/e1"
    assert e1["entry_id"] == "urn:e:1"
    assert e1["published"] == "2026-06-01T10:00:00Z"
    # href-before-rel attribute order
    assert e2["link"] == "https://h.example.com/e2"
    # no rel implies alternate (RFC 4287 §4.2.7.2)
    assert e3["link"] == "https://h.example.com/e3"
    assert e3["published"] == "2026-02-02T00:00:00Z"


def test_unknown_root_emits_nothing(spark):
    assert _rows(spark, [("u", "<html>not a feed</html>")]) == []


def test_feed_parse_scan_side_plan(spark):
    df = spark.createDataFrame(
        [("u", RSS)], "url string, body string"
    )
    plan = parse_feeds(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
