"""robots.txt text parsing → rules dimension → matcher, end to end."""

from pyspark.sql import functions as F

from cord19_crawler_spark.frontier.robots import filter_robots, parse_robots_txt

ROBOTS_A = """
# comments ignored
User-agent: googlebot
Disallow: /only-for-google

User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /tmp
"""

ROBOTS_B = """
User-agent: *
Disallow:
"""


def test_parse_and_match(spark):
    raw = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B), ("c.com", None)],
        "host string, robots_txt string",
    )
    rules = parse_robots_txt(raw)
    got = {r["host"]: r["rules"] for r in rules.collect()}
    assert len(got["a.com"]) == 3  # googlebot stanza excluded
    assert got["b.com"] == []  # empty Disallow → allow all
    assert got["c.com"] == []

    cands = spark.createDataFrame(
        [
            ("https://a.com/private/x", "a.com"),
            ("https://a.com/private/ok/x", "a.com"),
            ("https://a.com/public", "a.com"),
            ("https://a.com/tmp/y", "a.com"),
            ("https://b.com/anything", "b.com"),
            ("https://c.com/whatever", "c.com"),
        ],
        "url string, host string",
    )
    allowed = {r["url"] for r in filter_robots(cands, rules).collect()}
    assert allowed == {
        "https://a.com/private/ok/x",  # Allow overrides by longest prefix
        "https://a.com/public",
        "https://b.com/anything",
        "https://c.com/whatever",
    }
