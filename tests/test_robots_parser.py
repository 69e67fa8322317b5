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


def test_consecutive_user_agent_lines_share_rules(spark):
    """RFC 9309 group shape: several User-agent lines stacked over ONE rule
    block apply to every listed agent — including * wherever it appears in
    the header — and a UA line after directives starts a NEW group."""
    raw = spark.createDataFrame(
        [
            # '*' first in a multi-UA header
            ("a.com", "User-agent: *\nUser-agent: googlebot\nDisallow: /private\n"),
            # '*' last in a multi-UA header
            ("b.com", "User-agent: googlebot\nUser-agent: *\nDisallow: /secret\nCrawl-delay: 3\n"),
            # '*' NOT in the header → rules don't apply to *
            ("c.com", "User-agent: googlebot\nUser-agent: bingbot\nDisallow: /x\n"),
            # directives end the group: second header is a separate group
            ("d.com", "User-agent: googlebot\nDisallow: /g\nUser-agent: *\nDisallow: /y\n"),
        ],
        "host string, robots_txt string",
    )
    parsed = {r["host"]: r for r in parse_robots_txt(raw).collect()}
    assert [x["path_prefix"] for x in parsed["a.com"]["rules"]] == ["/private"]
    assert [x["path_prefix"] for x in parsed["b.com"]["rules"]] == ["/secret"]
    assert parsed["b.com"]["crawl_delay"] == 3.0
    assert parsed["c.com"]["rules"] == []
    assert [x["path_prefix"] for x in parsed["d.com"]["rules"]] == ["/y"]


def test_crawl_delay_extraction(spark):
    """Crawl-delay in the * group is extracted (seconds, float); malformed
    values and non-* groups are ignored."""
    raw = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nCrawl-delay: 7\nDisallow: /private\n"),
            ("b.com", "User-agent: *\nCrawl-delay: 2.5\n"),
            ("c.com", "User-agent: googlebot\nCrawl-delay: 99\n"
                      "User-agent: *\nDisallow: /x\n"),
            ("d.com", "User-agent: *\nCrawl-delay: soon\n"),
            ("e.com", None),
        ],
        "host string, robots_txt string",
    )
    parsed = {r["host"]: r for r in parse_robots_txt(raw).collect()}
    assert parsed["a.com"]["crawl_delay"] == 7.0
    assert parsed["a.com"]["rules"][0]["path_prefix"] == "/private"
    assert parsed["b.com"]["crawl_delay"] == 2.5
    assert parsed["c.com"]["crawl_delay"] is None  # googlebot group, not *
    assert parsed["c.com"]["rules"][0]["path_prefix"] == "/x"
    assert parsed["d.com"]["crawl_delay"] is None  # malformed: tolerated
    assert parsed["e.com"]["crawl_delay"] is None


def test_crawl_delay_drives_scheduler_politeness(spark, tmp_path):
    """A host's robots Crawl-delay becomes its wall-clock min_delay_seconds:
    under a forced clock it stays blocked while a no-directive host (config
    default 10 s) is schedulable again."""
    from cord19_crawler_spark.datagen import generate_documents
    from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig

    docs = generate_documents(spark, 200, partitions=2).cache()
    # host0 (hot) declares Crawl-delay 100; others inherit the 10 s default
    robots = parse_robots_txt(spark.createDataFrame(
        [("host0.example.com", "User-agent: *\nCrawl-delay: 100\n")],
        "host string, robots_txt string",
    ))
    clock = {"t": 1000.0}
    sched = CrawlScheduler(
        spark, docs, str(tmp_path / "ck"),
        SchedulerConfig(batch_size=30, seen_partitions=2, bloom_bits=1 << 14,
                        min_delay_rounds=0, max_in_flight=5,
                        min_delay_seconds=10.0),
        robots=robots, clock=lambda: clock["t"],
    )
    from cord19_crawler_spark.datagen import seed_urls
    sched.run(1, seeds=seed_urls(spark, 40, 200))
    host_rounds = {}
    for rnd, _, url in sched.crawl_order():
        host_rounds.setdefault(url.split("/")[2], set()).add(rnd)
    assert 1 in host_rounds.get("host0.example.com", set())  # scheduled in r1
    clock["t"] = 1020.0  # 20 s later: default hosts eligible, host0 not
    sched.run(2)
    host_rounds = {}
    for rnd, _, url in sched.crawl_order():
        host_rounds.setdefault(url.split("/")[2], set()).add(rnd)
    r2_hosts = {h for h, rs in host_rounds.items() if 2 in rs}
    assert r2_hosts  # something was schedulable
    assert "host0.example.com" not in r2_hosts  # 20 < its 100 s directive
    clock["t"] = 1150.0  # past the directive: host0 schedulable again
    sched.run(3)
    r3_hosts = {u.split("/")[2] for r, _, u in sched.crawl_order() if r == 3}
    assert "host0.example.com" in r3_hosts


def test_crawl_delay_never_flips_rounds_mode(spark, tmp_path):
    """A robots dimension carrying Crawl-delay must NOT silently switch a
    rounds-only crawl into wall-clock mode: the clock is never read (it
    raises here) and committed host_state carries no fetch timestamps —
    bit-identical determinism is preserved unless min_delay_seconds opts in."""
    from cord19_crawler_spark.datagen import generate_documents, seed_urls
    from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig

    docs = generate_documents(spark, 150, partitions=2).cache()
    robots = parse_robots_txt(spark.createDataFrame(
        [("host0.example.com", "User-agent: *\nCrawl-delay: 5\n")],
        "host string, robots_txt string",
    ))

    def forbidden_clock():
        raise AssertionError("clock read in rounds-only mode")

    s = CrawlScheduler(
        spark, docs, str(tmp_path / "ck"),
        SchedulerConfig(batch_size=15, seen_partitions=2, bloom_bits=1 << 14),
        robots=robots, clock=forbidden_clock,
    )
    out = s.run(2, seeds=seed_urls(spark, 8, 150))
    assert all(c["scheduled"] > 0 for c in out)
    hs = s._read_host_state(2)
    assert hs.filter(hs.last_fetch_ts.isNotNull()).count() == 0


def test_sitemap_urls_expr_nongroup_directive(spark):
    import pyspark.sql.functions as F

    from cord19_crawler_spark.frontier.robots import sitemap_urls_expr

    body = (
        "SITEMAP: https://a.com/s1.xml\n"        # before any group, caps
        "User-agent: *\nDisallow: /x\n"
        " sitemap:\thttps://a.com/s2.xml \n"      # inside group, ws + tab
        "User-agent: Foo\nDisallow: /\n"
        "Sitemap: https://a.com/s3.xml"           # after a non-* group
    )
    df = spark.createDataFrame(
        [(1, body), (2, None), (3, "User-agent: *\nDisallow: /")],
        "i long, robots_txt string",
    )
    got = {
        r["i"]: r["s"]
        for r in df.select(
            "i",
            F.coalesce(
                sitemap_urls_expr("robots_txt"),
                F.expr("CAST(array() AS array<string>)"),
            ).alias("s"),
        ).collect()
    }
    assert got[1] == [
        "https://a.com/s1.xml",
        "https://a.com/s2.xml",
        "https://a.com/s3.xml",
    ]
    assert got[2] == [] and got[3] == []


def test_discovered_sitemap_feeds_seed_source(spark, tmp_path):
    # bootstrap loop: robots body -> sitemap_urls_expr -> a real sitemap
    # XML on disk -> read_sitemap_seeds yields its URLs
    import pyspark.sql.functions as F

    from cord19_crawler_spark.frontier.robots import sitemap_urls_expr
    from cord19_crawler_spark.sources.warc import read_sitemap_seeds

    sm = tmp_path / "sitemap.xml"
    sm.write_text(
        '<?xml version="1.0"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<url><loc>https://h.example.com/p/1</loc></url>\n"
        "<url><loc>https://h.example.com/p/2</loc></url>\n"
        "</urlset>\n"
    )
    robots = spark.createDataFrame(
        [(f"Sitemap: file://{sm}",)], "robots_txt string"
    )
    discovered = [
        r["u"]
        for r in robots.select(
            F.explode(sitemap_urls_expr("robots_txt")).alias("u")
        ).collect()
    ]
    assert discovered == [f"file://{sm}"]
    path = discovered[0].removeprefix("file://")
    seeds = read_sitemap_seeds(spark, path)
    urls = sorted(r[seeds.columns[0]] for r in seeds.collect())
    assert urls == ["https://h.example.com/p/1", "https://h.example.com/p/2"]


def test_sitemap_extraction_comments_and_crlf_match_duckdb(spark):
    # RFC 9309 end-of-line comments and CRLF bodies: Spark (Java regex)
    # and the DuckDB oracle (RE2) must extract identically
    import duckdb
    import pyspark.sql.functions as F

    from cord19_crawler_spark.frontier.robots import sitemap_urls_expr

    body = (
        "Sitemap: https://a.com/s1.xml # primary\r\n"
        "User-agent: *\r\n"
        "sitemap: https://a.com/s2.xml\r\n"
        "Sitemap: https://a.com/s3.xml\t \r\n"
    )
    df = spark.createDataFrame([(body,)], "robots_txt string")
    got = df.select(sitemap_urls_expr("robots_txt").alias("s")).collect()[0]["s"]
    exp = duckdb.sql(
        "SELECT regexp_extract_all(?, "
        "'(?im)^[ \\t]*sitemap[ \\t]*:[ \\t]*(\\S+)[ \\t]*(?:#[^\\r\\n]*)?\\r?$'"
        ", 1)",
        params=[body],
    ).fetchone()[0]
    assert got == exp == [
        "https://a.com/s1.xml",
        "https://a.com/s2.xml",
        "https://a.com/s3.xml",
    ]


def test_rfc9309_wildcard_and_anchor_matching(spark):
    """RFC 9309 §2.2.3: * spans octets, $ anchors the end; §2.2.2:
    most-octets pattern wins, allow wins a length tie. Wildcard-free
    patterns must keep the original longest-prefix behavior."""
    from pyspark.sql import Row

    from cord19_crawler_spark.frontier.robots import robots_allowed

    rules = [
        Row(allow=True, path_prefix="/public"),
        Row(allow=False, path_prefix="/private*"),
        Row(allow=False, path_prefix="/*.pdf$"),
        Row(allow=True, path_prefix="/docs/f1.pdf"),
        Row(allow=False, path_prefix="/t/a$"),
        Row(allow=True, path_prefix="/t/a*"),
        Row(allow=False, path_prefix="/a*c"),
    ]
    cases = {
        "https://w.com/public/p3": True,        # plain allow prefix
        "https://w.com/private9/x": False,      # trailing-* deny
        "https://w.com/docs/f7.pdf": False,     # $-anchored deny
        "https://w.com/docs/f7.pdfx": True,     # $ must NOT catch .pdfx
        "https://w.com/docs/f1.pdf": True,      # longer allow (12) beats deny (7)
        "https://w.com/docs/f1.pdfx": True,     # prefix allow still matches
        "https://w.com/t/a": True,              # 5-octet tie: allow wins
        "https://w.com/abc": False,             # mid-pattern *
        "https://w.com/ac": False,              # * matches empty too
        "https://w.com/elsewhere": True,        # no rule matches
    }
    df = spark.createDataFrame(
        [(u, rules) for u in cases],
        "url string, rules array<struct<allow:boolean,path_prefix:string>>",
    )
    got = {
        r["url"]: r["ok"]
        for r in df.select(
            "url", robots_allowed(F.col("url"), F.col("rules")).alias("ok")
        ).collect()
    }
    assert got == cases
