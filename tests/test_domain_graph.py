"""Domain-level link graph (operators/graph.py:domain_link_graph):
PSL rollup, intra-domain exclusion, page-breadth counting, and the
broadcast-join plan (edges never shuffled for domain lookup)."""

from cord19_crawler_spark.frontier.psl import load_psl
from cord19_crawler_spark.operators.graph import domain_link_graph

SCHEMA = "src_url string, dst_url string"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r["src_domain"], r["dst_domain"]): (r["n_links"], r["n_src_pages"])
        for r in domain_link_graph(df, load_psl(spark)).collect()
    }


def test_rollup_exclusion_and_breadth(spark):
    rows = [
        # two pages on sub-hosts of brand1.co.uk -> site2.com: 3 links,
        # 2 distinct pages
        ("https://a.brand1.co.uk/p1", "https://www.site2.com/x"),
        ("https://a.brand1.co.uk/p1", "https://cdn.site2.com/y"),
        ("https://b.brand1.co.uk/p2", "https://site2.com/z"),
        # intra-domain: sub -> www of the same registrable domain drops
        ("https://a.brand1.co.uk/p1", "https://www.brand1.co.uk/home"),
        # ports and userinfo strip before PSL lookup
        ("https://user:pw@a.brand1.co.uk:8443/p3", "http://site2.com:80/w"),
        # unparseable src (no scheme) drops the pair
        ("not-a-url", "https://site2.com/q"),
    ]
    got = _run(spark, rows)
    assert got == {("brand1.co.uk", "site2.com"): (4, 3)}


def test_multi_label_suffix_vs_default_rule(spark):
    rows = [
        ("https://x.shop.example.com.au/a", "https://y.example.com/b"),
        ("https://deep.x.shop.example.com.au/c", "https://z.example.com/d"),
    ]
    got = _run(spark, rows)
    # com.au is a PSL rule -> registrable keeps three labels;
    # example.com falls to the default last-two-labels rule
    assert got == {("example.com.au", "example.com"): (2, 2)}


def test_edges_join_domains_broadcast(spark):
    df = spark.createDataFrame(
        [("https://a.brand1.co.uk/p", "https://site2.com/x")], SCHEMA
    )
    plan = (
        domain_link_graph(df, load_psl(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # with_registrable_domain's INTERNAL host-frame join (hosts << URLs)
    # may sort-merge; the EDGE set must only ever broadcast-join
    smj_lines = [l for l in plan.splitlines() if "SortMergeJoin" in l]
    assert all("_sh#" not in l and "_dh#" not in l for l in smj_lines), smj_lines
