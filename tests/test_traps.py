"""URL-shape trap signals (frontier/traps.py): parsing, the loop
heuristic, threshold rules, and the one-aggregate plan shape."""
import pytest

from cord19_crawler_spark.frontier.traps import url_shape_signals


def _sig(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r["host"]: r for r in url_shape_signals(df, **kw).collect()}


def test_depth_query_and_loop_signals(spark):
    got = _sig(
        spark,
        [
            "https://a.com/x/y/z",          # depth 3
            "https://a.com/x",              # depth 1
            "https://a.com/p?q=1",          # query
            "https://b.com/s/s/s/page",     # loop (s x3)
            "https://b.com/s/t/s/t/u",      # loop (two pairs)
            "https://b.com/clean/path",
            "not a url",                    # dropped: no host
        ],
    )
    a, b = got["a.com"], got["b.com"]
    assert a["n_urls"] == 3 and a["n_paths"] == 3
    assert a["avg_depth"] == pytest.approx((3 + 1 + 1) / 3, abs=1e-6)
    assert a["max_depth"] == 3
    assert a["frac_query"] == pytest.approx(1 / 3, abs=1e-6)
    assert a["n_loop_urls"] == 0
    assert b["n_loop_urls"] == 2
    assert set(got) == {"a.com", "b.com"}


def test_suspect_rule_fires_per_threshold(spark):
    deep = [f"https://deep.com/{'d/' * 9}p{i}" for i in range(6)]
    loopy = [f"https://loop.com/a/a/a/p{i}" for i in range(6)]
    query = [f"https://q.com/p{i}?s={i}" for i in range(6)]
    clean = [f"https://ok.com/x/p{i}" for i in range(6)]
    small = ["https://tiny.com/a/a/a/x"]  # loopy but under min_urls
    got = _sig(spark, deep + loopy + query + clean + small, min_urls=5)
    assert got["deep.com"]["is_suspect"]
    assert got["loop.com"]["is_suspect"]
    assert got["q.com"]["is_suspect"]
    assert not got["ok.com"]["is_suspect"]
    assert not got["tiny.com"]["is_suspect"]


def test_plan_is_one_host_aggregate(spark):
    df = spark.createDataFrame(
        [(f"https://h{i % 3}.com/a/b{i}",) for i in range(30)], "url string"
    )
    plan = (
        url_shape_signals(df)._jdf.queryExecution().executedPlan().toString()
    )
    # scan projection + host rollup: no window, no join, no extra shuffle
    # beyond the aggregate exchanges (partial/final + the distinct-path
    # expand share the same host key)
    assert "Window" not in plan and "Join" not in plan
