"""Crawl-snapshot diff (frontier/diff.py): per-row classification incl.
NULL-digest edges, the per-host rollup, and the one-join plan shape."""
from cord19_crawler_spark.frontier.diff import crawl_diff, crawl_diff_summary


def _frames(spark):
    old = spark.createDataFrame(
        [
            ("https://a.com/1", "d1"),
            ("https://a.com/2", "d2"),
            ("https://a.com/gone", "dx"),
            ("https://b.com/nullboth", None),
            ("https://b.com/tonull", "dv"),
        ],
        "url string, digest string",
    )
    new = spark.createDataFrame(
        [
            ("https://a.com/1", "d1"),        # unchanged
            ("https://a.com/2", "d2-new"),    # changed
            ("https://a.com/fresh", "dn"),    # added
            ("https://b.com/nullboth", None),  # unchanged (null-safe)
            ("https://b.com/tonull", None),   # changed (value -> null)
        ],
        "url string, digest string",
    )
    return old, new


def test_classification_rules(spark):
    old, new = _frames(spark)
    got = {r["url"]: r["status"] for r in crawl_diff(old, new).collect()}
    assert got == {
        "https://a.com/1": "unchanged",
        "https://a.com/2": "changed",
        "https://a.com/gone": "removed",
        "https://a.com/fresh": "added",
        "https://b.com/nullboth": "unchanged",
        "https://b.com/tonull": "changed",
    }


def test_summary_rollup(spark):
    old, new = _frames(spark)
    got = {
        r["host"]: r
        for r in crawl_diff_summary(crawl_diff(old, new)).collect()
    }
    a = got["a.com"]
    assert (a["added"], a["removed"], a["changed"], a["unchanged"]) == (1, 1, 1, 1)
    assert a["n_urls"] == 4
    b = got["b.com"]
    assert (b["added"], b["removed"], b["changed"], b["unchanged"]) == (0, 0, 1, 1)


def test_diff_plan_is_single_join(spark):
    old, new = _frames(spark)
    plan = (
        crawl_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Join") == 1
