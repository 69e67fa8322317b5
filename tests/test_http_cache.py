"""HTTP cache-freshness planning (frontier/cache.py): RFC 9111 directive
parsing, lifetime precedence, storage vetoes, corrected age, staleness
instant, and the single-aggregate plan shape."""

from pyspark.sql import functions as F

from cord19_crawler_spark.frontier.cache import http_cache_plan

SCHEMA = (
    "url string, ts double, cache_control string, date_ts double, "
    "expires_ts double, age double, last_modified_ts double"
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["url"]: r for r in http_cache_plan(df, **kw).collect()}


def test_lifetime_precedence_and_flags(spark):
    rows = [
        # s-maxage beats max-age beats Expires (shared cache, §4.2.1)
        ("a", 100.0, "public, max-age=600, s-maxage=1200", 100.0, 7300.0, None, None),
        # max-age beats Expires
        ("b", 100.0, "max-age=600", 100.0, 7300.0, None, None),
        # Expires − Date when no CC seconds
        ("c", 100.0, "public", 100.0, 7300.0, None, None),
        # heuristic: 10% of (Date − Last-Modified), flagged
        ("d", 100.0, None, 100.0, None, None, -900.0),
        # nothing at all → lifetime NULL
        ("e", 100.0, None, None, None, None, None),
    ]
    got = _run(spark, rows, now=0.0)
    assert got["a"]["lifetime_s"] == 1200.0 and got["a"]["heuristic"] is False
    assert got["b"]["lifetime_s"] == 600.0
    assert got["c"]["lifetime_s"] == 7200.0
    assert got["d"]["lifetime_s"] == 100.0 and got["d"]["heuristic"] is True
    assert got["e"]["lifetime_s"] is None and got["e"]["due_ts"] is None


def test_storage_vetoes_and_no_cache(spark):
    rows = [
        ("ns", 100.0, "no-store, max-age=600", 100.0, None, None, None),
        ("pv", 100.0, "private, max-age=600", 100.0, None, None, None),
        ("nc", 100.0, "no-cache, max-age=600", 100.0, None, None, None),
        ("ok", 100.0, "max-age=600", 100.0, None, None, None),
    ]
    got = _run(spark, rows, now=100.0)
    for u in ("ns", "pv"):
        assert got[u]["cacheable"] is False
        assert got[u]["due_ts"] is None and got[u]["fresh_now"] is False
    # no-cache: storable, lifetime known, but never served fresh
    nc = got["nc"]
    assert nc["cacheable"] is True and nc["no_cache"] is True
    assert nc["lifetime_s"] == 600.0 and nc["fresh_now"] is False
    ok = got["ok"]
    assert ok["fresh_now"] is True and ok["due_ts"] == 700.0


def test_directive_regex_is_delimiter_anchored(spark):
    rows = [
        # decoys: maxage (no hyphen), x-no-store, s-maxage must not feed max-age
        ("a", 1.0, "maxage=5, x-no-store", None, None, None, None),
        ("b", 1.0, "s-maxage=9", None, None, None, None),
        ("c", 1.0, "MAX-AGE=30", None, None, None, None),  # case-insensitive
    ]
    got = _run(spark, rows, now=0.0)
    assert got["a"]["lifetime_s"] is None and got["a"]["cacheable"] is True
    assert got["b"]["lifetime_s"] == 9.0
    assert got["c"]["lifetime_s"] == 30.0


def test_corrected_age_and_due_instant(spark):
    # received at ts=1000, origin Date=970 (30s apparent age), Age: 15
    rows = [("a", 1000.0, "max-age=100", 970.0, None, 15.0, None)]
    got = _run(spark, rows, now=1000.0)
    a = got["a"]
    assert a["age_at_response"] == 45.0
    assert a["due_ts"] == 1000.0 + 100.0 - 45.0
    assert a["fresh_now"] is True
    # clock skew the other way: Date ahead of receipt clamps to 0
    rows = [("b", 1000.0, "max-age=100", 1030.0, None, None, None)]
    got = _run(spark, rows, now=1099.0)
    assert got["b"]["age_at_response"] == 0.0 and got["b"]["fresh_now"] is True


def test_latest_response_wins_as_a_row(spark):
    rows = [
        # older response had max-age; the latest has only no-store — the
        # plan must read the LATEST row's headers, not mix across rows
        ("a", 1.0, "max-age=600", 1.0, None, None, None),
        ("a", 2.0, "no-store", 2.0, None, None, None),
        # and the reverse: latest gains freshness info
        ("b", 1.0, "no-store", 1.0, None, None, None),
        ("b", 2.0, "max-age=600", 2.0, None, None, None),
    ]
    got = _run(spark, rows, now=2.0)
    assert got["a"]["cacheable"] is False and got["a"]["lifetime_s"] is None
    assert got["b"]["cacheable"] is True and got["b"]["lifetime_s"] == 600.0


def test_past_expires_clamps_to_zero_lifetime(spark):
    rows = [("a", 100.0, None, 100.0, 50.0, None, None)]
    got = _run(spark, rows, now=100.0)
    assert got["a"]["lifetime_s"] == 0.0 and got["a"]["fresh_now"] is False


def test_single_shuffle_plan(spark):
    """The whole plan is ONE url-key hash aggregate (plus the 1-row
    broadcast `now`): no window, no join-side exchange of the history."""
    df = spark.createDataFrame(
        [("a", 1.0, "max-age=5", 1.0, None, None, None)], SCHEMA
    )
    plan = http_cache_plan(df)._jdf.queryExecution().executedPlan().toString()
    # exactly one wide exchange of the history (the groupBy); the `now`
    # aggregate broadcasts a single row, never shuffles the history wide
    import re

    wide = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    assert len(wide) == 1, plan
    assert "Window" not in plan and "SortMergeJoin" not in plan, plan
