"""Robots fetch policy (frontier/robots.py:robots_fetch_policy):
RFC 9309 §2.3.1 availability states, the 30-day unreachable grace,
staleness, and the single-aggregate plan."""

from cord19_crawler_spark.frontier.robots import robots_fetch_policy

SCHEMA = "host string, ts double, status int"
DAY = 86400.0
NOW = 100 * DAY


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["host"]: r for r in robots_fetch_policy(df, NOW, **kw).collect()}


def test_states(spark):
    rows = [
        ("ok", NOW - 2 * DAY, 500), ("ok", NOW - DAY / 2, 200),
        ("redir", NOW - DAY / 2, 301),
        ("missing", NOW - DAY / 2, 404),
        # unreachable for 3 days (last good fetch 3 days ago): deny
        ("down", NOW - 3 * DAY, 200), ("down", NOW - DAY / 2, 503),
        # unreachable for 40 days: the grace clause relaxes to allow
        ("longdown", NOW - 40 * DAY, 200), ("longdown", NOW - DAY / 2, 0),
        # NEVER reachable, first seen 45 days ago: grace from first try
        ("neverup", NOW - 45 * DAY, 500), ("neverup", NOW - DAY / 2, 500),
    ]
    got = _run(spark, rows)
    assert got["ok"]["state"] == "rules"
    assert got["ok"]["days_unreachable"] is None
    assert got["redir"]["state"] == "redirect"
    assert got["missing"]["state"] == "allow_all"
    assert got["down"]["state"] == "deny_all"
    assert abs(got["down"]["days_unreachable"] - 3.0) < 1e-9
    assert got["longdown"]["state"] == "allow_all"
    assert got["neverup"]["state"] == "allow_all"
    assert abs(got["neverup"]["days_unreachable"] - 45.0) < 1e-9
    # all last fetches half a day old: nothing stale at the 24h default
    assert not any(r["stale"] for r in got.values())


def test_staleness_and_plan(spark):
    got = _run(spark, [("h", NOW - 2 * DAY, 200)])
    assert got["h"]["state"] == "rules" and got["h"]["stale"] is True
    df = spark.createDataFrame([("h", 1.0, 200)], SCHEMA)
    plan = (
        robots_fetch_policy(df, NOW)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Window" not in plan and "Join" not in plan
