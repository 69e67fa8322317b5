"""Conditional-GET planning (frontier/revalidate.py): independent
validator recency, 304-rate accounting, and the single-aggregate plan."""

from cord19_crawler_spark.frontier.revalidate import revalidation_plan

SCHEMA = "url string, ts double, status int, etag string, last_modified string"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["url"]: r for r in revalidation_plan(df).collect()}


def test_validators_track_independently(spark):
    rows = [
        # server sent etag early, then stopped; last_modified keeps coming
        ("a", 1.0, 200, 'W/"v1"', "Mon, 01 Jan 2026 00:00:00 GMT"),
        ("a", 2.0, 200, None, "Tue, 02 Jan 2026 00:00:00 GMT"),
        ("a", 3.0, 304, None, None),
        # no validators ever
        ("b", 1.0, 200, None, None),
        # etag changes across fetches: freshest wins
        ("c", 1.0, 200, '"x"', None),
        ("c", 5.0, 200, '"y"', None),
        ("c", 3.0, 200, '"z"', None),
    ]
    got = _run(spark, rows)
    a = got["a"]
    assert a["if_none_match"] == 'W/"v1"'  # only response that carried one
    assert a["if_modified_since"] == "Tue, 02 Jan 2026 00:00:00 GMT"
    assert a["revalidable"] is True
    assert (a["n_full"], a["n_not_modified"]) == (2, 1)
    assert abs(a["not_modified_rate"] - 1 / 3) < 1e-12
    b = got["b"]
    assert b["if_none_match"] is None and b["if_modified_since"] is None
    assert b["revalidable"] is False and b["not_modified_rate"] == 0.0
    assert got["c"]["if_none_match"] == '"y"'  # ts=5 beats ts=3


def test_rate_null_when_no_terminal_responses(spark):
    # only redirects/errors observed: rate undefined, not 0
    got = _run(spark, [("r", 1.0, 301, None, None), ("r", 2.0, 503, None, None)])
    assert got["r"]["not_modified_rate"] is None
    assert (got["r"]["n_full"], got["r"]["n_not_modified"]) == (0, 0)


def test_single_linear_aggregate_plan(spark):
    df = spark.createDataFrame([("u", 1.0, 200, None, None)], SCHEMA)
    plan = (
        revalidation_plan(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" not in plan and "Window" not in plan
