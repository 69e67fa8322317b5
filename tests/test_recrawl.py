"""Freshness re-crawl scheduling (frontier/recrawl.py): exact Python
replay of the Cho & Garcia-Molina estimator, first-fetch flag handling,
single-fetch prior, all-changed (X = n) stability, and the deterministic
top-k batch."""
import math

import pytest

from cord19_crawler_spark.frontier.recrawl import (
    change_rate_estimates,
    recrawl_batch,
)


def _py_lambda(fetches, default=1e-6):
    """fetches: [(ts, changed)] for ONE url — the paper's estimator."""
    fetches = sorted(fetches)
    n = len(fetches) - 1
    x = sum(1 for ts, c in fetches[1:] if c)
    span = fetches[-1][0] - fetches[0][0]
    if n <= 0 or span <= 0:
        return n, x if n > 0 else 0, default
    return n, x, -math.log((n - x + 0.5) / (n + 0.5)) / (span / n)


def test_estimator_matches_python_replay(spark):
    hist = {
        "a": [(0.0, True), (100.0, True), (200.0, False), (300.0, True)],
        "b": [(0.0, False), (50.0, False), (250.0, False)],
        "c": [(10.0, True), (20.0, True)],  # X = n = 1: needs the +0.5 fix
    }
    rows = [(u, ts, c) for u, fs in hist.items() for ts, c in fs]
    df = spark.createDataFrame(rows, "url string, fetch_ts double, changed boolean")
    got = {r["url"]: r for r in change_rate_estimates(df).collect()}
    for u, fs in hist.items():
        n, x, lam = _py_lambda(fs)
        assert got[u]["n_fetches"] == len(fs)
        assert got[u]["n_changes"] == x
        assert got[u]["lambda_hat"] == pytest.approx(lam, rel=1e-12)
        assert got[u]["last_fetch_ts"] == fs[-1][0]


def test_first_fetch_flag_ignored_and_single_fetch_prior(spark):
    df = spark.createDataFrame(
        [
            # identical histories except the first fetch's flag: same lambda
            ("p", 0.0, True), ("p", 60.0, True),
            ("q", 0.0, False), ("q", 60.0, True),
            # single fetch: no interval evidence -> default prior
            ("solo", 5.0, True),
        ],
        "url string, fetch_ts double, changed boolean",
    )
    got = {r["url"]: r for r in change_rate_estimates(df, default_lambda=0.25).collect()}
    assert got["p"]["lambda_hat"] == pytest.approx(got["q"]["lambda_hat"])
    assert got["p"]["n_changes"] == got["q"]["n_changes"] == 1
    assert got["solo"]["lambda_hat"] == 0.25
    assert got["solo"]["n_changes"] == 0


def test_recrawl_batch_order_and_clamp(spark):
    # fast-changing url beats slow-changing one at equal age; future
    # last_fetch (age < 0) clamps to staleness 0
    df = spark.createDataFrame(
        [
            ("fast", 0.0, False), ("fast", 10.0, True), ("fast", 20.0, True),
            ("slow", 0.0, False), ("slow", 10.0, False), ("slow", 20.0, True),
            ("future", 0.0, False), ("future", 10.0, True), ("future", 5000.0, True),
        ],
        "url string, fetch_ts double, changed boolean",
    )
    est = change_rate_estimates(df)
    batch = recrawl_batch(est, now=30.0, k=3).collect()
    assert [r["url"] for r in batch][:2] == ["fast", "slow"]
    by_url = {r["url"]: r["staleness"] for r in batch}
    assert by_url["future"] == 0.0
    assert 0.0 < by_url["slow"] < by_url["fast"] <= 1.0
    with pytest.raises(ValueError):
        recrawl_batch(est, now=30.0, k=0)


def test_recrawl_batch_plan_is_take_ordered(spark):
    df = spark.createDataFrame(
        [(f"u{i}", float(t), i % 2 == 0) for i in range(20) for t in (0, 60)],
        "url string, fetch_ts double, changed boolean",
    )
    plan = (
        recrawl_batch(change_rate_estimates(df), now=600.0, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_null_changed_flags_do_not_poison_estimates(spark):
    # natural fetch-log encoding: first fetch has changed=NULL; NULL must
    # read as "no change observed", not poison lambda/staleness to NULL
    df = spark.createDataFrame(
        [("u", 0.0, None), ("u", 60.0, True), ("u", 120.0, None)],
        "url string, fetch_ts double, changed boolean",
    )
    r = change_rate_estimates(df).collect()[0]
    assert r["n_changes"] == 1
    assert r["lambda_hat"] is not None and r["lambda_hat"] > 0
    batch = recrawl_batch(change_rate_estimates(df), now=200.0, k=1).collect()
    assert batch and batch[0]["staleness"] is not None
