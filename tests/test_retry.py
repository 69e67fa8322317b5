"""Fetch retry/backoff reduction (frontier/retry.py): state machine,
trailing-streak semantics, truncated exponential delays, tie handling,
and a Python replay on randomized logs."""

import math
import random

import pyspark.sql.functions as F

from cord19_crawler_spark.frontier.retry import retry_schedule


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "url string, ts double, status int")
    return {r["url"]: r for r in retry_schedule(df, **kw).collect()}


def test_state_machine_and_backoff(spark):
    rows = [
        # trailing success -> ok, streak resets to 0
        ("ok", 1.0, 500), ("ok", 2.0, 200),
        # 304 revalidation counts as success
        ("ok304", 1.0, 304),
        # permanent 404 -> gone, never retried
        ("gone", 1.0, 200), ("gone", 2.0, 404),
        # two trailing transients after a success -> retry, 60 * 2^1
        ("retry", 1.0, 200), ("retry", 2.0, 503), ("retry", 3.0, 0),
        # streak over max_retries -> dead
        ("dead", 1.0, 500), ("dead", 2.0, 500), ("dead", 3.0, 500),
        # 429 is transient even though 4xx
        ("rate", 1.0, 429),
    ]
    got = _run(spark, rows, max_retries=2)
    assert (got["ok"]["state"], got["ok"]["fail_streak"]) == ("ok", 0)
    assert got["ok"]["retry_delay"] is None
    assert got["ok304"]["state"] == "ok"
    assert (got["gone"]["state"], got["gone"]["last_status"]) == ("gone", 404)
    r = got["retry"]
    assert (r["state"], r["fail_streak"]) == ("retry", 2)
    assert r["retry_delay"] == 120.0 and r["next_attempt_ts"] == 123.0
    assert got["dead"]["state"] == "dead"
    assert got["dead"]["retry_delay"] is None
    assert (got["rate"]["state"], got["rate"]["retry_delay"]) == ("retry", 60.0)


def test_delay_truncation_and_tiebreak(spark):
    rows = [("u", float(i), 503) for i in range(10)]
    got = _run(spark, rows, max_retries=20, base_delay=60.0, max_delay=900.0)
    assert got["u"]["fail_streak"] == 10
    assert got["u"]["retry_delay"] == 900.0  # min(max_delay, 60*2^9)
    # equal timestamps: last-attempt pick is deterministic by (ts, status)
    tie = _run(spark, [("t", 5.0, 200), ("t", 5.0, 500)], max_retries=9)
    assert tie["t"]["last_status"] == 500


def test_randomized_python_replay(spark):
    rng = random.Random(7)
    statuses = [200, 301, 304, 403, 404, 408, 410, 429, 500, 503, 0]
    rows = []
    for u in range(40):
        n = rng.randint(1, 8)
        tss = rng.sample(range(1000), n)
        for t in tss:
            rows.append((f"u{u}", float(t), rng.choice(statuses)))
    got = _run(spark, rows, base_delay=30.0, max_delay=600.0, max_retries=3)

    def cls(s):
        if 200 <= s <= 399:
            return "success"
        if 400 <= s <= 499 and s not in (408, 429):
            return "permanent"
        return "transient"

    per = {}
    for u, t, s in rows:
        per.setdefault(u, []).append((t, s))
    for u, log in per.items():
        log.sort()
        streak = 0
        for _, s in reversed(log):
            if cls(s) != "transient":
                break
            streak += 1
        last = log[-1][1]
        if cls(last) == "success":
            state = "ok"
        elif cls(last) == "permanent":
            state = "gone"
        else:
            state = "dead" if streak > 3 else "retry"
        g = got[u]
        assert g["n_attempts"] == len(log)
        assert g["last_ts"] == log[-1][0] and g["last_status"] == last
        assert g["fail_streak"] == streak, u
        assert g["state"] == state, u
        if state == "retry":
            want = min(600.0, 30.0 * 2 ** (streak - 1))
            assert math.isclose(g["retry_delay"], want)
            assert math.isclose(g["next_attempt_ts"], log[-1][0] + want)
        else:
            assert g["retry_delay"] is None and g["next_attempt_ts"] is None


def test_single_linear_aggregate_plan(spark):
    """One shuffle (the url-key hash aggregate) — no window, no join."""
    df = spark.createDataFrame(
        [("u", 1.0, 200)], "url string, ts double, status int"
    )
    plan = (
        retry_schedule(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" not in plan and "Window" not in plan
