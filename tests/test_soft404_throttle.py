"""Soft-404 detection (frontier/soft404.py) and adaptive host throttle
(frontier/throttle.py): planted-evidence cases, randomized Python
replays, NULL/precedence edges, and corpus-never-shuffled plan shape."""

import random

import pytest

from cord19_crawler_spark.frontier.soft404 import soft404_detect
from cord19_crawler_spark.frontier.throttle import host_throttle

FETCH_SCHEMA = (
    "url string, host string, status int, fingerprint string, is_probe boolean"
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, FETCH_SCHEMA)


def test_soft404_planted_host(spark):
    rows = [
        # Host A answers the random probe 200 with the error fingerprint.
        ("a/_probe", "a", 200, "errA", True),
        ("a/real", "a", 200, "fp1", False),
        ("a/dead1", "a", 200, "errA", False),
        ("a/dead2", "a", 200, "errA", False),
        ("a/gone", "a", 404, "errA", False),  # hard 404: not soft404
        # Host B refuses random paths properly.
        ("b/_probe", "b", 404, "errB", True),
        ("b/real", "b", 200, "errB", False),
        # Host C has no probe at all.
        ("c/real", "c", 200, "fp9", False),
    ]
    got = {r["url"]: r for r in soft404_detect(_rows(spark, rows)).collect()}
    assert len(got) == 6  # probe rows excluded from output
    assert got["a/dead1"]["soft404"] and got["a/dead2"]["soft404"]
    assert not got["a/real"]["soft404"]
    assert not got["a/gone"]["soft404"]  # non-2xx never soft404
    assert got["a/real"]["host_behavior"] == "soft404"
    # B's probe 404s: matching fingerprint on a real page is NOT flagged.
    assert not got["b/real"]["soft404"]
    assert got["b/real"]["host_behavior"] == "hard404"
    assert got["c/real"]["host_behavior"] == "unknown"
    assert not got["c/real"]["soft404"]


def test_soft404_null_fingerprint_and_precedence(spark):
    rows = [
        # NULL-fingerprint 2xx probe must NOT create a catch-all signature.
        ("d/_probe", "d", 200, None, True),
        ("d/page", "d", 200, None, False),
        # Host with BOTH a 2xx and a 4xx probe: soft404 wins (pinned).
        ("e/_p1", "e", 200, "errE", True),
        ("e/_p2", "e", 404, "other", True),
        ("e/dead", "e", 200, "errE", False),
        # Probe with a 5xx only: no evidence either way.
        ("f/_probe", "f", 503, "x", True),
        ("f/page", "f", 200, "x", False),
    ]
    got = {r["url"]: r for r in soft404_detect(_rows(spark, rows)).collect()}
    assert not got["d/page"]["soft404"]
    assert got["d/page"]["host_behavior"] == "soft404"  # 2xx probe happened
    assert got["e/dead"]["soft404"]
    assert got["e/dead"]["host_behavior"] == "soft404"
    assert got["f/page"]["host_behavior"] == "unknown"
    assert not got["f/page"]["soft404"]


def test_soft404_matches_python_replay_randomized(spark):
    rng = random.Random(23)
    rows = []
    for i in range(400):
        host = f"h{rng.randrange(12)}"
        probe = rng.random() < 0.1
        status = rng.choice([200, 200, 200, 404, 500])
        fp = rng.choice([f"err-{host}", f"fp-{i}", None])
        rows.append((f"{host}/u{i}", host, status, fp, probe))
    sigs = {
        (h, fp)
        for (_, h, st, fp, p) in rows
        if p and 200 <= st <= 299 and fp is not None
    }
    beh = {}
    for (_, h, st, _, p) in rows:
        if not p:
            continue
        cur = beh.get(h)
        if 200 <= st <= 299:
            beh[h] = "soft404"
        elif 400 <= st <= 499 and cur != "soft404":
            beh[h] = "hard404"
        else:
            beh.setdefault(h, "unknown")
    want = {
        u: (
            beh.get(h, "unknown"),
            200 <= st <= 299 and (h, fp) in sigs,
        )
        for (u, h, st, fp, p) in rows
        if not p
    }
    got = {
        r["url"]: (r["host_behavior"], r["soft404"])
        for r in soft404_detect(_rows(spark, rows)).collect()
    }
    assert got == want


def test_soft404_log_never_shuffled(spark):
    """Signature + behavior tables broadcast back; the only exchanges
    are on the tiny probe slice, and both joins are broadcast."""
    plan = (
        soft404_detect(_rows(spark, [("u", "h", 200, "f", False)]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2


THROTTLE_SCHEMA = "host string, status int, retry_after double"


def test_host_throttle_planted(spark):
    rows = (
        # quiet: 4 fetches, zero throttles -> base_delay exactly
        [("q", 200, None)] * 4
        # hot: 10 fetches, 3 throttled (30% -> 6 steps), Retry-After 40
        + [("hot", 200, None)] * 7
        + [("hot", 429, 40.0), ("hot", 503, None), ("hot", 429, 7.0)]
        # slammed: all throttled -> steps capped, delay capped at max
        + [("slam", 503, None)] * 5
        # retry-after on a SUCCESS row must be ignored
        + [("q2", 200, 999.0), ("q2", 429, 3.0)]
    )
    df = spark.createDataFrame(rows, THROTTLE_SCHEMA)
    got = {
        r["host"]: r
        for r in host_throttle(
            df, base_delay=1.0, max_delay=600.0, backoff=2.0, max_steps=10
        ).collect()
    }
    assert got["q"]["recommended_delay"] == 1.0
    assert got["q"]["max_retry_after"] is None
    # hot: floor(20*3/10)=6 steps -> 1*2^6=64 > retry_after 40
    assert got["hot"]["recommended_delay"] == 64.0
    assert got["hot"]["max_retry_after"] == 40.0
    assert got["hot"]["throttle_rate"] == pytest.approx(0.3)
    # slam: steps capped at 10 -> 1024 > max_delay -> 600
    assert got["slam"]["recommended_delay"] == 600.0
    # q2: 50% -> 10 steps... floor(20*1/2)=10 -> 2^10 capped to 600;
    # the 999 retry_after on the 200 row is ignored
    assert got["q2"]["max_retry_after"] == 3.0
    assert got["q2"]["recommended_delay"] == 600.0


def test_host_throttle_retry_after_dominates(spark):
    df = spark.createDataFrame(
        [("h", 200, None)] * 99 + [("h", 429, 120.0)], THROTTLE_SCHEMA
    )
    got = host_throttle(df, base_delay=1.0, max_delay=600.0).collect()[0]
    # floor(20/100)=0 steps -> backed_off=1, but Retry-After 120 wins.
    assert got["recommended_delay"] == 120.0


def test_host_throttle_matches_python_replay_randomized(spark):
    rng = random.Random(5)
    rows = [
        (
            f"h{rng.randrange(15)}",
            rng.choice([200, 200, 200, 404, 429, 503]),
            float(rng.randrange(1, 300)) if rng.random() < 0.4 else None,
        )
        for _ in range(600)
    ]
    base, mx, bo, cap = 2.0, 900.0, 3.0, 5
    agg = {}
    for h, st, ra in rows:
        n, nt, mra = agg.get(h, (0, 0, None))
        thr = st in (429, 503)
        if thr and ra is not None:
            mra = ra if mra is None else max(mra, ra)
        agg[h] = (n + 1, nt + (1 if thr else 0), mra)
    want = {}
    for h, (n, nt, mra) in agg.items():
        steps = min((20 * nt) // n, cap)
        want[h] = min(mx, max(base * bo**steps, mra or 0.0, base))
    df = spark.createDataFrame(rows, THROTTLE_SCHEMA)
    got = {
        r["host"]: r["recommended_delay"]
        for r in host_throttle(
            df, base_delay=base, max_delay=mx, backoff=bo, max_steps=cap
        ).collect()
    }
    assert got == pytest.approx(want)


def test_host_throttle_single_linear_aggregate_plan(spark):
    df = spark.createDataFrame([("h", 200, None)], THROTTLE_SCHEMA)
    plan = (
        host_throttle(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan and "Window" not in plan


def test_host_throttle_validation(spark):
    df = spark.createDataFrame([("h", 200, None)], THROTTLE_SCHEMA)
    with pytest.raises(ValueError):
        host_throttle(df, base_delay=0.0)
    with pytest.raises(ValueError):
        host_throttle(df, base_delay=10.0, max_delay=1.0)
    with pytest.raises(ValueError):
        host_throttle(df, backoff=0.5)
