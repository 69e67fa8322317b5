"""Largest-remainder budget apportionment (frontier/budget.py): exact-sum
property, known hand case, determinism, and validation."""
import pytest

from cord19_crawler_spark.frontier.budget import apportion_budget


def test_hand_case_matches_hamilton(spark):
    # weights 5/3/2 over budget 7: quotas 3.5/2.1/1.4 -> bases 3/2/1,
    # leftover 1 goes to the largest fraction (.5 -> host a)
    w = spark.createDataFrame(
        [("a", 5.0), ("b", 3.0), ("c", 2.0)], "host string, weight double"
    )
    got = {r["host"]: r for r in apportion_budget(w, total=7).collect()}
    assert {h: r["budget"] for h, r in got.items()} == {"a": 4, "b": 2, "c": 1}
    assert {h: r["base"] for h, r in got.items()} == {"a": 3, "b": 2, "c": 1}
    assert sum(r["extra"] for r in got.values()) == 1


def test_sum_is_exact_and_deterministic(spark):
    rows = [(f"h{i}", float((i * 13) % 47 + 1)) for i in range(60)]
    w = spark.createDataFrame(rows, "host string, weight double")
    a = sorted(map(tuple, apportion_budget(w, total=997).collect()))
    b = sorted(map(tuple, apportion_budget(w, total=997).collect()))
    assert a == b
    assert sum(r[4] for r in a) == 997
    # proportionality: budget within 1 of the exact quota everywhere
    wsum = sum(x for _, x in rows)
    for host, weight, base, extra, budget in a:
        assert abs(budget - weight / wsum * 997) < 1.0 + 1e-9


def test_zero_budget_and_validation(spark):
    w = spark.createDataFrame(
        [("a", 1.0), ("b", 0.0)], "host string, weight double"
    )
    got = {r["host"]: r["budget"] for r in apportion_budget(w, total=0).collect()}
    assert got == {"a": 0, "b": 0}
    with pytest.raises(ValueError):
        apportion_budget(w, total=-1)
    neg = spark.createDataFrame([("a", -1.0)], "host string, weight double")
    with pytest.raises(ValueError):
        apportion_budget(neg, total=5)
    zero = spark.createDataFrame([("a", 0.0)], "host string, weight double")
    with pytest.raises(ValueError):
        apportion_budget(zero, total=5)


def test_null_weight_rejected(spark):
    w = spark.createDataFrame(
        [("a", 1.0), ("b", None)], "host string, weight double"
    )
    with pytest.raises(ValueError):
        apportion_budget(w, total=5)
