"""stratified_sample: exact-k per-group deterministic sampling.

Pins (1) exact agreement with a Python replay of the Knuth-hash order,
(2) bit-identity of the salted two-phase plan vs the single-phase plan
(including under heavy group skew), (3) small-group semantics (groups
with fewer than k rows are kept whole), (4) validation.
"""
import pytest

import pyspark.sql.functions as F

from cord19_crawler_spark.operators.traindata import (
    _KNUTH,
    _M32,
    stratified_sample,
)


def _py_sample(rows, k):
    by_grp = {}
    for i, g in rows:
        by_grp.setdefault(g, []).append(i)
    out = {}
    for g, ids in by_grp.items():
        order = sorted(ids, key=lambda i: ((i * _KNUTH) % _M32, i))
        for rank, i in enumerate(order[:k], start=1):
            out[(g, i)] = rank
    return out


def test_exact_python_replay_and_small_groups(spark):
    # group sizes 9 / 3 / 1 with k=4: one truncated, two kept whole
    rows = (
        [(i, "big") for i in range(0, 900, 100)]
        + [(i, "mid") for i in (7, 13, 29)]
        + [(42, "solo")]
    )
    df = spark.createDataFrame(rows, "doc_id long, src string")
    got = stratified_sample(df, 4, group_col="src").collect()
    exp = _py_sample(rows, 4)
    assert {(r["src"], r["doc_id"]): r["sample_rank"] for r in got} == exp
    assert len(got) == 4 + 3 + 1


def test_salted_vs_single_phase_identical_under_skew(spark):
    # one hot group (500 rows) next to tiny ones — the salted two-phase
    # plan must return byte-identical rows to the direct window
    rows = [(i, "hot") for i in range(500)] + [
        (1000 + i, f"cold{i % 3}") for i in range(9)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    a = stratified_sample(df, 5, group_col="src", salt_buckets=16)
    b = stratified_sample(df, 5, group_col="src", salt_buckets=1)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    assert len(ra) == 5 + 3 * 3
    # within the hot group the ranks follow the hash permutation exactly
    hot = sorted((r for r in ra if r[1] == "hot"), key=lambda r: r[2])
    keys = [((i * _KNUTH) % _M32, i) for i, _, _ in hot]
    assert keys == sorted(keys)


def test_single_phase_plan_has_partial_group_limit(spark):
    # the skew-safety claim: rank<=k over a row_number window compiles to
    # a PARTIAL WindowGroupLimit before the one exchange, so map tasks
    # forward at most k rows per group
    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(100)], "doc_id long, src string"
    )
    plan = (
        stratified_sample(df, 5, group_col="src", salt_buckets=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert plan.count("Exchange") == 1


def test_rank_dtype_and_columns(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id long, src string")
    out = stratified_sample(df, 1, group_col="src")
    assert [f.name for f in out.schema.fields] == ["doc_id", "src", "sample_rank"]
    assert dict(out.dtypes)["sample_rank"] == "bigint"


def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, src string")
    with pytest.raises(ValueError):
        stratified_sample(df, 0, group_col="src")
    with pytest.raises(ValueError):
        stratified_sample(df, 3, group_col="src", salt_buckets=0)
