"""Sparse random projection (operators/similarity.py:random_project):
exact Python weight-hash replay, JL distance preservation on seeded
data, seed sensitivity, and the zero-shuffle plan contract."""

import math
import random

import pytest

from cord19_crawler_spark.operators.similarity import random_project


def _weight(i, j, k, seed):
    h = (1103515245 * (i * k + j + seed) + 12345) % 2147483648
    h = (1103515245 * h + 12345) % 2147483648
    u = (h >> 16) % 6
    scale = math.sqrt(3.0 / k)
    return scale if u == 0 else (-scale if u == 1 else 0.0)


def _py_project(vec, k, seed):
    return [
        round(sum(x * _weight(i, j, k, seed) for i, x in enumerate(vec)), 6)
        for j in range(k)
    ]


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_matches_python_weight_replay(spark):
    rng = random.Random(5)
    vecs = [[rng.uniform(-1, 1) for _ in range(24)] for _ in range(30)]
    k, seed = 10, 3
    got = {
        r["vec_id"]: list(r["projected"])
        for r in random_project(_emb(spark, vecs), k, seed).collect()
    }
    for i, v in enumerate(vecs):
        want = _py_project(v, k, seed)
        assert got[i] == pytest.approx(want, abs=2e-6)


def test_jl_distance_preservation_seeded(spark):
    # deterministic inputs + deterministic weights: pairwise squared
    # distances in the 48-d image stay within a bounded distortion of
    # the 64-d originals (the JL property this operator exists for)
    rng = random.Random(42)
    vecs = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(12)]
    rows = random_project(_emb(spark, vecs), out_dims=48, seed=1).collect()
    proj = {r["vec_id"]: list(r["projected"]) for r in rows}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    ratios = []
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            ratios.append(d2(proj[i], proj[j]) / d2(vecs[i], vecs[j]))
    assert all(0.3 < r < 2.0 for r in ratios)
    mean = sum(ratios) / len(ratios)
    assert 0.85 < mean < 1.15


def test_seed_changes_projection_and_same_seed_is_identical(spark):
    vecs = [[float(i) for i in range(16)]]
    a = random_project(_emb(spark, vecs), 8, seed=1).collect()[0]["projected"]
    b = random_project(_emb(spark, vecs), 8, seed=2).collect()[0]["projected"]
    c = random_project(_emb(spark, vecs), 8, seed=1).collect()[0]["projected"]
    assert list(a) == list(c)
    assert list(a) != list(b)


def test_zero_shuffle_plan_and_validation(spark):
    df = random_project(_emb(spark, [[1.0, 2.0]]), 4, seed=0)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan  # one scan-side projection
    with pytest.raises(ValueError):
        random_project(_emb(spark, [[1.0]]), 0)
