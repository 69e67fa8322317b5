"""OPIC online page importance (operators/graph.py:opic): exact Python
replay of the pinned synchronous virtual-root semantics, cash
invariance, and the checkpoint seam."""

import random

import pytest

from cord19_crawler_spark.operators.graph import opic


def _py_opic(edges, iterations):
    edges = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    out = {u: [d for s, d in edges if s == u] for u in nodes}
    cash = {u: 1.0 / n for u in nodes}
    hist = {u: 0.0 for u in nodes}
    for _ in range(iterations):
        root = sum(cash[u] for u in nodes if not out[u])
        recv = {u: 0.0 for u in nodes}
        for s, d in edges:
            recv[d] += cash[s] / len(out[s])
        hist = {u: hist[u] + cash[u] for u in nodes}
        cash = {u: recv[u] + root / n for u in nodes}
    th = sum(hist.values())
    return {u: (hist[u] + cash[u]) / (th + 1.0) for u in nodes}, cash, hist


def _spark_opic(spark, edges, iterations, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r for r in opic(df, iterations=iterations, **kw).collect()
    }


def test_randomized_python_replay(spark):
    rng = random.Random(5)
    edges = [(rng.randint(0, 19), rng.randint(0, 19)) for _ in range(70)]
    got = _spark_opic(spark, edges, 5)
    imp, cash, hist = _py_opic(edges, 5)
    assert set(got) == set(imp)
    for u in imp:
        assert got[u]["importance"] == pytest.approx(imp[u], abs=1e-9)
        assert got[u]["cash"] == pytest.approx(cash[u], abs=1e-9)
        assert got[u]["history"] == pytest.approx(hist[u], abs=1e-9)
    # total cash is invariant (= 1) under distribution + virtual root
    assert sum(r["cash"] for r in got.values()) == pytest.approx(1.0)


def test_dangling_redistribution_and_checkpoint(spark, tmp_path):
    # 2 -> 0 -> 1, node 1 dangling: its cash must re-enter via the root
    edges = [(2, 0), (0, 1)]
    got = _spark_opic(spark, edges, 6)
    assert all(r["cash"] > 0 for r in got.values())
    # the funneled-to node outranks the pure source
    assert got[1]["importance"] > got[2]["importance"]
    reli = _spark_opic(
        spark, edges, 6, checkpoint_dir=str(tmp_path / "opic")
    )
    for u, r in got.items():
        assert reli[u]["importance"] == pytest.approx(
            r["importance"], abs=1e-12
        )
