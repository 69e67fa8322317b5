"""HITS hubs/authorities (operators/graph.py:hits): exact Python replay
of the pinned Kleinberg I-then-O iteration on randomized graphs, known
structure on a planted hub/authority pattern, and the checkpoint seam."""

import math
import random

import pytest

from cord19_crawler_spark.operators.graph import hits


def _py_hits(edges, iterations):
    edges = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({n for e in edges for n in e})
    hub = {n: 1.0 for n in nodes}
    auth = {n: 0.0 for n in nodes}
    for _ in range(iterations):
        auth = {n: 0.0 for n in nodes}
        for s, d in edges:
            auth[d] += hub[s]
        na = math.sqrt(sum(v * v for v in auth.values()))
        if na > 0:
            auth = {n: v / na for n, v in auth.items()}
        hub = {n: 0.0 for n in nodes}
        for s, d in edges:
            hub[s] += auth[d]
        nh = math.sqrt(sum(v * v for v in hub.values()))
        if nh > 0:
            hub = {n: v / nh for n, v in hub.items()}
    return auth, hub


def _spark_hits(spark, edges, iterations, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: (r["authority"], r["hub"])
        for r in hits(df, iterations=iterations, **kw).collect()
    }


def test_planted_hub_authority_structure(spark):
    # node 0 links to everything (pure hub); node 9 is linked by
    # everything (pure authority); 5 is isolated from the pattern except
    # one stray edge so it appears in the node set.
    edges = [(0, d) for d in range(1, 10)] + [(s, 9) for s in range(1, 9)]
    edges += [(5, 6)]
    got = _spark_hits(spark, edges, 8)
    auth, hub = _py_hits(edges, 8)
    for n in auth:
        assert got[n][0] == pytest.approx(auth[n], abs=1e-9)
        assert got[n][1] == pytest.approx(hub[n], abs=1e-9)
    # structural sanity: 9 is the top authority, 0 the top hub
    assert max(auth, key=auth.get) == 9
    assert max(hub, key=hub.get) == 0
    assert got[0][0] == 0.0  # nothing links to 0


def test_randomized_python_replay_with_parallel_and_self_edges(spark):
    rng = random.Random(11)
    edges = [(rng.randint(0, 24), rng.randint(0, 24)) for _ in range(120)]
    got = _spark_hits(spark, edges, 6)
    auth, hub = _py_hits(edges, 6)  # replay dedups + drops self-loops too
    assert set(got) == set(auth)
    for n in auth:
        assert got[n][0] == pytest.approx(auth[n], abs=1e-9)
        assert got[n][1] == pytest.approx(hub[n], abs=1e-9)


def test_reliable_checkpoint_equivalence(spark, tmp_path):
    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 2)]
    fast = _spark_hits(spark, edges, 5)
    reli = _spark_hits(
        spark, edges, 5, checkpoint_dir=str(tmp_path / "hits")
    )
    for n, (a, h) in fast.items():
        assert reli[n][0] == pytest.approx(a, abs=1e-12)
        assert reli[n][1] == pytest.approx(h, abs=1e-12)
