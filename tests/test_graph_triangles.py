"""Triangle counting (degree-oriented compact-forward) and co-citation /
bibliographic coupling (operators/graph.py): planted structures,
degenerate-input collapse, hot-key cap, randomized Python replays."""

import itertools
import random

import pytest

from cord19_crawler_spark.operators.graph import copair_counts, triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _tri(spark, pairs):
    return {
        r["node"]: r["triangles"] for r in triangle_count(_edges(spark, pairs)).collect()
    }


def test_triangles_k4_and_path(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _tri(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    path = [(0, 1), (1, 2), (2, 3)]
    assert _tri(spark, path) == {}


def test_triangles_direction_parallel_self_collapse(spark):
    # one triangle expressed with reversed, duplicated and self edges
    pairs = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (1, 2)]
    assert _tri(spark, pairs) == {0: 1, 1: 1, 2: 1}


def test_triangles_two_overlapping(spark):
    # triangles {0,1,2} and {0,1,3} share edge (0,1)
    pairs = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
    assert _tri(spark, pairs) == {0: 2, 1: 2, 2: 1, 3: 1}


def _py_triangles(pairs):
    adj = {}
    es = set()
    for s, d in pairs:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        if (a, b) in es:
            continue
        es.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for a, b in es:
        for c in adj[a] & adj[b]:
            if c > b:  # each triangle once: a < b < c
                for n in (a, b, c):
                    out[n] = out.get(n, 0) + 1
    return out


@pytest.mark.parametrize("seed", [2, 13])
def test_triangles_match_python_replay_randomized(spark, seed):
    rng = random.Random(seed)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(180)]
    assert _tri(spark, pairs) == _py_triangles(pairs)


def _pairs(df):
    return {(r["node_a"], r["node_b"]): r["strength"] for r in df.collect()}


def test_cocitation_planted(spark):
    # sources 10,11 both cite {1,2}; 12 cites {1,2,3}
    e = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 2), (12, 3)]
    got = _pairs(copair_counts(_edges(spark, e), "cocitation", None))
    assert got == {(1, 2): 3, (1, 3): 1, (2, 3): 1}


def test_coupling_planted_and_parallel_collapse(spark):
    # 1 and 2 both cite {10, 11}; duplicate edges are one citation
    e = [(1, 10), (1, 10), (1, 11), (2, 10), (2, 11), (3, 10)]
    got = _pairs(copair_counts(_edges(spark, e), "coupling", None))
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}


def test_copair_hot_key_cap_bites(spark):
    # hub source 99 cites 12 pages; source 7 cites 2 — cap 5 keeps only 7
    e = [(99, i) for i in range(200, 212)] + [(7, 300), (7, 301)]
    capped = _pairs(copair_counts(_edges(spark, e), "cocitation", 5))
    assert capped == {(300, 301): 1}
    uncapped = _pairs(copair_counts(_edges(spark, e), "cocitation", None))
    assert len(uncapped) == len(list(itertools.combinations(range(12), 2))) + 1


def test_copair_mode_validation(spark):
    with pytest.raises(ValueError):
        copair_counts(_edges(spark, [(1, 2)]), mode="nope")


def test_clustering_coefficient_planted(spark):
    from cord19_crawler_spark.operators.graph import clustering_coefficient

    # 4-clique (C=1 everywhere) + pendant 9 on node 0 + isolated edge 7-8
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(
        k4 + [(0, 9), (7, 8)], "src long, dst long"
    )
    out = {r["node"]: r for r in clustering_coefficient(edges).collect()}
    # clique interior: d=3, T=3 -> C=1; node 0: d=4, T=3 -> 2*3/12=0.5
    for n in (1, 2, 3):
        assert (out[n]["degree"], out[n]["triangles"], out[n]["clustering"]) == (3, 3, 1.0)
    assert (out[0]["degree"], out[0]["triangles"], out[0]["clustering"]) == (4, 3, 0.5)
    # pendant and isolated edge: d=1 -> C=0, zero triangles, still present
    for n in (9, 7, 8):
        assert (out[n]["degree"], out[n]["triangles"], out[n]["clustering"]) == (1, 0, 0.0)
