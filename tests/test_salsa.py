"""SALSA (operators/graph.py:salsa): stochastic-walk invariants the
paper guarantees — per-chain L1 mass conservation, stationary authority
∝ indegree on a connected support graph, component mass shares — plus
an exact synchronous Python replay on a random digraph."""

import random

import pytest

from cord19_crawler_spark.operators.graph import salsa


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _salsa_py(edges, iterations):
    """Reference replay: same canon (distinct, no self-loops), same
    synchronous two-hop updates, float arithmetic."""
    e = sorted({(s, d) for s, d in edges if s != d})
    ind, outd = {}, {}
    for s, d in e:
        ind[d] = ind.get(d, 0) + 1
        outd[s] = outd.get(s, 0) + 1
    a = {j: 1.0 / len(ind) for j in ind}
    h = {i: 1.0 / len(outd) for i in outd}
    for _ in range(iterations):
        s_hub = {}
        for s, d in e:
            s_hub[s] = s_hub.get(s, 0.0) + a[d] / ind[d]
        a_new = {}
        for s, d in e:
            a_new[d] = a_new.get(d, 0.0) + s_hub[s] / outd[s]
        s_auth = {}
        for s, d in e:
            s_auth[d] = s_auth.get(d, 0.0) + h[s] / outd[s]
        h_new = {}
        for s, d in e:
            h_new[s] = h_new.get(s, 0.0) + s_auth[d] / ind[d]
        a, h = a_new, h_new
    return a, h


def test_salsa_mass_conservation_and_membership(spark):
    edges = [(1, 10), (2, 10), (2, 11), (3, 11), (10, 3), (4, 4)]
    out = {r["node"]: (r["authority"], r["hub"]) for r in
           salsa(_df(spark, edges), iterations=5).collect()}
    assert abs(sum(a for a, _ in out.values()) - 1.0) < 1e-9
    assert abs(sum(h for _, h in out.values()) - 1.0) < 1e-9
    # pure source: hub side only; pure sink: authority side only
    assert out[1][0] == 0.0 and out[1][1] > 0.0
    assert out[11][1] == 0.0 and out[11][0] > 0.0
    # self-loop node 4 dropped entirely
    assert 4 not in out


def test_salsa_stationary_authority_proportional_to_indegree(spark):
    # connected authority-side support graph: hubs 1,2,3; 3 links both
    edges = [(1, 10), (2, 10), (3, 10), (3, 11)]
    out = {r["node"]: r["authority"] for r in
           salsa(_df(spark, edges), iterations=40).collect()}
    assert out[10] == pytest.approx(0.75, abs=1e-9)
    assert out[11] == pytest.approx(0.25, abs=1e-9)


def test_salsa_disconnected_components_keep_mass_share(spark):
    # two disjoint support components, one authority each: each keeps
    # its INITIAL share (1/2), regardless of internal degree
    edges = [(1, 10), (2, 10), (3, 20)]
    out = {r["node"]: r["authority"] for r in
           salsa(_df(spark, edges), iterations=25).collect()}
    assert out[10] == pytest.approx(0.5, abs=1e-9)
    assert out[20] == pytest.approx(0.5, abs=1e-9)


def test_salsa_matches_python_replay(spark):
    rng = random.Random(7)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(120)})
    got = {r["node"]: (r["authority"], r["hub"]) for r in
           salsa(_df(spark, edges), iterations=4).collect()}
    a, h = _salsa_py(edges, 4)
    nodes = set(a) | set(h)
    assert set(got) == nodes
    for n in nodes:
        assert got[n][0] == pytest.approx(a.get(n, 0.0), abs=1e-12)
        assert got[n][1] == pytest.approx(h.get(n, 0.0), abs=1e-12)


def test_salsa_validation(spark):
    with pytest.raises(ValueError):
        salsa(_df(spark, [(1, 2)]), iterations=0)
