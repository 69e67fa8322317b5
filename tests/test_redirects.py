"""Redirect-chain resolution (frontier/redirects.py): exact endpoints
and hop counts, loop and cap semantics, function-ization of duplicate
edges, the reliable-checkpoint seam, and a randomized Python replay."""
import pytest

from cord19_crawler_spark.frontier.redirects import resolve_redirects


def _resolve(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["src"]: r for r in resolve_redirects(df, **kw).collect()}


def test_chains_loops_and_terminals(spark):
    got = _resolve(
        spark,
        [
            ("a", "b"), ("b", "c"), ("c", "d"),   # a -> d in 3
            ("x", "y"),                           # one hop
            ("p", "q"), ("q", "p"),               # 2-loop
            ("in", "p"),                          # feeds the loop
        ],
    )
    assert got["a"]["final_url"] == "d" and got["a"]["hops"] == 3
    assert got["b"]["final_url"] == "d" and got["b"]["hops"] == 2
    assert got["x"]["final_url"] == "y" and got["x"]["hops"] == 1
    for s in ("a", "b", "c", "x"):
        assert got[s]["resolved"]
    for s in ("p", "q", "in"):
        assert not got[s]["resolved"]
        assert got[s]["final_url"] is None and got[s]["hops"] is None
    # terminals (d, y) have no out-edge -> no row
    assert set(got) == {"a", "b", "c", "x", "p", "q", "in"}


def test_max_hops_cap_cuts_terminating_chains(spark):
    # a 10-hop terminating chain: resolved at cap >= 10, cut below it
    chain = [(f"n{i}", f"n{i+1}") for i in range(10)]
    ok = _resolve(spark, chain, max_hops=10)
    assert ok["n0"]["resolved"] and ok["n0"]["hops"] == 10
    cut = _resolve(spark, chain, max_hops=9)
    assert not cut["n0"]["resolved"]
    assert cut["n0"]["final_url"] is None
    # n1's chain is 9 hops -> still resolved under the same cap
    assert cut["n1"]["resolved"] and cut["n1"]["hops"] == 9
    with pytest.raises(ValueError):
        _resolve(spark, chain, max_hops=0)


def test_duplicate_edges_min_dst_wins(spark):
    got = _resolve(spark, [("a", "c"), ("a", "b"), ("b", "t")])
    # min dst 'b' is the function value, so a resolves via b -> t
    assert got["a"]["final_url"] == "t" and got["a"]["hops"] == 2


def test_reliable_checkpoint_equivalence(spark, tmp_path):
    edges = [(f"n{i}", f"n{i+1}") for i in range(20)] + [("l1", "l2"), ("l2", "l1")]
    base = _resolve(spark, edges, max_hops=32)
    reli = _resolve(
        spark, edges, max_hops=32, checkpoint_dir=str(tmp_path / "ckpt")
    )
    assert {s: tuple(r) for s, r in base.items()} == {
        s: tuple(r) for s, r in reli.items()
    }
    assert any((tmp_path / "ckpt").rglob("*"))


def test_python_replay_randomized(spark):
    import random

    rng = random.Random(11)
    # random functional graph over 120 nodes, ~15% terminals, loops likely
    nodes = [f"u{i}" for i in range(120)]
    edges = []
    for i, s in enumerate(nodes):
        if i % 7 == 0:
            continue  # terminal
        edges.append((s, nodes[rng.randrange(120)]))
    max_hops = 16
    got = _resolve(spark, edges, max_hops=max_hops)

    fn = {}
    for s, d in edges:
        fn[s] = min(fn.get(s, d), d)
    expect = {}
    for s in fn:
        cur, hops = fn[s], 1
        while cur in fn and hops <= max_hops:
            cur, hops = fn[cur], hops + 1
        if cur not in fn and hops <= max_hops:
            expect[s] = (cur, hops, True)
        else:
            expect[s] = (None, None, False)
    assert {
        s: (r["final_url"], r["hops"], r["resolved"]) for s, r in got.items()
    } == expect
