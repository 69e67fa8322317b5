"""Connected components (operators/graph.py): hand graphs, randomized
cross-checks against a Python union-find brute force, two-phase vs
label-propagation agreement, chain graphs (the diameter stressor), and
the shared-gram star-edge generator."""
import random

import pytest

from cord19_crawler_spark.operators.graph import (
    components_with_size,
    connected_components,
    shared_gram_star_edges,
)


def _brute_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, edges, algorithm):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, algorithm=algorithm)
    return {r["node"]: r["component"] for r in out.collect()}


@pytest.mark.parametrize("algorithm", ["two-phase", "label-propagation"])
def test_hand_graph(spark, algorithm):
    # Two components: {1,2,3,7} via 1-2, 2-3, 3-7 and {10,11}; dup +
    # reversed + self-loop edges must not matter.
    edges = [(2, 1), (2, 3), (7, 3), (10, 11), (11, 10), (3, 2), (5, 5)]
    got = _run(spark, edges, algorithm)
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_long_chain_two_phase_beats_diameter(spark):
    # A 60-node path is the worst case for diameter-bound propagation:
    # label-propagation needs ~60 rounds (it fails loud under a 25-round
    # cap) while two-phase converges O(log^2 n) — well under the same cap.
    edges = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, algorithm="label-propagation", max_iterations=25)
    out = connected_components(df, algorithm="two-phase", max_iterations=25)
    got = {r["node"]: r["component"] for r in out.collect()}
    assert set(got.values()) == {0}
    assert len(got) == 61
    lab_df = connected_components(df, algorithm="label-propagation", max_iterations=80)
    lab = {r["node"]: r["component"] for r in lab_df.collect()}
    assert lab == got


def test_randomized_vs_union_find_and_cross_algorithm(spark):
    rng = random.Random(7)
    nodes = list(range(0, 400, 3))  # non-contiguous ids
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(180)
    ]
    expected = _brute_components([e for e in edges if e[0] != e[1]])
    two = _run(spark, edges, "two-phase")
    lab = _run(spark, edges, "label-propagation")
    assert two == expected
    assert lab == expected


def test_components_with_size(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
    cc = connected_components(df)
    out = components_with_size(cc)
    rows = {r["node"]: (r["component"], r["component_size"], r["is_canonical"]) for r in out.collect()}
    assert rows == {
        1: (1, 3, True),
        2: (1, 3, False),
        3: (1, 3, False),
        10: (10, 2, True),
        11: (10, 2, False),
    }


def test_non_convergence_fails_loud(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, algorithm="label-propagation", max_iterations=2)


def test_shared_gram_star_edges(spark):
    # docs 1/2 share "aa bb cc"; docs 2/3 share "dd ee ff"; gram in all
    # four docs ("xx yy zz", df=4) is over max_df and contributes nothing.
    docs = spark.createDataFrame(
        [
            (1, "aa bb cc xx yy zz"),
            (2, "aa bb cc dd ee ff xx yy zz"),
            (3, "dd ee ff qq xx yy zz"),
            (4, "solo words only here xx yy zz"),
        ],
        "doc_id long, text string",
    )
    edges = shared_gram_star_edges(docs, n=3, min_df=2, max_df=3)
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    # hub is the min doc per gram: gram "aa bb cc" -> hub 1 links 2;
    # grams "dd ee ff"/"ee ff xx"... note doc2 text "...dd ee ff xx yy zz"
    # also yields "ff xx yy" etc shared with doc3 ("ff qq xx"? no).
    assert (1, 2) in got
    assert (2, 3) in got
    assert all(s < d for s, d in got)
    # doc 4 shares only the df=4 gram -> must be absent entirely
    assert not any(4 in e for e in got)
    # clustering the edges chains 1-2-3 into one component
    cc = connected_components(edges)
    comp = {r["node"]: r["component"] for r in cc.collect()}
    assert comp[1] == comp[2] == comp[3] == 1


# --- PageRank ----------------------------------------------------------------


def _py_pagerank(edges, iterations=10, d=0.85):
    edges = sorted(set((a, b) for a, b in edges if a != b))
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    outdeg = {v: 0 for v in nodes}
    for a, _ in edges:
        outdeg[a] += 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dm = sum(r[v] for v in nodes if outdeg[v] == 0)
        contrib = {v: 0.0 for v in nodes}
        for a, b in edges:
            contrib[b] += r[a] / outdeg[a]
        r = {
            v: (1 - d) / n + d * (contrib[v] + dm / n)
            for v in nodes
        }
    return r


def test_pagerank_cycle_is_uniform(spark):
    from cord19_crawler_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    rows = pagerank(edges, iterations=7).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["rank"] == pytest.approx(1 / 3, abs=1e-12)


def test_pagerank_matches_python_replay_with_dangling(spark):
    from cord19_crawler_spark.operators.graph import pagerank

    # node 4 is dangling (no outlinks); node 3 is a hub target.
    e = [(1, 3), (2, 3), (1, 2), (3, 4), (2, 4)]
    edges = spark.createDataFrame(e, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=6).collect()}
    exp = _py_pagerank(e, iterations=6)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-9)
    # total mass conserved
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_parallel_edges_and_self_loops_collapse(spark):
    from cord19_crawler_spark.operators.graph import pagerank

    a = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 1), (2, 1)], "src long, dst long"
    )
    b = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    ra = sorted((r["node"], round(r["rank"], 9)) for r in pagerank(a, 4).collect())
    rb = sorted((r["node"], round(r["rank"], 9)) for r in pagerank(b, 4).collect())
    assert ra == rb


def test_pagerank_validation(spark):
    from cord19_crawler_spark.operators.graph import pagerank

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(e, iterations=0)
    with pytest.raises(ValueError):
        pagerank(e, damping=1.5)


def test_anchor_text_index_semantics(spark):
    from cord19_crawler_spark.operators.graph import anchor_text_index

    # target 10: 4 links from 3 sources, anchors: "covid" x2, "virus" x1,
    # "" (dropped) x1; target 20: one link with a NULL anchor only -> absent
    edges = spark.createDataFrame(
        [
            (1, 10, " covid "),
            (2, 10, "covid"),
            (3, 10, "virus"),
            (1, 10, ""),
            (4, 20, None),
        ],
        "src long, dst long, anchor string",
    )
    rows = {
        (r["dst"], r["anchor_rank"]): r
        for r in anchor_text_index(edges, k=2).collect()
    }
    assert set(rows) == {(10, 1), (10, 2)}
    top = rows[(10, 1)]
    assert top["anchor"] == "covid" and top["votes"] == 2
    assert top["inlinks"] == 3  # empty-anchor link dropped
    assert top["distinct_srcs"] == 3
    assert top["n_anchors"] == 2
    second = rows[(10, 2)]
    assert second["anchor"] == "virus" and second["votes"] == 1


def test_anchor_text_index_tie_break_and_k(spark):
    from cord19_crawler_spark.operators.graph import anchor_text_index

    # three anchors with equal votes: rank order must be anchor ASC
    edges = spark.createDataFrame(
        [(s, 1, a) for s, a in enumerate(["b", "c", "a"])],
        "src long, dst long, anchor string",
    )
    got = [
        (r["anchor_rank"], r["anchor"])
        for r in anchor_text_index(edges, k=2)
        .orderBy("anchor_rank")
        .collect()
    ]
    assert got == [(1, "a"), (2, "b")]
    with pytest.raises(ValueError):
        anchor_text_index(edges, k=0)


def test_anchor_text_topk_plan_is_group_limited(spark):
    # the hot-hub safety claim: the per-dst top-k compiles to a partial
    # WindowGroupLimit, so a 10^8-inlink hub forwards <= k rows per map task
    from cord19_crawler_spark.operators.graph import anchor_text_index

    edges = spark.createDataFrame(
        [(i, i % 3, f"a{i % 7}") for i in range(100)],
        "src long, dst long, anchor string",
    )
    plan = (
        anchor_text_index(edges, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan


# ---------------------------------------------------------------------------
# k-core peeling
# ---------------------------------------------------------------------------


def test_kcore_path_graph_cascades_to_empty(spark):
    """A path peels one end per round: deep cascade, empty 2-core."""
    from cord19_crawler_spark.operators.graph import kcore

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    assert kcore(edges, k=2).count() == 0


def test_kcore_clique_plus_pendants(spark):
    """A 5-clique with pendant chains: pendants cascade off round by
    round, the clique survives at full internal degree."""
    from cord19_crawler_spark.operators.graph import kcore

    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chains = [(0, 10), (10, 11), (11, 12), (3, 20), (20, 21)]
    edges = spark.createDataFrame(clique + chains, "src long, dst long")
    got = sorted(
        (r["node"], r["core_degree"]) for r in kcore(edges, k=3).collect()
    )
    assert got == [(n, 4) for n in range(5)]
    # k=1 keeps everything (parallel/self edges collapse first)
    noisy = spark.createDataFrame(
        clique + chains + [(0, 0), (1, 0)], "src long, dst long"
    )
    assert kcore(noisy, k=1).count() == 10  # 5 clique + 5 chain nodes


def test_kcore_degeneracy_ladder(spark):
    """Each k strips exactly the < k shell: a graph with 1-, 2- and
    3-core layers reports the right membership at every k."""
    from cord19_crawler_spark.operators.graph import kcore

    # 4-clique (3-core) + a 4-cycle attached (2-core) + a pendant (1-core)
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    cyc = [(3, 5), (5, 6), (6, 7), (7, 3)]
    pend = [(7, 9)]
    edges = spark.createDataFrame(k4 + cyc + pend, "src long, dst long")
    assert kcore(edges, k=1).count() == 8  # 4 clique + 3 cycle + pendant
    n2 = sorted(r["node"] for r in kcore(edges, k=2).collect())
    assert n2 == [0, 1, 2, 3, 5, 6, 7]
    n3 = sorted(r["node"] for r in kcore(edges, k=3).collect())
    assert n3 == [0, 1, 2, 3]
    with pytest.raises(ValueError):
        kcore(edges, k=0)
    with pytest.raises(ValueError):
        kcore(edges, k=2, max_rounds=0)


def test_kcore_reliable_checkpoint_equivalence(spark, tmp_path):
    from cord19_crawler_spark.operators.graph import kcore

    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chains = [(0, 10), (10, 11), (3, 20)]
    edges = spark.createDataFrame(clique + chains, "src long, dst long")
    base = sorted(map(tuple, kcore(edges, k=3).collect()))
    ckpt = sorted(
        map(tuple, kcore(edges, k=3, checkpoint_dir=str(tmp_path)).collect())
    )
    assert base == ckpt


# ---------------------------------------------------------------------------
# HyperBall neighborhood estimation
# ---------------------------------------------------------------------------


def _balls(edges, radius):
    """Exact out-balls via Python BFS (includes the node itself)."""
    from collections import defaultdict

    adj = defaultdict(set)
    nodes = set()
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            nodes.update((s, d))
    out = {}
    for v in nodes:
        ball, frontier = {v}, {v}
        for _ in range(radius):
            frontier = {n for f in frontier for n in adj[f]} - ball
            ball |= frontier
        out[v] = ball
    return out


def test_hyperball_registers_equal_exact_ball_sketch(spark):
    """The defining law: after r rounds, node v's registers are exactly
    the HLL sketch of its radius-r BFS ball."""
    import random

    from pyspark.sql import functions as F

    from cord19_crawler_spark.operators.graph import hyperball
    from cord19_crawler_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_registers,
    )

    rng = random.Random(3)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(70)})
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["buckets_used"], r["ball_est"])
        for r in hyperball(edf, radius=2, p=6).collect()
    }
    balls = _balls(edges, 2)
    members = spark.createDataFrame(
        [(v, m) for v, ball in balls.items() for m in ball],
        "node long, member long",
    )
    want_reg = hll_registers(members, "member", group_cols=("node",), p=6)
    want = {
        r["node"]: (r["buckets_used"], r["hll_est"])
        for r in hll_estimate_from_registers(
            want_reg, group_cols=("node",), p=6
        ).collect()
    }
    assert got == want


def test_hyperball_chain_and_validation(spark):
    import pytest

    from cord19_crawler_spark.operators.graph import hyperball

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long"
    )
    out = {r["node"]: r for r in hyperball(chain, radius=2, p=8).collect()}
    # chain 0->1->..->5: |B(0,2)|=3, |B(4,2)|=2, |B(5,2)|=1; tiny sets
    # with no bucket collisions -> buckets_used is the exact ball size
    assert out[0]["buckets_used"] == 3
    assert out[4]["buckets_used"] == 2
    assert out[5]["buckets_used"] == 1
    assert out[5]["ball_est"] > 0
    with pytest.raises(ValueError):
        hyperball(chain, radius=0)


def test_link_reciprocity_planted(spark):
    from cord19_crawler_spark.operators.graph import link_reciprocity

    # ring 1<->2 (full reciprocity), 3->1 one-way, 2->4 one-way,
    # self-loop 5->5 dropped, duplicate edge collapsed
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 1), (3, 1), (2, 4), (5, 5)],
        "src long, dst long",
    )
    out = {r["node"]: r for r in link_reciprocity(edges).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1]["outdeg"], out[1]["mutual"], out[1]["reciprocity"]) == (1, 1, 1.0)
    assert (out[2]["outdeg"], out[2]["mutual"], out[2]["reciprocity"]) == (2, 1, 0.5)
    assert (out[3]["outdeg"], out[3]["mutual"], out[3]["reciprocity"]) == (1, 0, 0.0)


def test_kcore_nonconvergence_fails_loud(spark):
    from cord19_crawler_spark.operators.graph import kcore

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(path, k=2, max_rounds=3)


def test_salsa_empty_after_canon_fails_loud(spark):
    from cord19_crawler_spark.operators.graph import salsa

    only_loops = spark.createDataFrame([(5, 5)], "src long, dst long")
    with pytest.raises(ValueError, match="empty"):
        salsa(only_loops)
