"""SemDedup (operators/dedup.py:semantic_dedup): survivor-rule semantics
incl. the chain case, kmeans-backend recall on planted duplicates, the
hot-cluster cap, and backend validation."""
import pytest

from cord19_crawler_spark.operators.dedup import semantic_dedup


def test_lower_id_survivor_rule_and_chain(spark):
    # all in one sign bucket (positive coords); vecs 1/2 near-identical,
    # 3 similar to 2 but not to 1 (the chain case), 4 orthogonal-ish
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.04, 0.0]),     # cos(1,2) ~ 0.999 -> dropped by 1
        (3, [0.93, 0.36, 0.0]),      # cos(2,3) ~ .95, cos(1,3) ~ .93
        (4, [0.1, 0.1, 0.99]),       # far from all
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(
            df, threshold=0.94, clusters="sign", bucket_dims=3
        ).collect()
    }
    # 3 is dropped via 2 even though 2 itself is dropped — the documented
    # conservative chain behavior
    assert got == {1: True, 2: False, 3: False, 4: True}


def test_clusters_isolate_comparisons(spark):
    # identical vectors in DIFFERENT sign buckets are never compared
    rows = [(1, [1.0, 1.0]), (2, [-1.0, -1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = semantic_dedup(df, threshold=0.0, clusters="sign", bucket_dims=2)
    assert all(r["kept"] for r in got.collect())


def test_kmeans_backend_drops_planted_duplicates(spark):
    import random

    rng = random.Random(7)
    base = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(40)]
    rows = [(i, v) for i, v in enumerate(base)]
    # plant near-copies of the first 10 vectors at ids 1000+
    for i in range(10):
        rows.append(
            (1000 + i, [x * 1.001 + 1e-4 for x in base[i]])
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df, threshold=0.999, clusters="kmeans", n_clusters=5, seed=3
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    # every planted copy shares a cluster with (and is dropped by) its
    # lower-id original — kmeans puts near-identical points together
    dropped = [i for i in range(1000, 1010) if not by_id[i]["kept"]]
    assert len(dropped) >= 9
    assert all(by_id[i]["kept"] for i in range(10))


def test_hot_cluster_cap_bounds_and_unknown_backend(spark):
    rows = [(i, [1.0, float(i % 3) / 10]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = semantic_dedup(df, threshold=0.9999, clusters="sign", bucket_dims=2)
    capped = semantic_dedup(
        df, threshold=0.9999, clusters="sign", bucket_dims=2, max_cluster_df=10
    )
    # cap only restricts which pairs are GENERATED: kept-count can only rise
    n_kept_un = sum(1 for r in uncapped.collect() if r["kept"])
    n_kept_cap = sum(1 for r in capped.collect() if r["kept"])
    assert n_kept_cap >= n_kept_un
    # every row still present exactly once under the cap
    assert capped.count() == 50
    with pytest.raises(ValueError):
        semantic_dedup(df, clusters="dbscan")


# ---- winnowing fingerprints (same dedup module) ----


def _py_winnow(text, k=5, w=4):
    import hashlib
    import re

    toks = re.findall("[a-z0-9]+", text.lower())
    if len(toks) < k:
        return set()
    gs = [
        int(
            hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:14],
            16,
        )
        for i in range(len(toks) - k + 1)
    ]
    if len(gs) < w:
        return set()
    sel = set()
    for s in range(len(gs) - w + 1):
        best_h, best_p = None, -1
        for j in range(s, s + w):
            if best_h is None or gs[j] <= best_h:
                best_h, best_p = gs[j], j
        sel.add((best_p, best_h))
    return sel


def test_winnowing_matches_python_replay(spark):
    from cord19_crawler_spark.operators.dedup import winnowing_fingerprints

    texts = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven one two three four five"),
        (3, "too short"),  # < k tokens: no fingerprints
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in winnowing_fingerprints(df, k=5, window=4).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, t in texts:
        assert got.get(i, set()) == _py_winnow(t), i


def test_winnowing_guarantee_shared_substring_detected(spark):
    from cord19_crawler_spark.operators.dedup import winnowing_fingerprints

    # docs share a k+w-1 = 8-token run -> MUST share >= 1 fingerprint hash
    shared = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    df = spark.createDataFrame(
        [
            (1, "unique prefix words here " + shared),
            (2, shared + " totally different suffix content words"),
        ],
        "doc_id long, text string",
    )
    fps = {}
    for r in winnowing_fingerprints(df, k=5, window=4).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2]


def test_winnowing_density_and_validation(spark):
    import pytest as _pytest

    from cord19_crawler_spark.operators.dedup import winnowing_fingerprints

    words = " ".join(f"w{i * 37 % 101}" for i in range(300))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    n = winnowing_fingerprints(df, k=5, window=8).count()
    n_grams = 300 - 5 + 1
    # paper: expected density 2/(w+1); allow generous slack
    assert n_grams * 1 / 8 <= n <= n_grams * 4 / 8
    with _pytest.raises(ValueError):
        winnowing_fingerprints(df, k=0)
    with _pytest.raises(ValueError):
        winnowing_fingerprints(df, window=0)


def test_zero_norm_vectors_survive_and_do_not_crash(spark):
    # ANSI mode faults 0.0/0.0 — zero-norm vectors (padding, empty docs)
    # must be excluded from pair generation but kept in the output
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 1e-4]),       # near-dup of 1 -> dropped
        (3, [0.0, 0.0]),        # zero norm
        (4, [0.0, 0.0]),        # second zero norm in the same bucket
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(
            df, threshold=0.99, clusters="sign", bucket_dims=2
        ).collect()
    }
    assert got == {1: True, 2: False, 3: True, 4: True}
