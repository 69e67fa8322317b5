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
