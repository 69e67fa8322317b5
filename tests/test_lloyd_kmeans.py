"""Fixed-iteration Lloyd k-means (operators/similarity.py:lloyd_kmeans):
exact Python replay of every round (seeding, tie-break, empty-cluster
retention), planted separable clusters, reliable-checkpoint equivalence."""

import math
import random

import pytest

from cord19_crawler_spark.operators.similarity import lloyd_kmeans


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def _py_lloyd(vecs, k, iterations):
    cent = {c: list(vecs[c]) for c in range(k)}  # lowest-id seeding

    def assign():
        out = {}
        for vid, v in enumerate(vecs):
            best = min(
                cent,
                key=lambda c: (
                    sum((x - y) ** 2 for x, y in zip(v, cent[c])),
                    c,
                ),
            )
            out[vid] = best
        return out

    for _ in range(iterations):
        a = assign()
        for c in range(k):
            members = [vecs[vid] for vid, cl in a.items() if cl == c]
            if members:  # empty cluster keeps its previous centroid
                cent[c] = [
                    sum(col) / len(members) for col in zip(*members)
                ]
    final = assign()
    return {
        vid: (
            c,
            round(
                math.sqrt(
                    sum((x - y) ** 2 for x, y in zip(vecs[vid], cent[c]))
                ),
                6,
            ),
        )
        for vid, c in final.items()
    }


@pytest.mark.parametrize("seed,k,iters", [(3, 4, 3), (9, 6, 2)])
def test_matches_python_replay_randomized(spark, seed, k, iters):
    rng = random.Random(seed)
    vecs = [[rng.uniform(-1, 1) for _ in range(6)] for _ in range(30)]
    want = _py_lloyd(vecs, k, iters)
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in lloyd_kmeans(_emb(spark, vecs), k=k, iterations=iters).collect()
    }
    assert set(got) == set(want)
    for vid in want:
        assert got[vid][0] == want[vid][0]
        assert got[vid][1] == pytest.approx(want[vid][1], abs=2e-6)


def test_planted_separable_clusters(spark):
    # two tight blobs far apart; seeds 0 and 1 both start in blob A, but
    # two rounds pull one centroid across to blob B
    blob_a = [[0.0 + 0.01 * i, 0.0] for i in range(5)]
    blob_b = [[10.0 + 0.01 * i, 10.0] for i in range(5)]
    vecs = blob_a + blob_b
    got = {
        r["vec_id"]: r["cluster"]
        for r in lloyd_kmeans(_emb(spark, vecs), k=2, iterations=3).collect()
    }
    a_clusters = {got[i] for i in range(5)}
    b_clusters = {got[i] for i in range(5, 10)}
    assert len(a_clusters) == 1 and len(b_clusters) == 1
    assert a_clusters != b_clusters


def test_reliable_checkpoint_dir_equivalence(spark, tmp_path):
    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(4)] for _ in range(20)]
    base = sorted(
        map(tuple, lloyd_kmeans(_emb(spark, vecs), k=3, iterations=2).collect())
    )
    ck = sorted(
        map(
            tuple,
            lloyd_kmeans(
                _emb(spark, vecs),
                k=3,
                iterations=2,
                checkpoint_dir=str(tmp_path / "ck"),
            ).collect(),
        )
    )
    assert base == ck


def test_validation(spark):
    df = _emb(spark, [[1.0, 2.0]])
    with pytest.raises(ValueError):
        lloyd_kmeans(df, k=0)
    with pytest.raises(ValueError):
        lloyd_kmeans(df, k=2, iterations=-1)
