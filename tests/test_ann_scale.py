"""Scale-stress for the ANN/dedup bucket sizing (VERDICT r2 item 5):
recall of the multi-table random-hyperplane LSH near-dup against PLANTED
ground truth at a 10^4-vector corpus, plus the documented sizing rule."""

import numpy as np
import pandas as pd
import pytest

from cord19_crawler_spark.operators.dedup import (
    embedding_near_duplicates_lsh,
    lsh_bucket_plan,
)

DIM = 32


def test_lsh_bucket_plan_rule():
    # bits grow with n (bounded bucket size)…
    b1, _ = lsh_bucket_plan(10_000, target_bucket_rows=256)
    b2, _ = lsh_bucket_plan(1_000_000, target_bucket_rows=256)
    b3, _ = lsh_bucket_plan(100_000_000, target_bucket_rows=256)
    assert b1 < b2 < b3
    assert b1 == 6  # ceil(log2(10000/256))
    # …and tables grow with bits to hold recall (Charikar bound)
    _, l1 = lsh_bucket_plan(10_000, target_bucket_rows=256, threshold=0.95)
    _, l3 = lsh_bucket_plan(100_000_000, target_bucket_rows=256, threshold=0.95)
    assert 1 <= l1 <= l3 <= 32
    # a lenient threshold needs fewer tables than a strict one
    _, strict = lsh_bucket_plan(1_000_000, threshold=0.90)
    _, loose = lsh_bucket_plan(1_000_000, threshold=0.99)
    assert loose <= strict


@pytest.fixture(scope="module")
def planted(spark):
    """10^4-vector corpus with 500 planted near-dup pairs (dup = base +
    small noise → cosine ≈ 0.99); random dim-32 vectors are near-orthogonal
    so the planted pairs are the complete ≥0.95 ground truth."""
    rng = np.random.default_rng(123)
    base = rng.standard_normal((9_500, DIM))
    dups = base[:500] + 0.15 * rng.standard_normal((500, DIM))
    vecs = np.vstack([base, dups])
    ids = [f"v{i}" for i in range(9_500)] + [f"d{i}" for i in range(500)]
    truth = set()
    for i in range(500):
        cos = float(
            base[i] @ dups[i] / (np.linalg.norm(base[i]) * np.linalg.norm(dups[i]))
        )
        if cos >= 0.95:
            a, b = sorted((f"v{i}", f"d{i}"))
            truth.add((a, b))
    assert len(truth) > 450  # the perturbation keeps almost all above 0.95
    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(vecs.astype(float))})
    df = spark.createDataFrame(pdf).repartition(8).cache()
    df.count()
    return df, truth


def test_lsh_near_dup_recall_at_1e4(spark, planted):
    df, truth = planted
    bits, tables = lsh_bucket_plan(
        10_000, target_bucket_rows=256, threshold=0.95, target_recall=0.95
    )
    out = embedding_near_duplicates_lsh(
        df, dim=DIM, threshold=0.95, bits=bits, n_tables=tables, seed=42
    )
    found = {
        tuple(sorted((r["vec_a"], r["vec_b"]))): r["cosine"] for r in out.collect()
    }
    # precision: exact verify means every returned pair really is >= 0.95
    assert all(c >= 0.95 for c in found.values())
    assert set(found) <= truth  # random vectors produce no accidental pairs
    recall = len(set(found) & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f} below target at (b={bits}, L={tables})"


def test_lsh_near_dup_deterministic(spark, planted):
    df, _ = planted
    a = embedding_near_duplicates_lsh(df, dim=DIM, bits=6, n_tables=2, seed=7)
    b = embedding_near_duplicates_lsh(df, dim=DIM, bits=6, n_tables=2, seed=7)
    ra = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in a.collect()}
    rb = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in b.collect()}
    assert ra == rb


# ---------------------------------------------------------------------------
# hard-negative mining
# ---------------------------------------------------------------------------


def test_hard_negatives_semantics(spark):
    import math

    import pytest
    from pyspark.sql import functions as F

    from cord19_crawler_spark.operators.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),   # same label as anchor 0 -> never a negative
        (2, [0.8, 0.2], 1),
        (3, [0.0, 1.0], 1),
        (4, [-1.0, 0.0], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    anchors = emb.filter(F.col("vec_id") == 0)
    got = hard_negatives(emb, anchors, k=2).collect()
    assert [(r["neg_id"], r["rank"]) for r in got] == [(2, 1), (3, 2)]
    # hardest negative first: vec 2 is closest to the anchor
    cos = 0.8 / math.sqrt(0.8**2 + 0.2**2)
    assert got[0]["cosine"] == pytest.approx(round(cos, 6), abs=1e-9)
    with pytest.raises(ValueError):
        hard_negatives(emb, anchors, k=0)


def test_hard_negatives_plan_broadcasts_anchors_and_group_limits(spark):
    from pyspark.sql import functions as F

    from cord19_crawler_spark.operators.similarity import hard_negatives

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0], i % 3) for i in range(50)],
        "vec_id long, embedding array<float>, label int",
    )
    df = hard_negatives(emb, emb.filter(F.col("vec_id") < 2), k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # corpus scanned once with the anchor side broadcast, and the
    # per-anchor top-k pushed down as a group limit
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan


def test_ann_recall_planted_buckets(spark):
    """Anchor along +x: same-bucket vectors are recalled; a vector in a
    hamming-2 bucket is invisible to the probe even when it's the true
    nearest neighbor."""
    from pyspark.sql import functions as F

    from cord19_crawler_spark.operators.similarity import ann_recall_at_k

    rows = [
        (0, [1.0, 1.0, 1.0], 0),     # anchor, bucket 111
        (1, [0.9, 1.0, 1.0], 0),     # same bucket
        (2, [1.0, -0.1, 1.0], 0),    # hamming-1
        (3, [0.99, -0.1, -0.1], 0),  # hamming-2: closest by cosine? no — but unseen
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = ann_recall_at_k(
        emb, emb.filter(F.col("vec_id") == 0), k=3, bucket_dims=3
    ).collect()[0]
    assert out["exact_k"] == 3
    assert out["lsh_k"] == 2          # vec 3 not probed
    assert out["hits"] == 2
    assert out["recall"] == 2 / 3


def test_ann_recall_perfect_when_probe_covers(spark):
    import pytest
    from pyspark.sql import functions as F

    from cord19_crawler_spark.operators.similarity import ann_recall_at_k

    emb = spark.createDataFrame(
        [(i, [1.0 + i, 2.0], 0) for i in range(12)],
        "vec_id long, embedding array<float>, label int",
    )
    out = ann_recall_at_k(
        emb, emb.filter(F.col("vec_id") < 2), k=5, bucket_dims=2
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r["recall"] == 1.0 and r["hits"] == 5
    with pytest.raises(ValueError):
        ann_recall_at_k(emb, emb, k=0)
