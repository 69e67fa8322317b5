"""Hot-bucket caps for banded candidate generation (VERDICT r3 #2).

A degenerate band bucket (boilerplate flood: d documents with identical
band values) contributes O(d²) candidate pairs — the classic web-dedup
blowup. ``max_bucket_df`` sub-samples over-full buckets to a deterministic
cap, bounding each bucket's contribution at C(cap, 2) while still linking
the kept sample (the flood is detected, the shuffle stays bounded).
"""

import pytest
from pyspark.sql import functions as F

from cord19_crawler_spark.operators.dedup import (
    embedding_near_duplicates,
    lsh_candidate_pairs,
    minhash_near_duplicates,
    simhash_near_duplicates,
)

FLOOD = 2000
CAP = 8


def _flood_signatures(spark, num_perm=8):
    """FLOOD identical signatures (one degenerate bucket per band) + one
    planted colliding pair + isolated singles."""
    rows = []
    for i in range(FLOOD):
        rows.append((f"flood{i:05d}", *[7] * num_perm))
    # planted pair: identical in band 0 (mh_0, mh_1), distinct elsewhere
    rows.append(("pair_a", 1, 2, 30, 40, 50, 60, 70, 80))
    rows.append(("pair_b", 1, 2, 31, 41, 51, 61, 71, 81))
    rows.append(("single", 100, 101, 102, 103, 104, 105, 106, 107))
    cols = "doc_id string, " + ", ".join(f"mh_{i} long" for i in range(num_perm))
    return spark.createDataFrame(rows, cols)


def test_lsh_cap_bounds_flood_pairs(spark):
    sig = _flood_signatures(spark)
    capped = lsh_candidate_pairs(sig, bands=4, max_bucket_df=CAP)
    pairs = capped.collect()
    bound = 4 * CAP * (CAP - 1) // 2 + 4  # flood bound + planted pair slack
    assert len(pairs) <= bound, len(pairs)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # the flood IS still detected: kept sample links internally
    assert any(a.startswith("flood") and b.startswith("flood") for a, b in got)
    # a normal-size bucket (the planted band-0 pair) is untouched
    assert ("pair_a", "pair_b") in got
    # nothing pairs with the isolated doc
    assert not any("single" in p for r in pairs for p in (r["doc_a"], r["doc_b"]))


def test_lsh_cap_is_deterministic_smallest_ids(spark):
    sig = _flood_signatures(spark)
    capped = lsh_candidate_pairs(sig, bands=4, max_bucket_df=CAP)
    flood_members = sorted(
        {
            d
            for r in capped.collect()
            for d in (r["doc_a"], r["doc_b"])
            if d.startswith("flood")
        }
    )
    # kept members are exactly the CAP smallest flood ids (every band has
    # the same degenerate bucket, so the union over bands is the same set)
    assert flood_members == [f"flood{i:05d}" for i in range(CAP)]


def test_cap_none_equals_capped_when_no_hot_bucket(spark):
    """On benign data (no bucket over the cap) the capped plan returns
    bit-identical results — the guard costs recall only where it fires."""
    docs = spark.createDataFrame(
        [
            (f"d{i}", f"alpha beta gamma delta epsilon zeta {i} eta theta iota kappa")
            for i in range(30)
        ]
        + [("dup_x", "one two three four five six seven eight nine ten"),
           ("dup_y", "one two three four five six seven eight nine ten")],
        "doc_id string, text string",
    )
    base = minhash_near_duplicates(docs, num_perm=8, bands=4, threshold=0.5)
    capped = minhash_near_duplicates(
        docs, num_perm=8, bands=4, threshold=0.5, max_bucket_df=100
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, capped.collect()))
    assert capped.filter(
        (F.col("doc_a") == "dup_x") & (F.col("doc_b") == "dup_y")
    ).count() == 1


def test_simhash_cap_bounds_flood(spark):
    docs = spark.createDataFrame(
        [(f"f{i:04d}", "the same boilerplate text repeated everywhere") for i in range(500)]
        + [("u1", "completely different unique content here"),
           ("u2", "completely different unique material here")],
        "doc_id string, text string",
    )
    out = simhash_near_duplicates(
        docs, bits=32, max_hamming=3, bands=4, max_bucket_df=CAP
    )
    rows = out.collect()
    # identical docs → hamming 0 pairs among the kept sample only
    flood_pairs = [r for r in rows if r["doc_a"].startswith("f") and r["doc_b"].startswith("f")]
    assert 0 < len(flood_pairs) <= CAP * (CAP - 1) // 2
    assert all(r["hamming"] == 0 for r in flood_pairs)


def test_embedding_cap_bounds_flood(spark):
    vec = [1.0, 0.5, 0.25, 0.1]
    rows = [(f"v{i:04d}", vec) for i in range(300)] + [
        ("w1", [-1.0, -0.5, -0.25, -0.1]),
        ("w2", [-1.0, -0.5, -0.26, -0.1]),
    ]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = embedding_near_duplicates(
        emb, threshold=0.95, bucket_dims=4, max_bucket_df=CAP
    )
    got = out.collect()
    flood = [r for r in got if r["vec_a"].startswith("v") and r["vec_b"].startswith("v")]
    assert 0 < len(flood) <= CAP * (CAP - 1) // 2
    # the small opposite-sign bucket is untouched by the cap
    assert any({r["vec_a"], r["vec_b"]} == {"w1", "w2"} for r in got)


def test_production_defaults_are_capped():
    """r4 verdict item #3: the e2e near-dup entry points must default to a
    BOUNDED bucket cap (a 100-TB caller should not need to know the
    degenerate-bucket footgun exists); the low-level primitive keeps None
    (exact mode), and oracle rows opt out explicitly."""
    import inspect

    from cord19_crawler_spark.operators import dedup

    assert dedup.DEFAULT_MAX_BUCKET_DF == 10_000
    for fn, param in [
        (dedup.minhash_near_duplicates, "max_bucket_df"),
        (dedup.simhash_near_duplicates, "max_bucket_df"),
        (dedup.embedding_near_duplicates, "max_bucket_df"),
        (dedup.embedding_near_duplicates_lsh, "max_bucket_df"),
        (dedup.semantic_dedup, "max_cluster_df"),
    ]:
        default = inspect.signature(fn).parameters[param].default
        assert default == dedup.DEFAULT_MAX_BUCKET_DF, fn.__name__
    assert (
        inspect.signature(dedup.lsh_candidate_pairs).parameters["max_bucket_df"].default
        is None
    )
