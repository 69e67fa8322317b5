"""Count-Min sketch (operators/sketches.py) and Elias-Fano postings
(operators/compression.py): never-undercount, cell-wise mergeability,
planted split parameters, and round-trip equality."""

import random

import pytest
from pyspark.sql import functions as F

from cord19_crawler_spark.operators.compression import (
    elias_fano_decode_df,
    elias_fano_encode_df,
)
from cord19_crawler_spark.operators.sketches import (
    cms_counters,
    cms_estimate,
    cms_heavy_hitters,
)


def _items(spark, words):
    return spark.createDataFrame([(w,) for w in words], "word string")


def test_cms_never_undercounts_and_single_key_exact(spark):
    rng = random.Random(5)
    words = [f"w{rng.randrange(30)}" for _ in range(800)]
    true = {}
    for w in words:
        true[w] = true.get(w, 0) + 1
    counters = cms_counters(_items(spark, words), d=4, w=64)
    probes = _items(spark, sorted(true))
    est = {
        r["word"]: r["est"]
        for r in cms_estimate(counters, probes, d=4, w=64).collect()
    }
    assert set(est) == set(true)
    for w, t in true.items():
        assert est[w] >= t
    # one key only: every cell holds exactly its count
    solo = cms_counters(_items(spark, ["k"] * 17), d=3, w=8)
    got = cms_estimate(solo, _items(spark, ["k"]), d=3, w=8).collect()
    assert got[0]["est"] == 17


def test_cms_counters_merge_cellwise(spark):
    words = [f"w{i % 7}" for i in range(200)]
    whole = cms_counters(_items(spark, words), d=4, w=32)
    a = cms_counters(_items(spark, words[:90]), d=4, w=32)
    b = cms_counters(_items(spark, words[90:]), d=4, w=32)
    merged = (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    lhs = {(r["row"], r["col"]): r["cnt"] for r in whole.collect()}
    rhs = {(r["row"], r["col"]): r["cnt"] for r in merged.collect()}
    assert lhs == rhs


def test_cms_heavy_hitters_threshold_and_order(spark):
    words = ["a"] * 50 + ["b"] * 30 + ["c"] * 2
    out = cms_heavy_hitters(
        _items(spark, words), _items(spark, ["a", "b", "c"]),
        d=4, w=128, threshold=10,
    ).collect()
    assert [r["word"] for r in out][:2] == ["a", "b"]
    assert all(r["est"] >= 10 for r in out)
    with pytest.raises(ValueError):
        cms_counters(_items(spark, words), d=0, w=8)


def _postings(spark, pairs):
    return spark.createDataFrame(pairs, "word string, doc_id long")


def test_elias_fano_planted_split(spark):
    # U = 16 (max id 15), word 'x' has n=2 -> U//n=8 -> l=3
    pairs = [("x", 5), ("x", 15), ("y", 3)]
    enc = {
        (r["word"], r["idx"]): (r["l"], r["low"], r["high_delta"])
        for r in elias_fano_encode_df(_postings(spark, pairs)).collect()
    }
    # x: 5 = high 0, low 5; 15 = high 1, low 7
    assert enc[("x", 0)] == (3, 5, 0)
    assert enc[("x", 1)] == (3, 7, 1)
    # y: n=1 -> l = bit_length(16) - 1 = 4 -> low = 3, high = 0
    assert enc[("y", 0)] == (4, 3, 0)


@pytest.mark.parametrize("seed", [1, 13])
def test_elias_fano_round_trip_randomized(spark, seed):
    rng = random.Random(seed)
    pairs = []
    for w in ["a", "b", "c"]:
        ids = sorted(rng.sample(range(2000), rng.randrange(1, 40)))
        pairs += [(w, i) for i in ids]
    enc = elias_fano_encode_df(_postings(spark, pairs))
    dec = elias_fano_decode_df(enc).collect()
    got = sorted((r["word"], r["doc_id"]) for r in dec)
    assert got == sorted(pairs)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _keys(spark, keys, grp="g"):
    return spark.createDataFrame([(grp, k) for k in keys], "g string, k string")


def test_hll_estimate_within_expected_error(spark):
    from cord19_crawler_spark.operators.sketches import hll_cardinality

    n = 20000
    df = _keys(spark, [f"url{i}" for i in range(n)])
    row = hll_cardinality(df, "k", group_cols=("g",), p=12).collect()[0]
    # std error ~ 1.04/sqrt(4096) = 1.6%; allow 4 sigma
    assert abs(row["hll_est"] - n) / n < 0.065
    assert 0 < row["buckets_used"] <= 4096


def test_hll_duplicate_insensitive(spark):
    from cord19_crawler_spark.operators.sketches import hll_cardinality

    keys = [f"u{i}" for i in range(500)]
    once = hll_cardinality(_keys(spark, keys), "k", ("g",), p=10).collect()[0]
    thrice = hll_cardinality(
        _keys(spark, keys * 3), "k", ("g",), p=10
    ).collect()[0]
    assert once["hll_est"] == thrice["hll_est"]
    assert once["buckets_used"] == thrice["buckets_used"]


def test_hll_registers_merge_by_max(spark):
    """Registers over disjoint halves, merged with max on (g, bucket),
    equal the registers of the whole stream — the sketch's merge law."""
    from cord19_crawler_spark.operators.sketches import hll_registers

    keys = [f"k{i}" for i in range(3000)]
    whole = hll_registers(_keys(spark, keys), "k", ("g",), p=8)
    a = hll_registers(_keys(spark, keys[:1500]), "k", ("g",), p=8)
    b = hll_registers(_keys(spark, keys[1500:]), "k", ("g",), p=8)
    merged = (
        a.union(b).groupBy("g", "bucket").agg(F.max("m").alias("m"))
    )
    lhs = sorted(map(tuple, whole.collect()))
    rhs = sorted(map(tuple, merged.collect()))
    assert lhs == rhs


def test_hll_linear_counting_small_range(spark):
    """Tiny cardinality relative to m: the linear-counting branch fires
    and is EXACT when every key lands in its own bucket."""
    from cord19_crawler_spark.operators.sketches import hll_cardinality

    import math

    row = hll_cardinality(
        _keys(spark, [f"x{i}" for i in range(5)]), "k", ("g",), p=12
    ).collect()[0]
    m = 4096
    used = row["buckets_used"]
    assert row["hll_est"] == m * math.log(m / (m - used))


def test_hll_p_validation(spark):
    from cord19_crawler_spark.operators.sketches import hll_registers

    with pytest.raises(ValueError):
        hll_registers(_keys(spark, ["a"]), "k", ("g",), p=3)
    with pytest.raises(ValueError):
        hll_registers(_keys(spark, ["a"]), "k", ("g",), p=19)


def test_hll_null_keys_dropped(spark):
    """NULL keys must not inflate buckets_used or bias the estimate."""
    from cord19_crawler_spark.operators.sketches import hll_cardinality

    clean = _keys(spark, [f"u{i}" for i in range(100)])
    dirty = clean.unionByName(
        spark.createDataFrame([("g", None)] * 5, "g string, k string")
    )
    a = hll_cardinality(clean, "k", ("g",), p=10).collect()[0]
    b = hll_cardinality(dirty, "k", ("g",), p=10).collect()[0]
    assert (a["buckets_used"], a["hll_est"]) == (b["buckets_used"], b["hll_est"])
