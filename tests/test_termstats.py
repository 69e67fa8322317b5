"""PMI collocations + per-doc TF-IDF keywords (operators/termstats.py):
planted adjacency/tie cases and randomized Python replays."""

import math
import random
from collections import defaultdict

import pytest

from cord19_crawler_spark.operators.termstats import (
    pmi_collocations,
    tfidf_doc_keywords,
)


def _tokens(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, pos int, word string")


def _postings(spark, rows):
    return spark.createDataFrame(rows, "word string, doc_id long, tf long")


def test_pmi_adjacency_respects_position_gaps(spark):
    # doc 1: a(0) b(1) [gap at 2: removed stopword] c(3) — only (a,b) pairs
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 3, "c")] * 1
    rows = [(d, p, w) for d, p, w in rows]
    # replicate 5x across docs to clear min_count
    rows = [(doc, p, w) for doc in range(5) for (_, p, w) in rows]
    got = pmi_collocations(_tokens(spark, rows), min_count=5).collect()
    assert [(r["w1"], r["w2"], r["pair_count"]) for r in got] == [("a", "b", 5)]


def test_pmi_values_match_python_replay(spark):
    rng = random.Random(11)
    vocab = ["x", "y", "z", "q"]
    rows = []
    for d in range(30):
        for p in range(rng.randrange(3, 12)):
            rows.append((d, p, vocab[rng.randrange(len(vocab))]))
    got = {
        (r["w1"], r["w2"]): (r["pair_count"], r["pmi"])
        for r in pmi_collocations(_tokens(spark, rows), min_count=2).collect()
    }
    uni = defaultdict(int)
    pairs = defaultdict(int)
    by_doc = defaultdict(dict)
    for d, p, w in rows:
        uni[w] += 1
        by_doc[d][p] = w
    for d, posmap in by_doc.items():
        for p, w in posmap.items():
            if p + 1 in posmap:
                pairs[(w, posmap[p + 1])] += 1
    n = float(sum(uni.values()))
    np_ = float(sum(pairs.values()))
    want = {
        k: (c, round(math.log((c / np_) / ((uni[k[0]] / n) * (uni[k[1]] / n))), 6))
        for k, c in pairs.items()
        if c >= 2
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-6)


def test_pmi_ordering_and_min_count_validation(spark):
    rows = [(d, p, w) for d in range(10) for p, w in enumerate(["a", "b", "a", "c"])]
    out = pmi_collocations(_tokens(spark, rows), min_count=1).collect()
    pmis = [r["pmi"] for r in out]
    assert pmis == sorted(pmis, reverse=True)
    with pytest.raises(ValueError):
        pmi_collocations(_tokens(spark, rows), min_count=0)


def test_doc_keywords_planted_weights_and_ties(spark):
    # doc 1: 'rare' tf=2 (df=1), 'common' tf=5 (df=3) — rare wins on idf
    rows = [
        ("rare", 1, 2),
        ("common", 1, 5),
        ("common", 2, 1),
        ("common", 3, 1),
    ]
    got = tfidf_doc_keywords(_postings(spark, rows), 3, k=2).collect()
    d1 = sorted(
        [(r["rank"], r["word"], r["weight"]) for r in got if r["doc_id"] == 1]
    )
    w_rare = (1 + math.log(2)) * (math.log(4.0 / 2.0) + 1)
    w_common = (1 + math.log(5)) * (math.log(4.0 / 4.0) + 1)
    assert d1[0][1] == "rare" and d1[0][0] == 1
    assert d1[0][2] == pytest.approx(round(w_rare, 6), abs=1e-6)
    assert d1[1][1] == "common" and d1[1][2] == pytest.approx(
        round(w_common, 6), abs=1e-6
    )
    # tf=1 keeps weight multiplier 1.0; word-asc tiebreak on equal weight
    rows2 = [("b", 9, 1), ("a", 9, 1)]
    got2 = tfidf_doc_keywords(_postings(spark, rows2), 1, k=2).collect()
    assert [(r["rank"], r["word"]) for r in sorted(got2, key=lambda r: r["rank"])] == [
        (1, "a"),
        (2, "b"),
    ]
    with pytest.raises(ValueError):
        tfidf_doc_keywords(_postings(spark, rows2), 1, k=0)


def test_doc_keywords_k_cap_and_dataframe_total(spark):
    rows = [(f"w{i}", 1, i + 1) for i in range(6)]
    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    got = tfidf_doc_keywords(_postings(spark, rows), docs, k=4).collect()
    assert len(got) == 4
    assert sorted(r["rank"] for r in got) == [1, 2, 3, 4]
