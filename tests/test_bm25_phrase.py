"""BM25 ranking and positional phrase search (operators/search.py):
exact Python replays, planted adjacency/overlap cases, and the
scalar-vs-DataFrame N contract."""

import math
import random

import pytest
from pyspark.sql import functions as F

from cord19_crawler_spark.operators.indexing import tokens_from_text
from cord19_crawler_spark.operators.search import bm25_search, phrase_search


def _postings(spark, rows):
    return spark.createDataFrame(rows, "word string, doc_id long, tf long")


def _py_bm25(rows, terms, n_docs, k1=1.2, b=0.75):
    doclen = {}
    for w, d, tf in rows:
        doclen[d] = doclen.get(d, 0) + tf
    avgdl = sum(doclen.values()) / n_docs
    dfs = {}
    for w, d, tf in rows:
        if w in terms:
            dfs.setdefault(w, set()).add(d)
    out = {}
    for w, d, tf in rows:
        if w not in terms:
            continue
        df = len(dfs[w])
        idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
        wgt = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * doclen[d] / avgdl))
        s, m = out.get(d, (0.0, 0))
        out[d] = (s + wgt, m + 1)
    return {d: (round(s, 6), m) for d, (s, m) in out.items()}


def test_bm25_matches_python_replay_randomized(spark):
    rng = random.Random(3)
    words = [f"w{i}" for i in range(12)]
    rows = sorted(
        {(rng.choice(words), rng.randrange(25), rng.randrange(1, 9)) for _ in range(200)},
    )
    # unique (word, doc) keys
    seen, uniq = set(), []
    for w, d, tf in rows:
        if (w, d) not in seen:
            seen.add((w, d))
            uniq.append((w, d, tf))
    terms = ["w1", "w5", "w9"]
    want = _py_bm25(uniq, set(terms), n_docs=30)
    got = {
        r["doc_id"]: (r["score"], r["matched_terms"])
        for r in bm25_search(_postings(spark, uniq), terms, 30, k=None).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d][1] == want[d][1]
        assert got[d][0] == pytest.approx(want[d][0], abs=2e-6)


def test_bm25_dataframe_n_equals_scalar_n(spark):
    rows = [("a", 1, 3), ("a", 2, 1), ("b", 1, 2), ("c", 3, 5)]
    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    a = sorted(map(tuple, bm25_search(_postings(spark, rows), ["a", "b"], 10, k=None).collect()))
    b = sorted(map(tuple, bm25_search(_postings(spark, rows), ["a", "b"], docs, k=None).collect()))
    assert a == b and len(a) == 2


def test_bm25_empty_terms_and_topk(spark):
    rows = [("a", i, 1 + i % 3) for i in range(10)]
    empty = bm25_search(_postings(spark, rows), [], 10)
    assert empty.count() == 0
    assert empty.columns == ["doc_id", "score", "matched_terms"]
    top3 = bm25_search(_postings(spark, rows), ["a"], 10, k=3).collect()
    assert len(top3) == 3
    scores = [r["score"] for r in top3]
    assert scores == sorted(scores, reverse=True)


def test_bm25_length_normalization_direction(spark):
    # same tf, shorter doc must score higher (b > 0)
    rows = [("q", 1, 2), ("pad", 1, 50), ("q", 2, 2)]
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_search(_postings(spark, rows), ["q"], 2, k=None).collect()
    }
    assert got[2] > got[1]


def _tokens_df(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return tokens_from_text(df)


def test_phrase_search_planted(spark):
    docs = [
        (1, "alpha beta gamma alpha beta"),  # "alpha beta" twice
        (2, "alpha gamma beta"),  # not adjacent
        (3, "beta alpha"),  # wrong order
        (4, "alpha the beta"),  # stopword gap breaks adjacency
    ]
    got = {
        r["doc_id"]: r["phrase_tf"]
        for r in phrase_search(_tokens_df(spark, docs), ["alpha", "beta"]).collect()
    }
    assert got == {1: 2}


def test_phrase_search_overlapping_repeats(spark):
    docs = [(1, "boom boom boom boom"), (2, "boom once boom")]
    got = {
        r["doc_id"]: r["phrase_tf"]
        for r in phrase_search(_tokens_df(spark, docs), ["boom", "boom"]).collect()
    }
    assert got == {1: 3}  # overlapping occurrences count


def test_phrase_search_trigram_and_validation(spark):
    docs = [(1, "one two three four one two three"), (2, "one two four three")]
    got = {
        r["doc_id"]: r["phrase_tf"]
        for r in phrase_search(
            _tokens_df(spark, docs), ["one", "two", "three"]
        ).collect()
    }
    assert got == {1: 2}
    with pytest.raises(ValueError):
        phrase_search(_tokens_df(spark, docs), [])


def test_phrase_search_matches_python_replay_randomized(spark):
    rng = random.Random(17)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(30))) for i in range(20)
    ]
    phrase = ["aa", "bb"]
    want = {}
    for d, text in docs:
        toks = text.split()
        c = sum(
            1
            for j in range(len(toks) - 1)
            if toks[j] == "aa" and toks[j + 1] == "bb"
        )
        if c:
            want[d] = c
    got = {
        r["doc_id"]: r["phrase_tf"]
        for r in phrase_search(_tokens_df(spark, docs), phrase).collect()
    }
    assert got == want
