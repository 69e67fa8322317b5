"""Pruned BM25 (MaxScore-style), SymSpell spelling correction, and best
snippet windows (operators/search.py): equality with the exhaustive
plans, planted edge cases, and randomized Python replays."""

import random

import pytest
from pyspark.sql import functions as F

from cord19_crawler_spark.operators.indexing import tokens_from_text
from cord19_crawler_spark.operators.search import (
    best_snippet_windows,
    bm25_search,
    bm25_search_pruned,
    delete_neighborhood,
    spelling_correction,
)


def _postings(spark, rows):
    return spark.createDataFrame(rows, "word string, doc_id long, tf long")


def _rand_postings(seed, n_words=15, n_docs=40, n=350):
    rng = random.Random(seed)
    seen, rows = set(), []
    for _ in range(n):
        w, d = f"w{rng.randrange(n_words)}", rng.randrange(n_docs)
        if (w, d) not in seen:
            seen.add((w, d))
            rows.append((w, d, rng.randrange(1, 12)))
    return rows


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_pruned_bm25_equals_full_bm25_randomized(spark, seed):
    rows = _rand_postings(seed)
    terms = ["w0", "w3", "w7", "w11"]
    full = bm25_search(_postings(spark, rows), terms, 50, k=20).collect()
    pruned = bm25_search_pruned(
        _postings(spark, rows), terms, 50, k=20
    ).collect()
    assert [tuple(r) for r in pruned] == [tuple(r) for r in full]


def test_pruned_bm25_skewed_corpus_and_small_k(spark):
    # one rare high-idf term, one term matching every doc: the seed
    # threshold from the rare term must not drop any true top-k doc
    rows = [("rare", d, 3) for d in range(4)]
    rows += [("common", d, 1 + d % 5) for d in range(60)]
    for k in (1, 3, 10):
        full = bm25_search(
            _postings(spark, rows), ["rare", "common"], 60, k=k
        ).collect()
        pruned = bm25_search_pruned(
            _postings(spark, rows), ["rare", "common"], 60, k=k
        ).collect()
        assert [tuple(r) for r in pruned] == [tuple(r) for r in full]


def test_pruned_bm25_fewer_matches_than_k_and_empty_terms(spark):
    rows = [("a", 1, 2), ("a", 2, 1), ("b", 9, 4)]
    full = bm25_search(_postings(spark, rows), ["a"], 10, k=20).collect()
    pruned = bm25_search_pruned(
        _postings(spark, rows), ["a"], 10, k=20
    ).collect()
    assert [tuple(r) for r in pruned] == [tuple(r) for r in full]
    assert len(pruned) == 2
    empty = bm25_search_pruned(_postings(spark, rows), [], 10)
    assert empty.count() == 0
    assert empty.columns == ["doc_id", "score", "matched_terms"]


def _lexicon(spark, words):
    return spark.createDataFrame(
        [(w, c) for w, c in words], "word string, total_count long"
    )


def test_delete_neighborhood_keys(spark):
    got = {
        (r["del_key"], r["word"])
        for r in delete_neighborhood(_lexicon(spark, [("abc", 1)])).collect()
    }
    assert got == {(k, "abc") for k in ["abc", "bc", "ac", "ab"]}


def test_spelling_correction_planted_ranking(spark):
    lex = _lexicon(
        spark, [("row", 943), ("slow", 918), ("sort", 872), ("sow", 7)]
    )
    got = [tuple(r) for r in spelling_correction(lex, "sow", k=5).collect()]
    # exact match first, then distance-1 by frequency desc; sort is dist 2
    assert got == [("sow", 0, 7), ("row", 1, 943), ("slow", 1, 918)]


def test_spelling_correction_symspell_false_positive_killed(spark):
    # 'ab' and 'ba' share delete keys but are at distance 2: the verify
    # step must drop the candidate
    lex = _lexicon(spark, [("ba", 10), ("ab", 5)])
    got = [tuple(r) for r in spelling_correction(lex, "ab", k=5).collect()]
    assert got == [("ab", 0, 5)]


def test_spelling_correction_matches_bruteforce_randomized(spark):
    rng = random.Random(11)
    alphabet = "abcd"
    words = sorted(
        {"".join(rng.choice(alphabet) for _ in range(rng.randrange(2, 6)))
         for _ in range(60)}
    )
    lex = _lexicon(spark, [(w, i + 1) for i, w in enumerate(words)])
    query = "abca"

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = sorted(
        (
            (w, lev(w, query), i + 1)
            for i, w in enumerate(words)
            if lev(w, query) <= 1
        ),
        key=lambda t: (t[1], -t[2], t[0]),
    )[:5]
    got = [tuple(r) for r in spelling_correction(lex, query, k=5).collect()]
    assert got == want


def test_spelling_correction_max_edit_2_fallback(spark):
    lex = _lexicon(spark, [("batch", 9), ("match", 8), ("bath", 3)])
    got = [
        tuple(r)
        for r in spelling_correction(lex, "botch", max_edit=2, k=5).collect()
    ]
    assert got == [("batch", 1, 9), ("match", 2, 8), ("bath", 2, 3)]


def _tokens_df(spark, docs):
    return tokens_from_text(
        spark.createDataFrame(docs, "doc_id long, text string")
    )


def test_snippets_planted(spark):
    docs = [
        # hits at pos 0,1,9 -> window [0,10) holds 3; [1,11) holds 2
        (1, "aa bb x0 x1 x2 x3 x4 x5 x6 aa x7"),
        # single hit
        (2, "x0 bb x1"),
        # no hits
        (3, "x0 x1 x2"),
    ]
    got = {
        r["doc_id"]: (r["start"], r["hits"], r["n_terms"])
        for r in best_snippet_windows(
            _tokens_df(spark, docs), ["aa", "bb"], window=10
        ).collect()
    }
    assert got == {1: (0, 3, 2), 2: (1, 1, 1)}


def test_snippets_tie_prefers_earliest_start(spark):
    docs = [(1, "aa x0 x1 x2 aa x3 x4 x5 aa")]  # hits at 0, 4, 8
    got = best_snippet_windows(
        _tokens_df(spark, docs), ["aa"], window=5
    ).collect()
    # [0,5) and [4,9) both hold 2 hits -> earliest start wins
    assert (got[0]["start"], got[0]["hits"]) == (0, 2)


def test_snippets_matches_python_replay_randomized(spark):
    rng = random.Random(23)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(40))) for i in range(15)
    ]
    terms, window = ["aa", "bb"], 7
    want = {}
    for d, text in docs:
        toks = text.split()
        hit_pos = [i for i, t in enumerate(toks) if t in terms]
        best = None
        for s in hit_pos:
            in_w = [p for p in hit_pos if s <= p < s + window]
            key = (len(in_w), -s)
            if best is None or key > best[0]:
                best = (key, (s, len(in_w), len({toks[p] for p in in_w})))
        if best:
            want[d] = best[1]
    got = {
        r["doc_id"]: (r["start"], r["hits"], r["n_terms"])
        for r in best_snippet_windows(
            _tokens_df(spark, docs), terms, window=window
        ).collect()
    }
    assert got == want


def test_snippets_empty_terms_raises(spark):
    with pytest.raises(ValueError):
        best_snippet_windows(_tokens_df(spark, [(1, "aa")]), [])


# ---------------------------------------------------------------------------
# Dirichlet query likelihood, conjunctive AND, champion lists
# ---------------------------------------------------------------------------


def _dirichlet_replay(rows, terms, mu, k):
    """Driver-side replay of the pinned Dirichlet QL semantics."""
    import math
    from collections import defaultdict

    mass = float(sum(tf for _, _, tf in rows))
    ctf = defaultdict(float)
    doclen = defaultdict(int)
    hits = defaultdict(list)
    for w, d, tf in rows:
        doclen[d] += tf
        if w in terms:
            ctf[w] += tf
            hits[d].append((w, tf))
    nq = float(len(ctf))
    out = []
    for d, ws in hits.items():
        s = sum(math.log(1 + tf / (mu * ctf[w] / mass)) for w, tf in ws)
        s += nq * math.log(mu / (doclen[d] + mu))
        out.append((d, round(s, 6), len(ws)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


@pytest.mark.parametrize("seed", [2, 9])
def test_lm_dirichlet_matches_python_replay(spark, seed):
    from cord19_crawler_spark.operators.search import lm_dirichlet_search

    rows = _rand_postings(seed)
    terms = ["w1", "w4", "w9"]
    got = [
        tuple(r)
        for r in lm_dirichlet_search(
            _postings(spark, rows), terms, mu=50.0, k=15
        ).collect()
    ]
    want = _dirichlet_replay(rows, set(terms), 50.0, 15)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-6)
        assert g[2] == w[2]


def test_lm_dirichlet_corpus_absent_term_ignored(spark):
    from cord19_crawler_spark.operators.search import lm_dirichlet_search

    rows = [("a", 1, 2), ("a", 2, 1), ("b", 1, 3)]
    base = lm_dirichlet_search(
        _postings(spark, rows), ["a"], mu=10.0, k=None
    ).collect()
    # 'zzz' never occurs: ctf empty -> contributes nothing, |q| unchanged
    plus = lm_dirichlet_search(
        _postings(spark, rows), ["a", "zzz"], mu=10.0, k=None
    ).collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in plus]
    with pytest.raises(ValueError):
        lm_dirichlet_search(_postings(spark, rows), [], mu=10.0)


def test_conjunctive_search_planted(spark):
    from cord19_crawler_spark.operators.search import conjunctive_search

    rows = [
        ("x", 1, 5), ("y", 1, 2),          # doc 1: both, total 7, min 2
        ("x", 2, 1), ("y", 2, 9),          # doc 2: both, total 10, min 1
        ("x", 3, 8),                        # doc 3: x only -> excluded
        ("y", 4, 8),                        # doc 4: y only -> excluded
    ]
    got = [
        tuple(r)
        for r in conjunctive_search(_postings(spark, rows), ["x", "y"]).collect()
    ]
    assert got == [(2, 10, 1), (1, 7, 2)]
    # duplicate query terms collapse; k caps the result
    one = conjunctive_search(
        _postings(spark, rows), ["x", "x", "y"], k=1
    ).collect()
    assert tuple(one[0]) == (2, 10, 1)
    with pytest.raises(ValueError):
        conjunctive_search(_postings(spark, rows), [])


def test_champion_lists_cut_and_equivalence(spark):
    from cord19_crawler_spark.operators.search import (
        champion_lists,
        tfidf_search,
    )

    rows = [("w", d, tf) for d, tf in [(1, 5), (2, 5), (3, 4), (4, 1)]]
    rows += [("v", d, 2) for d in range(1, 8)]
    champs = champion_lists(_postings(spark, rows), m=2).collect()
    by_word = {}
    for r in champs:
        by_word.setdefault(r["word"], []).append((r["doc_id"], r["tf"]))
    # tf desc, doc_id asc tiebreak: docs 1 and 2 (both tf=5)
    assert sorted(by_word["w"]) == [(1, 5), (2, 5)]
    assert len(by_word["v"]) == 2 and sorted(by_word["v"])[0] == (1, 2)
    # m >= longest posting list: champion retrieval == full retrieval
    full = tfidf_search(_postings(spark, rows), ["w", "v"], 10, k=None).collect()
    tier = tfidf_search(
        champion_lists(_postings(spark, rows), m=100), ["w", "v"], 10, k=None
    ).collect()
    assert [tuple(r) for r in tier] == [tuple(r) for r in full]
    with pytest.raises(ValueError):
        champion_lists(_postings(spark, rows), m=0)


# ---------------------------------------------------------------------------
# RM3 pseudo-relevance feedback
# ---------------------------------------------------------------------------


def _rm3_replay(rows, terms, mu, fb_docs, fb_terms, lam):
    """Pure-Python replay of every pinned RM3 stage."""
    import math
    from collections import defaultdict

    fb = _dirichlet_replay(rows, set(terms), mu, fb_docs)
    mx = max(s for _, s, _ in fb)
    ee = {d: math.exp(s - mx) for d, s, _ in fb}
    z = sum(ee.values())
    pd = {d: e / z for d, e in ee.items()}
    doclen = defaultdict(int)
    for w, d, tf in rows:
        doclen[d] += tf
    rm1 = defaultdict(float)
    for w, d, tf in rows:
        if d in pd:
            rm1[w] += tf / float(doclen[d]) * pd[d]
    top = sorted(
        ((w, round(p, 9)) for w, p in rm1.items()),
        key=lambda x: (-x[1], x[0]),
    )[:fb_terms]
    out = {}
    for t in terms:
        out[t] = lam * (1.0 / len(terms))
    for w, p in top:
        out[w] = out.get(w, 0.0) + (1 - lam) * p
    return {w: round(v, 6) for w, v in out.items()}


@pytest.mark.parametrize("seed", [3, 11])
def test_rm3_matches_python_replay(spark, seed):
    from cord19_crawler_spark.operators.search import rm3_expansion

    rows = _rand_postings(seed)
    terms = ["w1", "w4", "w9"]
    got = {
        r["word"]: r["weight"]
        for r in rm3_expansion(
            _postings(spark, rows), terms, mu=50.0, fb_docs=8, fb_terms=6,
            lam=0.4,
        ).collect()
    }
    want = _rm3_replay(rows, terms, 50.0, 8, 6, 0.4)
    assert got == pytest.approx(want, abs=2e-6)


def test_rm3_flags_and_mass(spark):
    from cord19_crawler_spark.operators.search import rm3_expansion

    rows = [("a", 1, 4), ("b", 1, 2), ("c", 2, 3), ("a", 2, 1)]
    out = rm3_expansion(
        _postings(spark, rows), ["a"], mu=10.0, fb_docs=2, fb_terms=10,
        lam=0.5,
    ).collect()
    by = {r["word"]: r for r in out}
    assert by["a"]["from_query"] and by["a"]["from_feedback"]
    assert not by["b"]["from_query"] and by["b"]["from_feedback"]
    # full vocab fits in fb_terms -> both models are distributions, so
    # the interpolated mass is 1
    assert sum(r["weight"] for r in out) == pytest.approx(1.0, abs=1e-5)
    with pytest.raises(ValueError):
        rm3_expansion(_postings(spark, rows), ["a"], lam=1.5)
    with pytest.raises(ValueError):
        rm3_expansion(_postings(spark, rows), ["a"], fb_docs=0)


# ---------------------------------------------------------------------------
# reciprocal-rank fusion
# ---------------------------------------------------------------------------


def test_rrf_fuse_known_values(spark):
    from cord19_crawler_spark.operators.search import rrf_fuse

    run1 = spark.createDataFrame(
        [(1, 3.0), (2, 2.0), (3, 1.0)], "doc_id long, score double"
    )
    run2 = spark.createDataFrame(
        [(2, 9.0), (3, 8.0), (4, 7.0)], "doc_id long, score double"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([run1, run2], k0=10, k=None).collect()}
    assert out[2]["rrf_score"] == round(1 / 12 + 1 / 11, 9)
    assert out[1]["rrf_score"] == round(1 / 11, 9)
    assert out[4]["rrf_score"] == round(1 / 13, 9)
    assert out[2]["runs_matched"] == 2 and out[1]["runs_matched"] == 1
    # doc 2: rank 2 + rank 1 beats doc 1's single rank-1 appearance
    top = rrf_fuse([run1, run2], k0=10, k=1).collect()[0]
    assert top["doc_id"] == 2


def test_rrf_fuse_tie_and_validation(spark):
    import pytest

    from cord19_crawler_spark.operators.search import rrf_fuse

    # equal scores: rank order falls back to doc_id asc
    run = spark.createDataFrame(
        [(7, 1.0), (3, 1.0)], "doc_id long, score double"
    )
    out = rrf_fuse([run], k0=60, k=None).collect()
    by = {r["doc_id"]: r["rrf_score"] for r in out}
    assert by[3] == round(1 / 61, 9) and by[7] == round(1 / 62, 9)
    with pytest.raises(ValueError):
        rrf_fuse([], k0=60)
    with pytest.raises(ValueError):
        rrf_fuse([run], k0=0)


# ---------------------------------------------------------------------------
# BM25F fielded ranking
# ---------------------------------------------------------------------------


def test_bm25f_single_field_reduces_to_bm25(spark):
    """With one field at weight 1 and matching b, BM25F's
    tf~/(k1 + tf~) is exactly BM25's (k1+1)tf' / (tf' + k1) divided by
    (k1+1) — the flat model is the single-field special case."""
    from cord19_crawler_spark.operators.search import bm25f_search

    rows = _rand_postings(5)
    fielded = spark.createDataFrame(
        [(w, d, "body", tf) for w, d, tf in rows],
        "word string, doc_id long, field string, tf long",
    )
    terms = ["w0", "w3", "w7"]
    flat = {
        r["doc_id"]: (r["score"], r["matched_terms"])
        for r in bm25_search(
            _postings(spark, rows), terms, 40, k1=1.2, b=0.75, k=None
        ).collect()
    }
    f = {
        r["doc_id"]: (r["score"], r["matched_terms"])
        for r in bm25f_search(
            fielded, terms, 40, {"body": 1.0}, {"body": 0.75}, k1=1.2,
            k=None,
        ).collect()
    }
    assert set(f) == set(flat)
    for d in f:
        assert f[d][1] == flat[d][1]
        assert f[d][0] * 2.2 == pytest.approx(flat[d][0], abs=5e-6)


def test_bm25f_title_hits_outrank_body_hits(spark):
    from cord19_crawler_spark.operators.search import bm25f_search

    # two docs, identical shape; doc 1 has the query word in title,
    # doc 2 in body; same total length
    rows = [
        ("q", 1, "title", 1), ("x", 1, "body", 9),
        ("q", 2, "body", 1), ("x", 2, "body", 8), ("x", 2, "title", 1),
    ]
    fielded = spark.createDataFrame(
        rows, "word string, doc_id long, field string, tf long"
    )
    out = bm25f_search(
        fielded, ["q"], 2, {"title": 2.5, "body": 1.0},
        {"title": 0.5, "body": 0.75}, k=None,
    ).collect()
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["score"] > out[1]["score"]


def test_bm25f_validation(spark):
    from cord19_crawler_spark.operators.search import bm25f_search

    df = spark.createDataFrame(
        [("a", 1, "body", 1)], "word string, doc_id long, field string, tf long"
    )
    with pytest.raises(ValueError):
        bm25f_search(df, [], 1, {"body": 1.0}, {"body": 0.75})
    with pytest.raises(ValueError):
        bm25f_search(df, ["a"], 1, {"body": 1.0}, {"title": 0.5})


# ---------------------------------------------------------------------------
# proximity minimal cover span
# ---------------------------------------------------------------------------


def test_proximity_min_span_planted(spark):
    from cord19_crawler_spark.operators.search import proximity_min_span

    docs = [
        (1, "aa xx xx xx bb xx aa bb"),   # best window: aa(6) bb(7) -> 2
        (2, "bb xx xx xx xx xx xx xx aa"),  # only cover: [0..8] -> 9
        (3, "aa xx aa xx aa"),            # missing bb -> absent
        (4, "bb aa"),                     # [0,1] -> 2
    ]
    toks = _tokens_df(spark, docs)
    out = [tuple(r) for r in proximity_min_span(toks, ["aa", "bb"], k=None).collect()]
    # (doc, min_span, best_end): ties on span order by doc_id
    assert out == [(1, 2, 7), (4, 2, 1), (2, 9, 8)]


def test_proximity_min_span_matches_bruteforce(spark):
    import itertools

    from cord19_crawler_spark.operators.search import proximity_min_span

    rng = random.Random(19)
    vocab = ["aa", "bb", "cc", "xx", "yy"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(30))) for i in range(12)
    ]
    terms = ["aa", "bb", "cc"]
    want = {}
    for d, text in docs:
        toks = text.split()
        pos = {t: [i for i, w in enumerate(toks) if w == t] for t in terms}
        if any(not v for v in pos.values()):
            continue
        best = None
        for combo in itertools.product(*pos.values()):
            span = max(combo) - min(combo) + 1
            end = max(combo)
            if best is None or (span, end) < best:
                best = (span, end)
        want[d] = best
    got = {
        r["doc_id"]: (r["min_span"], r["best_end"])
        for r in proximity_min_span(
            _tokens_df(spark, docs), terms, k=None
        ).collect()
    }
    assert got == want


def test_proximity_single_term_and_validation(spark):
    from cord19_crawler_spark.operators.search import proximity_min_span

    toks = _tokens_df(spark, [(1, "aa xx aa")])
    out = proximity_min_span(toks, ["aa"], k=None).collect()
    assert [tuple(r) for r in out] == [(1, 1, 0)]
    with pytest.raises(ValueError):
        proximity_min_span(toks, [])


def test_bm25f_unconfigured_field_fully_excluded(spark):
    """A field absent from field_weights contributes to NOTHING: a doc
    matched only there is absent, and df/idf are unchanged vs a corpus
    without that field at all."""
    from cord19_crawler_spark.operators.search import bm25f_search

    base = [("q", 1, "body", 2), ("x", 1, "body", 5), ("q", 2, "body", 1)]
    extra = base + [("q", 3, "anchor", 9), ("x", 2, "anchor", 4)]
    cfg = ({"body": 1.0}, {"body": 0.75})
    a = [tuple(r) for r in bm25f_search(
        spark.createDataFrame(base, "word string, doc_id long, field string, tf long"),
        ["q"], 3, *cfg, k=None).collect()]
    b = [tuple(r) for r in bm25f_search(
        spark.createDataFrame(extra, "word string, doc_id long, field string, tf long"),
        ["q"], 3, *cfg, k=None).collect()]
    assert a == b
    assert {r[0] for r in b} == {1, 2}  # doc 3 (anchor-only) absent
