"""CCNet-style LM perplexity scoring (operators/traindata.py
lm_perplexity_scores): exact Python replay of the stupid-backoff bigram
model, hand cases for the backoff / OOV / pruning paths, the
scored-corpus-never-shuffled plan shape, and argument validation."""
import math
import re

import pyspark.sql.functions as F
import pytest

from cord19_crawler_spark.operators.traindata import lm_perplexity_scores


def _py_ppl(rows, train_ids, min_bigram_count=1, backoff=0.4):
    """Reference implementation: bigram stupid backoff with Laplace
    unigrams, first token scored by the unigram model alone."""
    tok = lambda s: re.findall(r"[a-z0-9]{2,}", s.lower())  # noqa: E731
    docs = {i: tok(t) for i, t in rows}
    docs = {i: t for i, t in docs.items() if t}
    uni, bi = {}, {}
    for i in sorted(train_ids):
        for w in docs.get(i, []):
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(docs.get(i, []), docs.get(i, [])[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    n, v = sum(uni.values()), len(uni)
    bi = {k: c for k, c in bi.items() if c >= min_bigram_count}

    def sulp(w):
        return math.log((uni.get(w, 0) + 1) / (n + v + 1))

    out = {}
    for i, t in docs.items():
        if i in train_ids:
            continue
        lp = sulp(t[0])
        for a, b in zip(t, t[1:]):
            if (a, b) in bi:
                lp += math.log(bi[(a, b)] / uni[a])
            else:
                lp += math.log(backoff) + sulp(b)
        out[i] = (len(t), lp, math.exp(-lp / len(t)))
    return out


_ROWS = [
    (0, "the cat sat on the mat and the cat ran"),
    (1, "the cat sat on the mat again and again"),
    (2, "the dog sat on the mat while the cat sat"),
    (10, "the cat sat on the mat"),  # train-like -> low ppl
    (11, "zebra quark xylem warp drive umbra"),  # all-OOV -> high ppl
    (12, "the cat flew over the moon"),  # mixed: backoff + OOV paths
    (13, "the dog sat on the mat"),  # crosses count-1 train bigram "the dog"
]
def _train():
    return F.col("doc_id") < 10


def test_ppl_exact_python_replay(spark):
    docs = spark.createDataFrame(_ROWS, "doc_id long, text string")
    out = lm_perplexity_scores(docs, _train())
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_prob"], r["ppl"])
        for r in out.collect()
    }
    exp = _py_ppl(_ROWS, {0, 1, 2})
    assert set(got) == {10, 11, 12, 13}
    for i, (nt, lp, ppl) in exp.items():
        assert got[i][0] == nt
        assert got[i][1] == pytest.approx(lp, abs=2e-6)
        assert got[i][2] == pytest.approx(ppl, abs=2e-6)
    # fluency ordering: train-like beats mixed beats all-OOV
    assert got[10][2] < got[12][2] < got[11][2]


def test_ppl_pruning_falls_back(spark):
    # bigram "cat sat" occurs 3x in train, "cat ran" once; with
    # min_bigram_count=2 the latter must score via backoff*S_uni.
    docs = spark.createDataFrame(_ROWS, "doc_id long, text string")
    out = lm_perplexity_scores(docs, _train(), min_bigram_count=2)
    got = {r["doc_id"]: r["log_prob"] for r in out.collect()}
    exp = _py_ppl(_ROWS, {0, 1, 2}, min_bigram_count=2)
    for i in exp:
        assert got[i] == pytest.approx(exp[i][1], abs=2e-6)
    # pruning must actually change at least one doc (13 crosses "the dog",
    # a count-1 train bigram that min_bigram_count=2 prunes to backoff)
    exp1 = _py_ppl(_ROWS, {0, 1, 2}, min_bigram_count=1)
    assert any(
        abs(exp[i][1] - exp1[i][1]) > 1e-9 and
        got[i] == pytest.approx(exp[i][1], abs=2e-6)
        for i in exp
    )


def test_ppl_all_oov_doc_is_pure_lp0(spark):
    docs = spark.createDataFrame(_ROWS, "doc_id long, text string")
    out = lm_perplexity_scores(docs, _train())
    row = {r["doc_id"]: r for r in out.collect()}[11]
    # train: n tokens, v vocab -> every term is ln(backoff)+lp0 except the first
    toks = [t for i, s in _ROWS if i < 10 for t in re.findall(r"[a-z0-9]{2,}", s)]
    n, v = len(toks), len(set(toks))
    lp0 = -math.log(n + v + 1)
    expect = lp0 + 5 * (math.log(0.4) + lp0)
    assert row["log_prob"] == pytest.approx(expect, abs=2e-6)


def test_ppl_excludes_train_and_empty(spark):
    docs = spark.createDataFrame(
        [(0, "aa bb aa"), (1, ". , !"), (2, "aa bb")],
        "doc_id long, text string",
    )
    out = lm_perplexity_scores(docs, F.col("doc_id") == 0)
    got = {r["doc_id"] for r in out.collect()}
    assert got == {2}  # 0 is train, 1 tokenizes to nothing


def test_ppl_scored_corpus_never_shuffled(spark):
    docs = spark.createDataFrame(_ROWS, "doc_id long, text string")
    out = lm_perplexity_scores(docs, _train())
    plan = out._jdf.queryExecution().executedPlan().toString()
    # r6 layout: the model tables arrive as BROADCAST HASH JOIN relations
    # (O(1) probes per token — the r5 single-row MapType model paid a
    # LINEAR GetMapValue scan per lookup), and the per-doc re-aggregation
    # is partial (map-side) before its exchange, so the only shuffle over
    # scored data carries one narrow (doc_id, sum) row per doc per task —
    # the corpus token stream itself never crosses an exchange.
    assert "BroadcastHashJoin" in plan
    assert "map_from_entries" not in plan
    assert "partial_sum" in plan
    # exactly one hash exchange keyed by doc (the partial-sum one)
    assert plan.count("Exchange hashpartitioning(doc_id") == 1


def test_ppl_validation(spark):
    docs = spark.createDataFrame([(0, "aa bb")], "doc_id long, text string")
    with pytest.raises(ValueError):
        lm_perplexity_scores(docs, F.col("doc_id") == 0, min_bigram_count=0)
    with pytest.raises(ValueError):
        lm_perplexity_scores(docs, F.col("doc_id") == 0, backoff=0.0)
    with pytest.raises(ValueError):
        lm_perplexity_scores(docs, F.col("doc_id") == 0, backoff=1.5)


def test_ccnet_buckets_exact_thirds(spark):
    from cord19_crawler_spark.operators.traindata import ccnet_ppl_buckets

    rows = [(0, "aa bb aa bb cc dd aa bb")] + [
        (i, f"aa bb tok{i} cc dd w{i * 7 % 13}") for i in range(1, 13)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = ccnet_ppl_buckets(docs, F.col("doc_id") == 0).collect()
    assert len(out) == 12
    by_rank = sorted(out, key=lambda r: r["rank"])
    # rank follows (ppl, doc_id) totally and buckets are exact thirds
    keys = [(r["ppl"], r["doc_id"]) for r in by_rank]
    assert keys == sorted(keys)
    assert [r["bucket"] for r in by_rank] == (
        ["head"] * 4 + ["middle"] * 4 + ["tail"] * 4
    )


def test_ccnet_buckets_replay_and_validation(spark):
    from cord19_crawler_spark.operators.traindata import ccnet_ppl_buckets

    docs = spark.createDataFrame(_ROWS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ccnet_ppl_buckets(docs, _train()).collect()}
    exp = _py_ppl(_ROWS, {0, 1, 2})
    order = sorted(exp, key=lambda i: (round(exp[i][2], 6), i))
    k, total = 3, len(order)
    for rank, i in enumerate(order, start=1):
        assert out[i]["rank"] == rank
        assert out[i]["bucket"] == ("head", "middle", "tail")[
            (rank - 1) * k // total
        ]
    with pytest.raises(ValueError):
        ccnet_ppl_buckets(docs, _train(), labels=("only",))
