"""BPE tokenizer training (operators/bpe.py): exact Python replay of the
Sennrich et al. 2016 word-count algorithm, greedy-merge semantics of the
Catalyst fold, determinism, and the scan-shaped pair-count plan."""
import re

import pytest

import pyspark.sql.functions as F

from cord19_crawler_spark.operators.bpe import (
    END,
    merge_pair_expr,
    pair_counts,
    train_bpe,
    word_frequencies,
)


def _py_train_bpe(texts, n_merges):
    """Reference implementation straight from the paper's pseudocode."""
    freqs: dict[tuple, int] = {}
    for t in texts:
        for w in re.findall("[a-z0-9]+", t.lower()):
            key = tuple(list(w) + [END])
            freqs[key] = freqs.get(key, 0) + 1
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple, int] = {}
        for sym, f in freqs.items():
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # (count DESC, left ASC, right ASC)
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        nxt = {}
        for sym, f in freqs.items():
            out, i = [], 0
            for s in sym:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + f
        freqs = nxt
    return merges, freqs


def test_train_bpe_matches_python_replay(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new wider wide",
        "low new wide wider lowest",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got_merges, sym = train_bpe(docs, n_merges=8)
    exp_merges, exp_freqs = _py_train_bpe(texts, 8)
    assert got_merges == exp_merges
    got_syms = {
        tuple(r["symbols"]): r["freq"]
        for r in sym.groupBy("symbols")
        .agg(F.sum("freq").alias("freq"))
        .collect()
    }
    assert got_syms == exp_freqs


def test_merge_expr_greedy_left_to_right(spark):
    df = spark.createDataFrame([(["a", "a", "a"],)], "symbols array<string>")
    out = df.select(merge_pair_expr(F.col("symbols"), "a", "a").alias("m"))
    assert out.collect()[0]["m"] == ["aa", "a"]


def test_word_frequencies_and_pair_weighting(spark):
    docs = spark.createDataFrame([("ab ab Ba!",)], "text string")
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert wf == {"ab": 2, "ba": 1}
    sym = word_frequencies(docs).select(
        "word",
        F.concat(F.split("word", ""), F.array(F.lit(END))).alias("symbols"),
        "freq",
    )
    pc = {
        (r["left"], r["right"]): r["pair_count"]
        for r in pair_counts(sym).collect()
    }
    # "ab" twice + "ba" once
    assert pc == {("a", "b"): 2, ("b", END): 2, ("b", "a"): 1, ("a", END): 1}


def test_train_bpe_early_stop_and_validation(spark):
    docs = spark.createDataFrame([("x y",)], "text string")
    merges, _ = train_bpe(docs, n_merges=10, min_pair_count=2)
    # every pair occurs once -> stops immediately under the floor
    assert merges == []
    with pytest.raises(ValueError):
        train_bpe(docs, n_merges=0)


def test_pair_counts_plan_single_aggregate_exchange(spark):
    # the scale claim: pair stats are scan-side transforms + ONE hash
    # aggregate exchange on the pair key (word_frequencies' exchange is
    # upstream of the symbol table, not re-paid per iteration)
    sym = spark.createDataFrame(
        [("ab", ["a", "b", END], 3)], "word string, symbols array<string>, freq long"
    )
    plan = pair_counts(sym)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_vocab_coverage_occurrence_counting(spark):
    from cord19_crawler_spark.operators.bpe import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "zebra zebra zebra cat")],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([("cat",), ("dog",)], "word string")
    got = {r["doc_id"]: r for r in vocab_coverage(docs, vocab).collect()}
    assert got[1]["n_tokens"] == 3 and got[1]["n_oov"] == 0
    assert got[2]["n_tokens"] == 4 and got[2]["n_oov"] == 3
    assert got[2]["oov_rate"] == 0.75


def test_vocab_coverage_plan_broadcasts_vocab(spark):
    from cord19_crawler_spark.operators.bpe import vocab_coverage

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(50)], "doc_id long, text string"
    )
    vocab = spark.createDataFrame([("alpha",)], "word string")
    plan = (
        vocab_coverage(docs, vocab)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_encode_words_reproduces_training_symbol_table(spark):
    """Encoding a corpus with its OWN training merges must land on the
    training run's final symbol table exactly — the round-trip that pins
    encode/train semantic identity."""
    from cord19_crawler_spark.operators.bpe import encode_words

    texts = [
        "low lower lowest low low",
        "new newer newest new wider wide",
        "low new wide wider lowest",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, sym = train_bpe(docs, n_merges=8)
    enc = encode_words(word_frequencies(docs), merges)
    got = {r["word"]: r["tokens"] for r in enc.collect()}
    exp = {r["word"]: r["symbols"] for r in sym.collect()}
    assert got == exp


def test_encode_words_static_merges_and_checkpointing(spark, tmp_path):
    from cord19_crawler_spark.operators.bpe import encode_words

    words = spark.createDataFrame(
        [("the",), ("then",), ("rather",), ("e",)], "word string"
    )
    merges = [("t", "h"), ("th", "e"), ("e", END), ("e", "r")]
    got = {
        r["word"]: r["tokens"]
        for r in encode_words(words, merges, checkpoint_every=2).collect()
    }
    assert got == {
        # t h -> th; th e -> the; e</w> only fires on word-final e
        "the": ["the", END],
        "then": ["the", "n", END],
        # 'er' must NOT merge before its rule: a t h e r -> a th -> no:
        # r a th e r: (th,e) tail 'th' + 'e' -> 'the'; (e,r) tail 'the'
        # is not 'e', so the trailing r stays separate
        "rather": ["r", "a", "the", "r", END],
        "e": ["e</w>"],
    }
    # reliable-checkpoint path produces identical output
    reli = {
        r["word"]: r["tokens"]
        for r in encode_words(
            words, merges, checkpoint_every=1,
            checkpoint_dir=str(tmp_path / "enc"),
        ).collect()
    }
    assert reli == got


def _py_encode_word(word: str, merges) -> list[str]:
    sym = list(word) + [END]
    for left, right in [(m[0], m[1]) for m in merges]:
        out: list[str] = []
        for s in sym:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        sym = out
    return sym


def test_encode_corpus_matches_python_replay(spark):
    """Per-document subword sequences equal the greedy per-word encode
    replayed in Python, in document word order; a wordless document keeps
    a row with an empty sequence."""
    from cord19_crawler_spark.operators.bpe import encode_corpus

    rows = [
        ("d1", "the then rather"),
        ("d2", "e the e"),
        ("d3", "!!! ???"),  # no [a-z0-9]+ words at all
        ("d4", None),
        ("d5", "Rather THE then"),  # lowercased before tokenize
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    merges = [("t", "h"), ("th", "e"), ("e", END), ("e", "r")]
    got = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in encode_corpus(docs, merges).collect()
    }
    exp = {}
    for doc_id, text in rows:
        words = re.findall("[a-z0-9]+", (text or "").lower())
        toks = [t for w in words for t in _py_encode_word(w, merges)]
        exp[doc_id] = (toks, len(toks))
    assert got == exp
    # shuffle-join path (extreme-vocabulary escape hatch) is equivalent
    got_sj = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in encode_corpus(docs, merges, broadcast_words=False).collect()
    }
    assert got_sj == exp
