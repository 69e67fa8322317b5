"""Gopher quality signals (operators/gopher.py): exact Python replay of
every signal on a hand corpus, threshold behaviour of the keep flag, and
the edge cases (zero-word doc, repeated boilerplate, tie-broken top gram)."""
import re
from collections import Counter

import pytest

from cord19_crawler_spark.operators.gopher import (
    BULLET_CHARS,
    DUP_GRAM_MAX,
    STOPWORDS8,
    TOP_GRAM_MAX,
    gopher_quality_signals,
)


def _py_gopher(text, line_delim=r"\n+", min_words=50, max_words=100_000,
               min_stop_hits=2):
    words = [w for w in re.split(r"\s+", text) if w]
    lines = [l.strip() for l in re.split(line_delim, text) if l.strip()]
    nw, wc = len(words), sum(len(w) for w in words)
    r6 = lambda x: round(x, 6)  # noqa: E731
    frac = lambda n, d: r6(n / d) if d > 0 else 0.0  # noqa: E731
    sym = text.count("#") + text.count("...") + text.count("…")
    alpha = sum(1 for w in words if re.search(r"[a-zA-Z]", w))
    stops = len(
        {re.sub(r"[^a-z]", "", w.lower()) for w in words}
        & set(STOPWORDS8)
    )
    lc = Counter(lines)
    out = {
        "n_words": nw,
        "mean_word_len": frac(wc, nw),
        "symbol_word_ratio": frac(sym, nw),
        "frac_alpha_words": frac(alpha, nw),
        "n_stop_hits": stops,
        "n_lines": len(lines),
        "frac_bullet_lines": frac(
            sum(1 for l in lines if l[:1] in BULLET_CHARS), len(lines)
        ),
        "frac_ellipsis_lines": frac(
            sum(1 for l in lines if l.endswith("...") or l.endswith("…")),
            len(lines),
        ),
        "dup_line_frac": frac(sum(c - 1 for c in lc.values()), len(lines)),
        "dup_line_char_frac": frac(
            sum((c - 1) * len(l) for l, c in lc.items()),
            sum(c * len(l) for l, c in lc.items()),
        ),
    }
    lw = [w.lower() for w in words]
    for n in range(2, 11):
        gc = Counter(" ".join(lw[i:i + n]) for i in range(len(lw) - n + 1))
        if n in TOP_GRAM_MAX:
            top = max((c, c * len(g)) for g, c in gc.items())[1] if gc else 0
            out[f"top_{n}gram_char_frac"] = frac(top, wc)
        else:
            dup = sum(c * len(g) for g, c in gc.items() if c >= 2)
            out[f"dup_{n}gram_char_frac"] = frac(dup, wc)
    keep = (
        min_words <= nw <= max_words
        and 3 <= out["mean_word_len"] <= 10
        and out["symbol_word_ratio"] <= 0.1
        and out["frac_bullet_lines"] < 0.9
        and out["frac_ellipsis_lines"] < 0.3
        and out["frac_alpha_words"] >= 0.8
        and out["n_stop_hits"] >= min_stop_hits
        and out["dup_line_frac"] <= 0.3
        and out["dup_line_char_frac"] <= 0.2
        and all(out[f"top_{k}gram_char_frac"] <= t for k, t in TOP_GRAM_MAX.items())
        and all(out[f"dup_{k}gram_char_frac"] <= t for k, t in DUP_GRAM_MAX.items())
    )
    out["keep"] = keep
    return out


_CORPUS = [
    (0, "The quick brown fox jumps over the lazy dog and that dog did not "
        "even have a look at it with any of the usual barking to be heard "
        "from such a fine animal on that bright morning in the old meadow "
        "where every creature of the wood would gather to see what all the "
        "noise was about and nobody ever found out why"),
    (1, "spam spam spam spam spam spam spam spam spam spam spam spam"),
    (2, "• bullet one\n• bullet two\n• bullet three\nplain line\nplain "
        "line\ntrailing off..."),
    (3, "   \t  "),
    (4, "losing #count of #hash symbols... and more... of the same... to "
        "be that have with plenty of additional words padding this out"),
    (5, "The cat sat on the mat and that cat did have fun with it all day "
        "long " * 3),
]


def test_gopher_exact_python_replay(spark):
    docs = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    out = gopher_quality_signals(docs, min_words=10, min_stop_hits=2)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert set(got) == {0, 1, 2, 3, 4, 5}
    for i, text in _CORPUS:
        exp = _py_gopher(text, min_words=10)
        g = got[i]
        for k, v in exp.items():
            if isinstance(v, float):
                assert g[k] == pytest.approx(v, abs=1e-9), (i, k)
            else:
                assert g[k] == v, (i, k)


def test_gopher_keep_semantics(spark):
    docs = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["keep"]
        for r in gopher_quality_signals(
            docs, min_words=10, min_stop_hits=2
        ).collect()
    }
    assert got[0] is True          # fluent prose passes everything
    assert got[1] is False         # pure repetition: top-2-gram explodes
    assert got[3] is False         # zero words
    assert got[4] is False         # symbol ratio 6/21 > 0.1
    assert got[5] is False         # 3x-repeated text: dup n-gram family


def test_gopher_word_count_gate(spark):
    docs = spark.createDataFrame(_CORPUS[:1], "doc_id long, text string")
    hi = gopher_quality_signals(docs, min_words=1000).collect()[0]
    assert hi["keep"] is False  # same signals, stricter floor
    lo = gopher_quality_signals(docs, min_words=10).collect()[0]
    assert lo["keep"] is True


def test_gopher_stop_hits_distinct(spark):
    # 'the' appears many times but counts once; 'The' lowercases in.
    docs = spark.createDataFrame(
        [(0, "The the THE the and and and")], "doc_id long, text string"
    )
    row = gopher_quality_signals(docs).collect()[0]
    assert row["n_stop_hits"] == 2


def test_gopher_zero_word_doc_present(spark):
    docs = spark.createDataFrame(
        [(7, ""), (8, " \n ")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in gopher_quality_signals(docs).collect()}
    assert set(rows) == {7, 8}
    for r in rows.values():
        assert r["n_words"] == 0 and r["keep"] is False
        assert r["mean_word_len"] == 0.0
