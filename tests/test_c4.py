"""C4 cleaning rules (operators/c4.py): exact Python replay, rule-by-rule
hand cases (terminal punctuation, min words, javascript, lorem/brace/
badword document drops, sentence floor), the zero-shuffle plan shape, and
argument validation."""
import re

import pytest

from cord19_crawler_spark.operators.c4 import c4_quality_filter


def _py_c4(text, badwords=(), line_delim=r"\n+", min_line_words=5,
           min_sentences=3, join_sep="\n"):
    lines = [l.strip() for l in re.split(line_delim, text) if l.strip()]
    kept = [
        l for l in lines
        if l[-1:] in ('.', '!', '?', '"')
        and len([w for w in re.split(r"\s+", l) if w]) >= min_line_words
        and not re.search(r"\bjavascript\b", l.lower())
    ]
    clean = join_sep.join(kept)
    lt = text.lower()
    n_sent = len(re.findall(r"[.!?]+", clean))
    has_bad = bool(badwords) and bool(
        re.search(r"\b(" + "|".join(map(re.escape, badwords)) + r")\b", lt)
    )
    has_lorem, has_brace = "lorem ipsum" in lt, "{" in lt
    return {
        "n_lines": len(lines),
        "n_lines_kept": len(kept),
        "n_sentences": n_sent,
        "has_lorem": has_lorem,
        "has_brace": has_brace,
        "has_badword": has_bad,
        "keep": not (has_lorem or has_brace or has_bad)
        and n_sent >= min_sentences,
        "clean_text": clean,
    }


_CORPUS = [
    (0, "This is a fine first sentence.\nshort.\nAnother long and proper "
        "sentence here!\nA third good sentence follows right here.\nno "
        "terminal punctuation on this one\nEnable javascript to view "
        "this page."),
    (1, "Lorem ipsum dolor sit amet, consectetur adipiscing elit sed."),
    (2, "function f() { return 1; } is code with many words inside it."),
    (3, "One good sentence is simply not enough though."),
    (4, "The badword xyzzy appears in this otherwise long fine sentence."
        "\nA second proper sentence appears right here too.\nAnd "
        "naturally a third one closes it out."),
    (5, 'Quote line ending with a double quote after many words it is "'
        "\nFirst real sentence of the document goes here.\nSecond real "
        "sentence of the document goes here!\nThird real sentence of "
        "the document ends now?"),
    (6, "   \t "),
    (7, "Does one line with two sentences count? Yes it does! And a "
        "third one too."),
]


def test_c4_exact_python_replay(spark):
    docs = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    out = c4_quality_filter(docs, badwords=["xyzzy"])
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert set(got) == set(dict(_CORPUS))
    for i, text in _CORPUS:
        exp = _py_c4(text, badwords=["xyzzy"])
        for k, v in exp.items():
            assert got[i][k] == v, (i, k)


def test_c4_keep_semantics(spark):
    docs = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["keep"]
        for r in c4_quality_filter(docs, badwords=["xyzzy"]).collect()
    }
    # 0: three surviving terminal-punct lines; 5: quote-terminated line
    # counts as kept but adds no [.!?] sentence; 7: one line, 3 sentences
    assert got == {
        0: True, 1: False, 2: False, 3: False,
        4: False, 5: True, 6: False, 7: True,
    }


def test_c4_zero_shuffle_plan(spark):
    docs = spark.createDataFrame(_CORPUS[:2], "doc_id long, text string")
    out = c4_quality_filter(docs, badwords=["xyzzy"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure scan-side projection


def test_c4_validation(spark):
    docs = spark.createDataFrame([(0, "aa")], "doc_id long, text string")
    with pytest.raises(ValueError):
        c4_quality_filter(docs, min_line_words=0)
    with pytest.raises(ValueError):
        c4_quality_filter(docs, min_sentences=0)
    with pytest.raises(ValueError):
        c4_quality_filter(docs, badwords=["ok term", "bad.regex("])
