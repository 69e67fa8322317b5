"""Paragraph-level exact dedup (operators/dedup.py:remove_duplicate_paragraphs
— the RefinedWeb/Dolma paragraph scrub): keep-first vs remove-all semantics,
normalization (case + whitespace runs), min_count threshold, empty-doc edges,
custom delimiters for single-line corpora, and a randomized brute-force
replay over a generated corpus."""
import random

import pyspark.sql.functions as F

from cord19_crawler_spark.operators.dedup import remove_duplicate_paragraphs


def _rows(df):
    return {
        r["doc_id"]: (r["n_paragraphs"], r["n_removed"], r["clean_text"])
        for r in df.collect()
    }


def test_keep_first_keeps_global_earliest(spark):
    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"unique one\n{boiler}\nunique two"),
            (2, f"{boiler}\nfresh text here"),
            (3, f"other stuff\n{boiler}"),
        ],
        "doc_id long, text string",
    )
    out = _rows(remove_duplicate_paragraphs(docs))
    # doc 1 holds the globally-first occurrence (doc_id 1, pos 1) -> kept.
    assert out[1] == (3, 0, f"unique one\n{boiler}\nunique two")
    assert out[2] == (2, 1, "fresh text here")
    assert out[3] == (2, 1, "other stuff")


def test_remove_all_copies(spark):
    boiler = "all rights reserved"
    docs = spark.createDataFrame(
        [(1, boiler), (2, boiler), (3, "original")],
        "doc_id long, text string",
    )
    out = _rows(remove_duplicate_paragraphs(docs, keep_first=False))
    # both copies removed; doc 1 and 2 come back empty.
    assert out[1] == (1, 1, "")
    assert out[2] == (1, 1, "")
    assert out[3] == (1, 0, "original")


def test_normalization_case_and_whitespace(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello   World"),
            (2, "  hello world "),
            (3, "hello worlds"),
        ],
        "doc_id long, text string",
    )
    out = _rows(remove_duplicate_paragraphs(docs, keep_first=False))
    # 1 and 2 normalize to the same key; 3 differs. Surviving text is the
    # TRIMMED ORIGINAL (casing and inner spacing preserved on kept rows).
    assert out[1] == (1, 1, "")
    assert out[2] == (1, 1, "")
    assert out[3] == (1, 0, "hello worlds")


def test_min_count_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "twice seen"), (2, "twice seen"), (3, "alone")],
        "doc_id long, text string",
    )
    out = _rows(
        remove_duplicate_paragraphs(docs, min_count=3, keep_first=False)
    )
    assert out[1] == (1, 0, "twice seen")
    assert out[2] == (1, 0, "twice seen")
    assert out[3] == (1, 0, "alone")


def test_empty_and_blank_docs_pass_through(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "\n\n  \n"), (3, "real\n\nreal")],
        "doc_id long, text string",
    )
    out = _rows(remove_duplicate_paragraphs(docs, keep_first=False))
    assert out[1] == (0, 0, "")
    assert out[2] == (0, 0, "")
    # within-doc repeat counts toward min_count -> both copies removed.
    assert out[3] == (2, 2, "")


def test_custom_delimiter_single_line_corpus(spark):
    # single-line corpora (no newlines) pass a boundary regex; here the
    # token 'sep' plays the paragraph separator.
    docs = spark.createDataFrame(
        [
            (1, "alpha beta sep gamma delta"),
            (2, "gamma delta sep omega"),
        ],
        "doc_id long, text string",
    )
    out = _rows(
        remove_duplicate_paragraphs(
            docs, delim=r"\bsep\b", keep_first=False, join_sep=" | "
        )
    )
    assert out[1] == (2, 1, "alpha beta")
    assert out[2] == (2, 1, "omega")


def test_brute_force_replay(spark):
    rng = random.Random(7)
    paras = [f"para {i} text" for i in range(12)]
    docs = [
        (i, "\n".join(rng.choice(paras) for _ in range(rng.randint(0, 5))))
        for i in range(40)
    ]
    for keep_first in (True, False):
        for min_count in (2, 3):
            # brute-force python replay
            occ = []
            for doc_id, text in docs:
                pos = -1
                for seg in text.split("\n"):
                    pos += 1
                    if seg.strip():
                        occ.append((doc_id, pos, seg.strip()))
            counts = {}
            first = {}
            for doc_id, pos, p in occ:
                counts[p] = counts.get(p, 0) + 1
                if p not in first or (doc_id, pos) < first[p]:
                    first[p] = (doc_id, pos)
            expected = {}
            for doc_id, _ in docs:
                expected[doc_id] = [0, 0, []]
            for doc_id, pos, p in occ:
                e = expected[doc_id]
                e[0] += 1
                keep = counts[p] < min_count or (
                    keep_first and first[p] == (doc_id, pos)
                )
                if keep:
                    e[2].append(p)
                else:
                    e[1] += 1
            want = {
                d: (e[0], e[1], "\n".join(e[2])) for d, e in expected.items()
            }
            df = spark.createDataFrame(docs, "doc_id long, text string")
            got = _rows(
                remove_duplicate_paragraphs(
                    df, min_count=min_count, keep_first=keep_first
                )
            )
            assert got == want, (keep_first, min_count)
