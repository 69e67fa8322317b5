"""Exact substring-level dedup (operators/dedup.py:duplicate_substring_spans,
the Lee et al. 2022 ExactSubstr deliverable): hand-planted cross-document and
within-document duplicated runs, maximal-span merging (overlap AND touch),
min_count semantics, and the short-document / no-duplicate edges."""
import pyspark.sql.functions as F
import pytest

from cord19_crawler_spark.operators.dedup import duplicate_substring_spans


def _spans(df):
    return {
        (r["doc_id"], r["start_tok"], r["end_tok"], r["n_dup_grams"])
        for r in df.collect()
    }


def test_cross_doc_shared_run(spark):
    # docs 1/2 share tokens 2..9 (an 8-token run); with k=4 the duplicated
    # windows in doc 1 start at positions 2..6 -> ONE merged span [2, 10).
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = spark.createDataFrame(
        [
            (1, "aa bb " + shared + " cc dd"),
            (2, "xx yy " + shared + " zz ww"),
            (3, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"),
        ],
        "doc_id long, text string",
    )
    out = _spans(duplicate_substring_spans(docs, k=4))
    assert out == {(1, 2, 10, 5), (2, 2, 10, 5)}


def test_within_doc_repeat_counts(spark):
    # ExactSubstr semantics: a phrase repeated WITHIN one doc is duplicated
    # even if no other doc has it. k=3 phrase at positions 0 and 5.
    docs = spark.createDataFrame(
        [(1, "p1 p2 p3 g1 g2 p1 p2 p3 g3 g4")],
        "doc_id long, text string",
    )
    out = _spans(duplicate_substring_spans(docs, k=3))
    assert out == {(1, 0, 3, 1), (1, 5, 8, 1)}


def test_touching_spans_merge(spark):
    # doc 1 = run X (4 tokens) immediately followed by run Y (4 tokens);
    # X is shared with doc 2, Y with doc 3. Duplicated window starts in
    # doc 1: 0 (X) and 4 (Y) -> touching (4 == 0 + 4) -> ONE span [0, 8).
    docs = spark.createDataFrame(
        [
            (1, "x1 x2 x3 x4 y1 y2 y3 y4"),
            (2, "aa x1 x2 x3 x4 bb cc dd"),
            (3, "y1 y2 y3 y4 ee ff gg hh"),
        ],
        "doc_id long, text string",
    )
    out = duplicate_substring_spans(docs, k=4)
    doc1 = {t for t in _spans(out) if t[0] == 1}
    assert doc1 == {(1, 0, 8, 2)}


def test_min_count_threshold(spark):
    # the run appears exactly twice corpus-wide: kept at min_count=2,
    # gone at min_count=3.
    docs = spark.createDataFrame(
        [
            (1, "r1 r2 r3 r4 aa bb"),
            (2, "cc dd r1 r2 r3 r4"),
            (3, "ee ff gg hh ii jj"),
        ],
        "doc_id long, text string",
    )
    assert _spans(duplicate_substring_spans(docs, k=4, min_count=2)) == {
        (1, 0, 4, 1),
        (2, 2, 6, 1),
    }
    assert duplicate_substring_spans(docs, k=4, min_count=3).count() == 0


def test_short_docs_absent_and_no_dups_empty(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "cc dd ee ff gg hh")], "doc_id long, text string"
    )
    assert duplicate_substring_spans(docs, k=4).count() == 0


def test_case_and_tokenizer_normalization(spark):
    # the engine-wide tokenizer lowercases and keeps [a-z0-9]{2,}: "T1, t2!"
    # and "t1 t2" produce the same windows; 1-char tokens vanish.
    docs = spark.createDataFrame(
        [
            (1, "W1, W2; W3 W4 a"),
            (2, "w1 w2 w3 w4"),
        ],
        "doc_id long, text string",
    )
    out = _spans(duplicate_substring_spans(docs, k=4))
    assert out == {(1, 0, 4, 1), (2, 0, 4, 1)}


def test_validation_errors(spark):
    docs = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
    with pytest.raises(ValueError):
        duplicate_substring_spans(docs, k=0)
    with pytest.raises(ValueError):
        duplicate_substring_spans(docs, k=4, min_count=1)
    with pytest.raises(ValueError):
        duplicate_substring_spans(docs, k=4, gram_storage="bogus")


def test_local_checkpoint_storage_matches(spark):
    docs = spark.createDataFrame(
        [
            (1, "m1 m2 m3 m4 m5 aa"),
            (2, "bb m1 m2 m3 m4 m5"),
        ],
        "doc_id long, text string",
    )
    a = _spans(duplicate_substring_spans(docs, k=5))
    b = _spans(duplicate_substring_spans(docs, k=5, gram_storage="localCheckpoint"))
    assert a == b == {(1, 0, 5, 1), (2, 1, 6, 1)}


def test_apply_remove_spans_hand_case(spark):
    from cord19_crawler_spark.operators.dedup import apply_remove_spans

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee ff"),
            (2, "gg hh ii jj"),
            (3, "kk ll"),
        ],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [
            (1, 1, 3),  # cut bb cc
            (1, 4, 5),  # cut ee
            (3, 0, 2),  # whole doc
        ],
        "doc_id long, start_tok long, end_tok long",
    )
    rows = {r["doc_id"]: r for r in apply_remove_spans(docs, spans).collect()}
    assert rows[1]["clean_text"] == "aa dd ff"
    assert (rows[1]["n_tokens"], rows[1]["n_removed"]) == (6, 3)
    assert rows[2]["clean_text"] == "gg hh ii jj" and rows[2]["n_removed"] == 0
    assert rows[3]["clean_text"] == "" and rows[3]["n_removed"] == 2


def test_apply_remove_spans_composes_with_detection(spark):
    from cord19_crawler_spark.operators.dedup import (
        apply_remove_spans,
        duplicate_substring_spans,
    )

    shared = "s1 s2 s3 s4"
    docs = spark.createDataFrame(
        [
            (1, "aa " + shared + " bb"),
            (2, "cc " + shared + " dd"),
        ],
        "doc_id long, text string",
    )
    spans = duplicate_substring_spans(docs, k=4)
    rows = {r["doc_id"]: r for r in apply_remove_spans(docs, spans).collect()}
    assert rows[1]["clean_text"] == "aa bb"
    assert rows[2]["clean_text"] == "cc dd"
    assert rows[1]["n_removed"] == 4


def test_apply_remove_spans_join_modes_match_and_validate(spark):
    from cord19_crawler_spark.operators.dedup import apply_remove_spans

    docs = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "dd ee ff")], "doc_id long, text string"
    )
    spans = spark.createDataFrame(
        [(1, 0, 1)], "doc_id long, start_tok long, end_tok long"
    )
    a = sorted(map(tuple, apply_remove_spans(docs, spans).collect()))
    b = sorted(
        map(tuple, apply_remove_spans(docs, spans, spans_join="shuffle").collect())
    )
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError):
        apply_remove_spans(docs, spans, spans_join="bogus")


def test_boilerplate_flood_is_linear(spark):
    # 2000 identical docs: every window hash lands in ONE corpus-wide
    # group. A pair-join design would enumerate C(2000,2) ~ 2M pairs; the
    # occurrence AGGREGATE + semi-join stays linear (50k position rows),
    # so this completes in seconds and yields one full-coverage span per
    # doc. (The LSH families need hot-bucket caps for this shape —
    # tests/test_dedup_hot_bucket.py; this operator is safe by
    # construction.)
    text = " ".join(f"tok{i}" for i in range(30))
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit(text).alias("text")
    )
    out = duplicate_substring_spans(docs, k=6).collect()
    assert len(out) == 2000
    assert all((r["start_tok"], r["end_tok"]) == (0, 30) for r in out)
