"""Regression tests pinning the code-review findings."""

import pytest
from pyspark.sql import functions as F

from cord19_crawler_spark.functions.text import quality_score, token_count
from cord19_crawler_spark.operators import dedup


def test_shingles_short_docs_no_crash(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, "a b c d")], "doc_id long, text string"
    )
    rows = dedup.shingles(docs, n=3).collect()
    assert {r["doc_id"] for r in rows} == {3}  # only the ≥3-token doc
    # full LSH pipeline survives a corpus containing short docs
    pairs = dedup.minhash_near_duplicates(docs, num_perm=8, bands=4, threshold=0.5)
    assert pairs.count() == 0


def test_cuckoo_rejects_non_power_of_two():
    from cord19_crawler_spark.frontier.cuckoo import CuckooSeenFilter

    with pytest.raises(ValueError, match="power of two"):
        CuckooSeenFilter(n_buckets=5000)


def test_lsh_rejects_indivisible_bands(spark):
    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    sig = dedup.minhash_signatures(dedup.shingles(docs, n=2), num_perm=16)
    with pytest.raises(ValueError, match="not divisible"):
        dedup.lsh_candidate_pairs(sig, bands=5)


def test_simhash_high_bits_alive(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i} tok{i*7} x{i*13} y{i*29}") for i in range(40)],
        "doc_id long, text string",
    )
    fps = [r["simhash"] for r in dedup.simhash(docs, bits=40).collect()]
    assert any(fp >> 31 for fp in fps), "bits >= 31 are all dead"


def test_checkpoint_store_rejects_object_store_paths():
    from cord19_crawler_spark.storage import CheckpointStore

    with pytest.raises(NotImplementedError, match="Iceberg"):
        CheckpointStore("s3://bucket/ckpt")


def test_token_count_empty_and_quality_alpha(spark):
    df = spark.createDataFrame([("",), ("   ",), ("a b",), ("a b c   ",)], "text string")
    got = [r["tc"] for r in df.select(token_count("text").alias("tc")).collect()]
    assert got == [0, 0, 2, 3]
    # whitespace must not count as alphabetic in quality_score
    q = spark.createDataFrame([("a b c d e",), ("abcde",)], "text string")
    scores = [r["q"] for r in q.select(quality_score("text").alias("q")).collect()]
    assert scores[0] < scores[1]  # space-padded text scores lower


def test_delta_upsert_guard_against_static(spark):
    from cord19_crawler_spark.operators import delta, indexing

    static_docs = spark.createDataFrame([(1, "old text here")], "doc_id long, text string")
    static_p = indexing.postings(indexing.tokens_from_text(static_docs))
    empty = spark.createDataFrame([], "doc_id long, text string")
    re_add = spark.createDataFrame([(1, "new text here")], "doc_id long, text string")
    d = delta.upsert_documents(empty, re_add, static_ids=static_docs.select("doc_id"))
    assert d.count() == 0  # static id rejected → no double indexing
    merged = delta.merged_postings(static_p, d)
    assert merged.filter(F.col("word") == "new").count() == 0
