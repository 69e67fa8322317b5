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


# --- round-5 advice fixes -----------------------------------------------------


def test_shuffle_shards_negative_ids_and_seed(spark):
    """ADVICE r5: Spark % is sign-preserving; shuffle_shards must use pmod
    so negative doc_ids / seeds still yield non-negative shards, a full
    permutation (distinct positions), and uniform-ish shard sizes."""
    from cord19_crawler_spark.operators.traindata import shuffle_shards

    ids = list(range(-50, 50))
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = shuffle_shards(docs, n_shards=4, seed=-3).collect()
    assert len(out) == len(ids)
    assert all(0 <= r["shard"] < 4 for r in out)
    # per-shard positions are 0..size-1 (a permutation, no collisions)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    # deterministic across calls
    again = shuffle_shards(docs, n_shards=4, seed=-3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_adaptive_quality_cut_all_null_group_visible(spark):
    """ADVICE r5: a group whose scores are ALL NULL has no quantile row;
    its documents must still appear with kept=False (left join), not
    vanish from the output."""
    from cord19_crawler_spark.operators.traindata import adaptive_quality_cut

    docs = spark.createDataFrame(
        [
            (1, "en", 0.9),
            (2, "en", 0.1),
            (3, "xx", None),
            (4, "xx", None),
        ],
        "doc_id long, lang string, score double",
    )
    out = {
        r["doc_id"]: (r["kept"], r["threshold"])
        for r in adaptive_quality_cut(docs, "score", 0.5, group_col="lang").collect()
    }
    assert set(out) == {1, 2, 3, 4}  # nothing vanishes
    assert out[3] == (False, None) and out[4] == (False, None)
    assert out[1][0] is True  # en keeps its above-median doc


def test_winnowing_short_doc_edge(spark):
    """ADVICE r5: docs with k <= tokens < k+window-1 have grams but no
    full window; standard edge handling selects the rightmost minimum of
    the truncated window so short docs stay matchable."""
    from cord19_crawler_spark.operators.dedup import winnowing_fingerprints

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # 5 toks, 1 gram (k=5)
            (2, "alpha beta gamma delta epsilon zeta"),  # 2 grams < window
            (3, "a b"),  # < k tokens: absent
            (4, "alpha beta gamma delta epsilon"),  # duplicate of doc 1
        ],
        "doc_id long, text string",
    )
    out = winnowing_fingerprints(docs, k=5, window=4)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    assert 1 in by_doc and len(by_doc[1]) == 1
    assert 2 in by_doc and len(by_doc[2]) == 1  # one truncated window
    assert 3 not in by_doc
    # the whole point of the edge fix: short duplicate docs now MATCH —
    # doc 4 (exact dup of doc 1) selects the identical (pos, fp)
    assert by_doc[4] == by_doc[1]
    # doc 2's selection is one of its own two gram positions
    assert next(iter(by_doc[2]))[0] in (0, 1)


def test_budget_single_action_and_validation(spark):
    """r4 verdict item #5 + ADVICE: apportion_budget pins weights before
    its (now single) driver action; exact sum and validation preserved."""
    from cord19_crawler_spark.frontier.budget import apportion_budget

    w = spark.createDataFrame(
        [("a", 3.0), ("b", 1.0), ("c", 1.0)], "host string, weight double"
    )
    out = apportion_budget(w, total=7)
    rows = {r["host"]: r["budget"] for r in out.collect()}
    assert sum(rows.values()) == 7
    assert rows["a"] >= rows["b"]
    import pytest as _pytest

    bad = spark.createDataFrame([("a", -1.0)], "host string, weight double")
    with _pytest.raises(ValueError, match="non-negative"):
        apportion_budget(bad, total=5)
    zero = spark.createDataFrame([("a", 0.0)], "host string, weight double")
    with _pytest.raises(ValueError, match="positive"):
        apportion_budget(zero, total=5)


def test_recrawl_first_fetch_tie_prefers_changed(spark):
    """ADVICE r5: when two fetches tie on the minimum timestamp and one
    has changed=true, the discarded first-fetch flag must be the TRUE one
    (never over-counts n_changes)."""
    from cord19_crawler_spark.frontier.recrawl import change_rate_estimates

    hist = spark.createDataFrame(
        [
            ("u", 100.0, True),  # tied first, changed — must be discarded
            ("u", 100.0, False),  # tied first
            ("u", 200.0, True),
            ("u", 300.0, True),
        ],
        "url string, fetch_ts double, changed boolean",
    )
    est = change_rate_estimates(hist).collect()[0]
    assert est["n_fetches"] == 4
    assert est["n_changes"] == 2  # the tied-first true flag is ignored
