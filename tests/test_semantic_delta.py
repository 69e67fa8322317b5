"""Word2Vec expansion (F2/F3) and delta-index read-time merge (T2-T5)."""

from pyspark.sql import functions as F

from cord19_crawler_spark.operators import delta, indexing, semantic


def test_word2vec_train_and_expand(spark):
    rows = [(i, "virus vaccine protein cell virus vaccine") for i in range(30)] + [
        (100 + i, "trial results data analysis trial results") for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("words")
    )
    model = semantic.train_word2vec(toks, vector_size=8, min_count=5, seed=42)
    expanded = semantic.expand_query(model, ["virus", "notaword"], top_n=2)
    assert expanded["virus"][0] == "virus" and len(expanded["virus"]) >= 2
    assert expanded["notaword"] == ["notaword"]  # unknown → itself
    # expansion is deterministic under fixed seed
    again = semantic.expand_query(model, ["virus"], top_n=2)
    assert again["virus"] == expanded["virus"]


def test_delta_upsert_and_read_time_merge(spark):
    static_docs = spark.createDataFrame(
        [(1, "virus vaccine virus"), (2, "vaccine trial")],
        "doc_id long, text string",
    )
    static_p = indexing.postings(indexing.tokens_from_text(static_docs))
    empty_delta = spark.createDataFrame([], "doc_id long, text string")

    # before upsert: doc 99 invisible
    res0 = delta.search_with_delta(static_p, empty_delta, ["virus"], 2, k=10)
    assert 99 not in {r["doc_id"] for r in res0.collect()}

    new = spark.createDataFrame(
        [(99, "virus virus virus breakthrough")], "doc_id long, text string"
    )
    d1 = delta.upsert_documents(empty_delta, new)
    # T5 duplicate guard: re-upserting same id is a no-op
    d2 = delta.upsert_documents(d1, new)
    assert d2.count() == 1

    # T3: searchable immediately, no static rebuild
    res = delta.search_with_delta(static_p, d2, ["virus"], 3, k=10).collect()
    by_id = {r["doc_id"]: r["score"] for r in res}
    assert 99 in by_id and 1 in by_id
    assert by_id[99] > by_id[1]  # tf=3 beats tf=2


def test_delta_upsert_in_batch_duplicate_guard(spark):
    """T5 covers duplicates WITHIN one new_docs batch too (the same doc
    discovered via two URLs in one round): one copy survives — the
    deterministically-smallest row — so tf never double-counts."""
    empty_delta = spark.createDataFrame([], "doc_id long, text string")
    new = spark.createDataFrame(
        [(7, "virus virus"), (7, "zebra text"), (8, "other")],
        "doc_id long, text string",
    )
    d = delta.upsert_documents(empty_delta, new)
    rows = {r["doc_id"]: r["text"] for r in d.collect()}
    assert d.count() == 2
    assert rows[7] == "virus virus"  # smallest row wins, deterministic
    # and the postings contain doc 7 exactly once per word
    p = indexing.postings(indexing.tokens_from_text(d))
    assert p.filter((F.col("word") == "virus") & (F.col("doc_id") == 7)).first()["tf"] == 2


def test_word2vec_save_load_roundtrip(spark, tmp_path):
    """Model persistence (reference saves/mmap-loads the model,
    src/train_semantic.py:70-76, src/semantic_search.py:20): synonyms are
    identical across a save/load cycle."""
    from cord19_crawler_spark.operators import semantic

    toks = spark.createDataFrame(
        [([f"w{i % 6}", "virus", f"w{(i + 1) % 6}", "study"],) for i in range(200)],
        "words array<string>",
    )
    model = semantic.train_word2vec(toks, vector_size=8, min_count=5, seed=42)
    before = semantic.expand_query(model, ["virus", "study"], top_n=2)
    path = str(tmp_path / "w2v_model")
    semantic.save_model(model, path)
    loaded = semantic.load_model(path)
    after = semantic.expand_query(loaded, ["virus", "study"], top_n=2)
    assert before == after
