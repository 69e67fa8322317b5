"""Semantic query expansion: Word2Vec synonyms (reference F2/F3).

Reference: gensim Word2Vec(vector_size=100, window=5, min_count=10,
epochs=1) trained on the tokenized corpus (/root/reference/src/
train_semantic.py:60-67), queried via most_similar for query expansion
(src/semantic_search.py:28-44). Spark-native: ``pyspark.ml.feature.Word2Vec``
trained distributed; expansion via ``findSynonyms``; the expanded variants
feed tfidf_search's A10 max-over-variants semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_word2vec(
    token_arrays: DataFrame,
    input_col: str = "words",
    vector_size: int = 100,
    window: int = 5,
    min_count: int = 10,
    seed: int = 42,
):
    """Train Word2Vec on a DF of token arrays (reference hyperparameters)."""
    from pyspark.ml.feature import Word2Vec

    w2v = Word2Vec(
        vectorSize=vector_size,
        windowSize=window,
        minCount=min_count,
        seed=seed,
        inputCol=input_col,
        outputCol="w2v",
        maxIter=1,  # reference trains 1 epoch
    )
    return w2v.fit(token_arrays)


def save_model(model, path: str) -> None:
    """Persist the trained Word2Vec model (reference saves the gensim model
    at src/train_semantic.py:70-76); pyspark.ml writer, overwrite mode."""
    model.write().overwrite().save(path)


def load_model(path: str):
    """Load a persisted model (reference mmap-loads it per process,
    src/semantic_search.py:20; Spark's load maps onto the same
    train-once / serve-many lifecycle)."""
    from pyspark.ml.feature import Word2VecModel

    return Word2VecModel.load(path)


def expand_query(model, terms: list[str], top_n: int = 3) -> dict[str, list[str]]:
    """term → [term, synonym, ...] (reference expand_query,
    src/semantic_search.py:38-44; unknown words expand to themselves).

    Vocabulary membership is checked with a FILTERED collect (≤ len(terms)
    rows) — never a full-vocab collect, which at a 10^7-word vocabulary
    would pull the whole model table through the driver."""
    out: dict[str, list[str]] = {}
    vocab = {
        r["word"]
        for r in model.getVectors()
        .filter(F.col("word").isin(list(terms)))
        .select("word")
        .collect()
    }
    for t in terms:
        variants = [t]
        if t in vocab:
            for r in model.findSynonyms(t, top_n).collect():
                if r["word"] not in variants:
                    variants.append(r["word"])
        out[t] = variants
    return out


def semantic_search(
    postings: DataFrame,
    model,
    query_terms: list[str],
    total_docs: int,
    k: int = 20,
    top_n_synonyms: int = 3,
) -> DataFrame:
    """Expansion + TF-IDF ranking: the reference's semantic search path
    (src/app.py:99-105 → multi_word_search)."""
    from .search import tfidf_search

    variants = expand_query(model, query_terms, top_n_synonyms)
    return tfidf_search(postings, query_terms, total_docs, k, variants=variants)
