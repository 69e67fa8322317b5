"""Query-side operators: TF-IDF multi-word search, autocomplete.

Reference scoring (reproduced EXACTLY — /root/reference/src/multiwordSearch.py:98-131):
  per (doc, query-term): f = max tf over the term's lemma variants   (A10)
  tf-weight  = 1 + ln(f)              if f > 1 else 1.0
  idf        = ln((N+1)/(df+1)) + 1   where df = #docs matching the term
  score(doc) = Σ_terms tf·idf, then ×(1 + 0.1·(matched_terms − 1))   (A9)
  top-k      = heap nlargest → here orderBy(desc).limit (TakeOrderedAndProject, O3)

The n-way posting combine (J7) is join+agg, not an explicit n-way join:
terms → postings equi-join → two-level groupBy. Broadcast the tiny query
side; the postings scan prunes on the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS


def preprocess_query(query: str) -> list[str]:
    """src/multiwordSearch.py:46-52: lowercase, \\b[a-z0-9]{2,}\\b, stopword
    filter. Driver-side (a query string is driver data)."""
    import re

    words = re.findall(r"\b[a-z0-9]{2,}\b", query.lower())
    return [w for w in words if w not in set(STOPWORDS)]


def tfidf_search(
    postings: DataFrame,
    query_terms: list[str],
    total_docs: int | DataFrame,
    k: int | None = 20,
    variants: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Multi-word weighted-OR search with coverage boost; returns
    (doc_id, score, matched_terms) top-k.

    ``variants`` maps each query term to its lemma-variant list (P9); a
    doc's tf for a term is the MAX over variants (A10).

    ``total_docs`` is either a precomputed scalar (index-build metadata —
    the serving path, zero extra work per query) or a DataFrame whose row
    count is N: the count then runs INSIDE this plan as a broadcast 1-row
    aggregate cross-join, so the whole search is one Spark job with no
    separate driver-side .count() action.

    ``k=None`` skips the limit and returns EVERY matched doc, score-ordered
    — the serving layer caches that candidate-scale frame once and derives
    both top-k and the reference's ``total_found`` (len(combined),
    src/multiwordSearch.py:154-155) from it without re-running the search.
    """
    spark = postings.sparkSession
    rows = []
    for t in query_terms:
        for v in (variants or {}).get(t, [t]):
            rows.append((t, v))
    if not rows:
        # empty result with the SAME schema as the non-empty branch —
        # doc_id keeps the postings' type (string cord_uid, long, ...), so
        # callers can union results across queries
        return (
            postings.select("doc_id")
            .limit(0)
            .withColumn("score", F.lit(0.0))
            .withColumn("matched_terms", F.lit(0).cast("int"))
        )
    terms = spark.createDataFrame(rows, "term string, word string")

    hits = postings.join(F.broadcast(terms), "word", "inner")
    # A10: max tf across a term's variants
    per_term = hits.groupBy("doc_id", "term").agg(F.max("tf").alias("f"))
    # df per term (over the max-collapsed hits, as the reference counts docs
    # per query word after variant merge, src/multiwordSearch.py:110-113)
    df_per_term = per_term.groupBy("term").agg(
        F.countDistinct("doc_id").alias("term_df")
    )
    joined = per_term.join(F.broadcast(df_per_term), "term")
    if isinstance(total_docs, DataFrame):
        n_df = total_docs.agg(F.count(F.lit(1)).alias("_n"))
        joined = joined.crossJoin(F.broadcast(n_df))
        n_col = F.col("_n")
    else:
        n_col = F.lit(total_docs)
    scored = joined.withColumn(
        "tfidf",
        (
            F.when(F.col("f") > 1, 1.0 + F.log(F.col("f").cast("double"))).otherwise(
                F.lit(1.0)
            )
        )
        * (F.log((n_col + 1.0) / (F.col("term_df") + 1.0)) + F.lit(1.0)),
    ).drop("_n")
    combined = scored.groupBy("doc_id").agg(
        F.sum("tfidf").alias("base"),
        F.count(F.lit(1)).alias("matched_terms"),
    )
    final = combined.withColumn(
        "score",
        F.round(
            F.col("base")
            * F.when(
                F.col("matched_terms") > 1,
                1.0 + 0.1 * (F.col("matched_terms") - 1),
            ).otherwise(F.lit(1.0)),
            6,
        ),
    ).select("doc_id", "score", F.col("matched_terms").cast("int").alias("matched_terms"))
    ordered = final.orderBy(F.desc("score"), F.asc("doc_id"))
    return ordered if k is None else ordered.limit(k)


def autocomplete_topk(lexicon: DataFrame, prefix_len: int = 4, k: int = 5) -> DataFrame:
    """Top-k words per prefix by total_count (reference trie with per-node
    top-5 caches, src/autocomplete.py:51-65 → window rank, W3)."""
    pref = lexicon.filter(F.length("word") >= prefix_len).withColumn(
        "prefix", F.substring("word", 1, prefix_len)
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("total_count"), F.asc("word"))
    return (
        pref.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("prefix", "word", "total_count", F.col("rank").cast("int").alias("rank"))
    )


def prefix_match(lexicon: DataFrame, prefix: str, k: int = 5) -> DataFrame:
    """P12: filter(startswith) + precomputed rank — replaces trie descent."""
    return (
        lexicon.filter(F.col("word").startswith(prefix))
        .orderBy(F.desc("total_count"), F.asc("word"))
        .limit(k)
        .select("word", "total_count")
    )
