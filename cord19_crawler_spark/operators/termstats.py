"""Corpus term statistics: PMI collocations and per-document TF-IDF
keywords.

Both are training-data curation / index-analysis passes over the same
positional token table the search index builds from
(``operators.indexing.tokens_from_text``): collocation mining finds the
multi-word units a tokenizer or phrase index should treat atomically
(Church & Hanks, Computational Linguistics 1990), and keyword extraction
produces the per-document topic tags a curation pipeline stratifies or
filters on.  The reference has neither; they extend its index family
(src/index.py builds the same token stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pmi_collocations(
    tokens: DataFrame,
    min_count: int = 5,
    k: int | None = None,
) -> DataFrame:
    """Pointwise-mutual-information bigram collocations (Church & Hanks
    1990) over a positional token table (doc_id, pos, word).

    Pinned semantics (oracle-replayable): a bigram is two kept tokens at
    DIRECTLY adjacent raw-stream positions (pos, pos+1) in the same doc
    — pairs straddling a removed stopword/number do NOT count, matching
    ``phrase_search``'s adjacency.  With c(xy) the bigram count, Np the
    total bigram count, c(x) unigram counts and N the total kept-token
    count:

        pmi(x, y) = ln( (c(xy) / Np) / ((c(x)/N) * (c(y)/N)) )

    rounded to 6.  Bigrams below ``min_count`` are dropped (the classic
    low-frequency PMI instability guard).  Returns
    (w1, w2, pair_count, pmi) ordered pmi desc, then (w1, w2).

    Scale shape (10^10 tokens): the adjacency self-join is an equi-join
    on (doc_id, pos+1)=(doc_id, pos) — co-partitioned, one exchange
    class; bigram and unigram counts are map-side-partial aggregates;
    N/Np ride ONE fused broadcast row; the two unigram joins key on the
    (bounded, vocabulary-sized) word dimension.  No window over corpus
    rows, no driver action; ``k`` lowers to TakeOrderedAndProject.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    t = tokens.select("doc_id", "pos", "word")
    a = t.select("doc_id", F.col("pos").alias("_p"), F.col("word").alias("w1"))
    b = t.select(
        "doc_id", (F.col("pos") - 1).alias("_p"), F.col("word").alias("w2")
    )
    pairs = (
        a.join(b, ["doc_id", "_p"])
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    uni = t.groupBy("word").agg(F.count(F.lit(1)).alias("_c"))
    consts = pairs.agg(
        F.sum("pair_count").cast("double").alias("_np")
    ).crossJoin(uni.agg(F.sum("_c").cast("double").alias("_n")))
    out = (
        pairs.filter(F.col("pair_count") >= min_count)
        .join(uni.select(F.col("word").alias("w1"), F.col("_c").alias("_c1")), "w1")
        .join(uni.select(F.col("word").alias("w2"), F.col("_c").alias("_c2")), "w2")
        .crossJoin(F.broadcast(consts))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.round(
                F.log(
                    (F.col("pair_count") / F.col("_np"))
                    / ((F.col("_c1") / F.col("_n")) * (F.col("_c2") / F.col("_n")))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    )
    return out if k is None else out.limit(k)


def tfidf_doc_keywords(
    postings: DataFrame,
    total_docs: int | DataFrame,
    k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF keywords per document — the document-tagging pass a
    curation pipeline stratifies on (and the per-doc inverse of the
    search family's query-side scoring).

    Pinned semantics: weight = (1 + ln(tf) if tf > 1 else 1.0) *
    (ln((N+1)/(df+1)) + 1) — the reference's exact term weight
    (src/multiwordSearch.py:115-131) applied corpus-wide; rank per doc
    by weight desc then word asc, keep ranks 1..k.  Returns
    (doc_id, rank, word, weight) with weight rounded to 6.

    ``total_docs``: scalar or a DataFrame counted inside the plan as a
    1-row broadcast aggregate (same contract as ``tfidf_search``).

    Scale shape (10^10 postings): df per word is one map-side-partial
    aggregate; its join back keys on the vocabulary-sized word
    dimension; the per-doc rank filter lowers to WindowGroupLimit, so
    map tasks forward at most k rows per doc before the exchange.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = postings.sparkSession
    if isinstance(total_docs, DataFrame):
        totals = total_docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    else:
        totals = spark.range(1).select(F.lit(float(total_docs)).alias("_n"))
    dfs = postings.groupBy("word").agg(
        F.countDistinct("doc_id").alias("_df")
    )
    weighted = (
        postings.join(dfs, "word")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_w",
            F.when(F.col("tf") > 1, 1.0 + F.log(F.col("tf"))).otherwise(1.0)
            * (F.log((F.col("_n") + 1.0) / (F.col("_df") + 1.0)) + 1.0),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("_w"), F.asc("word"))
    return (
        weighted.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            F.col("rank").cast("int").alias("rank"),
            "word",
            F.round("_w", 6).alias("weight"),
        )
    )


def zipf_fit(
    tokens: DataFrame,
    top_n: int = 500,
    word_col: str = "word",
) -> DataFrame:
    """Zipf rank-frequency fit: least-squares slope of ln(freq) on
    ln(rank) over the ``top_n`` most frequent words — the classic corpus
    health diagnostic (natural text sits near slope -1; boilerplate,
    template farms, and machine-generated spam flatten or steepen the
    curve, cf. Gopher's repetition analyses).  Returns ONE row
    (n_words, slope, intercept), rounded to 6.

    Pinned semantics: ranks are 1-based over (freq desc, word asc) —
    fully deterministic cross-engine; the fit uses the explicit
    normal-equation sums (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²), NOT an
    engine-specific regression aggregate, so both engines sum the same
    per-word terms.

    Scale shape (10^11 tokens): the frequency table is one
    map-side-partial aggregate; the top-N cut is TakeOrderedAndProject
    (N rows to the driver side of the plan, never the vocabulary); the
    fit itself is a 1-row aggregate over N rows.  Ranking the tiny
    top-N frame uses a plain window — bounded at N rows by
    construction.
    """
    if top_n < 2:
        raise ValueError(f"top_n must be >= 2, got {top_n}")
    from pyspark.sql import Window

    freqs = (
        tokens.groupBy(F.col(word_col).alias("word"))
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(top_n)
    )
    # N rows max — a window here is bounded, not a global-rank hazard
    ranked = freqs.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("freq"), F.asc("word"))
        ),
    )
    xy = ranked.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    n = F.count(F.lit(1))
    slope = (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")) / (
        n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")
    )
    intercept = (F.sum("y") - slope * F.sum("x")) / n
    # a 1-word corpus makes the normal-equation denominator exactly 0
    # (x = ln(1) = 0 everywhere): report NULL, never a silent NaN that
    # would defeat downstream threshold alerts
    fit_ok = n >= 2
    return xy.agg(
        n.cast("long").alias("n_words"),
        F.when(fit_ok, F.round(slope, 6)).alias("slope"),
        F.when(fit_ok, F.round(intercept, 6)).alias("intercept"),
    )
