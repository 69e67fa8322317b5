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


def bm25_search(
    postings: DataFrame,
    query_terms: list[str],
    total_docs: int | DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    k: int | None = 20,
    doclens: DataFrame | None = None,
    total_tokens: float | None = None,
) -> DataFrame:
    """Okapi BM25 ranking (Robertson & Sparck Jones probabilistic
    weighting; the k1/b formulation of Robertson et al., TREC-3 1994)
    over (word, doc_id, tf) postings — the industry-standard upgrade of
    the reference's raw TF-IDF formula (src/multiwordSearch.py:115-131),
    which saturates neither on term frequency nor on document length.

    Pinned semantics (oracle-replayable): doclen(D) = sum of tf over ALL
    of D's postings (tokens surviving the index token filter); N = the
    corpus document count (scalar, or a DataFrame counted INSIDE the
    plan as a broadcast 1-row aggregate — same contract as
    ``tfidf_search``); avgdl = sum of all doclens / N (docs with zero
    surviving tokens drag the average down, pinned); idf(t) =
    ln(1 + (N - df + 0.5) / (df + 0.5)) — the non-negative Lucene
    variant; score(D) = sum over matched terms of idf * tf * (k1+1) /
    (tf + k1 * (1 - b + b * doclen/avgdl)), rounded to 6 for cross-
    engine stability.  Ties break on ascending doc_id.

    Scale shape (10^10 postings): term df and the query-term list are
    broadcast (term-count-sized); candidate postings (only query-term
    rows, filter pushed to the posting scan) join doclens keyed on
    doc_id — the one wide exchange class; doclens is ONE map-side-
    partial aggregate over the postings scan; N/avgdl ride a 1-row
    broadcast cross-join, so the whole query is a single Spark job with
    no driver action.  ``k`` lowers to TakeOrderedAndProject.

    Serving/index path: ``doclens`` (doc_id, doclen) and ``total_tokens``
    — both written at INDEX BUILD time by ``plans.search_pipeline`` —
    skip the corpus-scale aggregates entirely, so a served query over a
    barrel-PRUNED postings scan (which could not compute global doclens
    itself) stays correct and touches only query-term postings plus the
    doclen side table.
    """
    spark = postings.sparkSession
    if not query_terms:
        return (
            postings.select("doc_id")
            .limit(0)
            .withColumn("score", F.lit(0.0))
            .withColumn("matched_terms", F.lit(0).cast("int"))
        )
    terms = spark.createDataFrame(
        [(t,) for t in dict.fromkeys(query_terms)], "word string"
    )
    if doclens is None:
        doclens = postings.groupBy("doc_id").agg(F.sum("tf").alias("doclen"))
    else:
        doclens = doclens.select("doc_id", "doclen")
    if isinstance(total_docs, DataFrame):
        n_col = F.count(F.lit(1)).cast("double")
        totals = total_docs.agg(n_col.alias("_n"))
    else:
        totals = spark.range(1).select(F.lit(float(total_docs)).alias("_n"))
    # avgdl numerator = total token mass; one 1-row aggregate each,
    # fused into a single broadcast row (or a pure literal when the
    # index metadata already carries the mass)
    if total_tokens is None:
        mass = postings.agg(F.sum("tf").cast("double").alias("_mass"))
    else:
        mass = spark.range(1).select(
            F.lit(float(total_tokens)).alias("_mass")
        )
    consts = totals.crossJoin(mass).select(
        "_n", (F.col("_mass") / F.col("_n")).alias("_avgdl")
    )
    hits = postings.join(F.broadcast(terms), "word", "inner")
    df_per_term = hits.groupBy("word").agg(
        F.countDistinct("doc_id").alias("term_df")
    )
    scored = (
        hits.join(F.broadcast(df_per_term), "word")
        .join(doclens, "doc_id")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "_idf",
            F.log(
                1.0
                + (F.col("_n") - F.col("term_df") + 0.5)
                / (F.col("term_df") + 0.5)
            ),
        )
        .withColumn(
            "_w",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1
                * (1.0 - b + b * F.col("doclen") / F.col("_avgdl"))
            ),
        )
    )
    final = (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.sum("_w"), 6).alias("score"),
            F.count(F.lit(1)).cast("int").alias("matched_terms"),
        )
        .select("doc_id", "score", "matched_terms")
    )
    ordered = final.orderBy(F.desc("score"), F.asc("doc_id"))
    return ordered if k is None else ordered.limit(k)


def phrase_search(
    tokens: DataFrame,
    phrase: list[str],
    k: int | None = None,
) -> DataFrame:
    """Exact-phrase search by positional-posting intersection — the
    standard inverted-index phrase plan (Manning, Raghavan & Schutze,
    IIR ch. 2.4): a doc matches where the phrase's words occur at
    CONSECUTIVE positions.  The reference's index has no positions
    (src/index.py keeps only frequencies), so this extends its query
    surface rather than re-expressing it.

    ``tokens`` is the exploded positional index (doc_id, pos, word);
    positions are the pre-filter token offsets, so a stopword between
    two words breaks adjacency — a phrase can only match where the
    surface text was adjacent.  Pinned: occurrences = distinct anchor
    positions p with word_i at p+i for all i (a phrase of repeated
    words counts overlapping occurrences separately); docs with zero
    occurrences are absent; ties break on ascending doc_id.

    Scale shape (10^10 tokens): each phrase word becomes a scan-side
    filter on the token table (predicate pushdown to the posting scan —
    only the phrase words' postings are ever read), re-anchored as
    (doc_id, pos - i) and intersected by an n-way equi-join on
    (doc_id, anchor); the join keys carry the doc hash so all n legs
    co-partition, and the per-doc count is a map-side-partial
    aggregate.  No window, no explode, no driver action.
    """
    if not phrase:
        raise ValueError("phrase must have at least one word")
    legs = None
    for i, w in enumerate(phrase):
        leg = tokens.filter(F.col("word") == w).select(
            "doc_id", (F.col("pos") - F.lit(i)).alias("anchor")
        )
        legs = leg if legs is None else legs.join(leg, ["doc_id", "anchor"])
    final = legs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("phrase_tf")
    )
    ordered = final.orderBy(F.desc("phrase_tf"), F.asc("doc_id"))
    return ordered if k is None else ordered.limit(k)


def _bm25_scored(
    hits: DataFrame,
    doclens: DataFrame,
    consts: DataFrame,
    df_per_term: DataFrame,
    k1: float,
    b: float,
) -> DataFrame:
    """Shared exact-BM25 scoring kernel: candidate postings × broadcast
    (df, consts) × doclens → per-posting weight `_w`."""
    return (
        hits.join(F.broadcast(df_per_term), "word")
        .join(doclens, "doc_id")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "_idf",
            F.log(
                1.0
                + (F.col("_n") - F.col("term_df") + 0.5)
                / (F.col("term_df") + 0.5)
            ),
        )
        .withColumn(
            "_w",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1
                * (1.0 - b + b * F.col("doclen") / F.col("_avgdl"))
            ),
        )
    )


def bm25_search_pruned(
    postings: DataFrame,
    query_terms: list[str],
    total_docs: int | DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """BM25 top-k with MaxScore-style upper-bound pruning (Turtle & Flood
    1995 'Query evaluation: strategies and optimizations', recast for
    Spark's bulk model as a two-phase threshold plan) — returns EXACTLY
    ``bm25_search(...)``'s top-k rows, skipping the doclen join + final
    aggregate for documents that provably cannot make the top k.

    Phase 1 (seed threshold): the RAREST query term's postings (fewest
    docs — found from the per-term df aggregate itself) are scored
    exactly; the k-th best partial score is a valid lower bound θ₀ on the
    final k-th score (each of those ≥k docs has true score ≥ its partial
    score).  θ₀ rides a 1-row broadcast — no driver action.

    Phase 2 (prune + exact): each posting's doclen-free upper bound is
    idf·tf·(k1+1)/(tf + k1·(1−b)) (the doclen→0 limit, maximal because
    the weight is decreasing in doclen); docs whose UB-sum over matched
    terms falls below θ₀ − 1e-6 are pruned before the doclen join (the
    1e-6 slack covers round-to-6 boundary ties, so the rounded output
    ordering matches the unpruned plan exactly).  Survivors are scored
    exactly by the same kernel as ``bm25_search``.

    Scale shape (10^10 postings): the threshold phase touches only the
    rarest term's postings; the pruning aggregate touches only query-term
    postings (never the corpus); the doclen join — the one wide exchange
    over corpus-scale state — now receives only the pruned candidate set.
    θ₀, per-term df and the term list are all broadcast 1-row/term-count
    frames, so the whole query is still a single Spark job.
    """
    spark = postings.sparkSession
    if not query_terms:
        return (
            postings.select("doc_id")
            .limit(0)
            .withColumn("score", F.lit(0.0))
            .withColumn("matched_terms", F.lit(0).cast("int"))
        )
    terms = spark.createDataFrame(
        [(t,) for t in dict.fromkeys(query_terms)], "word string"
    )
    doclens = postings.groupBy("doc_id").agg(F.sum("tf").alias("doclen"))
    if isinstance(total_docs, DataFrame):
        totals = total_docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    else:
        totals = spark.range(1).select(F.lit(float(total_docs)).alias("_n"))
    mass = postings.agg(F.sum("tf").cast("double").alias("_mass"))
    consts = totals.crossJoin(mass).select(
        "_n", (F.col("_mass") / F.col("_n")).alias("_avgdl")
    )
    hits = postings.join(F.broadcast(terms), "word", "inner")
    df_per_term = hits.groupBy("word").agg(
        F.countDistinct("doc_id").alias("term_df")
    )
    # ---- phase 1: exact partial scores for the rarest term only --------
    rarest = df_per_term.orderBy(F.asc("term_df"), F.asc("word")).limit(1)
    seed_hits = hits.join(F.broadcast(rarest.select("word")), "word")
    seed_scored = _bm25_scored(seed_hits, doclens, consts, df_per_term, k1, b)
    # k-th best partial score (0 when fewer than k seed docs → no pruning)
    theta = (
        seed_scored.groupBy("doc_id")
        .agg(F.sum("_w").alias("_s"))
        .orderBy(F.desc("_s"))
        .limit(k)
        .agg(
            F.when(F.count(F.lit(1)) >= k, F.min("_s"))
            .otherwise(F.lit(0.0))
            .alias("_theta")
        )
    )
    # ---- phase 2: doclen-free UB-sum prune, then exact scoring --------
    ub = (
        hits.join(F.broadcast(df_per_term), "word")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "_ub",
            F.log(
                1.0
                + (F.col("_n") - F.col("term_df") + 0.5)
                / (F.col("term_df") + 0.5)
            )
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b)),
        )
        .groupBy("doc_id")
        .agg(F.sum("_ub").alias("_ub_sum"))
    )
    candidates = (
        ub.crossJoin(F.broadcast(theta))
        .filter(F.col("_ub_sum") >= F.col("_theta") - 1e-6)
        .select("doc_id")
    )
    survivors = hits.join(candidates, "doc_id", "left_semi")
    scored = _bm25_scored(survivors, doclens, consts, df_per_term, k1, b)
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.sum("_w"), 6).alias("score"),
            F.count(F.lit(1)).cast("int").alias("matched_terms"),
        )
        .select("doc_id", "score", "matched_terms")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def delete_neighborhood(words: DataFrame, col: str = "word") -> DataFrame:
    """SymSpell delete-neighborhood keys (Garbe 2012, the pre-computed
    'deletes' index of symspell): for each word, the word itself plus
    every single-character deletion — the standard result that
    levenshtein(w, q) ≤ 1 implies keys(w) ∩ keys(q) ≠ ∅ (equal → the word
    itself; insert/delete → one side's delete equals the other; substitute
    → deleting the differing position from both gives the same string).
    Pure Catalyst: a transform over character positions, exploded to
    (key, word) rows.  The intersection OVERAPPROXIMATES distance ≤ 1
    (e.g. 'ab'/'ba' share deletes at distance 2), so candidates must be
    verified — the classic generate-candidates / verify-on-candidates
    split that keeps the expensive exact distance off the full lexicon.
    """
    keys = F.array_union(
        F.array(F.col(col)),
        F.expr(
            f"transform(sequence(1, length({col})), i ->"
            f" concat(substring({col}, 1, i - 1),"
            f" substring({col}, i + 1, length({col}))))"
        ),
    )
    return words.select(
        F.explode(keys).alias("del_key"), *words.columns
    )


def spelling_correction(
    lexicon: DataFrame,
    query: str,
    max_edit: int = 1,
    k: int = 5,
) -> DataFrame:
    """Did-you-mean spelling correction over the (word, total_count)
    lexicon: SymSpell delete-neighborhood candidate generation + exact
    Levenshtein verification, ranked by (distance asc, corpus frequency
    desc, word asc) — returns (word, dist, total_count) top-k.  Extends
    the reference app's query surface (it has autocomplete,
    src/autocomplete.py, but no misspelling recovery) with the index-side
    data it already maintains.

    Only ``max_edit=1`` uses the delete index (the SymSpell guarantee
    proved in ``delete_neighborhood``); larger budgets fall back to a
    full-scan Levenshtein filter (still JVM-side, no Python).

    Scale shape (10^9-word lexicon): the query's own key set (|q|+1
    strings) is a broadcast frame; the lexicon explodes to O(len)·rows
    delete keys but the broadcast-hash semi-join prunes at the scan and
    never shuffles the lexicon; exact levenshtein() runs on candidates
    only; top-k lowers to TakeOrderedAndProject.
    """
    spark = lexicon.sparkSession
    if max_edit == 1:
        qkeys = {query} | {
            query[:i] + query[i + 1 :] for i in range(len(query))
        }
        qframe = spark.createDataFrame(
            [(x,) for x in sorted(qkeys)], "del_key string"
        )
        cand = (
            delete_neighborhood(lexicon)
            .join(F.broadcast(qframe), "del_key", "left_semi")
            .drop("del_key")
            .distinct()
        )
    else:
        cand = lexicon
    return (
        cand.withColumn(
            "dist", F.levenshtein(F.col("word"), F.lit(query)).cast("int")
        )
        .filter(F.col("dist") <= max_edit)
        .select("word", "dist", "total_count")
        .orderBy(F.asc("dist"), F.desc("total_count"), F.asc("word"))
        .limit(k)
    )


def best_snippet_windows(
    tokens: DataFrame,
    query_terms: list[str],
    window: int = 10,
) -> DataFrame:
    """Best snippet window per matching document: over the positional
    token index (doc_id, pos, word), find for every doc the width-
    ``window`` token span [start, start+window) holding the most query-
    term hits — the classic passage-scoring step behind result snippets
    (e.g. Turpin et al. SIGIR 2007 'Fast generation of result snippets').
    Returns (doc_id, start, hits, n_terms); ties prefer the earliest
    start, and only windows anchored at a hit are considered (an optimal
    window always begins at a hit, so this loses nothing).

    Scale shape (10^10 tokens): both legs are the QUERY TERMS' postings
    only (scan-side pushed filter — the corpus token table is never read
    beyond those words); the range self-join is an equi-join on doc_id
    with the position band as a residual, co-partitioned so no second
    exchange; per-(doc,anchor) counting and the per-doc argmax are
    map-side-partial aggregates.  No window function over corpus-scale
    rows, no explode, no driver action.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    hits = tokens.filter(
        F.col("word").isin(list(dict.fromkeys(query_terms)))
    ).select("doc_id", "pos", "word")
    a = hits.select("doc_id", F.col("pos").alias("start"))
    b = hits.select(
        "doc_id", F.col("pos").alias("bpos"), F.col("word").alias("bword")
    )
    windows = (
        a.join(b, "doc_id")
        .filter(
            (F.col("bpos") >= F.col("start"))
            & (F.col("bpos") < F.col("start") + window)
        )
        .groupBy("doc_id", "start")
        .agg(
            F.count(F.lit(1)).cast("int").alias("hits"),
            F.countDistinct("bword").cast("int").alias("n_terms"),
        )
    )
    # argmax per doc: max hits, then earliest start (encode start
    # descending-safe via negation inside the comparable struct)
    return (
        windows.groupBy("doc_id")
        .agg(
            F.max_by(
                F.struct("start", "hits", "n_terms"),
                F.struct(F.col("hits"), (-F.col("start")).alias("_ns")),
            ).alias("_best")
        )
        .select(
            "doc_id",
            F.col("_best.start").alias("start"),
            F.col("_best.hits").alias("hits"),
            F.col("_best.n_terms").alias("n_terms"),
        )
    )


def lm_dirichlet_search(
    postings: DataFrame,
    query_terms: list[str],
    mu: float = 2000.0,
    k: int | None = 20,
    doclens: DataFrame | None = None,
    total_tokens: float | None = None,
) -> DataFrame:
    """Query-likelihood ranking with Dirichlet-prior smoothing (Zhai &
    Lafferty, SIGIR 2001) — the language-modeling alternative to BM25
    the reference's TF-IDF family (src/multiwordSearch.py) lacks.

    Pinned semantics (oracle-replayable), the standard sparse
    decomposition of log p(q|d) restricted to docs matching >= 1 term:

      p(t|C)   = ctf_t / total_tokens          (collection LM)
      score(D) = sum over MATCHED terms of ln(1 + tf / (mu * p(t|C)))
                 + |q| * ln(mu / (doclen_D + mu))

    rounded to 6; ties break on ascending doc_id.  Terms with zero
    collection frequency contribute nothing (their p(t|C) is undefined;
    a term absent from the corpus matches no doc anyway).  |q| counts
    DISTINCT query terms that exist in the corpus, so the length
    penalty is identical for every candidate and rank-neutral — kept
    because the absolute scores are the oracle contract.

    Scale shape (10^10 postings): ctf per query term is a broadcast
    aggregate over the term-pruned posting scan (filter pushed down, at
    most |q| result rows); total token mass is either the index-build
    metadata scalar (``total_tokens``, same seam as ``bm25_search``) or
    ONE map-side-partial 1-row aggregate; the only wide exchange is the
    candidate-postings-to-doclens equi-join on doc_id.  No window, no
    driver action; ``k`` lowers to TakeOrderedAndProject.
    """
    spark = postings.sparkSession
    terms_list = list(dict.fromkeys(query_terms))
    if not terms_list:
        raise ValueError("query_terms must be non-empty")
    terms = spark.createDataFrame([(t,) for t in terms_list], "word string")
    if doclens is None:
        doclens = postings.groupBy("doc_id").agg(F.sum("tf").alias("doclen"))
    else:
        doclens = doclens.select("doc_id", "doclen")
    if total_tokens is None:
        mass = postings.agg(F.sum("tf").cast("double").alias("_mass"))
    else:
        mass = spark.range(1).select(
            F.lit(float(total_tokens)).alias("_mass")
        )
    hits = postings.join(F.broadcast(terms), "word", "inner")
    # collection term frequency per query term (broadcast-sized)
    ctf = hits.groupBy("word").agg(F.sum("tf").alias("_ctf"))
    # |q| = distinct query terms present in the corpus — rides the same
    # broadcast row as the token mass (one fused 1-row frame)
    nq = ctf.agg(F.count(F.lit(1)).cast("double").alias("_nq"))
    consts = mass.crossJoin(nq)
    scored = (
        hits.join(F.broadcast(ctf), "word")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "_w",
            F.log(
                1.0
                + F.col("tf")
                / (F.lit(float(mu)) * F.col("_ctf") / F.col("_mass"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("_w").alias("_match"),
            F.max("_nq").alias("_nq"),
            F.count(F.lit(1)).cast("int").alias("matched_terms"),
        )
        .join(doclens, "doc_id")
        .select(
            "doc_id",
            F.round(
                F.col("_match")
                + F.col("_nq")
                * F.log(
                    F.lit(float(mu)) / (F.col("doclen") + F.lit(float(mu)))
                ),
                6,
            ).alias("score"),
            "matched_terms",
        )
    )
    ordered = scored.orderBy(F.desc("score"), F.asc("doc_id"))
    return ordered if k is None else ordered.limit(k)


def conjunctive_search(
    postings: DataFrame,
    query_terms: list[str],
    k: int | None = None,
) -> DataFrame:
    """Boolean-AND retrieval: documents containing EVERY query term —
    the posting-list intersection of Manning, Raghavan & Schutze IIR
    ch. 1.3, expressed as one join + group-HAVING instead of the
    textbook merge walk.  Returns (doc_id, total_tf, min_tf) ordered by
    total query-term mass (desc, doc_id asc): total_tf = sum of the
    matched terms' tfs, min_tf = the weakest term's tf (the classic
    AND-semantics ranking signal).

    Scale shape: the term list is broadcast; only query-term postings
    leave the scan (pushed filter); one map-side-partial aggregate on
    doc_id with HAVING count = |q| — the intersection never
    materializes per-pair, and no window or driver action runs.
    """
    terms_list = list(dict.fromkeys(query_terms))
    if not terms_list:
        raise ValueError("query_terms must be non-empty")
    spark = postings.sparkSession
    terms = spark.createDataFrame([(t,) for t in terms_list], "word string")
    hits = postings.join(F.broadcast(terms), "word", "inner")
    out = (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("_n"),
            F.sum("tf").alias("total_tf"),
            F.min("tf").alias("min_tf"),
        )
        .filter(F.col("_n") == len(terms_list))
        .select("doc_id", "total_tf", "min_tf")
        .orderBy(F.desc("total_tf"), F.asc("doc_id"))
    )
    return out if k is None else out.limit(k)


def champion_lists(postings: DataFrame, m: int = 10) -> DataFrame:
    """Champion lists / impact-ordered index tiering (Manning, Raghavan
    & Schutze IIR ch. 7.1.3): keep only each term's ``m`` highest-tf
    postings (ties to the lower doc_id) — the static index-time pruning
    that lets a serving tier answer top-k from a small fraction of the
    full posting file.  Compose with ``tfidf_search``/``bm25_search``
    for champion-only retrieval.

    Scale shape (10^10 postings): the rank-<=m filter over a
    per-word window lowers to WindowGroupLimit, so every map task
    forwards at most m rows per word BEFORE the exchange — hot words
    (the skew hazard of per-term windows) are capped at the source.
    """
    if m < 1:
        raise ValueError("m must be >= 1")
    w = Window.partitionBy("word").orderBy(F.desc("tf"), F.asc("doc_id"))
    return (
        postings.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= m)
        .drop("_r")
    )


def rm3_expansion(
    postings: DataFrame,
    query_terms: list[str],
    mu: float = 2000.0,
    fb_docs: int = 10,
    fb_terms: int = 10,
    lam: float = 0.5,
) -> DataFrame:
    """RM3 pseudo-relevance-feedback query expansion (Lavrenko & Croft
    SIGIR 2001 relevance model, interpolated per Abdul-Jaleel et al.
    TREC 2004): run the Dirichlet-QL ranker, treat its top ``fb_docs``
    as pseudo-relevant, estimate the relevance model

      p(d|Q)  = softmax over the feedback docs' (rounded) QL scores
      p(w|R)  = sum_d p(w|d) * p(d|Q)   with p(w|d) = tf_wd / doclen_d

    keep the ``fb_terms`` highest-weight terms, and interpolate with
    the uniform original-query distribution:

      p'(w) = lam * p_orig(w) + (1 - lam) * p_RM1(w)

    Returns (word, weight, from_query, from_feedback) — the expanded
    query distribution a downstream weighted-QL/BM25 pass consumes.
    Pinned for oracle replay: feedback selection uses the ROUNDED
    6-decimal QL scores with doc_id tie-break; the feedback-term cut
    ranks on p(w|R) rounded to 9 decimals with word tie-break (raw
    doubles differ across engines at ~1e-16 — rounding makes the
    selection, not just the values, reproducible); weights round to 6.

    Scale shape (10^10 postings): the QL pass is the lm_dirichlet_search
    plan (term-pruned scan + one doc_id join); the feedback set is
    ``fb_docs`` rows — BROADCAST back onto the postings scan, so the
    relevance model is one semi-pruned scan + one map-side-partial
    aggregate keyed on word; the term cut is TakeOrderedAndProject.
    Nothing corpus-sized shuffles twice.
    """
    if not (0.0 <= lam <= 1.0):
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if fb_docs < 1 or fb_terms < 1:
        raise ValueError("fb_docs and fb_terms must be >= 1")
    spark = postings.sparkSession
    terms_list = list(dict.fromkeys(query_terms))
    fb = lm_dirichlet_search(postings, terms_list, mu=mu, k=fb_docs).select(
        "doc_id", "score"
    )
    mx = fb.agg(F.max("score").alias("_mx"))
    e = fb.crossJoin(F.broadcast(mx)).select(
        "doc_id", F.exp(F.col("score") - F.col("_mx")).alias("_e")
    )
    z = e.agg(F.sum("_e").alias("_z"))
    pd = e.crossJoin(F.broadcast(z)).select(
        "doc_id", (F.col("_e") / F.col("_z")).alias("_pd")
    )
    fbpost = postings.join(F.broadcast(pd), "doc_id")
    fdl = fbpost.groupBy("doc_id").agg(
        F.sum("tf").cast("double").alias("_dl")
    )
    rm1 = (
        fbpost.join(F.broadcast(fdl), "doc_id")
        .groupBy("word")
        .agg(F.sum(F.col("tf") / F.col("_dl") * F.col("_pd")).alias("_rm1"))
    )
    top = (
        rm1.select("word", F.round("_rm1", 9).alias("_rm1"))
        .orderBy(F.desc("_rm1"), F.asc("word"))
        .limit(fb_terms)
    )
    orig = spark.createDataFrame(
        [(t, 1.0 / len(terms_list)) for t in terms_list], "word string, _pq double"
    )
    return (
        orig.join(top, "word", "full")
        .select(
            "word",
            F.round(
                F.lit(float(lam)) * F.coalesce("_pq", F.lit(0.0))
                + F.lit(1.0 - float(lam)) * F.coalesce("_rm1", F.lit(0.0)),
                6,
            ).alias("weight"),
            F.col("_pq").isNotNull().alias("from_query"),
            F.col("_rm1").isNotNull().alias("from_feedback"),
        )
    )


def rrf_fuse(
    runs: list[DataFrame],
    k0: int = 60,
    id_col: str = "doc_id",
    score_col: str = "score",
    k: int | None = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    fuse N retrieval runs for the same query by summing 1/(k0 + rank)
    over the runs each document appears in — the standard hybrid-search
    combiner (BM25 x QL, lexical x dense) that needs no score
    calibration because it consumes only RANKS.

    Pinned semantics: each run is ranked by (score desc, id asc) — runs
    are expected to carry rounded scores, so ranks are reproducible
    cross-engine; a doc absent from a run contributes nothing for it
    (the paper's convention); rrf_score rounds to 9 and orders the
    output with id tie-break.  Returns (doc_id, rrf_score,
    runs_matched).

    Scale shape: per-run ranking uses the two-phase range-partitioned
    global rank (operators/ranking.py — no single-reducer window even
    when a run has 10^8 matches); the fusion is one map-side-partial
    aggregate on doc_id; ``k`` lowers to TakeOrderedAndProject.
    """
    if not runs:
        raise ValueError("runs must be non-empty")
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1, got {k0}")
    from .ranking import global_row_number

    fused = None
    for run in runs:
        ranked = global_row_number(
            run.select(
                F.col(id_col).alias("doc_id"), F.col(score_col).alias("_s")
            ),
            order_by=[F.desc("_s"), F.asc("doc_id")],
            name="_r",
            dtype="long",
        ).select(
            "doc_id",
            (F.lit(1.0) / (F.lit(float(k0)) + F.col("_r"))).alias("_c"),
        )
        fused = ranked if fused is None else fused.unionByName(ranked)
    out = fused.groupBy("doc_id").agg(
        F.round(F.sum("_c"), 9).alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("runs_matched"),
    )
    ordered = out.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return ordered if k is None else ordered.limit(k)


def bm25f_search(
    field_postings: DataFrame,
    query_terms: list[str],
    total_docs: int | DataFrame,
    field_weights: dict[str, float],
    field_b: dict[str, float],
    k1: float = 1.2,
    k: int | None = 20,
) -> DataFrame:
    """BM25F fielded ranking (Robertson, Zaragoza & Taylor, CIKM 2004
    'Simple BM25 extension to multiple weighted fields') — the web-search
    upgrade of flat BM25: term frequencies from structured fields
    (title / body / anchor text) are length-normalized PER FIELD,
    weighted, and summed into one pseudo-frequency BEFORE the k1
    saturation, so a title hit is worth more than a body hit without
    double-saturating.

    Input is (word, doc_id, field, tf).  Pinned semantics
    (oracle-replayable):

      len(d,f)   = sum of tf over d's field-f postings
      avglen(f)  = sum over docs of len(d,f) / N  (absent field = 0)
      tf~(w,d)   = sum_f  w_f * tf / (1 - b_f + b_f * len(d,f)/avglen(f))
      idf(w)     = ln(1 + (N - df + 0.5) / (df + 0.5)),  df counted over
                   docs containing w in ANY CONFIGURED field

    Postings whose ``field`` has no entry in ``field_weights`` are
    EXCLUDED consistently — from the tf~ sum, the field lengths, and
    the df/idf counts — so an unconfigured field never contributes to a
    doc's score in one place while silently depressing idf in another
    (a typo'd field name changes nothing rather than corrupting scores).
      score(d)   = sum over matched terms of idf * tf~ / (k1 + tf~)

    rounded to 6, doc_id tie-break; ``matched_terms`` counts the
    distinct matched query terms.  ``total_docs`` is a scalar or a
    DataFrame counted in-plan (broadcast 1-row aggregate — same
    contract as ``bm25_search``).

    Scale shape (10^10 postings): the word filter pushes into the scan;
    field lengths are ONE map-side-partial aggregate keyed (doc_id,
    field); avglen collapses to an n_fields-row broadcast; the field
    weight table is a literal broadcast; the only wide exchange is the
    hits-to-field-lengths equi-join on (doc_id, field).  ``k`` lowers
    to TakeOrderedAndProject.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    missing = set(field_weights) ^ set(field_b)
    if missing:
        raise ValueError(f"field_weights/field_b keys differ: {missing}")
    spark = field_postings.sparkSession
    terms_list = list(dict.fromkeys(query_terms))
    terms = spark.createDataFrame([(t,) for t in terms_list], "word string")
    if isinstance(total_docs, DataFrame):
        n_df = total_docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    else:
        n_df = spark.range(1).select(F.lit(float(total_docs)).alias("_n"))
    # consistent scope: only configured fields exist downstream (see
    # docstring) — an isin literal filter, pushed into the scan
    field_postings = field_postings.filter(
        F.col("field").isin(sorted(field_weights))
    )
    flens = field_postings.groupBy("doc_id", "field").agg(
        F.sum("tf").alias("_flen")
    )
    avglens = (
        flens.groupBy("field")
        .agg(F.sum("_flen").cast("double").alias("_sumfl"))
        .crossJoin(F.broadcast(n_df))
        .select("field", (F.col("_sumfl") / F.col("_n")).alias("_avgfl"))
    )
    wdf = spark.createDataFrame(
        [
            (f, float(field_weights[f]), float(field_b[f]))
            for f in sorted(field_weights)
        ],
        "field string, _wf double, _bf double",
    )
    hits = field_postings.join(F.broadcast(terms), "word")
    dfs = (
        hits.select("word", "doc_id")
        .distinct()
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("double").alias("_df"))
    )
    tfw = (
        hits.join(flens, ["doc_id", "field"])
        .join(F.broadcast(avglens), "field")
        .join(F.broadcast(wdf), "field")
        .withColumn(
            "_c",
            F.col("_wf")
            * F.col("tf")
            / (
                1.0
                - F.col("_bf")
                + F.col("_bf") * F.col("_flen") / F.col("_avgfl")
            ),
        )
        .groupBy("word", "doc_id")
        .agg(F.sum("_c").alias("_tfw"))
    )
    scored = (
        tfw.join(F.broadcast(dfs), "word")
        .crossJoin(F.broadcast(n_df))
        .withColumn(
            "_s",
            F.log(
                1.0
                + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
            )
            * F.col("_tfw")
            / (F.lit(float(k1)) + F.col("_tfw")),
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("_s"), 6).alias("score"),
            F.count(F.lit(1)).cast("int").alias("matched_terms"),
        )
    )
    ordered = scored.orderBy(F.desc("score"), F.asc("doc_id"))
    return ordered if k is None else ordered.limit(k)


def proximity_min_span(
    tokens: DataFrame,
    query_terms: list[str],
    k: int | None = 20,
) -> DataFrame:
    """Proximity retrieval: for every document containing ALL query
    terms, the length of the smallest position window covering at least
    one occurrence of each (the minimal cover span of Clarke et al.'s
    cover-density family) — the classic "terms near each other" signal
    between exact phrase match and bag-of-words.

    Input is positional tokens (doc_id, pos, word).  The minimal span
    is computed in ONE ordered pass per document: scanning occurrences
    by position, keep a running last-seen position PER TERM (a
    conditional running max); whenever every term has been seen, the
    candidate span is cur_pos - min(last-seen) + 1; the answer is the
    minimum candidate.  Returns (doc_id, min_span, best_end) ordered by
    (min_span asc, doc_id asc) — ``best_end`` is the smallest window
    END position achieving it (deterministic snippet anchor).

    Scale shape (10^10 tokens): the term filter pushes into the scan
    (|q| terms), so the windowed pass runs over MATCHED occurrences
    only; the window partitions by doc_id (no global window), and the
    final per-doc fold is a map-side-partial min.  ``k`` lowers to
    TakeOrderedAndProject.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    from pyspark.sql import Window

    spark = tokens.sparkSession
    terms_list = list(dict.fromkeys(query_terms))
    terms = spark.createDataFrame([(t,) for t in terms_list], "word string")
    occ = tokens.join(F.broadcast(terms), "word").select(
        "doc_id", "pos", "word"
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lasts = [
        F.max(F.when(F.col("word") == t, F.col("pos"))).over(w).alias(f"_l{i}")
        for i, t in enumerate(terms_list)
    ]
    with_last = occ.select("doc_id", "pos", *lasts)
    last_cols = [F.col(f"_l{i}") for i in range(len(terms_list))]
    earliest = F.least(*last_cols) if len(last_cols) > 1 else last_cols[0]
    span = F.col("pos") - earliest + 1
    # least() ignores NULLs in both Spark and DuckDB, so "all terms
    # seen" must be an explicit conjunction, not least(...).isNotNull()
    all_seen = F.lit(True)
    for i in range(len(terms_list)):
        all_seen = all_seen & F.col(f"_l{i}").isNotNull()
    complete = with_last.filter(all_seen)
    scored = (
        complete.select("doc_id", span.alias("_span"), F.col("pos").alias("_end"))
        .groupBy("doc_id")
        .agg(
            F.min("_span").cast("long").alias("min_span"),
            F.min_by(F.col("_end"), F.struct(F.col("_span"), F.col("_end")))
            .cast("long")
            .alias("best_end"),
        )
    )
    ordered = scored.orderBy(F.asc("min_span"), F.asc("doc_id"))
    return ordered if k is None else ordered.limit(k)
