"""Index-construction operators: tokens → lexicon / postings / forward index.

Reference: the driver-side fold at /root/reference/src/index.py:48-116 builds
lexicon (arrival-order ids), forward index (ordered word-id lists) and
inverted index (word→doc→tf) as mutable dicts. Here each is ONE declarative
DataFrame job — Catalyst does partial/final hash aggregation, and ids are
assigned by rank over a *deterministic first-encounter order* (the reference's
arrival-order ids are nondeterministic under its unordered worker pool,
src/index.py:46; we fix that — SURVEY.md §7 determinism rules).

All functions take a ``tokens`` DF of (doc_id, pos, word) produced by
:func:`tokens_from_text` — pure JVM expressions, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens_from_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_stopwords: bool = True,
) -> DataFrame:
    """(doc_id, pos, word): ``[a-z0-9]{2,}`` token runs from the lowercased
    text — punctuation splits off and vanishes exactly like the reference's
    spaCy tokenizer + ``token.is_punct`` drop ('pandemic.' indexes as
    'pandemic', so index tokens and query tokens agree,
    src/multiwordSearch.py:46-52) — then standalone digit runs dropped
    (``like_num``) and stopwords dropped (``token.is_stop``), the reference
    index-time filter at src/crawler.py:190-193. ``pos`` is the token's
    index in the stream BEFORE the drop filters (order preserved). Pure JVM
    expressions, no Python UDF."""
    from ..functions.text import STOPWORDS, tokenize_name

    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize_name(text_col)).alias("pos", "word"),
    )
    out = exploded.filter(~F.col("word").rlike(r"^\d+$"))
    if drop_stopwords:
        out = out.filter(~F.col("word").isin(STOPWORDS))
    return out


def lexicon(tokens: DataFrame) -> DataFrame:
    """word → (word_id, lemma, doc_freq, total_count) with deterministic ids.

    id order = first encounter in (doc_id, pos) scan order, ties broken by
    word — reproducing the reference's first-encounter semantics
    (src/index.py:78-87) but parallelism-proof. The ``lemma`` column is the
    reference lexicon's stored lemma field (src/index.py lexicon entries
    carry ``{"lemma": ...}``; consumed by query expansion,
    src/singlewordSearch.py:441-476) — computed by the codegen'd Catalyst
    mirror of the lemmatizer stub.
    """
    from ..functions.text import lemma_expr

    from .ranking import global_row_number

    stats = tokens.groupBy("word").agg(
        F.min(F.struct(F.col("doc_id"), F.col("pos"))).alias("first_at"),
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count(F.lit(1)).alias("total_count"),
    )
    # two-phase global rank — a bare row_number() window would single-reduce
    # the whole vocabulary (operators/ranking.py)
    ranked = global_row_number(
        stats, [F.asc("first_at"), F.asc("word")], name="word_id"
    )
    return ranked.withColumn("lemma", lemma_expr(F.col("word"))).select(
        "word", "word_id", "lemma", "doc_freq", "total_count"
    )


def postings(tokens: DataFrame) -> DataFrame:
    """Inverted index in relational (exploded) form: (word, doc_id, tf).
    Reference map-of-maps: src/index.py:96-99."""
    return tokens.groupBy("word", "doc_id").agg(F.count(F.lit(1)).alias("tf"))


def forward_index(tokens: DataFrame) -> DataFrame:
    """doc_id → ordered word list (src/index.py:89-93); order restored via
    sort_array over (pos, word) structs — deterministic at any parallelism."""
    return tokens.groupBy("doc_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "word"))),
            lambda s: s["word"],
        ).alias("words")
    )


def backward_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    lemmatizer=None,
) -> DataFrame:
    """doc_id → ordered [struct(lemma, pos)] — the reference's backward
    index (src/index.py:67-68 stores each doc's token dicts verbatim).
    The Arrow lemmatizer already returns the ordered struct array, so this
    is a single projection; the exploded relational form is validated
    against a DuckDB oracle by the ``backward_index_rows`` driver query.

    ``lemmatizer`` overrides the tokenize+lemmatize UDF — pass
    ``make_lemmatizer('auto')`` (functions/text.py) to use the real spaCy
    model when the environment has it; default is the deterministic stub
    the oracles mirror."""
    from ..functions.text import lemmatize_tokens

    lem = lemmatizer if lemmatizer is not None else lemmatize_tokens
    return docs.select(
        F.col(id_col).alias("doc_id"),
        lem(F.col(text_col)).alias("tokens"),
    )


def pos_distribution(tokens_with_pos: DataFrame, pos_col: str = "pos_tag") -> DataFrame:
    """POS rollup (src/index.py:192-198): explode → groupBy → orderBy desc."""
    return (
        tokens_with_pos.groupBy(pos_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col(pos_col))
    )


def doc_id_mapping(postings_df: DataFrame) -> DataFrame:
    """Dense int ids over sorted doc ids (src/barreled_index.py:139-156:
    ``sorted(all_doc_ids)`` then enumerate) — determinism lever O8.
    Two-phase rank: at 10^10 docs a global row_number window is a
    single-reducer point (operators/ranking.py)."""
    from .ranking import global_row_number

    return global_row_number(
        postings_df.select("doc_id").distinct(), [F.asc("doc_id")], name="int_id"
    )
