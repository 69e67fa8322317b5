"""Training-data quality functions: Gopher-style repetition metrics and
quality-filter flags, PII redaction, and deterministic hash sampling.

These are the per-document filters a large-scale LLM training-data pipeline
runs over a crawled corpus (public heuristics from the Gopher [Rae et al.
2021, arXiv:2112.11446 §A1.1] and C4 [Raffel et al. 2020] data pipelines).
Everything here is PURE CATALYST — higher-order functions over token arrays,
no UDFs, no shuffle — so each metric is embarrassingly parallel per row and
whole-stage-codegen'd: the exact shape you want for a 100-TB scan.

The per-distinct counting transforms (`transform(array_distinct(a), d ->
size(filter(a, x -> x = d)))`) are O(tokens x distinct) per ROW, all
JVM-side; for web documents (10^2-10^4 tokens) that is microseconds and it
beats a per-doc groupBy (which would shuffle every token) by the width of
the cluster.

Beyond the reference (no counterpart in /root/reference — the reference
indexes a curated corpus and never filters it); tokenization matches the
reference's query tokenizer (src/multiwordSearch.py:46-52) via
functions/text.py:tokenize_name so quality metrics and the search index
agree on what a word is.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from cord19_crawler_spark.functions.text import STOPWORDS

__all__ = [
    "word_ngrams",
    "distinct_frac",
    "top_frac",
    "dup_occurrence_frac",
    "repetition_metrics",
    "gopher_flags",
    "redact_pii",
    "pii_counts",
    "hash_sample_pred",
]

_TOKENS = "regexp_extract_all(lower({c}), '[a-z0-9]{{2,}}', 0)"

# Knuth's multiplicative hash constant (2654435761 = 2^32 / phi). Chosen
# over md5/xxhash because the SAME arithmetic is computable in any SQL
# engine (the DuckDB oracle runs it verbatim), making the sample itself
# oracle-checkable — and it is fast, stateless, and uniform enough for
# sampling (not for adversarial keys).
_KNUTH = 2654435761
_M32 = 4294967296


def _tok_sql(colname: str) -> str:
    return _TOKENS.format(c=colname)


def word_ngrams(array_col: str, n: int) -> Column:
    """Word n-grams over an array<string> column: space-joined windows of
    ``n`` consecutive tokens, [] when the doc is shorter than ``n``.

    `sequence(1, size-n+1)` would count DOWN for short arrays (Spark's
    sequence is bidirectional), hence the explicit size guard.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    a = array_col
    return F.expr(
        f"CASE WHEN size({a}) >= {n} "
        f"THEN transform(sequence(1, size({a}) - {n} + 1), "
        f"     i -> array_join(slice({a}, i, {n}), ' ')) "
        f"ELSE array() END"
    )


def ngram_positions(array_col: str, n: int) -> Column:
    """1-based start positions of the word ``n``-grams of an array<string>
    column — [] when the doc is shorter than ``n`` (explicit guard:
    Spark's ``sequence`` counts DOWN when start > stop).

    Explode THIS (a cheap int sequence) and build each gram with
    ``array_join(slice(a, i, n), ' ')`` on the exploded row, keeping the
    token array a materialized pass-through column of the Generate.
    Exploding the :func:`word_ngrams` array itself makes Catalyst inline
    the whole array-builder into the Generate and re-evaluate it per
    OUTPUT element — measured 25-50s vs 0.6s for the position form on a
    2.7M-gram corpus (optimization round 6; see OPTIMIZATION_r06.md).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    a = array_col
    return F.expr(
        f"CASE WHEN size({a}) >= {n} "
        f"THEN sequence(1, size({a}) - {n} + 1) ELSE array() END"
    )


def ngram_at(array_col: str, pos_col: str, n: int) -> Column:
    """The space-joined ``n``-gram of ``array_col`` starting at the 1-based
    position in ``pos_col`` — the per-row companion of
    :func:`ngram_positions` (identical gram text to :func:`word_ngrams`).
    NULL when ``pos_col`` is NULL (explode_outer's empty-doc row)."""
    return F.expr(f"array_join(slice({array_col}, {pos_col}, {n}), ' ')")


def distinct_frac(array_col: str) -> Column:
    """distinct/total element fraction of an array column; 1.0 for empty
    (an empty doc has no repetition)."""
    a = array_col
    return F.expr(
        f"CASE WHEN size({a}) > 0 "
        f"THEN round(size(array_distinct({a})) / CAST(size({a}) AS DOUBLE), 6) "
        f"ELSE 1.0 END"
    )


def top_frac(array_col: str) -> Column:
    """Fraction of elements taken by the single most frequent element
    (Gopher's 'top n-gram character fraction', word-count form); 0.0 for
    empty arrays."""
    a = array_col
    return F.expr(
        f"CASE WHEN size({a}) > 0 "
        f"THEN round(array_max(transform(array_distinct({a}), "
        f"         d -> size(filter({a}, x -> x = d)))) "
        f"     / CAST(size({a}) AS DOUBLE), 6) "
        f"ELSE 0.0 END"
    )


def dup_occurrence_frac(array_col: str) -> Column:
    """Fraction of elements whose value occurs more than once in the array
    (Gopher's 'duplicate n-gram fraction', word-count form); 0.0 for empty."""
    a = array_col
    return F.expr(
        f"CASE WHEN size({a}) > 0 "
        f"THEN round(size(filter({a}, x -> size(filter({a}, y -> y = x)) > 1)) "
        f"     / CAST(size({a}) AS DOUBLE), 6) "
        f"ELSE 0.0 END"
    )


def repetition_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document within-doc repetition signals (Gopher §A1.1 repetition
    filters, word-level): token count, distinct-token fraction, top-token
    fraction, top-bigram fraction, duplicate-trigram fraction.

    One narrow projection, zero shuffles; tokens and n-grams are named
    intermediate columns so Catalyst computes each array once per row.
    """
    toks = F.expr(_tok_sql(text_col))
    return (
        docs.select(id_col, toks.alias("_toks"))
        .select(
            id_col,
            "_toks",
            word_ngrams("_toks", 2).alias("_bi"),
            word_ngrams("_toks", 3).alias("_tri"),
        )
        .select(
            id_col,
            F.size("_toks").alias("n_tokens"),
            distinct_frac("_toks").alias("distinct_token_frac"),
            top_frac("_toks").alias("top_token_frac"),
            top_frac("_bi").alias("top_bigram_frac"),
            dup_occurrence_frac("_tri").alias("dup_trigram_frac"),
        )
    )


def gopher_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style per-document quality gate: each rule as its own boolean
    column plus the conjunction as ``keep`` (pipelines want the per-rule
    breakdown for ablation, not just the verdict). Thresholds are the
    published Gopher defaults scaled to short synthetic docs via the
    ``min_words`` default; all overridable.
    """
    toks = F.expr(_tok_sql(text_col))
    d = docs.select(id_col, toks.alias("_toks"))
    n = F.size("_toks")
    mean_len = F.when(
        n > 0,
        F.expr("aggregate(_toks, 0L, (a, t) -> a + length(t))")
        / n.cast("double"),
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n > 0,
        F.expr("size(filter(_toks, t -> t rlike '[a-z]'))") / n.cast("double"),
    ).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    stop_hits = F.size(F.filter(F.col("_toks"), lambda t: F.array_contains(stop_arr, t)))
    flags = {
        "flag_word_count": (n >= min_words) & (n <= max_words),
        "flag_mean_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "flag_alpha_word_frac": alpha_frac >= min_alpha_word_frac,
        "flag_stop_hits": stop_hits >= min_stop_hits,
    }
    out = d.select(
        id_col,
        n.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        *[c.alias(name) for name, c in flags.items()],
    )
    keep = None
    for name in flags:
        keep = out[name] if keep is None else (keep & out[name])
    return out.withColumn("keep", keep)


# --- PII redaction ---------------------------------------------------------
# Pattern subset chosen for cross-dialect parity: Java regex (Spark) and RE2
# (DuckDB) agree on these constructs (no backreferences, no lookaround).
_PII_PATTERNS = {
    # local@domain.tld — conservative, no quoted-local-part support
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    # dotted-quad; word-bounded so version strings like 1.2.3.4000 miss
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    # +1-555-123-4567 / (555) 123-4567 / 555.123.4567 — 10+ digit NANP-ish
    "phone": r"(\+?\d{1,2}[-. ]?)?(\(\d{3}\)|\d{3})[-. ]?\d{3}[-. ]?\d{4}\b",
}


def redact_pii(col: Column) -> Column:
    """Replace emails / IPv4s / phone numbers with ``<TYPE>`` tokens.
    Order matters: emails first (an email can embed digit runs a phone
    pattern would otherwise bite into)."""
    c = F.regexp_replace(col, _PII_PATTERNS["email"], "<EMAIL>")
    c = F.regexp_replace(c, _PII_PATTERNS["ipv4"], "<IP>")
    c = F.regexp_replace(c, _PII_PATTERNS["phone"], "<PHONE>")
    return c


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-type match counts for a text column (audit/reporting side of
    redaction). Same patterns as redact_pii. Native regexp_extract_all —
    a SQL-string splice would eat the pattern's backslashes."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        for name, pat in _PII_PATTERNS.items()
    }


def hash_sample_pred(key_col: str, frac: float) -> Column:
    """Deterministic sampling predicate over an integer key: keep iff
    ``(key * 2654435761) mod 2^32 < frac * 2^32``.

    Unlike ``df.sample`` this is reproducible across engines, partitionings
    and runs (training pipelines must be able to re-derive exactly which
    docs a model saw), and it composes with pushdown — the predicate
    reaches the scan. Keys must be non-negative int64 small enough that
    ``key * 2654435761`` does not overflow (true for any sub-2^31 id space;
    at larger scales hash the key first).
    """
    if not (0.0 <= frac <= 1.0):
        raise ValueError(f"frac must be in [0,1], got {frac}")
    threshold = int(frac * _M32)
    return F.expr(f"(({key_col} * {_KNUTH}) % {_M32}) < {threshold}")
