"""C4 cleaning rules (Raffel et al. 2020, arXiv:1910.10683 §2.2) — the
line-level heuristics applied to Common Crawl before TPU training, the
third published quality family next to Gopher (operators/gopher.py) and
CCNet perplexity (operators/traindata.py lm_perplexity_scores).

The reference repo has no quality filtering beyond a min-token gate
(/root/reference/src/crawler.py); this is beyond-reference curation.

Pinned definitions (the paper is prose; these are the exact semantics both
the Spark plan and the DuckDB oracle compute):

- lines: ``split(text, line_delim)``, whitespace-trimmed, empties dropped.
- a line is KEPT iff it ends with terminal punctuation ('.', '!', '?',
  or closing double quote '"' preceded by one of those — pinned to: last
  char in {.!?"}) AND has >= ``min_line_words`` whitespace words AND does
  not contain the word "javascript" (case-insensitive, word-bounded).
- clean_text joins kept lines (original casing) with ``join_sep``.
- sentences: terminal-punctuation runs in clean_text — count of
  ``[.!?]+`` matches.
- document drops (evaluated on the ORIGINAL text, lowercased): contains
  "lorem ipsum"; contains '{'; contains any blocklist word
  (word-bounded match — the paper uses the public "List of Dirty,
  Naughty, Obscene..." list; callers pass their own, no external data).
- keep: no document drop AND n_sentences >= ``min_sentences``.

Scale shape (100 TB): the whole operator is ONE scan-side Catalyst
projection — line filtering, joining, sentence counting, and the document
predicates are all higher-order functions / regexes on the row, zero
shuffle, zero UDF. The blocklist compiles into a single word-bounded
regex alternation (bounded size — C4's list is ~400 terms); an
arbitrarily large blocklist would instead broadcast-join exploded words,
same as benchmark_decontamination.
"""
from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LINES = (
    "filter(transform(split({c}, '{d}'), "
    "l -> regexp_replace(l, '^\\\\s+|\\\\s+$', '')), l -> l != '')"
)


def c4_quality_filter(
    docs: DataFrame,
    badwords: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_delim: str = r"\\n+",
    min_line_words: int = 5,
    min_sentences: int = 3,
    join_sep: str = "\n",
) -> DataFrame:
    """One row per input document: (doc_id, n_lines, n_lines_kept,
    n_sentences, has_lorem, has_brace, has_badword, keep, clean_text).
    See the module docstring for the pinned rule semantics."""
    if min_line_words < 1:
        raise ValueError(f"min_line_words must be >= 1, got {min_line_words}")
    if min_sentences < 1:
        raise ValueError(f"min_sentences must be >= 1, got {min_sentences}")
    for w in badwords or []:
        if not re.fullmatch(r"[a-z0-9 ]+", w):
            raise ValueError(f"blocklist terms must be [a-z0-9 ]+, got {w!r}")

    keep_line = (
        "l -> substring(l, -1, 1) IN ('.', '!', '?', '\"') "
        f"AND size(filter(split(l, '\\\\s+'), w -> w != '')) >= {min_line_words} "
        "AND NOT lower(l) rlike '\\\\bjavascript\\\\b'"
    )
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.expr(_LINES.format(c=text_col, d=line_delim)).alias("_l"),
        F.lower(F.col(text_col)).alias("_lt"),
    ).select(
        "doc_id",
        F.size("_l").cast("long").alias("n_lines"),
        F.expr(f"filter(_l, {keep_line})").alias("_k"),
        "_lt",
    )
    clean = F.array_join(F.col("_k"), join_sep)
    has_bad = (
        F.col("_lt").rlike(
            "\\b(" + "|".join(re.escape(w) for w in badwords) + ")\\b"
        )
        if badwords
        else F.lit(False)
    )
    out = d.select(
        "doc_id",
        "n_lines",
        F.size("_k").cast("long").alias("n_lines_kept"),
        F.col("_lt").contains("lorem ipsum").alias("has_lorem"),
        F.col("_lt").contains("{").alias("has_brace"),
        has_bad.alias("has_badword"),
        clean.alias("clean_text"),
    ).withColumn(
        "n_sentences",
        F.size(F.expr("regexp_extract_all(clean_text, '[.!?]+', 0)"))
        .cast("long"),
    )
    return out.withColumn(
        "keep",
        (~F.col("has_lorem"))
        & (~F.col("has_brace"))
        & (~F.col("has_badword"))
        & (F.col("n_sentences") >= min_sentences),
    ).select(
        "doc_id", "n_lines", "n_lines_kept", "n_sentences",
        "has_lorem", "has_brace", "has_badword", "keep", "clean_text",
    )
