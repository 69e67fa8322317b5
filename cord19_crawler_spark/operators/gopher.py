"""Gopher-style document quality signals (Rae et al. 2021, arXiv:2112.11446
Table A1 — the MassiveText quality rules), the within-document repetition
filter family every published web-corpus recipe applies between language-ID
and near-dup (also Dolma, arXiv:2402.00159; RefinedWeb, arXiv:2306.01116).

The reference repo filters documents only by token length
(/root/reference/src/crawler.py min-length gate); this module is the
beyond-reference quality family for training-data curation.

All signals are exact ratios of integer counts (no transcendental math), so
the DuckDB oracle matches bit-for-bit before rounding. Definitions are
pinned here because the paper leaves them loose:

- words: whitespace-split (``\\s+``), empties dropped — NOT the index
  tokenizer; Gopher words keep punctuation.
- word_chars: sum of word lengths (spaces excluded).
- symbol_word_ratio: (count('#') + count('...') + count('…')) / n_words,
  non-overlapping substring counts.
- alpha word: contains at least one ``[a-zA-Z]``.
- stop hits: DISTINCT members of the paper's 8-stopword set {the, be, to,
  of, and, that, have, with} present after lowercasing and stripping
  non-letters from each word.
- lines: ``split(text, line_delim)``, whitespace-trimmed (regex ``\\s``,
  so tabs too), empties dropped. A line is
  a bullet line if its first character is in {•, ‣, ▪, -, *}; an ellipsis
  line if it ends with '...' or '…'. dup_line_frac counts occurrences
  beyond the first (sum(c-1)/n_lines); dup_line_char_frac weights them by
  line length over total line chars.
- n-grams (n=2..10) over LOWERCASED words, joined with single spaces; a
  gram's character mass is count * length(joined gram) — the
  non-overlap-adjusted variant (each occurrence counts fully; overlapping
  occurrences are not de-overlapped — fractions may exceed 1 on degenerate
  docs, which simply fail the threshold). top_{n}gram_char_frac (n=2..4)
  uses the most frequent gram (ties: larger char mass wins); dup_{n}gram_
  char_frac (n=5..10) sums mass over grams occurring >= 2 times. Both are
  fractions of word_chars.
- keep: the published thresholds — min_words <= n_words <= max_words,
  3 <= mean_word_len <= 10, symbol_word_ratio <= 0.1, frac_bullet_lines
  < 0.9, frac_ellipsis_lines < 0.3, frac_alpha_words >= 0.8, n_stop_hits
  >= min_stop_hits, dup_line_frac <= 0.3, dup_line_char_frac <= 0.2,
  top 2/3/4-gram <= 0.20/0.18/0.16, dup 5..10-gram <=
  0.15/0.14/0.13/0.12/0.11/0.10 — evaluated on the ROUNDED (6 dp)
  fractions so engine-boundary ties cannot flip the flag.

Scale shape (100 TB): the scalar signals are pure Catalyst HOFs on the
scan (zero shuffle). Repetition stats explode lines and n-grams and hash-
aggregate on (doc_id, key) — LINEAR in tokens (the n=2..10 fan-out is a
constant 9x), with map-side partials, keyed by doc_id so boilerplate
floods across documents cannot create a hot key (the worst key is one
document's own repetition, bounded by document length). The three per-doc
frames re-join on doc_id — uniform by construction, AQE-splittable.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS8 = ("the", "be", "to", "of", "and", "that", "have", "with")
BULLET_CHARS = ("•", "‣", "▪", "-", "*")

TOP_GRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_GRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}

_WORDS = "filter(split({c}, '\\\\s+'), w -> w != '')"
_LINES = (
    "filter(transform(split({c}, '{d}'), "
    "l -> regexp_replace(l, '^\\\\s+|\\\\s+$', '')), l -> l != '')"
)
# n-gram stream via POSITION explodes (r6): explode n = 2..10, then the
# 1-based start positions for that n, and build each gram with ONE
# array_join(slice(...)) on the exploded row.  The r5 shape exploded a
# pre-built flatten(transform(...)) array of (n, g) structs, which makes
# Catalyst inline the whole array builder into the Generate and re-evaluate
# it per OUTPUT element — the dominant cost of the curation pipeline
# (measured: gopher 75s -> ~8s at sf1.0; see functions/quality.py
# ngram_positions and OPTIMIZATION_r06.md).
_GRAM_POS = """
CASE WHEN size(_lw) >= n THEN sequence(1, size(_lw) - n + 1)
ELSE array() END
"""


def _frac(num, den):
    return F.round(
        F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 6
    )


def gopher_quality_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_delim: str = r"\\n+",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_hits: int = 2,
) -> DataFrame:
    """One row per input document with the full Gopher signal set and the
    composite ``keep`` flag (see module docstring for pinned definitions
    and thresholds). ``line_delim`` is the line-boundary regex as it
    appears INSIDE a SQL string literal (default newline runs)."""
    stop_set = ", ".join(f"'{w}'" for w in STOPWORDS8)
    bullets = ", ".join(f"'{b}'" for b in BULLET_CHARS)
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.expr(_WORDS.format(c=text_col)).alias("_w"),
        F.expr(_LINES.format(c=text_col, d=line_delim)).alias("_l"),
        F.col(text_col).alias("_t"),
    ).select(
        "doc_id",
        "_w",
        "_l",
        "_t",
        F.expr("transform(_w, w -> lower(w))").alias("_lw"),
    )

    t = F.col("_t")
    base = d.select(
        "doc_id",
        F.size("_w").cast("long").alias("n_words"),
        F.expr("aggregate(_w, 0L, (a, w) -> a + length(w))").alias("_wc"),
        (
            (F.length(t) - F.length(F.expr("replace(_t, '#', '')")))
            + (F.length(t) - F.length(F.expr("replace(_t, '...', '')"))) / 3
            + (F.length(t) - F.length(F.expr("replace(_t, '…', '')")))
        ).alias("_sym"),
        F.size(F.expr("filter(_w, w -> w rlike '[a-zA-Z]')")).alias("_alpha"),
        F.size(
            F.expr(
                "array_distinct(filter(transform(_lw, w -> "
                f"regexp_replace(w, '[^a-z]', '')), s -> s IN ({stop_set})))"
            )
        ).cast("long").alias("n_stop_hits"),
        F.size("_l").cast("long").alias("n_lines"),
        F.size(
            F.expr(f"filter(_l, l -> substring(l, 1, 1) IN ({bullets}))")
        ).alias("_bullet"),
        F.size(
            F.expr("filter(_l, l -> l LIKE '%...' OR l LIKE '%…')")
        ).alias("_ell"),
    )

    # position explode (not explode(_l)): keeps the line-splitting chain
    # out of the Generate so it runs once per document, not per line
    lines = d.select(
        "doc_id",
        "_l",
        F.explode(
            F.expr("CASE WHEN size(_l) >= 1 THEN sequence(1, size(_l)) "
                   "ELSE array() END")
        ).alias("_li"),
    ).select("doc_id", F.expr("element_at(_l, _li)").alias("line"))
    la = (
        lines.groupBy("doc_id", "line")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("c") - 1).alias("_dup_l"),
            F.sum((F.col("c") - 1) * F.length("line")).alias("_dup_lc"),
            F.sum(F.col("c") * F.length("line")).alias("_tot_lc"),
        )
    )

    grams = (
        d.select("doc_id", "_lw", F.explode(F.expr("sequence(2, 10)")).alias("n"))
        .select(
            "doc_id", "_lw", "n", F.explode(F.expr(_GRAM_POS)).alias("_gi")
        )
        .select(
            "doc_id",
            "n",
            F.expr("array_join(slice(_lw, _gi, n), ' ')").alias("g"),
        )
    )
    # top-gram selection packs (c, cov) into ONE bigint so the aggregate
    # stays a HashAggregate: max(struct(c, cov)) is not hash-aggregable
    # (struct buffer), which forced a SortAggregate — i.e. a full sort of
    # the gram stream on (doc_id, n) before AND after its exchange.  The
    # pack is exact for c < 2^29 gram occurrences and cov < 2^34 chars of
    # per-gram mass per document (a >2^29-occurrence gram needs a >2^30-
    # char document — beyond Spark's row limit); out-of-bound docs fail
    # loud rather than mis-rank, mirroring global_row_number's INT_MAX
    # guard.
    cov = F.col("c") * F.length("g").cast("long")
    packed = F.when(
        (F.col("c") < F.lit(1 << 29)) & (cov < F.lit(1 << 34)),
        F.col("c") * F.lit(1 << 34) + cov,
    ).otherwise(
        F.expr(
            "CAST(raise_error('gopher_quality_signals: per-doc gram mass "
            "exceeds the (2^29 occurrences, 2^34 chars) packing bound') "
            "AS BIGINT)"
        )
    )
    gn = (
        grams.groupBy("doc_id", "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n")
        .agg(
            F.max(packed).alias("_packed"),
            F.sum(F.when(F.col("c") >= 2, cov).otherwise(0)).alias("_dup"),
        )
        .select(
            "doc_id",
            "n",
            (F.col("_packed") % F.lit(1 << 34)).alias("_top"),
            "_dup",
        )
    )
    gp = gn.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("n") == k, F.col("_top"))).alias(f"_top{k}")
            for k in TOP_GRAM_MAX
        ],
        *[
            F.max(F.when(F.col("n") == k, F.col("_dup"))).alias(f"_dup{k}")
            for k in DUP_GRAM_MAX
        ],
    )

    j = base.join(la, "doc_id", "left").join(gp, "doc_id", "left")
    nw, wc, nl = F.col("n_words"), F.col("_wc"), F.col("n_lines")
    out = j.select(
        "doc_id",
        "n_words",
        _frac(wc, nw).alias("mean_word_len"),
        _frac(F.col("_sym"), nw).alias("symbol_word_ratio"),
        _frac(F.col("_alpha"), nw).alias("frac_alpha_words"),
        "n_stop_hits",
        "n_lines",
        _frac(F.col("_bullet"), nl).alias("frac_bullet_lines"),
        _frac(F.col("_ell"), nl).alias("frac_ellipsis_lines"),
        _frac(F.coalesce("_dup_l", F.lit(0)), nl).alias("dup_line_frac"),
        _frac(
            F.coalesce("_dup_lc", F.lit(0)), F.coalesce("_tot_lc", F.lit(0))
        ).alias("dup_line_char_frac"),
        *[
            _frac(F.coalesce(f"_top{k}", F.lit(0)), wc).alias(
                f"top_{k}gram_char_frac"
            )
            for k in TOP_GRAM_MAX
        ],
        *[
            _frac(F.coalesce(f"_dup{k}", F.lit(0)), wc).alias(
                f"dup_{k}gram_char_frac"
            )
            for k in DUP_GRAM_MAX
        ],
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("frac_bullet_lines") < 0.9)
        & (F.col("frac_ellipsis_lines") < 0.3)
        & (F.col("frac_alpha_words") >= 0.8)
        & (F.col("n_stop_hits") >= min_stop_hits)
        & (F.col("dup_line_frac") <= 0.3)
        & (F.col("dup_line_char_frac") <= 0.2)
    )
    for k, thr in TOP_GRAM_MAX.items():
        keep = keep & (F.col(f"top_{k}gram_char_frac") <= thr)
    for k, thr in DUP_GRAM_MAX.items():
        keep = keep & (F.col(f"dup_{k}gram_char_frac") <= thr)
    return out.withColumn("keep", keep)
