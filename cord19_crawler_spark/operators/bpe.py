"""Byte-pair-encoding tokenizer training — the word-count formulation.

Training a BPE vocabulary (Sennrich et al., "Neural Machine Translation
of Rare Words with Subword Units", ACL 2016) is the canonical tokenizer
step of an LLM data pipeline.  The key scale property is the paper's own:
merges are learned from the WORD FREQUENCY table, not the corpus — a
100-TB corpus collapses to ~10^7 distinct words in ONE linear hash
aggregate, and every subsequent iteration runs on that small table.

* ``word_frequencies`` — the corpus-wide reduce (the only pass over the
  raw text; map-side partial counts, one shuffle on the word key).
* ``pair_counts`` — adjacent-symbol pair statistics weighted by word
  frequency: a scan-side ``transform``/``posexplode`` over the symbol
  arrays plus one linear aggregate on the pair key.  This is the i-th
  iteration's "count all pairs" step and is independently useful as a
  bigram-statistics operator.
* ``merge_pair_expr`` — applies one merge rule to a symbol array as a
  single Catalyst ``aggregate`` fold (greedy left-to-right, exactly the
  reference algorithm's semantics) — JVM-side, no UDF.
* ``train_bpe`` — the iteration: argmax pair (count DESC, pair ASC — a
  total order, so training is deterministic) → rewrite symbol arrays →
  repeat.  The per-round driver traffic is ONE (left, right, count) row;
  the symbol table stays partitioned, with per-round lineage truncated
  via localCheckpoint (the iterative-operator pattern from
  operators/graph.py).

End-of-word is marked with the paper's ``</w>`` sentinel so merges never
cross word boundaries and word-final units stay distinct from prefixes.
No counterpart in /root/reference (its tokenizer is spaCy, pre-trained);
the algorithm is from the published paper above.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "word_frequencies",
    "pair_counts",
    "merge_pair_expr",
    "train_bpe",
    "encode_words",
    "encode_corpus",
    "vocab_coverage",
]

END = "</w>"
_WORD_RE = "[a-z0-9]+"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", pattern: str = _WORD_RE
) -> DataFrame:
    """Corpus → (word, freq): lowercase, regex pre-tokenize, one linear
    count aggregate. The single pass over raw text in BPE training."""
    words = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{pattern}', 0)")
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _initial_symbols(word: Column) -> Column:
    return F.concat(F.split(word, ""), F.array(F.lit(END)))


def pair_counts(symbol_table: DataFrame) -> DataFrame:
    """(word, symbols, freq) → (left, right, pair_count): every adjacent
    symbol pair weighted by the word's corpus frequency.  transform over
    the array on the scan side, one hash aggregate on the pair."""
    pairs = symbol_table.filter(F.size("symbols") >= 2).select(
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("symbols") - 1),
                lambda i: F.struct(
                    F.element_at("symbols", i).alias("left"),
                    F.element_at("symbols", i + 1).alias("right"),
                ),
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(
            F.col("p.left").alias("left"), F.col("p.right").alias("right")
        )
        .agg(F.sum("freq").alias("pair_count"))
    )


def merge_pair_expr(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of one merge (left, right) to a
    symbol array, as a pure Catalyst fold: walking the array, whenever the
    accumulated tail equals ``left`` and the next symbol is ``right``,
    replace the tail with their concatenation ("aaa" under (a,a) →
    ["aa","a"], the reference semantics). JVM-side; no UDF."""
    ll, rl = F.lit(left), F.lit(right)
    return F.aggregate(
        symbols,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(F.size(acc) == 0, F.array(x)).otherwise(
            F.when(
                (F.element_at(acc, -1) == ll) & (x == rl),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(F.element_at(acc, -1), x)),
                ),
            ).otherwise(F.concat(acc, F.array(x)))
        ),
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    pattern: str = _WORD_RE,
    min_pair_count: int = 1,
    checkpoint_dir: str | None = None,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns (merges, symbol_table): ``merges`` is the ordered rule list
    [(left, right, pair_count), ...] — the tokenizer artifact — and
    ``symbol_table`` is the final (word, symbols, freq) frame (useful for
    vocabulary extraction: explode + distinct).  Stops early when no pair
    reaches ``min_pair_count``.  Argmax tie-break is (count DESC, left
    ASC, right ASC), so training is reproducible across partitionings.

    ``checkpoint_dir``: None → per-merge localCheckpoint (fast, not
    executor-loss-safe); a fault-tolerant dir → reliable checkpoint per
    merge, so losing an executor at merge 900/1000 costs nothing (see
    operators/iterutil.py for the trade).
    """
    from .iterutil import lineage_truncator

    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    _ckpt = lineage_truncator(checkpoint_dir)
    sym = _ckpt(
        word_frequencies(docs, text_col=text_col, pattern=pattern)
        .select("word", _initial_symbols(F.col("word")).alias("symbols"), "freq")
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(sym)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merges.append((left, right, cnt))
        sym = _ckpt(
            sym.select(
                "word",
                merge_pair_expr(F.col("symbols"), left, right).alias("symbols"),
                "freq",
            )
        )
    return merges, sym


def encode_words(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "tokens",
    checkpoint_every: int = 16,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """ENCODE with a trained merge table — the production tokenize step.

    Applying BPE to a corpus has the same scale property as training it
    (Sennrich et al. 2016): encode the DISTINCT-WORD table, not every
    token occurrence — a 100-TB corpus's ~10^7 distinct words fit one
    small frame, and per-document sequences come back via a word-key
    join against it.  This operator is that word-table step: it appends
    ``out_col`` (the subword symbol array) to ``words``, applying every
    merge IN TRAINING ORDER as the same greedy left-to-right Catalyst
    fold training used (``merge_pair_expr`` — bit-identical semantics,
    so encoding a corpus with its own training merges reproduces the
    training symbol table exactly; test-pinned).

    Merges accept (left, right) or train_bpe's (left, right, count)
    tuples.  Consecutive folds collapse into one nested projection;
    ``checkpoint_every`` bounds the expression depth by truncating
    lineage every k merges (``operators/iterutil.lineage_truncator`` —
    localCheckpoint default, fault-tolerant dir optional), which is what
    makes a real ~30k-merge vocabulary tractable.
    """
    from .iterutil import lineage_truncator

    truncate = lineage_truncator(checkpoint_dir)
    out = words.withColumn(out_col, _initial_symbols(F.col(word_col)))
    for i, m in enumerate(merges):
        left, right = m[0], m[1]
        out = out.withColumn(
            out_col, merge_pair_expr(F.col(out_col), left, right)
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            out = truncate(out)
    return out


def encode_corpus(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = _WORD_RE,
    broadcast_words: bool = True,
    **encode_kwargs,
) -> DataFrame:
    """Corpus → per-document subword sequences via the encoded word table.

    One pass pre-tokenizes each document into (pos, word); only the
    DISTINCT words run the merge folds (:func:`encode_words`); the
    occurrences join back on the word key (broadcast by default — the
    encoded vocabulary is small; pass ``broadcast_words=False`` at an
    extreme vocabulary to let the planner shuffle-join) and re-assemble
    in document order with a single groupBy.  Returns one row per input
    document: (id_col, tokens, n_tokens) — documents with no words keep
    an empty token array rather than vanishing.
    """
    toks = docs.select(
        id_col,
        F.posexplode_outer(
            F.expr(f"regexp_extract_all(lower({text_col}), '{pattern}', 0)")
        ).alias("_pos", "_word"),
    )
    enc = encode_words(
        toks.filter(F.col("_word").isNotNull())
        .select(F.col("_word").alias("word"))
        .distinct(),
        merges,
        **encode_kwargs,
    )
    if broadcast_words:
        enc = F.broadcast(enc)
    joined = toks.join(enc, toks["_word"] == enc["word"], "left")
    seqs = joined.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("tokens").isNotNull(),
                            F.struct("_pos", "tokens"),
                        )
                    )
                ),
                lambda s: s["tokens"],
            )
        ).alias("tokens")
    )
    return seqs.select(
        id_col,
        F.coalesce(F.col("tokens"), F.expr("array()")).alias("tokens"),
        F.size(F.coalesce(F.col("tokens"), F.expr("array()")))
        .cast("long")
        .alias("n_tokens"),
    )


def vocab_coverage(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = _WORD_RE,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a word vocabulary — the
    standard tokenizer-coverage diagnostic (what fraction of a corpus a
    candidate vocab fails to cover decides vocab size / byte-fallback
    needs before a training run).

    ``vocab`` is a one-column frame of covered words (e.g. the top-V rows
    of ``word_frequencies``, or the units learned by ``train_bpe``).
    Returns (doc_id, n_tokens, n_oov, oov_rate) for docs with at least
    one token; oov_rate counts token OCCURRENCES, not types, so a doc
    repeating one rare word is scored as the loader would see it.

    Plan shape (100 TB): vocabularies are 10^4-10^6 rows — broadcast; the
    corpus is scanned once (explode + broadcast left join marks misses)
    and reduced by ONE uniform doc_id aggregate. No corpus shuffle beyond
    that rollup, no pair joins.
    """
    v = F.broadcast(
        vocab.select(F.col(vocab.columns[0]).alias("word"))
        .distinct()
        .withColumn("_in", F.lit(True))
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{pattern}', 0)")
        ).alias("word"),
    )
    return (
        toks.join(v, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_in"), 0).otherwise(1)).alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.round(F.col("n_oov") / F.col("n_tokens").cast("double"), 6),
        )
    )
