"""End-to-end training-data curation pipeline — one composed plan.

The curation family exists as individually-verified operators (Gopher
rules, C4 line cleaning, exact-dedup keep-list, adaptive per-group quality
cut, token budgeting, sequence packing); a real data pipeline runs them as
ONE decision per document.  ``curation_report`` composes them into a
single DataFrame plan and returns one row PER INPUT DOCUMENT carrying
every stage's verdict plus the final ``kept`` flag — decisions stay
auditable (why did doc X drop?) and the whole report is replayable in SQL
(the ``curation_pipeline`` oracle row checks every stage's flag and the
final keep set end-to-end).

Stage order (the standard web-pipeline order — cheap structural filters
before statistical ones, dedup before budgeting so budget is spent on
unique docs):

1. **Gopher quality rules** (Rae et al. 2021, Table A1) — structural
   keep/drop per doc (``operators/gopher.py``).
2. **C4 line cleaning** (Raffel et al. 2020 §2.2) — line rules + document
   drops (``operators/c4.py``).
3. **Exact dedup keep-list** — md5 fingerprint of whitespace-normalized
   text, keeper = min doc_id per fingerprint (``functions/text.py:
   fingerprint``; one LINEAR hash aggregate, never a pair join).
4. **Adaptive per-group quality cut** (FineWeb/CCNet practice) — each
   group keeps docs at/above its OWN p-quantile of ``quality_score``
   (``exact_quantiles`` positional order statistics + broadcast threshold
   join; a group with no quantile surfaces kept=False, never vanishes).
5. **Token budget** — survivors ranked by (quality DESC, doc_id ASC)
   fill a token budget front-to-back; the inclusive running token sum
   uses the two-phase ``global_running_sum`` (range exchange + local
   window + per-partition offsets — no single-reducer window).

Final: ``kept = gopher_keep AND c4_keep AND canonical AND quality_keep
AND in_budget``.

Plan shape at 100 TB: stages 1-4 each read the corpus scan once — the
scalar signals (quality, token count, fingerprint, the C4 projection, the
Gopher scalar rules) are scan-side Catalyst expressions with NO exchange
inside the stage (plan-asserted in tests/test_curation_pipeline.py); the
only wide operations are doc_id/fingerprint-keyed LINEAR aggregates
(Gopher repetition stats, the dedup keep-list), the narrow-row quantile
range exchange, and the narrow-row budget range exchange over survivors.
The stage joins exchange FLAG frames (doc_id + booleans), never document
text. No collect beyond global_running_sum's per-partition metadata.

No reference counterpart (/root/reference indexes a pre-curated corpus);
the composition mirrors published pipeline recipes (C4, Gopher/
MassiveText, CCNet, FineWeb).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, quality_score, token_count
from ..operators.c4 import c4_quality_filter
from ..operators.gopher import gopher_quality_signals
from ..operators.ranking import global_running_sum
from ..operators.traindata import exact_quantiles

__all__ = ["curation_report", "curated_shards"]


def curation_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    quality_p: float = 0.3,
    token_budget: int | None = None,
    gopher_kwargs: dict | None = None,
    c4_kwargs: dict | None = None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One curation decision row per input document.

    Returns (doc_id, <group_col>, *extra_cols, n_tokens, quality,
    gopher_keep, c4_keep, canonical, threshold, quality_keep, cum_tokens,
    in_budget, kept):

    * ``n_tokens`` — whitespace token count (the budget unit).
    * ``quality`` — ``quality_score`` in [0, 1], rounded to 6.
    * ``gopher_keep`` / ``c4_keep`` — the composed operators' keep flags
      (parametrized via ``gopher_kwargs`` / ``c4_kwargs``).
    * ``canonical`` — doc_id == min doc_id of its exact-content
      fingerprint group (the doc a dedup pass keeps).
    * ``threshold`` / ``quality_keep`` — the group's own p-quantile of
      quality and quality >= threshold (NULL-score/absent-group rows
      surface with quality_keep=False).
    * ``cum_tokens`` / ``in_budget`` — inclusive running token sum over
      SURVIVORS of stages 1-4 in (quality DESC, doc_id ASC) order, and
      cum_tokens <= token_budget.  With ``token_budget=None`` the budget
      stage is skipped: cum_tokens is NULL and in_budget == survivor.
    * ``kept`` — the conjunction of every stage.
    """
    if not (0.0 <= quality_p <= 1.0):
        raise ValueError(f"quality_p must be in [0, 1], got {quality_p}")
    if token_budget is not None and token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    # one fused scan-side projection: every per-row scalar this pipeline
    # needs (budget unit, quality, dedup fingerprint) off ONE corpus scan,
    # no exchange (plan-asserted)
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(group_col).alias("_grp"),
        *[F.col(c) for c in extra_cols],
        token_count(text_col).cast("long").alias("n_tokens"),
        quality_score(text_col).alias("quality"),
        fingerprint(text_col).alias("_fp"),
    )
    gq = gopher_quality_signals(
        docs, id_col=id_col, text_col=text_col, **(gopher_kwargs or {})
    ).select(F.col("doc_id"), F.col("keep").alias("gopher_keep"))
    cq = c4_quality_filter(
        docs, id_col=id_col, text_col=text_col, **(c4_kwargs or {})
    ).select(F.col("doc_id"), F.col("keep").alias("c4_keep"))
    # exact-dedup keep-list: ONE linear aggregate on the fingerprint.
    # NULL-text docs carry a NULL fingerprint; the keeper join below is
    # null-SAFE so they surface in the report (one row per input document)
    # as a single NULL-fp group rather than silently vanishing on a
    # null-unsafe key.
    keepers = base.groupBy("_fp").agg(F.min("doc_id").alias("_keeper"))
    keepers = keepers.select(F.col("_fp").alias("_kfp"), "_keeper")
    # adaptive per-group quality threshold (broadcast: |groups| rows)
    thresholds = exact_quantiles(
        base, "quality", [float(quality_p)], group_col="_grp"
    ).select(F.col("_grp").alias("_tg"), F.col("quantile").alias("threshold"))
    rep = (
        base.join(gq, "doc_id")
        .join(cq, "doc_id")
        .join(keepers, F.col("_fp").eqNullSafe(F.col("_kfp")))
        .join(
            F.broadcast(thresholds),
            F.col("_grp").eqNullSafe(F.col("_tg")),
            "left",
        )
        .select(
            "doc_id",
            F.col("_grp").alias(group_col),
            *[F.col(c) for c in extra_cols],
            "n_tokens",
            "quality",
            "gopher_keep",
            "c4_keep",
            (F.col("doc_id") == F.col("_keeper")).alias("canonical"),
            "threshold",
            F.coalesce(
                F.col("quality") >= F.col("threshold"), F.lit(False)
            ).alias("quality_keep"),
        )
    )
    survivor = (
        F.col("gopher_keep")
        & F.col("c4_keep")
        & F.col("canonical")
        & F.col("quality_keep")
    )
    if token_budget is None:
        return rep.select(
            "*",
            F.lit(None).cast("long").alias("cum_tokens"),
            survivor.alias("in_budget"),
            survivor.alias("kept"),
        )
    # budget over survivors only — NARROW rows (id, quality, n_tokens)
    # through the range exchange; everything else left-joins back by id.
    # rep is consumed TWICE below (the running-sum branch and the final
    # join-back), so pin it with a localCheckpoint — one narrow row per
    # document — instead of recomputing the whole gopher/C4/dedup subtree
    # for each consumer (measured: 2x the full stage tree, ~15s of the
    # 30s curation wall at sf1.0).  global_running_sum already eagerly
    # checkpoints its own input, so this materializes exactly once.
    rep = rep.localCheckpoint(eager=False)
    ranked = global_running_sum(
        rep.filter(survivor).select("doc_id", "quality", "n_tokens"),
        order_by=[F.desc("quality"), F.asc("doc_id")],
        value_col="n_tokens",
        name="cum_tokens",
    ).select(
        "doc_id",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        (F.col("cum_tokens") <= F.lit(int(token_budget))).alias("in_budget"),
    )
    return (
        rep.join(ranked, "doc_id", "left")
        .select(
            *rep.columns,
            "cum_tokens",
            F.coalesce(F.col("in_budget"), F.lit(False)).alias("in_budget"),
        )
        .withColumn("kept", survivor & F.col("in_budget"))
    )


def curated_shards(
    docs: DataFrame,
    report: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the curated corpus as deterministic training shards:
    semi-join the corpus against the report's kept set (narrow id frame —
    AQE broadcasts it when small) and assign (shard, pos) via
    ``shuffle_shards``'s seeded Knuth permutation.  The corpus body is
    read once and exchanged once (on the shard key — the write layout
    every sharded trainer needs anyway)."""
    from ..operators.traindata import shuffle_shards

    kept_ids = report.filter(F.col("kept")).select("doc_id")
    kept = docs.join(
        kept_ids.withColumnRenamed("doc_id", id_col).distinct(),
        id_col,
        "left_semi",
    )
    order = shuffle_shards(kept, n_shards=n_shards, seed=seed, id_col=id_col)
    return kept.join(
        order.withColumnRenamed("doc_id", id_col), id_col
    ).select(*kept.columns, "shard", "pos")
