"""Freshness-driven re-crawl scheduling — change-rate estimation per URL.

The scheduler in this package decides which URL to fetch FIRST; a real
crawler also has to decide which already-fetched URL to fetch AGAIN.  The
standard model (Cho & Garcia-Molina, "Estimating Frequency of Change",
ACM TOIT 2003) treats each page as a Poisson process with change rate
lambda and estimates lambda from a fetch history where each re-fetch
records whether the content changed since the previous visit.  The
estimator used here is the paper's bias-corrected one for regular
accesses (§4.2, their \\hat{r} with the +0.5 continuity correction):

    lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / mean_interval

with n = number of re-fetch intervals, X = number of intervals that
observed a change.  It is defined even when every interval changed
(X = n) — the correction keeps the log argument positive — which the
naive -ln(1 - X/n) estimator is not.  A page's priority for re-crawl is
then its probability of being stale NOW:

    staleness = 1 - exp(-lambda_hat * (now - last_fetch))

which is exactly the expected-freshness objective the paper optimizes.

Scale shape (10^10 fetch records): ONE linear hash aggregate per URL —
min/max/count plus the changed-flag sum, with ``min_by`` pulling the
chronologically-first flag so no per-URL window or sort is needed — then
a scan-side projection for lambda/staleness.  ``now`` is a scalar.  The
fetch batch itself is a TakeOrderedAndProject top-k on (staleness DESC,
url ASC).  No reference counterpart (the reference crawls a static
corpus once); the model is from the published paper above.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["change_rate_estimates", "recrawl_batch"]


def change_rate_estimates(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    changed_col: str = "changed",
    default_lambda: float = 1e-6,
) -> DataFrame:
    """Per-URL Poisson change-rate estimates from a fetch history.

    ``history`` has one row per fetch: (url, fetch_ts, changed) where
    ``changed`` says the content differed from the PREVIOUS fetch of the
    same url; the flag on a url's chronologically first fetch carries no
    information and is ignored.  On a degenerate history where several
    fetches TIE on the minimum timestamp, the tie breaks toward
    changed=true (``min_by`` over struct(ts, NOT changed)): any of the
    tied rows might be the true first fetch, so discarding a true flag
    when one exists is the direction that never over-counts n_changes —
    and the result stays deterministic.  URLs with a single fetch have
    no interval evidence and get ``default_lambda`` (changes/second;
    callers pick a prior matching their corpus).

    Returns (url, n_fetches, n_changes, span_seconds, lambda_hat) with
    lambda_hat in changes/second.
    """
    # timestamp/ntz -> epoch seconds with fraction (session tz is UTC, so
    # NTZ wall times read as UTC instants — the DuckDB epoch() convention);
    # numeric inputs pass through the double cast unchanged
    ts_in = F.col(ts_col)
    if str(history.schema[ts_col].dataType).startswith("Timestamp"):
        ts_in = ts_in.cast("timestamp")
    h = history.select(
        F.col(url_col).alias("url"),
        ts_in.cast("double").alias("ts"),
        # NULL flags (the natural encoding for "no previous fetch to
        # compare against") read as no-change-observed; without the
        # coalesce a NULL first-fetch flag would poison n_changes and
        # lambda_hat to NULL, silently dropping the URL from every batch
        F.coalesce(F.col(changed_col).cast("boolean"), F.lit(False)).alias(
            "changed"
        ),
    )
    agg = h.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(F.col("changed").cast("long")).alias("_raw_changes"),
        F.min("ts").alias("_first_ts"),
        F.max("ts").alias("_last_ts"),
        # struct(ts, NOT changed): at equal min-ts, changed=true sorts
        # first (false < true), so the discarded first-fetch flag is the
        # true one when any tied row has it — never over-counts
        F.min_by(F.col("changed"), F.struct(F.col("ts"), ~F.col("changed")))
        .alias("_first_changed"),
    )
    n = F.col("n_fetches") - F.lit(1)
    x = F.col("n_changes")
    span = F.col("span_seconds")
    lam = F.when(
        (n > 0) & (span > 0),
        -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5))) / (span / n),
    ).otherwise(F.lit(float(default_lambda)))
    return (
        agg.select(
            "url",
            "n_fetches",
            (
                F.col("_raw_changes")
                - F.col("_first_changed").cast("long")
            ).alias("n_changes"),
            (F.col("_last_ts") - F.col("_first_ts")).alias("span_seconds"),
            F.col("_last_ts").alias("last_fetch_ts"),
        )
        .withColumn("lambda_hat", lam)
    )


def recrawl_batch(
    estimates: DataFrame,
    now: float,
    k: int,
) -> DataFrame:
    """Top-``k`` URLs most likely to be stale at time ``now`` (epoch
    seconds): staleness = 1 - exp(-lambda_hat * age), ordered by
    (staleness DESC, url ASC) — a total order, so the batch is
    reproducible and oracle-checkable.  Compiles to a single
    TakeOrderedAndProject over the estimate frame; ages clamp at 0 so a
    ``now`` inside the history never yields negative staleness.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    age = F.greatest(F.lit(float(now)) - F.col("last_fetch_ts"), F.lit(0.0))
    return (
        estimates.withColumn(
            "staleness", F.lit(1.0) - F.exp(-F.col("lambda_hat") * age)
        )
        .orderBy(F.desc("staleness"), F.asc("url"))
        .limit(k)
    )
