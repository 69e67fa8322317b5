"""Fetch retry state + exponential backoff from the attempt log.

A crawler's fetch layer emits an append-only attempt log
``(url, ts, status)``.  This module reduces it to per-URL retry state —
the thing the scheduler consults before re-enqueueing a URL:

* ``ok``    — last attempt succeeded (2xx/3xx, incl. 304 revalidation);
              freshness-driven re-crawl (``frontier/recrawl.py``) owns
              the next visit, not the retry policy;
* ``gone``  — last attempt was a permanent client error (4xx except
              408/429): never retried (RFC 9110 §15.5 semantics — the
              resource, not the fetch, is at fault);
* ``retry`` — last attempt was transient (5xx, 429, 408, network
              error 0, anything unclassifiable): eligible again at
              ``last_ts + min(max_delay, base_delay · 2^(streak-1))``
              (the standard truncated binary exponential backoff);
* ``dead``  — the trailing transient streak exceeded ``max_retries``:
              parked until an operator (or a recrawl sweep) resets it.

The whole reduction is ONE linear hash aggregate per URL — no window,
no self-join: the trailing-failure streak is "transient attempts newer
than the last non-transient attempt", computed from
``max(ts) FILTER (solid)`` + an array-filter over the (per-URL small —
bounded by the crawler's own retry cap) collected transient
timestamps.  At 10^10-URL scale this is a single shuffle on the url
key with map-side partials, the same shape as every frontier
aggregate.

Timestamp ties within a URL are broken by (ts, status) for the
last-attempt pick, so the reduction is deterministic under any
partitioning.  No counterpart in /root/reference (static corpus, no
fetch loop); the policy is the standard crawler/HTTP-client backoff.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["classify_status_expr", "retry_schedule"]


def classify_status_expr(status: Column) -> Column:
    """HTTP status → 'success' | 'permanent' | 'transient'.

    2xx/3xx succeed; 4xx are permanent except 408 (request timeout) and
    429 (rate limited), which — like 5xx, network-error 0 and anything
    else — are transient and retried with backoff."""
    return (
        F.when(status.between(200, 399), F.lit("success"))
        .when(
            status.between(400, 499) & ~status.isin(408, 429),
            F.lit("permanent"),
        )
        .otherwise(F.lit("transient"))
    )


def retry_schedule(
    attempts: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    status_col: str = "status",
    base_delay: float = 60.0,
    max_delay: float = 86400.0,
    max_retries: int = 5,
) -> DataFrame:
    """Attempt log → per-URL retry state (see module docstring).

    Returns (url, n_attempts, last_ts, last_status, fail_streak, state,
    retry_delay, next_attempt_ts); ``retry_delay``/``next_attempt_ts``
    are NULL unless ``state = 'retry'``; ``fail_streak`` is the trailing
    transient-attempt count (0 whenever the last attempt was solid).
    """
    ts, status = F.col(ts_col), F.col(status_col)
    is_tr = classify_status_expr(status) == "transient"
    agg = attempts.groupBy(F.col(url_col).alias("url")).agg(
        F.count(F.lit(1)).alias("n_attempts"),
        F.max(ts).alias("last_ts"),
        F.max_by(status, F.struct(ts, status)).alias("last_status"),
        F.max(F.when(~is_tr, ts)).alias("_solid_ts"),
        F.collect_list(F.when(is_tr, ts)).alias("_tts"),
    )
    solid = F.col("_solid_ts")
    streak = F.size(
        F.filter("_tts", lambda t: solid.isNull() | (t > solid))
    ).cast("long")
    out = agg.withColumn("fail_streak", streak)
    last_class = classify_status_expr(F.col("last_status"))
    state = (
        F.when(last_class == "success", F.lit("ok"))
        .when(last_class == "permanent", F.lit("gone"))
        .when(F.col("fail_streak") > max_retries, F.lit("dead"))
        .otherwise(F.lit("retry"))
    )
    out = out.withColumn("state", state)
    delay = F.when(
        F.col("state") == "retry",
        F.least(
            F.lit(float(max_delay)),
            F.lit(float(base_delay))
            * F.pow(F.lit(2.0), F.col("fail_streak") - 1),
        ),
    )
    return out.select(
        "url",
        "n_attempts",
        "last_ts",
        "last_status",
        "fail_streak",
        "state",
        delay.alias("retry_delay"),
        (F.col("last_ts") + delay).alias("next_attempt_ts"),
    )
