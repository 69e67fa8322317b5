"""Adaptive per-host crawl-delay estimation from throttle responses.

The politeness operators (``frontier/politeness.py``) ENFORCE a
per-host minimum delay; this module chooses WHAT that delay should be,
from the server's own feedback in the fetch log: HTTP 429 Too Many
Requests (RFC 6585 §4) and 503 Service Unavailable with its optional
``Retry-After`` header (RFC 9110 §10.2.3, §15.5.30 — an explicit
server-stated delay that a polite crawler MUST honor).  The shape is
the multiplicative-increase half of AIMD: the recommended delay doubles
for every 5 % of a host's fetches that came back throttled, and is
never below the largest Retry-After the server stated.

Pinned semantics (oracle-replayable, all exact integer arithmetic up to
the final float multiply):

* throttled = status in (429, 503);
* ``steps`` = floor(20 * n_throttled / n_fetches) via INTEGER division
  (one backoff step per started 5 % of throttle rate), capped at
  ``max_steps``;
* ``recommended_delay`` = min(``max_delay``, max(``base_delay`` *
  ``backoff`` ** steps, max stated Retry-After, ``base_delay``)) — a
  host with zero throttles and no Retry-After recommends exactly
  ``base_delay``;
* NULL Retry-After values are ignored; Retry-After on NON-throttle rows
  is ignored too (redirect/3xx Retry-After is a different contract).

Scale shape (10^10-row fetch log): ONE linear aggregate keyed on host
(map-side partials; no window, no join, no self-join — plan-asserted in
pytest).  Output is host-sized.

No counterpart in /root/reference (src/crawler.py fetches a curated
corpus with a fixed sleep); the 429/Retry-After contracts are the RFCs
above.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["host_throttle"]


def host_throttle(
    fetches: DataFrame,
    base_delay: float = 1.0,
    max_delay: float = 600.0,
    backoff: float = 2.0,
    max_steps: int = 10,
) -> DataFrame:
    """Per-host recommended crawl delay from throttle feedback.

    ``fetches`` columns: ``host`` string, ``status`` int,
    ``retry_after`` double seconds (NULL = header absent).

    Returns (host, n_fetches, n_throttled, throttle_rate,
    max_retry_after, recommended_delay), one row per host.
    """
    if base_delay <= 0 or max_delay < base_delay:
        raise ValueError("need 0 < base_delay <= max_delay")
    if backoff < 1.0 or max_steps < 0:
        raise ValueError("need backoff >= 1 and max_steps >= 0")
    throttled = F.col("status").isin(429, 503)
    agg = fetches.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(throttled.cast("long")).alias("n_throttled"),
        F.max(F.when(throttled, F.col("retry_after"))).alias(
            "max_retry_after"
        ),
    )
    steps = F.least(
        F.expr("(20 * n_throttled) div n_fetches"), F.lit(max_steps)
    )
    backed_off = F.lit(float(base_delay)) * F.pow(
        F.lit(float(backoff)), steps.cast("double")
    )
    return agg.select(
        "host",
        "n_fetches",
        "n_throttled",
        (F.col("n_throttled") / F.col("n_fetches")).alias("throttle_rate"),
        "max_retry_after",
        F.least(
            F.lit(float(max_delay)),
            F.greatest(
                backed_off,
                F.coalesce("max_retry_after", F.lit(0.0)),
                F.lit(float(base_delay)),
            ),
        ).alias("recommended_delay"),
    )
