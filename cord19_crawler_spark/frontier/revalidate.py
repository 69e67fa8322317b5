"""Conditional-GET revalidation planning from the fetch history.

HTTP caching (RFC 9110 §13) lets a crawler revalidate instead of
re-download: send ``If-None-Match`` with the last seen ``ETag`` and/or
``If-Modified-Since`` with the last seen ``Last-Modified``; a 304
answer costs headers, not the body.  At crawl scale the saved bytes
dominate recrawl cost, so the scheduler wants, per URL:

* the freshest validators — the ETag / Last-Modified from the MOST
  RECENT response that carried each (servers may send either, both, or
  neither, and may stop sending one mid-history; the two are tracked
  independently per the RFC);
* how well conditionals have worked so far — the 304 share of
  revalidation-eligible terminal responses (200 vs 304), the signal
  for preferring conditional fetches on that URL/host.

The reduction is ONE linear url-key hash aggregate (``max_by`` over a
ts that is NULL when the header is absent — nulls are ignored by the
arg-max, which is exactly "most recent response that carried one").
No window, no self-join; the same single-shuffle shape as every
frontier reduce, so it holds at a 10^10-row fetch log.

No counterpart in /root/reference (static corpus, no fetch loop); the
semantics are RFC 9110's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["revalidation_plan"]


def revalidation_plan(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    status_col: str = "status",
    etag_col: str = "etag",
    last_modified_col: str = "last_modified",
) -> DataFrame:
    """Fetch history → per-URL conditional-request plan.

    Returns (url, if_none_match, if_modified_since, revalidable,
    n_full, n_not_modified, not_modified_rate):

    * ``if_none_match`` / ``if_modified_since`` — freshest validator of
      each kind, independently (NULL when the server never sent one);
    * ``revalidable`` — at least one validator is known;
    * ``n_full`` — 200 responses (full body paid);
    * ``n_not_modified`` — 304 responses (body saved);
    * ``not_modified_rate`` — 304 / (200 + 304), NULL when neither has
      been observed yet.
    """
    ts = F.col(ts_col)
    etag, lm = F.col(etag_col), F.col(last_modified_col)
    status = F.col(status_col)
    out = history.groupBy(F.col(url_col).alias("url")).agg(
        F.max_by(etag, F.when(etag.isNotNull(), ts)).alias("if_none_match"),
        F.max_by(lm, F.when(lm.isNotNull(), ts)).alias("if_modified_since"),
        F.count(F.when(status == 200, 1)).alias("n_full"),
        F.count(F.when(status == 304, 1)).alias("n_not_modified"),
    )
    denom = F.col("n_full") + F.col("n_not_modified")
    return out.select(
        "url",
        "if_none_match",
        "if_modified_since",
        (F.col("if_none_match").isNotNull()
         | F.col("if_modified_since").isNotNull()).alias("revalidable"),
        "n_full",
        "n_not_modified",
        F.when(denom > 0, F.col("n_not_modified") / denom)
        .alias("not_modified_rate"),
    )
