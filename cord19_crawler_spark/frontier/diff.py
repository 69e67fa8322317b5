"""Crawl-snapshot diffing — what changed between two crawls.

An incremental crawler needs the delta between crawl N-1 and crawl N as
a first-class artifact: ``added`` URLs feed discovery metrics, ``removed``
URLs feed dead-link cleanup, and ``changed`` URLs are the observation
stream the freshness model consumes (``frontier/recrawl.py``'s
``changed`` flag is exactly this operator's output joined back onto the
fetch log). The comparison key is (url, content digest) — the digest
column is whatever fingerprint the pipeline already carries
(functions/text.py:fingerprint, or the scheduler's content_dedup state).

Scale shape (two 10^10-row snapshots): ONE hash-partitioned full-outer
join on the canonical URL — the key is hash-uniform (the frontier's own
dedup key), so no salting is needed and AQE handles stragglers; with
both snapshots stored bucketed by url (the Iceberg store's bucket spec),
the exchange disappears entirely into a storage-partitioned join. The
per-host rollup is a linear conditional aggregate on the already-joined
frame — no second pass over the snapshots.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["crawl_diff", "crawl_diff_summary"]


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Classify every URL present in either snapshot.

    Returns (url, status, old_digest, new_digest) with status in
    {'added', 'removed', 'changed', 'unchanged'}: added = only in
    ``new``, removed = only in ``old``, changed = in both with different
    digests (NULL digests compare via null-safe equality, so two NULLs
    are 'unchanged' rather than leaking into 'changed').
    """
    o = old.select(
        F.col(url_col).alias("url"), F.col(digest_col).alias("old_digest")
    )
    n = new.select(
        F.col(url_col).alias("url"), F.col(digest_col).alias("new_digest")
    )
    # presence markers, not digest nullness, decide added/removed — a NULL
    # digest on a present row is data, not absence
    j = (
        o.withColumn("_in_old", F.lit(True))
        .join(n.withColumn("_in_new", F.lit(True)), "url", "full_outer")
    )
    return j.select(
        "url",
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            F.col("old_digest").eqNullSafe(F.col("new_digest")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
        .alias("status"),
        "old_digest",
        "new_digest",
    )


def crawl_diff_summary(
    diff: DataFrame,
    host_expr=None,
) -> DataFrame:
    """Per-host rollup of a ``crawl_diff`` frame: (host, added, removed,
    changed, unchanged, n_urls). ``host_expr`` defaults to parsing the
    authority out of the url. One linear conditional aggregate."""
    if host_expr is not None:
        host = host_expr
    else:
        from ..functions.urls import authority_expr

        host = authority_expr(F.col("url"))

    def _n(status: str):
        return F.sum(
            F.when(F.col("status") == status, 1).otherwise(0)
        ).alias(status)

    return (
        diff.select(host.alias("host"), "status")
        .groupBy("host")
        .agg(
            _n("added"),
            _n("removed"),
            _n("changed"),
            _n("unchanged"),
            F.count(F.lit(1)).alias("n_urls"),
        )
    )
