"""Crawler-trap detection from URL shape — per-host structural signals.

Spider traps (calendar pages, session-id query strings, symlink loops
like ``/a/a/a/``) generate unbounded URL spaces under one host; a
frontier that schedules by priority alone will happily drown in them.
The scheduler already has the blunt guard (``max_pending_per_host``);
this module provides the DETECTION side: per-host signals computed from
nothing but the URL strings already in the frontier, so hosts can be
capped/demoted BEFORE their pages are fetched (the classic signals from
Heydon & Najork's Mercator crawler writeup, "Mercator: A scalable,
extensible Web crawler", WWW 1999 — depth limits and repeating-segment
loop checks).

Signals per host (all pure Catalyst string/array expressions — no UDF,
no per-row Python):

* ``n_urls``, ``n_paths`` — volume and distinct-path breadth;
* ``avg_depth`` / ``max_depth`` — path-segment depth (deep trees are
  calendar/pagination traps);
* ``frac_query`` — fraction of URLs carrying a query string (session-id
  and faceted-search traps live in query params);
* ``n_loop_urls`` — URLs whose path repeats some segment at least three
  times (>= 2 duplicate occurrences after dedup — the ``/a/a/a/``
  heuristic);
* ``is_suspect`` — the documented rule: at volume >= ``min_urls``, flag
  hosts with avg_depth > ``max_avg_depth`` OR loop fraction > 10% OR
  query fraction > 80%.

Scale shape (10^10 frontier rows): one scan-side projection computing
the per-URL shape struct, then ONE linear hash aggregate on host (the
same key the frontier is already partitioned by, so with the scheduler's
salted host partitioning this rolls up map-side). Thresholds are plain
columns — retune without re-scanning.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["url_shape_signals"]


def url_shape_signals(
    urls: DataFrame,
    url_col: str = "url",
    min_urls: int = 5,
    max_avg_depth: float = 6.0,
    loop_frac: float = 0.1,
    query_frac: float = 0.8,
) -> DataFrame:
    """Per-host trap signals from URL strings (see module docstring).

    Returns (host, n_urls, n_paths, avg_depth, max_depth, frac_query,
    n_loop_urls, is_suspect); rows without a parseable host are dropped.
    avg_depth and frac_query are rounded to 6 places so the frame is
    oracle-comparable across engines.
    """
    from ..functions.urls import authority_expr, path_expr

    u = F.col(url_col)
    host = authority_expr(u)
    path = path_expr(u)
    has_query = u.contains("?")
    segs = F.filter(F.split(path, "/"), lambda x: x != F.lit(""))
    depth = F.size(segs)
    # >= 2 duplicate occurrences after dedup <=> some segment appears >= 3
    # times, or two segments appear twice — either way a loop-shaped path
    is_loop = (F.size(segs) - F.size(F.array_distinct(segs))) >= F.lit(2)
    shaped = urls.select(
        host.alias("host"),
        path.alias("path"),
        depth.cast("long").alias("depth"),
        has_query.cast("int").alias("q"),
        is_loop.cast("int").alias("loop"),
    ).filter(F.col("host") != "")
    # two-level aggregation instead of groupBy(host) + countDistinct(path):
    # a single countDistinct plans an Expand (2x every URL row through the
    # exchange); rolling up to (host, path) first dedups map-side — depth
    # and loop are functions of the path, so they ride the per-path row —
    # and the host-level pass then counts rows for n_paths.  All host
    # signals are exact-integer reconstructions (sum(depth*n)/sum(n) ==
    # avg over URLs), so results are bit-identical.
    per_path = shaped.groupBy("host", "path").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("q").alias("_q"),
        F.first("depth").alias("_depth"),
        F.first("loop").alias("_loop"),
    )
    n_urls = F.sum("_n")
    agg = per_path.groupBy("host").agg(
        n_urls.alias("n_urls"),
        F.count(F.lit(1)).alias("n_paths"),
        F.round(
            F.sum(F.col("_depth") * F.col("_n")).cast("double") / n_urls, 6
        ).alias("avg_depth"),
        F.max("_depth").alias("max_depth"),
        F.round(F.sum("_q").cast("double") / n_urls, 6).alias("frac_query"),
        F.sum(F.col("_loop") * F.col("_n")).alias("n_loop_urls"),
    )
    return agg.withColumn(
        "is_suspect",
        (F.col("n_urls") >= F.lit(min_urls))
        & (
            (F.col("avg_depth") > F.lit(float(max_avg_depth)))
            | (
                F.col("n_loop_urls")
                > F.col("n_urls").cast("double") * F.lit(float(loop_frac))
            )
            | (F.col("frac_query") > F.lit(float(query_frac)))
        ),
    )
