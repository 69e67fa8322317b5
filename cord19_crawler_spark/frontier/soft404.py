"""Soft-404 detection from random-probe fetches.

A "soft 404" is an error page served with status 200 — the single worst
content polluter in a large crawl, because every dead link on the host
materializes as a new "page" that then flows into dedup, indexing and
training data.  The detection technique is Bar-Yossef, Broder, Kumar &
Tomkins, "Sic Transit Gloria Telae: Towards an Understanding of the
Web's Decay" (WWW 2004): fetch a URL on the host that CANNOT exist (a
long random path — the crawler's fetch layer plants these, here they
arrive as ``is_probe`` rows in the fetch log) and record the content
signature it returns.  A host that answers the random probe with 200
is a soft-404 host, and its probe signature is the error-page
fingerprint: any regular 200 page on that host with a matching
fingerprint is a soft 404.

Pinned semantics (oracle-replayable):

* signature set = DISTINCT (host, fingerprint) over probe rows with a
  2xx status and a NON-NULL fingerprint (a NULL fingerprint never
  matches anything — fetch-layer losses must not become signatures);
* host behavior: ``'soft404'`` if the host has ANY 2xx probe,
  else ``'hard404'`` if it has ANY 4xx probe (it correctly refuses
  random paths), else ``'unknown'`` (no probe evidence — precedence
  pinned in that order);
* output = every NON-probe row, annotated ``soft404`` = (status is 2xx
  AND the row's (host, fingerprint) is in the signature set).  Rows
  from ``'unknown'`` hosts are always ``soft404 = false`` — no
  evidence, no verdict.

Scale shape (10^10-row fetch log): probes are a few rows per host, so
the signature table and the per-host behavior table are HOST-sized,
not log-sized — both are built by one linear aggregate over the probe
slice and broadcast back onto the log.  The log itself is scanned
once and never shuffled (plan-asserted in pytest).

No counterpart in /root/reference (its crawler, src/crawler.py, fetches
a fixed curated corpus and never probes); the method is from the WWW
2004 paper above.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["soft404_detect"]

_IS_2XX = lambda c: (F.col(c) >= 200) & (F.col(c) <= 299)  # noqa: E731
_IS_4XX = lambda c: (F.col(c) >= 400) & (F.col(c) <= 499)  # noqa: E731


def soft404_detect(fetches: DataFrame) -> DataFrame:
    """Annotate non-probe fetch rows with a ``soft404`` verdict plus the
    host-level ``host_behavior`` evidence class.

    ``fetches`` columns: ``url`` string, ``host`` string, ``status``
    int, ``fingerprint`` string (content signature; NULL = unavailable),
    ``is_probe`` boolean (true = deliberately-random-path probe fetch).

    Returns one row per NON-probe input row: (url, host, status,
    fingerprint, host_behavior, soft404).
    """
    probes = fetches.filter(F.col("is_probe"))
    signatures = (
        probes.filter(_IS_2XX("status") & F.col("fingerprint").isNotNull())
        .select("host", "fingerprint")
        .distinct()
        .withColumn("_sig", F.lit(True))
    )
    behavior = probes.groupBy("host").agg(
        F.when(F.max(_IS_2XX("status").cast("int")) == 1, F.lit("soft404"))
        .when(F.max(_IS_4XX("status").cast("int")) == 1, F.lit("hard404"))
        .otherwise(F.lit("unknown"))
        .alias("host_behavior")
    )
    return (
        fetches.filter(~F.col("is_probe"))
        .join(F.broadcast(behavior), "host", "left")
        .join(F.broadcast(signatures), ["host", "fingerprint"], "left")
        .select(
            "url",
            "host",
            "status",
            "fingerprint",
            F.coalesce("host_behavior", F.lit("unknown")).alias(
                "host_behavior"
            ),
            (_IS_2XX("status") & F.coalesce("_sig", F.lit(False))).alias(
                "soft404"
            ),
        )
    )
