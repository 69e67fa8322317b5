"""Sitemap XML parsing (sitemaps.org protocol) — pure Catalyst.

The consumption side of the crawl bootstrap loop: robots.txt declares
sitemap URLs (``frontier/robots.py:sitemap_urls_expr``), the fetcher
pulls the XML bodies, and THIS module turns those bodies into frontier
seed rows.  Two document kinds per the protocol:

* ``<urlset>`` files list page entries ``<url><loc/><lastmod/>
  <changefreq/><priority/></url>`` — ``loc`` required, the rest
  optional with ``priority`` defaulting to 0.5;
* ``<sitemapindex>`` files list child sitemaps ``<sitemap><loc/>
  <lastmod/></sitemap>`` — the scheduler re-enqueues those locs as
  further sitemap fetches.

Sitemap files are machine-generated (protocol caps: 50k entries /
50 MB uncompressed), so tag extraction is a scan-side regular
projection: ``regexp_extract_all`` over entry blocks + per-block field
extracts, all JVM-side — no UDF, no shuffle; the only exchange a
caller adds is whatever it does with the seeds.  Every pattern is
shared verbatim between Java regex and RE2 (``(?s)`` + non-greedy), so
the DuckDB oracle replays extraction exactly.  ``loc`` values are
XML-entity-decoded (the five predefined entities, ``&amp;`` LAST so
double-escaped input stays single-decoded — the standard unescape
order).  CDATA sections are not interpreted (vanishingly rare in
sitemaps; entries carrying them surface with the raw markers).

At 100-TB crawl scale the input here is (sitemap_url, body) pairs from
the fetch layer — typically millions of rows of ≤50 MB documents; the
plan is embarrassingly parallel and partition-count-preserving.

No counterpart in /root/reference (its corpus is a static tar); the
format is the public sitemaps.org / RFC 9309 §2.3 ecosystem.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["CHANGEFREQS", "parse_sitemaps", "xml_unescape_expr"]

# sitemaps.org: the closed vocabulary for <changefreq>; anything else
# (or an empty/absent tag) normalizes to NULL.
CHANGEFREQS = (
    "always", "hourly", "daily", "weekly", "monthly", "yearly", "never",
)

_INDEX_BLOCK = r"(?s)<sitemap>(.*?)</sitemap>"
_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_LOC = r"(?s)<loc>(.*?)</loc>"
_LASTMOD = r"(?s)<lastmod>(.*?)</lastmod>"
_CHANGEFREQ = r"(?s)<changefreq>(.*?)</changefreq>"
_PRIORITY = r"(?s)<priority>(.*?)</priority>"


def xml_unescape_expr(col: Column) -> Column:
    """Decode the five predefined XML entities.  Sequential replaces
    with ``&amp;`` LAST: '&amp;lt;' contains no '&lt;' substring, so the
    early entity passes can't touch it and the final pass yields the
    literal '&lt;' — the standard correct unescape order."""
    out = col
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def _field(block: Column, pattern: str) -> Column:
    """Trimmed inner text of the first match; '' when the tag is absent
    (regexp_extract's no-match value)."""
    return F.trim(F.regexp_extract(block, pattern, 1))


def parse_sitemaps(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(sitemap_url, xml body) → one row per entry.

    Output columns:

    * ``sitemap_url`` — the source file (pass-through of ``url_col``);
    * ``kind`` — 'index' (``<sitemapindex>`` root), 'urlset', or
      'unknown' (neither root tag — emits no entries but keeps no rows
      either; callers see such files vanish, by design: there is
      nothing to seed);
    * ``entry_pos`` — 0-based position of the entry within its file
      (document order, so downstream dedup/priority is deterministic);
    * ``loc`` — entity-decoded entry URL; entries with an empty/absent
      ``<loc>`` are dropped (the protocol makes it required);
    * ``lastmod`` — raw W3C-datetime string or NULL (callers parse with
      their own timestamp policy; recrawl feeds it to staleness);
    * ``changefreq`` — lowercased member of :data:`CHANGEFREQS` or NULL;
      always NULL for index entries (not part of ``<sitemap>``);
    * ``priority`` — double in [0,1]; absent OR invalid → the
      protocol's 0.5 default; NULL for index entries.
    """
    body = F.col(body_col)
    kind = (
        F.when(F.contains(body, F.lit("<sitemapindex")), F.lit("index"))
        .when(F.contains(body, F.lit("<urlset")), F.lit("urlset"))
        .otherwise(F.lit("unknown"))
    )
    blocks = (
        F.when(kind == "index", F.regexp_extract_all(body, F.lit(_INDEX_BLOCK), F.lit(1)))
        .when(kind == "urlset", F.regexp_extract_all(body, F.lit(_URL_BLOCK), F.lit(1)))
        .otherwise(F.expr("CAST(array() AS array<string>)"))
    )
    rows = df.select(
        F.col(url_col).alias("sitemap_url"),
        kind.alias("kind"),
        F.posexplode(blocks).alias("entry_pos", "_block"),
    )
    b = F.col("_block")
    loc = xml_unescape_expr(_field(b, _LOC))
    freq_raw = F.lower(_field(b, _CHANGEFREQ))
    freq = F.when(freq_raw.isin(*CHANGEFREQS), freq_raw)
    prio_raw = _field(b, _PRIORITY).try_cast("double")
    prio = F.when(
        prio_raw.isNotNull() & (prio_raw >= 0.0) & (prio_raw <= 1.0), prio_raw
    ).otherwise(F.lit(0.5))
    return (
        rows.select(
            "sitemap_url",
            "kind",
            "entry_pos",
            loc.alias("loc"),
            F.nullif(_field(b, _LASTMOD), F.lit("")).alias("lastmod"),
            F.when(F.col("kind") == "urlset", freq).alias("changefreq"),
            F.when(F.col("kind") == "urlset", prio)
            .cast("double")
            .alias("priority"),
        )
        .filter(F.col("loc") != "")
    )
