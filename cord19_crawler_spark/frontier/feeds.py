"""RSS 2.0 / Atom feed parsing — pure Catalyst.

The third discovery source next to HTML outlinks (``functions/html.py``)
and sitemaps (``frontier/sitemaps.py``): news/blog hosts publish change
feeds, and a freshness-aware crawler polls them to seed the frontier
with newly published URLs long before a sitemap regenerates or a link
appears on a hub page.  Input is (feed_url, body) pairs from the fetch
layer; output is one frontier-seed row per entry.

Two formats per the public specs:

* **RSS 2.0** (``<rss>`` root): ``<channel>`` wraps ``<item>`` blocks
  carrying ``<link>`` (inner text), ``<title>``, ``<guid>`` and
  ``<pubDate>`` (RFC 822 date string, passed through raw);
* **Atom** (RFC 4287, ``<feed>`` root): ``<entry>`` blocks carrying
  ``<link href=.../>`` ATTRIBUTES — the alternate link is preferred
  (``rel="alternate"``, both attribute orders), falling back to the
  first ``href``-bearing link of any rel per RFC 4287 §4.2.7.2's
  "no rel implies alternate"; ``<id>``, ``<title>``, and
  ``<updated>`` preferred over ``<published>`` for the timestamp.

Feed files are small and machine-generated, so extraction is the same
scan-side shape as the sitemap parser: ``regexp_extract_all`` over
entry blocks + per-block field extracts, all JVM-side — no UDF; the
only generator is the per-entry ``posexplode``, so the plan is
embarrassingly parallel and partition-preserving at fetch-log scale.
Entry positions are document order COUNTING link-less entries (which
are then dropped — a feed entry without a URL seeds nothing), so
downstream dedup/priority stays deterministic.  Text fields
entity-decode with the shared ``xml_unescape_expr``; CDATA is not
interpreted (entries carrying it surface with raw markers, same policy
as sitemaps).

No counterpart in /root/reference (static tar corpus); the formats are
the public RSS 2.0 spec and RFC 4287.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sitemaps import xml_unescape_expr

__all__ = ["parse_feeds"]

_ITEM_BLOCK = r"(?s)<item\b[^>]*>(.*?)</item>"
_ENTRY_BLOCK = r"(?s)<entry\b[^>]*>(.*?)</entry>"
_RSS_LINK = r"(?s)<link>(.*?)</link>"
_TITLE = r"(?s)<title\b[^>]*>(.*?)</title>"
_RSS_GUID = r"(?s)<guid\b[^>]*>(.*?)</guid>"
_RSS_PUBDATE = r"(?s)<pubDate>(.*?)</pubDate>"
_ATOM_ID = r"(?s)<id>(.*?)</id>"
_ATOM_UPDATED = r"(?s)<updated>(.*?)</updated>"
_ATOM_PUBLISHED = r"(?s)<published>(.*?)</published>"
# rel="alternate" in both attribute orders, then any href-bearing link
# (RFC 4287: a link without rel IS the alternate).  [^>]*? cannot cross
# a tag boundary, so a rel="self" link never bleeds into the next tag.
_ATOM_ALT_REL_FIRST = (
    r"""(?is)<link\b[^>]*?\brel\s*=\s*["']alternate["'][^>]*?"""
    r"""\bhref\s*=\s*["']([^"']*)["']"""
)
_ATOM_ALT_HREF_FIRST = (
    r"""(?is)<link\b[^>]*?\bhref\s*=\s*["']([^"']*)["']"""
    r"""[^>]*?\brel\s*=\s*["']alternate["']"""
)
_ATOM_ANY_HREF = r"""(?is)<link\b[^>]*?\bhref\s*=\s*["']([^"']*)["']"""


def _field(block: Column, pattern: str) -> Column:
    """Trimmed inner text of the first match, NULL when absent/empty."""
    return F.nullif(F.trim(F.regexp_extract(block, pattern, 1)), F.lit(""))


def _first_field(block: Column, *patterns: str) -> Column:
    out = F.lit(None).cast("string")
    for p in patterns:
        out = F.coalesce(out, _field(block, p))
    return out


def parse_feeds(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(feed_url, xml body) → one frontier-seed row per feed entry.

    Output columns:

    * ``feed_url`` — the source feed (pass-through of ``url_col``);
    * ``kind`` — 'rss' (``<rss`` root) or 'atom' (``<feed`` root);
      bodies with neither root emit no rows (nothing to seed);
    * ``entry_pos`` — 0-based document-order position of the entry
      within its feed, counting link-less entries;
    * ``link`` — entity-decoded entry URL (RSS ``<link>`` inner text;
      Atom alternate-preferred ``href``); entries with no link DROP;
    * ``title`` — entity-decoded entry title or NULL;
    * ``entry_id`` — RSS ``<guid>`` / Atom ``<id>`` (the dedup key a
      polling scheduler uses across fetches) or NULL;
    * ``published`` — raw timestamp string (RSS ``<pubDate>``; Atom
      ``<updated>`` preferred over ``<published>``) or NULL; callers
      apply their own date parsing policy (RFC 822 vs RFC 3339).
    """
    body = F.col(body_col)
    kind = (
        F.when(F.contains(body, F.lit("<rss")), F.lit("rss"))
        .when(F.contains(body, F.lit("<feed")), F.lit("atom"))
        .otherwise(F.lit("unknown"))
    )
    blocks = (
        F.when(
            kind == "rss",
            F.regexp_extract_all(body, F.lit(_ITEM_BLOCK), F.lit(1)),
        )
        .when(
            kind == "atom",
            F.regexp_extract_all(body, F.lit(_ENTRY_BLOCK), F.lit(1)),
        )
        .otherwise(F.expr("CAST(array() AS array<string>)"))
    )
    rows = df.select(
        F.col(url_col).alias("feed_url"),
        kind.alias("kind"),
        F.posexplode(blocks).alias("entry_pos", "_block"),
    )
    b = F.col("_block")
    is_rss = F.col("kind") == "rss"
    link = xml_unescape_expr(
        F.when(is_rss, _field(b, _RSS_LINK)).otherwise(
            _first_field(
                b, _ATOM_ALT_REL_FIRST, _ATOM_ALT_HREF_FIRST, _ATOM_ANY_HREF
            )
        )
    )
    out = rows.select(
        "feed_url",
        "kind",
        "entry_pos",
        link.alias("link"),
        xml_unescape_expr(_field(b, _TITLE)).alias("title"),
        xml_unescape_expr(
            F.when(is_rss, _field(b, _RSS_GUID)).otherwise(
                _field(b, _ATOM_ID)
            )
        ).alias("entry_id"),
        F.when(is_rss, _field(b, _RSS_PUBDATE))
        .otherwise(_first_field(b, _ATOM_UPDATED, _ATOM_PUBLISHED))
        .alias("published"),
    )
    return out.filter(F.col("link").isNotNull())
