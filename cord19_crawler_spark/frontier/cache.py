"""HTTP cache freshness planning (RFC 9111) from the fetch history.

``revalidation_plan`` (frontier/revalidate.py) answers *how* to refetch
cheaply (conditional validators); this module answers *when* a refetch
is due at all.  RFC 9111 gives the server three ways to declare how
long a response stays fresh — ``Cache-Control: max-age`` /
``s-maxage``, an ``Expires`` date relative to ``Date``, and (absent
all of those) a heuristic fraction of the ``Last-Modified`` age — plus
storage vetoes (``no-store``, ``private`` for a shared cache) and the
always-revalidate marker (``no-cache``).  A crawler that honors these
avoids refetching pages the origin has promised are stable and
re-checks pages the origin marked volatile, which at 10^10-URL scale
is the difference between recrawl bandwidth that tracks *change rate*
and recrawl bandwidth that tracks *corpus size*.

Semantics (shared-cache rules, RFC 9111 §4.2, §5.2.2):

* freshness_lifetime = ``s-maxage`` if present (shared-cache override,
  §5.2.2.10), else ``max-age`` (§5.2.2.1), else ``Expires − Date``
  clamped at 0 when both dates are known (§4.2.1), else
  ``heuristic_fraction × (Date − Last-Modified)`` clamped at 0 when
  both are known (§4.2.2, flagged ``heuristic``), else NULL (no
  freshness information — the caller falls back to its own recrawl
  policy, e.g. frontier/recrawl.py).
* ``no-store`` or ``private`` ⇒ not cacheable at all (§5.2.2.5,
  §5.2.2.7 — this planner models a shared cache).
* ``no-cache`` ⇒ storable but every use must revalidate (§5.2.2.4):
  the response is never ``fresh_now`` regardless of lifetime.
* current age at response time (§4.2.3, zero-delay simplification
  documented below): ``apparent_age = max(0, ts − Date)`` plus the
  ``Age`` header when present.  We fold the RFC's
  ``response_delay`` term into the receive timestamp (a crawler logs
  one timestamp per response), which only ever *under*-estimates age,
  i.e. errs toward refetching — the safe direction.
* ``due_ts = ts + freshness_lifetime − age_at_response`` — the wall
  clock instant the stored response turns stale;
  ``fresh_now = cacheable ∧ ¬no-cache ∧ now < due_ts``.

Directive parsing is pure Catalyst regex over the raw Cache-Control
string (case-insensitive, delimiter-anchored so ``maxage=5`` or
``s-maxage`` can never satisfy ``max-age``); date headers are expected
pre-parsed to epoch seconds (ingest-time concern — HTTP-date has three
RFC 9110 §5.6.7 formats and belongs next to the socket, not in every
downstream plan).

Scale shape: ONE linear url-key hash aggregate (``max_by`` picks the
most recent response per URL — same single-shuffle reduce as every
frontier operator), then map-side expression work; ``now`` defaults to
the global max timestamp via a 1-row aggregate broadcast.  No window,
no self-join, no UDF — holds at a 10^10-row fetch log.

No counterpart in /root/reference (static corpus, no fetch loop); the
semantics are RFC 9111's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_cache_control", "http_cache_plan"]

# Delimiter-anchored directive patterns: a directive name matches only at
# the value start or after a comma/space, so `maxage=5`, `xno-store`, or
# the `s-maxage` prefix can never satisfy `max-age` / `no-store`.
_BOUND = r"(?:^|[,\s])"
_END = r"(?:$|[,\s])"


def _directive_flag(cc, name: str):
    return cc.rlike(_BOUND + name + _END)


def _directive_seconds(cc, name: str):
    # regexp_extract yields '' on no match (Spark) — NULLIF normalizes;
    # the value grammar is digits only (delta-seconds, RFC 9111 §1.2.2).
    return F.nullif(
        F.regexp_extract(cc, _BOUND + name + r"=([0-9]+)" + _END, 1), F.lit("")
    ).cast("double")


def parse_cache_control(cc_col) -> dict[str, "F.Column"]:
    """Raw Cache-Control header value → directive columns.

    Returns {'no_store','private','no_cache','max_age','s_maxage'};
    a NULL header parses as no directives (flags false, seconds NULL).
    """
    cc = F.lower(F.coalesce(cc_col, F.lit("")))
    return {
        "no_store": _directive_flag(cc, "no-store"),
        "private": _directive_flag(cc, "private"),
        "no_cache": _directive_flag(cc, "no-cache"),
        "max_age": _directive_seconds(cc, "max-age"),
        "s_maxage": _directive_seconds(cc, "s-maxage"),
    }


def _clamp0(x):
    return F.when(x < 0, F.lit(0.0)).otherwise(x)


def http_cache_plan(
    history: DataFrame,
    now: float | None = None,
    heuristic_fraction: float = 0.1,
    url_col: str = "url",
    ts_col: str = "ts",
    cache_control_col: str = "cache_control",
    date_ts_col: str = "date_ts",
    expires_ts_col: str = "expires_ts",
    age_col: str = "age",
    last_modified_ts_col: str = "last_modified_ts",
) -> DataFrame:
    """Fetch history → per-URL cache-freshness plan (RFC 9111).

    Input: one row per response with the receive timestamp and the
    caching headers (dates pre-parsed to epoch seconds; NULL = header
    absent).  Ties on ``ts`` within a URL are broken arbitrarily by the
    arg-max — feed a unique per-response timestamp.

    Returns (url, last_ts, cacheable, no_cache, lifetime_s, heuristic,
    age_at_response, due_ts, fresh_now):

    * ``cacheable`` — no ``no-store``/``private`` veto on the latest
      response (shared-cache rules);
    * ``lifetime_s`` — freshness lifetime by the §4.2.1 precedence
      (s-maxage > max-age > Expires−Date > heuristic), NULL when the
      response carries no freshness information;
    * ``heuristic`` — lifetime came from the Last-Modified heuristic;
    * ``age_at_response`` — §4.2.3 corrected age when received;
    * ``due_ts`` — wall-clock staleness instant (NULL when not
      cacheable or no lifetime is known);
    * ``fresh_now`` — still fresh at ``now`` (default: the global max
      ``ts``) and not marked always-revalidate.
    """
    ts = F.col(ts_col)
    # ONE struct-valued arg-max: the latest response's headers are picked as
    # a row, never mixed across responses (a per-column max_by could skip a
    # NULL header back to an older response in some engines).
    latest = history.groupBy(F.col(url_col).alias("url")).agg(
        F.max(ts).alias("last_ts"),
        F.max_by(
            F.struct(
                F.col(cache_control_col).alias("cc"),
                F.col(date_ts_col).alias("date"),
                F.col(expires_ts_col).alias("expires"),
                F.col(age_col).alias("age"),
                F.col(last_modified_ts_col).alias("lm"),
            ),
            ts,
        ).alias("_h"),
    ).select(
        "url",
        "last_ts",
        F.col("_h.cc").alias("_cc"),
        F.col("_h.date").alias("_date"),
        F.col("_h.expires").alias("_expires"),
        F.col("_h.age").alias("_age"),
        F.col("_h.lm").alias("_lm"),
    )

    d = parse_cache_control(F.col("_cc"))
    date, expires, lm = F.col("_date"), F.col("_expires"), F.col("_lm")
    expires_life = F.when(
        expires.isNotNull() & date.isNotNull(), _clamp0(expires - date)
    )
    heuristic_life = F.when(
        lm.isNotNull() & date.isNotNull(),
        F.lit(float(heuristic_fraction)) * _clamp0(date - lm),
    )
    lifetime = F.coalesce(d["s_maxage"], d["max_age"], expires_life, heuristic_life)
    heuristic = (
        d["s_maxage"].isNull()
        & d["max_age"].isNull()
        & expires_life.isNull()
        & heuristic_life.isNotNull()
    )
    apparent_age = F.when(date.isNotNull(), _clamp0(F.col("last_ts") - date)).otherwise(
        F.lit(0.0)
    )
    age_at_response = apparent_age + F.coalesce(F.col("_age"), F.lit(0.0))
    cacheable = ~(d["no_store"] | d["private"])

    planned = latest.select(
        "url",
        "last_ts",
        cacheable.alias("cacheable"),
        d["no_cache"].alias("no_cache"),
        lifetime.alias("lifetime_s"),
        heuristic.alias("heuristic"),
        age_at_response.alias("age_at_response"),
        F.when(
            cacheable & lifetime.isNotNull(),
            F.col("last_ts") + lifetime - age_at_response,
        ).alias("due_ts"),
    )
    if now is None:
        now_df = history.agg(F.max(ts).alias("_now"))
        planned = planned.crossJoin(F.broadcast(now_df))
        now_col = F.col("_now")
    else:
        now_col = F.lit(float(now))
    return planned.select(
        "url",
        "last_ts",
        "cacheable",
        "no_cache",
        "lifetime_s",
        "heuristic",
        "age_at_response",
        "due_ts",
        (
            F.col("cacheable")
            & ~F.col("no_cache")
            & F.coalesce(now_col < F.col("due_ts"), F.lit(False))
        ).alias("fresh_now"),
    )
