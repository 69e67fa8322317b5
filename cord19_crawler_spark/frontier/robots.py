"""robots.txt rule matching, vectorized.

Rules live in the small ``robots_rules`` dimension:
``(host string, rules array<struct<allow boolean, path_prefix string>>)``.
Semantics (classic longest-match wins, Google-style simplification):
the matching rule with the longest path_prefix decides; allow on tie;
no matching rule → allow.

The dimension is broadcast-joined onto candidates (hosts ≪ URLs), then a
single Arrow-batched pandas UDF evaluates longest-prefix-match per row —
there is no per-row Python UDF and no shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

RULES_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("allow", T.BooleanType()),
            T.StructField("path_prefix", T.StringType()),
        ]
    )
)


_PARSED_TYPE = T.StructType(
    [
        T.StructField("rules", RULES_TYPE),
        T.StructField("crawl_delay", T.DoubleType()),
    ]
)


def parse_robots_txt(robots: DataFrame, txt_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) → (host, rules, crawl_delay) — parse raw
    robots.txt bodies into the rules dimension. Honors the stanza grammar
    for ``User-agent: *`` groups: Allow/Disallow lines, first matching
    agent group wins, empty Disallow means allow-all, and ``Crawl-delay``
    (seconds, de-facto standard) is extracted per host — the scheduler
    feeds it into the wall-clock politeness budget as that host's
    ``min_delay_seconds``. Stanza parsing is inherently sequential per
    document → one Arrow-batched pandas UDF over the (small) per-host table.
    """

    @pandas_udf(_PARSED_TYPE)
    def _parse(bodies: pd.Series) -> pd.DataFrame:
        def one(txt: str | None) -> tuple[list[dict], float | None]:
            if not txt:
                return [], None
            rules: list[dict] = []
            delay: float | None = None
            in_star = False          # current group's agents include '*'
            in_group_header = False  # consecutive UA lines extend one group
            for raw in txt.splitlines():
                line = raw.split("#", 1)[0].strip()
                if not line or ":" not in line:
                    continue
                key, _, val = line.partition(":")
                key, val = key.strip().lower(), val.strip()
                if key == "user-agent":
                    # RFC 9309: consecutive User-agent lines share ONE rule
                    # block ('User-agent: *\nUser-agent: Foo\nDisallow: /x'
                    # applies to * too); a UA line AFTER directives begins a
                    # new group
                    if not in_group_header:
                        if in_star:
                            break  # the * group just ended; first one wins
                        in_star = False
                        in_group_header = True
                    in_star = in_star or val == "*"
                else:
                    if key in ("allow", "disallow", "crawl-delay"):
                        in_group_header = False
                    if in_star and key in ("allow", "disallow"):
                        if val == "":
                            continue  # empty Disallow = allow all (no rule)
                        rules.append(
                            {"allow": key == "allow", "path_prefix": val}
                        )
                    elif in_star and key == "crawl-delay":
                        try:
                            delay = float(val)
                        except ValueError:
                            pass  # malformed delay: tolerated, no constraint
            return rules, delay

        parsed = [one(b) for b in bodies]
        return pd.DataFrame(
            {"rules": [p[0] for p in parsed], "crawl_delay": [p[1] for p in parsed]}
        )

    out = robots.withColumn("_p", _parse(F.col(txt_col)))
    return out.select(
        "host",
        F.col("_p.rules").alias("rules"),
        F.col("_p.crawl_delay").alias("crawl_delay"),
    )


def _path_of(url: str) -> str:
    # canonical URLs: scheme://host[:port]/path[?q]
    rest = url.split("://", 1)[-1]
    slash = rest.find("/")
    if slash < 0:
        return "/"
    return rest[slash:].split("?", 1)[0]


def _compile_robots_pattern(pref: str):
    """RFC 9309 §2.2.3 rule pattern → compiled regex: ``*`` matches any
    octet sequence, ``$`` (only meaningful at the end) anchors the match
    to the end of the path; everything else is literal. A pattern with
    neither special char degenerates to a plain prefix match."""
    import re as _re

    anchored = pref.endswith("$")
    body = pref[:-1] if anchored else pref
    rx = ".*".join(_re.escape(part) for part in body.split("*"))
    return _re.compile("^" + rx + ("$" if anchored else ""))


_ROBOTS_PATTERN_CACHE: dict = {}


@pandas_udf(T.BooleanType())
def robots_allowed(urls: pd.Series, rules: pd.Series) -> pd.Series:
    """Most-specific-match allow/deny per RFC 9309: ``*`` wildcards and
    the ``$`` end anchor are honored (§2.2.3), specificity is the raw
    pattern's octet length (§2.2.2), and an allow rule wins a length tie.
    Patterns without special characters behave exactly as the original
    longest-prefix match. Vectorized over the Arrow batch; compiled
    patterns are cached per executor (the rules dimension is small and
    highly repetitive across rows)."""

    def _match(pref: str, path: str) -> bool:
        if "*" not in pref and not pref.endswith("$"):
            return path.startswith(pref)  # fast path: plain prefix
        rx = _ROBOTS_PATTERN_CACHE.get(pref)
        if rx is None:
            rx = _ROBOTS_PATTERN_CACHE[pref] = _compile_robots_pattern(pref)
        return rx.match(path) is not None

    def _one(url: str | None, rls) -> bool:
        if url is None:
            return False
        if rls is None or len(rls) == 0:
            return True
        path = _path_of(url)
        best_len, best_allow = -1, True
        for r in rls:
            pref = r["path_prefix"]
            if pref is not None and _match(pref, path):
                plen = len(pref)
                if plen > best_len or (plen == best_len and r["allow"]):
                    best_len, best_allow = plen, bool(r["allow"])
        return best_allow

    return pd.Series([_one(u, r) for u, r in zip(urls, rules)])


def filter_robots(candidates: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Drop candidates denied by their host's robots rules.

    Scale shape: the rules dimension can be huge (one row per crawled host,
    10^8 at frontier scale), so it is FIRST pruned with a semi-join to the
    round's candidate hosts — shuffle volume bounded by the distinct-host
    count (map-side partial distinct), not by candidates or by the full
    dimension — and only the pruned result (≤ candidate hosts) is broadcast,
    so candidate rows never shuffle for this filter."""
    if robots is None:
        return candidates
    hosts = candidates.select("host").distinct()
    pruned = robots.select("host", "rules").join(hosts, "host", "left_semi")
    joined = candidates.join(F.broadcast(pruned), "host", "left")
    return (
        joined.withColumn("_allowed", robots_allowed(F.col("url"), F.col("rules")))
        .filter(F.col("_allowed"))
        .drop("_allowed", "rules")
    )


def sitemap_urls_expr(txt_col) -> "Column":
    """All ``Sitemap:`` URLs declared in a robots.txt body, as an array
    column. Per RFC 9309 §2.3 / sitemaps.org, ``Sitemap:`` is a
    NON-group directive: valid anywhere in the file (before, inside, or
    after User-agent groups), multiple lines allowed — so unlike the
    stanza rules above it needs no sequential parse, just a multiline
    case-insensitive line regex. Pure Catalyst (``(?im)`` inline flags
    work in both Java regex and RE2, keeping the DuckDB oracle exact),
    scan-side, no UDF. The pattern tolerates RFC 9309 end-of-line
    comments (``Sitemap: url  # note``) and consumes an optional ``\\r``
    explicitly — RE2's multiline ``$`` matches only before ``\\n`` while
    Java's also matches before ``\\r\\n``, so WITHOUT the explicit
    ``\\r?`` a CRLF robots body would extract in Spark but not in the
    oracle.

    Discovered URLs feed ``sources/warc.py:read_sitemap_seeds`` — robots
    fetch → sitemap discovery → seed expansion is the standard crawl
    bootstrap loop.
    """
    col = F.col(txt_col) if isinstance(txt_col, str) else txt_col
    return F.regexp_extract_all(
        col,
        F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)[ \t]*(?:#[^\r\n]*)?\r?$"),
        1,
    )


def robots_fetch_policy(
    history: DataFrame,
    now: float,
    host_col: str = "host",
    ts_col: str = "ts",
    status_col: str = "status",
    max_age_seconds: float = 86400.0,
    unreachable_grace_days: float = 30.0,
) -> DataFrame:
    """Per-host EFFECTIVE robots policy from the robots.txt fetch log —
    RFC 9309 §2.3.1's availability rules, reduced to scheduler state:

    * last fetch 2xx  → ``'rules'``: the parsed rule groups apply
      (``parse_robots_txt``/``filter_robots`` own that path);
    * last fetch 3xx  → ``'redirect'``: resolve the chain first
      (``frontier/redirects.py``) and fetch the target;
    * last fetch 4xx  → ``'allow_all'``: "unavailable" per the RFC —
      a missing robots.txt imposes no restrictions;
    * last fetch 5xx / network-error 0 → "unreachable": ``'deny_all'``
      while recent, relaxing to ``'allow_all'`` once the host has been
      unreachable longer than ``unreachable_grace_days`` (the RFC's
      MAY-assume-unavailable clause, pinned here as policy) — measured
      from the last REACHABLE fetch (any 1xx-4xx), or from the first
      observed attempt when no fetch ever succeeded;
    * ``stale`` — the newest fetch is older than ``max_age_seconds``
      (RFC: cache at most 24h absent cache-control): refetch before the
      next scheduling round regardless of state.

    ONE linear host-key hash aggregate (max/max_by/min with
    NULL-when-not-applicable ordering keys) — no window, no self-join;
    the standard frontier-reduce shuffle shape at 10^8 hosts.
    """
    ts, status = F.col(ts_col), F.col(status_col)
    reachable = status.between(100, 499)
    agg = history.groupBy(F.col(host_col).alias("host")).agg(
        F.max(ts).alias("last_ts"),
        F.max_by(status, F.struct(ts, status)).alias("last_status"),
        F.max(F.when(reachable, ts)).alias("_last_reach_ts"),
        F.min(ts).alias("_first_ts"),
    )
    unreachable_since = F.coalesce("_last_reach_ts", "_first_ts")
    days_unreachable = F.when(
        ~F.col("last_status").between(100, 499),
        (F.lit(float(now)) - unreachable_since) / 86400.0,
    )
    state = (
        F.when(F.col("last_status").between(200, 299), F.lit("rules"))
        .when(F.col("last_status").between(300, 399), F.lit("redirect"))
        .when(F.col("last_status").between(400, 499), F.lit("allow_all"))
        .when(
            days_unreachable > float(unreachable_grace_days),
            F.lit("allow_all"),
        )
        .otherwise(F.lit("deny_all"))
    )
    return agg.select(
        "host",
        "last_ts",
        "last_status",
        state.alias("state"),
        days_unreachable.alias("days_unreachable"),
        (F.lit(float(now)) - F.col("last_ts") > float(max_age_seconds))
        .alias("stale"),
    )
