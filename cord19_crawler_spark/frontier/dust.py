"""DUST-style URL alias-rule mining — "Do Not Crawl in the DUST:
Different URLs with Similar Text" (Bar-Yossef, Keidar & Schonfeld,
WWW 2007).

Large sites expose the SAME content under many URL spellings — session
and tracking query params (``?sid=...``, ``?utm_...``), trailing-slash
variants, ``www.`` host aliases. A frontier that treats every spelling
as a new URL re-fetches duplicate content and inflates the seen set;
the DUST insight is that these aliases follow site-wide REWRITE RULES
that can be LEARNED from fetch evidence (url, content fingerprint) and
then applied at canonicalization time so aliased URLs never reach the
fetch queue. This module provides the learning side; the learned
``strip_param:<name>`` rules feed straight into the existing
canonicalizers (functions/urls.py) as extra params to drop.

Rule alphabet mined here (the three families that dominate real DUST):

* ``strip_param:<name>`` — query parameter ``<name>`` does not affect
  content (session ids, tracking params);
* ``trailing_slash`` — ``/a/b/`` and ``/a/b`` serve the same content;
* ``strip_www`` — ``www.host`` and ``host`` are the same site.

Semantics (apply-and-check, not pair mining): every URL is normalized
under every candidate rule; a NORMALIZATION GROUP is a set of distinct
original URLs that a rule collapses onto one normalized key. A group
whose members all carry one content fingerprint SUPPORTS the rule; a
group with >= 2 distinct fingerprints REFUTES it (the rule would have
merged different content). Reported per rule: supporting / refuting
group counts, aliases_collapsed (extra fetches the rule would have
saved), and precision = support / (support + refuted). This is the
paper's support/refutation framework with candidate generation replaced
by the rule families above — equivalent outcome for these families, and
unlike pairwise candidate mining it needs NO pair join (a boilerplate
content flood cannot blow up a bucket).

Scale shape (10^10 fetch records): one scan projection parses each URL
into (host, path, sorted-params) — pure Catalyst regex/array ops, no
UDF; candidate param names are ONE linear aggregate capped to the
``max_params`` most frequent (broadcast back — the rule table is tiny
by construction); the urls x rules fan-out is a broadcast nested-loop
over <= max_params + 2 rows; then ONE hash aggregate on
(rule, normalized key) and ONE on rule. No pair joins, no windows, no
per-row Python. The two distinct-counts per group ride the same
aggregate via Spark's expand.

Noise note: a URL whose content LEGITIMATELY changes between fetches
(two fps for one URL) refutes any rule that groups it with another
spelling (a group of one spelling is never counted) — precision
thresholds, not hard filters, are how the paper absorbs this; callers
cut at their own precision floor.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["url_alias_rules", "apply_alias_rules"]


def url_alias_rules(
    pages: DataFrame,
    url_col: str = "url",
    fp_col: str = "content_fp",
    max_params: int = 100,
    min_support: int = 2,
) -> DataFrame:
    """Mine DUST alias rules from (url, content-fingerprint) evidence.

    Returns one row per candidate rule with ``support_groups`` >=
    ``min_support``: (rule, n_groups, support_groups, refuted_groups,
    aliases_collapsed, precision), precision rounded to 6 places and the
    frame ordered by (precision desc, aliases_collapsed desc, rule) so
    it is oracle-comparable. ``max_params`` caps the candidate
    ``strip_param`` alphabet to the most frequent query-param names
    (count desc, name asc, counted over distinct (url, fp) evidence
    pairs — re-fetches of one URL don't inflate a name) — the documented
    bound on the urls x rules fan-out at web scale.
    """
    from ..functions.urls import AUTHORITY_RE, PATH_RE

    # Every downstream statistic is DISTINCT-based (countDistinct of
    # originals and fingerprints per normalization group), so collapse the
    # fetch log to distinct (url, fp) pairs FIRST: the URL parse, the
    # urls x rules fan-out and the group aggregate then run over the
    # distinct-pair cardinality instead of the raw fetch-log volume (a
    # re-fetched URL costs nothing extra).  Map-side partial aggregation
    # dedups before the exchange, so the one shuffle here carries at most
    # the distinct pairs per task — measured 17.9s -> ~3s at sf1.0 where
    # the synthetic log holds ~15 fetches per distinct pair.
    u = F.col("_u")
    host = F.regexp_extract(u, AUTHORITY_RE, 1)
    path = F.regexp_extract(u, PATH_RE, 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(F.split(query, "&"), lambda x: x != F.lit(""))
    )
    base = (
        pages.select(
            F.col(url_col).alias("_u"), F.col(fp_col).alias("_fp")
        )
        .distinct()
        .select(
            host.alias("_host"),
            path.alias("_path"),
            params.alias("_params"),
            F.col("_fp"),
        )
        .filter(F.col("_host") != "")
    )

    # candidate strip_param alphabet: the max_params most frequent names
    # (ONE linear aggregate; deterministic count-desc, name-asc cut)
    names = (
        base.select(
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.col("_params"),
                        lambda x: F.substring_index(x, "=", 1),
                    )
                )
            ).alias("_pname")
        )
        .groupBy("_pname")
        .count()
        .orderBy(F.desc("count"), F.asc("_pname"))
        .limit(max_params)
    )
    param_rules = names.select(
        F.concat(F.lit("strip_param:"), F.col("_pname")).alias("rule"),
        F.col("_pname").alias("_arg"),
    )
    spark = pages.sparkSession
    structural = spark.createDataFrame(
        [("trailing_slash", None), ("strip_www", None)],
        "rule string, _arg string",
    )
    rules = F.broadcast(param_rules.unionByName(structural))

    # normalize under each rule; '' when the rule is a no-op for the URL
    # family it targets is fine — identity keys still group correctly
    joined = base.crossJoin(rules)
    norm_host = F.when(
        F.col("rule") == "strip_www",
        F.regexp_replace(F.col("_host"), r"^www\.", ""),
    ).otherwise(F.col("_host"))
    norm_path = F.when(
        F.col("rule") == "trailing_slash",
        F.regexp_replace(F.col("_path"), r"/+$", ""),
    ).otherwise(F.col("_path"))
    norm_params = F.when(
        F.col("rule").startswith("strip_param:"),
        F.filter(
            F.col("_params"),
            lambda x: F.substring_index(x, "=", 1) != F.col("_arg"),
        ),
    ).otherwise(F.col("_params"))
    qs = F.when(
        F.size(norm_params) > 0,
        F.concat(F.lit("?"), F.array_join(norm_params, "&")),
    ).otherwise(F.lit(""))
    orig_qs = F.when(
        F.size(F.col("_params")) > 0,
        F.concat(F.lit("?"), F.array_join(F.col("_params"), "&")),
    ).otherwise(F.lit(""))
    keyed = joined.select(
        F.col("rule"),
        F.concat(norm_host, norm_path, qs).alias("_norm"),
        F.concat(F.col("_host"), F.col("_path"), orig_qs).alias("_orig"),
        F.col("_fp"),
    )

    groups = keyed.groupBy("rule", "_norm").agg(
        F.countDistinct("_orig").alias("_n_originals"),
        F.countDistinct("_fp").alias("_n_fps"),
    )
    merged = groups.filter(F.col("_n_originals") > 1)
    support = (F.col("_n_fps") == 1).cast("int")
    out = merged.groupBy("rule").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(support).alias("support_groups"),
        F.sum(1 - support).alias("refuted_groups"),
        F.sum(
            F.when(F.col("_n_fps") == 1, F.col("_n_originals") - 1).otherwise(
                F.lit(0)
            )
        ).alias("aliases_collapsed"),
    )
    out = out.withColumn(
        "precision",
        F.round(
            F.col("support_groups").cast("double")
            / (F.col("support_groups") + F.col("refuted_groups")),
            6,
        ),
    ).filter(F.col("support_groups") >= F.lit(int(min_support)))
    return out.orderBy(
        F.desc("precision"), F.desc("aliases_collapsed"), F.asc("rule")
    )


def apply_alias_rules(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    min_precision: float = 1.0,
    min_support: int = 2,
    out_col: str = "url_canonical",
) -> DataFrame:
    """Apply mined DUST rules as a frontier canonicalizer column.

    Selects rules from a :func:`url_alias_rules` frame at
    ``precision >= min_precision`` and ``support_groups >= min_support``,
    then adds ``out_col``: the URL rewritten under every selected rule
    (strip the selected query params, trailing slash, leading ``www.``)
    so aliased spellings collapse BEFORE the URL-seen check and the
    fetch queue. Unparseable URLs (no ``scheme://host``) pass through
    unchanged; query params re-emit sorted (the mining key order).

    The one ``collect()`` here is bounded by construction — the rule
    table is at most ``max_params + 2`` rows (the mining cap), so this
    is a driver-side broadcast of a tiny policy, not a data collect; the
    rewrite itself is a single pure-Catalyst projection (no UDF, no
    shuffle) that composes with the existing canonicalizers.
    """
    from ..functions.urls import AUTHORITY_RE, PATH_RE

    sel = [
        r["rule"]
        for r in rules.filter(
            (F.col("precision") >= F.lit(float(min_precision)))
            & (F.col("support_groups") >= F.lit(int(min_support)))
        )
        .select("rule")
        .collect()
    ]
    strip = sorted(
        r.split(":", 1)[1] for r in sel if r.startswith("strip_param:")
    )
    u = F.col(url_col)
    scheme = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    host = F.regexp_extract(u, AUTHORITY_RE, 1)
    path = F.regexp_extract(u, PATH_RE, 1)
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(u, r"\?([^#]*)", 1), "&"),
            lambda x: x != F.lit(""),
        )
    )
    if "strip_www" in sel:
        host = F.regexp_replace(host, r"^www\.", "")
    if "trailing_slash" in sel:
        path = F.regexp_replace(path, r"/+$", "")
    if strip:
        strip_arr = F.array(*[F.lit(p) for p in strip])
        params = F.filter(
            params,
            lambda x: ~F.array_contains(
                strip_arr, F.substring_index(x, "=", 1)
            ),
        )
    qs = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    canonical = F.when(
        host == "", u
    ).otherwise(F.concat(scheme, F.lit("://"), host, path, qs))
    return urls.withColumn(out_col, canonical)
