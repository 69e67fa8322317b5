"""Public-suffix-list (PSL) registrable-domain resolution.

``politeness.domain_of`` uses the last-two-DNS-labels heuristic, which
over-groups under multi-label public suffixes (sub1.example.co.uk and
sub2.other.co.uk would share a "co.uk" budget). This module resolves the
REGISTRABLE domain properly: longest matching public suffix + one label,
with the suffix set carried as a broadcast dimension — the scale shape the
politeness docstring promises ("a real deployment broadcasts the PSL as a
dimension").

The suffix table loads from a standard publicsuffix.org-format file (one
suffix per line, ``//`` comments, ``*.`` wildcards, ``!`` exceptions);
without a file a small built-in snapshot of common multi-label suffixes is
used (enough for tests — production ships the full list, ~10k rows ≈ a few
hundred KB broadcast).

Resolution is pure DataFrame algebra (no per-row Python): explode each
host's candidate suffixes (its last k labels, k ≤ max suffix depth), join
the broadcast suffix dimension, keep the LONGEST match per host
(wildcard rows match one extra leading label; exception rows cancel the
wildcard per PSL semantics), then registrable = suffix + one label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# built-in snapshot: common multi-label public suffixes (subset; production
# loads the full publicsuffix.org list via load_psl(path=...))
BUILTIN_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "com.au", "net.au", "org.au", "gov.au", "edu.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in",
    "co.nz", "net.nz", "org.nz",
    "co.za", "org.za", "web.za",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "org.mx",
    "*.ck", "!www.ck",
]


def load_psl(spark: SparkSession, path: str | None = None) -> DataFrame:
    """(suffix, labels, is_wildcard, is_exception) dimension. ``path`` is a
    publicsuffix.org-format file; None uses the built-in snapshot."""
    if path is None:
        lines = BUILTIN_SUFFIXES
    else:
        raw = spark.read.text(path)
        lines = [
            r["value"].strip()
            for r in raw.collect()
            if r["value"].strip() and not r["value"].strip().startswith("//")
        ]
    rows = []
    for ln in lines:
        exc = ln.startswith("!")
        wild = ln.startswith("*.")
        base = ln.lstrip("!")
        if wild:
            base = base[2:]
        rows.append((base.lower(), base.count(".") + 1, wild, exc))
    return spark.createDataFrame(
        rows, "suffix string, labels int, is_wildcard boolean, is_exception boolean"
    )


def with_registrable_domain(
    df: DataFrame,
    psl: DataFrame,
    host_col: str = "host",
    out_col: str = "domain",
    max_depth: int = 5,
) -> DataFrame:
    """Append the registrable domain of ``host_col``.

    PSL algorithm, distributed: a host's candidate suffixes are its last
    k labels (k ≤ max_depth); the broadcast join keeps matches; per host the
    winning rule is the longest match, where a wildcard rule ``*.sfx``
    matches hosts with ≥1 label before ``sfx`` (effective suffix = one label
    + sfx) and an exception rule ``!name.sfx`` cancels the wildcard (the
    exception itself IS the registrable domain). No match → default rule
    (suffix = last label), i.e. registrable = last two labels.
    """
    parts = F.split(F.col(host_col), r"\.")
    n = F.size(parts)
    # candidate suffix of depth k = last k labels (k = 1..max_depth)
    cands = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.least(F.lit(max_depth), n)),
            lambda k: F.concat_ws(".", F.slice(parts, n - k + 1, k)),
        ),
        lambda s: s != "",
    )
    exploded = df.select(
        F.col(host_col).alias("_h"), F.explode(cands).alias("_cand")
    ).dropDuplicates(["_h", "_cand"])
    j = exploded.join(
        F.broadcast(psl), exploded["_cand"] == psl["suffix"], "inner"
    ).select(
        "_h",
        "suffix",
        "labels",
        "is_wildcard",
        "is_exception",
    )
    hp = F.split(F.col("_h"), r"\.")
    hn = F.size(hp)
    # PUBLIC-SUFFIX label count implied by the rule (PSL semantics):
    #   exact rule  "sfx"      → labels(sfx)
    #   wildcard    "*.sfx"    → labels(sfx) + 1 ('*' consumes one label)
    #   exception   "!name.sfx"→ labels(rule) - 1 (leftmost label removed)
    eff = (
        F.when(F.col("is_exception"), F.col("labels") - 1)
        .when(F.col("is_wildcard"), F.col("labels") + 1)
        .otherwise(F.col("labels"))
    )
    # rule applicability: exact rules apply by the equi-join alone; a
    # wildcard needs one label for '*'; an exception needs the host to end
    # with the full rule text (which the join already guarantees)
    applies = F.when(
        F.col("is_wildcard"), hn >= F.col("labels") + 1
    ).otherwise(F.lit(True))
    # prevailing rule: ANY matching exception wins, else most labels
    rank = F.when(F.col("is_exception"), F.lit(10_000)).otherwise(F.lit(0)) + eff
    best = (
        j.filter(applies)
        .groupBy("_h")
        .agg(F.max(F.struct(rank.alias("_rank"), eff.alias("_eff"))).alias("s"))
        .select("_h", F.col("s._eff").alias("_eff"))
    )
    out = df.join(best, df[host_col] == best["_h"], "left").drop("_h")
    op = F.split(F.col(host_col), r"\.")
    on = F.size(op)
    # registrable = public suffix + one label; a host that IS a public
    # suffix (on == eff) degrades to itself as the budget key
    dom_labels = F.least(F.coalesce(F.col("_eff"), F.lit(1)) + 1, on)
    domain = F.concat_ws(".", F.slice(op, on - dom_labels + 1, dom_labels))
    return out.withColumn(out_col, domain).drop("_eff")
