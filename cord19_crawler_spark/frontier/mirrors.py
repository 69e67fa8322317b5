"""Host-level mirror detection from content fingerprints.

A crawler that discovers two hosts serving largely the same pages
(mirrors, CDN aliases, www/apex splits that DUST's URL-text rules can't
see, scraped re-hosts) should crawl one and map the other — at web
scale whole-site mirrors are a double-digit percentage of fetch volume.
The classic formulation (Bharat & Broder, "Mirror, mirror on the Web",
1999) scores host pairs by the overlap of their page-content
fingerprint sets; this module is that computation as one Catalyst plan.

Input: one row per (host, page fingerprint) observation — any
deterministic content fingerprint works (``md5`` of the page body, a
simhash, ``functions/text.py`` fingerprints); repeated observations
collapse.

Plan shape and the web-scale hazards it bounds:

1. distinct (host, fp) via ``groupBy`` — map-side partial aggregation
   absorbs per-page duplication before the shuffle;
2. per-fp host counts; fingerprints on more than ``max_hosts_per_fp``
   hosts are DROPPED as template noise (empty pages, shared footers,
   parked-domain boilerplate): a fp on 10^6 hosts is no mirror
   evidence but would alone emit 5·10^11 join pairs.  Bharat & Broder
   drop high-frequency shingles for exactly this reason.  The drop also
   bounds the collect step below;
3. hosts sharing each surviving fp pair up via sorted-array
   combinations (arrays bounded by the cap, so the per-fp state is
   O(cap), never O(hosts));
4. pair counts aggregate into ``shared_fps``; per-host totals (distinct
   non-template fps) join back for the two normalized scores.

Scores: ``containment`` = shared / min(|A|, |B|) — robust when a small
mirror carries a subset of a big host; ``jaccard`` = shared /
(|A| + |B| − shared).  Denominators count each host's distinct
fingerprints AFTER the template drop (singleton fps included), so
template noise inflates neither side.

No counterpart in /root/reference; the algorithm is the published
Bharat & Broder 1999 / Henzinger 2006 mirror-detection family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mirror_hosts"]

#: default template-noise cap: a fingerprint shared by more hosts than
#: this is boilerplate, not mirror evidence (and is the quadratic-pair
#: hazard).  Oracle/exact callers pass None to disable.
DEFAULT_MAX_HOSTS_PER_FP = 50


def mirror_hosts(
    df: DataFrame,
    host_col: str = "host",
    fingerprint_col: str = "fingerprint",
    max_hosts_per_fp: int | None = DEFAULT_MAX_HOSTS_PER_FP,
    min_shared: int = 2,
    min_containment: float = 0.0,
) -> DataFrame:
    """(host, fingerprint) observations → scored candidate mirror pairs.

    Output: (host_a, host_b, shared_fps, n_a, n_b, containment,
    jaccard), one row per unordered host pair (``host_a < host_b``)
    with at least ``min_shared`` shared non-template fingerprints and
    ``containment >= min_containment``.
    """
    host, fp = F.col(host_col), F.col(fingerprint_col)
    hf = df.select(host.alias("host"), fp.alias("fp")).distinct()
    nh = hf.groupBy("fp").agg(F.count("*").alias("n_hosts"))
    if max_hosts_per_fp is not None:
        nh = nh.filter(F.col("n_hosts") <= max_hosts_per_fp)
    # non-template observations (carries n_hosts for the pair filter)
    hf2 = hf.join(nh, "fp")
    totals = hf2.groupBy("host").agg(F.count("*").alias("n_fp"))
    hosts_arr = (
        hf2.filter(F.col("n_hosts") >= 2)
        .groupBy("fp")
        .agg(F.array_sort(F.collect_list("host")).alias("_hosts"))
    )
    n = F.size(F.col("_hosts"))
    pair_structs = F.flatten(
        F.transform(
            F.col("_hosts"),
            lambda a, i: F.transform(
                F.slice(F.col("_hosts"), i + 2, n - i - 1),
                lambda b: F.struct(a.alias("host_a"), b.alias("host_b")),
            ),
        )
    )
    pairs = (
        hosts_arr.select(F.explode(pair_structs).alias("_p"))
        .groupBy(F.col("_p.host_a").alias("host_a"),
                 F.col("_p.host_b").alias("host_b"))
        .agg(F.count("*").alias("shared_fps"))
    )
    ta = totals.select(F.col("host").alias("host_a"), F.col("n_fp").alias("n_a"))
    tb = totals.select(F.col("host").alias("host_b"), F.col("n_fp").alias("n_b"))
    scored = (
        pairs.join(ta, "host_a")
        .join(tb, "host_b")
        .select(
            "host_a",
            "host_b",
            "shared_fps",
            "n_a",
            "n_b",
            (F.col("shared_fps") / F.least("n_a", "n_b")).alias("containment"),
            (
                F.col("shared_fps")
                / (F.col("n_a") + F.col("n_b") - F.col("shared_fps"))
            ).alias("jaccard"),
        )
    )
    return scored.filter(
        (F.col("shared_fps") >= min_shared)
        & (F.col("containment") >= min_containment)
    )
