"""Mergeable frequency sketches: Count-Min (Cormode & Muthukrishnan,
J. Algorithms 2005) for heavy-hitter estimation over corpus-scale key
streams.

Why a sketch at 100 TB: an exact per-key count over a 10^11-token stream
shuffles the full vocabulary every time; a d x w Count-Min table is a
FIXED-size (d*w-row) aggregate with the same map-side-partial shape as
any groupBy, counters from different partitions / days / sources SUM
cell-wise (the mergeability that makes it a streaming/state primitive),
and point estimates are one broadcast probe join.  Estimates never
undercount: true <= est <= true + eps*N with eps = e/w at confidence
1 - exp(-d).

Hashing is the repo's cross-engine base hash (md5_long56, row-salted),
so a DuckDB oracle reproduces every counter cell and estimate exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import md5_long56


def _cms_col(key, row: int, w: int):
    """Pinned cell hash: md5_long56('<row>:' || key) % w (md5_long56 is
    non-negative, so Spark's sign-preserving % is safe here)."""
    return md5_long56(F.concat(F.lit(f"{row}:"), key)) % F.lit(w)


def cms_counters(
    items: DataFrame,
    key_col: str = "word",
    d: int = 4,
    w: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the d x w counter table: (row, col, cnt).

    One pass: each item fans out to its d cells (d is small — a bounded
    array explode, not a shuffle multiplier) and ONE map-side-partial
    aggregate reduces to at most d*w rows.  Counter tables built over
    disjoint inputs merge by summing cnt on (row, col) — union +
    re-aggregate, no rebuild.
    """
    if d < 1 or w < 1:
        raise ValueError("d and w must be >= 1")
    weight = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_col(F.col(key_col), r, w).alias("col"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("_c"),
        weight.alias("_w"),
    )
    return (
        cells.select(F.col("_c.row").alias("row"), F.col("_c.col").alias("col"), "_w")
        .groupBy("row", "col")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    key_col: str = "word",
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Point estimates for probe keys: est = min over the d rows of the
    key's counter cell (absent cell = 0).  ``d``/``w`` must match the
    build.  Returns (key_col, est).

    The probe side is broadcast (a query's keys); the counter table is
    itself bounded at d*w rows, so at serving time BOTH sides are small
    — the expensive pass was the one-shot build.
    """
    cells = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_col(F.col(key_col), r, w).alias("col"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("_c"),
    ).select(key_col, F.col("_c.row").alias("row"), F.col("_c.col").alias("col"))
    return (
        cells.join(counters, ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est"))
    )


def cms_heavy_hitters(
    items: DataFrame,
    candidates: DataFrame,
    key_col: str = "word",
    d: int = 4,
    w: int = 256,
    threshold: int = 1,
) -> DataFrame:
    """Build + probe in one plan: estimates for every candidate key with
    est >= threshold, ordered (est desc, key asc).  ``candidates`` is
    normally a small frame (e.g. a sampled or dictionary-driven key
    list); the CLASSIC streaming heavy-hitter loop keeps candidates as
    the keys whose estimate at insert time cleared the threshold."""
    est = cms_estimate(
        cms_counters(items, key_col=key_col, d=d, w=w),
        candidates,
        key_col=key_col,
        d=d,
        w=w,
    )
    return est.filter(F.col("est") >= threshold).orderBy(
        F.desc("est"), F.asc(key_col)
    )
