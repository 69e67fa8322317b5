"""Mergeable sketches: Count-Min (Cormode & Muthukrishnan, J.
Algorithms 2005) for heavy-hitter estimation and HyperLogLog (Flajolet
et al., AofA 2007) for distinct counting over corpus-scale key streams.

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


# ---------------------------------------------------------------------------
# HyperLogLog distinct counting
# ---------------------------------------------------------------------------

HLL_HASH_BITS = 56  # md5_long56 yields 56 usable hash bits


def hll_registers(
    items: DataFrame,
    key_col: str,
    group_cols: list[str] | tuple[str, ...] = (),
    p: int = 12,
) -> DataFrame:
    """Per-group HyperLogLog registers (Flajolet et al. 2007): bucket =
    top ``p`` hash bits, register = max over the stream of the leading
    1-bit position (rank) of the remaining ``56 - p`` bits.

    Why a sketch at 100 TB: exact countDistinct over 10^11 URLs/tokens
    shuffles every distinct key; the register table is a FIXED-size
    (2^p rows per group) map-side-partial max-aggregate, and register
    tables built over disjoint inputs (days, shards, sources) merge by
    max on (group, bucket) — union + re-aggregate, no rebuild.  Keyed
    on the repo's cross-engine md5_long56 so a DuckDB oracle reproduces
    every register and the estimate exactly.

    Returns (group_cols..., bucket, m) with m >= 1; buckets the stream
    never touched are ABSENT (their register is implicitly 0).  NULL
    keys are dropped before hashing (a NULL hash would otherwise create
    a NULL-bucket register that inflates buckets_used while adding
    nothing to the harmonic sum — a silently biased estimate).
    """
    bucket, rank = hll_cell_exprs(key_col, p)
    return (
        items.filter(F.col(key_col).isNotNull())
        .select(
            *group_cols,
            bucket.alias("bucket"),
            rank.alias("_rank"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rank").alias("m"))
    )


def hll_cell_exprs(key_col: str, p: int):
    """The pinned (bucket, rank) cell expressions — ONE definition shared
    by the batch register build and the streaming state operator
    (streaming/sketch.py), so the two paths cannot drift and the
    bit-identical batch/stream parity holds by construction.  Callers
    must drop NULL keys first (md5 of NULL is NULL)."""
    if not (4 <= p <= 18):
        raise ValueError(f"p must be in [4, 18], got {p}")
    w = HLL_HASH_BITS - p  # suffix width; rank range is 1..w+1
    h = md5_long56(F.col(key_col).cast("string"))
    suffix = h % F.lit(1 << w)
    rank = F.when(suffix == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(suffix))
    )
    return F.shiftright(h, w), rank.cast("int")


def hll_alpha(p: int) -> float:
    """Bias-correction constant alpha_m for m = 2^p (Flajolet 2007 §4)."""
    m = 1 << p
    if p == 4:
        return 0.673
    if p == 5:
        return 0.697
    if p == 6:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_cardinality(
    items: DataFrame,
    key_col: str,
    group_cols: list[str] | tuple[str, ...] = (),
    p: int = 12,
) -> DataFrame:
    """Per-group HLL distinct-count estimate with the small-range
    (linear-counting) correction.  Returns (group_cols..., buckets_used,
    hll_est) — ``buckets_used`` is the number of non-zero registers.

    Exact cross-engine arithmetic: the harmonic sum ``sum(2^-M_b)`` is
    computed as the INTEGER ``S = sum(2^(w+1-M_b))`` over all 2^p
    buckets (absent bucket => M_b = 0 => term 2^(w+1); each term
    <= 2^45 and there are <= 2^18 of them, so S fits bigint exactly),
    then ``est = alpha * m^2 * 2^(w+1) / S`` — one double division of
    exact integers by a pinned literal, bit-identical on any IEEE-754
    engine, which is what lets a DuckDB oracle match the estimate to
    full precision rather than within tolerance.
    """
    reg = hll_registers(items, key_col, group_cols=group_cols, p=p)
    return hll_estimate_from_registers(reg, group_cols=group_cols, p=p)


def hll_estimate_from_registers(
    reg: DataFrame,
    group_cols: list[str] | tuple[str, ...] = (),
    p: int = 12,
) -> DataFrame:
    """The estimate stage of :func:`hll_cardinality`, split out so any
    register table — built directly, merged across shards, or grown by
    an iterative algorithm like :func:`~..graph.hyperball` — folds to
    (group_cols..., buckets_used, hll_est) with the same integer-exact
    cross-engine arithmetic."""
    w = HLL_HASH_BITS - p
    m = 1 << p
    gb = list(group_cols)
    s = reg.groupBy(*gb).agg(
        F.count(F.lit(1)).cast("long").alias("buckets_used"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {w + 1} - m)"))
        .cast("long")
        .alias("_s_present"),
    )
    numer = hll_alpha(p) * m * m * float(1 << (w + 1))  # one pinned literal
    s_total = F.col("_s_present") + (F.lit(m) - F.col("buckets_used")) * F.lit(
        1 << (w + 1)
    ).cast("long")
    e_raw = F.lit(numer) / s_total.cast("double")
    zeros = (F.lit(m) - F.col("buckets_used")).cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(e_raw)
    return s.select(*gb, "buckets_used", est.alias("hll_est"))


def hll_estimate_py(registers, p: int) -> tuple[int, float]:
    """Driver/state-side twin of :func:`hll_estimate_from_registers` —
    the SAME integer harmonic sum and pinned literals, so a streaming
    state function (or a test replay) produces estimates bit-identical
    to the batch plan.  ``registers`` is a dense length-2^p sequence of
    register values (0 = untouched).  Returns (buckets_used, hll_est).
    """
    w = HLL_HASH_BITS - p
    m = 1 << p
    if len(registers) != m:
        raise ValueError(f"expected {m} registers, got {len(registers)}")
    used = 0
    s_present = 0
    for r in registers:
        if r > 0:
            used += 1
            s_present += 1 << (w + 1 - int(r))
    numer = hll_alpha(p) * m * m * float(1 << (w + 1))
    s_total = s_present + (m - used) * (1 << (w + 1))
    e_raw = numer / float(s_total)
    zeros = float(m - used)
    if e_raw <= 2.5 * m and zeros > 0:
        import math

        return used, float(m) * math.log(float(m) / zeros)
    return used, e_raw
