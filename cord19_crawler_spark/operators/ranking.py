"""Two-phase global row numbering: per-partition rank + offset, no
single-reducer window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves every row to
ONE reducer (Spark's "WindowExec: No Partition Defined" warning) — fine at
10^4 rows, fatal at 10^10. This module implements the classic zipWithIndex
plan shape for DataFrames:

1. range-partition by the sort key (parallel range exchange),
2. rank locally inside each range partition (partitioned window — parallel),
3. collect per-partition COUNTS (≤ num_partitions rows: partition metadata,
   not data — the same driver-side step ``RDD.zipWithIndex`` performs),
4. add each partition's prefix-sum offset as a literal map lookup.

Output is IDENTICAL to the global window whenever the order is total
(callers must include a unique tie-break column — every call site here does).

Consistency + storage lifecycle: ``repartitionByRange`` SAMPLES its range
boundaries at execution time, so the counts job and the final consumption
must observe the SAME physical partitioning. The range-partitioned frame is
therefore frozen with an eager ``localCheckpoint`` (one materialization job,
lineage truncated — no later action can ever resample). Checkpoint blocks
are reference-tracked: they are released by Spark's ContextCleaner when the
returned DataFrame is garbage-collected, so repeated index builds in one
session do not accumulate executor storage (a ``persist`` without a matching
``unpersist`` would live in the CacheManager for the whole session).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_INT_MAX = (1 << 31) - 1


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    name: str = "row_number",
    num_partitions: int | None = None,
    dtype: str = "int",
    checkpoint: bool = True,
) -> DataFrame:
    """Append a 1-based global rank column under a TOTAL order, computed in
    two parallel phases instead of a single-reducer window.

    Build-time operator semantics: triggers one materialization job eagerly
    (like ``RDD.zipWithIndex``) plus a partition-counts job over the stored
    blocks.

    ``dtype`` is the rank column type. The default ``"int"`` matches the
    reference's 32-bit word/doc ids and FAILS FAST (ValueError) when the
    input exceeds INT_MAX rows instead of silently wrapping; pass
    ``dtype="long"`` for the 10^9+-row regime (lexicon / doc_id_mapping at
    web scale).

    ``checkpoint=False`` skips the lineage-truncating localCheckpoint so the
    range-exchange plan stays inspectable (plan tests only — without the
    checkpoint the two passes are NOT guaranteed to see the same sampled
    range boundaries unless the caller persists).
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    parts = df.repartitionByRange(n, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
    if checkpoint:
        parts = parts.localCheckpoint(eager=True)
    counts = {
        r["_pid"]: r["c"]
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    if dtype == "int" and acc > _INT_MAX:
        raise ValueError(
            f"global_row_number: {acc} rows exceed INT_MAX; pass dtype='long' "
            "(and widen downstream id columns) for the 10^9+-row regime"
        )
    if offsets:
        off = F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("_pid"),
        )
    else:  # empty input: no partitions ranked
        off = F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*order_by)
    return (
        parts.withColumn("_lrn", F.row_number().over(w))
        .withColumn(name, (F.col("_lrn") + off).cast(dtype))
        .drop("_pid", "_lrn")
    )


def global_running_sum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    name: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append an INCLUSIVE global prefix sum of ``value_col`` under a TOTAL
    order — the same two-phase plan shape as ``global_row_number`` (range
    exchange + per-partition window + per-partition offsets collected as
    metadata), so a 10^10-row cumulative sum never funnels through one
    reducer. Callers must include a unique tie-break in ``order_by``.

    The per-partition offsets are SUMS of the value column rather than row
    counts; everything else (eager localCheckpoint to freeze the sampled
    range boundaries, ≤ num_partitions driver rows) matches
    global_row_number. Doubles accumulate in range order deterministically
    (same partitioning → same per-partition fold order); use long inputs
    for exact budgets.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    parts = df.repartitionByRange(n, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
    parts = parts.localCheckpoint(eager=True)
    sums = {
        r["_pid"]: r["s"]
        for r in parts.groupBy("_pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets: dict[int, float] = {}
    acc = 0
    for p in sorted(sums):
        offsets[p] = acc
        acc += sums[p] or 0
    if offsets:
        off = F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("_pid"),
        )
    else:
        off = F.lit(0)
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parts.withColumn("_lrs", F.sum(value_col).over(w))
        .withColumn(name, F.col("_lrs") + off)
        .drop("_pid", "_lrs")
    )
