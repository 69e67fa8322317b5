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

Consistency note: the range-partitioned frame is persisted and materialized
by the counts job BEFORE the ranked result is consumed, so both passes see
the same partitioner (range boundaries are sampled exactly once). Task
recompute after cache loss is still consistent: the exchange's partitioner is
fixed at first execution and the in-partition sort is total, so ranks don't
depend on shuffle-fetch arrival order.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    name: str = "row_number",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global rank column under a TOTAL order, computed in
    two parallel phases instead of a single-reducer window.

    Build-time operator semantics: triggers one counts job eagerly (like
    ``RDD.zipWithIndex``) and caches the range-partitioned input
    (MEMORY_AND_DISK) so the final consumption reuses the same partitioning.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    parts = df.repartitionByRange(n, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
    parts.persist(StorageLevel.MEMORY_AND_DISK)
    counts = {
        r["_pid"]: r["c"]
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
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
        .withColumn(name, (F.col("_lrn") + off).cast("int"))
        .drop("_pid", "_lrn")
    )
