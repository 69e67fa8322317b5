"""As-of join: for each left row, the single most recent right row
(largest right_ts ≤ left_ts) per key.

Spark has no native ASOF JOIN. The naive composition — range join + argmax —
explodes: every left row joins EVERY earlier right row before the argmax
prunes, O(L·R) per key on wide time ranges. The scale-correct composition is
the union-tag trick used here:

1. tag both sides and union them (right payload columns null on left rows),
2. one window per key ordered by (ts, side) — right rows sort BEFORE left
   rows at equal timestamps, giving the inclusive ``left_ts >= right_ts``
   match — carrying ``last(payload, ignorenulls=True)``,
3. keep the left rows.

ONE shuffle on the key, no row multiplication, linear in |L| + |R|.
Requires the right side to be unique per (key, ts) — pre-aggregate ties
(the driver query does max-per-ts), otherwise which tied row wins would
depend on partition iteration order.

Validated against DuckDB's native ASOF LEFT JOIN by the driver query
``events_asof_join``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of-backward join; returns the left rows (ts column renamed
    back to ``left_ts``) with ``payload_cols`` filled from the most recent
    right row at or before each left timestamp (null if none)."""
    from pyspark.sql import types as T

    left_types = dict(left.dtypes)
    left_extra = [c for c in left.columns if c not in set(key_cols) | {left_ts}]
    # payloads travel as ONE struct per right row: last(struct) can never mix
    # columns from different right rows, and a matched row whose payload
    # value is genuinely NULL stays NULL (per-column last(c, ignorenulls)
    # would skip it and resurrect a stale older value)
    payload_type = T.StructType(
        [right.schema[c] for c in payload_cols]
    )
    l = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_payload"),
        *left_extra,
    )
    r = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*payload_cols).alias("_payload"),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_extra],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *key_cols,
        "_ts",
        "_side",
        *left_extra,
        F.last("_payload", ignorenulls=True).over(w).alias("_payload"),
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *key_cols,
            F.col("_ts").alias(left_ts),
            *left_extra,
            *[F.col(f"_payload.{c}").alias(c) for c in payload_cols],
        )
    )
