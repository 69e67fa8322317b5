"""Fetch-budget apportionment across hosts — exact largest-remainder.

A crawl round has a fixed fetch budget (politeness-bounded cluster
capacity); distributing it across hosts proportionally to a weight
(pagerank mass from ``operators/graph.py:pagerank``, indegree, change
rate from ``frontier/recrawl.py`` — any non-negative score) needs an
integer apportionment that (a) sums EXACTLY to the budget, (b) is
deterministic, and (c) never strands fractional quota on big hosts.
That is the classic largest-remainder (Hamilton) method: floor every
proportional quota, then hand the leftover units to the hosts with the
largest fractional parts (ties by host ASC — a total order).

Scale shape (10^8 hosts): ONE driver action — a single 1-row aggregate
computing (total weight, invalid-weight count, floored-quota sum) in one
job — then ONE global rank on the fractional part via the two-phase
range-partitioned ``global_row_number``; no single-reducer window.
Everything else is scan-side arithmetic. The normalized weight frame is
pinned with an eager localCheckpoint before the first action so a
non-deterministic upstream (a sampled or recomputed frame) cannot yield
a leftover/rank pair inconsistent with the final pass — the exact-sum
guarantee holds against the SAME materialized weights everywhere.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["apportion_budget"]


def apportion_budget(
    weights: DataFrame,
    total: int,
    key_col: str = "host",
    weight_col: str = "weight",
) -> DataFrame:
    """Integer budgets per key, proportional to weight, summing to
    ``total`` exactly (largest-remainder). Zero-weight keys get 0 unless
    a leftover unit reaches them (it cannot: their fractional part is 0
    and ties rank behind any positive fraction only by key order among
    other zeros — documented, deterministic). Raises if the weight sum
    is not positive or any weight is negative.

    Returns (key, weight, base, extra, budget).
    """
    from ..operators.ranking import global_row_number

    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    # pin the normalized weights before ANY action: every subsequent pass
    # (validity/wsum/floored-sum and the final ranked job) must read the
    # SAME materialized values or a non-deterministic upstream breaks the
    # exact-sum guarantee
    w = weights.select(
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("double").alias("weight"),
    ).localCheckpoint(eager=True)
    # ONE driver action: wsum, invalid-weight count, and the floored-quota
    # sum in a single job (wsum is a 1-row broadcast inside the same plan;
    # try_divide because ANSI faults even double /0 and the wsum<=0 case
    # must surface as the ValueError below, not a SparkArithmeticException;
    # invalid rows are likewise rejected below before any result is
    # derived from their quotas)
    tot = w.agg(F.sum("weight").alias("wsum"))
    row = (
        w.crossJoin(F.broadcast(tot))
        .agg(
            F.first("wsum").alias("wsum"),
            F.coalesce(
                F.sum(
                    ((F.col("weight") < 0) | F.col("weight").isNull()).cast("long")
                ),
                F.lit(0),
            ).alias("bad"),
            F.coalesce(
                F.sum(
                    F.floor(
                        F.try_divide(F.col("weight"), F.col("wsum"))
                        * F.lit(float(total))
                    ).cast("long")
                ),
                F.lit(0),
            ).alias("floored"),
        )
        .collect()
    )
    first = row[0] if row else None
    if first is not None and first["bad"]:
        raise ValueError("weights must be non-negative and non-null")
    wsum = first["wsum"] if first is not None else None
    if not wsum or wsum <= 0:
        raise ValueError("total weight must be positive")
    quota = F.col("weight") / F.lit(float(wsum)) * F.lit(float(total))
    based = w.select(
        "key",
        "weight",
        F.floor(quota).cast("long").alias("base"),
        (quota - F.floor(quota)).alias("_frac"),
    )
    leftover = int(total - first["floored"])
    ranked = global_row_number(
        based,
        order_by=[F.desc("_frac"), F.asc("key")],
        name="_r",
        dtype="long",
    )
    return ranked.select(
        F.col("key").alias(key_col),
        "weight",
        "base",
        (F.col("_r") <= F.lit(leftover)).cast("long").alias("extra"),
        (F.col("base") + (F.col("_r") <= F.lit(leftover)).cast("long")).alias(
            "budget"
        ),
    )
