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

Scale shape (10^8 hosts): two 1-row aggregates (total weight, floored
sum) broadcast back onto the scan, and ONE global rank on the fractional
part via the two-phase range-partitioned ``global_row_number`` — no
single-reducer window. Everything else is scan-side arithmetic.
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
    w = weights.select(
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("double").alias("weight"),
    )
    bad = (
        w.filter((F.col("weight") < 0) | F.col("weight").isNull())
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError("weights must be non-negative and non-null")
    tot = w.agg(F.sum("weight").alias("wsum"))
    wsum = tot.collect()[0]["wsum"]
    if not wsum or wsum <= 0:
        raise ValueError("total weight must be positive")
    quota = F.col("weight") / F.lit(float(wsum)) * F.lit(float(total))
    based = w.select(
        "key",
        "weight",
        F.floor(quota).cast("long").alias("base"),
        (quota - F.floor(quota)).alias("_frac"),
    )
    leftover = int(
        total - based.agg(F.coalesce(F.sum("base"), F.lit(0)).alias("s"))
        .collect()[0]["s"]
    )
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
