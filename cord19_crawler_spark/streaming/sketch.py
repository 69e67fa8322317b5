"""Streaming HyperLogLog: per-group distinct-count registers as
custom streaming state (``applyInPandasWithState``).

The streaming twin of the batch sketch (operators/sketches.py): bucket
and rank are computed JVM-SIDE with the exact same codegen'd
expressions as ``hll_registers`` (the state function never hashes), the
state store holds one dense 2^p register array per group, and every
trigger that touches a group emits its refreshed (buckets_used,
hll_est) — computed by ``hll_estimate_py``, the pinned twin of the
batch estimate arithmetic, so a stream that has seen a set of keys
reports the BIT-IDENTICAL estimate the batch plan reports for the same
set (test-pinned).  State survives restarts via the checkpoint: the
register array is the whole sketch, so resume-then-continue equals
one-shot (register max-merge is idempotent and commutative — exactly
why a sketch, unlike an exact distinct set, is the right streaming
state at 10^10 keys: 2^p ints per group, forever).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketches import hll_cell_exprs, hll_estimate_py

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType()),
        T.StructField("buckets_used", T.LongType()),
        T.StructField("hll_est", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [T.StructField("registers", T.ArrayType(T.IntegerType()))]
)


def with_hll_cells(
    stream: DataFrame, key_col: str, group_col: str, p: int = 10
) -> DataFrame:
    """Scan-side (JVM, codegen) bucket/rank cells via the SHARED
    ``hll_cell_exprs`` (one definition with the batch register build —
    parity by construction, not by copy).  NULL keys dropped, matching
    the batch operator."""
    bucket, rank = hll_cell_exprs(key_col, p)
    return stream.filter(F.col(key_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("group"),
        bucket.cast("int").alias("bucket"),
        rank.alias("rank"),
    )


def _make_hll_group(p: int):
    m = 1 << p

    def _hll_group(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        regs = list(state.get[0]) if state.exists else [0] * m
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            # vectorized max-merge: one groupby over the arrow batch
            best = pdf.groupby("bucket")["rank"].max()
            for bucket, rank in best.items():
                if rank > regs[bucket]:
                    regs[bucket] = int(rank)
        if touched:
            state.update((regs,))
            used, est = hll_estimate_py(regs, p)
            yield pd.DataFrame(
                {
                    "group": [key[0]],
                    "buckets_used": [used],
                    "hll_est": [est],
                }
            )

    return _hll_group


def hll_distinct_stream(
    stream: DataFrame, key_col: str, group_col: str, p: int = 10
) -> DataFrame:
    """Per-group streaming distinct-count estimates: each trigger emits
    one refreshed (group, buckets_used, hll_est) row per group that
    received data.  Update-style semantics expressed in append mode
    (every emission is a new sketch snapshot row; readers take the last
    row per group — same convention as the scheduler's filter-state
    deltas)."""
    cells = with_hll_cells(stream, key_col, group_col, p=p)
    return cells.groupBy("group").applyInPandasWithState(
        _make_hll_group(p),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
