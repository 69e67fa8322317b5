"""Rendezvous (highest-random-weight) crawler-shard assignment.

A distributed crawl partitions the host space across a fleet of fetcher
shards.  Plain ``hash(host) % K`` reassigns ~all hosts when K changes —
every shard's politeness state, robots cache, and connection pools go
cold at once.  Rendezvous hashing (Thaler & Ravishankar 1998, the HRW
scheme consistent-hashing rings approximate) assigns each key to the
live shard with the highest keyed weight ``h(key, shard)``; when one
shard leaves, ONLY its keys move — each to its second choice — and when
a shard joins, only the keys it now wins move to it.  Expected movement
is 1/K of the keyspace, the provable minimum.

Weights here are ``md5(key ':' shard_id salt)`` compared as the
fixed-width lowercase hex string (equivalent to comparing the 128-bit
value) — chosen over the cheaper xxhash64 because md5 is available
verbatim in every engine (Spark, DuckDB, Python's hashlib), so shard
maps computed by this module, by an oracle SQL engine, and by the
non-Spark fetcher fleet itself all agree bit-for-bit.  Per row the plan
evaluates |shards| md5 calls and one array sort — a scan-side
projection, no shuffle, embarrassingly parallel at any frontier scale;
the whole map for 10^8 hosts is one narrow pass.

Output carries the winner AND the runner-up (``backup``): the backup is
precisely where each key lands if its shard dies, so failover routing
needs no recomputation.

No counterpart in /root/reference (single-process crawler); the
algorithm is the published HRW scheme.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rendezvous_shards"]


def rendezvous_shards(
    df: DataFrame,
    key_col: str = "host",
    shard_ids: Sequence[int] | int = 16,
    salt: str = "",
) -> DataFrame:
    """Append ``shard`` (HRW winner) and ``backup`` (runner-up) columns.

    ``shard_ids`` is the LIVE shard set — an int K means ``range(K)``;
    an explicit sequence lets callers drop dead shards (the rendezvous
    property guarantees surviving assignments don't move).  With a
    single live shard ``backup`` is NULL.
    """
    if isinstance(shard_ids, int):
        shard_ids = range(shard_ids)
    ids = sorted(set(int(s) for s in shard_ids))
    if not ids:
        raise ValueError("rendezvous_shards: empty shard set")
    key = F.col(key_col).cast("string")
    weights = F.array(
        *[
            F.struct(
                F.md5(F.concat(key, F.lit(f":{s}{salt}"))).alias("w"),
                F.lit(s).alias("s"),
            )
            for s in ids
        ]
    )
    top = F.reverse(F.array_sort(weights))
    out = df.withColumn("_hrw", top)
    return out.select(
        *df.columns,
        F.element_at(F.col("_hrw"), 1)["s"].alias("shard"),
        (
            F.element_at(F.col("_hrw"), 2)["s"]
            if len(ids) > 1
            else F.lit(None).cast("int")
        ).alias("backup"),
    )
