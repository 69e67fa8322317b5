"""Partitioned bloom-filter URL-seen set.

Reference analogue: the duplicate-doc membership check
``if doc_id in forward_index: continue`` (/root/reference/src/index.py:62-63)
— a driver-side dict. At 10^10 URLs that set cannot live on one machine, so:

* ``url_seen`` — the *exact*, authoritative seen set: rows
  ``(partition int, url_id long, url string)`` hash-partitioned by
  ``pmod(xxhash64(url), P)``. Stored sorted within partition.
* ``filter_state`` — one bloom bitset per partition:
  ``(partition int, bitset binary)``, built/probed with NumPy bit ops inside
  ``applyInPandas`` (Arrow-batched; Spark's own df.stat bloom filter is
  driver-side and unusable as 10^10-row partitioned state).

Probe protocol (keeps the seen check EXACT, which the north_rule requires —
a bloom alone cannot): bloom-negative rows are *definitely new* and skip the
expensive path entirely; only bloom-positive rows are confirmed against
``url_seen`` with a co-partitioned ``left_anti`` join. At scale the bloom
eliminates ~all of the anti-join probe volume for genuinely-new URLs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MIX = 0x9E3779B97F4A7C15  # splitmix64 odd constant
_GOLD = 0xBF58476D1CE4E5B9


def touched_state(new_urls: DataFrame, state: DataFrame) -> DataFrame:
    """State rows for the partitions ``new_urls`` actually touches — a
    broadcast semi-join on the tiny distinct-partition set. Shared by the
    bloom and cuckoo ``insert_delta`` paths (one derivation to maintain)."""
    touched = new_urls.select("partition").distinct()
    return state.join(F.broadcast(touched), "partition", "left_semi")


def with_partition(df: DataFrame, n_partitions: int, url_col: str = "url") -> DataFrame:
    """Add the seen-set partition column (same formula everywhere)."""
    return df.withColumn(
        "partition", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_partitions)).cast("int")
    )


def _bit_positions(url_ids: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions per url_id; double hashing h1 + i*h2 (Kirsch-
    Mitzenmacher), pure uint64 NumPy — vectorized over the Arrow batch."""
    u = url_ids.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = (u * np.uint64(_MIX)) % np.uint64(m_bits)
        h2 = ((u ^ (u >> np.uint64(27))) * np.uint64(_GOLD)) % np.uint64(m_bits) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return (h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)


class BloomSeenFilter:
    """Per-partition bloom bitsets manipulated in applyInPandas."""

    def __init__(self, n_partitions: int = 8, m_bits: int = 1 << 20, k: int = 5):
        if m_bits % 8 != 0 or m_bits <= 0:
            # empty_state sizes the bitset as m_bits // 8 BYTES while
            # _bit_positions generates positions up to m_bits - 1: a
            # non-multiple-of-8 would IndexError inside applyInPandas —
            # fail here with an actionable message instead
            raise ValueError(f"bloom m_bits must be a positive multiple of 8, got {m_bits}")
        if k < 1:
            raise ValueError(f"bloom k must be >= 1, got {k}")
        self.n_partitions = n_partitions
        self.m_bits = m_bits
        self.k = k

    def state_bytes(self) -> int:
        """Per-partition blob size — the resume geometry guard compares the
        committed state against this."""
        return self.m_bits // 8

    def empty_state(self, spark: SparkSession) -> DataFrame:
        # zero bitsets built JVM-side (unhex(repeat)) — shipping megabytes of
        # zeros through py4j serialization is pure overhead
        n_bytes = self.m_bits // 8
        return spark.range(self.n_partitions).select(
            F.col("id").cast("int").alias("partition"),
            F.unhex(F.repeat(F.lit("00"), n_bytes)).alias("bitset"),
        )

    def probe(self, candidates: DataFrame, state: DataFrame) -> DataFrame:
        """candidates(partition, url, url_id, ...) → + maybe_seen boolean.

        Co-grouped per partition: each task touches exactly one bitset —
        the probe never shuffles the bitsets to more than one task each.
        """
        m_bits, k = self.m_bits, self.k
        # copy — StructType.add mutates in place, which would corrupt the
        # candidates DataFrame's cached schema
        out_schema = T.StructType(list(candidates.schema.fields)).add(
            "maybe_seen", T.BooleanType()
        )

        def _probe(cand: pd.DataFrame, st: pd.DataFrame) -> pd.DataFrame:
            if cand.empty:
                return cand.assign(maybe_seen=np.zeros(0, dtype=bool))
            if st.empty:
                # a candidate partition with NO filter state means the
                # candidates were partitioned under a different geometry
                # than the committed filter — returning maybe_seen=False
                # here would silently re-admit already-seen URLs, the one
                # failure this module must never allow quietly
                raise ValueError(
                    "bloom probe: no filter state for partition "
                    f"{int(cand['partition'].iloc[0])} — candidate "
                    "partitioning does not match the committed filter "
                    "geometry (seen_partitions mismatch?)"
                )
            bits = np.unpackbits(
                np.frombuffer(bytes(st["bitset"].iloc[0]), dtype=np.uint8)
            )
            pos = _bit_positions(cand["url_id"].to_numpy(), m_bits, k)
            return cand.assign(maybe_seen=bits[pos].all(axis=1))

        return (
            candidates.groupBy("partition")
            .cogroup(state.groupBy("partition"))
            .applyInPandas(_probe, schema=out_schema)
        )

    def insert(self, new_urls: DataFrame, state: DataFrame) -> DataFrame:
        """Return the updated filter_state with new url_ids OR'd in.

        Partitions with no new rows pass their bitset through untouched, so
        the output is a complete state table (checkpointable as-is).
        """
        m_bits, k = self.m_bits, self.k
        n_bytes = m_bits // 8

        def _insert(cand: pd.DataFrame, st: pd.DataFrame) -> pd.DataFrame:
            if st.empty:
                # the state table is COMPLETE by construction (empty_state
                # seeds every partition; insert passes untouched partitions
                # through) — a candidate partition with no state row means
                # mismatched geometry. Fabricating a fresh bitset here
                # would write corrupt extra-partition state that MASKS the
                # mismatch from future probes; fail loudly like probe().
                raise ValueError(
                    "bloom insert: no filter state for partition "
                    f"{int(cand['partition'].iloc[0])} — candidate "
                    "partitioning does not match the committed filter "
                    "geometry (seen_partitions mismatch?)"
                )
            part = int(st["partition"].iloc[0])
            packed = np.frombuffer(bytes(st["bitset"].iloc[0]), dtype=np.uint8)
            if cand.empty:
                return pd.DataFrame({"partition": [part], "bitset": [packed.tobytes()]})
            bits = np.unpackbits(packed)
            pos = _bit_positions(cand["url_id"].to_numpy(), m_bits, k)
            bits[pos.ravel()] = 1
            return pd.DataFrame(
                {"partition": [part], "bitset": [np.packbits(bits).tobytes()]}
            )

        return (
            new_urls.select("partition", "url_id")
            .groupBy("partition")
            .cogroup(state.groupBy("partition"))
            .applyInPandas(_insert, schema="partition int, bitset binary")
        )

    def insert_delta(self, new_urls: DataFrame, state: DataFrame) -> DataFrame:
        """Updated bitsets for TOUCHED partitions ONLY (empty when
        ``new_urls`` is empty) — the O(touched) commit path.

        ``insert`` returns the complete state table, which makes every
        round's checkpoint an O(m_bits)-write: at the DESIGN.md sizing
        (P=65,536 × ~180 KB–2 MB bitsets) that is ~12–128 GB per round,
        ~120 TB–1.2 PB of churn over a 10^4-round crawl — the one
        O(total-state) write left in the round loop. Here the state side is
        pre-filtered to the partitions that actually have new rows (a
        broadcast semi-join on the tiny distinct-partition set), so the
        cogroup reads, updates and emits only those bitsets; the effective
        table is latest-row-per-partition over the append-only deltas
        (scheduler._read_filter_state), exactly the host_state pattern.
        """
        return self.insert(new_urls, touched_state(new_urls, state))


def exact_new(
    candidates_flagged: DataFrame,
    url_seen: DataFrame,
    probe_count: int | None = None,
    broadcast_max: int = 1_000_000,
) -> DataFrame:
    """Resolve bloom 'maybe_seen' to exact newness.

    bloom-negative → new without touching url_seen; bloom-positive →
    confirmed against the exact set. Result: exactly the candidates not in
    the seen set.

    Backstop join strategy (VERDICT r3 nit 3 — the seen set must never be
    SHUFFLED for a small probe): when the caller knows the bloom-positive
    row count (``probe_count``) and it fits ``broadcast_max``, the check is
    INVERTED into two broadcast joins — ``hits = url_seen ⋉ broadcast(maybe
    urls)`` (the 10^10-row seen set is scanned but never exchanged; the
    broadcast hash filter runs inside the scan stage), then ``maybe ▷
    broadcast(hits)`` (hits ≤ probe_count rows). Zero exchanges of the seen
    set; the scan itself is bounded by compaction. When probe_count is
    unknown or over the cap (a rediscovery-heavy round), fall back to the
    plain hash anti-join, which is always correct.

    Anti-join on the URL STRING, not url_id: a 64-bit hash collision at
    10^10 URLs (birthday bound: a handful expected) would otherwise drop a
    genuinely-new URL forever. url_id remains the compact id for
    bloom/bookkeeping.
    """
    definite_new = candidates_flagged.filter(~F.col("maybe_seen"))
    maybe = candidates_flagged.filter(F.col("maybe_seen"))
    if probe_count is not None and probe_count <= broadcast_max:
        hits = url_seen.select("url").join(
            F.broadcast(maybe.select("url")), "url", "left_semi"
        )
        confirmed_new = maybe.join(F.broadcast(hits), "url", "left_anti")
    else:
        confirmed_new = maybe.join(
            url_seen.select("url"), on="url", how="left_anti"
        )
    return definite_new.unionByName(confirmed_new).drop("maybe_seen")
