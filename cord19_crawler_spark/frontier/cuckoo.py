"""Cuckoo-filter URL-seen variant — same partitioned-state interface as
BloomSeenFilter (seen.py), drop-in via SchedulerConfig.extra["filter_kind"].

Per partition: B buckets × 4 slots of 16-bit fingerprints (uint16 array
serialized as the ``bitset`` binary blob, so checkpoint plumbing is shared).
Classic two-choice placement: i1 = h mod B, i2 = i1 XOR (fp·0x5bd1e995) mod B
— XOR-relocatable, so eviction chains need only the stored fingerprint.
Deterministic eviction (slot = kick mod 4) keeps resume bit-identical.

vs bloom: supports deletion (not needed here), ~same space at 3% FPR, and
probe is two cache lines instead of k scattered bits. Probe is fully
vectorized NumPy; insert loops per NEW item only (the rare path — the hot
probe path is batch-vectorized).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FP_MIX = np.uint64(0xFF51AFD7ED558CCD)
_MUR = np.uint64(0x5BD1E995)


def _fingerprints(url_ids: np.ndarray) -> np.ndarray:
    u = url_ids.astype(np.uint64)
    with np.errstate(over="ignore"):
        f = ((u * _FP_MIX) >> np.uint64(48)).astype(np.uint16)
    return np.where(f == 0, np.uint16(1), f)  # 0 marks an empty slot


def _buckets(url_ids: np.ndarray, fps: np.ndarray, n_buckets: int):
    u = url_ids.astype(np.uint64)
    i1 = (u % np.uint64(n_buckets)).astype(np.int64)
    with np.errstate(over="ignore"):
        alt = (fps.astype(np.uint64) * _MUR) % np.uint64(n_buckets)
    i2 = (i1 ^ alt.astype(np.int64)) % n_buckets
    return i1, i2


class CuckooSeenFilter:
    """Same probe/insert/empty_state contract as BloomSeenFilter."""

    SLOTS = 4

    def __init__(self, n_partitions: int = 8, n_buckets: int = 1 << 15, max_kicks: int = 500):
        # XOR relocation (i2 = i1 ^ alt) is only an involution when the
        # bucket count is a power of two; any other size makes evicted
        # fingerprints unfindable (false negatives → exactness broken)
        if n_buckets & (n_buckets - 1) != 0 or n_buckets <= 0:
            raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
        self.n_partitions = n_partitions
        self.n_buckets = n_buckets
        self.max_kicks = max_kicks

    def state_bytes(self) -> int:
        """Per-partition blob size (uint16 table) for the resume guard."""
        return self.n_buckets * self.SLOTS * 2

    # serialized table: uint16 array (n_buckets * SLOTS)
    def empty_state(self, spark: SparkSession) -> DataFrame:
        # zero tables built JVM-side (see BloomSeenFilter.empty_state)
        from pyspark.sql import functions as F

        n_bytes = self.n_buckets * self.SLOTS * 2
        return spark.range(self.n_partitions).select(
            F.col("id").cast("int").alias("partition"),
            F.unhex(F.repeat(F.lit("00"), n_bytes)).alias("bitset"),
        )

    def _table(self, blob: bytes) -> np.ndarray:
        return np.frombuffer(blob, dtype=np.uint16).reshape(
            self.n_buckets, self.SLOTS
        )

    def probe(self, candidates: DataFrame, state: DataFrame) -> DataFrame:
        nb = self.n_buckets
        out_schema = T.StructType(list(candidates.schema.fields)).add(
            "maybe_seen", T.BooleanType()
        )

        def _probe(cand: pd.DataFrame, st: pd.DataFrame) -> pd.DataFrame:
            if cand.empty:
                return cand.assign(maybe_seen=np.zeros(0, dtype=bool))
            if st.empty:
                # mirror seen.py: a geometry mismatch must be LOUD — a
                # silent maybe_seen=False re-admits already-seen URLs
                raise ValueError(
                    "cuckoo probe: no filter state for partition "
                    f"{int(cand['partition'].iloc[0])} — candidate "
                    "partitioning does not match the committed filter "
                    "geometry (seen_partitions mismatch?)"
                )
            table = self._table(bytes(st["bitset"].iloc[0]))
            ids = cand["url_id"].to_numpy()
            fps = _fingerprints(ids)
            i1, i2 = _buckets(ids, fps, nb)
            hit = (table[i1] == fps[:, None]).any(axis=1) | (
                table[i2] == fps[:, None]
            ).any(axis=1)
            return cand.assign(maybe_seen=hit)

        return (
            candidates.groupBy("partition")
            .cogroup(state.groupBy("partition"))
            .applyInPandas(_probe, schema=out_schema)
        )

    def insert(self, new_urls: DataFrame, state: DataFrame) -> DataFrame:
        nb, slots, max_kicks = self.n_buckets, self.SLOTS, self.max_kicks

        def _insert_one(table: np.ndarray, i1: int, fp: int) -> None:
            with np.errstate(over="ignore"):
                alt = int((np.uint64(fp) * _MUR) % np.uint64(nb))
            i2 = (i1 ^ alt) % nb
            for b in (i1, i2):
                empties = np.where(table[b] == 0)[0]
                if empties.size:
                    table[b, empties[0]] = fp
                    return
            # deterministic eviction chain
            b, cur = i1, fp
            for kick in range(max_kicks):
                slot = kick % slots
                cur, table[b, slot] = int(table[b, slot]), cur
                with np.errstate(over="ignore"):
                    alt = int((np.uint64(cur) * _MUR) % np.uint64(nb))
                b = (b ^ alt) % nb
                empties = np.where(table[b] == 0)[0]
                if empties.size:
                    table[b, empties[0]] = cur
                    return
            raise RuntimeError(
                "cuckoo filter full — size n_buckets for ≤ ~95% load"
            )

        def _insert(cand: pd.DataFrame, st: pd.DataFrame) -> pd.DataFrame:
            if st.empty:
                # mirror seen.py: fabricating a fresh table for a candidate
                # partition missing from the (complete-by-construction)
                # state would write corrupt extra-partition state that masks
                # the geometry mismatch from future probes
                raise ValueError(
                    "cuckoo insert: no filter state for partition "
                    f"{int(cand['partition'].iloc[0])} — candidate "
                    "partitioning does not match the committed filter "
                    "geometry (seen_partitions mismatch?)"
                )
            part = int(st["partition"].iloc[0])
            table = self._table(bytes(st["bitset"].iloc[0])).copy()
            if not cand.empty:
                ids = cand["url_id"].to_numpy()
                fps = _fingerprints(ids)
                i1, _ = _buckets(ids, fps, nb)
                order = np.argsort(ids, kind="stable")  # deterministic order
                for j in order:
                    _insert_one(table, int(i1[j]), int(fps[j]))
            return pd.DataFrame(
                {"partition": [part], "bitset": [table.tobytes()]}
            )

        return (
            new_urls.select("partition", "url_id")
            .groupBy("partition")
            .cogroup(state.groupBy("partition"))
            .applyInPandas(_insert, schema="partition int, bitset binary")
        )

    def insert_delta(self, new_urls: DataFrame, state: DataFrame) -> DataFrame:
        """Updated tables for TOUCHED partitions only — O(touched) commit
        path, same contract as BloomSeenFilter.insert_delta (see there for
        the write-amplification math; the filter kinds stay drop-in)."""
        from .seen import touched_state

        return self.insert(new_urls, touched_state(new_urls, state))
