"""Posting-list compression kernels: gap encoding + VarByte.

Reference (/root/reference/src/barreled_index.py:9-108): VarByte with the
continuation bit on the LAST byte, gap-encoded doc ids, mean-centered
frequency deltas. The reference has a real bug (C4): negative deltas
(freq < mean) are silently corrupted because ``varbyte_encode_num`` maps
n<0 through ``n % 128``. We do NOT replicate the bug — signed values are
ZigZag-mapped (n → 2n if n≥0 else -2n-1) before VarByte, so round-trips are
exact for all inputs (test_compression.py covers the reference's failing
cases).

In the engine these kernels exist for checkpoint blobs and bit-compat needs;
columnar storage relies on Parquet's DELTA_BINARY_PACKED + dictionary + zstd
(same idea, engine-native — SURVEY.md §2.8). The DataFrame-level analogues
(gap via ``lag`` window, prefix-sum decode) are in :func:`gap_encode_df` /
:func:`prefix_sum_decode_df` and are oracle-checkable SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# -- scalar/numpy kernels ----------------------------------------------------


def zigzag_encode(n: np.ndarray | int):
    n = np.asarray(n, dtype=np.int64)
    return ((n << 1) ^ (n >> 63)).astype(np.uint64)


def zigzag_decode(z: np.ndarray | int):
    z = np.asarray(z, dtype=np.uint64)
    return ((z >> np.uint64(1)) ^ (~(z & np.uint64(1)) + np.uint64(1))).astype(np.int64)


def varbyte_encode(values) -> bytes:
    """VarByte with stop-bit on the last byte of each number (reference
    layout, src/barreled_index.py:9-25), over ZigZag-mapped signed ints."""
    out = bytearray()
    for z in zigzag_encode(np.asarray(values, dtype=np.int64)):
        z = int(z)
        chunk = []
        while True:
            chunk.insert(0, z % 128)
            z //= 128
            if z == 0:
                break
        chunk[-1] += 128  # stop bit on last byte
        out.extend(chunk)
    return bytes(out)


def varbyte_decode(buf: bytes) -> list[int]:
    nums, cur = [], 0
    for byte in buf:
        if byte >= 128:
            cur = cur * 128 + (byte - 128)
            nums.append(cur)
            cur = 0
        else:
            cur = cur * 128 + byte
    return list(zigzag_decode(np.asarray(nums, dtype=np.uint64)))


def gap_encode(doc_ids: list[int]) -> list[int]:
    """First absolute, then deltas (src/barreled_index.py:63-73); input must
    be sorted ascending."""
    arr = np.asarray(doc_ids, dtype=np.int64)
    if arr.size == 0:
        return []
    return [int(arr[0])] + np.diff(arr).tolist()


def gap_decode(gaps: list[int]) -> list[int]:
    return np.cumsum(np.asarray(gaps, dtype=np.int64)).tolist()


def compress_posting_list(doc_ids: list[int], freqs: list[int] | None = None) -> bytes:
    """Gap + ZigZag-VarByte; freqs stored as mean-centered deltas like the
    reference (src/barreled_index.py:80-92) but losslessly."""
    import struct

    ids = sorted(doc_ids)
    gaps_blob = varbyte_encode(gap_encode(ids))
    out = struct.pack("<I", len(gaps_blob)) + gaps_blob
    if freqs is not None:
        order = np.argsort(np.asarray(doc_ids, dtype=np.int64), kind="stable")
        f = np.asarray(freqs, dtype=np.int64)[order]
        mean = float(f.mean()) if f.size else 0.0
        deltas = (f - int(mean)).tolist()
        fblob = varbyte_encode(deltas)
        out += struct.pack("<d", mean) + struct.pack("<I", len(fblob)) + fblob
    return out


def decompress_posting_list(blob: bytes) -> tuple[list[int], list[int] | None]:
    import struct

    glen = struct.unpack_from("<I", blob, 0)[0]
    gaps = varbyte_decode(blob[4 : 4 + glen])
    ids = gap_decode(gaps)
    off = 4 + glen
    if off >= len(blob):
        return ids, None
    mean = struct.unpack_from("<d", blob, off)[0]
    flen = struct.unpack_from("<I", blob, off + 8)[0]
    deltas = varbyte_decode(blob[off + 12 : off + 12 + flen])
    freqs = [int(d + int(mean)) for d in deltas]
    return ids, freqs


# -- DataFrame-level operators (Arrow-batched / pure SQL) ---------------------

_ENC_SCHEMA = T.StructType(
    [
        T.StructField("word", T.StringType()),
        T.StructField("blob", T.BinaryType()),
        T.StructField("n_docs", T.IntegerType()),
    ]
)


def compress_postings_df(postings: DataFrame) -> DataFrame:
    """(word, doc_int_id, tf) → (word, blob, n_docs): per-word compressed
    posting blobs, built inside applyInPandas (NumPy, Arrow batches)."""

    def _compress(pdf: pd.DataFrame) -> pd.DataFrame:
        word = pdf["word"].iloc[0]
        # compress_posting_list owns the doc-id ordering (it sorts ids and
        # aligns freqs itself) — pre-sorting here would just triple the
        # sort work per word
        blob = compress_posting_list(
            pdf["doc_int_id"].tolist(), pdf["tf"].tolist()
        )
        return pd.DataFrame(
            {"word": [word], "blob": [blob], "n_docs": [len(pdf)]}
        )

    return postings.groupBy("word").applyInPandas(_compress, schema=_ENC_SCHEMA)


def gap_encode_df(postings: DataFrame) -> DataFrame:
    """C3 as a window: per-word doc-id gaps via lag (SQL-expressible)."""
    w = Window.partitionBy("word").orderBy("doc_id")
    return postings.select(
        "word",
        "doc_id",
        (F.col("doc_id") - F.coalesce(F.lag("doc_id").over(w), F.lit(0))).alias("gap"),
    )


def prefix_sum_decode_df(gaps: DataFrame) -> DataFrame:
    """C6 inverse: running sum of gaps restores doc ids."""
    w = (
        Window.partitionBy("word")
        .orderBy("gap_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return gaps.select("word", "gap_seq", F.sum("gap").over(w).alias("doc_id"))


def elias_fano_encode_df(postings: DataFrame) -> DataFrame:
    """Elias-Fano encoding of per-word sorted doc-id lists (Vigna,
    'Quasi-succinct indices', WSDM 2013) — the modern successor to the
    reference's gap+VarByte scheme (src/barreled_index.py:63-92): n ids
    over universe U cost n*(l + 2) + o(n) bits with l = floor(log2(U/n)),
    and unlike VarByte the high-bit stream supports O(1) skip/select.

    Pinned semantics (oracle-replayable, integer-only — NO floating
    log2, whose floor is FP-fragile across engines):

      U   = global max doc_id + 1 (one broadcast row)
      n_w = the word's posting count
      l_w = bit_length(U // n_w) - 1          (>= 0 since n_w <= U)
      low  = doc_id & (2^l - 1)     high = doc_id >> l
      high_delta = high - previous high (first: high itself) — the gaps
      that the bit-level layout would unary-code.

    Returns (word, idx, l, low, high_delta); decode is
    doc_id = (cumsum(high_delta) << l) | low (round-trip test-pinned).

    Scale shape: U is ONE 1-row broadcast aggregate; n_w one map-side-
    partial count joined back on the vocabulary-sized word key; the
    lag/rank windows partition per word — the same skew profile as
    ``gap_encode_df`` (hot words bound a partition; barrel partitioning
    upstream is the standard guard, operators/barrels.py).
    """
    u = postings.agg((F.max("doc_id") + 1).alias("_u"))
    nl = postings.groupBy("word").agg(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy("word").orderBy("doc_id")
    rows = (
        postings.join(nl, "word")
        .crossJoin(F.broadcast(u))
        .withColumn(
            # integer division (div), matching the DuckDB oracle's u // n
            # and the docstring's integer-only pin: float division +
            # truncation can round a quotient near the 2^53 double
            # boundary UP and drift l by 1 cross-engine (r5 ADVICE; same
            # precedent as plan_compaction's `div`)
            "_l",
            (F.length(F.bin(F.expr("_u div _n"))) - 1).cast("int"),
        )
        .withColumn(
            "_pow", F.expr("shiftleft(CAST(1 AS BIGINT), _l)")
        )
        .withColumn("idx", (F.row_number().over(w) - 1).cast("int"))
        .withColumn("low", F.col("doc_id") % F.col("_pow"))
        .withColumn(
            "_high", F.expr("shiftright(doc_id, _l)").cast("long")
        )
    )
    return rows.select(
        "word",
        "idx",
        F.col("_l").alias("l"),
        F.col("low").cast("long").alias("low"),
        (
            F.col("_high")
            - F.coalesce(F.lag("_high").over(w), F.lit(0).cast("long"))
        ).alias("high_delta"),
    )


def elias_fano_decode_df(encoded: DataFrame) -> DataFrame:
    """Inverse of :func:`elias_fano_encode_df`:
    doc_id = (running_sum(high_delta) << l) + low — the prefix-sum
    restores the high stream, the shift re-attaches the low bits.
    Round-trip equality with the input postings is test-pinned."""
    w = (
        Window.partitionBy("word")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        encoded.withColumn("_hsum", F.sum("high_delta").over(w))
        .select(
            "word",
            "idx",
            (F.expr("shiftleft(_hsum, l)") + F.col("low")).alias("doc_id"),
        )
    )
