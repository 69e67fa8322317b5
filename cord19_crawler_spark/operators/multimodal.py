"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media (image/audio/video) travel as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The image/audio codec libraries are NOT in this
container, so the decode kernels are STUBS behind a try-import: the Spark
side — schema, partitioning, UDF signatures, batch shapes — is real and
tested; ``decode_mode="fake"`` produces deterministic hash-derived outputs so
downstream stages (and tests) exercise true end-to-end plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_status", T.StringType()),
    ]
)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Extract media spans from the interleaved documents table into the
    typed media table; payload synthesized deterministically from the ref
    (a real crawler would fill ``content`` from the fetch response)."""
    media = docs.select(
        "doc_id", F.explode("spans").alias("span")
    ).filter(F.col("span.kind") == "media")
    return media.select(
        "doc_id",
        F.col("span.media_ref").alias("media_ref"),
        F.lit("image").alias("kind"),
        F.encode(F.col("span.media_ref"), "utf-8").cast("binary").alias("content"),
        F.struct(
            F.lit("image/png").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-feature from the payload hash (stand-in for a
    real decode+embed kernel; same shape/dtype contract).

    Per-dimension kernel is the repo's md5-56bit hash (functions/hashes.py)
    of ``payload || ':' || dim`` scaled to [-1, 1) — cross-engine
    reproducible, so a DuckDB oracle can recompute the exact values:
      CAST(('0x' || substr(md5(t || ':' || i), 1, 14)) AS BIGINT) / 2^56
    """
    vals = [
        int(hashlib.md5(payload + b":%d" % i).hexdigest()[:14], 16)
        / float(1 << 56)
        * 2.0
        - 1.0
        for i in range(dim)
    ]
    return np.asarray(vals, dtype=np.float32)


def decode_and_featurize(media: DataFrame, dim: int = 16, decode_mode: str = "fake") -> DataFrame:
    """mapInPandas decode → fixed-dim feature vector.

    decode_mode='real' requires PIL/cv2 (not in this container) → raises
    NotImplementedError at plan-build time, per the stub contract.
    """
    if decode_mode == "real":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real image decode requires PIL/cv2, not available in this "
                "container; use decode_mode='fake' for plumbing tests"
            ) from e

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_feature(bytes(c) if c is not None else b"", dim).tolist()
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "feature": feats,
                    "decode_status": ["ok-fake"] * len(pdf),
                }
            )

    return media.mapInPandas(_run, schema=FEATURES_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, decode_mode: str = "fake"
) -> DataFrame:
    """mapInPandas image resize: same media schema out, meta dims updated.

    decode_mode='real' needs PIL (absent here) → NotImplementedError at
    plan-build time; 'fake' keeps the Spark plumbing real — binary in/out,
    Arrow batches, meta struct rewrite — with a deterministic stand-in
    payload (md5-56bit of original content + target dims, sized w*h/64) so
    downstream stages see size-plausible bytes."""
    if decode_mode == "real":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real image resize requires PIL, not available in this "
                "container; use decode_mode='fake' for plumbing tests"
            ) from e

    out_schema = MEDIA_SCHEMA

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = max(1, (width * height) // 64)
            contents = []
            metas = []
            for c, m in zip(pdf["content"], pdf["meta"]):
                seed = hashlib.md5(
                    (bytes(c) if c is not None else b"")
                    + b":%dx%d" % (width, height)
                ).digest()
                contents.append((seed * (n_bytes // len(seed) + 1))[:n_bytes])
                meta = dict(m) if m is not None else {}
                meta["width"], meta["height"] = width, height
                metas.append(meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "content": contents,
                    "meta": metas,
                }
            )

    return media.mapInPandas(_run, schema=out_schema)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    timestamp (payload decode stubbed — timestamps derive from meta)."""
    frames = media.filter(F.col("kind") == "video").select(
        "doc_id",
        "media_ref",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
    )
    return frames
