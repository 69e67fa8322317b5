"""Streaming document-level exact dedup: the Structured-Streaming twin of
``operators/dedup.py:exact_duplicates``.

A continuous ingest pipeline (streaming/ingest.py) sees the same document
arrive more than once — re-crawls, mirror hosts, republished feeds. This
module fingerprints each interleaved document's TEXT content (media spans
excluded — a re-encoded image must not make the same text look novel) and
keeps the first arrival per fingerprint using the built-in watermarked
streaming dedup operator (``dropDuplicatesWithinWatermark``), so state is
BOUNDED: a fingerprint older than the watermark delay is evicted from the
state store instead of accumulating forever.

Semantics at 100 TB: duplicates arriving within ``delay`` of each other
are suppressed exactly-once (state-store backed, restart-safe via the
checkpoint); a duplicate arriving later than ``delay`` after the original
is re-emitted — the batch dedup pass (exact_duplicates / the clustering
in operators/graph.py) is the downstream backstop, exactly as the
streaming URL first-seen filter (streaming/stateful.py) backstops onto
the batch seen-set anti-join. Bounded streaming state + exact batch
reconcile is the standard split; an unbounded exact streaming state would
hold one row per distinct document ever seen.

Reference analogue: the upload-time duplicate guard
(/root/reference/src/dynamic_indexer.py — content-hash check before
delta-index insert), re-expressed as a declarative streaming plan.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["document_fingerprint", "dedup_documents_stream"]


def document_fingerprint(doc_df: DataFrame) -> DataFrame:
    """Add a ``fingerprint`` column: md5 of the document's text spans,
    joined in span order with a separator that cannot be confused with
    span-internal whitespace. Pure Catalyst (works on batch AND streaming
    frames — the parity test runs the same expression both ways)."""
    text = F.array_join(
        F.transform(
            F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text")),
            lambda s: s["text"],
        ),
        "\x1f",
    )
    return doc_df.withColumn("fingerprint", F.md5(text))


def dedup_documents_stream(
    doc_stream: DataFrame,
    delay: str = "5 minutes",
    event_time_col: str = "ingest_time",
) -> DataFrame:
    """First arrival per content fingerprint over a document stream.

    Adds processing-time ``ingest_time`` (file sources carry no event
    time), watermarks it by ``delay``, and applies the built-in
    ``dropDuplicatesWithinWatermark`` on the fingerprint — duplicate
    documents arriving within ``delay`` of the original are dropped;
    state per fingerprint is evicted once the watermark passes it, so
    streaming state is bounded by the arrival rate × delay window, not
    by corpus size.
    """
    d = document_fingerprint(doc_stream).withColumn(
        event_time_col, F.current_timestamp()
    )
    return d.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )
