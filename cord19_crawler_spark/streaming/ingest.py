"""Structured Streaming ingest: continuous document arrival → link discovery.

The batch scheduler (frontier/scheduler.py) is the determinism-critical
path; this module is the streaming front door for CONTINUOUS ingest — new
document files landing in a directory are discovered, their links extracted
and canonicalized, and appended to a discoveries sink which the next
scheduling round merges. Reference analogue: the incremental delta-index
upsert (/root/reference/src/dynamic_indexer.py:58-106) that makes new docs
searchable without rebuilding static barrels.

Patterns used: ``readStream`` file source with schema, Arrow-UDF transform,
``writeStream`` with checkpointing (exactly-once file sink),
``Trigger.AvailableNow`` for drain-then-stop semantics, and a watermarked
event-time windowed aggregation for discovery-rate metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen import DOC_SCHEMA
from ..functions.urls import extract_canonical_urls, host_from_canonical


def read_document_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of interleaved-span documents (input_hint shape)."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def discovered_links_stream(doc_stream: DataFrame, span_cap: int = 50) -> DataFrame:
    """Streaming link discovery: spans → fused extract+canonicalize →
    (url, host, url_id, src_doc_id, discovered_at)."""
    spans = doc_stream.select(
        "doc_id", F.explode(F.slice(F.col("spans"), 1, span_cap)).alias("span")
    )
    links = spans.select(
        F.col("doc_id").alias("src_doc_id"),
        F.explode(extract_canonical_urls(F.col("span.text"))).alias("url"),
    )
    return links.select(
        "url",
        host_from_canonical(F.col("url")).alias("host"),
        F.xxhash64(F.col("url")).alias("url_id"),
        "src_doc_id",
        F.current_timestamp().alias("discovered_at"),
    )


def run_ingest_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    span_cap: int = 50,
) -> None:
    """Drain all currently-available files into the discoveries sink, then
    stop. Exactly-once via the streaming file-sink commit log + checkpoint;
    re-running after new files land processes ONLY the new files (the
    incremental-ingest semantics the frontier merge needs).

    ``span_cap`` MUST match the crawl's ``SchedulerConfig.span_cap`` —
    streaming and batch walking different span prefixes would make
    streaming-discovered links diverge from what a batch-only crawl could
    ever find (batch/streaming equivalence)."""
    links = discovered_links_stream(
        read_document_stream(spark, input_dir), span_cap=span_cap
    )
    q = (
        links.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def discovery_rate(
    spark: SparkSession,
    input_dir: str,
    window: str = "10 seconds",
    span_cap: int = 50,
) -> DataFrame:
    """Watermarked event-time windowed discovery-rate aggregation (late data
    beyond 30s dropped) — returns the streaming DF; caller starts the sink.
    ``span_cap`` must match the ingest/crawl cap (SchedulerConfig.span_cap)
    so the metrics count exactly the links the crawl can discover."""
    links = discovered_links_stream(
        read_document_stream(spark, input_dir), span_cap=span_cap
    )
    return (
        links.withWatermark("discovered_at", "30 seconds")
        .groupBy(F.window("discovered_at", window), F.col("host"))
        .agg(F.count(F.lit(1)).alias("n_urls"))
    )


def session_windows_stream(
    spark: SparkSession,
    events_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization via native session windows: watermarked
    event-time gap sessions per user. Late events beyond the watermark are
    dropped; closed sessions emit exactly once in append mode. The batch
    twin (driver query ``events_session_window``) is DuckDB-oracle-checked;
    this is the same aggregation compiled as a streaming plan."""
    ev = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string"
    ).parquet(events_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
