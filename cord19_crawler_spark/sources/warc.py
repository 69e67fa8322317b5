"""WARC (Web ARChive, ISO 28500) source — the canonical storage format of
web crawls (Common Crawl, Heritrix, wget --warc).

Same distributed-ingest shape as the tar source (sources/cord19.py): a
``binaryFile`` scan parallelizes over archive files, and an Arrow-batched
``mapInPandas`` stage parses each archive's records — record parsing is
inherently sequential WITHIN one archive (length-delimited grammar), but a
crawl corpus is millions of archives, so the parallel unit is the file.

The parser implements the minimal WARC/1.0 record grammar by hand (version
line, CRLF header block, Content-Length payload, CRLF CRLF separator) —
no external warcio dependency. Gzip'd archives (.warc.gz) are decompressed
per file (WARC gzip members are concatenated; ``gzip.decompress`` handles
multi-member streams).
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def parse_warc_records(data: bytes) -> list[tuple[dict, bytes]]:
    """Minimal WARC/1.0 parser: [(headers_lowercased, payload), ...].
    Tolerant of trailing garbage (stops at the first non-record byte)."""
    recs: list[tuple[dict, bytes]] = []
    i = 0
    n = len(data)
    while i < n:
        while data[i : i + 2] == b"\r\n":
            i += 2
        if not data[i:].startswith(b"WARC/"):
            break
        hdr_end = data.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            break
        lines = data[i:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers.get("content-length", "0"))
        payload = data[hdr_end + 4 : hdr_end + 4 + clen]
        recs.append((headers, payload))
        i = hdr_end + 4 + clen
    return recs


def read_warc(spark: SparkSession, warc_glob: str) -> DataFrame:
    """WARC archives → one row per record (WARC_SCHEMA)."""
    files = spark.read.format("binaryFile").load(warc_glob)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in WARC_SCHEMA.fields}
            for path, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                if path.endswith(".gz"):
                    blob = gzip.decompress(blob)
                for headers, payload in parse_warc_records(blob):
                    out["warc_file"].append(path)
                    out["record_id"].append(headers.get("warc-record-id"))
                    out["warc_type"].append(headers.get("warc-type"))
                    out["target_uri"].append(headers.get("warc-target-uri"))
                    out["warc_date"].append(headers.get("warc-date"))
                    out["content_type"].append(headers.get("content-type"))
                    out["content_length"].append(
                        int(headers.get("content-length", "0"))
                    )
                    out["payload"].append(payload)
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(_run, schema=WARC_SCHEMA)


def warc_responses_to_documents(warc: DataFrame) -> DataFrame:
    """WARC response records → the engine's interleaved documents table:
    one text span per response payload (UTF-8 decoded), doc_id = target
    URI. Media records (non-text content types) become media spans with
    the payload carried opaquely downstream (multimodal operators)."""
    resp = warc.filter(F.col("warc_type") == "response")
    is_text = F.col("content_type").startswith("text/")
    span = F.when(
        is_text,
        F.struct(
            F.lit("text").alias("kind"),
            F.decode(F.col("payload"), "utf-8").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        ),
    ).otherwise(
        F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.col("target_uri").alias("media_ref"),
            F.lit(0).alias("offset"),
        )
    )
    return resp.select(
        F.col("target_uri").alias("doc_id"), F.array(span).alias("spans")
    )


def read_sitemap_seeds(
    spark: SparkSession, sitemap_glob: str, default_priority: float = 0.5
) -> DataFrame:
    """sitemap.xml → frontier seed rows (url, priority) via Spark 4's
    native XML source (rowTag=url). Feeds CrawlScheduler.init_from_seeds
    directly — URLs are canonicalized and deduped there; sitemap
    <priority> (0..1) carries into the frontier priority."""
    sm = (
        spark.read.format("xml")
        .option("rowTag", "url")
        .load(sitemap_glob)
    )
    pri = (
        F.coalesce(F.col("priority").cast("double"), F.lit(default_priority))
        if "priority" in sm.columns
        else F.lit(default_priority)
    )
    return sm.filter(F.col("loc").isNotNull()).select(
        F.col("loc").cast("string").alias("url"), pri.alias("priority")
    )
