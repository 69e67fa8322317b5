"""CORD-19-style ingest sources, Spark-first.

Reference pipeline (/root/reference/src/crawler.py:84-150): stream tar
members without extraction, parse JSON, join sha→metadata, emit interleaved
span docs (title → abstract → body, capped at 50 spans,
src/crawler.py:59-82). Here:

* S1 tar scan  → ``spark.read.format("binaryFile")`` + ``mapInPandas``
  untar (each archive is one task; many archives = natural parallelism; a
  100 TB crawl lands thousands of shards, one task each).
* S2 CSV scan  → ``spark.read.csv(header=True)`` with explicit schema.
* P6 sha split → ``explode(split(sha, ';'))``.
* J1 metadata join → broadcast hash join (metadata ≪ documents).
* S3/P2 JSON parse + span extraction → ``from_json`` + array ops, all
  JVM-side; 50-span cap via ``slice``.

Output is the engine's canonical ``documents`` table (input_hint shape):
(doc_id string, spans array<struct<kind,text,media_ref,offset>>).
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# CORD-19 document_parses JSON shape (the fields the reference reads,
# src/crawler.py:59-82)
CORD19_JSON_SCHEMA = T.StructType(
    [
        T.StructField("paper_id", T.StringType()),
        T.StructField(
            "metadata", T.StructType([T.StructField("title", T.StringType())])
        ),
        T.StructField(
            "abstract",
            T.ArrayType(T.StructType([T.StructField("text", T.StringType())])),
        ),
        T.StructField(
            "body_text",
            T.ArrayType(T.StructType([T.StructField("text", T.StringType())])),
        ),
    ]
)

_TAR_OUT_SCHEMA = T.StructType(
    [
        T.StructField("member_name", T.StringType()),
        T.StructField("json_str", T.StringType()),
    ]
)


def read_tar_json_members(spark: SparkSession, tar_glob: str) -> DataFrame:
    """S1: stream ``*.json`` members out of tar/tar.gz archives without
    extraction. One Arrow batch per archive; the tarfile is read in
    streaming mode (``r|*``) exactly like the reference
    (src/crawler.py:106), but per-archive tasks run cluster-wide."""
    bins = spark.read.format("binaryFile").load(tar_glob)

    def _untar(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                names, bodies = [], []
                with tarfile.open(
                    fileobj=io.BytesIO(row["content"]), mode="r|*"
                ) as tf:
                    for member in tf:
                        if not member.isfile() or not member.name.endswith(".json"):
                            continue
                        f = tf.extractfile(member)
                        if f is None:
                            continue
                        # strip both '.json' and '.xml' so PMC parse members
                        # ('PMC35282.xml.json') normalize to the pmcid key,
                        # matching the reference (src/crawler.py:111)
                        base = os.path.basename(member.name)
                        names.append(base.replace(".json", "").replace(".xml", ""))
                        bodies.append(f.read().decode("utf-8", errors="replace"))
                yield pd.DataFrame({"member_name": names, "json_str": bodies})

    return bins.select("content").mapInPandas(_untar, schema=_TAR_OUT_SCHEMA)


def read_metadata_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2: metadata.csv scan (header, the columns the reference consumes).

    ``multiLine=True`` + quote escaping: CORD-19 abstracts/titles contain
    embedded newlines inside quoted fields — without it each physical line
    parses as a record and those rows shred into garbage mappings."""
    return (
        spark.read.option("multiLine", True)
        .option("escape", '"')
        .csv(path, header=True)
        .select("cord_uid", "sha", "pmcid", "title", "abstract")
    )


def sha_lookup(metadata: DataFrame) -> DataFrame:
    """P6: one row per parse-file key. The reference registers BOTH the
    ';'-split shas AND the pmcid for every paper (src/crawler.py:93-95:
    ``meta_lookup[s.strip()] = row`` and ``meta_lookup[row['pmcid']] =
    row``), so PMC-only papers resolve too. explode(split) ∪ pmcid rows;
    blanks dropped. A key claimed by several papers keeps ONE row like the
    reference dict — but deterministically (min cord_uid), a deliberate
    difference: the reference's ``meta_lookup[key] = row`` keeps whichever
    row the CSV iteration saw last, which has no distributed analogue."""
    sha_rows = metadata.select(
        F.explode(F.split(F.col("sha"), ";")).alias("key_raw"),
        "cord_uid",
        "title",
    )
    pmc_rows = metadata.select(
        F.col("pmcid").alias("key_raw"), "cord_uid", "title"
    )
    keys = (
        sha_rows.unionByName(pmc_rows)
        .select(F.trim(F.col("key_raw")).alias("sha"), "cord_uid", "title")
        .filter(F.col("sha").isNotNull() & (F.col("sha") != ""))
    )
    first = keys.groupBy("sha").agg(
        F.min(F.struct("cord_uid", "title")).alias("m")
    )
    return first.select("sha", F.col("m.cord_uid").alias("cord_uid"), F.col("m.title").alias("title"))


def parse_and_join(tar_docs: DataFrame, metadata: DataFrame) -> DataFrame:
    """S3 + J1: JSON parse + metadata join on sha=member name.

    No broadcast hint: the metadata lookup is DOC-count-scale (1M rows for
    CORD-19, unbounded for a web corpus) — Catalyst/AQE broadcast it only
    while its measured size is under the threshold, else co-shuffle on sha
    (both sides are doc-scale, so SMJ is the honest plan at 100 TB)."""
    parsed = tar_docs.withColumn(
        "doc", F.from_json(F.col("json_str"), CORD19_JSON_SCHEMA)
    )
    joined = parsed.join(
        sha_lookup(metadata),
        parsed.member_name == F.col("sha"),
        "inner",
    ).select("cord_uid", "title", "doc", "member_name")
    # one document per paper: a paper with several parses (pdf sha + pmc
    # file) must not yield duplicate doc_ids — the reference skips dups
    # ('if doc_id in forward_index: continue', src/index.py:62-63). Keep the
    # lexicographically-first parse (deterministic; the reference keeps tar
    # arrival order). Window partitioned by cord_uid — shuffles on the doc
    # key, no global sort.
    from pyspark.sql import Window

    w = Window.partitionBy("cord_uid").orderBy("member_name")
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("cord_uid", "title", "doc")
    )


def to_interleaved_documents(joined: DataFrame, span_cap: int = 50) -> DataFrame:
    """P2: the reference's extract_text order — title, then abstract spans,
    then body spans, truncated at 50 (src/crawler.py:59-82) — as pure array
    expressions, emitting the input_hint documents shape."""
    title_span = F.array(
        F.struct(
            F.lit("title").alias("kind"),
            F.coalesce(F.col("doc.metadata.title"), F.col("title")).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
        )
    )
    abstract_spans = F.transform(
        F.coalesce(F.col("doc.abstract"), F.array()),
        lambda s: F.struct(
            F.lit("abstract").alias("kind"),
            s["text"].alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
        ),
    )
    body_spans = F.transform(
        F.coalesce(F.col("doc.body_text"), F.array()),
        lambda s: F.struct(
            F.lit("body").alias("kind"),
            s["text"].alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
        ),
    )
    all_spans = F.slice(
        F.concat(title_span, abstract_spans, body_spans), 1, span_cap
    )
    with_offsets = F.transform(
        all_spans,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return joined.select(
        F.col("cord_uid").alias("doc_id"), with_offsets.alias("spans")
    )


def ingest_cord19(
    spark: SparkSession, tar_glob: str, metadata_csv: str, span_cap: int = 50
) -> DataFrame:
    """Full S1→S2→P6→J1→S3→P2 pipeline: tar archives + metadata.csv →
    interleaved documents table."""
    tar_docs = read_tar_json_members(spark, tar_glob)
    meta = read_metadata_csv(spark, metadata_csv)
    return to_interleaved_documents(parse_and_join(tar_docs, meta), span_cap)


def write_corpus_csv(documents: DataFrame, path: str, span_cap: int = 50) -> None:
    """S7 CSV corpus sink: flatten the interleaved documents table to one
    CSV row per document (doc_id, n_spans, text) — the reference's cleaned
    CSV corpus export (its pipeline writes processed text back out as CSV).
    Text spans are joined in span order; quoting/escaping is Spark's CSV
    writer (header on). Distributed write: one file per partition."""
    flat = documents.select(
        F.col("doc_id"),
        F.size("spans").alias("n_spans"),
        F.array_join(
            F.transform(
                F.filter(
                    F.slice(F.col("spans"), 1, span_cap),
                    # text-bearing spans: WARC docs use kind='text', cord19
                    # docs use title/abstract/body — everything except media
                    # spans (which carry no text) is corpus text
                    lambda s: (s["kind"] != "media") & s["text"].isNotNull(),
                ),
                lambda s: s["text"],
            ),
            " ",
        ).alias("text"),
    )
    flat.write.mode("overwrite").option("header", True).csv(path)
