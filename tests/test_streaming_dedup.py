"""Streaming document dedup (streaming/dedup.py): planted duplicates are
suppressed across micro-batches, survivors match the batch distinct set,
and a checkpointed restart keeps suppressing within the watermark delay."""
import pyspark.sql.functions as F

from cord19_crawler_spark.datagen import DOC_SCHEMA, generate_documents
from cord19_crawler_spark.streaming.dedup import (
    dedup_documents_stream,
    document_fingerprint,
)


def _with_dups(spark, n=30):
    """n docs plus a duplicate of every third one under a NEW doc_id
    (same span text, different media refs — media must not defeat the
    text fingerprint)."""
    docs = generate_documents(spark, n, partitions=2)
    dups = (
        docs.filter(F.col("doc_id").cast("long") % 3 == 0)
        .withColumn("doc_id", F.concat(F.lit("dup_"), F.col("doc_id")))
        .withColumn(
            "spans",
            F.transform(
                F.col("spans"),
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    F.when(s["kind"] == "media", F.lit("mirror://other"))
                    .otherwise(s["media_ref"])
                    .alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ),
        )
    )
    return docs, dups


def test_fingerprint_ignores_media_and_matches_batch(spark):
    docs, dups = _with_dups(spark)
    fp = document_fingerprint(docs).select("doc_id", "fingerprint")
    fp_dup = document_fingerprint(dups).select("doc_id", "fingerprint")
    # every dup doc's fingerprint equals its original's
    orig = {r["doc_id"]: r["fingerprint"] for r in fp.collect()}
    for r in fp_dup.collect():
        assert r["fingerprint"] == orig[r["doc_id"].removeprefix("dup_")]


def _drain(spark, in_dir, out_dir, ckpt):
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 2)  # force several micro-batches
        .parquet(in_dir)
    )
    q = (
        dedup_documents_stream(stream, delay="10 minutes")
        .select("doc_id", "fingerprint")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).collect()


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs, dups = _with_dups(spark)
    docs.write.mode("append").parquet(in_dir)
    dups.write.mode("append").parquet(in_dir)

    got = _drain(spark, in_dir, out_dir, ckpt)
    # exactly one survivor per distinct fingerprint, matching batch distinct
    batch_distinct = document_fingerprint(docs).select("fingerprint").distinct()
    assert len(got) == batch_distinct.count()
    assert len({r["fingerprint"] for r in got}) == len(got)

    # restart on the same checkpoint with a NEW file full of dups only:
    # nothing new must be emitted (state survived the restart)
    dups.withColumn("doc_id", F.concat(F.lit("re_"), F.col("doc_id"))).write.mode(
        "append"
    ).parquet(in_dir)
    got2 = _drain(spark, in_dir, out_dir, ckpt)
    assert len(got2) == len(got)
    assert {r["fingerprint"] for r in got2} == {r["fingerprint"] for r in got}
