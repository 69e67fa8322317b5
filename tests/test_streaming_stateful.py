"""applyInPandasWithState first-seen dedup: duplicates dropped within a
batch, and state survives a restart (checkpointed) so duplicates across
separate runs are dropped too."""

from pyspark.sql import functions as F

from cord19_crawler_spark.streaming.ingest import (
    discovered_links_stream,
    read_document_stream,
)
from cord19_crawler_spark.streaming.stateful import first_seen_urls


def _run_once(spark, in_dir, out_dir, ckpt):
    links = discovered_links_stream(read_document_stream(spark, in_dir)).select(
        "url", "url_id", "host"
    )
    novel = first_seen_urls(links, n_partitions=4)
    q = (
        novel.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def test_first_seen_dedup_across_restarts(spark, tmp_path):
    from cord19_crawler_spark.datagen import generate_documents

    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    # docs 0..59 — link targets overlap heavily between docs
    generate_documents(spark, 60, partitions=2).write.mode("append").parquet(in_dir)
    _run_once(spark, in_dir, out_dir, ckpt)
    got1 = spark.read.parquet(out_dir)
    n1 = got1.count()
    # within-run dedup: each canonical URL exactly once
    assert n1 == got1.select("url").distinct().count()
    assert n1 > 0

    # restart with NEW docs whose links overlap the first batch's
    more = generate_documents(spark, 120, partitions=2).filter(F.col("doc_id") >= 60)
    more.write.mode("append").parquet(in_dir)
    _run_once(spark, in_dir, out_dir, ckpt)
    got2 = spark.read.parquet(out_dir)
    # still globally unique: state was restored from the checkpoint
    assert got2.count() == got2.select("url").distinct().count()
    assert got2.count() > n1  # new URLs did flow through
