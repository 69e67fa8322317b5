"""Compaction is a pure read optimization: a crawl with a mid-run compaction
must be bit-identical to one without."""

from cord19_crawler_spark.datagen import generate_documents, seed_urls
from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig


def _cfg():
    return SchedulerConfig(batch_size=20, seen_partitions=4, bloom_bits=1 << 16,
                           min_delay_rounds=2, max_in_flight=3)


def test_compaction_bit_identical(spark, tmp_path):
    docs = generate_documents(spark, 300, partitions=4).cache()

    plain = CrawlScheduler(spark, docs, str(tmp_path / "plain"), _cfg())
    plain.run(5, seeds=seed_urls(spark, 10, 300))

    comp = CrawlScheduler(spark, docs, str(tmp_path / "comp"), _cfg())
    comp.run(2, seeds=seed_urls(spark, 10, 300))
    assert comp.compact() == 2
    comp.run(5)  # rounds 3-5 read through the compaction snapshot

    assert comp.crawl_order() == plain.crawl_order()
    assert comp.seen_set() == plain.seen_set()
    # derived pending matches too
    p1 = sorted(r["url"] for r in plain.pending_frontier().collect())
    p2 = sorted(r["url"] for r in comp.pending_frontier().collect())
    assert p1 == p2

    # resume AFTER compaction from a fresh scheduler object also identical
    resumed = CrawlScheduler(spark, docs, str(tmp_path / "comp"), _cfg())
    assert resumed.crawl_order() == plain.crawl_order()
    more_r = resumed.run(6)
    more_p = plain.run(6)
    assert more_r == more_p
