"""Streaming→batch loop: externally-discovered URLs merge into the frontier
as a committed round and get scheduled later; duplicates vs seen dropped."""

from cord19_crawler_spark.datagen import (
    canonical_url,
    generate_documents,
    messy_url,
    seed_urls,
)
from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig


def test_merge_discoveries_roundtrip(spark, tmp_path):
    docs = generate_documents(spark, 300, partitions=2).cache()
    cfg = SchedulerConfig(batch_size=20, seen_partitions=4, bloom_bits=1 << 16,
                          min_delay_rounds=1, max_in_flight=5)
    s = CrawlScheduler(spark, docs, str(tmp_path / "m"), cfg)
    s.run(2, seeds=seed_urls(spark, 5, 300))
    seen_before = s.seen_set()

    # externally discovered: one already-seen, one messy-new, one garbage
    fresh_target = next(t for t in range(300) if canonical_url(t) not in seen_before)
    ext = spark.createDataFrame(
        [
            (sorted(seen_before)[0],),                       # duplicate
            (messy_url(fresh_target, 1),),  # mixed-case host + fragment
            ("not a url",),
        ],
        "url string",
    )
    c = s.merge_discoveries(ext, priority=9.0)
    assert c["merge_only"] and c["scheduled"] == 0
    assert c["discovered_new"] == 1
    assert canonical_url(fresh_target) in s.seen_set()

    # merged URL has top priority → scheduled first in the next round
    nxt = s.store.latest_round() + 1
    s.run(nxt)
    round_urls = [u for r, _, u in s.crawl_order() if r == nxt]
    assert canonical_url(fresh_target) in round_urls

    # resume across a merge round is intact
    resumed = CrawlScheduler(spark, docs, str(tmp_path / "m"), cfg)
    assert resumed.crawl_order() == s.crawl_order()
