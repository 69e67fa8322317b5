"""Retry semantics: failed fetches re-enter pending as (url, attempt+1) with
decayed priority; retries cap at max_retries; determinism preserved."""

from pyspark.sql import functions as F

from cord19_crawler_spark.datagen import generate_documents, seed_urls
from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig


def _cfg():
    return SchedulerConfig(batch_size=15, seen_partitions=4, bloom_bits=1 << 16,
                           min_delay_rounds=1, max_in_flight=5)


def test_requeue_and_rescheduling(spark, tmp_path):
    docs = generate_documents(spark, 300, partitions=2).cache()
    s = CrawlScheduler(spark, docs, str(tmp_path / "rq"), _cfg())
    s.run(2, seeds=seed_urls(spark, 8, 300))
    order = s.crawl_order()
    failed = [u for r, _, u in order if r == 2][:3]
    failed_df = spark.createDataFrame([(u,) for u in failed], "url string")

    c = s.requeue_failures(failed_df)
    assert c["requeued"] == 3 and c["scheduled"] == 0
    # the retries are pending again at attempt 1
    pend = s.pending_frontier().filter(F.col("url").isin(failed)).collect()
    assert len(pend) == 3 and all(r["attempt"] == 1 for r in pend)
    # and get rescheduled in a later round exactly once more (decayed
    # priority → they queue behind fresh work; drain enough rounds)
    s.run(s.store.latest_round() + 10)
    sched_counts = {}
    for r, _, u in s.crawl_order():
        sched_counts[u] = sched_counts.get(u, 0) + 1
    for u in failed:
        assert sched_counts[u] == 2  # original + retry
    # everything else still scheduled exactly once
    assert all(v <= 2 for v in sched_counts.values())
    # seen set unchanged by requeue (no duplicate seen rows)
    seen = s._read_url_seen(s.store.latest_round())
    assert seen.count() == seen.select("url").distinct().count()


def test_requeue_respects_max_retries_and_is_idempotent(spark, tmp_path):
    docs = generate_documents(spark, 200, partitions=2).cache()
    s = CrawlScheduler(spark, docs, str(tmp_path / "cap"), _cfg())
    s.run(1, seeds=seed_urls(spark, 5, 200))
    url = s.crawl_order()[0][2]
    fdf = spark.createDataFrame([(url,)], "url string")
    # attempt 0 was scheduled → requeue emits attempt 1
    assert s.requeue_failures(fdf, max_retries=2)["requeued"] == 1
    # attempt 1 is still PENDING (never scheduled) → requeue is a no-op;
    # double-submitting a failure list must not insert a second frontier row
    assert s.requeue_failures(fdf, max_retries=2)["requeued"] == 0
    assert (
        s.pending_frontier().filter(F.col("url") == url).count() == 1
    )
    # drain rounds until attempt 1 gets scheduled, then requeue → attempt 2
    s.run(s.store.latest_round() + 8)
    assert s.requeue_failures(fdf, max_retries=2)["requeued"] == 1
    # attempt 2 pending → no-op; once scheduled, max_retries=2 caps attempt 3
    assert s.requeue_failures(fdf, max_retries=2)["requeued"] == 0
    s.run(s.store.latest_round() + 8)
    assert s.requeue_failures(fdf, max_retries=2)["requeued"] == 0


def test_resume_with_changed_filter_config_fails_fast(spark, tmp_path):
    import pytest

    docs = generate_documents(spark, 100, partitions=2).cache()
    ckpt = str(tmp_path / "cfg")
    s = CrawlScheduler(spark, docs, ckpt, _cfg())
    s.run(1, seeds=seed_urls(spark, 4, 100))
    # same config resumes fine
    CrawlScheduler(spark, docs, ckpt, _cfg())
    # different bloom geometry / partitioning / filter kind all fail fast
    bad = _cfg()
    bad.bloom_bits = 1 << 18
    with pytest.raises(ValueError, match="filter config"):
        CrawlScheduler(spark, docs, ckpt, bad)
    bad2 = _cfg()
    bad2.seen_partitions = 8
    with pytest.raises(ValueError, match="filter config"):
        CrawlScheduler(spark, docs, ckpt, bad2)
    bad3 = _cfg()
    bad3.extra["filter_kind"] = "cuckoo"
    with pytest.raises(ValueError, match="filter config"):
        CrawlScheduler(spark, docs, ckpt, bad3)


def test_open_adopts_committed_filter_config(spark, tmp_path):
    from cord19_crawler_spark.frontier import CrawlScheduler

    docs = generate_documents(spark, 100, partitions=2).cache()
    ckpt = str(tmp_path / "open")
    cfg = _cfg()
    cfg.bloom_bits = 1 << 17
    s = CrawlScheduler(spark, docs, ckpt, cfg)
    s.run(1, seeds=seed_urls(spark, 4, 100))
    # a fresh default config mismatches → plain constructor fails fast,
    # but open() adopts the committed geometry and resumes fine
    import pytest

    from cord19_crawler_spark.frontier import SchedulerConfig

    with pytest.raises(ValueError, match="filter config"):
        CrawlScheduler(spark, docs, ckpt, SchedulerConfig())
    caller_cfg = SchedulerConfig()
    s2 = CrawlScheduler.open(spark, docs, ckpt, caller_cfg)
    assert s2.cfg.bloom_bits == 1 << 17
    out = s2.run(2)
    assert len(out) == 1 and out[0]["scheduled"] > 0  # round 2 really ran
    # open() must NOT mutate the caller's config: a later scheduler built
    # from the same object would silently inherit this checkpoint's geometry
    assert caller_cfg.bloom_bits == SchedulerConfig().bloom_bits
    assert "filter_kind" not in caller_cfg.extra
