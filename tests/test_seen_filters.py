"""Bloom + cuckoo URL-seen filter properties (SURVEY.md §5.1): zero false
negatives always; FPR bounded; scheduler results identical under either
filter (exactness comes from the anti-join backstop, not the sketch)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cord19_crawler_spark.frontier.cuckoo import CuckooSeenFilter
from cord19_crawler_spark.frontier.seen import BloomSeenFilter, exact_new, with_partition


def _urls_df(spark, start, n, parts=4):
    df = spark.range(start, start + n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 13).cast("string"),
                 F.lit(".com/p/"), F.col("id").cast("string")).alias("url")
    ).withColumn("url_id", F.xxhash64("url"))
    return with_partition(df, parts)


@pytest.mark.parametrize("flt", [
    BloomSeenFilter(n_partitions=4, m_bits=1 << 16, k=5),
    CuckooSeenFilter(n_partitions=4, n_buckets=1 << 12),
])
def test_no_false_negatives_and_bounded_fpr(spark, flt):
    inserted = _urls_df(spark, 0, 3000)
    state = flt.insert(inserted, flt.empty_state(spark))
    # every inserted url must probe positive
    flagged = flt.probe(inserted, state)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0
    # unseen urls: false-positive rate bounded
    fresh = _urls_df(spark, 1_000_000, 3000)
    fp = flt.probe(fresh, state).filter(F.col("maybe_seen")).count()
    assert fp / 3000 < 0.05, f"FPR too high: {fp / 3000}"


def test_exact_new_resolves_fp(spark):
    flt = BloomSeenFilter(n_partitions=4, m_bits=1 << 10, k=2)  # tiny → many FPs
    seen = _urls_df(spark, 0, 2000)
    state = flt.insert(seen, flt.empty_state(spark))
    url_seen = seen.select("partition", "url_id", "url")
    fresh = _urls_df(spark, 500_000, 2000)
    flagged = flt.probe(fresh, state)
    assert flagged.filter(F.col("maybe_seen")).count() > 0  # sketch lies
    new = exact_new(flagged, url_seen)
    assert new.count() == 2000  # backstop restores exactness
    # and none of the already-seen sneak through
    flagged_seen = flt.probe(seen, state)
    assert exact_new(flagged_seen, url_seen).count() == 0


def test_scheduler_identical_under_cuckoo(spark, tmp_path):
    from cord19_crawler_spark.datagen import generate_documents, seed_urls
    from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig

    docs = generate_documents(spark, 200, partitions=2).cache()
    base = dict(batch_size=15, seen_partitions=4, bloom_bits=1 << 16,
                min_delay_rounds=2, max_in_flight=3)
    s_bloom = CrawlScheduler(spark, docs, str(tmp_path / "b"), SchedulerConfig(**base))
    s_bloom.run(3, seeds=seed_urls(spark, 8, 200))
    s_cuckoo = CrawlScheduler(
        spark, docs, str(tmp_path / "c"),
        SchedulerConfig(**base, extra={"filter_kind": "cuckoo", "cuckoo_buckets": 1 << 12}),
    )
    s_cuckoo.run(3, seeds=seed_urls(spark, 8, 200))
    assert s_bloom.crawl_order() == s_cuckoo.crawl_order()
    assert s_bloom.seen_set() == s_cuckoo.seen_set()


def test_probe_geometry_mismatch_is_loud(spark):
    """Probing candidates partitioned under a DIFFERENT geometry than the
    committed filter must raise, not silently return maybe_seen=False
    (which would re-admit already-seen URLs past the bloom fast path)."""
    import pytest

    from cord19_crawler_spark.frontier.seen import BloomSeenFilter, with_partition

    f8 = BloomSeenFilter(n_partitions=8, m_bits=1 << 12, k=3)
    urls = spark.createDataFrame(
        [(f"https://h{i}.com/x",) for i in range(60)], "url string"
    ).withColumn("url_id", F.xxhash64("url"))
    state8 = f8.insert(with_partition(urls, 8), f8.empty_state(spark))
    mis = with_partition(urls, 16)  # 16-way candidates vs 8-way state
    with pytest.raises(Exception, match="filter state for partition"):
        f8.probe(mis, state8).collect()
    # matched geometry still probes cleanly
    ok = f8.probe(with_partition(urls, 8), state8)
    assert ok.filter("maybe_seen").count() == 60
    # INSERT is equally loud: fabricating a fresh bitset for a mis-mapped
    # partition would write corrupt extra-partition state that MASKS the
    # mismatch from future probes
    with pytest.raises(Exception, match="filter state for partition"):
        f8.insert(mis, state8).collect()


def test_bloom_bits_must_be_multiple_of_8():
    import pytest

    from cord19_crawler_spark.frontier.seen import BloomSeenFilter

    with pytest.raises(ValueError, match="multiple of 8"):
        BloomSeenFilter(m_bits=999_999)
    with pytest.raises(ValueError, match="k must be"):
        BloomSeenFilter(m_bits=1 << 12, k=0)


def test_resume_geometry_guard_catches_shrink_on_legacy_checkpoint(spark, tmp_path):
    """A checkpoint WITHOUT persisted filter_config facets (legacy) resumed
    with FEWER seen_partitions: every candidate partition has state, so the
    in-kernel empty-group guard never fires — the one-time resume geometry
    check (state row count × blob size vs config) must catch it."""
    import json
    import os

    import pytest

    from cord19_crawler_spark.datagen import generate_documents, seed_urls
    from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig

    docs = generate_documents(spark, 150, partitions=2).cache()
    ck = str(tmp_path / "ck")
    s4 = CrawlScheduler(
        spark, docs, ck,
        SchedulerConfig(batch_size=10, seen_partitions=4, bloom_bits=1 << 14),
    )
    s4.run(1, seeds=seed_urls(spark, 6, 150))
    # simulate a legacy checkpoint: strip the persisted config facets so
    # the construction-time fail-fast cannot see the mismatch
    marker = os.path.join(ck, "round=0", "_COMMITTED.json")
    data = json.load(open(marker))
    data.get("counters", {}).pop("filter_config", None)
    json.dump(data, open(marker, "w"))

    s2 = CrawlScheduler(
        spark, docs, ck,
        SchedulerConfig(batch_size=10, seen_partitions=2, bloom_bits=1 << 14),
    )
    with pytest.raises(ValueError, match="geometry mismatch"):
        s2.run(2)
    # same config as committed → resumes cleanly (guard passes)
    s_ok = CrawlScheduler(
        spark, docs, ck,
        SchedulerConfig(batch_size=10, seen_partitions=4, bloom_bits=1 << 14),
    )
    s_ok.run(2)


def test_exact_new_inverted_backstop_matches_and_never_shuffles_seen(spark):
    """VERDICT r3 nit 3: with a known-small probe volume the backstop is
    two broadcast joins — the seen set is scanned but never exchanged —
    and the result is bit-identical to the plain hash anti-join."""

    def _plan(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    flt = BloomSeenFilter(n_partitions=4, m_bits=1 << 10, k=2)  # many FPs
    seen = _urls_df(spark, 0, 2000)
    state = flt.insert(seen, flt.empty_state(spark))
    url_seen = seen.select("partition", "url_id", "url")
    mixed = _urls_df(spark, 1500, 1000)  # 500 seen + 500 fresh
    flagged = flt.probe(mixed, state).cache()
    n_maybe = flagged.filter(F.col("maybe_seen")).count()
    assert n_maybe >= 500  # all genuinely-seen rows are bloom-positive

    inverted = exact_new(flagged, url_seen, probe_count=n_maybe)
    fallback = exact_new(flagged, url_seen, probe_count=n_maybe, broadcast_max=0)
    got_i = sorted(r["url"] for r in inverted.collect())
    got_f = sorted(r["url"] for r in fallback.collect())
    assert got_i == got_f and len(got_i) == 500

    # the inverted plan exchanges only broadcasts — the seen-set subtree
    # has no hash-partition shuffle and no sort-merge join
    plan = _plan(inverted)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Exchange hashpartitioning" not in plan
    # the fallback (over-cap) path keeps the always-correct hash anti-join
    fplan = _plan(fallback)
    assert "LeftAnti" in fplan
    flagged.unpersist()
