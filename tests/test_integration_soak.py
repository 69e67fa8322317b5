"""Integration soak: every frontier feature at once — cuckoo filter, domain
budget, robots rules, auto-compaction, a mid-run external merge — over 8
rounds, then kill/resume equality on the combined configuration."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cord19_crawler_spark.datagen import (
    canonical_url,
    generate_documents,
    host_of,
    seed_urls,
)

from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig


def _cfg():
    return SchedulerConfig(
        batch_size=25,
        seen_partitions=4,
        min_delay_rounds=1,
        max_in_flight=8,
        compact_every=3,
        extra={"filter_kind": "cuckoo", "cuckoo_buckets": 1 << 12,
               "budget_key": "domain"},
    )


def _robots(spark):
    return spark.createDataFrame(
        [Row(host="host1.example.com", rules=[Row(allow=False, path_prefix="/")])]
    )


def _drive(spark, docs, path, rounds=8):
    s = CrawlScheduler(spark, docs, path, _cfg(), robots=_robots(spark))
    s.run(4, seeds=seed_urls(spark, 12, 400))
    # merge target: not yet discovered, not on the robots-denied host
    # (deterministic: both drives see the identical round-4 seen set)
    seen = s.seen_set()
    target = next(
        t for t in range(400)
        if host_of(t) != 1 and canonical_url(t) not in seen
    )
    ext = spark.createDataFrame([(canonical_url(target),)], "url string")
    s.merge_discoveries(ext, priority=99.0)
    s.run(rounds)
    return s, target


def test_soak_all_features(spark, tmp_path):
    docs = generate_documents(spark, 400, partitions=4).cache()
    s, target = _drive(spark, docs, str(tmp_path / "a"))
    order = s.crawl_order()
    urls = [u for _, _, u in order]
    assert len(urls) == len(set(urls))  # never re-scheduled
    # robots: host1 never crawled
    assert not any("host1.example.com" in u for u in urls)
    # domain budget: ≤ max_in_flight per SCHEDULING round (merge rounds skip)
    from collections import Counter

    per_round = Counter(r for r, _, _ in order)
    assert all(v <= 8 for v in per_round.values())
    # merged URL (priority 99) crawled in the first round after the merge
    merge_rnd = min(r for r in per_round if r > 4)
    assert canonical_url(target) in [u for r, _, u in order if r == merge_rnd]
    # identical second run (all features deterministic together)
    s2, _t2 = _drive(spark, docs, str(tmp_path / "b"))
    assert s2.crawl_order() == order
    assert s2.seen_set() == s.seen_set()


def test_two_phase_topk_equals_plain_window(spark):
    """Salted two-phase per-key top-k ≡ single window, on Zipf-skewed data."""
    from cord19_crawler_spark.frontier import politeness, skew

    rows = []
    for i in range(5000):
        host = "hot.example.com" if i % 3 else f"h{i % 40}.example.com"
        rows.append((f"https://{host}/p{i}", host, float((i * 37) % 1000)))
    df = spark.createDataFrame(rows, "url string, host string, priority double")
    elig = (
        df.withColumn("min_delay_rounds", F.lit(1))
        .withColumn("max_in_flight", F.lit(7))
        .withColumn("last_scheduled_round", F.lit(None).cast("int"))
    )
    plan = skew.hot_host_plan(elig, threshold=100)  # hot host splits ~34 ways
    plain = politeness.per_host_topk(elig)
    split = politeness.per_host_topk(elig, split_plan=plan)
    assert sorted(r["url"] for r in plain.collect()) == sorted(
        r["url"] for r in split.collect()
    )
    assert plan.filter(F.col("n_salt") > 1).count() >= 1


def test_soak_round3_features_together(spark, tmp_path):
    """Round-3 features combined: wall-clock politeness under a stepping
    forced clock, robots Crawl-delay overriding one host's budget, PSL
    domain budget, auto-compaction WITH expiry — determinism (two-run
    equality) must survive the whole stack."""
    import os

    from cord19_crawler_spark.frontier.psl import load_psl
    from cord19_crawler_spark.frontier.robots import parse_robots_txt

    docs = generate_documents(spark, 400, partitions=4).cache()
    robots = parse_robots_txt(spark.createDataFrame(
        [
            ("host1.example.com", "User-agent: *\nDisallow: /\n"),
            ("host2.example.com", "User-agent: *\nCrawl-delay: 1000\n"),
        ],
        "host string, robots_txt string",
    ))

    def cfg():
        return SchedulerConfig(
            batch_size=25, seen_partitions=4, bloom_bits=1 << 16,
            min_delay_rounds=0, max_in_flight=6, min_delay_seconds=20.0,
            compact_every=3, expire_on_compact=True,
            extra={"budget_key": "domain"},
        )

    def drive(path):
        t = {"v": 0.0}

        def clock():
            t["v"] += 30.0  # one tick per round: default hosts re-eligible
            return t["v"]

        s = CrawlScheduler(spark, docs, path, cfg(), robots=robots,
                           clock=clock, psl=load_psl(spark))
        s.run(6, seeds=seed_urls(spark, 14, 400))
        return s

    s = drive(str(tmp_path / "a"))
    order = s.crawl_order()
    urls = [u for _, _, u in order]
    assert urls and len(urls) == len(set(urls))  # never re-scheduled
    assert not any("host1.example.com" in u for u in urls)  # robots deny
    # Crawl-delay 1000 ≫ clock range: host2 scheduled in at most one round
    h2_rounds = {r for r, _, u in order if "host2.example.com" in u}
    assert len(h2_rounds) <= 1
    # expiry ran at the compaction points: early round dirs reclaimed
    assert not os.path.isdir(os.path.join(str(tmp_path / "a"), "round=1"))
    assert os.path.isdir(os.path.join(str(tmp_path / "a"), "round=0"))
    # the full stack stays deterministic
    s2 = drive(str(tmp_path / "b"))
    assert s2.crawl_order() == order
    assert s2.seen_set() == s.seen_set()
