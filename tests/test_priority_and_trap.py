"""Round-4 crawl-engine additions (both opt-in, default OFF — the default
path stays bit-identical to the historical scheduler, covered by the e2e
determinism suite):

* ``extra["priority_mode"]="indegree"`` — OPIC-style link evidence: the
  round's link dedup becomes a count agg on the SAME url-hash shuffle
  (zero extra shuffle) and a URL referenced by many fetched pages outranks
  a singleton discovery of the same round (log-damped).
* ``extra["max_pending_per_host"]`` — crawler-trap guard: each host's
  TOTAL pending queue is bounded; over-cap discoveries are dropped but
  remain SEEN (skipped permanently, not rediscovered every round).
"""

from pyspark.sql import functions as F

from cord19_crawler_spark.datagen import generate_documents
from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig
from cord19_crawler_spark.frontier.fetch import make_udf_fetcher


def _make_link_fetch():
    """Deterministic link graph: every fetched page links to 'popular';
    page i additionally links to a unique page. CLOSURE so cloudpickle
    ships it by value (executors cannot import test modules)."""

    def _link_fetch(url: str) -> dict | None:
        doc_id = url.rsplit("/", 1)[-1]
        try:
            i = int(doc_id)
        except ValueError:
            return None
        text = (
            f"see https://ext.example.org/popular and "
            f"https://ext.example.org/unique/{i}"
        )
        return {
            "doc_id": doc_id,
            "spans": [
                {"kind": "text", "text": text, "media_ref": None, "offset": 0}
            ],
        }

    return _link_fetch


def _seeds(spark, n):
    return spark.createDataFrame(
        [(f"https://h{i % 3}.example.com/doc/{i}", 1.0) for i in range(n)],
        "url string, priority double",
    )


def test_indegree_priority_ranks_popular_link_first(spark, tmp_path):
    docs = generate_documents(spark, 20, partitions=2)
    cfg = SchedulerConfig(
        batch_size=10, seen_partitions=2, bloom_bits=1 << 14,
        min_delay_rounds=1, max_in_flight=10,
        extra={"priority_mode": "indegree"},
    )
    sched = CrawlScheduler(
        spark, docs, str(tmp_path / "ck"), cfg,
        fetcher=make_udf_fetcher(_make_link_fetch()),
    )
    sched.run(1, seeds=_seeds(spark, 8))
    pending = sched.pending_frontier().select("url", "priority").collect()
    pri = {r["url"]: r["priority"] for r in pending}
    popular = pri["https://ext.example.org/popular"]
    uniques = [p for u, p in pri.items() if "/unique/" in u]
    assert uniques and all(popular > p for p in uniques)
    # log-damped: 8 refs → base * (1 + ln 9); singleton → base * (1 + ln 2)
    import math

    base = 1.0 / 2.0  # discovered in round 1
    assert abs(popular - base * (1 + math.log1p(8))) < 1e-9
    assert abs(uniques[0] - base * (1 + math.log1p(1))) < 1e-9


def test_indegree_is_deterministic_across_runs(spark, tmp_path):
    docs = generate_documents(spark, 20, partitions=2)

    def run(ck):
        cfg = SchedulerConfig(
            batch_size=6, seen_partitions=2, bloom_bits=1 << 14,
            min_delay_rounds=1, max_in_flight=6,
            extra={"priority_mode": "indegree"},
        )
        s = CrawlScheduler(spark, docs, str(ck), cfg,
                           fetcher=make_udf_fetcher(_make_link_fetch()))
        s.run(2, seeds=_seeds(spark, 8))
        return s

    a, b = run(tmp_path / "a"), run(tmp_path / "b")
    assert a.crawl_order() == b.crawl_order()
    assert a.seen_set() == b.seen_set()


def _make_fanout_fetch():
    """Trap shape: every fetched page emits 10 fresh trap URLs derived from
    its own id + one normal page. CLOSURE (see _make_link_fetch)."""

    def _fanout_fetch(url: str) -> dict | None:
        doc_id = url.rsplit("/", 1)[-1]
        try:
            i = int(doc_id)
        except ValueError:
            return None
        links = " ".join(
            f"https://trap.example.org/cal/{i * 10 + k}" for k in range(10)
        )
        text = f"{links} and https://ok.example.org/page/{i}"
        return {
            "doc_id": doc_id,
            "spans": [
                {"kind": "text", "text": text, "media_ref": None, "offset": 0}
            ],
        }

    return _fanout_fetch


def test_max_pending_per_host_bounds_trap_growth(spark, tmp_path):
    docs = generate_documents(spark, 40, partitions=2)
    CAP = 7
    cfg = SchedulerConfig(
        batch_size=8, seen_partitions=2, bloom_bits=1 << 14,
        min_delay_rounds=1, max_in_flight=8,
        extra={"max_pending_per_host": CAP},
    )
    sched = CrawlScheduler(
        spark, docs, str(tmp_path / "ck"), cfg,
        fetcher=make_udf_fetcher(_make_fanout_fetch()),
    )
    counters = sched.run(3, seeds=_seeds(spark, 8))
    # invariant: every host's pending queue is within the cap EVERY round
    pending = sched.pending_frontier()
    per_host = pending.groupBy("host").agg(F.count(F.lit(1)).alias("n")).collect()
    assert per_host and all(r["n"] <= CAP for r in per_host), per_host
    # the trap host actually hit the guard
    dropped = sum(c.get("frontier_capped_dropped", 0) for c in counters)
    assert dropped > 0
    # dropped URLs are SEEN (skipped permanently), so the seen set is
    # strictly larger than frontier history
    seen = len(sched.seen_set())
    frontier_rows = sched._read_frontier_all(
        sched.store.latest_round()
    ).count()
    assert seen > frontier_rows


def test_cap_keeps_best_ranked_rows(spark, tmp_path):
    """The kept sample is the TOP of the scheduler's total order
    (priority DESC, url ASC), not an arbitrary subset."""
    docs = generate_documents(spark, 20, partitions=2)
    CAP = 3
    cfg = SchedulerConfig(
        batch_size=8, seen_partitions=2, bloom_bits=1 << 14,
        min_delay_rounds=1, max_in_flight=8,
        extra={"max_pending_per_host": CAP},
    )
    sched = CrawlScheduler(
        spark, docs, str(tmp_path / "ck"), cfg,
        fetcher=make_udf_fetcher(_make_fanout_fetch()),
    )
    sched.run(1, seeds=_seeds(spark, 4))
    trap = (
        sched.pending_frontier()
        .filter(F.col("host") == "trap.example.org")
        .select("url")
        .collect()
    )
    got = sorted(r["url"] for r in trap)
    # all discovered trap urls this round, ranked: equal priority → url ASC
    all_trap = sorted(
        f"https://trap.example.org/cal/{i * 10 + k}"
        for i in range(4) for k in range(10)
    )
    assert got == all_trap[:CAP]


def test_cap_applies_to_merge_discoveries(spark, tmp_path):
    """An external bulk merge cannot bypass the pending(host) <= cap
    invariant that crawl rounds maintain."""
    docs = generate_documents(spark, 20, partitions=2)
    CAP = 5
    cfg = SchedulerConfig(
        batch_size=4, seen_partitions=2, bloom_bits=1 << 14,
        min_delay_rounds=1, max_in_flight=4,
        extra={"max_pending_per_host": CAP},
    )
    sched = CrawlScheduler(spark, docs, str(tmp_path / "ck"), cfg)
    sched.run(1, seeds=_seeds(spark, 4))
    bulk = spark.createDataFrame(
        [(f"https://bulk.example.org/item/{i}",) for i in range(40)],
        "url string",
    )
    counters = sched.merge_discoveries(bulk, priority=0.9)
    assert counters["discovered_new"] == 40  # all SEEN
    per_host = (
        sched.pending_frontier()
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(r["n"] <= CAP for r in per_host), per_host
    kept = (
        sched.pending_frontier()
        .filter(F.col("host") == "bulk.example.org")
        .count()
    )
    assert kept == CAP
