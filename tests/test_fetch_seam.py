"""Pluggable fetch stage (frontier/fetch.py): the scheduler's fetcher
contract with a UDF-backed per-URL callable — the production HTTP shape,
driven here by a deterministic fake."""

from cord19_crawler_spark.datagen import generate_documents, seed_urls
from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig
from cord19_crawler_spark.frontier.fetch import make_udf_fetcher


def _make_fake_fetch():
    """Deterministic stand-in for an HTTP client: every fetched page links
    to two /ext/ pages derived from its own id; /doc/13 is a 404. Built as
    a CLOSURE so cloudpickle ships it by value (executors cannot import
    test modules — exactly how a user's fetch lambda would travel)."""

    def fake_fetch(url: str) -> dict | None:
        doc_id = url.rsplit("/", 1)[-1]
        if doc_id == "13":
            return None  # fetch miss
        i = int(doc_id)
        return {
            "doc_id": doc_id,
            "spans": [
                {
                    "kind": "text",
                    "text": (
                        f"body with https://ext{i % 3}.example.org/page/{2 * i} "
                        f"and https://ext{i % 3}.example.org/page/{2 * i + 1}"
                    ),
                    "media_ref": None,
                    "offset": 0,
                }
            ],
        }

    return fake_fetch


def test_udf_fetcher_drives_a_round(spark, tmp_path):
    docs = generate_documents(spark, 100, partitions=2)  # unused by fetcher
    sched = CrawlScheduler(
        spark, docs, str(tmp_path / "ck"),
        SchedulerConfig(batch_size=10, seen_partitions=2, bloom_bits=1 << 14,
                        min_delay_rounds=1, max_in_flight=10),
        fetcher=make_udf_fetcher(_make_fake_fetch(), partitions=4),
    )
    out = sched.run(2, seeds=seed_urls(spark, 20, 100))
    assert all(c["scheduled"] > 0 for c in out)
    # discovered links came from the CALLABLE, not the corpus join
    assert all(c["discovered_new"] > 0 for c in out)
    scheduled = [u for _, _, u in sched.crawl_order()]
    assert len(scheduled) == 20  # all seeds drained (seeds outrank ext links)
    pending = {r["url"] for r in sched.pending_frontier().select("url").collect()}
    # what remains pending is exactly the fetcher-discovered ext pages
    assert pending and all("ext" in u and "/page/" in u for u in pending)
    # the 404 URL was scheduled (slot consumed, marked done) but yielded
    # nothing; it never re-enters pending
    assert any(u.endswith("/doc/13") for u in scheduled)
    assert not any(u.endswith("/doc/13") for u in pending)


def test_udf_fetcher_deterministic_across_runs(spark, tmp_path):
    docs = generate_documents(spark, 60, partitions=2)
    results = []
    for run in ("a", "b"):
        s = CrawlScheduler(
            spark, docs, str(tmp_path / f"ck_{run}"),
            SchedulerConfig(batch_size=8, seen_partitions=2, bloom_bits=1 << 14),
            fetcher=make_udf_fetcher(_make_fake_fetch()),
        )
        s.run(2, seeds=seed_urls(spark, 12, 60))
        results.append((s.crawl_order(), s.seen_set()))
    assert results[0] == results[1]
