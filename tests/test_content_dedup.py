"""Content-level dedup in the crawl loop (extra["content_dedup"]=True,
default OFF — the default path stays bit-identical): mirror pages fetched
under different URLs must not re-contribute their links. Fingerprint = md5
over ordered span texts; known fingerprints are an append-only
content_seen_new delta table checked with the same scan-only broadcast
inversion as the URL backstop. The duplicate's URL still consumes its
crawl_log slot — only link extraction is skipped (the reference's
duplicate-doc guard, src/index.py:62-63, lifted to content level)."""

import pytest

from cord19_crawler_spark.datagen import generate_documents
from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig
from cord19_crawler_spark.frontier.fetch import make_udf_fetcher


def _make_mirror_fetch():
    """Two content groups; every /doc/i is a mirror of group i%2, and the
    /page/g it links to serves EXACTLY the same text (a mirror under a
    different URL). CLOSURE so cloudpickle ships it by value."""

    def fetch(url: str) -> dict | None:
        tail = url.rsplit("/", 1)[-1]
        if "/doc/" in url:
            g = int(tail) % 2
        elif "/page/" in url:
            g = int(tail)
        else:
            return None
        text = f"shared-{g} see https://g{g}.example.org/page/{g}"
        return {
            "doc_id": tail,
            "spans": [{"kind": "text", "text": text, "media_ref": None, "offset": 0}],
        }

    return fetch


def _seeds(spark, n):
    return spark.createDataFrame(
        [(f"https://h{i % 3}.example.com/doc/{i}", 1.0) for i in range(n)],
        "url string, priority double",
    )


def _cfg(**kw):
    base = dict(
        batch_size=10, seen_partitions=2, bloom_bits=1 << 14,
        min_delay_rounds=1, max_in_flight=10,
        extra={"content_dedup": True},
    )
    base.update(kw)
    return SchedulerConfig(**base)


def test_mirror_links_extracted_once(spark, tmp_path):
    docs = generate_documents(spark, 10, partitions=2)
    sched = CrawlScheduler(
        spark, docs, str(tmp_path / "ck"), _cfg(),
        fetcher=make_udf_fetcher(_make_mirror_fetch()),
    )
    out = sched.run(2, seeds=_seeds(spark, 6))
    r1, r2 = out
    # round 1: six mirrors of two contents → 2 winners, 4 skipped
    assert r1["scheduled"] == 6
    assert r1["content_new"] == 2
    assert r1["content_duplicates_skipped"] == 4
    assert r1["discovered_new"] == 2  # one /page/g link per group
    # round 2: the two /page/g mirrors serve already-seen content →
    # fetched (slots consumed), links NOT re-extracted, nothing new
    assert r2["scheduled"] == 2
    assert r2["content_new"] == 0
    assert r2["content_duplicates_skipped"] == 2
    assert r2["discovered_new"] == 0
    assert len(sched.seen_set()) == 8  # 6 seeds + 2 pages


def test_content_dedup_deterministic_and_resumable(spark, tmp_path):
    docs = generate_documents(spark, 10, partitions=2)

    def run(ck, rounds):
        s = CrawlScheduler(
            spark, docs, str(ck), _cfg(),
            fetcher=make_udf_fetcher(_make_mirror_fetch()),
        )
        s.run(rounds, seeds=_seeds(spark, 6))
        return s

    a = run(tmp_path / "a", 2)
    # kill-resume: new scheduler instance continues the same checkpoint
    b = run(tmp_path / "b", 1)
    b2 = CrawlScheduler(
        spark, docs, str(tmp_path / "b"), _cfg(),
        fetcher=make_udf_fetcher(_make_mirror_fetch()),
    )
    b2.run(2)
    assert a.crawl_order() == b2.crawl_order()
    assert a.seen_set() == b2.seen_set()


def test_flag_mismatch_fails_fast(spark, tmp_path):
    docs = generate_documents(spark, 10, partitions=2)
    ck = str(tmp_path / "ck")
    s = CrawlScheduler(
        spark, docs, ck, _cfg(),
        fetcher=make_udf_fetcher(_make_mirror_fetch()),
    )
    s.run(1, seeds=_seeds(spark, 6))
    with pytest.raises(ValueError, match="filter config"):
        CrawlScheduler(
            spark, docs, ck,
            SchedulerConfig(batch_size=10, seen_partitions=2,
                            bloom_bits=1 << 14),
        )


def test_compact_expire_and_guard(spark, tmp_path):
    docs = generate_documents(spark, 10, partitions=2)
    ck = str(tmp_path / "ck")
    s = CrawlScheduler(
        spark, docs, ck, _cfg(),
        fetcher=make_udf_fetcher(_make_mirror_fetch()),
    )
    s.run(1, seeds=_seeds(spark, 6))
    # expiring before any compaction snapshot carries content_seen → loud
    with pytest.raises(ValueError, match="content_dedup"):
        s.expire()
    s.run(2)
    s.compact(2)
    assert s.store.has_compact_table(2, "content_seen")
    s.expire()
    # rounds continue bit-identically vs an uninterrupted run
    s.run(3)
    c = CrawlScheduler(
        spark, docs, str(tmp_path / "control"), _cfg(),
        fetcher=make_udf_fetcher(_make_mirror_fetch()),
    )
    c.run(3, seeds=_seeds(spark, 6))
    assert s.crawl_order() == c.crawl_order()
    assert s.seen_set() == c.seen_set()


def test_open_adopts_content_dedup_facet(spark, tmp_path):
    """CrawlScheduler.open() resumes an enabled checkpoint under a default
    config by adopting the committed facet (like the filter geometry)."""
    docs = generate_documents(spark, 10, partitions=2)
    ck = str(tmp_path / "ck")
    s = CrawlScheduler(
        spark, docs, ck, _cfg(),
        fetcher=make_udf_fetcher(_make_mirror_fetch()),
    )
    s.run(1, seeds=_seeds(spark, 6))
    resumed = CrawlScheduler.open(
        spark, docs, ck,
        SchedulerConfig(batch_size=10, seen_partitions=2, bloom_bits=1 << 14,
                        min_delay_rounds=1, max_in_flight=10),
        fetcher=make_udf_fetcher(_make_mirror_fetch()),
    )
    assert resumed.cfg.extra.get("content_dedup") is True
    out = resumed.run(2)
    assert out[-1]["content_duplicates_skipped"] == 2  # the mirror pages


# ---------------------------------------------------------------------------
# minhash estimator accuracy harness
# ---------------------------------------------------------------------------


def test_minhash_estimate_error_identical_and_disjoint(spark):
    from pyspark.sql import functions as F

    from cord19_crawler_spark.operators.dedup import minhash_estimate_error

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd"),
            (2, "aa bb cc dd"),          # identical to 1 -> J = 1, est = 1
            (3, "aa bb cc dd ee"),       # near-dup of 1/2
            (4, "zz yy xx ww"),          # disjoint
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in minhash_estimate_error(
            docs, num_perm=8, bands=4, ngram=1
        ).collect()
    }
    # identical docs: all permutations agree, exact J = 1, error 0
    r12 = out[(1, 2)]
    assert r12["est_jaccard"] == 1.0 and r12["jaccard"] == 1.0
    assert r12["abs_err"] == 0.0
    # every reported pair is an LSH candidate; errors bounded by 1
    for r in out.values():
        assert 0.0 <= r["abs_err"] <= 1.0
        assert abs(r["abs_err"] - abs(r["est_jaccard"] - r["jaccard"])) < 1e-9
    # disjoint doc 4 should not pair with 1 at these settings unless a
    # band collides; if present its exact jaccard must be 0
    for (a, b), r in out.items():
        if 4 in (a, b) and (a in (1, 2, 3) or b in (1, 2, 3)):
            assert r["jaccard"] == 0.0


def test_minhash_estimate_error_band_collision_pair_not_dropped(spark):
    """Two disjoint single-shingle docs whose shingle hashes are
    congruent mod the MinHash prime agree on EVERY permutation: the LSH
    pairs them (est = 1) while true Jaccard is 0 — the maximum-error
    pair must be REPORTED (jaccard 0, abs_err 1), not dropped by the
    exact-verify join."""
    from cord19_crawler_spark.operators.dedup import minhash_estimate_error

    # md5_long56('w46609') ≡ md5_long56('w77292') (mod 2^31-1)
    docs = spark.createDataFrame(
        [(1, "w46609"), (2, "w77292")], "doc_id long, text string"
    )
    out = minhash_estimate_error(docs, num_perm=8, bands=4, ngram=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["est_jaccard"] == 1.0
    assert r["jaccard"] == 0.0 and r["abs_err"] == 1.0
