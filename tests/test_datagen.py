"""Corpus generator invariants (FIXTURES.md §1): deterministic under any
partitioning, edge-case docs present, URLs canonicalize to the doc's
canonical address, Zipf host skew real."""

from pyspark.sql import functions as F

from cord19_crawler_spark.datagen import (
    canonical_url,
    generate_documents,
    host_of,
    messy_url,
    out_links,
)
from cord19_crawler_spark.functions.urls import canonicalize_one

N = 500


def test_partitioning_invariance(spark):
    a = generate_documents(spark, N, partitions=2).collect()
    b = generate_documents(spark, N, partitions=13).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    da = {r["doc_id"]: r["spans"] for r in a}
    db = {r["doc_id"]: r["spans"] for r in b}
    assert da == db


def test_edge_case_docs_present(spark):
    docs = generate_documents(spark, N, partitions=4)
    sizes = {r["doc_id"]: len(r["spans"]) for r in docs.collect()}
    assert any(v == 0 for v in sizes.values())  # empty-span docs
    assert any(v >= 55 for v in sizes.values())  # >50-span docs (cap fodder)
    media_only = docs.filter(
        (F.size("spans") > 0)
        & (F.size(F.filter(F.col("spans"), lambda s: s["kind"] != "media")) == 0)
    )
    assert media_only.count() > 0


def test_messy_urls_canonicalize_to_doc_address():
    for t in (0, 7, 41, 123):
        for variant in range(6):
            assert canonicalize_one(messy_url(t, variant)) == canonical_url(t)


def test_zipf_host_skew():
    hosts = [host_of(t) for t in range(10000)]
    top2 = sum(1 for h in hosts if h in (0, 1))
    assert top2 / len(hosts) > 0.4  # hot domains carry a real share
    assert len(set(hosts)) > 10


def test_out_links_in_range():
    for i in (0, 13, 499):
        links = out_links(i, N)
        assert all(0 <= t < N for t in links)
        assert 3 <= len(links) <= 6
