"""Iceberg CheckpointStore adapter (storage_iceberg.py).

The sandbox has no Iceberg runtime jar, so the integration test is
skip-if-unavailable; the SQL builders, identifier hygiene, and the
capability probe / fail-fast guard are covered unconditionally.
"""

import pytest

from cord19_crawler_spark.storage_iceberg import (
    IcebergCheckpointStore,
    append_round_sql,
    create_state_table_sql,
    iceberg_available,
    merge_into_sql,
    overwrite_round_sql,
)


def test_sql_builders():
    assert append_round_sql("crawl.f.url_seen_new", 7, "v") == (
        "INSERT INTO crawl.f.url_seen_new SELECT *, 7 AS _round FROM v"
    )
    # static PARTITION clause: replaces exactly one round in EVERY
    # partitionOverwriteMode (a bare INSERT OVERWRITE would truncate the
    # whole table under the default static mode)
    assert overwrite_round_sql("crawl.f.crawl_log", 3, "batch_v") == (
        "INSERT OVERWRITE crawl.f.crawl_log PARTITION (_round = 3) "
        "SELECT * FROM batch_v"
    )
    assert create_state_table_sql("crawl.f.frontier_new", "url string") == (
        "CREATE TABLE IF NOT EXISTS crawl.f.frontier_new (url string, "
        "_round INT) USING iceberg PARTITIONED BY (_round)"
    )


def test_merge_into_sql_shapes_the_frontier_merge():
    sql = merge_into_sql(
        "crawl.f.frontier", "discovered_v",
        key_cols=["url"], insert_cols=["url", "host", "priority"],
    )
    assert sql == (
        "MERGE INTO crawl.f.frontier t USING discovered_v s ON t.url = s.url "
        "WHEN NOT MATCHED THEN INSERT (url, host, priority) "
        "VALUES (s.url, s.host, s.priority)"
    )


def test_identifier_hygiene():
    for bad in ("t; DROP TABLE x", "a..b", "1tab", "a-b", "ns.`x`"):
        with pytest.raises(ValueError):
            append_round_sql(bad, 1, "v")
        with pytest.raises(ValueError):
            merge_into_sql("ns.t", "v", key_cols=[bad], insert_cols=["u"])


def test_fail_fast_without_runtime(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present; fail-fast path not reachable")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        IcebergCheckpointStore(spark, "crawl.frontier")


def test_scheduler_runs_on_iceberg_store(spark, tmp_path):
    """Full contract drive on a real Iceberg catalog: scheduler rounds,
    resume, and counters all served by table snapshots instead of renamed
    parquet dirs. Requires the iceberg-spark-runtime jar + a configured
    SparkCatalog, so it self-skips in jar-less environments."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime not on the classpath")
    if "iceberg_test" not in [c.name for c in spark.catalog.listCatalogs()]:
        pytest.skip("no iceberg_test catalog configured")

    from cord19_crawler_spark.datagen import generate_documents, seed_urls
    from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig

    store = IcebergCheckpointStore(spark, "iceberg_test.frontier")
    docs = generate_documents(spark, 200, partitions=4)
    sched = CrawlScheduler(
        spark, docs, str(tmp_path / "unused"),
        SchedulerConfig(batch_size=20, seen_partitions=4, bloom_bits=1 << 14),
        store=store,
    )
    out = sched.run(2, seeds=seed_urls(spark, 8, 200))
    assert len(out) == 2 and all(c["scheduled"] > 0 for c in out)
    assert store.latest_round() == 2
    resumed = CrawlScheduler(
        spark, docs, str(tmp_path / "unused"),
        SchedulerConfig(batch_size=20, seen_partitions=4, bloom_bits=1 << 14),
        store=store,
    )
    assert len(resumed.run(3)) == 1


def test_bucket_spec_transforms():
    """url_seen_new with a bucket(P, url) spec — the storage-partitioned-
    join lever for the seen backstop's over-cap fallback path."""
    import pytest

    sql = create_state_table_sql(
        "crawl.f.url_seen_new",
        "partition int, url_id bigint, url string",
        ("bucket(65536, url)",),
    )
    assert "PARTITIONED BY (_round, bucket(65536, url))" in sql
    with pytest.raises(ValueError, match="invalid partition transform"):
        create_state_table_sql("crawl.f.t", "a int", ("bucket(16, url); DROP TABLE x",))
    with pytest.raises(ValueError, match="invalid partition transform"):
        create_state_table_sql("crawl.f.t", "a int", ("identity(a b)",))
