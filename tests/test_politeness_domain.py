"""Domain-level politeness budget: subdomains of one registrable domain
share the in-flight allowance (north_rule: max in-flight per DOMAIN)."""

from pyspark.sql import functions as F

from cord19_crawler_spark.frontier import politeness


def _eligible(spark):
    rows = []
    for sub in ("a", "b", "c"):
        for i in range(4):
            rows.append(
                (f"https://{sub}.corp.com/p{i}", f"{sub}.corp.com", 1.0 - i * 0.01)
            )
    rows.append(("https://other.net/x", "other.net", 0.5))
    df = spark.createDataFrame(rows, "url string, host string, priority double")
    return df.withColumn("min_delay_rounds", F.lit(1)) \
             .withColumn("max_in_flight", F.lit(3)) \
             .withColumn("last_scheduled_round", F.lit(None).cast("int"))



def test_domain_budget_shared(spark):
    elig = _eligible(spark)
    # host budget: 3 per host → 3 hosts × 3 + 1 = 10
    by_host = politeness.per_host_topk(elig, budget_key="host")
    assert by_host.count() == 10
    # domain budget: corp.com shares ONE allowance of 3 (+ other.net 1) = 4
    by_domain = politeness.per_host_topk(elig, budget_key="domain")
    got = by_domain.collect()
    assert len(got) == 4
    corp = [r for r in got if r["host"].endswith("corp.com")]
    assert len(corp) == 3
    # deterministic winners: highest priority, url tie-break
    assert sorted(r["url"] for r in corp) == [
        "https://a.corp.com/p0", "https://b.corp.com/p0", "https://c.corp.com/p0",
    ]


def test_domain_budget_with_split_plan(spark):
    elig = _eligible(spark)
    plan = spark.createDataFrame(
        [("a.corp.com", 2), ("b.corp.com", 1), ("c.corp.com", 1), ("other.net", 1)],
        "host string, n_salt int",
    )
    with_plan = politeness.per_host_topk(elig, split_plan=plan, budget_key="domain")
    without = politeness.per_host_topk(elig, budget_key="domain")
    assert sorted(r["url"] for r in with_plan.collect()) == sorted(
        r["url"] for r in without.collect()
    )


def test_domain_budget_split_plan_heterogeneous_max_in_flight(spark):
    """Two-phase (salted) top-k must equal the unsalted window when hosts of
    ONE domain carry DIFFERENT max_in_flight: the pre-phase keeps the
    GROUP-max top-k per salt. Per-row pre-filtering diverges here: hostA
    (m=1, 6 urls, salted 2 ways) would shrink the final window so hostB's
    low-priority row (m=5, true domain rank 7) sneaks in at rank 3."""
    rows = [
        (f"https://a.corp.com/p{i}", "a.corp.com", 1.0 - i * 0.01, 1)
        for i in range(6)
    ] + [("https://b.corp.com/low", "b.corp.com", 0.01, 5)]
    elig = (
        spark.createDataFrame(
            rows, "url string, host string, priority double, max_in_flight int"
        )
        .withColumn("min_delay_rounds", F.lit(1))
        .withColumn("last_scheduled_round", F.lit(None).cast("int"))
    )
    plan = spark.createDataFrame(
        [("a.corp.com", 2)], "host string, n_salt int"
    )
    without = sorted(
        r["url"]
        for r in politeness.per_host_topk(elig, budget_key="domain").collect()
    )
    with_plan = sorted(
        r["url"]
        for r in politeness.per_host_topk(
            elig, split_plan=plan, budget_key="domain"
        ).collect()
    )
    assert with_plan == without
    # and the unsalted semantics itself: only the domain's top row survives
    # its own threshold; hostB's rank-7 row must NOT be scheduled
    assert without == ["https://a.corp.com/p0"]


# ---- wall-clock politeness (min_delay_seconds vs last_fetch_ts) ------------


def test_eligible_urls_wall_clock_gate(spark):
    """A host fetched < min_delay_seconds ago is ineligible even when the
    round-delta rule would allow it; null ts / null delay = unconstrained."""
    pending = spark.createDataFrame(
        [(f"https://{h}/x", h, 1.0) for h in ("fresh.com", "hot.com", "cool.com")],
        "url string, host string, priority double",
    )
    hs = spark.createDataFrame(
        [
            ("fresh.com", 0, 3, None, 10.0, None),     # never fetched
            ("hot.com",   0, 3, 1,    10.0, 1000.0),   # fetched 5s ago
            ("cool.com",  0, 3, 1,    10.0, 980.0),    # fetched 25s ago
        ],
        "host string, min_delay_rounds int, max_in_flight int, "
        "last_scheduled_round int, min_delay_seconds double, last_fetch_ts double",
    )
    got = {r["host"] for r in
           politeness.eligible_urls(pending, hs, 2, now=1005.0).collect()}
    assert got == {"fresh.com", "cool.com"}
    # without a wall clock the rounds rule alone applies (all pass at delay 0)
    got2 = {r["host"] for r in politeness.eligible_urls(pending, hs, 2).collect()}
    assert got2 == {"fresh.com", "hot.com", "cool.com"}


def test_scheduler_wall_clock_politeness_e2e(spark, tmp_path):
    """Forced-clock e2e: with min_delay_seconds=30 and the rounds rule
    disabled, no host may be scheduled twice within a 30 s window across
    rounds; after the window elapses the host is schedulable again."""
    from cord19_crawler_spark.datagen import generate_documents, seed_urls
    from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig

    clock = {"t": 1000.0}
    docs = generate_documents(spark, 300, partitions=4).cache()
    sched = CrawlScheduler(
        spark, docs, str(tmp_path / "ck"),
        SchedulerConfig(batch_size=40, seen_partitions=4, bloom_bits=1 << 14,
                        min_delay_rounds=0, max_in_flight=2,
                        min_delay_seconds=30.0),
        clock=lambda: clock["t"],
    )
    sched.run(1, seeds=seed_urls(spark, 12, 300))   # round 1 at t=1000
    clock["t"] = 1010.0
    sched.run(2)                                     # +10 s: r1 hosts blocked
    clock["t"] = 1035.0
    sched.run(3)                                     # r1 ok again (35s), r2 blocked (25s)

    fetch_ts = {1: 1000.0, 2: 1010.0, 3: 1035.0}
    by_round: dict[int, set] = {1: set(), 2: set(), 3: set()}
    for rnd, _, url in sched.crawl_order():
        host = url.split("/")[2]
        by_round[rnd].add(host)
    assert by_round[1] and by_round[2] and by_round[3]
    # the invariant: any host scheduled in two rounds saw >= 30 s between them
    for a in (1, 2, 3):
        for b in (a + 1, a + 2):
            if b > 3:
                continue
            for host in by_round[a] & by_round[b]:
                assert fetch_ts[b] - fetch_ts[a] >= 30.0, (
                    f"{host} rescheduled after {fetch_ts[b]-fetch_ts[a]}s")
    # and blocking actually bit: rounds 1->2 are 10 s apart, so disjoint
    assert not (by_round[1] & by_round[2])
    assert not (by_round[2] & by_round[3])
    # hosts from round 1 became eligible again by round 3 (window elapsed):
    # with only 12 hosts and batch 40, overlap must occur
    assert by_round[1] & by_round[3]


def test_resume_checkpoint_without_wallclock_columns(spark, tmp_path):
    """A checkpoint whose host_state predates the wall-clock columns resumes
    cleanly: the missing columns read as null (no wall-clock constraint)."""
    import glob
    import os

    import pandas as pd

    from cord19_crawler_spark.datagen import generate_documents, seed_urls
    from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig

    docs = generate_documents(spark, 200, partitions=4).cache()
    cfg = SchedulerConfig(batch_size=20, seen_partitions=4, bloom_bits=1 << 14)
    ck = str(tmp_path / "ck")
    sched = CrawlScheduler(spark, docs, ck, cfg)
    sched.run(1, seeds=seed_urls(spark, 8, 200))

    # strip the wall-clock columns from every committed host_state delta,
    # simulating a pre-upgrade checkpoint
    for rdir in glob.glob(os.path.join(ck, "round=*")):
        hdir = os.path.join(rdir, "host_state")
        pdf = pd.read_parquet(hdir).drop(
            columns=["min_delay_seconds", "last_fetch_ts"])
        # pandas floats all-null int columns; restore the committed dtype
        pdf = pdf.astype({"last_scheduled_round": "Int32"})
        for f in glob.glob(os.path.join(hdir, "*.parquet")):
            os.remove(f)
        pdf.to_parquet(os.path.join(hdir, "part-legacy.parquet"), index=False)

    resumed = CrawlScheduler(spark, docs, ck, cfg)
    out = resumed.run(3)
    assert len(out) == 2 and all(c["scheduled"] > 0 for c in out)


def test_wall_clock_mode_two_run_equality(spark, tmp_path):
    """Wall-clock politeness stays fully deterministic under a forced clock:
    two independent runs with the same clock sequence produce identical
    crawl order and seen set (the bit-identical guarantee extends to the
    new mode)."""
    from cord19_crawler_spark.datagen import generate_documents, seed_urls
    from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig

    docs = generate_documents(spark, 250, partitions=3).cache()
    results = []
    for run in ("a", "b"):
        clock = {"t": 500.0}
        s = CrawlScheduler(
            spark, docs, str(tmp_path / f"ck_{run}"),
            SchedulerConfig(batch_size=20, seen_partitions=3,
                            bloom_bits=1 << 14, min_delay_rounds=0,
                            max_in_flight=3, min_delay_seconds=25.0),
            clock=lambda: clock["t"],
        )
        s.run(1, seeds=seed_urls(spark, 10, 250))
        clock["t"] = 512.0
        s.run(2)
        clock["t"] = 531.0
        s.run(3)
        results.append((s.crawl_order(), s.seen_set()))
    assert results[0] == results[1]
