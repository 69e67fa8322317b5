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
