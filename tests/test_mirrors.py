"""Mirror-host detection (frontier/mirrors.py): planted mirror pairs,
the template-noise cap, score arithmetic, and the duplicate-observation
collapse."""

from cord19_crawler_spark.frontier.mirrors import mirror_hosts


def _df(spark, rows):
    return spark.createDataFrame(rows, "host string, fingerprint string")


def test_planted_mirror_scores(spark):
    # a: {f1,f2,f3,f4}; b: {f1,f2,f3} (subset mirror); c: {f4,f9}
    rows = [
        ("a", "f1"), ("a", "f2"), ("a", "f3"), ("a", "f4"),
        ("b", "f1"), ("b", "f2"), ("b", "f3"),
        ("c", "f4"), ("c", "f9"),
        ("a", "f1"),  # duplicate observation must collapse
    ]
    got = {
        (r["host_a"], r["host_b"]): r.asDict()
        for r in mirror_hosts(_df(spark, rows), max_hosts_per_fp=None,
                              min_shared=1).collect()
    }
    ab = got[("a", "b")]
    assert ab["shared_fps"] == 3 and ab["n_a"] == 4 and ab["n_b"] == 3
    assert ab["containment"] == 3 / 3  # min side is b
    assert ab["jaccard"] == 3 / (4 + 3 - 3)
    ac = got[("a", "c")]
    assert ac["shared_fps"] == 1 and ac["jaccard"] == 1 / 5
    assert ("b", "c") not in got


def test_template_cap_drops_boilerplate(spark):
    # the template fp spans 4 hosts; with cap 3 it must neither pair
    # hosts nor count toward denominators
    rows = [(h, "TPL") for h in "abcd"] + [
        ("a", "f1"), ("b", "f1"), ("a", "f2"), ("b", "f2"),
    ]
    got = mirror_hosts(
        _df(spark, rows), max_hosts_per_fp=3, min_shared=1
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["host_a"], r["host_b"]) == ("a", "b")
    assert r["shared_fps"] == 2 and r["n_a"] == 2 and r["n_b"] == 2
    assert r["containment"] == 1.0 and r["jaccard"] == 1.0
    # without the cap the template fp pairs every host
    uncapped = mirror_hosts(
        _df(spark, rows), max_hosts_per_fp=None, min_shared=1
    ).collect()
    assert len(uncapped) == 6  # C(4,2) pairs via TPL (a,b also via f1,f2)


def test_min_shared_and_containment_filters(spark):
    rows = [
        ("a", "f1"), ("a", "f2"), ("a", "f3"), ("a", "f4"),
        ("b", "f1"),
    ]
    # one shared fp: min_shared=2 suppresses the pair
    assert (
        mirror_hosts(_df(spark, rows), max_hosts_per_fp=None,
                     min_shared=2).count() == 0
    )
    # containment = 1/1 (b has one fp) passes 0.9; jaccard would be 0.25
    got = mirror_hosts(
        _df(spark, rows), max_hosts_per_fp=None, min_shared=1,
        min_containment=0.9,
    ).collect()
    assert len(got) == 1 and got[0]["containment"] == 1.0
