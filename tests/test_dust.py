"""DUST URL-alias rule mining (frontier/dust.py): planted rules are
recovered with exact support/refutation counts, mixed evidence lands at
the right precision, no-op rules never appear, the param alphabet cap
binds deterministically, and the plan is linear (no pair join)."""
import pyspark.sql.functions as F
import pytest

from cord19_crawler_spark.frontier.dust import url_alias_rules


def _mine(spark, rows, **kw):
    df = spark.createDataFrame(rows, "url string, content_fp string")
    return {r["rule"]: r for r in url_alias_rules(df, **kw).collect()}


def test_planted_rules_recovered(spark):
    rows = [
        # sid is a session param: two contents, each under 2 sid spellings
        # + the bare form -> 2 supporting groups, 2 aliases each
        ("https://s.com/a?id=1", "A"),
        ("https://s.com/a?id=1&sid=x", "A"),
        ("https://s.com/a?id=1&sid=y", "A"),
        ("https://s.com/b?id=2", "B"),
        ("https://s.com/b?id=2&sid=z", "B"),
        # trailing slash: one supporting group per content
        ("https://s.com/c", "C"),
        ("https://s.com/c/", "C"),
        ("https://s.com/d", "D"),
        ("https://s.com/d/", "D"),
        # www alias
        ("https://www.s.com/e", "E"),
        ("https://s.com/e", "E"),
        ("https://www.s.com/f", "F"),
        ("https://s.com/f", "F"),
    ]
    got = _mine(spark, rows, min_support=2)
    sid = got["strip_param:sid"]
    assert sid["support_groups"] == 2 and sid["refuted_groups"] == 0
    # group A merges 3 spellings (2 aliases), group B merges 2 (1 alias)
    assert sid["aliases_collapsed"] == 3
    assert sid["precision"] == 1.0
    ts = got["trailing_slash"]
    assert ts["support_groups"] == 2 and ts["aliases_collapsed"] == 2
    www = got["strip_www"]
    assert www["support_groups"] == 2 and www["aliases_collapsed"] == 2
    # id determines content AND rides in nothing else; stripping it never
    # merges two spellings (paths differ), so the rule is absent
    assert "strip_param:id" not in got


def test_refutation_and_mixed_precision(spark):
    rows = [
        # page changes content on h0 (refutes) ...
        ("https://h0.com/list?page=1", "P1"),
        ("https://h0.com/list?page=2", "P2"),
        # ... but is irrelevant on h1 and h2 (supports twice)
        ("https://h1.com/list?page=1", "Q"),
        ("https://h1.com/list?page=2", "Q"),
        ("https://h2.com/list?page=1", "R"),
        ("https://h2.com/list?page=2", "R"),
    ]
    got = _mine(spark, rows, min_support=2)
    page = got["strip_param:page"]
    assert page["n_groups"] == 3
    assert page["support_groups"] == 2 and page["refuted_groups"] == 1
    assert page["precision"] == pytest.approx(2 / 3, abs=1e-6)
    # a fully-refuted rule never clears min_support
    got1 = _mine(spark, rows[:2], min_support=1)
    assert "strip_param:page" not in got1


def test_min_support_and_param_cap(spark):
    rows = [
        ("https://s.com/a?id=1", "A"),
        ("https://s.com/a?id=1&sid=x", "A"),      # sid support = 1 group
        ("https://s.com/b?id=2&zz=1", "B"),
        ("https://s.com/b?id=2&zz=1&sid=y", "B"),  # sid support = 2 groups
    ]
    assert "strip_param:sid" in _mine(spark, rows, min_support=2)
    assert "strip_param:sid" not in _mine(spark, rows, min_support=3)
    # max_params=1 keeps only the most frequent name (count desc, name
    # asc): id appears in 4 urls, sid in 2, zz in 2 -> only id survives,
    # and id has no support, so no strip_param rules at all
    capped = _mine(spark, rows, max_params=1, min_support=1)
    assert not any(r.startswith("strip_param:") for r in capped)


def test_param_order_insensitive_and_unparseable_dropped(spark):
    rows = [
        # same params, different order: identical ORIGINAL key, so the
        # pair must NOT count as an alias group under any rule
        ("https://s.com/a?x=1&y=2", "A"),
        ("https://s.com/a?y=2&x=1", "A"),
        ("not a url", "Z"),
    ]
    got = _mine(spark, rows, min_support=1)
    assert got == {}


def test_dynamic_content_refutes_only_when_grouped(spark):
    rows = [
        # one spelling, two fps: group of one original -> never counted
        ("https://s.com/a?id=1", "A1"),
        ("https://s.com/a?id=1", "A2"),
        # grouped with an alias spelling -> 3 fps? no: 2 originals,
        # fps {A1, A2} on one, {A1} on the other -> n_fps = 2 -> refuted
        ("https://s.com/a?id=1&sid=x", "A1"),
        # clean support elsewhere keeps the rule above min_support
        ("https://s.com/b?id=2", "B"),
        ("https://s.com/b?id=2&sid=y", "B"),
        ("https://s.com/c?id=3", "C"),
        ("https://s.com/c?id=3&sid=z", "C"),
    ]
    got = _mine(spark, rows, min_support=2)
    sid = got["strip_param:sid"]
    assert sid["support_groups"] == 2 and sid["refuted_groups"] == 1
    assert sid["precision"] == pytest.approx(2 / 3, abs=1e-6)


def test_plan_is_linear_no_pair_join(spark):
    df = spark.createDataFrame(
        [("https://s.com/a?id=1", "A")], "url string, content_fp string"
    )
    plan = url_alias_rules(df)._jdf.queryExecution().executedPlan().toString()
    # the only join is the broadcast rule fan-out; a pair-mining
    # implementation would sort-merge the fetch log against itself
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_apply_alias_rules(spark):
    from cord19_crawler_spark.frontier.dust import apply_alias_rules

    rows = [
        # sid perfect; page mixed (refuted on h0, supported on h1/h2)
        ("https://s.com/a?id=1", "A"),
        ("https://s.com/a?id=1&sid=x", "A"),
        ("https://s.com/b?id=2", "B"),
        ("https://s.com/b?id=2&sid=y", "B"),
        ("https://h0.com/list?page=1", "P1"),
        ("https://h0.com/list?page=2", "P2"),
        ("https://h1.com/list?page=1", "Q"),
        ("https://h1.com/list?page=2", "Q"),
        ("https://h2.com/list?page=1", "R"),
        ("https://h2.com/list?page=2", "R"),
        ("https://www.s.com/e", "E"),
        ("https://s.com/e", "E"),
        ("https://www.s.com/f", "F"),
        ("https://s.com/f", "F"),
    ]
    df = spark.createDataFrame(rows, "url string, content_fp string")
    rules = url_alias_rules(df, min_support=2)
    out = apply_alias_rules(df, rules, min_precision=0.9)
    got = {r["url"]: r["url_canonical"] for r in out.collect()}
    # sid (precision 1.0) is stripped; www (1.0) collapses
    assert got["https://s.com/a?id=1&sid=x"] == "https://s.com/a?id=1"
    assert got["https://www.s.com/e"] == "https://s.com/e"
    # page (precision 2/3) stays below the threshold -> untouched
    assert got["https://h1.com/list?page=2"] == "https://h1.com/list?page=2"
    # at a looser floor the mixed rule applies too
    loose = apply_alias_rules(df, rules, min_precision=0.5)
    got_loose = {r["url"]: r["url_canonical"] for r in loose.collect()}
    assert got_loose["https://h1.com/list?page=2"] == "https://h1.com/list"


def test_apply_passthrough_and_no_rules(spark):
    from cord19_crawler_spark.frontier.dust import apply_alias_rules

    rows = [
        ("https://s.com/a?id=1", "A"),
        ("https://s.com/a?id=1&sid=x", "A"),
        ("https://s.com/b?id=2", "B"),
        ("https://s.com/b?id=2&sid=y", "B"),
        ("not a url", "Z"),
    ]
    df = spark.createDataFrame(rows, "url string, content_fp string")
    rules = url_alias_rules(df, min_support=2)
    got = {
        r["url"]: r["url_canonical"]
        for r in apply_alias_rules(df, rules).collect()
    }
    # unparseable rows pass through verbatim
    assert got["not a url"] == "not a url"
    # an empty selection (impossible precision floor) is the identity
    # modulo param re-sorting; on already-sorted URLs it is exact
    ident = apply_alias_rules(df, rules, min_precision=1.1)
    assert all(
        r["url"] == r["url_canonical"] for r in ident.collect()
    )


def test_python_replay_randomized(spark):
    import itertools
    import random

    rng = random.Random(7)
    rows = []
    for i in range(120):
        c = rng.randrange(8)
        v = rng.randrange(4)
        url = f"https://s.com/p{c}?id={c}"
        if v == 1:
            url += f"&sid={rng.randrange(5)}"
        elif v == 2:
            url = f"https://www.s.com/p{c}?id={c}"
        elif v == 3:
            url = f"https://s.com/p{c}/?id={c}"
        rows.append((url, f"fp{c}"))
    got = _mine(spark, rows, min_support=1)

    # straight-line replay of the documented semantics
    def parse(u):
        rest = u.split("://", 1)[1]
        hostpath, _, q = rest.partition("?")
        host, slash, path = hostpath.partition("/")
        params = sorted(p for p in q.split("&") if p)
        return host, slash + path if slash else "", params

    parsed = [parse(u) + (fp,) for u, fp in rows]
    pnames = sorted({n.split("=")[0] for _, _, ps, _ in parsed for n in ps})
    rules = [("strip_param:" + n, n) for n in pnames]
    rules += [("trailing_slash", None), ("strip_www", None)]
    expect = {}
    for rule, arg in rules:
        groups = {}
        for host, path, params, fp in parsed:
            h, p, ps = host, path, params
            if rule == "strip_www" and h.startswith("www."):
                h = h[4:]
            if rule == "trailing_slash":
                p = p.rstrip("/")
            if arg is not None:
                ps = [x for x in ps if x.split("=")[0] != arg]
            norm = h + p + ("?" + "&".join(ps) if ps else "")
            orig = host + path + ("?" + "&".join(params) if params else "")
            groups.setdefault(norm, []).append((orig, fp))
        sup = ref = aliases = 0
        for members in groups.values():
            origs = {o for o, _ in members}
            fps = {f for _, f in members}
            if len(origs) > 1:
                if len(fps) == 1:
                    sup += 1
                    aliases += len(origs) - 1
                else:
                    ref += 1
        if sup >= 1:
            expect[rule] = (sup, ref, aliases)
    assert {
        r: (g["support_groups"], g["refuted_groups"], g["aliases_collapsed"])
        for r, g in got.items()
    } == expect
