"""Public-suffix-list registrable-domain resolution (frontier/psl.py) and
its wiring into the domain-level politeness budget."""

from pyspark.sql import functions as F

from cord19_crawler_spark.frontier import politeness
from cord19_crawler_spark.frontier.psl import load_psl, with_registrable_domain


def _resolve(spark, psl, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = with_registrable_domain(df, psl)
    return {r["host"]: r["domain"] for r in out.collect()}


def test_registrable_domain_builtin(spark):
    psl = load_psl(spark)
    got = _resolve(spark, psl, [
        "sub.example.co.uk",     # multi-label suffix
        "example.co.uk",
        "co.uk",                 # host IS a public suffix → itself
        "a.b.example.com",       # no rule → default last-two-labels
        "example.com",
        "localhost",             # single label
        "deep.sub.corp.com.au",
    ])
    assert got["sub.example.co.uk"] == "example.co.uk"
    assert got["example.co.uk"] == "example.co.uk"
    assert got["co.uk"] == "co.uk"
    assert got["a.b.example.com"] == "example.com"
    assert got["example.com"] == "example.com"
    assert got["localhost"] == "localhost"
    assert got["deep.sub.corp.com.au"] == "corp.com.au"


def test_wildcard_and_exception_rules(spark):
    psl = load_psl(spark)  # builtin has *.ck and !www.ck
    got = _resolve(spark, psl, [
        "foo.bar.ck",   # *.ck → public suffix bar.ck → registrable foo.bar.ck
        "bar.ck",       # IS a public suffix under *.ck → itself
        "www.ck",       # exception cancels the wildcard → www.ck
        "sub.www.ck",   # exception rule → registrable www.ck
    ])
    assert got["foo.bar.ck"] == "foo.bar.ck"
    assert got["bar.ck"] == "bar.ck"
    assert got["www.ck"] == "www.ck"
    assert got["sub.www.ck"] == "www.ck"


def test_psl_file_format(spark, tmp_path):
    p = tmp_path / "psl.dat"
    p.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "\n"
        "co.uk\n"
        "*.kawasaki.jp\n"
        "!city.kawasaki.jp\n"
    )
    psl = load_psl(spark, str(p))
    got = _resolve(spark, psl, [
        "shop.example.co.uk",
        "a.b.kawasaki.jp",        # wildcard: suffix = b.kawasaki.jp
        "x.city.kawasaki.jp",     # exception: registrable city.kawasaki.jp
    ])
    assert got["shop.example.co.uk"] == "example.co.uk"
    assert got["a.b.kawasaki.jp"] == "a.b.kawasaki.jp"
    assert got["x.city.kawasaki.jp"] == "city.kawasaki.jp"


def test_psl_randomized_vs_reference_resolver(spark, tmp_path):
    """Randomized cross-check: the distributed (explode + broadcast-join +
    longest-match) resolution equals an independent per-host pure-Python
    implementation of the publicsuffix.org algorithm over generated hosts
    hitting exact, wildcard, exception, and no-rule paths."""
    import random

    rules = [
        "co.uk", "ac.uk", "com.au", "co.jp",
        "*.ck", "!www.ck", "*.kawasaki.jp", "!city.kawasaki.jp",
    ]

    def reference_resolve(host: str) -> str:
        # publicsuffix.org algorithm, literal per-host form
        labels = host.split(".")
        matches = []
        for rule in rules:
            exc = rule.startswith("!")
            body = rule.lstrip("!")
            rl = body.split(".")
            if len(rl) > len(labels):
                continue
            tail = labels[-len(rl):]
            ok = all(r == "*" or r == t for r, t in zip(rl, tail))
            if ok:
                matches.append((exc, rl))
        exceptions = [m for m in matches if m[0]]
        if exceptions:
            # prevailing exception: public suffix = rule minus leftmost label
            ps_len = max(len(rl) for _, rl in exceptions) - 1
        elif matches:
            ps_len = max(len(rl) for _, rl in matches)
        else:
            ps_len = 1  # default rule '*'
        reg_len = min(ps_len + 1, len(labels))
        return ".".join(labels[-reg_len:])

    rng = random.Random(13)
    label_pool = ["a", "bb", "corp", "www", "city", "shop", "x9"]
    sfx_pool = ["co.uk", "ck", "www.ck", "kawasaki.jp", "city.kawasaki.jp",
                "com.au", "com", "org", "uk"]
    hosts = sorted({
        ".".join(
            [rng.choice(label_pool) for _ in range(rng.randrange(0, 3))]
            + [rng.choice(sfx_pool)]
        )
        for _ in range(120)
    })
    # build the dimension from OUR rule list via the file-format parse
    # (same code path as production)
    psl_file = tmp_path / "rules.dat"
    psl_file.write_text("// test rules\n" + "\n".join(rules) + "\n")
    psl = load_psl(spark, str(psl_file))
    got = _resolve(spark, psl, hosts)
    want = {h: reference_resolve(h) for h in hosts}
    diffs = {h: (got[h], want[h]) for h in hosts if got[h] != want[h]}
    assert not diffs, dict(list(diffs.items())[:5])


def test_domain_budget_with_psl(spark):
    """With the PSL, sub1/sub2 of one registrable co.uk domain share ONE
    in-flight allowance while a sibling under the same public suffix does
    not (the last-two-labels heuristic would over-group them all)."""
    rows = []
    for sub in ("a", "b"):
        for i in range(4):
            rows.append((f"https://{sub}.corp.co.uk/p{i}", f"{sub}.corp.co.uk",
                         1.0 - i * 0.01))
    rows.append(("https://x.other.co.uk/y", "x.other.co.uk", 0.9))
    elig = (
        spark.createDataFrame(rows, "url string, host string, priority double")
        .withColumn("min_delay_rounds", F.lit(1))
        .withColumn("max_in_flight", F.lit(2))
        .withColumn("last_scheduled_round", F.lit(None).cast("int"))
    )
    psl = load_psl(spark)
    got = politeness.per_host_topk(elig, budget_key="domain", psl=psl).collect()
    corp = sorted(r["url"] for r in got if "corp" in r["host"])
    other = [r["url"] for r in got if "other" in r["host"]]
    # corp.co.uk budget of 2 shared across a.corp + b.corp
    assert len(corp) == 2
    assert corp == ["https://a.corp.co.uk/p0", "https://b.corp.co.uk/p0"]
    assert other == ["https://x.other.co.uk/y"]
    # WITHOUT the PSL, domain_of = last two labels ("co.uk") over-groups:
    # all three hosts share one budget of 2
    merged = politeness.per_host_topk(elig, budget_key="domain").collect()
    assert len(merged) == 2
