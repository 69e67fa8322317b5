"""Boilerplate block extraction (functions/html.py:text_blocks /
main_text): segmentation, link-density and min-words rules, entity
safety, and the all-boilerplate page row."""

from cord19_crawler_spark.functions.html import main_text, text_blocks

DOC = (
    "<html><head><title>T</title><style>p{color:red}</style></head>"
    "<body>"
    '<nav><a href="/h">Home</a> <a href="/a">About</a> '
    '<a href="/c">Contact</a></nav>'
    "<p>The quick brown fox jumps over the lazy dog today.</p>"
    "<div>See the &lt;code&gt; docs &amp; the manual for details here.</div>"
    '<div><a href="/x">linky</a> tiny</div>'
    "<footer>Copyright 2026</footer>"
    "<script>var x = '<p>not a block</p>';</script>"
    "</body></html>"
)


def _blocks(spark, html):
    df = spark.createDataFrame([("u", html)], "url string, html string")
    return sorted(
        text_blocks(df).collect(), key=lambda r: r["block_pos"]
    )


def test_segmentation_and_rules(spark):
    rows = _blocks(spark, DOC)
    by_text = {r["text"]: r for r in rows}
    prose = by_text["The quick brown fox jumps over the lazy dog today."]
    assert prose["kept"] is True and prose["n_words"] == 10
    assert prose["link_density"] == 0.0
    # entities decode AFTER tag strip: '<code>' survives as text
    ent = by_text["See the <code> docs & the manual for details here."]
    assert ent["kept"] is True
    # pure-navigation block: words < 5 AND link-dominated
    nav = by_text["Home About Contact"]
    assert nav["kept"] is False and nav["link_density"] > 0.9
    linky = by_text["linky tiny"]
    assert linky["kept"] is False
    foot = by_text["Copyright 2026"]
    assert foot["kept"] is False and foot["n_words"] == 2
    # script content never became a block
    assert not any("not a block" in t for t in by_text)


def test_main_text_and_empty_page(spark):
    df = spark.createDataFrame(
        [("u1", DOC), ("u2", "<nav><a href='/'>x</a></nav>")],
        "url string, html string",
    )
    got = {r["url"]: r for r in main_text(df).collect()}
    assert got["u1"]["text"].startswith("The quick brown fox")
    assert "docs & the manual" in got["u1"]["text"]
    assert got["u1"]["n_blocks_kept"] == 2
    # all-boilerplate page keeps a row with empty text
    assert got["u2"]["text"] == "" and got["u2"]["n_blocks_kept"] == 0


def test_scan_side_plan(spark):
    df = spark.createDataFrame([("u", DOC)], "url string, html string")
    plan = text_blocks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
