"""Composed curation pipeline (plans/curation_pipeline.py, r4 verdict
item #4): per-stage flags on a planted corpus, visibility (one output row
per input doc, always), budget semantics, the scan-side plan assertion
(the fused scalar projection has NO exchange), and curated_shards."""
import pyspark.sql.functions as F
import pytest

from cord19_crawler_spark.plans.curation_pipeline import (
    curation_report,
    curated_shards,
)

# long enough to pass gopher min_words=8 and carry c4 sentences; 'he said
# so.' lines end with terminal punctuation and have >= 3 words
GOOD = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa said so ok.\n"
    "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi said ok.\n"
    "one two three four five six seven eight nine ten eleven said ok yes.\n"
)


def _docs(spark):
    rows = [
        (1, GOOD, "en"),
        (2, GOOD, "en"),  # exact duplicate of 1 -> canonical=False
        (3, GOOD + "extra words to vary quality a bit more here ok.\n", "en"),
        (4, "tiny.", "en"),  # fails gopher min_words
        (5, GOOD.replace("\n", " "), "xx"),  # one line, no sentence lines? still has '.'
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _report(spark, token_budget=None):
    return curation_report(
        _docs(spark),
        quality_p=0.0,  # threshold = group min -> quality_keep True where defined
        token_budget=token_budget,
        gopher_kwargs=dict(min_words=8, min_stop_hits=0),
        c4_kwargs=dict(min_line_words=3, min_sentences=2),
    )


def test_stage_flags_and_visibility(spark):
    rep = {r["doc_id"]: r for r in _report(spark).collect()}
    assert set(rep) == {1, 2, 3, 4, 5}  # every input doc visible
    assert rep[1]["canonical"] is True
    assert rep[2]["canonical"] is False  # exact dup loses to min id
    assert rep[2]["kept"] is False
    assert rep[4]["gopher_keep"] is False and rep[4]["kept"] is False
    assert rep[1]["gopher_keep"] and rep[1]["c4_keep"]
    assert rep[1]["quality_keep"] is True
    assert rep[1]["kept"] is True
    # no budget -> cum_tokens NULL, in_budget == survivor
    assert rep[1]["cum_tokens"] is None and rep[1]["in_budget"] is True


def test_token_budget_cuts_in_quality_order(spark):
    rep_all = {r["doc_id"]: r for r in _report(spark).collect()}
    survivors = sorted(
        (d for d, r in rep_all.items() if r["kept"]),
        key=lambda d: (-rep_all[d]["quality"], d),
    )
    assert len(survivors) >= 2
    first_tokens = rep_all[survivors[0]]["n_tokens"]
    rep_b = {
        r["doc_id"]: r for r in _report(spark, token_budget=first_tokens).collect()
    }
    kept_b = {d for d, r in rep_b.items() if r["kept"]}
    assert kept_b == {survivors[0]}  # budget admits exactly the best doc
    assert rep_b[survivors[0]]["cum_tokens"] == first_tokens
    # later survivors carry their cumulative sum but fall out of budget
    assert rep_b[survivors[1]]["in_budget"] is False
    assert rep_b[survivors[1]]["cum_tokens"] > first_tokens
    # non-survivors never enter the ranking
    assert rep_b[4]["cum_tokens"] is None


def test_null_text_and_null_group_rows_stay_visible(spark):
    """NULL text yields a NULL fingerprint and NULL lang a NULL quantile
    group; both joins are null-SAFE, so these rows must surface in the
    report (one row per input document) instead of vanishing on a
    null-unsafe key — the review-found regression this pins."""
    docs = spark.createDataFrame(
        [
            (1, GOOD, "en"),
            (2, None, "en"),  # NULL text -> NULL fingerprint
            (3, None, "en"),  # second NULL-text doc: same NULL-fp group
            (4, GOOD + "more words here ok.\n", None),  # NULL lang group
        ],
        "doc_id long, text string, lang string",
    )
    rep = {
        r["doc_id"]: r
        for r in curation_report(
            docs,
            quality_p=0.0,
            gopher_kwargs=dict(min_words=8, min_stop_hits=0),
            c4_kwargs=dict(min_line_words=3, min_sentences=2),
        ).collect()
    }
    assert set(rep) == {1, 2, 3, 4}  # nothing vanishes
    # NULL-text docs form ONE NULL-fp dedup group: min id is canonical
    assert rep[2]["canonical"] is True
    assert rep[3]["canonical"] is False
    assert rep[2]["kept"] is False and rep[3]["kept"] is False
    # NULL-lang doc gets its own group's real threshold (null-safe join)
    assert rep[4]["threshold"] is not None
    assert rep[4]["quality_keep"] is True
    assert rep[4]["kept"] is True


def test_quality_threshold_is_per_group(spark):
    docs = spark.createDataFrame(
        [
            (1, GOOD, "en"),
            (2, GOOD + GOOD, "en"),
            (3, "short one here said ok so fine yes done now really good.", "xx"),
            (4, "short two here said ok so fine yes done now really good" * 3 + ".", "xx"),
        ],
        "doc_id long, text string, lang string",
    )
    rep = curation_report(
        docs,
        quality_p=0.5,
        gopher_kwargs=dict(min_words=2, min_stop_hits=0),
        c4_kwargs=dict(min_line_words=1, min_sentences=1),
    )
    rows = {r["doc_id"]: r for r in rep.collect()}
    # thresholds differ by group (different score distributions)
    assert rows[1]["threshold"] == rows[2]["threshold"]
    assert rows[3]["threshold"] == rows[4]["threshold"]
    assert rows[1]["threshold"] != rows[3]["threshold"]


def test_scan_side_projection_has_no_exchange(spark):
    """The fused scalar stage (token count + quality + fingerprint) must
    be ONE scan-side projection: no Exchange in its plan. This is the
    'corpus scanned once per stage, no avoidable shuffle between
    scan-side stages' guarantee of the composed pipeline."""
    from cord19_crawler_spark.functions.text import (
        fingerprint,
        quality_score,
        token_count,
    )

    docs = _docs(spark)
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("lang"),
        token_count("text").cast("long").alias("n_tokens"),
        quality_score("text").alias("quality"),
        fingerprint("text").alias("_fp"),
    )
    plan = base._sc._jvm.PythonSQLUtils.explainString(
        base._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    # and the full composed report must never cartesian-join
    full = _report(spark, token_budget=100)
    fplan = full._sc._jvm.PythonSQLUtils.explainString(
        full._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in fplan


def test_curated_shards_roundtrip(spark):
    docs = _docs(spark)
    rep = _report(spark)
    out = curated_shards(docs, rep, n_shards=2, seed=7).collect()
    kept_ids = {r["doc_id"] for r in rep.collect() if r["kept"]}
    assert {r["doc_id"] for r in out} == kept_ids
    assert all(0 <= r["shard"] < 2 for r in out)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))


def test_param_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="quality_p"):
        curation_report(docs, quality_p=1.5)
    with pytest.raises(ValueError, match="token_budget"):
        curation_report(docs, token_budget=-1)
