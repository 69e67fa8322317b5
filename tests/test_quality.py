"""Gopher/C4-style quality functions + cross-document n-gram coverage.

Values below are hand-computed on tiny fixed docs, so a metric drifting
(e.g. an off-by-one in the n-gram window, or a dedup sneaking into a
count) fails loudly with the exact expectation visible.
"""
import pyspark.sql.functions as F
import pytest

from cord19_crawler_spark.functions.quality import (
    distinct_frac,
    dup_occurrence_frac,
    gopher_flags,
    hash_sample_pred,
    pii_counts,
    redact_pii,
    repetition_metrics,
    top_frac,
    word_ngrams,
)
from cord19_crawler_spark.operators.dedup import duplicated_ngram_coverage


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_word_ngrams_window_and_edges(spark):
    df = _docs(spark, [(1, "aa bb cc dd"), (2, "aa bb"), (3, "aa"), (4, "")])
    out = (
        df.select("doc_id", F.expr("regexp_extract_all(lower(text), '[a-z0-9]{2,}', 0)").alias("t"))
        .select("doc_id", word_ngrams("t", 3).alias("g"))
        .orderBy("doc_id")
        .collect()
    )
    assert out[0]["g"] == ["aa bb cc", "bb cc dd"]
    assert out[1]["g"] == []  # shorter than n — NOT a descending sequence
    assert out[2]["g"] == []
    assert out[3]["g"] == []


def test_array_fraction_metrics_exact(spark):
    # tokens: [key, agg, row, key, agg, key] → n=6, distinct=3
    df = _docs(spark, [(1, "key agg row key agg key")])
    row = (
        df.select(F.expr("regexp_extract_all(lower(text), '[a-z0-9]{2,}', 0)").alias("t"))
        .select(
            distinct_frac("t").alias("d"),
            top_frac("t").alias("top"),
            dup_occurrence_frac("t").alias("dup"),
        )
        .first()
    )
    assert row["d"] == 0.5  # 3/6
    assert row["top"] == 0.5  # 'key' x3 / 6
    assert row["dup"] == pytest.approx(5 / 6, abs=1e-6)  # all but 'row'


def test_fraction_metrics_empty_array(spark):
    row = (
        _docs(spark, [(1, "")])
        .select(F.expr("regexp_extract_all(lower(text), '[a-z0-9]{2,}', 0)").alias("t"))
        .select(distinct_frac("t").alias("d"), top_frac("t").alias("top"),
                dup_occurrence_frac("t").alias("dup"))
        .first()
    )
    assert (row["d"], row["top"], row["dup"]) == (1.0, 0.0, 0.0)


def test_repetition_metrics_known_doc(spark):
    # 'ab cd ab cd ab' → tokens n=5; bigrams: [ab cd, cd ab, ab cd, cd ab]
    # top bigram 2/4; trigrams: [ab cd ab, cd ab cd, ab cd ab] → dup frac:
    # 'ab cd ab' occurs twice (2 positions dup), 'cd ab cd' once → 2/3.
    df = _docs(spark, [(7, "ab cd ab cd ab")])
    row = repetition_metrics(df).first()
    assert row["n_tokens"] == 5
    assert row["distinct_token_frac"] == 0.4
    assert row["top_token_frac"] == 0.6
    assert row["top_bigram_frac"] == 0.5
    assert row["dup_trigram_frac"] == pytest.approx(2 / 3, abs=1e-6)


def test_repetition_metrics_no_shuffle(spark):
    plan = repetition_metrics(
        _docs(spark, [(1, "aa bb")])
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # per-row metric must stay shuffle-free


def test_gopher_flags_rules(spark):
    rows = [
        (1, "the cat sat on the mat with the hat"),  # passes everything
        (2, "aa bb"),  # too few words
        (3, "zz " * 20),  # no stopwords
        (4, "internationalization " * 10),  # mean word len > 10
    ]
    out = {r["doc_id"]: r for r in gopher_flags(_docs(spark, rows)).collect()}
    assert out[1]["keep"] is True
    assert out[2]["flag_word_count"] is False and out[2]["keep"] is False
    assert out[3]["flag_stop_hits"] is False and out[3]["keep"] is False
    assert out[4]["flag_mean_word_len"] is False and out[4]["keep"] is False


def test_redact_pii_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@example.co.uk now"),
            (2, "server at 10.0.255.7 port 80"),
            (3, "call (555) 123-4567 or +1-555-123-4567"),
            (4, "clean text no pii"),
        ],
        ["doc_id", "text"],
    )
    red = {
        r["doc_id"]: r["red"]
        for r in df.select("doc_id", redact_pii(F.col("text")).alias("red")).collect()
    }
    assert red[1] == "mail <EMAIL> now"
    assert red[2] == "server at <IP> port 80"
    assert red[3] == "call <PHONE> or <PHONE>"
    assert red[4] == "clean text no pii"
    counts = pii_counts(F.col("text"))
    agg = df.select(
        *[F.sum(c).alias(k) for k, c in counts.items()]
    ).first()
    assert (agg["email"], agg["ipv4"], agg["phone"]) == (1, 1, 2)


def test_hash_sample_deterministic_and_calibrated(spark):
    df = spark.range(0, 20_000).withColumnRenamed("id", "doc_id")
    kept = df.filter(hash_sample_pred("doc_id", 0.25))
    n1, n2 = kept.count(), kept.count()
    assert n1 == n2  # deterministic, unlike df.sample without seed pinning
    assert 0.22 < n1 / 20_000 < 0.28  # multiplicative hash is near-uniform
    # predicate must reach the scan as a pushed/codegen'd filter, no UDF
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan and "Exchange" not in plan


def test_hash_sample_frac_bounds():
    with pytest.raises(ValueError):
        hash_sample_pred("doc_id", 1.5)


def test_duplicated_ngram_coverage_planted(spark):
    shared = "alpha beta gamma delta"  # 2 shared trigram positions per doc
    rows = [
        (1, f"{shared} uniqueone wordsa"),
        (2, f"{shared} uniquetwo wordsb"),
        (3, "totally different text here now"),
    ]
    out = {
        r["doc_id"]: r
        for r in duplicated_ngram_coverage(_docs(spark, rows), n=3).collect()
    }
    # doc1: 4 trigrams; 'alpha beta gamma' + 'beta gamma delta' shared → 2/4
    assert out[1]["n_ngrams"] == 4 and out[1]["dup_ngrams"] == 2
    assert out[1]["dup_coverage"] == 0.5
    assert out[2]["dup_coverage"] == 0.5
    assert out[3]["dup_ngrams"] == 0 and out[3]["dup_coverage"] == 0.0


def test_duplicated_ngram_coverage_counts_occurrences(spark):
    # the shared gram repeats WITHIN doc 1 — both positions must count as
    # duplicated (coverage is positional, not distinct-gram based)
    rows = [(1, "xx yy xx yy"), (2, "xx yy zz")]
    out = {
        r["doc_id"]: r
        for r in duplicated_ngram_coverage(_docs(spark, rows), n=2).collect()
    }
    # doc1 bigrams: [xx yy, yy xx, xx yy] → 'xx yy' in both docs: 2 of 3
    assert out[1]["n_ngrams"] == 3 and out[1]["dup_ngrams"] == 2
    assert out[2]["dup_ngrams"] == 1  # its single 'xx yy' position


def test_bpe_token_count_parity_and_values(spark):
    """The BPE-ish pre-tokenizer must agree between Java regex (Spark) and
    RE2 (the DuckDB oracle) on apostrophes, digit/letter boundaries,
    whitespace runs, and Unicode letters."""
    import duckdb

    from cord19_crawler_spark.functions.text import (
        BPE_SPLIT_PATTERN,
        bpe_token_count,
    )

    cases = [
        "It's John's dog",  # 5: It / 's / ' John' / 's / ' dog'
        "hello  world",  # 3: run of spaces is one pre-token
        "a1b2 c3",  # 6: letter/digit boundaries split
        "étude naïve 42",  # 3: \p{L} covers accented letters
        "",
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "text"])
    got = {
        r["i"]: r["n"]
        for r in df.select("i", bpe_token_count("text").alias("n")).collect()
    }
    assert [got[i] for i in range(5)] == [5, 3, 6, 3, 0]
    con = duckdb.connect()
    pat = BPE_SPLIT_PATTERN.replace("'", "''")
    for i, c in enumerate(cases):
        (n,) = con.execute(
            f"SELECT len(regexp_extract_all(?, '{pat}'))", [c]
        ).fetchone()
        assert n == got[i], (c, n, got[i])


def test_zipf_fit_planted_power_law(spark):
    """A corpus whose frequencies are exactly freq = 1000 / rank fits
    slope -1, intercept ln(1000)."""
    import math

    import pytest

    from cord19_crawler_spark.operators.termstats import zipf_fit

    rows = []
    for rank in range(1, 21):
        freq = round(1000 / rank)
        rows += [(f"w{rank:03d}_{'x' * rank}",)] * freq
    # distinct words with strictly decreasing counts; word names chosen
    # so freq ties cannot occur (freq differs for every rank here)
    toks = spark.createDataFrame(rows, "word string")
    out = zipf_fit(toks, top_n=20).collect()[0]
    assert out["n_words"] == 20
    # rounding of 1000/rank distorts slightly; generous tolerance
    assert out["slope"] == pytest.approx(-1.0, abs=0.01)
    assert out["intercept"] == pytest.approx(math.log(1000), abs=0.05)
    with pytest.raises(ValueError):
        zipf_fit(toks, top_n=1)


def test_zipf_fit_degenerate_single_word_returns_null(spark):
    from cord19_crawler_spark.operators.termstats import zipf_fit

    toks = spark.createDataFrame([("aa",)] * 7, "word string")
    out = zipf_fit(toks, top_n=10).collect()[0]
    assert out["n_words"] == 1
    assert out["slope"] is None and out["intercept"] is None
