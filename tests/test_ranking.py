"""Two-phase global row numbering (operators/ranking.py): identical output
to the single-reducer window, at several shapes, with NO unpartitioned
WindowExec in the physical plan."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from cord19_crawler_spark.operators.ranking import global_row_number


def _window_rank(df, order_by, name):
    return df.withColumn(name, F.row_number().over(Window.orderBy(*order_by)))


def test_matches_global_window_numeric(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") * 37 % 1000).alias("k"), F.col("id").alias("tie")
    ).repartition(8)
    order = [F.desc("k"), F.asc("tie")]
    got = {(r["k"], r["tie"]): r["rn"]
           for r in global_row_number(df, order, "rn", num_partitions=6).collect()}
    want = {(r["k"], r["tie"]): r["rn"] for r in _window_rank(df, order, "rn").collect()}
    assert got == want


def test_matches_global_window_struct_key(spark):
    # the lexicon orders by a struct (first_at) — range partitioning must
    # handle struct sort keys
    df = spark.createDataFrame(
        [((i % 7, i), f"w{i}") for i in range(200)],
        "first_at struct<a:int,b:int>, word string",
    ).repartition(5)
    order = [F.asc("first_at"), F.asc("word")]
    got = {r["word"]: r["rn"]
           for r in global_row_number(df, order, "rn", num_partitions=4).collect()}
    want = {r["word"]: r["rn"] for r in _window_rank(df, order, "rn").collect()}
    assert got == want


def test_empty_input(spark):
    df = spark.createDataFrame([], "k int")
    assert global_row_number(df, [F.asc("k")], "rn").count() == 0


def test_no_unpartitioned_window_in_plan(spark):
    # checkpoint=False keeps the range exchange visible in the plan (the
    # default eagerly checkpoints it away into stored blocks)
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    out = global_row_number(df, [F.asc("k")], "rn", num_partitions=4,
                            checkpoint=False)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # every Window in the plan must carry a partition spec
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_pid" in line, f"unpartitioned window: {line}"
    # and the ranked side is range-partitioned for order preservation
    assert "REPARTITION_BY_NUM" in plan or "RangePartitioning" in plan or "rangepartitioning" in plan.lower()


def test_rank_dtype_long_and_int_overflow_fail_fast(spark, monkeypatch):
    import cord19_crawler_spark.operators.ranking as ranking

    df = spark.range(0, 50).select(F.col("id").alias("k"))
    out = global_row_number(df, [F.asc("k")], "rn", dtype="long")
    assert dict(out.dtypes)["rn"] == "bigint"
    assert {r["k"]: r["rn"] for r in out.collect()} == {i: i + 1 for i in range(50)}
    # past INT_MAX rows the default int rank must refuse, not wrap
    monkeypatch.setattr(ranking, "_INT_MAX", 10)
    try:
        ranking.global_row_number(df, [F.asc("k")], "rn")
        raise AssertionError("expected ValueError on int overflow")
    except ValueError as e:
        assert "dtype='long'" in str(e)


def test_lexicon_and_docmap_unchanged(spark):
    from cord19_crawler_spark.operators.indexing import (
        doc_id_mapping,
        lexicon,
        postings,
        tokens_from_text,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 11} gamma") for i in range(60)],
        "doc_id long, text string",
    )
    toks = tokens_from_text(docs)
    lex = lexicon(toks)
    rows = {r["word"]: r["word_id"] for r in lex.collect()}
    # first-encounter order: alpha(pos0) < beta(pos1) < w0(pos2) < gamma(pos3) < w1...
    assert rows["alpha"] == 1 and rows["beta"] == 2 and rows["w0"] == 3
    assert rows["gamma"] == 4 and rows["w1"] == 5
    dm = {r["doc_id"]: r["int_id"] for r in doc_id_mapping(postings(toks)).collect()}
    assert dm == {i: i + 1 for i in range(60)}


def test_global_running_sum_matches_window(spark):
    """global_running_sum (two-phase prefix sum) must equal the
    single-reducer window's inclusive cumulative sum under a total order,
    including ties on the primary key (doc_id tie-break)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cord19_crawler_spark.operators.ranking import global_running_sum

    rng = random.Random(13)
    rows = [(i, rng.choice([1.0, 2.0, 2.0, 5.0]), rng.randint(1, 40))
            for i in range(457)]
    df = spark.createDataFrame(rows, "doc_id long, key double, val long")
    order = [F.desc("key"), F.asc("doc_id")]
    got = {
        r["doc_id"]: r["rs"]
        for r in global_running_sum(df, order, "val", name="rs").collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["doc_id"]: r["rs"]
        for r in df.withColumn("rs", F.sum("val").over(w)).collect()
    }
    assert got == want
    # empty input: no crash, no rows
    empty = spark.createDataFrame([], "doc_id long, key double, val long")
    assert global_running_sum(empty, order, "val").count() == 0
