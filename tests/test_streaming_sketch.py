"""Streaming HyperLogLog (streaming/sketch.py): the last emitted
estimate per group must be BIT-IDENTICAL to the batch hll_cardinality
over the same keys, and state must survive a restart so the continued
stream equals a one-shot batch over the union."""

import pytest
from pyspark.sql import functions as F

from cord19_crawler_spark.operators.sketches import hll_cardinality
from cord19_crawler_spark.streaming.sketch import hll_distinct_stream

_P = 8


def _write_events(spark, rows, in_dir):
    spark.createDataFrame(rows, "g string, k string").write.mode(
        "append"
    ).parquet(in_dir)


def _run_once(spark, in_dir, out_dir, ckpt):
    stream = (
        spark.readStream.schema("g string, k string").parquet(in_dir)
    )
    out = hll_distinct_stream(stream, key_col="k", group_col="g", p=_P)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def _last_estimates(spark, out_dir):
    """Last emitted row per group (snapshot-log convention)."""
    df = spark.read.parquet(out_dir).withColumn(
        "_f", F.col("_metadata.file_modification_time")
    )
    pdf = df.toPandas()
    # parquet append order is monotone across runs; within a run each
    # group appears at most once per trigger
    pdf = pdf.sort_values("_f").groupby("group").tail(1)
    return {
        r["group"]: (r["buckets_used"], r["hll_est"])
        for _, r in pdf.iterrows()
    }


def _batch_estimates(spark, rows):
    df = spark.createDataFrame(rows, "g string, k string")
    return {
        r["g"]: (r["buckets_used"], r["hll_est"])
        for r in hll_cardinality(df, "k", group_cols=("g",), p=_P).collect()
    }


def test_stream_estimate_equals_batch_bit_for_bit(spark, tmp_path):
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    rows = [("hostA", f"u{i}") for i in range(500)] + [
        ("hostB", f"u{i}") for i in range(40)
    ]
    _write_events(spark, rows, in_dir)
    _run_once(spark, in_dir, out_dir, ckpt)
    assert _last_estimates(spark, out_dir) == _batch_estimates(spark, rows)


def test_stream_state_survives_restart(spark, tmp_path):
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    first = [("hostA", f"u{i}") for i in range(300)]
    _write_events(spark, first, in_dir)
    _run_once(spark, in_dir, out_dir, ckpt)
    # second run: overlapping + new keys; a fresh-state run would
    # underestimate, a restored-state run must match batch-over-union
    second = [("hostA", f"u{i}") for i in range(150, 600)]
    _write_events(spark, second, in_dir)
    _run_once(spark, in_dir, out_dir, ckpt)
    assert _last_estimates(spark, out_dir) == _batch_estimates(
        spark, first + second
    )


def test_with_hll_cells_validation(spark):
    from cord19_crawler_spark.streaming.sketch import with_hll_cells

    df = spark.createDataFrame([("a", "b")], "g string, k string")
    with pytest.raises(ValueError):
        with_hll_cells(df, "k", "g", p=3)
