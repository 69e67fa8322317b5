"""Scalar + product quantization (operators/quantize.py): planted code
rules, degenerate dims, exact-rerank equivalence with brute force, and a
Python replay of the PQ encode/ADC chain."""

import math
import random

import pytest
from pyspark.sql import functions as F

from cord19_crawler_spark.operators.quantize import (
    pq_adc_topk,
    pq_codebook,
    pq_encode,
    sq_minmax,
    sq_quantize,
    sq_search,
)
from cord19_crawler_spark.operators.similarity import cosine_topk


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_sq_codes_planted_and_degenerate_dim(spark):
    # dim1 spans [0, 10]; dim2 is constant (degenerate -> code 0)
    rows = [(1, [0.0, 7.0]), (2, [10.0, 7.0]), (3, [5.0, 7.0])]
    e = _emb(spark, rows)
    codes = {
        r["vec_id"]: r["codes"]
        for r in sq_quantize(e, sq_minmax(e)).collect()
    }
    assert codes[1] == [0, 0]
    assert codes[2] == [255, 0]
    # 5.0 -> floor(0.5*255 + 0.5) = floor(128.0) = 128
    assert codes[3] == [128, 0]


def test_sq_search_full_rerank_equals_brute_force(spark):
    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    e = _emb(spark, rows)
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    t = e.filter(F.col("vec_id") != 0)
    got = sq_search(t, q, k=10, rerank=59).collect()
    want = cosine_topk(t, rows[0][1], k=10).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in want
    ]
    # approx within the quantization error envelope of exact
    for r in got:
        assert abs(r["approx_cosine"] - r["cosine"]) < 0.05
    with pytest.raises(ValueError):
        sq_search(t, q, k=10, rerank=5)


def _pq_replay(rows, qvec, m, sub, ksub):
    seeds = sorted(rows)[:ksub]
    cb = {}  # (subspace, code) -> codeword
    for code, (_, v) in enumerate(seeds):
        for s in range(m):
            cb[(s, code)] = v[s * sub : (s + 1) * sub]
    codes = {}
    for vid, v in rows:
        if vid == 0:
            continue
        for s in range(m):
            svec = v[s * sub : (s + 1) * sub]
            best = min(
                (
                    (
                        round(
                            sum((a - b) ** 2 for a, b in zip(svec, cb[(s, c)])),
                            9,
                        ),
                        c,
                    )
                    for c in range(ksub)
                ),
            )
            codes[(vid, s)] = best[1]
    lut = {
        (s, c): sum(
            (a - b) ** 2
            for a, b in zip(qvec[s * sub : (s + 1) * sub], cb[(s, c)])
        )
        for s in range(m)
        for c in range(ksub)
    }
    adist = {}
    for (vid, s), c in codes.items():
        adist[vid] = adist.get(vid, 0.0) + lut[(s, c)]
    return codes, {v: round(d, 6) for v, d in adist.items()}


def test_pq_matches_python_replay(spark):
    rng = random.Random(7)
    m, sub, ksub, dims = 2, 3, 4, 6
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dims)]) for i in range(25)]
    e = _emb(spark, rows)
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    t = e.filter(F.col("vec_id") != 0)
    cb = pq_codebook(e, m=m, ksub=ksub, dims=dims)
    codes = pq_encode(t, cb, m=m, dims=dims)
    got_codes = {
        (r["vec_id"], r["subspace"]): r["code"] for r in codes.collect()
    }
    want_codes, want_adist = _pq_replay(rows, rows[0][1], m, sub, ksub)
    assert got_codes == want_codes
    got = pq_adc_topk(codes, cb, q, k=24, m=m, dims=dims).collect()
    for r in got:
        assert r["adist"] == pytest.approx(want_adist[r["vec_id"]], abs=1e-6)
    order = [(r["adist"], r["vec_id"]) for r in got]
    assert order == sorted(order)


def test_pq_codeword_vector_encodes_to_itself(spark):
    # vectors 1..4 ARE the codebook (lowest ids): each must take its own
    # code in every subspace, and its ADC distance to itself must be ~0
    dims, m, ksub = 4, 2, 4
    base = [[float(i + 1)] * dims for i in range(ksub)]
    rows = [(i + 1, base[i]) for i in range(ksub)]
    e = _emb(spark, rows)
    cb = pq_codebook(e, m=m, ksub=ksub, dims=dims)
    codes = pq_encode(e, cb, m=m, dims=dims)
    for r in codes.collect():
        assert r["code"] == r["vec_id"] - 1
    q = e.filter(F.col("vec_id") == 3).select(F.col("embedding").alias("qv"))
    top = pq_adc_topk(codes, cb, q, k=1, m=m, dims=dims).collect()
    assert top[0]["vec_id"] == 3 and top[0]["adist"] == 0.0


def test_pq_dims_validation(spark):
    e = _emb(spark, [(1, [1.0, 2.0, 3.0])])
    with pytest.raises(ValueError):
        pq_codebook(e, m=2, dims=3)
    with pytest.raises(ValueError):
        pq_encode(e, e, m=2, dims=3)
