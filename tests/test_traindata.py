"""Training-data corpus ops (operators/traindata.py): hand-computed
decontamination overlaps, exact temperature-sampling rates vs a Python
replay of the Knuth-hash predicate, and next-fit packing including the
oversize-document and empty-document edges."""
import pyspark.sql.functions as F
import pytest

from cord19_crawler_spark.operators.traindata import (
    _KNUTH,
    _M32,
    benchmark_decontamination,
    pack_sequences,
    temperature_mixture_sample,
)


def test_decontamination_hand_case(spark):
    # bench doc 0 has grams {aa bb cc, bb cc dd}; doc 1 shares BOTH
    # (frac 1.0 over its 2 distinct grams), doc 2 shares one of three,
    # doc 3 shares none, doc 4 too short for any trigram -> absent.
    docs = spark.createDataFrame(
        [
            (0, "aa bb cc dd"),
            (1, "aa bb cc dd"),
            (2, "bb cc dd ee ff"),
            (3, "qq rr ss tt"),
            (4, "uu vv"),
        ],
        "doc_id long, text string",
    )
    out = benchmark_decontamination(docs, F.col("doc_id") == 0, n=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert (rows[1]["n_grams"], rows[1]["n_contaminated"]) == (2, 2)
    assert rows[1]["contamination_frac"] == 1.0 and rows[1]["is_contaminated"]
    assert (rows[2]["n_grams"], rows[2]["n_contaminated"]) == (3, 1)
    assert rows[2]["contamination_frac"] == pytest.approx(0.333333)
    assert (rows[3]["n_contaminated"], rows[3]["is_contaminated"]) == (0, False)


def test_decontamination_broadcast_plan(spark):
    docs = spark.createDataFrame(
        [(0, "aa bb cc"), (1, "aa bb cc")], "doc_id long, text string"
    )
    out = benchmark_decontamination(docs, F.col("doc_id") == 0, n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # bench gram set never shuffles the corpus


def test_temperature_sample_rates_and_membership(spark):
    # 8 docs in src_a, 2 in src_b; alpha=0.5, target 50% of 10 docs = 5.
    # w_a=sqrt(8), w_b=sqrt(2); p_a=2/3, p_b=1/3 -> rate_a=5*(2/3)/8,
    # rate_b=min(1, 5*(1/3)/2).
    rows = [(i, "src_a") for i in range(8)] + [(100 + i, "src_b") for i in range(2)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mixture_sample(docs, alpha=0.5, target_frac=0.5)
    got = {r["doc_id"]: r["keep_rate"] for r in out.collect()}
    rate_a = (5 * 2 / 3) / 8
    rate_b = min(1.0, (5 * 1 / 3) / 2)
    expected = {}
    for doc_id, src in rows:
        r = rate_a if src == "src_a" else rate_b
        if (doc_id * _KNUTH) % _M32 < int(r * _M32):
            expected[doc_id] = round(r, 6)
    assert got == expected
    assert len(expected) > 0  # the hand case actually keeps something


def test_temperature_sample_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    a = sorted(temperature_mixture_sample(docs).collect())
    b = sorted(temperature_mixture_sample(docs).collect())
    assert a == b


def test_pack_sequences_hand_case(spark):
    # one shard (num_shards=1), budget 10, docs in id order with token
    # counts 4,4,4,25,3,0,9 ->
    #   seq0: 4+4 (8); seq1: 4; seq2: 25 (oversize, alone);
    #   seq3: 3+0 (empty doc packs into current); then 3+9>10 -> seq4: 9
    texts = {
        0: "aa bb cc dd",
        1: "aa bb cc dd",
        2: "aa bb cc dd",
        3: " ".join(["tok"] * 25),
        4: "aa bb cc",
        5: "x y z",  # 1-char words -> 0 tokens
        6: " ".join(["tok"] * 9),
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    out = pack_sequences(docs, budget=10, num_shards=1)
    rows = {r["doc_id"]: (r["n_tokens"], r["seq_id"]) for r in out.collect()}
    assert rows == {
        0: (4, 0),
        1: (4, 0),
        2: (4, 1),
        3: (25, 2),
        4: (3, 3),
        5: (0, 3),
        6: (9, 4),
    }


def test_traindata_plan_shapes(spark, sf_dir):
    # packing: the doc_id filter reaches the parquet scan, and the only
    # shuffle is the shard repartition for applyInPandas — no joins.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter("doc_id < 200")
    plan = pack_sequences(docs, budget=64, num_shards=4)._jdf.queryExecution().executedPlan().toString()
    assert "LessThan(doc_id,200)" in plan
    assert "SortMergeJoin" not in plan and "HashJoin" not in plan
    # mixture: the per-source rates join back onto the corpus as a
    # BROADCAST join — the corpus side is never exchanged for the join.
    plan2 = temperature_mixture_sample(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan2
    assert "SortMergeJoin" not in plan2


def test_pack_sequences_sharding_invariants(spark):
    docs = spark.createDataFrame(
        [(i, "aa bb cc dd ee") for i in range(40)], "doc_id long, text string"
    )
    out = pack_sequences(docs, budget=12, num_shards=4).collect()
    assert len(out) == 40
    by_shard = {}
    for r in out:
        assert r["shard"] == r["doc_id"] % 4
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        # 5 tokens each, budget 12 -> two docs per sequence within a shard
        fills = {}
        for r in rows:
            fills.setdefault(r["seq_id"], 0)
            fills[r["seq_id"]] += r["n_tokens"]
        assert all(f <= 12 for f in fills.values())
        assert sorted(fills) == list(range(len(fills)))  # dense seq ids


# --- DSIR importance resampling (Xie et al. 2023) ---------------------------


def _py_bucket(gram: str, num_buckets: int) -> int:
    import hashlib

    return int(hashlib.md5(gram.encode()).hexdigest()[:14], 16) % num_buckets


def _py_dsir(rows, target_ids, n=2, num_buckets=128):
    """Pure-Python replay of dsir_importance_weights for tiny corpora."""
    import math
    import re

    toks = {
        i: re.findall(r"[a-z0-9]{2,}", t.lower()) for i, t in rows
    }
    grams = {
        i: [" ".join(ts[j : j + n]) for j in range(len(ts) - n + 1)]
        for i, ts in toks.items()
    }
    tc, rc = {}, {}
    for i, gs in grams.items():
        d = tc if i in target_ids else rc
        for g in gs:
            b = _py_bucket(g, num_buckets)
            d[b] = d.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    out = {}
    for i, gs in grams.items():
        if i in target_ids:
            continue
        s = 0.0
        for g in gs:
            b = _py_bucket(g, num_buckets)
            s += math.log((tc.get(b, 0) + 1) / (tt + num_buckets)) - math.log(
                (rc.get(b, 0) + 1) / (rt + num_buckets)
            )
        log_w = round(s, 6)
        u = ((i * _KNUTH) % _M32 + 0.5) / _M32
        key = round(log_w - math.log(-math.log(u)), 6)
        out[i] = (len(gs), log_w, key)
    return out


def test_dsir_exact_python_replay(spark):
    from cord19_crawler_spark.operators.traindata import dsir_importance_weights

    rows = [
        (0, "alpha beta alpha beta gamma delta"),
        (1, "alpha beta gamma alpha beta"),
        (10, "alpha beta gamma delta epsilon"),  # target-like raw doc
        (11, "zebra yak xylo walrus vole umbra"),  # dissimilar raw doc
        (12, "alpha beta zebra yak"),  # mixed
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dsir_importance_weights(
        docs, F.col("doc_id") < 10, n=2, num_buckets=128
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["log_w"], r["sample_key"])
        for r in out.collect()
    }
    exp = _py_dsir(rows, {0, 1}, n=2, num_buckets=128)
    assert set(got) == {10, 11, 12}
    for i in exp:
        assert got[i][0] == exp[i][0]
        assert got[i][1] == pytest.approx(exp[i][1], abs=2e-6)
        assert got[i][2] == pytest.approx(exp[i][2], abs=2e-6)
    # the target-like doc must outscore the dissimilar one
    assert got[10][1] > got[11][1]


def test_dsir_no_corpus_shuffle(spark):
    from cord19_crawler_spark.operators.traindata import dsir_importance_weights

    docs = spark.createDataFrame(
        [(0, "aa bb cc"), (1, "aa bb dd"), (2, "ee ff gg")],
        "doc_id long, text string",
    )
    out = dsir_importance_weights(docs, F.col("doc_id") == 0, num_buckets=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # r6 layout: the B-row log-ratio table arrives as a BROADCAST HASH
    # JOIN relation (O(1) probes per gram — the r5 single-row MapType
    # model paid a LINEAR GetMapValue scan per lookup), and the per-doc
    # re-aggregation is partial (map-side) before its exchange, so the
    # only shuffle over scored data carries one narrow (doc_id, count,
    # sum) row per doc per task — the corpus gram stream itself never
    # crosses an exchange.
    assert "BroadcastHashJoin" in plan
    assert "map_from_entries" not in plan
    assert "partial_sum" in plan
    assert plan.count("Exchange hashpartitioning(doc_id") == 1


def test_dsir_empty_docs_scored_zero(spark):
    from cord19_crawler_spark.operators.traindata import dsir_importance_weights

    docs = spark.createDataFrame(
        [(0, "aa bb cc dd"), (1, "x"), (2, "aa bb")],
        "doc_id long, text string",
    )
    out = dsir_importance_weights(docs, F.col("doc_id") == 0, num_buckets=32)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_feats"] == 0 and rows[1]["log_w"] == 0.0
    assert rows[2]["n_feats"] == 1


def test_dsir_validation(spark):
    from cord19_crawler_spark.operators.traindata import dsir_importance_weights

    docs = spark.createDataFrame([(0, "aa bb")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dsir_importance_weights(docs, F.col("doc_id") == 0, n=0)
    with pytest.raises(ValueError):
        dsir_importance_weights(docs, F.col("doc_id") == 0, num_buckets=0)


# --- fixed-token chunking ----------------------------------------------------


def test_chunk_documents_hand_cases(spark):
    from cord19_crawler_spark.operators.traindata import chunk_documents

    docs = spark.createDataFrame(
        [
            # 10 tokens, max 8, overlap 4, stride 4: starts 0,4 (8 dropped:
            # 8 >= 10-4, fully inside chunk@4)
            (1, " ".join(f"a{i}" for i in range(10))),
            # exactly one chunk
            (2, "b0 b1 b2"),
            # 13 tokens: starts 0,4,8 (8 < 13-4=9); tail chunk 5 tokens
            (3, " ".join(f"c{i}" for i in range(13))),
            # empty after tokenization -> absent
            (4, "! ? ."),
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_tokens=8, overlap=4)
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["start_tok"], r["n_tokens"])
        for r in out.collect()
    )
    assert rows == [
        (1, 0, 0, 8),
        (1, 1, 4, 6),
        (2, 0, 0, 3),
        (3, 0, 0, 8),
        (3, 1, 4, 8),
        (3, 2, 8, 5),
    ]
    texts = {
        (r["doc_id"], r["chunk_id"]): r["chunk_text"] for r in out.collect()
    }
    assert texts[(1, 1)] == "a4 a5 a6 a7 a8 a9"


def test_chunk_documents_no_overlap_covers_exactly(spark):
    from cord19_crawler_spark.operators.traindata import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(25)))], "doc_id long, text string"
    )
    rows = chunk_documents(docs, max_tokens=10).collect()
    # 25 tokens, stride 10: chunks of 10, 10, 5 — disjoint, full coverage
    assert sorted((r["start_tok"], r["n_tokens"]) for r in rows) == [
        (0, 10),
        (10, 10),
        (20, 5),
    ]
    assert sum(r["n_tokens"] for r in rows) == 25


def test_chunk_documents_validation(spark):
    from cord19_crawler_spark.operators.traindata import chunk_documents

    docs = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, overlap=-1)


def test_shuffle_shards_is_seeded_permutation(spark):
    from cord19_crawler_spark.operators.traindata import (
        _KNUTH,
        _M32,
        shuffle_shards,
    )

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = shuffle_shards(docs, n_shards=4, seed=7).collect()
    assert len(out) == 200
    # exact replay of shard + position
    hk = {i: ((i + 7) * _KNUTH) % _M32 for i in range(200)}
    by_shard: dict[int, list[int]] = {}
    for i in range(200):
        by_shard.setdefault(hk[i] % 4, []).append(i)
    for s, ids in by_shard.items():
        ids.sort(key=lambda i: (hk[i], i))
    exp = {
        (i, s, p)
        for s, ids in by_shard.items()
        for p, i in enumerate(ids)
    }
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in out} == exp
    # positions dense per shard
    for s, ids in by_shard.items():
        ps = sorted(r["pos"] for r in out if r["shard"] == s)
        assert ps == list(range(len(ids)))


def test_shuffle_shards_seed_changes_order_not_membership(spark):
    from cord19_crawler_spark.operators.traindata import shuffle_shards

    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = shuffle_shards(docs, n_shards=4, seed=0).collect()
    b = shuffle_shards(docs, n_shards=4, seed=1).collect()
    assert {r["doc_id"] for r in a} == {r["doc_id"] for r in b}
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in a} != {
        (r["doc_id"], r["shard"], r["pos"]) for r in b
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        shuffle_shards(docs, n_shards=0)


def test_exact_quantiles_matches_numpy_linear(spark):
    import numpy as np

    from cord19_crawler_spark.operators.traindata import exact_quantiles

    vals = {"a": [3.0, 1.0, 7.0, 20.0, 5.0], "b": [10.0, 10.0, 2.0]}
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, x double")
    probs = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = {
        (r["grp"], r["p"]): r["quantile"]
        for r in exact_quantiles(df, "x", probs, group_col="grp").collect()
    }
    for g, vs in vals.items():
        for p in probs:
            exp = round(float(np.quantile(vs, p, method="linear")), 6)
            assert got[(g, p)] == exp, (g, p)


def test_exact_quantiles_global_and_validation(spark):
    import pytest as _pytest

    from cord19_crawler_spark.operators.traindata import exact_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(101)], "x double")
    got = {
        r["p"]: r["quantile"]
        for r in exact_quantiles(df, "x", [0.5, 0.25]).collect()
    }
    assert got == {0.5: 50.0, 0.25: 25.0}
    with _pytest.raises(ValueError):
        exact_quantiles(df, "x", [])
    with _pytest.raises(ValueError):
        exact_quantiles(df, "x", [1.5])


def test_exact_quantiles_no_unpartitioned_window(spark):
    from cord19_crawler_spark.operators.traindata import exact_quantiles

    df = spark.createDataFrame(
        [("g", float(i)) for i in range(200)], "grp string, x double"
    )
    plans = []
    captured = exact_quantiles(df, "x", [0.5], group_col="grp")
    plan = captured._jdf.queryExecution().executedPlan().toString()
    # ranks come from the two-phase range path: the only window is
    # partitioned by the range-partition id, never "No Partition Defined"
    assert "windowspecdefinition()" not in plan.lower()


def test_shuffle_shards_large_ids_no_overflow(spark):
    # ids past ~3.5e9 would overflow a raw long multiply (ANSI fault);
    # the decimal(38,0) path must match the big-int Python replay exactly
    from cord19_crawler_spark.operators.traindata import (
        _KNUTH,
        _M32,
        shuffle_shards,
    )

    ids = [0, 1, 4_000_000_000, 2**33 + 5, 2**40 + 123]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = {r["doc_id"]: r["shard"] for r in shuffle_shards(df, 4, seed=3).collect()}
    for i in ids:
        assert out[i] == (((i + 3) % _M32) * _KNUTH % _M32) % 4
        assert 0 <= out[i] < 4


def test_exact_quantiles_null_group_is_a_stratum(spark):
    from cord19_crawler_spark.operators.traindata import exact_quantiles

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 10.0), (None, 20.0)],
        "grp string, x double",
    )
    got = {
        (r["grp"], r["p"]): r["quantile"]
        for r in exact_quantiles(df, "x", [0.5], group_col="grp").collect()
    }
    assert got[("a", 0.5)] == 2.0
    assert got[(None, 0.5)] == 15.0


def test_adaptive_quality_cut_per_group_thresholds(spark):
    import pytest as _pytest

    from cord19_crawler_spark.operators.traindata import adaptive_quality_cut

    rows = [
        # group a: scores 1..4 -> p=0.5 threshold 2.5 -> kept {3,4}
        (1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0), (4, "a", 4.0),
        # group b: systematically lower scores; its OWN threshold keeps
        # the top half (a global cut at 2.5 would drop the whole group)
        (5, "b", 0.1), (6, "b", 0.2), (7, "b", 0.3), (8, "b", 0.4),
        # NULL score: never kept
        (9, "a", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, score double")
    got = {
        r["doc_id"]: r["kept"]
        for r in adaptive_quality_cut(df, "score", 0.5, group_col="grp").collect()
    }
    # NULL score is excluded from the quantile input, so group a's
    # threshold stays 2.5; the NULL row itself joins and is not kept
    assert got == {
        1: False, 2: False, 3: True, 4: True,
        5: False, 6: False, 7: True, 8: True,
        9: False,
    }
    with _pytest.raises(ValueError):
        adaptive_quality_cut(df, "score", 1.5, group_col="grp")
    # keep_below flips the retained side
    low = {
        r["doc_id"]: r["kept"]
        for r in adaptive_quality_cut(
            df, "score", 0.5, group_col="grp", keep_above=False
        ).collect()
    }
    assert low[1] and low[2] and not low[4]
