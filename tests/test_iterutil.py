"""Reliable-checkpoint seam for iterative operators (operators/iterutil.py,
r4 verdict item #2): every iterative operator must produce IDENTICAL
results with checkpoint_dir set (reliable df.checkpoint — executor-loss
safe) as with the default localCheckpoint path, and the reliable path must
actually write checkpoint files to the given directory (so the test pins
that the durable branch was taken, not silently skipped)."""
import os
import random
import shutil

import pytest

from cord19_crawler_spark.operators.bpe import train_bpe
from cord19_crawler_spark.operators.dedup import minhash_near_duplicates
from cord19_crawler_spark.operators.graph import connected_components, pagerank


@pytest.fixture()
def ckpt_dir(tmp_path):
    d = str(tmp_path / "reliable_ckpt")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _has_checkpoint_files(d: str) -> bool:
    for _root, _dirs, files in os.walk(d):
        if files:
            return True
    return False


def test_connected_components_reliable_checkpoint_identical(spark, ckpt_dir):
    rng = random.Random(11)
    nodes = list(range(0, 300, 2))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")
    base = {r["node"]: r["component"] for r in connected_components(df).collect()}
    durable = {
        r["node"]: r["component"]
        for r in connected_components(df, checkpoint_dir=ckpt_dir).collect()
    }
    assert durable == base
    assert _has_checkpoint_files(ckpt_dir)


def test_pagerank_reliable_checkpoint_identical(spark, ckpt_dir):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    base = {r["node"]: round(r["rank"], 10) for r in pagerank(df, iterations=6).collect()}
    durable = {
        r["node"]: round(r["rank"], 10)
        for r in pagerank(df, iterations=6, checkpoint_dir=ckpt_dir).collect()
    }
    assert durable == base
    assert _has_checkpoint_files(ckpt_dir)


def test_train_bpe_reliable_checkpoint_identical(spark, ckpt_dir):
    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "newer newest new low")],
        "doc_id long, text string",
    )
    base_merges, _ = train_bpe(docs, n_merges=5)
    durable_merges, _ = train_bpe(docs, n_merges=5, checkpoint_dir=ckpt_dir)
    assert durable_merges == base_merges
    assert _has_checkpoint_files(ckpt_dir)


def test_minhash_checkpoint_storage_identical(spark, ckpt_dir):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again!"),
            (3, "completely different text about spark shuffles and partitions"),
        ],
        "doc_id long, text string",
    )
    kw = dict(num_perm=16, bands=8, threshold=0.5, ngram=3)
    base = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_near_duplicates(docs, **kw).collect()
    }
    durable = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_near_duplicates(
            docs, shingle_storage=f"checkpoint:{ckpt_dir}", **kw
        ).collect()
    }
    assert durable == base
    assert (1, 2) in {(a, b) for a, b, _ in base}
