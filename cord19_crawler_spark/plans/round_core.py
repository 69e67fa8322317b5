"""One scheduling round's heavy core as a reusable job — the benchmark
workload behind BENCH/BASELINE.md and BENCH/CLUSTER.md.

This is the per-round data path with the driver-side round bookkeeping
stripped out: span explode → fused URL extract+canonicalize (one Arrow
stage) → xxhash64 annotate → exact URL dedup shuffle → two-phase skew-split
per-host top-k window → per-group MinHash signatures (map-side partial
mins). It is CPU/shuffle-bound and free of per-round fixed costs
(checkpoint commits, tiny metadata actions), so it is the right job for
measuring scaling efficiency: in production the batch is ~10^6 URLs and
this core dominates the round; the fixed costs that dominate a toy-scale
full loop amortize away.

Shared by ``bench_scaling.py`` (thread-level N vs 4N cores) and
``tools/cluster_core_job.py`` (spark-submit --py-files at N vs 4N real
executor JVMs via local-cluster)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashes import md5_long56, minhash_expr, minhash_params
from ..functions.urls import extract_canonical_urls, host_from_canonical


def run_round_core(
    docs: DataFrame,
    span_cap: int = 50,
    per_host_topk: int = 100,
    salt_chunk: int = 5000,
    minhash_perms: int = 8,
) -> dict:
    """Run the round core over an interleaved-span corpus; returns counts
    (the actions that drive execution). Deterministic for a given input."""
    spans = docs.select(F.explode(F.slice(F.col("spans"), 1, span_cap)).alias("span"))
    links = spans.select(
        F.explode(extract_canonical_urls(F.col("span.text"))).alias("url")
    )
    ann = (
        links.withColumn("host", host_from_canonical(F.col("url")))
        .withColumn("url_id", F.xxhash64(F.col("url")))
        .withColumn("priority", (F.col("url_id") % 1000).cast("double"))
    )
    dedup = ann.dropDuplicates(["url"])
    n_urls = dedup.count()

    # two-phase skew-split per-host top-k (hot hosts carry ~35% of links)
    plan = (
        dedup.groupBy("host")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "n_salt",
            F.greatest(F.lit(1), F.ceil(F.col("c") / salt_chunk).cast("int")),
        )
        .select("host", "n_salt")
    )
    salted = dedup.join(F.broadcast(plan), "host", "left").withColumn(
        "_salt", F.pmod(F.col("url_id"), F.coalesce(F.col("n_salt"), F.lit(1)))
    )
    w_pre = Window.partitionBy("host", "_salt").orderBy(
        F.desc("priority"), F.asc("url")
    )
    pre = (
        salted.withColumn("r", F.row_number().over(w_pre))
        .filter(F.col("r") <= per_host_topk)
        .drop("r")
    )
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
    topk = pre.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= per_host_topk
    )
    n_topk = topk.count()

    # per-group MinHash content sketches (compute-heavy md5 hashing; the
    # map-side partial min keeps the shuffle at one row per (group, perm))
    toks = docs.select(
        F.explode(F.slice(F.col("spans"), 1, span_cap)).alias("span")
    ).select(F.explode(F.split(F.lower(F.col("span.text")), " ")).alias("w"))
    h = md5_long56(F.col("w"))
    params = minhash_params(minhash_perms)
    sig = toks.groupBy(F.substring("w", 1, 2).alias("g")).agg(
        *[
            F.min(minhash_expr(h, a, b)).alias(f"mh_{i}")
            for i, (a, b) in enumerate(params)
        ]
    )
    n_sig = sig.count()
    return {"n_urls": n_urls, "n_topk": n_topk, "n_sig": n_sig}
