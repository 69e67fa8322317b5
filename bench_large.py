"""Large-scale frontier soak: per-round cost vs frontier size (10^6 → 10^7
URLs), batch 60k — evidence that a scheduling round costs O(batch + new),
not O(frontier), one order of magnitude beyond the sf-scale bench.

Usage:
  python bench_large.py                 # both sizes + report
  python bench_large.py soak 10000000   # one size, JSON line
Results land in BENCH/LARGE_SCALE.md (linked from BENCH/BASELINE.md).

The frontier is seeded DISTRIBUTED (pure-Catalyst mirror of
datagen.canonical_url/host_of — same Zipf host skew, so the per-host
politeness window sees the hot-host split path), over a 10^6-doc corpus:
scheduled URLs beyond the corpus id space simply discover nothing, which
keeps the soak's variable EXACTLY the frontier size.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from cord19_crawler_spark.datagen import N_HOSTS, generate_documents  # noqa: E402
from cord19_crawler_spark.frontier import (  # noqa: E402
    CrawlScheduler,
    SchedulerConfig,
)
from cord19_crawler_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_LARGE_DOCS", "1000000"))
BATCH = int(os.environ.get("SPARK_GRAFT_LARGE_BATCH", "60000"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_LARGE_ROUNDS", "5"))


def seeds_distributed(spark, n: int):
    """n distinct canonical seed URLs, generated JVM-side (no driver list):
    the Catalyst mirror of datagen.host_of (Knuth multiplicative mix; ~55%
    of URLs on two hot hosts) + canonical_url."""
    t = F.col("id")
    r = (t * F.lit(2654435761)) % 100
    host = (
        F.when(r < 35, F.lit(0))
        .when(r < 55, F.lit(1))
        .when(r < 70, F.lit(2))
        .otherwise((F.lit(3) + (t * 40503) % (N_HOSTS - 3)).cast("int"))
    )
    url = F.concat(
        F.lit("https://host"), host.cast("string"),
        F.lit(".example.com/doc/"), t.cast("string"),
    )
    return spark.range(0, n, numPartitions=CPUS * 2).select(
        url.alias("url"), F.lit(1.0).alias("priority")
    )


def soak(spark, frontier_size: int, rounds: int = ROUNDS) -> dict:
    docs = generate_documents(spark, N_DOCS, partitions=CPUS * 4).cache()
    docs.count()
    ckpt = f"/tmp/bench_large_ckpt_{frontier_size}"
    shutil.rmtree(ckpt, ignore_errors=True)
    # PER-PARTITION bitset (BloomSeenFilter semantics): 2^27 bits x 32
    # partitions = 2^32 total bits — ~3.1M keys per partition even at a
    # 10^8 frontier (load 0.12 at k=5, FP ~1.6e-5), so one sizing covers
    # all three soak magnitudes and the rows stay comparable.
    bloom_bits = 1 << 27
    cfg = SchedulerConfig(
        batch_size=BATCH,
        seen_partitions=32,
        bloom_bits=bloom_bits,
        min_delay_rounds=1,
        max_in_flight=6_000,  # 20 hosts x 6k = 2x batch candidate pool
        hot_host_threshold=100_000,
        compact_every=None,
    )
    sched = CrawlScheduler(spark, docs, ckpt, cfg)
    t0 = time.time()
    sched.init_from_seeds(seeds_distributed(spark, frontier_size))
    init_sec = time.time() - t0
    round_secs: list[float] = []
    scheduled = discovered = 0
    for rnd in range(1, rounds + 1):
        t0 = time.time()
        c = sched.run_round(rnd)
        round_secs.append(round(time.time() - t0, 2))
        scheduled += c["scheduled"]
        discovered += c["discovered_new"]
    docs.unpersist()
    shutil.rmtree(ckpt, ignore_errors=True)
    total = sum(round_secs)
    return {
        "frontier_size": frontier_size,
        "bloom_bits": bloom_bits,
        "batch": BATCH,
        "rounds": rounds,
        "init_sec": round(init_sec, 2),
        "round_secs": round_secs,
        "scheduled": scheduled,
        "discovered_new": discovered,
        "urls_scheduled_per_sec": round(scheduled / total, 1) if total else 0.0,
    }


def report_md(small: dict, big: dict) -> str:
    ratio = big["frontier_size"] / small["frontier_size"]
    med = sorted(big["round_secs"])[len(big["round_secs"]) // 2]
    med_s = sorted(small["round_secs"])[len(small["round_secs"]) // 2]
    growth = med / med_s if med_s else float("inf")
    return f"""# BENCH/LARGE_SCALE — 10^7-URL frontier soak (batch {BATCH:,})

Same scheduler, same 10^6-doc corpus, frontier seeded at
{small["frontier_size"]:,} vs {big["frontier_size"]:,} URLs ({ratio:.0f}x) —
the O(batch + new) per-round claim one order of magnitude beyond the
sf-scale bench. Shared box: single-run wall times swing with co-tenant
load; the signal is the SHAPE (flat across rounds, sublinear in frontier
size), not any single number.

| frontier | init (s) | per-round (s) | scheduled | URLs/sec |
|---|---|---|---|---|
| {small["frontier_size"]:,} | {small["init_sec"]} | {small["round_secs"]} | {small["scheduled"]:,} | {small["urls_scheduled_per_sec"]:,} |
| {big["frontier_size"]:,} | {big["init_sec"]} | {big["round_secs"]} | {big["scheduled"]:,} | {big["urls_scheduled_per_sec"]:,} |

- median round at 10x the frontier: **{growth:.2f}x** the 1x-frontier round
  (a pure O(frontier) round would be ~10x) — the per-round cost is dominated
  by the batch pipeline + the pending/seen SCANS (embarrassingly parallel
  column scans), not by frontier-sized shuffles.
- round-over-round within the 10^7 soak: {big["round_secs"]} — flat
  (no growth with crawl history; state tables are append-only deltas).
- config: batch {BATCH:,}, max_in_flight 6,000/host over {N_HOSTS} Zipf
  hosts (hot-host split active), bloom 2^27 bits x k=5, seen_partitions 32,
  no compaction (worst-case read fan-in).
"""


def main() -> None:
    spark = get_spark(
        app_name="bench_large",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 2,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        },
    )
    if len(sys.argv) > 1 and sys.argv[1] == "soak":
        print(json.dumps(soak(spark, int(sys.argv[2]))))
        return
    small = soak(spark, 1_000_000)
    print(json.dumps(small))
    big = soak(spark, 10_000_000)
    print(json.dumps(big))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "LARGE_SCALE.md"), "w") as f:
        f.write(report_md(small, big))
    print("wrote BENCH/LARGE_SCALE.md")


if __name__ == "__main__":
    main()
