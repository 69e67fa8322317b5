"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS or 32], plus the flagship frontier-scheduler
throughput benchmark (the north-star metric: URLs scheduled/sec).

OUTPUT CONTRACT (r4 verdict item #1; pinned by tests/test_bench_contract.py):
stdout ends with TWO JSON lines —
  line N-1: the FULL record (per-query min/med/max spread, per-rep crawl
            probe detail), also written to BENCH/bench_full_latest.json;
  line N  : the compact headline the driver parses, guaranteed one JSON
            object on one line and <= COMPACT_LINE_MAX (1900) bytes:
  {"metric": "frontier_urls_scheduled_per_sec", "value": <urls/sec>,
   "unit": "urls/sec", "queries": {"<name>": <sec>, ...}, "sf": <sf>,
   "total_query_sec": <sec>, "crawl": {...}, "detail": "<file>"}
Oversized sections of the headline degrade to pointer strings into the
detail file rather than ever exceeding the byte budget (the driver reads
a bounded ~2000-char tail window; an overlong final line loses the
round's throughput artifact, the r4 failure mode).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from cord19_crawler_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_revenue_by_nation",
    "events_sessionize",
    "window_topk_orders_per_customer",
    "lexicon_first_encounter",
    "tfidf_multiword_search",
    "dedup_minhash_signatures",
    "dedup_simhash",
    "similarity_cosine_topk",
    "text_fingerprints",
    "rollup_revenue",
    "dedup_ngram_jaccard",
    "frontier_seen_antijoin",
    "frontier_canonicalize",
    "frontier_per_host_topk",
    "frontier_fetch_batch",
    "similarity_sign_buckets",
    "lemma_variant_expansion",
    "backward_index_rows",
    # round-4 additions (not in BENCH_r03 totals — compare per-query)
    "dedup_connected_components",
    "benchmark_decontamination",
    "mixture_temperature_sample",
    "sequence_packing",
    "dedup_substring_spans",
    "dsir_importance_sample",
    "link_pagerank",
    "lm_perplexity",
    # late round-4 crawl-lifecycle + tokenizer family
    "anchor_text_topk",
    "recrawl_staleness",
    "trap_url_shapes",
    "crawl_diff_summary",
    "bpe_pair_counts",
    "semdedup_keep",
    "length_quantiles",
    "winnowing_fingerprints",
    # round-5 additions: the composed curation pipeline (flagship e2e
    # plan) and the DUST / redirect crawl-lifecycle operators
    "curation_pipeline",
    "dust_alias_rules",
    "redirect_resolution",
    "discovery_pipeline",
]


def minhash_near_dup_e2e(spark, sf_dir):
    """Full MinHash+LSH dedup pipeline (shingle → sign → band → bucket-join
    → exact-Jaccard verify) over the whole documents table — wall-clock
    tracks the banded self-join stages round over round."""
    from cord19_crawler_spark.operators.dedup import minhash_near_duplicates

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    return minhash_near_duplicates(
        docs, num_perm=32, bands=16, threshold=0.5, ngram=3
    )


def crawl_benchmark(spark, n_docs: int = 60000, rounds: int = 3, batch: int = 8000) -> dict:
    """North-star throughput: run the full scheduler (politeness, bloom seen,
    skew plan, checkpointing) and report URLs scheduled/sec.

    SELF-CALIBRATING (r4 verdict item #1): the calibration that previously
    lived in a manual quiet-window rerun now runs inside the bench itself —
    (a) sleep-until-quiet before the first rep (measured 1-min loadavg gate,
    bounded wait), (b) bracket every rep with fixed-work CPU probes
    (bench_scaling.cpu_probe — guest loadavg cannot see hypervisor steal;
    fixed work's wall time can), (c) the headline is the FASTEST CALIBRATED
    rep — a rep whose both probes are within PROBE_TOL of the session-best
    probe, i.e. the host actually delivered the cores for that window —
    falling back to plain min-of-N only when no rep calibrates (flagged in
    the output). All reps + probes + the start load are reported.

    Best-of-N (default 3, $SPARK_GRAFT_CRAWL_REPEATS): this box is shared
    and background tenant load routinely swings single-run wall time ±30%
    (crawl rounds are hundreds of micro-stages, so every stage barrier pays
    a straggler penalty during a steal burst — a ~1.2x average-steal epoch
    amplifies to 3-10x here). Crawl results are asserted identical across
    repeats (determinism double-check)."""
    from cord19_crawler_spark.datagen import generate_documents, seed_urls
    from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig
    from bench_scaling import PROBE_TOL, cpu_probe, wait_quiet

    repeats = int(os.environ.get("SPARK_GRAFT_CRAWL_REPEATS", "3"))
    quiet_load = float(os.environ.get("SPARK_GRAFT_CRAWL_QUIET_LOAD", "2.0"))
    quiet_wait = int(os.environ.get("SPARK_GRAFT_CRAWL_QUIET_WAIT", "180"))
    docs = generate_documents(spark, n_docs, partitions=CPUS * 2).cache()
    docs.count()  # materialize corpus outside the timed section
    cfg = SchedulerConfig(
        batch_size=batch,
        seen_partitions=16,
        bloom_bits=1 << 22,
        min_delay_rounds=1,
        max_in_flight=batch,
        hot_host_threshold=50_000,
    )
    load1 = wait_quiet(quiet_load=quiet_load, max_wait=quiet_wait)
    runs: list[float] = []
    probes: list[tuple[float, float]] = []
    signature = None
    for _ in range(max(1, repeats)):
        ckpt = "/tmp/bench_frontier_ckpt"
        shutil.rmtree(ckpt, ignore_errors=True)
        sched = CrawlScheduler(spark, docs, ckpt, cfg)
        probe_before = cpu_probe(CPUS)
        t0 = time.time()
        counters = sched.run(rounds, seeds=seed_urls(spark, 2000, n_docs))
        elapsed = time.time() - t0
        probes.append((probe_before, cpu_probe(CPUS)))
        scheduled = sum(c["scheduled"] for c in counters)
        discovered = sum(c["discovered_new"] for c in counters)
        sig = (scheduled, discovered)
        assert signature is None or sig == signature, (sig, signature)
        signature = sig
        runs.append(elapsed)
    docs.unpersist()
    shutil.rmtree("/tmp/bench_frontier_ckpt", ignore_errors=True)
    best_probe = min(p for pair in probes for p in pair)
    calibrated = [
        i for i, pair in enumerate(probes) if max(pair) <= PROBE_TOL * best_probe
    ]
    pool = calibrated if calibrated else range(len(runs))
    best_idx = min(pool, key=lambda i: runs[i])
    best = runs[best_idx]
    return {
        "n_docs": n_docs,
        "rounds": rounds,
        "scheduled": signature[0],
        "discovered_new": signature[1],
        "elapsed_sec": round(best, 3),
        "all_runs_sec": [round(r, 3) for r in runs],
        "cpu_probes_sec": probes,
        "best_probe_sec": best_probe,
        "probe_tol": PROBE_TOL,
        "load1_at_start": load1,
        "quiet_load_gate": quiet_load,
        "calibrated_reps": calibrated,
        "headline_rep_calibrated": bool(calibrated),
        "urls_scheduled_per_sec": round(signature[0] / best, 2) if best > 0 else 0.0,
    }


def main() -> None:
    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
            # sf0.1 tables are single small parquet files — split them so
            # scans (and the Arrow UDF stages above them) use all cores; at
            # production scale files are large and the 128m default is right
            "spark.sql.files.maxPartitionBytes": "1m",
            "spark.sql.files.openCostInBytes": "32k",
        },
    )
    qs = entry_mod.queries()
    # warmup: session/codegen/file-listing one-time costs land here, not in
    # the first measured query
    qs["q1_pricing_summary"](spark, SF_DIR).count()
    # N samples per query (default 5, $SPARK_GRAFT_QUERY_REPEATS): this box
    # is shared and single runs swing ±30% (r3 showed 2x per-query swings
    # with totals flat — pure tenancy). The headline scalar stays MIN
    # (approximates the uncontended time, comparable across rounds); the
    # full min/median/max spread is recorded per query so a true regression
    # (median and min both move) is distinguishable from a noisy co-tenant
    # (max moves, min doesn't). Plans are rebuilt each run — nothing is
    # cached between repeats.
    q_repeats = int(os.environ.get("SPARK_GRAFT_QUERY_REPEATS", "5"))

    def _time_query(fn) -> list[float]:
        samples = []
        for _ in range(max(1, q_repeats)):
            t0 = time.time()
            # noop sink, NOT .count(): count() lets Catalyst prune every
            # projection, so a pure-projection query (text_fingerprints)
            # would time an empty-schema scan instead of its kernels; the
            # noop write materializes every output column
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        return sorted(samples)

    import statistics

    timings: dict[str, float] = {}
    spread: dict[str, dict] = {}
    for name, fn in [*((n, qs[n]) for n in HEADLINE),
                     ("minhash_near_dup_e2e", minhash_near_dup_e2e)]:
        s = _time_query(fn)
        timings[name] = round(s[0], 3)
        spread[name] = {
            "min": round(s[0], 3),
            # true median (mean of middle two for even n — s[n//2] would
            # report the MAX at n=2 and poison the regression signal)
            "med": round(statistics.median(s), 3),
            "max": round(s[-1], 3),
            "n": len(s),
        }
    # drop the query section's leftovers (persisted two-phase-rank frames,
    # broadcast vars) before the timed crawl — an aged executor heap was
    # measured to slow the crawl 3-5x vs a fresh JVM at identical box load
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    crawl = crawl_benchmark(spark)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # OUTPUT CONTRACT (r4 verdict item #1): the driver extracts the headline
    # from a bounded tail window of stdout, so the FINAL line must be a
    # compact JSON headline; the full detail (per-query min/med/max spread,
    # per-rep crawl probes) goes to a PRECEDING line and a file.
    full = {
        "metric": "frontier_urls_scheduled_per_sec",
        "value": crawl["urls_scheduled_per_sec"],
        "unit": "urls/sec",
        "queries": timings,
        "query_spread": spread,
        "sf": sf_val,
        "total_query_sec": round(sum(timings.values()), 3),
        "total_query_sec_median": round(
            sum(v["med"] for v in spread.values()), 3
        ),
        "crawl": crawl,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    detail_path = os.path.join(REPO, "BENCH", "bench_full_latest.json")
    with open(detail_path, "w") as f:
        json.dump(full, f, indent=2)
    print(json.dumps(full))  # full record (preceding line, also in the file)
    print(compact_headline(full))  # FINAL stdout line — the driver parses this


# byte budget for the final stdout line: the driver extracts the headline
# from a bounded (~2000-char) tail window, so the line must fit WHOLE
COMPACT_LINE_MAX = 1900


def compact_headline(full: dict) -> str:
    """Serialize the compact FINAL-line headline from the full bench record.

    Contract (r4 verdict item #1, pinned by tests/test_bench_contract.py):
    one JSON object on one line, <= COMPACT_LINE_MAX bytes, carrying
    metric/value/unit plus the per-query map.  Oversized sections degrade
    in order — the queries map first, then the crawl rep list, then every
    non-essential field — each replaced by a pointer to the detail file,
    so the line NEVER exceeds the budget regardless of query count or
    $SPARK_GRAFT_CRAWL_REPEATS (review finding: a long all_runs_sec list
    alone could previously re-overflow after the map fallback)."""
    crawl = full["crawl"]
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "queries": {k: round(v, 2) for k, v in full["queries"].items()},
        "sf": full["sf"],
        "total_query_sec": full["total_query_sec"],
        "total_query_sec_median": full["total_query_sec_median"],
        "crawl": {
            "elapsed_sec": crawl["elapsed_sec"],
            "scheduled": crawl["scheduled"],
            "all_runs_sec": crawl["all_runs_sec"],
            "headline_rep_calibrated": crawl["headline_rep_calibrated"],
            "load1_at_start": crawl["load1_at_start"],
        },
        "detail": "BENCH/bench_full_latest.json",
    }
    pointer = f"see {compact['detail']}"

    def _dump() -> str:
        return json.dumps(compact, separators=(",", ":"))

    line = _dump()
    # progressive fallbacks: the line must fit the driver's tail window
    # WHOLE, no matter how many queries ran or how many crawl reps were
    # requested — re-check after each shrink, never return unchecked
    if len(line) > COMPACT_LINE_MAX:
        compact["queries"] = pointer
        line = _dump()
    if len(line) > COMPACT_LINE_MAX:
        compact["crawl"]["all_runs_sec"] = pointer
        line = _dump()
    if len(line) > COMPACT_LINE_MAX:
        compact = {
            "metric": full["metric"],
            "value": full["value"],
            "unit": full["unit"],
            "sf": full["sf"],
            "total_query_sec": full["total_query_sec"],
            "detail": compact["detail"],
        }
        line = _dump()
    return line


if __name__ == "__main__":
    main()
