"""Per-query isolation bench (guide §1.4) — NOT the driver contract.

Times individual declared queries with the noop sink against
$SPARK_GRAFT_SF_DIR (default sf1.0 — the driver's measured scale), and
optionally writes each query's ``explain("formatted")`` to
plans/r06/<name>_<tag>.txt.  bench.py stays frozen; cite these numbers in
OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py q1_pricing_summary lm_perplexity ...
    python bench_extra.py --plans-tag before lm_perplexity dsir_importance_sample
    python bench_extra.py --reps 3 --all
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from cord19_crawler_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-tag", default=None,
                    help="write plans/r06/<name>_<tag>.txt per query")
    ap.add_argument("--no-time", action="store_true",
                    help="only capture plans, skip timed reps")
    args = ap.parse_args()

    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "48g"
            ),
            "spark.sql.files.maxPartitionBytes": "1m",
            "spark.sql.files.openCostInBytes": "32k",
        },
    )
    qs = entry_mod.queries()
    names = list(qs) if args.all else args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    # warmup: session/codegen one-time costs land here
    qs["q1_pricing_summary"](spark, SF_DIR).count()

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if args.plans_tag:
            os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = fn(spark, SF_DIR)._jdf.queryExecution().explainString(mode)
            path = os.path.join(
                REPO, "plans", "r06", f"{name}_{args.plans_tag}.txt"
            )
            with open(path, "w") as f:
                f.write(plan)
        samples = []
        if not args.no_time:
            for _ in range(max(1, args.reps)):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
        out[name] = {"samples": sorted(samples)}
        print(json.dumps({"query": name, **out[name]}), flush=True)
    print("TOTAL_MIN", round(sum(v["samples"][0] for v in out.values()
                                 if v["samples"]), 3))


if __name__ == "__main__":
    main()
