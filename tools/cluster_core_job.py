"""spark-submit driver for the round-core scaling job (BENCH/CLUSTER.md).

Submitted by tools/check_cluster.py as
  spark-submit --master local-cluster[E,C,MB] \
      --py-files dist/cord19_crawler_spark.zip \
      tools/cluster_core_job.py <corpus_parquet>

The master/conf come entirely from spark-submit; the package comes from the
--py-files zip (executors have no repo checkout) — i.e. the exact
production deployment shape."""

import json
import sys
import time

from pyspark.sql import SparkSession

from cord19_crawler_spark.plans.round_core import run_round_core


def main() -> None:
    corpus = sys.argv[1]
    spark = SparkSession.builder.getOrCreate()
    docs = spark.read.parquet(corpus)
    t0 = time.time()
    counts = run_round_core(docs)
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "elapsed_sec": round(elapsed, 2),
                **counts,
                "urls_per_sec": round(counts["n_urls"] / elapsed, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
