"""Connected-components scale probe: empirical evidence for the
O(log^2 n) round bound of the two-phase (Large-Star/Small-Star)
algorithm, one-to-two orders of magnitude beyond the sf-scale oracle
query.

Two adversarial graph shapes, generated DISTRIBUTED (spark.range, no
driver loops):

* ``path``   — one 10^k-node path: the DIAMETER worst case. Min-label
  propagation needs 10^k rounds here; two-phase must stay ~2*log2(n).
* ``random`` — 10^k edges (i, xxhash(i) % n) over an n-node id space:
  the many-components regime a near-dup pair graph actually looks like.

Usage:
  python tools/check_cc_scale.py [n_edges ...]   # default 100000 1000000

Prints one JSON line per (shape, n) with rounds, wall seconds, component
count, and the round bound check; results are recorded in
BENCH/CC_SCALE.md.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from cord19_crawler_spark.operators.graph import connected_components  # noqa: E402
from cord19_crawler_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))


def path_graph(spark, n):
    return spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )


def random_graph(spark, n):
    # pseudo-random but deterministic targets; self-loops dropped inside
    # connected_components
    return spark.range(n).select(
        F.col("id").alias("src"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(n)).alias("dst"),
    )


def main(sizes: list[int]) -> int:
    spark = get_spark(
        app_name="cc-scale",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.driver.memory": "16g"},
    )
    ok = True
    for n in sizes:
        for shape, gen in (("path", path_graph), ("random", random_graph)):
            edges = gen(spark, n)
            stats: dict = {}
            t0 = time.time()
            cc = connected_components(
                edges, algorithm="two-phase", max_iterations=200, stats=stats
            )
            n_comp = cc.select("component").distinct().count()
            wall = time.time() - t0
            # Kiveris et al. prove O(log^2 n); empirically alternation
            # converges in ~log2(n) rounds — give 3x headroom.
            bound = 3 * math.ceil(math.log2(max(n, 2))) + 3
            passed = stats["rounds"] <= bound
            ok = ok and passed
            if shape == "path":
                passed_comp = n_comp == 1
                ok = ok and passed_comp
            print(
                json.dumps(
                    {
                        "shape": shape,
                        "n_edges": n,
                        "rounds": stats["rounds"],
                        "round_bound": bound,
                        "components": n_comp,
                        "wall_sec": round(wall, 2),
                        "rounds_ok": passed,
                    }
                ),
                flush=True,
            )
    return 0 if ok else 1


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    sys.exit(main(sizes))
