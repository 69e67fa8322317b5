"""Redirect-chain resolution over (src, dst) redirect edges — pointer
doubling on a functional graph.

A crawl log accumulates HTTP 3xx edges; the frontier should schedule the
CANONICAL TARGET of each chain (and record the intermediate spellings as
aliases of it), and it must not spin on redirect loops (``a -> b -> a``)
— RFC 9110 §15.4 requires clients to cap redirections for exactly this
reason. Resolving every chain by walking one hop per pass is O(longest
chain) sequential rounds; this module uses POINTER DOUBLING instead
(the classic parallel path-compression step, the same doubling idea as
Wyllie's list-ranking, J. Wyllie 1979): each round composes the current
reach mapping with itself, so after k rounds every URL knows the
endpoint 2^k hops ahead. ``ceil(log2(max_hops))`` rounds bound ANY
permitted chain length — 32-hop chains resolve in 5 self-joins.

Semantics: edges are first deduplicated to a FUNCTION (one out-edge per
src — min dst wins, deterministic); a URL's chain ends at the first
node with no out-edge (``resolved = true``, exact ``final_url`` +
``hops``) or is cut by ``max_hops`` (``resolved = false``, NULL
``final_url``/``hops`` — loops and over-long chains, the RFC cap).
Output one row per distinct src.

Scale shape (10^9 redirect edges): the mapping is hash-partitioned on
the join key every round; each round is ONE self-join + aggregate-free
projection, log2(max_hops) rounds total (5 for the default 32), with
the same lineage-truncation seam as the other iterative operators
(``operators/iterutil.lineage_truncator`` — ``localCheckpoint`` default,
fault-tolerant ``df.checkpoint()`` when ``checkpoint_dir`` is given).
No windows, no driver-side loops over data — the only driver work is
the fixed round count.
"""
from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["resolve_redirects"]


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Resolve every redirect chain to its final URL (module docstring).

    Returns (src, final_url, hops, resolved) for each distinct ``src``
    in ``edges``: the exact chain endpoint and edge count when the chain
    terminates within ``max_hops``; (NULL, NULL, false) when a loop or
    an over-long chain hits the cap. ``max_hops`` must be >= 1.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    from ..operators.iterutil import lineage_truncator

    truncate = lineage_truncator(checkpoint_dir)

    # one out-edge per src (min dst, deterministic), as the reach map:
    # src reaches `cur` in `hops` steps; `done` = cur has no out-edge
    fn = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
    )
    reach = (
        fn.alias("r")
        .join(fn.select("src").alias("n"), F.col("r.dst") == F.col("n.src"), "left")
        .select(
            F.col("r.src").alias("src"),
            F.col("r.dst").alias("cur"),
            F.lit(1).alias("hops"),
            F.col("n.src").isNull().alias("done"),
        )
    )
    rounds = max(0, math.ceil(math.log2(max_hops)))
    for _ in range(rounds):
        reach = truncate(reach)
        jumped = (
            reach.alias("a")
            .join(
                reach.select(
                    F.col("src").alias("j_src"),
                    F.col("cur").alias("j_cur"),
                    F.col("hops").alias("j_hops"),
                    F.col("done").alias("j_done"),
                ).alias("b"),
                (F.col("a.cur") == F.col("b.j_src")) & ~F.col("a.done"),
                "left",
            )
            .select(
                F.col("a.src").alias("src"),
                F.coalesce(F.col("b.j_cur"), F.col("a.cur")).alias("cur"),
                F.when(
                    F.col("b.j_src").isNull(), F.col("a.hops")
                )
                .otherwise(
                    # saturate at max_hops + 1: a composed distance past
                    # the cap means "beyond the RFC limit" — it must
                    # never read as resolved even if the chain later
                    # terminates (length > max_hops is a cap violation)
                    F.least(
                        F.col("a.hops") + F.col("b.j_hops"),
                        F.lit(int(max_hops) + 1),
                    )
                )
                .alias("hops"),
                F.coalesce(F.col("b.j_done"), F.col("a.done")).alias("done"),
            )
        )
        # distances of chains that resolve within the cap are never
        # saturated (every prefix of a <=max_hops chain is <=max_hops),
        # so resolved rows carry EXACT hop counts
        reach = jumped
    ok = F.col("done") & (F.col("hops") <= F.lit(int(max_hops)))
    return reach.select(
        "src",
        F.when(ok, F.col("cur")).alias("final_url"),
        F.when(ok, F.col("hops").cast("int")).alias("hops"),
        ok.alias("resolved"),
    )
