"""Delta (dynamic) index: incremental upserts merged at read time.

Reference (/root/reference/src/dynamic_indexer.py): a second small
lexicon/forward/inverted triple updated per uploaded doc (T2), persisted on
every add (T4), guarded against duplicate ids (T5), and unioned with the
static index at query time (T3/J9/U1, src/singlewordSearch.py:374-398) —
new docs are searchable with NO rebuild of the static barrels.

Spark-native: the delta is just another postings DataFrame; upsert = anti-
join duplicate guard + append; read-time merge = unionByName. With Iceberg,
upsert is ``MERGE INTO ... WHEN NOT MATCHED THEN INSERT`` and the read-time
union is a snapshot read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .indexing import postings, tokens_from_text


def upsert_documents(
    delta_docs: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    static_ids: DataFrame | None = None,
) -> DataFrame:
    """T2+T5: add docs not already present (duplicate guard = anti-join,
    the reference's ``if doc_id in self.forward_index: return False`` —
    which, like here by default, guards only the DELTA's own index,
    src/dynamic_indexer.py:65-66). Pass ``static_ids`` (a DF with the id
    column) to also reject ids already in the static index, preventing a
    doc from being postings-indexed twice across static+delta."""
    from pyspark.sql import Window

    guard = delta_docs.select(id_col).distinct()
    if static_ids is not None:
        guard = guard.unionByName(
            static_ids.select(F.col(static_ids.columns[0]).alias(id_col)).distinct()
        )
    # in-batch duplicate guard: the same doc_id twice in ONE new_docs batch
    # (e.g. a doc discovered via two URLs in one round) must index once —
    # the reference's sequential 'if doc_id in forward_index' guard rejects
    # the second copy; here keep the deterministically-smallest row
    others = [c for c in new_docs.columns if c != id_col]
    if others:
        w = Window.partitionBy(id_col).orderBy(
            F.struct(*[F.col(c) for c in others])
        )
        new_docs = (
            new_docs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        new_docs = new_docs.distinct()
    fresh = new_docs.join(guard, id_col, "left_anti")
    return delta_docs.unionByName(fresh)


def merged_postings(static_postings: DataFrame, delta_docs: DataFrame) -> DataFrame:
    """T3/J9/U1: static ∪ delta postings at read time. Correct only when
    delta ids are disjoint from static ids — enforce by passing
    ``static_ids`` to :func:`upsert_documents` (a doc in both would
    contribute postings from BOTH versions)."""
    delta_p = postings(tokens_from_text(delta_docs))
    # heterogeneous id types (int static corpus + string "dyn_*" uploads —
    # the serving layer's case): canonicalize BOTH sides to string before
    # the union; unionByName would otherwise reject the type conflict.
    # No-op when the types already agree, so stored-index reads keep their
    # native id type and pushdown.
    s_t = dict(static_postings.dtypes).get("doc_id")
    d_t = dict(delta_p.dtypes).get("doc_id")
    if s_t != d_t:
        static_postings = static_postings.withColumn(
            "doc_id", F.col("doc_id").cast("string")
        )
        delta_p = delta_p.withColumn("doc_id", F.col("doc_id").cast("string"))
    return static_postings.unionByName(delta_p)


def search_with_delta(
    static_postings: DataFrame,
    delta_docs: DataFrame,
    query_terms: list[str],
    total_docs: int | DataFrame,
    k: int = 20,
) -> DataFrame:
    """End-to-end: a doc uploaded a second ago ranks alongside the static
    corpus with no index rebuild."""
    from .search import tfidf_search

    merged = merged_postings(static_postings, delta_docs)
    return tfidf_search(merged, query_terms, total_docs, k)


def plan_compaction(
    segments: DataFrame,
    min_size: int = 1024,
    fanout: int = 4,
    id_col: str = "segment_id",
    size_col: str = "size_bytes",
    age_col: str = "created_round",
) -> DataFrame:
    """Size-tiered compaction planner for accumulated delta segments —
    the LSM-style maintenance decision (Lucene/BigTable/RocksDB tiered
    policy) the delta index needs at scale: every upsert round appends a
    small segment, and without merging, the read-time union fans out to
    thousands of tiny files (S3 listing + per-file open dominate the
    query).

    Pinned policy (oracle-replayable, all-integer — no float log):
      tier(s)       = bit_length(max(size // min_size, 1)) - 1
                    = floor(log2(size / min_size)), clamped at 0
      within a tier, order by (age asc, id asc) — oldest first
      merge_group   = tier * 10^6 + (rank // fanout) for the COMPLETE
                      groups of ``fanout`` segments; the trailing
                      partial group stays unmerged (merge_group NULL)

    Returns (segment_id, size_bytes, tier, merge_group).  Merging only
    complete fanout-sized groups keeps write amplification at the
    classic O(log_fanout(N)) per byte: each byte is rewritten at most
    once per tier it climbs.

    Scale shape: segment CATALOGS are small (10^4-10^5 rows even at
    100 TB of data), so one window per tier is fine — the plan is
    driver-light metadata work; the expensive part (the merge itself)
    is the caller's distributed rewrite of the selected groups.
    """
    if min_size < 1 or fanout < 2:
        raise ValueError("min_size must be >= 1 and fanout >= 2")
    from pyspark.sql import Window

    # integer div (not / + cast: double division can round up at the
    # 2^53 boundary), then floor(log2) via exact bin-length
    tier = (
        F.length(
            F.bin(
                F.greatest(
                    F.expr(f"CAST({size_col} AS BIGINT) div {min_size}"),
                    F.lit(1).cast("long"),
                )
            )
        )
        - 1
    ).alias("tier")
    base = segments.select(
        F.col(id_col).alias("segment_id"),
        F.col(size_col).cast("long").alias("size_bytes"),
        F.col(age_col).alias("_age"),
        tier,
    )
    w = Window.partitionBy("tier").orderBy(
        F.asc("_age"), F.asc("segment_id")
    )
    ranked = base.withColumn("_rn", F.row_number().over(w) - 1)
    counts = base.groupBy("tier").agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.join(F.broadcast(counts), "tier")
        .select(
            "segment_id",
            "size_bytes",
            "tier",
            F.when(
                (F.col("_rn") / fanout).cast("long")
                < (F.col("_n") / fanout).cast("long"),
                F.col("tier").cast("long") * 1000000
                + (F.col("_rn") / fanout).cast("long"),
            ).alias("merge_group"),
        )
    )
