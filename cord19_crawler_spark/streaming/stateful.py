"""Custom stateful streaming operator: first-seen URL dedup with
``applyInPandasWithState``.

The streaming twin of the batch URL-seen set (frontier/seen.py): state is
partitioned by the same uniform url-hash partition key; each group's state
holds the set of url_ids seen so far and only first occurrences are emitted.
State lives in the streaming state store (checkpointed, restored across
restarts) — the exactly-once streaming analogue of the batch engine's
committed filter/url_seen tables.

At 10^10 scale the per-group state is bounded by partition count × ids; the
production design swaps the exact id list for the same bloom bitset used in
batch (the state schema already carries bytes); exactness then comes from
the downstream batch anti-join, as in the batch path.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.IntegerType()),
        T.StructField("url", T.StringType()),
        T.StructField("url_id", T.LongType()),
        T.StructField("host", T.StringType()),
    ]
)

# state keys on URL STRINGS, not 64-bit hashes — a hash collision would
# permanently suppress a distinct URL (same defect class the batch seen-set
# anti-join fixed; see frontier/seen.py:exact_new)
STATE_SCHEMA = T.StructType(
    [T.StructField("seen_urls", T.ArrayType(T.StringType()))]
)


def _dedup_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen: set[str] = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        # vectorized first-occurrence filter: isin mask against state +
        # drop_duplicates(keep='first') within the batch — identical
        # semantics to a per-row loop, no Python-level row iteration
        novel = pdf.loc[~pdf["url"].isin(seen)].drop_duplicates("url")
        if len(novel):
            seen.update(novel["url"])
            yield novel[["partition", "url", "url_id", "host"]]
    state.update((sorted(seen),))


def first_seen_urls(link_stream: DataFrame, n_partitions: int = 8) -> DataFrame:
    """Streaming first-occurrence filter over (url, url_id, host) links.

    Groups by the url-hash partition (literally the batch seen set's
    ``with_partition`` — one formula, no comment-enforced drift) so state
    shards evenly; emits each canonical URL exactly once across the
    lifetime of the stream (state survives restarts via the checkpoint).
    """
    from ..frontier.seen import with_partition

    with_part = with_partition(link_stream, n_partitions)
    return with_part.groupBy("partition").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
