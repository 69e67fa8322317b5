"""Pluggable fetch stage: the seam where real HTTP I/O slots in.

The scheduler's round contract is ``fetcher(batch_df) -> documents_df``:
the round's fetch batch (url, url_id, host, priority, attempt, seq) goes
in, an input_hint-shaped documents table (doc_id, spans) comes out, and
link extraction / dedup / seen-filtering proceed identically regardless of
where the bytes came from. Two implementations:

* the scheduler's default — join the batch against a corpus table
  (broadcast the small batch side); this sandbox has no network, and it is
  also the right shape for recrawl-from-archive jobs;
* ``make_udf_fetcher(fetch_fn)`` — wrap a per-URL callable into an
  Arrow-batched ``mapInPandas`` stage. In production ``fetch_fn`` is an
  HTTP client call (requests/httpx; politeness is ALREADY enforced
  upstream by the batch construction, so the callable needs no rate
  logic); the callable runs inside executor tasks, parallel across the
  batch's partitions. Returning None drops the URL (fetch miss — the
  crawl log still marks it done, the reference's 404 behavior).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..datagen import DOC_SCHEMA


def make_udf_fetcher(
    fetch_fn: Callable[[str], dict | None],
    partitions: int | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Lift a per-URL fetch callable into the scheduler's fetcher contract.

    ``fetch_fn(url) -> {"doc_id": str, "spans": [{kind, text, media_ref,
    offset}, ...]} | None``. ``partitions`` repartitions the batch first so
    a small batch still fans out across executors (network-bound work wants
    more tasks than the batch's natural partitioning).
    """

    def fetcher(batch: DataFrame) -> DataFrame:
        urls = batch.select("url")
        if partitions:
            urls = urls.repartition(partitions)

        def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows: dict[str, list] = {"doc_id": [], "spans": []}
                for url in pdf["url"]:
                    doc = fetch_fn(url)
                    if doc is None:
                        continue  # fetch miss: scheduled-but-no-content
                    rows["doc_id"].append(doc["doc_id"])
                    rows["spans"].append(doc["spans"])
                yield pd.DataFrame(rows)

        return urls.mapInPandas(_run, schema=DOC_SCHEMA)

    return fetcher
