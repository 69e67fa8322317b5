"""Deterministic synthetic corpus in the input_hint shape:

  documents(doc_id string,
            spans array<struct<kind string, text string,
                               media_ref string, offset int>>)

Every document is a pure function of its integer index — the table is
bit-identical under any partitioning / parallelism level, which is what the
determinism tests and the two-cluster-size scaling runs require. Generation
itself is distributed (``spark.range`` → ``mapInPandas``), so bench-scale
corpora never pass through the driver.

Web graph semantics: document *t* lives at canonical URL
``https://host{h}.example.com/doc/{t}`` where ``h = host_of(t)`` follows a
Zipf-ish skew (a few hot domains — exercises skew-splitting, the analogue of
the reference's hot-word round-robin, /root/reference/src/barrel.py:104-122).
Text spans embed *messy* variants of links to other documents (mixed-case
host, #fragment, unsorted query params, default port) so URL
canonicalization has real work to do. Edge cases per FIXTURES.md §1:
>50-span docs (span cap), empty-span docs, media-only docs, short texts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

N_HOSTS = 20

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
            False,
        ),
    ]
)

_WORDS = (
    "virus vaccine protein cell antibody transmission infection genome "
    "epidemic clinical trial immune response sample patient symptom"
).split()


def host_of(t: int) -> int:
    """Zipf-ish host assignment: ~half of all docs land on host0/host1."""
    r = (t * 2654435761) % 100  # Knuth multiplicative mix, deterministic
    if r < 35:
        return 0
    if r < 55:
        return 1
    if r < 70:
        return 2
    return 3 + (t * 40503) % (N_HOSTS - 3)


def canonical_url(t: int) -> str:
    return f"https://host{host_of(t)}.example.com/doc/{t}"


def messy_url(t: int, variant: int) -> str:
    """A link to doc t as it would appear in the wild; canonicalizes to
    :func:`canonical_url`."""
    h = host_of(t)
    v = variant % 5
    if v == 0:
        return f"https://host{h}.example.com/doc/{t}"
    if v == 1:
        return f"HTTPS://Host{h}.EXAMPLE.com/doc/{t}#section-{variant}"
    if v == 2:
        return f"https://host{h}.example.com:443/doc/{t}"
    if v == 3:
        return f"https://host{h}.example.com./doc/{t}#frag"
    # trailing '?' with empty query — canonicalizes to no query string
    return f"https://host{h}.example.com/doc/{t}?"


def out_links(i: int, n_docs: int) -> list[int]:
    """Deterministic link targets of doc i (pure arithmetic, no RNG)."""
    k = 3 + (i % 4)  # 3..6 links per doc
    return [(i * 31 + j * 17 + 7) % n_docs for j in range(k)]


def _doc_row(i: int, n_docs: int) -> dict:
    spans: list[dict] = []
    if i % 41 == 5:  # empty-span doc
        return {"doc_id": str(i), "spans": []}
    if i % 43 == 7:  # media-only doc
        for j in range(2):
            spans.append(
                {"kind": "media", "text": None,
                 "media_ref": f"media://img/{i}/{j}", "offset": j}
            )
        return {"doc_id": str(i), "spans": spans}

    words = " ".join(_WORDS[(i + j) % len(_WORDS)] for j in range(8))
    spans.append(
        {"kind": "title", "text": f"Document {i}: {words[:40]}",
         "media_ref": None, "offset": 0}
    )
    links = out_links(i, n_docs)
    off = 1
    spans.append(
        {
            "kind": "abstract",
            "text": f"{words} see {messy_url(links[0], i)} and also "
                    f"{messy_url(links[1], i + 1)}.",
            "media_ref": None,
            "offset": off,
        }
    )
    off += 1
    for j, t in enumerate(links[2:]):
        spans.append(
            {
                "kind": "body",
                "text": f"{_WORDS[(i * 7 + j) % len(_WORDS)]} text with link "
                        f"{messy_url(t, i + j)} trailing.",
                "media_ref": None,
                "offset": off,
            }
        )
        off += 1
    if i % 9 == 0:  # interleave a media span
        spans.append(
            {"kind": "media", "text": None,
             "media_ref": f"media://img/{i}/0", "offset": off}
        )
        off += 1
    if i % 37 == 3:  # exceed the 50-span cap
        while off < 60:
            spans.append(
                {"kind": "body", "text": f"filler span {off} of doc {i}",
                 "media_ref": None, "offset": off}
            )
            off += 1
    return {"doc_id": str(i), "spans": spans}


def generate_documents(spark: SparkSession, n_docs: int, partitions: int = 8) -> DataFrame:
    """Distributed, deterministic documents table (input_hint shape)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_doc_row(int(i), n_docs) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(_gen, schema=DOC_SCHEMA)
    )


def seed_urls(spark: SparkSession, n_seeds: int, n_docs: int) -> DataFrame:
    """Seed list: canonical URLs of docs 0..n_seeds-1, priority 1.0."""
    rows = [(canonical_url(t), 1.0) for t in range(min(n_seeds, n_docs))]
    return spark.createDataFrame(rows, "url string, priority double")
