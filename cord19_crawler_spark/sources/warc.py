"""WARC (Web ARChive, ISO 28500) source — the canonical storage format of
web crawls (Common Crawl, Heritrix, wget --warc).

Same distributed-ingest shape as the tar source (sources/cord19.py): the
parallel unit is the archive FILE (record parsing is inherently sequential
WITHIN one archive — length-delimited grammar — but a crawl corpus is
millions of archives). Unlike the tar source, archives here are streamed
with BOUNDED MEMORY:

* the ``binaryFile`` scan is pruned to the ``path`` column only (Spark's
  binary-file source skips the content read entirely when the column isn't
  selected), so no archive is ever materialized as a single row;
* each task opens its files directly (local path / file: URI, or any
  pyarrow-supported filesystem URI) and reads fixed-size chunks;
* ``.warc.gz`` members are decompressed incrementally with ``zlib``
  (``wbits=MAX_WBITS|16``), restarting the decompressor at each member
  boundary (Common Crawl concatenates one gzip member per record);
* records are carved from a rolling buffer that holds at most ONE in-flight
  record (+ one chunk) — records whose declared Content-Length exceeds
  ``max_record_bytes`` are skipped by streaming past them without buffering;
* output rows are yielded as Arrow batches capped at ``batch_bytes`` of
  payload, so a 1 GiB Common-Crawl archive flows through a task in ~16
  bounded batches instead of one 4 GiB allocation.

The parser implements the WARC/1.0 record grammar by hand (version line,
CRLF header block, Content-Length payload, CRLF CRLF separator) — no
external warcio dependency. Tolerance contract: a malformed Content-Length
skips that record and resyncs at the next ``WARC/`` version line; trailing
garbage stops the file cleanly.

Reference analogue: the tar-member document scan
(/root/reference/src/indexer.py tar iteration) — WARC is the same "many
payloads inside one big archive" shape at crawl scale.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_MAX_HEADER_BYTES = 1 << 20  # a header block larger than 1 MiB is garbage


class WarcCarver:
    """Incremental WARC/1.0 record carver: ``feed()`` it decompressed chunks
    in any sizes, collect completed ``(headers, payload)`` records back.

    Memory bound: the rolling buffer never holds more than one incomplete
    record (capped at ``max_record_bytes``) plus the latest fed chunk; records
    declaring a larger Content-Length are skipped by streaming past their
    payload without buffering it.
    """

    def __init__(self, max_record_bytes: int | None = None):
        self._buf = bytearray()
        self._dead = False
        self._resync = False  # lost framing: scan for the next WARC/ line
        self._skip = 0  # payload bytes of an oversized record left to drop
        self._max = max_record_bytes

    def feed(self, chunk: bytes) -> list[tuple[dict, bytes]]:
        if self._dead:
            return []
        if self._skip:
            if len(chunk) <= self._skip:
                self._skip -= len(chunk)
                return []
            chunk = chunk[self._skip :]
            self._skip = 0
        self._buf += chunk
        return self._drain(final=False)

    def finish(self) -> list[tuple[dict, bytes]]:
        return [] if self._dead else self._drain(final=True)

    def _drain(self, final: bool) -> list[tuple[dict, bytes]]:
        recs: list[tuple[dict, bytes]] = []
        buf = self._buf
        pos = 0
        n = len(buf)
        while True:
            if self._resync:
                nxt = buf.find(b"WARC/", pos)
                if nxt < 0:
                    pos = max(pos, n - 5)  # keep a possible split "WARC/"
                    break
                pos = nxt
                self._resync = False
            while buf[pos : pos + 2] == b"\r\n":
                pos += 2
            if n - pos < 5:
                if final and n - pos > 0:
                    self._dead = True  # trailing garbage
                break
            if buf[pos : pos + 5] != b"WARC/":
                self._dead = True  # stop at the first non-record byte
                break
            hdr_end = buf.find(b"\r\n\r\n", pos)
            if hdr_end < 0:
                if final or n - pos > _MAX_HEADER_BYTES:
                    self._dead = True
                break
            lines = bytes(buf[pos:hdr_end]).decode("utf-8", "replace").split("\r\n")
            headers: dict[str, str] = {}
            for ln in lines[1:]:
                k, _, v = ln.partition(":")
                headers[k.strip().lower()] = v.strip()
            try:
                clen = int(headers.get("content-length", "0"))
                if clen < 0:
                    raise ValueError(clen)
            except ValueError:
                # tolerance contract: skip the record, resync at next WARC/
                pos = hdr_end + 4
                self._resync = True
                continue
            if self._max is not None and clen > self._max:
                # oversized record: drop its payload without buffering
                have = n - (hdr_end + 4)
                if have >= clen:
                    pos = hdr_end + 4 + clen
                    continue
                self._skip = clen - have
                pos = n
                break
            end = hdr_end + 4 + clen
            if n < end:
                break  # wait for the rest of the payload (or truncated EOF)
            recs.append((headers, bytes(buf[hdr_end + 4 : end])))
            pos = end
        if pos:
            del buf[:pos]
        return recs


def iter_warc_records(
    chunks: Iterable[bytes], max_record_bytes: int | None = None
) -> Iterator[tuple[dict, bytes]]:
    """Stream (headers, payload) records out of an iterable of raw WARC
    chunks — records are yielded as soon as complete, never buffering more
    than one record."""
    carver = WarcCarver(max_record_bytes)
    for chunk in chunks:
        yield from carver.feed(chunk)
    yield from carver.finish()


def parse_warc_records(data: bytes) -> list[tuple[dict, bytes]]:
    """Whole-buffer convenience wrapper over the streaming carver:
    [(headers_lowercased, payload), ...]. Tolerant of trailing garbage and
    malformed Content-Length (skips the record, resyncs at the next
    ``WARC/`` line)."""
    return list(iter_warc_records([data]))


def gunzip_member_chunks(
    raw_chunks: Iterable[bytes],
    max_chunk_bytes: int = 1 << 20,
) -> Iterator[bytes]:
    """Incremental multi-member gzip decode: yields decompressed chunks,
    restarting the decompressor at each member boundary (WARC .gz archives
    are one gzip member per record, concatenated).

    Decompression is BOUNDED per call (``max_chunk_bytes``): one
    highly-compressed member (a ~1000:1 gzip bomb) emerges as a stream of
    capped chunks the downstream carver can skip record-by-record, never as
    one multi-GiB allocation — the bounded-memory contract holds against
    adversarial archives, not just large ones."""
    d = zlib.decompressobj(zlib.MAX_WBITS | 16)
    for chunk in raw_chunks:
        data = chunk
        while data:
            out = d.decompress(data, max_chunk_bytes)
            if out:
                yield out
            if d.eof:
                data = d.unused_data
                d = zlib.decompressobj(zlib.MAX_WBITS | 16)
            elif d.unconsumed_tail:
                data = d.unconsumed_tail
            else:
                data = b""
    out = d.flush()
    if out:
        yield out


def _open_stream(path: str):
    """Open a Spark-reported file path for streaming reads. Handles plain
    paths, file: URIs (binaryFile reports ``file:/abs/path``), and any
    pyarrow filesystem URI (s3://, hdfs://, gs://) on a real cluster."""
    if path.startswith("file:"):
        local = path[len("file:") :]
        while local.startswith("//"):
            local = local[1:]
        return open(local, "rb")
    if "://" in path:
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(path)
        return filesystem.open_input_stream(p)
    return open(path, "rb")


def _file_chunks(fh, chunk_bytes: int) -> Iterator[bytes]:
    while True:
        chunk = fh.read(chunk_bytes)
        if not chunk:
            return
        yield chunk


def read_warc(
    spark: SparkSession,
    warc_glob: str,
    *,
    batch_bytes: int = 64 << 20,
    chunk_bytes: int = 4 << 20,
    max_record_bytes: int | None = 256 << 20,
) -> DataFrame:
    """WARC archives → one row per record (WARC_SCHEMA), bounded memory.

    The ``binaryFile`` scan is used only to glob + distribute PATHS (the
    ``content`` column is pruned, so Spark never reads archive bytes into a
    row); each task streams its files in ``chunk_bytes`` reads and yields
    Arrow batches capped at ``batch_bytes`` of payload. Peak per-task memory
    is O(batch_bytes + max_record_bytes), independent of archive size.
    """
    files = spark.read.format("binaryFile").load(warc_glob).select("path")
    cols = [f.name for f in WARC_SCHEMA.fields]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: dict[str, list] = {c: [] for c in cols}
        acc = 0

        def _flush() -> pd.DataFrame:
            nonlocal rows, acc
            pdf = pd.DataFrame(rows)
            rows = {c: [] for c in cols}
            acc = 0
            return pdf

        for pdf in batches:
            for path in pdf["path"]:
                fh = _open_stream(path)
                try:
                    chunks: Iterable[bytes] = _file_chunks(fh, chunk_bytes)
                    if path.endswith(".gz"):
                        chunks = gunzip_member_chunks(chunks)
                    for headers, payload in iter_warc_records(
                        chunks, max_record_bytes
                    ):
                        rows["warc_file"].append(path)
                        rows["record_id"].append(headers.get("warc-record-id"))
                        rows["warc_type"].append(headers.get("warc-type"))
                        rows["target_uri"].append(headers.get("warc-target-uri"))
                        rows["warc_date"].append(headers.get("warc-date"))
                        rows["content_type"].append(headers.get("content-type"))
                        rows["content_length"].append(len(payload))
                        rows["payload"].append(payload)
                        acc += len(payload)
                        if acc >= batch_bytes:
                            yield _flush()
                finally:
                    fh.close()
        if rows["warc_file"]:
            yield _flush()

    return files.mapInPandas(_run, schema=WARC_SCHEMA)


_HTTP_UNWRAP_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("body", T.BinaryType()),
    ]
)


@F.pandas_udf(_HTTP_UNWRAP_SCHEMA)
def _http_unwrap(content_type: pd.Series, payload: pd.Series) -> pd.DataFrame:
    """Unwrap HTTP-message payloads (Arrow-batched). Real WARC response
    records (Common Crawl, Heritrix, wget --warc) carry
    ``Content-Type: application/http; msgtype=response`` with the FULL HTTP
    message (status line + headers + body) as payload — the document MIME is
    the HTTP Content-Type header, and the document bytes are the HTTP body.
    Synthetic/plain records (MIME written directly into the WARC header)
    pass through unchanged."""
    mimes: list[str | None] = []
    bodies: list[bytes | None] = []
    for ct, pl in zip(content_type, payload):
        ct = ct or ""
        pl = bytes(pl) if pl is not None else b""
        if ct.lower().startswith("application/http"):
            split = pl.find(b"\r\n\r\n")
            head, body = (pl, b"") if split < 0 else (pl[:split], pl[split + 4 :])
            mime: str | None = None
            for ln in head.split(b"\r\n")[1:]:
                k, _, v = ln.partition(b":")
                if k.strip().lower() == b"content-type":
                    mime = (
                        v.strip().decode("latin-1").split(";")[0].strip().lower()
                    )
                    break
            mimes.append(mime or "application/octet-stream")
            bodies.append(body)
        else:
            mimes.append(ct.split(";")[0].strip().lower() or None)
            bodies.append(pl)
    return pd.DataFrame({"mime": mimes, "body": bodies})


def warc_responses_to_documents(warc: DataFrame) -> DataFrame:
    """WARC response records → the engine's interleaved documents table:
    one text span per response payload (UTF-8 decoded), doc_id = target
    URI. ``application/http`` payloads are unwrapped first (HTTP headers
    decide the MIME; only the HTTP body becomes the span payload). Media
    records (non-text MIME) become media spans with the payload carried
    opaquely downstream (multimodal operators)."""
    resp = warc.filter(F.col("warc_type") == "response").withColumn(
        "_http", _http_unwrap(F.col("content_type"), F.col("payload"))
    )
    is_text = F.col("_http.mime").startswith("text/")
    span = F.when(
        is_text,
        F.struct(
            F.lit("text").alias("kind"),
            F.decode(F.col("_http.body"), "utf-8").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        ),
    ).otherwise(
        F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.col("target_uri").alias("media_ref"),
            F.lit(0).alias("offset"),
        )
    )
    return resp.select(
        F.col("target_uri").alias("doc_id"), F.array(span).alias("spans")
    )


def read_sitemap_seeds(
    spark: SparkSession, sitemap_glob: str, default_priority: float = 0.5
) -> DataFrame:
    """sitemap.xml → frontier seed rows (url, priority) via Spark 4's
    native XML source (rowTag=url). Feeds CrawlScheduler.init_from_seeds
    directly — URLs are canonicalized and deduped there; sitemap
    <priority> (0..1) carries into the frontier priority."""
    sm = (
        spark.read.format("xml")
        .option("rowTag", "url")
        .load(sitemap_glob)
    )
    pri = (
        F.coalesce(F.col("priority").cast("double"), F.lit(default_priority))
        if "priority" in sm.columns
        else F.lit(default_priority)
    )
    return sm.filter(F.col("loc").isNotNull()).select(
        F.col("loc").cast("string").alias("url"), pri.alias("priority")
    )


def read_sitemap_index(spark: SparkSession, paths: str | list[str]) -> list[str]:
    """``<sitemapindex>`` → child sitemap locations. Driver-side collect is
    the right shape here: the sitemap spec caps an index at 50,000 entries,
    so the result is bounded small. Files without ``<sitemap>`` tags (leaf
    urlsets) contribute zero rows — the explicit schema keeps the combined
    load inference-free."""
    idx = (
        spark.read.format("xml")
        .option("rowTag", "sitemap")
        .schema("loc STRING")
        .load(paths)
    )
    return [
        r["loc"]
        for r in idx.filter(F.col("loc").isNotNull()).select("loc").collect()
    ]


def read_sitemap_seeds_recursive(
    spark: SparkSession,
    paths: str | list[str],
    default_priority: float = 0.5,
    max_depth: int = 3,
) -> DataFrame:
    """Sitemap INDEX expansion (the sitemaps.org two-level layout, which
    large sites use because one urlset caps at 50k URLs): walk
    ``<sitemapindex>`` levels down to leaf urlsets (depth-capped against
    cycles), then read EVERY reachable urlset in one load.

    Child ``<loc>`` values must be Spark-loadable paths/URIs (file:, hdfs:,
    s3a:) — in a live crawl, fetch remote sitemaps to storage first via the
    fetch seam (frontier/fetch.py), then point this at the archive dir.
    Index files in the final load contribute zero seed rows (explicit
    schema, no inference)."""
    if isinstance(paths, str):
        paths = [paths]
    leaves, frontier = list(paths), list(paths)
    for _ in range(max_depth):
        children = read_sitemap_index(spark, frontier)
        if not children:
            break
        leaves.extend(children)
        frontier = children
    sm = (
        spark.read.format("xml")
        .option("rowTag", "url")
        .schema("loc STRING, priority DOUBLE")
        .load(leaves)
    )
    return sm.filter(F.col("loc").isNotNull()).select(
        F.col("loc").alias("url"),
        F.coalesce(F.col("priority"), F.lit(default_priority)).alias("priority"),
    )


# ---- WARC sink (write crawl output AS the canonical archive format) --------


def build_warc_record(headers: dict[str, str], payload: bytes) -> bytes:
    """Format one WARC/1.0 record (version line, headers, Content-Length,
    CRLF CRLF, payload, record separator)."""
    lines = ["WARC/1.0"]
    lines += [f"{k}: {v}" for k, v in headers.items()]
    lines.append(f"Content-Length: {len(payload)}")
    return ("\r\n".join(lines) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def write_warc(
    docs: DataFrame,
    out_dir: str,
    *,
    date: str = "2026-01-01T00:00:00Z",
    gzip_members: bool = True,
) -> list[dict]:
    """Interleaved documents → WARC archives, one file per partition
    (``part-<pid>.warc[.gz]``, one gzip member per record — the Common
    Crawl layout the reader streams). Returns the write manifest
    [{path, n_records, bytes}, ...].

    Each document becomes a ``response`` record (text spans joined, UTF-8,
    ``text/plain``; target URI = doc_id when it is already a URL, else
    ``urn:doc:<id>``) plus one ``resource`` record per media span (the
    media_ref as target). Record ids are md5-derived from the doc id —
    deterministic, so re-writes are byte-identical (task retries are safe:
    files land via write-then-rename). ``date`` is caller-supplied, never
    wall-clock, for the same reason.

    Reference analogue: the CSV corpus sink (S7) at crawl-archive fidelity;
    round-trips through read_warc/warc_responses_to_documents.
    """
    import gzip as _gzip
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)
    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("n_records", T.LongType()),
            T.StructField("bytes", T.LongType()),
        ]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fh = None
        pid = None
        path = tmp = None
        n = total = 0

        def _emit(rec: bytes) -> int:
            # mtime=0: no wall-clock in the member header, so re-writes
            # of the same docs are byte-identical (determinism contract)
            blob = _gzip.compress(rec, mtime=0) if gzip_members else rec
            fh.write(blob)
            return len(blob)

        for pdf in batches:
            for doc_id, spans, p in zip(pdf["doc_id"], pdf["spans"], pdf["_pid"]):
                if fh is None:
                    pid = int(p)
                    ext = ".warc.gz" if gzip_members else ".warc"
                    path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
                    tmp = path + ".inprogress"
                    fh = open(tmp, "wb")
                uri = (
                    doc_id
                    if isinstance(doc_id, str) and "://" in doc_id
                    else f"urn:doc:{doc_id}"
                )
                rid = hashlib.md5(str(doc_id).encode()).hexdigest()
                span_list = [] if spans is None else list(spans)
                texts = [
                    s["text"] for s in span_list if s["kind"] != "media" and s["text"]
                ]
                body = " ".join(texts).encode()
                total += _emit(
                    build_warc_record(
                        {
                            "WARC-Type": "response",
                            "WARC-Record-ID": f"<urn:uuid:{rid}>",
                            "WARC-Date": date,
                            "WARC-Target-URI": uri,
                            "Content-Type": "text/plain",
                        },
                        body,
                    )
                )
                n += 1
                for j, s in enumerate(span_list):
                    if s["kind"] == "media" and s["media_ref"]:
                        total += _emit(
                            build_warc_record(
                                {
                                    "WARC-Type": "resource",
                                    "WARC-Record-ID": f"<urn:uuid:{rid}-m{j}>",
                                    "WARC-Date": date,
                                    "WARC-Target-URI": s["media_ref"],
                                    "Content-Type": "application/octet-stream",
                                },
                                b"",
                            )
                        )
                        n += 1
        if fh is None:
            yield pd.DataFrame({"path": [], "n_records": [], "bytes": []})
            return
        fh.close()
        os.replace(tmp, path)  # atomic publish per task
        yield pd.DataFrame({"path": [path], "n_records": [n], "bytes": [total]})

    manifest = (
        docs.select("doc_id", "spans")
        .withColumn("_pid", F.spark_partition_id())
        .mapInPandas(_run, schema=schema)
    )
    return [r.asDict() for r in manifest.collect()]
