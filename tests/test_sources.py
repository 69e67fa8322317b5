"""CORD-19 ingest source tests with a synthetic tarball + metadata fixture
(the reference ships no fixtures — FIXTURES.md §3 schemas)."""

import io
import json
import tarfile

from cord19_crawler_spark.sources.cord19 import ingest_cord19


def _make_fixture(tmp_path):
    docs = {
        "pdf_json/shaA.json": {
            "paper_id": "shaA",
            "metadata": {"title": "Title A"},
            "abstract": [{"text": "abs A1"}, {"text": "abs A2"}],
            "body_text": [{"text": f"body A{i}"} for i in range(60)],  # > cap
        },
        # second parse of the SAME paper (sha ';' list) — must NOT produce a
        # duplicate doc_id (reference skips dups, src/index.py:62-63)
        "pdf_json/shaA2.json": {
            "paper_id": "shaA2",
            "metadata": {"title": "Title A dup parse"},
            "abstract": [],
            "body_text": [{"text": "dup body"}],
        },
        "pdf_json/shaB.json": {
            "paper_id": "shaB",
            "metadata": {"title": None},
            "abstract": [],
            "body_text": [{"text": "body B0 http://X.com/b"}],
        },
        # PMC-only paper: member key comes from the pmcid (.xml.json strip)
        "pmc_json/PMC35282.xml.json": {
            "paper_id": "PMC35282",
            "metadata": {"title": None},
            "abstract": [],
            "body_text": [{"text": "pmc body C"}],
        },
        "pdf_json/shaZ.json": {  # not in metadata → dropped by the inner join
            "paper_id": "shaZ",
            "metadata": {"title": "orphan"},
            "abstract": [],
            "body_text": [],
        },
    }
    tar_path = tmp_path / "parses.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        for member_name, payload in docs.items():
            body = json.dumps(payload).encode()
            info = tarfile.TarInfo(name=member_name)
            info.size = len(body)
            tf.addfile(info, io.BytesIO(body))
        # non-json member must be skipped
        info = tarfile.TarInfo(name="README.txt")
        info.size = 2
        tf.addfile(info, io.BytesIO(b"hi"))
    meta_path = tmp_path / "metadata.csv"
    # uidC's title contains an embedded newline inside the quoted field —
    # requires multiLine CSV parsing (real CORD-19 metadata has these)
    meta_path.write_text(
        "cord_uid,sha,pmcid,title,abstract\n"
        "uidA,shaA; shaA2,,Meta Title A,absA\n"
        "uidB,shaB,,Meta Title B,absB\n"
        'uidC,,PMC35282,"Title C\nsecond line",absC\n'
    )
    return str(tar_path), str(meta_path)


def test_ingest_cord19_end_to_end(spark, tmp_path):
    tar_path, meta_path = _make_fixture(tmp_path)
    docs = ingest_cord19(spark, tar_path, meta_path, span_cap=50)
    collected = docs.collect()
    rows = {r["doc_id"]: r["spans"] for r in collected}
    # orphan sha dropped by join; PMC-only paper kept; NO duplicate doc_ids
    # even though uidA has two parse members (shaA + shaA2)
    assert set(rows) == {"uidA", "uidB", "uidC"}
    assert len(collected) == 3

    a = rows["uidA"]
    # the deterministic keeper is the lexicographically-first parse (shaA),
    # span order: title → abstract → body; cap at 50 (reference
    # src/crawler.py:59-82, cap at :80)
    assert len(a) == 50
    assert a[0]["kind"] == "title" and a[0]["text"] == "Title A"
    assert [s["kind"] for s in a[:3]] == ["title", "abstract", "abstract"]
    assert a[3]["kind"] == "body" and a[3]["text"] == "body A0"
    # offsets are 0-based span indices (F.transform's lambda index)
    assert [s["offset"] for s in a] == list(range(50))

    b = rows["uidB"]
    # null JSON title falls back to metadata title (P10 coalesce)
    assert b[0]["text"] == "Meta Title B"
    assert b[1]["text"] == "body B0 http://X.com/b"

    c = rows["uidC"]
    # PMC-only paper (matched via pmcid, '.xml.json' stripped); metadata
    # title with the embedded newline survives multiLine CSV parsing
    assert c[0]["text"] == "Title C\nsecond line"
    assert c[1]["text"] == "pmc body C"


def test_multi_sha_split(spark, tmp_path):
    from cord19_crawler_spark.sources.cord19 import read_metadata_csv, sha_lookup

    _, meta_path = _make_fixture(tmp_path)
    lut = sha_lookup(read_metadata_csv(spark, meta_path)).collect()
    shas = {r["sha"] for r in lut}
    # ';' split + trim, plus pmcid keys (reference registers both)
    assert {"shaA", "shaA2", "shaB", "PMC35282"} == shas


def test_csv_corpus_sink_roundtrip(spark, tmp_path):
    """S7: interleaved documents → one CSV row per doc (header, span-order
    text join, media spans excluded), readable back by Spark's CSV source."""
    from pyspark.sql import Row

    from cord19_crawler_spark.sources.cord19 import write_corpus_csv

    docs = spark.createDataFrame([
        Row(doc_id="d1", spans=[
            Row(kind="text", text="hello", media_ref=None, offset=0),
            Row(kind="media", text=None, media_ref="m://1", offset=1),
            Row(kind="text", text="world", media_ref=None, offset=2),
        ]),
        Row(doc_id="d2", spans=[
            Row(kind="text", text="only, one \"quoted\"", media_ref=None, offset=0),
        ]),
        # cord19-style interleaved kinds must export too (not just 'text')
        Row(doc_id="d3", spans=[
            Row(kind="title", text="T3", media_ref=None, offset=0),
            Row(kind="abstract", text="A3", media_ref=None, offset=1),
            Row(kind="body", text="B3", media_ref=None, offset=2),
        ]),
    ])
    out = str(tmp_path / "corpus_csv")
    write_corpus_csv(docs, out)
    back = spark.read.option("header", True).csv(out)
    rows = {r["doc_id"]: r for r in back.collect()}
    assert rows["d1"]["text"] == "hello world" and rows["d1"]["n_spans"] == "3"
    assert rows["d2"]["text"] == 'only, one "quoted"'  # csv quoting survives
    assert rows["d3"]["text"] == "T3 A3 B3"


def test_title_truncation(spark):
    """P11: reference truncates display titles at 67 chars + ellipsis."""
    from cord19_crawler_spark.functions.text import truncate_title

    import pyspark.sql.functions as F
    df = spark.createDataFrame([("x" * 80,), ("short",)], "title string")
    got = [r["t"] for r in df.select(truncate_title(F.col("title")).alias("t")).collect()]
    assert got[0] == "x" * 67 + "..." and got[1] == "short"


def test_orc_roundtrip_interleaved_docs(spark, tmp_path):
    """The interleaved-span document schema survives a round-trip through
    ORC (Spark's second native columnar format) — nested array<struct>
    intact, span order preserved."""
    from cord19_crawler_spark.datagen import generate_documents

    docs = generate_documents(spark, 50, partitions=2)
    p = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(p)
    back = spark.read.orc(p)
    # ORC relaxes nullability flags; names/types must match exactly
    assert back.schema.simpleString() == docs.schema.simpleString()
    a = {r["doc_id"]: r["spans"] for r in docs.collect()}
    b = {r["doc_id"]: r["spans"] for r in back.collect()}
    assert a == b


def _make_warc_bytes(records):
    out = b""
    for headers, payload in records:
        hdr = "WARC/1.0\r\n" + "".join(
            f"{k}: {v}\r\n" for k, v in headers.items()
        ) + f"Content-Length: {len(payload)}\r\n"
        out += hdr.encode() + b"\r\n" + payload + b"\r\n\r\n"
    return out


def test_warc_source_roundtrip(spark, tmp_path):
    """WARC archives (plain + gzip) parse into one row per record; response
    records convert to the interleaved documents table (text + media)."""
    import gzip as _gzip

    from cord19_crawler_spark.sources.warc import (
        read_warc,
        warc_responses_to_documents,
    )

    recs1 = [
        ({"WARC-Type": "warcinfo", "WARC-Record-ID": "<urn:uuid:0>"}, b"software: test"),
        ({"WARC-Type": "response", "WARC-Record-ID": "<urn:uuid:1>",
          "WARC-Target-URI": "https://a.com/page", "Content-Type": "text/html",
          "WARC-Date": "2026-01-01T00:00:00Z"}, b"hello <b>world</b>"),
    ]
    recs2 = [
        ({"WARC-Type": "response", "WARC-Record-ID": "<urn:uuid:2>",
          "WARC-Target-URI": "https://b.com/img", "Content-Type": "image/png"},
         b"\x89PNG fakebytes"),
    ]
    d = tmp_path / "warcs"; d.mkdir()
    (d / "one.warc").write_bytes(_make_warc_bytes(recs1))
    (d / "two.warc.gz").write_bytes(_gzip.compress(_make_warc_bytes(recs2)))

    warc = read_warc(spark, str(d))
    rows = {r["record_id"]: r for r in warc.collect()}
    assert len(rows) == 3
    assert rows["<urn:uuid:1>"]["warc_type"] == "response"
    assert bytes(rows["<urn:uuid:1>"]["payload"]) == b"hello <b>world</b>"
    assert rows["<urn:uuid:2>"]["content_type"] == "image/png"  # gzip member

    docs = {r["doc_id"]: r["spans"] for r in warc_responses_to_documents(warc).collect()}
    assert docs["https://a.com/page"][0]["kind"] == "text"
    assert docs["https://a.com/page"][0]["text"] == "hello <b>world</b>"
    assert docs["https://b.com/img"][0]["kind"] == "media"
    assert docs["https://b.com/img"][0]["media_ref"] == "https://b.com/img"


def test_sitemap_seeds_feed_the_scheduler(spark, tmp_path):
    """sitemap.xml (native Spark 4 XML source) → seed rows → a real crawl
    round: sitemap priorities decide the fetch order."""
    from cord19_crawler_spark.datagen import generate_documents
    from cord19_crawler_spark.frontier import CrawlScheduler, SchedulerConfig
    from cord19_crawler_spark.sources.warc import read_sitemap_seeds

    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<url><loc>HTTPS://HOST0.EXAMPLE.COM/doc/1#frag</loc><priority>0.9</priority></url>\n"
        "<url><loc>https://host1.example.com/doc/2</loc><priority>0.2</priority></url>\n"
        "<url><loc>https://host2.example.com/doc/3</loc></url>\n"
        "</urlset>\n"
    )
    p = tmp_path / "sitemap.xml"
    p.write_text(xml)
    seeds = read_sitemap_seeds(spark, str(p))
    got = {r["url"]: r["priority"] for r in seeds.collect()}
    assert got == {
        "HTTPS://HOST0.EXAMPLE.COM/doc/1#frag": 0.9,
        "https://host1.example.com/doc/2": 0.2,
        "https://host2.example.com/doc/3": 0.5,  # default priority
    }
    docs = generate_documents(spark, 50, partitions=2)
    s = CrawlScheduler(
        spark, docs, str(tmp_path / "ck"),
        SchedulerConfig(batch_size=10, seen_partitions=2, bloom_bits=1 << 12,
                        min_delay_rounds=1, max_in_flight=10),
    )
    s.run(1, seeds=seeds)
    order = [u for _, _, u in s.crawl_order()]
    # canonicalized (lowercase host, fragment stripped) and priority-ordered
    assert order[0] == "https://host0.example.com/doc/1"
    assert set(order) == {
        "https://host0.example.com/doc/1",
        "https://host2.example.com/doc/3",
        "https://host1.example.com/doc/2",
    }


def test_sitemap_index_recursion(spark, tmp_path):
    """<sitemapindex> → child sitemaps → leaf urlsets, depth-capped; mixed
    dirs (an index next to a plain urlset) resolve in one read."""
    from cord19_crawler_spark.sources.warc import read_sitemap_seeds_recursive

    def urlset(*locs_pri):
        rows = "".join(
            f"<url><loc>{u}</loc>" + (f"<priority>{p}</priority>" if p else "")
            + "</url>"
            for u, p in locs_pri
        )
        return (
            '<?xml version="1.0"?><urlset '
            f'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">{rows}</urlset>'
        )

    leaf_a = tmp_path / "leaf_a.xml"
    leaf_a.write_text(urlset(("https://a.com/1", "0.8"), ("https://a.com/2", None)))
    leaf_b = tmp_path / "leaf_b.xml"
    leaf_b.write_text(urlset(("https://b.com/1", None)))
    child_idx = tmp_path / "child_idx.xml"
    child_idx.write_text(
        '<?xml version="1.0"?><sitemapindex>'
        f"<sitemap><loc>{leaf_b}</loc></sitemap></sitemapindex>"
    )
    root_idx = tmp_path / "root.xml"
    root_idx.write_text(
        '<?xml version="1.0"?><sitemapindex>'
        f"<sitemap><loc>{leaf_a}</loc></sitemap>"
        f"<sitemap><loc>{child_idx}</loc></sitemap></sitemapindex>"
    )
    got = {
        r["url"]: r["priority"]
        for r in read_sitemap_seeds_recursive(spark, str(root_idx)).collect()
    }
    assert got == {
        "https://a.com/1": 0.8,
        "https://a.com/2": 0.5,   # default priority
        "https://b.com/1": 0.5,   # two levels deep
    }
    # depth cap: max_depth=1 resolves only the first index level
    shallow = {
        r["url"]
        for r in read_sitemap_seeds_recursive(
            spark, str(root_idx), max_depth=1
        ).collect()
    }
    assert shallow == {"https://a.com/1", "https://a.com/2"}


# ---- streaming WARC ingest (bounded memory) --------------------------------


def test_warc_carver_streams_before_file_is_consumed():
    """The streaming carver yields records INCREMENTALLY: the first record
    comes out after reading only its own bytes, not the whole archive —
    the bounded-memory property (a 1 GiB Common-Crawl archive must not be
    materialized per task)."""
    from cord19_crawler_spark.sources.warc import iter_warc_records

    recs = [
        ({"WARC-Type": "response", "WARC-Record-ID": f"<urn:uuid:{i}>",
          "WARC-Target-URI": f"https://x.com/{i}", "Content-Type": "text/plain"},
         bytes([65 + i % 26]) * 10_000)
        for i in range(100)
    ]
    blob = _make_warc_bytes(recs)
    consumed = 0

    def chunks(sz=1024):
        nonlocal consumed
        for i in range(0, len(blob), sz):
            consumed += len(blob[i:i + sz])
            yield blob[i:i + sz]

    it = iter_warc_records(chunks())
    first = next(it)
    assert first[0]["warc-record-id"] == "<urn:uuid:0>"
    # after the first record only ~1 record's worth of bytes was pulled
    assert consumed < len(blob) * 0.05
    rest = list(it)
    assert len(rest) == 99 and consumed == len(blob)


def test_warc_multi_member_gzip_larger_than_batch_cap(spark, tmp_path):
    """A multi-member .warc.gz (one gzip member per record, the Common Crawl
    layout) larger than the per-batch payload cap parses identically to the
    uncapped read — the task yields multiple bounded Arrow batches instead
    of one archive-sized allocation."""
    import gzip as _gzip

    from cord19_crawler_spark.sources.warc import read_warc

    recs = [
        ({"WARC-Type": "response", "WARC-Record-ID": f"<urn:uuid:{i}>",
          "WARC-Target-URI": f"https://x.com/{i}", "Content-Type": "text/plain"},
         f"payload-{i}-".encode() * 700)  # ~8 KiB each
        for i in range(60)
    ]
    # one gzip member per record, concatenated
    blob = b"".join(_gzip.compress(_make_warc_bytes([r])) for r in recs)
    d = tmp_path / "warcs"; d.mkdir()
    (d / "multi.warc.gz").write_bytes(blob)

    capped = read_warc(spark, str(d), batch_bytes=64 << 10, chunk_bytes=4 << 10)
    rows = {r["record_id"]: bytes(r["payload"]) for r in capped.collect()}
    assert len(rows) == 60
    assert rows["<urn:uuid:7>"] == b"payload-7-" * 700
    uncapped = read_warc(spark, str(d))
    assert {r["record_id"]: bytes(r["payload"]) for r in uncapped.collect()} == rows


def test_warc_malformed_content_length_skips_and_resyncs():
    """A record with a garbage Content-Length is skipped (tolerance
    contract) and parsing resyncs at the next WARC/ line — the task does
    not fail."""
    from cord19_crawler_spark.sources.warc import parse_warc_records

    good1 = _make_warc_bytes(
        [({"WARC-Type": "response", "WARC-Record-ID": "<a>",
           "WARC-Target-URI": "https://a.com/"}, b"AAA")])
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <bad>\r\n"
           b"Content-Length: oops\r\n\r\njunkjunk\r\n\r\n")
    good2 = _make_warc_bytes(
        [({"WARC-Type": "response", "WARC-Record-ID": "<b>",
           "WARC-Target-URI": "https://b.com/"}, b"BBB")])
    recs = parse_warc_records(good1 + bad + good2)
    ids = [h["warc-record-id"] for h, _ in recs]
    assert ids == ["<a>", "<b>"]
    assert [p for _, p in recs] == [b"AAA", b"BBB"]


def test_warc_oversized_record_skipped_without_buffering():
    """Records declaring Content-Length > max_record_bytes are dropped by
    streaming past the payload; neighbors still parse."""
    from cord19_crawler_spark.sources.warc import iter_warc_records

    recs = [
        ({"WARC-Type": "response", "WARC-Record-ID": "<small1>",
          "WARC-Target-URI": "https://a.com/"}, b"x" * 100),
        ({"WARC-Type": "response", "WARC-Record-ID": "<huge>",
          "WARC-Target-URI": "https://big.com/"}, b"y" * 50_000),
        ({"WARC-Type": "response", "WARC-Record-ID": "<small2>",
          "WARC-Target-URI": "https://b.com/"}, b"z" * 100),
    ]
    blob = _make_warc_bytes(recs)
    chunks = [blob[i:i + 512] for i in range(0, len(blob), 512)]
    out = list(iter_warc_records(chunks, max_record_bytes=10_000))
    assert [h["warc-record-id"] for h, _ in out] == ["<small1>", "<small2>"]


def test_warc_application_http_payload_unwrapped(spark, tmp_path):
    """Real WARC response records carry 'application/http; msgtype=response'
    with the FULL HTTP message as payload — the document MIME must come from
    the HTTP Content-Type header and only the HTTP body becomes the span
    (text for text/*, media otherwise)."""
    from cord19_crawler_spark.sources.warc import (
        read_warc,
        warc_responses_to_documents,
    )

    http_text = (b"HTTP/1.1 200 OK\r\nServer: x\r\n"
                 b"Content-Type: text/html; charset=utf-8\r\n\r\n"
                 b"<p>real body</p>")
    http_media = (b"HTTP/1.1 200 OK\r\n"
                  b"Content-Type: image/jpeg\r\n\r\n"
                  b"\xff\xd8jpegbytes")
    recs = [
        ({"WARC-Type": "response", "WARC-Record-ID": "<t>",
          "WARC-Target-URI": "https://a.com/page",
          "Content-Type": "application/http; msgtype=response"}, http_text),
        ({"WARC-Type": "response", "WARC-Record-ID": "<m>",
          "WARC-Target-URI": "https://a.com/pic",
          "Content-Type": "application/http; msgtype=response"}, http_media),
        # synthetic/plain record (MIME directly in the WARC header) unchanged
        ({"WARC-Type": "response", "WARC-Record-ID": "<p>",
          "WARC-Target-URI": "https://a.com/plain",
          "Content-Type": "text/plain"}, b"plain body"),
    ]
    d = tmp_path / "warcs"; d.mkdir()
    (d / "real.warc").write_bytes(_make_warc_bytes(recs))
    docs = {r["doc_id"]: r["spans"][0]
            for r in warc_responses_to_documents(read_warc(spark, str(d))).collect()}
    assert docs["https://a.com/page"]["kind"] == "text"
    assert docs["https://a.com/page"]["text"] == "<p>real body</p>"
    assert docs["https://a.com/pic"]["kind"] == "media"
    assert docs["https://a.com/pic"]["media_ref"] == "https://a.com/pic"
    assert docs["https://a.com/plain"]["kind"] == "text"
    assert docs["https://a.com/plain"]["text"] == "plain body"


def test_warc_sink_roundtrip(spark, tmp_path):
    """write_warc → read_warc → warc_responses_to_documents recovers every
    document's text (and media spans surface as resource records); re-write
    is byte-identical (deterministic record ids + caller-supplied date)."""
    from cord19_crawler_spark.datagen import generate_documents
    from cord19_crawler_spark.sources.warc import (
        read_warc,
        warc_responses_to_documents,
        write_warc,
    )

    docs = generate_documents(spark, 80, partitions=3).cache()
    out1, out2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    manifest = write_warc(docs, out1)
    assert len(manifest) == 3 and sum(m["n_records"] for m in manifest) > 80
    back = read_warc(spark, out1)
    resources = back.filter(back.warc_type == "resource")
    assert resources.count() > 0  # media spans became resource records
    got = {r["doc_id"]: r["spans"][0]["text"]
           for r in warc_responses_to_documents(back).collect()}
    for r in docs.collect():
        texts = [s["text"] for s in r["spans"] if s["kind"] != "media" and s["text"]]
        key = f"urn:doc:{r['doc_id']}"
        if texts:
            assert got[key] == " ".join(texts)
        else:
            assert got.get(key, "") == ""
    # determinism: same docs, same date → byte-identical archives
    write_warc(docs, out2)
    import os
    for m in manifest:
        name = os.path.basename(m["path"])
        with open(m["path"], "rb") as a, open(os.path.join(out2, name), "rb") as b:
            assert a.read() == b.read()


def test_gunzip_member_bounded_chunks_against_bomb():
    """A ~1000:1 gzip member (decompression bomb) must stream out as capped
    chunks, never one archive-sized allocation — the bounded-memory contract
    against adversarial archives."""
    import gzip as _gzip

    from cord19_crawler_spark.sources.warc import gunzip_member_chunks

    bomb = _gzip.compress(b"\x00" * (8 << 20))  # 8 MiB of zeros, ~8 KiB gz
    assert len(bomb) < 64 << 10
    cap = 1 << 16
    chunks = list(gunzip_member_chunks([bomb], max_chunk_bytes=cap))
    assert max(len(c) for c in chunks) <= cap
    assert sum(len(c) for c in chunks) == 8 << 20
    # multi-member stream (member boundary mid-bomb) still decodes fully
    two = bomb + _gzip.compress(b"tail")
    out = b"".join(gunzip_member_chunks([two], max_chunk_bytes=cap))
    assert out == b"\x00" * (8 << 20) + b"tail"


def test_warc_carver_chunking_invariance_property():
    """PROPERTY: however the byte stream is chunked, the streaming carver
    yields exactly the records the whole-buffer parse yields — including
    around malformed and oversized records."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cord19_crawler_spark.sources.warc import iter_warc_records

    recs = [
        ({"WARC-Type": "response", "WARC-Record-ID": f"<r{i}>",
          "WARC-Target-URI": f"https://x.com/{i}"},
         bytes([97 + i % 26]) * (7 + i * 13 % 200))
        for i in range(12)
    ]
    bad = (b"WARC/1.0\r\nWARC-Record-ID: <bad>\r\nContent-Length: nope\r\n\r\n"
           b"junk\r\n\r\n")
    blob = (_make_warc_bytes(recs[:6]) + bad + _make_warc_bytes(recs[6:]))
    want = [(h["warc-record-id"], p) for h, p in iter_warc_records([blob])]
    assert len(want) == 12

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=len(blob)),
                    min_size=0, max_size=12))
    def check(cuts):
        points = sorted({0, len(blob), *[c % len(blob) for c in cuts]})
        chunks = [blob[a:b] for a, b in zip(points, points[1:]) if a < b]
        got = [(h["warc-record-id"], p) for h, p in iter_warc_records(chunks)]
        assert got == want

    check()
