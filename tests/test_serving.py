"""S10: HTTP serving layer — endpoint-for-endpoint parity with the
reference Flask app (/root/reference/src/app.py), served from the Spark
index. The service logic is tested directly AND through a real loopback
HTTP server (stdlib client), including the multipart upload branch."""

import json
import os
import threading
import urllib.error
import urllib.request

import pytest

from cord19_crawler_spark.plans.search_pipeline import build_index, search
from cord19_crawler_spark.serving import SearchService, make_server

ROWS = [
    (1, "covid vaccine study results covid", "Covid vaccine study"),
    (2, "vaccine trials in europe", "Vaccine trials"),
    (3, "weather patterns and climate", "Weather report"),
    (4, "covid covid covid transmission", "Covid transmission"),
    (5, "testing vaccines for covid variants", "Variant testing"),
]


@pytest.fixture(scope="module")
def served_index(spark, tmp_path_factory):
    """(index_dir, corpus_path): a built index plus the corpus parquet the
    /view endpoint point-looks-up."""
    root = tmp_path_factory.mktemp("serve")
    corpus = str(root / "docs")
    docs = spark.createDataFrame(ROWS, "doc_id long, text string, title string")
    docs.write.parquet(corpus)
    idx = str(root / "idx")
    build_index(spark, docs, idx, title_col="title", num_barrels=4)
    return idx, corpus


@pytest.fixture()
def service(spark, served_index, tmp_path):
    idx, corpus = served_index
    return SearchService(
        spark, idx, corpus_path=corpus,
        state_dir=str(tmp_path / "state"), title_col="title",
    )


def test_stats_static_only(service):
    s = service.stats()
    assert s == {"static_docs": 5, "dynamic_docs": 0, "total_docs": 5}


def test_search_shape_and_total_hits(service):
    out = service.search("covid vaccine")
    # reference JSON contract, app.py:138-144
    assert set(out) == {"results", "total_hits", "time", "synonyms"}
    assert out["total_hits"] == 4  # docs 1,2,4,5 match covid OR vaccine
    assert out["synonyms"] == []
    first = out["results"][0]
    assert set(first) == {"id", "title", "score", "snippet", "match_terms"}
    assert first["match_terms"] == ["covid", "vaccine"]
    assert first["snippet"] == "Click to view full document content..."
    float(first["score"])  # "%.2f"-formatted string


def test_search_topk_matches_pipeline(spark, served_index, service):
    idx, _ = served_index
    expected = [
        str(r["doc_id"])
        for r in search(spark, idx, "covid vaccine", k=30).collect()
    ]
    got = [r["id"] for r in service.search("covid vaccine")["results"]]
    assert got == expected


def test_search_empty_query_raises(service):
    with pytest.raises(ValueError):
        service.search("   ")


def test_autocomplete(service):
    # reference: <2 chars → [] (app.py:149-150)
    assert service.autocomplete("v") == []
    out = service.autocomplete("va")
    assert out and all(w.startswith("va") for w in out)
    assert len(out) <= 5


def test_upload_search_view_roundtrip(service):
    res = service.upload("Quantum zebra paper", "zebra quantum covid text")
    assert res["id"] == "dyn_1" and res["message"] == "Indexed successfully"
    assert service.stats() == {
        "static_docs": 5, "dynamic_docs": 1, "total_docs": 6,
    }
    # new doc searchable with NO index rebuild (T2/T3)
    hit = service.search("zebra")
    assert hit["total_hits"] == 1
    assert hit["results"][0]["id"] == "dyn_1"
    assert hit["results"][0]["title"] == "Quantum zebra paper"
    # merged ranking: static + dynamic in one result set
    both = service.search("covid")
    assert both["total_hits"] == 4  # docs 1,4,5 + dyn_1
    assert "dyn_1" in {r["id"] for r in both["results"]}
    # /view — dynamic doc text
    v = service.view("dyn_1")
    assert v["content"] == "zebra quantum covid text"
    # /view — static doc pushdown lookup on the corpus parquet
    v4 = service.view("4")
    assert v4["content"] == "covid covid covid transmission"
    assert v4["title"] == "Covid transmission"
    # /view — miss renders the reference's error text (app.py:231-233)
    assert "Error" in service.view("999")["content"]


def test_upload_empty_content_rejected(service):
    with pytest.raises(ValueError):
        service.upload("t", "   ")


def test_upload_file_branches(service):
    cord = {
        "metadata": {"title": "Cord paper"},
        "body_text": [{"text": "alpha beta"}, {"text": "gamma"}],
    }
    r1 = service.upload_file("p.json", json.dumps(cord).encode())
    assert r1["title"] == "Cord paper"
    assert service.view(r1["id"])["content"] == "alpha beta gamma"
    r2 = service.upload_file(
        "s.json", json.dumps({"title": "Simple", "content": "delta text"}).encode()
    )
    assert r2["title"] == "Simple"
    r3 = service.upload_file("notes.txt", b"epsilon words")
    assert r3["title"] == "notes.txt"
    with pytest.raises(ValueError):
        service.upload_file("x.pdf", b"%PDF")
    with pytest.raises(ValueError):
        service.upload_file("bad.json", json.dumps({"foo": 1}).encode())


def test_state_dir_resume(spark, served_index, tmp_path):
    """Reference persists the dynamic index on every add; a restarted
    server must still serve uploaded docs and not reuse their ids."""
    idx, corpus = served_index
    state = str(tmp_path / "st")
    s1 = SearchService(spark, idx, corpus_path=corpus, state_dir=state)
    s1.upload("first", "persistent xylophone doc")
    s2 = SearchService(spark, idx, corpus_path=corpus, state_dir=state)
    assert s2.stats()["dynamic_docs"] == 1
    assert s2.search("xylophone")["results"][0]["id"] == "dyn_1"
    assert s2.upload("second", "another one")["id"] == "dyn_2"


def test_in_memory_delta_without_state_dir(spark, served_index):
    idx, corpus = served_index
    svc = SearchService(spark, idx, corpus_path=corpus)
    svc.upload("mem", "ephemeral yodel content")
    assert svc.search("yodel")["total_hits"] == 1
    assert svc.view("dyn_1")["content"] == "ephemeral yodel content"


# ---------------------------------------------------------------------------
# real HTTP round-trips
# ---------------------------------------------------------------------------


@pytest.fixture()
def server(spark, served_index, tmp_path):
    idx, corpus = served_index
    svc = SearchService(
        spark, idx, corpus_path=corpus,
        state_dir=str(tmp_path / "state"), title_col="title",
    )
    srv = make_server(svc, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    srv.shutdown()
    srv.server_close()


def _get(url, accept=None):
    req = urllib.request.Request(url)
    if accept:
        req.add_header("Accept", accept)
    with urllib.request.urlopen(req) as r:
        return r.status, dict(r.headers), r.read()


def _post(url, body, ctype):
    req = urllib.request.Request(url, data=body, method="POST")
    req.add_header("Content-Type", ctype)
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def test_http_home_and_search(server):
    status, headers, body = _get(server + "/")
    assert status == 200
    assert headers["Access-Control-Allow-Origin"] == "*"  # flask_cors parity
    assert json.loads(body)["total_docs"] == 5

    status, _, body = _get(server + "/api/search?q=covid+vaccine")
    out = json.loads(body)
    assert status == 200 and out["total_hits"] == 4
    assert out["results"][0]["id"] == "1"  # coverage boost winner

    # 400 on empty query (app.py:98-99)
    try:
        _get(server + "/api/search?q=")
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_http_autocomplete_and_404(server):
    status, _, body = _get(server + "/api/autocomplete?q=va")
    words = json.loads(body)
    assert status == 200 and words and all(w.startswith("va") for w in words)
    status, _, body = _get(server + "/api/autocomplete?q=v")
    assert json.loads(body) == []
    try:
        _get(server + "/nope")
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_http_upload_json_and_view(server):
    status, out = _post(
        server + "/api/upload",
        json.dumps({"title": "Posted", "content": "hovercraft full of eels"}).encode(),
        "application/json",
    )
    assert status == 200 and out["id"] == "dyn_1"
    _, _, body = _get(server + "/api/search?q=hovercraft")
    assert json.loads(body)["results"][0]["id"] == "dyn_1"
    _, _, body = _get(server + "/view/dyn_1")
    assert json.loads(body)["content"] == "hovercraft full of eels"
    # HTML content negotiation
    _, headers, body = _get(server + "/view/dyn_1", accept="text/html")
    assert headers["Content-Type"].startswith("text/html")
    assert b"hovercraft full of eels" in body
    # static doc view over HTTP
    _, _, body = _get(server + "/view/3")
    assert json.loads(body)["content"] == "weather patterns and climate"


def test_http_upload_multipart_file(server):
    boundary = "XxXserveboundaryXxX"
    payload = json.dumps(
        {"metadata": {"title": "Multi"}, "body_text": [{"text": "walrus ivory"}]}
    )
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; filename="m.json"\r\n'
        "Content-Type: application/json\r\n\r\n"
        f"{payload}\r\n"
        f"--{boundary}--\r\n"
    ).encode()
    status, out = _post(
        server + "/api/upload", body,
        f"multipart/form-data; boundary={boundary}",
    )
    assert status == 200 and out["title"] == "Multi"
    _, _, res = _get(server + "/api/search?q=walrus")
    assert json.loads(res)["total_hits"] == 1


def test_semantic_expansion_path(spark, served_index, tmp_path):
    """app.py:99-105 — semantic=true expands the query with Word2Vec
    synonyms, which become ADDITIONAL full query terms. Pins: synonyms
    surface in the response, results can only grow, and the expansion
    equals operators.semantic.expand_query on the same model."""
    from pyspark.sql import functions as F

    from cord19_crawler_spark.operators import semantic
    from cord19_crawler_spark.operators.search import preprocess_query

    idx, corpus = served_index
    rows = [(i, "virus vaccine protein cell virus vaccine") for i in range(30)] + [
        (100 + i, "trial results data analysis trial results") for i in range(30)
    ]
    toks = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .select("doc_id", F.split(F.lower(F.col("text")), " ").alias("words"))
    )
    model = semantic.train_word2vec(toks, vector_size=8, min_count=5, seed=42)
    model_dir = str(tmp_path / "w2v")
    semantic.save_model(model, model_dir)

    svc = SearchService(
        spark, idx, corpus_path=corpus, model_dir=model_dir, title_col="title"
    )
    plain = svc.search("vaccine", use_semantic=False)
    sem = svc.search("vaccine", use_semantic=True)
    expansion = semantic.expand_query(model, preprocess_query("vaccine"), top_n=3)
    expected = sorted({s for t, vs in expansion.items() for s in vs if s != t})
    assert sem["synonyms"] == expected and expected  # model knows 'vaccine'
    assert sem["total_hits"] >= plain["total_hits"]
    # semantic off (or no model) keeps the plain path byte-identical
    no_model = SearchService(spark, idx, corpus_path=corpus, title_col="title")
    off = no_model.search("vaccine", use_semantic=True)
    assert off["synonyms"] == [] and off["total_hits"] == plain["total_hits"]


def test_concurrency_gate_bounds_inflight_queries(spark, served_index, tmp_path):
    """r4 verdict item #8: a burst of concurrent HTTP requests must not
    queue unbounded Spark jobs on the one session — the service's
    BoundedSemaphore admits at most max_concurrent_queries requests into
    the Spark-running sections; the rest park at the gate. Pinned via the
    peak-in-flight counter under a 10-thread burst with a gate of 2, and
    every request still returns a correct result."""
    idx, corpus = served_index
    svc = SearchService(
        spark, idx, corpus_path=corpus,
        state_dir=str(tmp_path / "state"), title_col="title",
        max_concurrent_queries=2,
    )
    results, errors = [], []

    def hit(i):
        try:
            if i % 3 == 0:
                out = svc.search("covid vaccine")
                assert out["total_hits"] == 4
            elif i % 3 == 1:
                words = svc.autocomplete("co")
                assert isinstance(words, list)
            else:
                v = svc.view("1")
                assert v["doc_id"] == "1"
            results.append(i)
        except Exception as e:  # pragma: no cover - fail loud below
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert len(results) == 10
    assert 1 <= svc._inflight_peak <= 2  # the gate actually bound the burst
    assert svc._inflight == 0  # all permits released


def test_concurrency_gate_validation(spark, served_index):
    idx, corpus = served_index
    with pytest.raises(ValueError, match="max_concurrent_queries"):
        SearchService(spark, idx, corpus_path=corpus, max_concurrent_queries=0)


# ---------------------------------------------------------------------------
# BM25 ranker + spelling endpoints (round-5 additions)
# ---------------------------------------------------------------------------


def test_bm25_ranker_matches_direct_bm25(spark, served_index, service):
    """The served bm25 path (doclen side table + meta token mass) must
    equal bm25_search computed directly over the full postings."""
    from pyspark.sql import functions as F

    from cord19_crawler_spark.operators.indexing import (
        postings as mk_postings,
        tokens_from_text,
    )
    from cord19_crawler_spark.operators.search import bm25_search

    docs = spark.createDataFrame(
        ROWS, "doc_id long, text string, title string"
    )
    p = mk_postings(tokens_from_text(docs.select("doc_id", "text")))
    want = [
        (r["doc_id"], r["score"])
        for r in bm25_search(p, ["covid", "vaccine"], 5, k=None).collect()
    ]
    out = service.search("covid vaccine", ranker="bm25")
    got = [(int(r["id"]), r["score"]) for r in out["results"]]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert float(gs) == pytest.approx(ws, abs=0.005)  # "%.2f" format
    assert out["total_hits"] == 4


def test_bm25_ranker_sees_uploaded_delta_doc(service):
    up = service.upload("Fresh covid doc", "covid vaccine covid breakthrough")
    out = service.search("breakthrough", ranker="bm25")
    assert out["total_hits"] == 1
    assert out["results"][0]["id"] == up["id"]
    # static + delta lengths merged: a covid query ranks the upload too
    both = service.search("covid", ranker="bm25")
    assert both["total_hits"] == 4  # docs 1,4,5 + the upload


def test_unknown_ranker_rejected(service):
    with pytest.raises(ValueError):
        service.search("covid", ranker="pagerank")


def test_spell_endpoint_service(service):
    # 'vacine' -> 'vaccine' at distance 1 via the delete-neighborhood
    got = service.spell("vacine")
    assert got and got[0]["word"] == "vaccine" and got[0]["dist"] == 1
    assert service.spell("v") == []  # under 2 chars


def test_http_bm25_and_spell(server):
    status, _, body = _get(server + "/api/search?q=covid&ranker=bm25")
    assert status == 200
    assert json.loads(body)["total_hits"] == 3
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server + "/api/search?q=covid&ranker=nope")
    assert e.value.code == 400
    assert json.loads(e.value.read())["error"].startswith("Unknown ranker")
    status, _, body = _get(server + "/api/spell?q=climat")
    sp = json.loads(body)
    assert sp[0]["word"] == "climate" and sp[0]["dist"] == 1
