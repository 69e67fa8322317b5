"""HTTP serving layer (S10) — the reference's Flask app re-expressed over
the Spark engine.

Reference surface (/root/reference/src/app.py):

  GET  /                  total doc count, static + dynamic        (:84-92)
  GET  /api/search        TF-IDF multiword search, optional
                          semantic expansion; JSON {results,
                          total_hits, time, synonyms}              (:93-146)
  GET  /api/autocomplete  top-5 prefix completions, >=2 chars     (:147-153)
  POST /api/upload        instant delta indexing — multipart file
                          (.json CORD-19 / simple, .txt) or JSON
                          body {title, content}                   (:155-224)
  GET  /view/<doc_id>     title + full text point lookup          (:225-236)

Spark-first shape — the service holds ONE SparkSession plus a built index
(``plans.search_pipeline.build_index`` output) and composes existing
operators; nothing here re-implements query logic:

  search        barrel-pruned postings scan → ``tfidf_search`` with
                ``k=None``, cached once: top-k AND the reference's
                ``total_found`` (len(combined), src/multiwordSearch.py:154)
                come from the SAME candidate-scale frame — no second job.
  semantic      synonyms become ADDITIONAL QUERY TERMS exactly like the
                reference (app.py:99-105 appends them to the query string
                before multi_word_search), not per-term variants.
  autocomplete  ``prefix_match`` (P12) over the cached lexicon — a pruned
                filter+top-5, not the reference's full-vocabulary trie in
                driver RAM (10^7-10^8 words at web scale won't fit one
                process; the lexicon DataFrame scales with executors).
  upload        ``operators.delta.upsert_documents`` duplicate guard (T5)
                + parquet append (T4 persist-per-add); searchable with no
                rebuild via the read-time merge (T2/T3, J9).
  view          predicate-pushdown point lookup (S8) on the corpus parquet
                — the reference streams the whole CSV per click
                (src/singlewordSearch.py:216-231, O(corpus) per view).

HTTP = stdlib ``ThreadingHTTPServer``: zero extra deps, and the JSON
response shapes match the reference app field-for-field so its clients can
point at this server unchanged. Deliberate deviations, all documented
inline: dynamic ids are a monotonic counter (``dyn_1``…) instead of
``int(time.time())`` — the uniqueness the timestamp was for, without the
>1-upload/sec collision or the test nondeterminism; ``/`` and ``/view``
return JSON, not rendered HTML templates (UI assets are out of engine
scope — SURVEY.md §2.1).
"""

from __future__ import annotations

import contextlib
import html
import json
import os
import re
import threading
import time
from email.parser import BytesParser
from email.policy import default as _EMAIL_POLICY
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlsplit

from pyspark.sql import functions as F
from pyspark.sql import DataFrame, SparkSession

from .operators.search import preprocess_query, prefix_match
from .plans import search_pipeline

_DYN_ID = re.compile(r"^dyn_(\d+)$")


class SearchService:
    """Driver-side façade over a built index: every public method is one
    HTTP endpoint's logic, independently testable without a socket."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        corpus_path: str | None = None,
        state_dir: str | None = None,
        model_dir: str | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        title_col: str | None = None,
        autocomplete_k: int = 5,
        max_concurrent_queries: int = 8,
    ) -> None:
        if max_concurrent_queries < 1:
            raise ValueError(
                f"max_concurrent_queries must be >= 1, got {max_concurrent_queries}"
            )
        self.spark = spark
        self.index_dir = index_dir
        self.corpus_path = corpus_path
        self.id_col = id_col
        self.text_col = text_col
        self.title_col = title_col
        self.autocomplete_k = autocomplete_k
        with open(os.path.join(index_dir, "_INDEX.json")) as f:
            self.meta = json.load(f)
        # tiny vocabulary-projection cache for autocomplete/expansion reads
        self._lexicon = spark.read.parquet(
            os.path.join(index_dir, "lexicon")
        ).cache()
        self._model = None
        if model_dir:
            from .operators.semantic import load_model

            self._model = load_model(model_dir)
        # dynamic (uploaded) docs: persisted parquet appends under state_dir
        # (reference persists the delta index on EVERY add,
        # src/dynamic_indexer.py save path) + a driver-side title dict for
        # result formatting (bounded: one entry per upload, the same memory
        # the reference's doc_manager.dynamic_docs holds)
        self._state_dir = state_dir
        self._delta_path = (
            os.path.join(state_dir, "delta_docs") if state_dir else None
        )
        self._lock = threading.Lock()
        # concurrency guard (r4 verdict item #8): ThreadingHTTPServer spawns
        # one thread per connection, so a burst of requests would otherwise
        # queue UNBOUNDED concurrent jobs on the one SparkSession (each
        # search is several jobs — count + top-k collect — and local-mode
        # scheduling degrades superlinearly when hundreds contend). The
        # semaphore bounds Spark-job-running requests; excess HTTP threads
        # block at the gate (cheap: one parked thread each) instead of
        # flooding the scheduler. Peak tracking is for tests/monitoring.
        self._query_sem = threading.BoundedSemaphore(max_concurrent_queries)
        self.max_concurrent_queries = max_concurrent_queries
        self._inflight = 0
        self._inflight_peak = 0
        self._inflight_lock = threading.Lock()
        self._dyn_titles: dict[str, str] = {}
        # in-memory fallback when no state_dir was given (ephemeral server);
        # bounded by uploads to THIS process, like the reference's
        # doc_manager.dynamic_docs dict
        self._dyn_rows: list[tuple[str, str, str]] = []
        self._next_dyn = 1
        if self._delta_path and os.path.isdir(self._delta_path):
            for r in (
                spark.read.parquet(self._delta_path)
                .select("doc_id", "title")
                .collect()
            ):  # bounded: resume replays only past uploads
                self._dyn_titles[r["doc_id"]] = r["title"]
                m = _DYN_ID.match(r["doc_id"])
                if m:
                    self._next_dyn = max(self._next_dyn, int(m.group(1)) + 1)

    @contextlib.contextmanager
    def _query_gate(self):
        """Bound in-flight Spark-query requests (see __init__). NOT
        reentrant — only leaf methods that actually run Spark jobs take
        the gate (upload_file delegates to upload, which gates)."""
        self._query_sem.acquire()
        with self._inflight_lock:
            self._inflight += 1
            self._inflight_peak = max(self._inflight_peak, self._inflight)
        try:
            yield
        finally:
            with self._inflight_lock:
                self._inflight -= 1
            self._query_sem.release()

    # -- / ---------------------------------------------------------------
    def stats(self) -> dict:
        """app.py:84-92 — Total (Static + Dynamic)."""
        return {
            "static_docs": self.meta["total_docs"],
            "dynamic_docs": len(self._dyn_titles),
            "total_docs": self.meta["total_docs"] + len(self._dyn_titles),
        }

    # -- /api/search -------------------------------------------------------
    def search(
        self,
        query: str,
        use_semantic: bool = False,
        max_results: int = 30,
        ranker: str = "tfidf",
    ) -> dict:
        """app.py:93-146 — semantic expansion, multi-word ranking, total
        hits, per-request wall time. Raises ValueError on empty query
        (the 400 branch). ``ranker``: "tfidf" (reference formula,
        default — existing clients see identical scores) or "bm25"
        (Okapi BM25 over the index's doclen side table; see
        plans.search_pipeline.search)."""
        query = (query or "").strip()
        if not query:
            raise ValueError("Empty query")
        if ranker not in ("tfidf", "bm25"):
            raise ValueError(f"Unknown ranker: {ranker}")
        t0 = time.time()
        query_words = query.split()
        synonyms: list[str] = []
        final_query = query
        if use_semantic and self._model is not None:
            from .operators.semantic import expand_query

            expansion = expand_query(
                self._model, preprocess_query(query), top_n=3
            )
            syn_set = {
                s for t, vs in expansion.items() for s in vs if s != t
            }
            synonyms = sorted(syn_set)  # reference: list(set(...))
            if synonyms:
                final_query += " " + " ".join(synonyms)
        with self._query_gate():
            full = search_pipeline.search(
                self.spark,
                self.index_dir,
                final_query,
                k=None,
                delta_docs=self._delta_docs(),
                ranker=ranker,
            ).cache()
            try:
                total = full.count()
                rows = (
                    full.orderBy(F.desc("score"), F.asc("doc_id"))
                    .limit(max_results)
                    .collect()
                )
            finally:
                full.unpersist()
        results = []
        for r in rows:
            doc_id = str(r["doc_id"])
            title = (
                r["title"]
                if "title" in r.__fields__ and r["title"] is not None
                else self._dyn_titles.get(doc_id, "Untitled Document")
            )
            results.append(
                {
                    "id": doc_id,
                    "title": title,
                    "score": f"{r['score']:.2f}",
                    # reference serves a fixed snippet (app.py:119-123,
                    # "too slow in Lite Mode") — keep the exact string
                    "snippet": "Click to view full document content...",
                    "match_terms": query_words,
                }
            )
        return {
            "results": results,
            "total_hits": total,
            "time": f"{time.time() - t0:.3f}",
            "synonyms": synonyms,
        }

    # -- /api/autocomplete ---------------------------------------------------
    def autocomplete(self, prefix: str) -> list[str]:
        """app.py:147-153 — [] under 2 chars, else top-5 completions by
        corpus frequency (the trie's per-node cache order,
        src/autocomplete.py:58-73)."""
        prefix = (prefix or "").strip().lower()
        if len(prefix) < 2:
            return []
        with self._query_gate():
            return [
                r["word"]
                for r in prefix_match(
                    self._lexicon, prefix, self.autocomplete_k
                ).collect()
            ]

    # -- /api/spell ----------------------------------------------------------
    def spell(self, term: str, max_edit: int = 1, k: int = 5) -> list[dict]:
        """Did-you-mean suggestions over the index lexicon (SymSpell
        delete-neighborhood + exact Levenshtein verify,
        operators/search.py:spelling_correction) — extends the reference
        app's surface (it has autocomplete but no misspelling recovery)
        using index data the service already caches. Returns
        [{word, dist, count}] ranked (distance asc, frequency desc)."""
        term = (term or "").strip().lower()
        if len(term) < 2:
            return []
        from .operators.search import spelling_correction

        lex = self._lexicon.select(
            "word", F.col("total_count").cast("long").alias("total_count")
        )
        with self._query_gate():
            return [
                {
                    "word": r["word"],
                    "dist": r["dist"],
                    "count": r["total_count"],
                }
                for r in spelling_correction(
                    lex, term, max_edit=max_edit, k=k
                ).collect()
            ]

    # -- /api/upload ---------------------------------------------------------
    def upload(self, title: str, content: str) -> dict:
        """app.py:196-224 — instant delta indexing. Raises ValueError for
        empty content (400); duplicate ids cannot occur (monotonic counter)
        but the T5 anti-join guard still runs so a corrupted delta dir
        can't double-index."""
        if not content or not content.strip():
            raise ValueError("Document content is empty")
        with self._query_gate(), self._lock:
            doc_id = f"dyn_{self._next_dyn}"
            self._next_dyn += 1
            new = self.spark.createDataFrame(
                [(doc_id, title or "Untitled", content)],
                "doc_id string, title string, text string",
            )
            delta = self._delta_docs_full()
            if delta is not None:
                # T5 duplicate guard (anti-join, operators/delta.py
                # semantics) — a no-op for counter ids, but protects a
                # resumed or externally-written delta dir from
                # double-indexing the same id
                fresh = new.join(
                    delta.select("doc_id"), "doc_id", "left_anti"
                )
                if fresh.count() == 0:
                    raise RuntimeError("Indexing failed (Duplicate or Empty)")
            else:
                fresh = new
            if self._delta_path:
                fresh.write.mode("append").parquet(self._delta_path)
            else:
                self._dyn_rows.append(
                    (doc_id, title or "Untitled", content)
                )
            self._dyn_titles[doc_id] = title or "Untitled"
        return {"message": "Indexed successfully", "id": doc_id, "title": self._dyn_titles[doc_id]}

    def upload_file(self, filename: str, data: bytes) -> dict:
        """app.py:160-195 — .json (CORD-19 ``metadata``+``body_text`` or
        simple ``{title, content}``) and .txt file branches."""
        name = (filename or "").lower()
        if name.endswith(".json"):
            payload = json.loads(data.decode("utf-8"))
            if "metadata" in payload and "title" in payload["metadata"]:
                title = payload["metadata"]["title"]
                content = " ".join(
                    p["text"] for p in payload.get("body_text", [])
                )
            elif "content" in payload:
                title = payload.get("title", filename)
                content = payload["content"]
            else:
                raise ValueError(
                    "Unknown JSON structure. Use CORD-19 or simple "
                    "{'title':, 'content':} format"
                )
        elif name.endswith(".txt"):
            title = filename
            content = data.decode("utf-8")
        else:
            raise ValueError("Unsupported file type. Use .json or .txt")
        return self.upload(title, content)

    # -- /view/<doc_id> --------------------------------------------------------
    def view(self, doc_id: str) -> dict:
        """app.py:225-236 — dynamic docs first, then a PUSHDOWN point
        lookup on the corpus parquet (vs the reference's full-CSV stream
        per click). Returns {"doc_id", "title", "content"}."""
        with self._query_gate():
            return self._view_inner(str(doc_id))

    def _view_inner(self, doc_id: str) -> dict:
        if doc_id in self._dyn_titles:
            if self._delta_path:
                row = (
                    self.spark.read.parquet(self._delta_path)
                    .filter(F.col("doc_id") == F.lit(doc_id))
                    .select("title", "text")
                    .limit(1)
                    .collect()
                )
                if row:
                    return {
                        "doc_id": doc_id,
                        "title": row[0]["title"],
                        "content": row[0]["text"],
                    }
            else:
                for did, title, text in self._dyn_rows:
                    if did == doc_id:
                        return {
                            "doc_id": doc_id,
                            "title": title,
                            "content": text,
                        }
        if self.corpus_path:
            corpus = self.spark.read.parquet(self.corpus_path)
            key = F.col(self.id_col)
            # typed literal keeps the predicate pushdown-able (a cast on
            # the COLUMN side would defeat parquet row-group skipping)
            if dict(corpus.dtypes)[self.id_col] in (
                "int",
                "bigint",
                "smallint",
            ):
                if not doc_id.lstrip("-").isdigit():
                    return self._not_found(doc_id)
                lit = F.lit(int(doc_id))
            else:
                lit = F.lit(doc_id)
            cols = [F.col(self.text_col).alias("text")]
            if self.title_col and self.title_col in corpus.columns:
                cols.append(F.col(self.title_col).alias("title"))
            row = (
                corpus.filter(key == lit).select(*cols).limit(1).collect()
            )
            if row:
                return {
                    "doc_id": doc_id,
                    "title": row[0]["title"]
                    if "title" in row[0].__fields__
                    else self._static_title(doc_id),
                    "content": row[0]["text"],
                }
        return self._not_found(doc_id)

    def _not_found(self, doc_id: str) -> dict:
        # reference renders the error INTO the page body (app.py:231-233)
        return {
            "doc_id": doc_id,
            "title": "Untitled Document",
            "content": "Error: Could not load the text for this document.",
        }

    def _static_title(self, doc_id: str) -> str:
        titles_dir = os.path.join(self.index_dir, "titles")
        if not self.meta.get("has_titles") or not os.path.isdir(titles_dir):
            return "Untitled Document"
        t = self.spark.read.parquet(titles_dir)
        lit = (
            F.lit(int(doc_id))
            if dict(t.dtypes)["doc_id"] in ("int", "bigint", "smallint")
            and doc_id.lstrip("-").isdigit()
            else F.lit(doc_id)
        )
        row = t.filter(F.col("doc_id") == lit).limit(1).collect()
        return row[0]["title"] if row else "Untitled Document"

    # -- delta frame -----------------------------------------------------------
    def _delta_docs(self) -> DataFrame | None:
        """(doc_id, text) of uploaded docs for the read-time merge; None
        when nothing was uploaded (static-only fast path)."""
        full = self._delta_docs_full()
        return full.select("doc_id", "text") if full is not None else None

    def _delta_docs_full(self) -> DataFrame | None:
        if not self._dyn_titles:
            return None
        if self._delta_path and os.path.isdir(self._delta_path):
            return self.spark.read.parquet(self._delta_path)
        if self._dyn_rows:
            return self.spark.createDataFrame(
                self._dyn_rows, "doc_id string, title string, text string"
            )
        return None


# --------------------------------------------------------------------------
# HTTP layer
# --------------------------------------------------------------------------


def _parse_multipart(body: bytes, content_type: str) -> dict[str, tuple[str | None, bytes]]:
    """name → (filename, payload) from a multipart/form-data body, via the
    stdlib email parser (no cgi module — removed in 3.13)."""
    head = (
        f"Content-Type: {content_type}\r\nMIME-Version: 1.0\r\n\r\n"
    ).encode("ascii")
    msg = BytesParser(policy=_EMAIL_POLICY).parsebytes(head + body)
    out: dict[str, tuple[str | None, bytes]] = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if name is None:
            continue
        out[str(name)] = (part.get_filename(), part.get_payload(decode=True))
    return out


class _Handler(BaseHTTPRequestHandler):
    service: SearchService  # injected by make_server
    protocol_version = "HTTP/1.1"

    # silence the default stderr access log (tests run many requests)
    def log_message(self, fmt, *args):  # noqa: D102
        pass

    def _json(self, obj, status: int = 200) -> None:
        body = json.dumps(obj).encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        # reference enables CORS globally (flask_cors, app.py:16)
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802
        url = urlsplit(self.path)
        qs = parse_qs(url.query)
        svc = self.service
        try:
            if url.path == "/":
                self._json(svc.stats())
            elif url.path == "/api/search":
                q = qs.get("q", [""])[0].strip()
                if not q:
                    self._json({"error": "Empty query"}, 400)
                    return
                semantic = (
                    qs.get("semantic", ["false"])[0].lower() == "true"
                )
                ranker = qs.get("ranker", ["tfidf"])[0].lower()
                self._json(svc.search(q, use_semantic=semantic, ranker=ranker))
            elif url.path == "/api/autocomplete":
                self._json(svc.autocomplete(qs.get("q", [""])[0]))
            elif url.path == "/api/spell":
                self._json(svc.spell(qs.get("q", [""])[0]))
            elif url.path.startswith("/view/"):
                doc = svc.view(unquote(url.path[len("/view/"):]))
                if "text/html" in self.headers.get("Accept", ""):
                    page = (
                        "<!doctype html><title>{t}</title><h1>{t}</h1>"
                        "<pre>{c}</pre>".format(
                            t=html.escape(doc["title"]),
                            c=html.escape(doc["content"]),
                        )
                    ).encode("utf-8")
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(page)))
                    self.end_headers()
                    self.wfile.write(page)
                else:
                    self._json(doc)
            else:
                self._json({"error": "Not found"}, 404)
        except ValueError as e:
            self._json({"error": str(e)}, 400)
        except Exception as e:  # match Flask's 500-with-message behavior
            self._json({"error": str(e)}, 500)

    def do_POST(self) -> None:  # noqa: N802
        url = urlsplit(self.path)
        if url.path != "/api/upload":
            self._json({"error": "Not found"}, 404)
            return
        svc = self.service
        try:
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length) if length else b""
            ctype = self.headers.get("Content-Type", "")
            if ctype.startswith("multipart/form-data"):
                parts = _parse_multipart(body, ctype)
                if "file" not in parts or not parts["file"][0]:
                    self._json({"error": "No file selected"}, 400)
                    return
                fname, data = parts["file"]
                self._json(svc.upload_file(fname, data or b""))
            elif ctype.startswith("application/json"):
                payload = json.loads(body.decode("utf-8"))
                self._json(
                    svc.upload(
                        payload.get("title", "Untitled"),
                        payload.get("content", ""),
                    )
                )
            else:
                self._json({"error": "No data provided"}, 400)
        except ValueError as e:
            self._json({"error": str(e)}, 400)
        except Exception as e:
            self._json({"error": str(e)}, 500)


def make_server(service: SearchService, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Bind (port=0 → ephemeral, tests read ``server.server_address``);
    caller drives ``serve_forever`` — typically in a daemon thread."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def serve(service: SearchService, host: str = "0.0.0.0", port: int = 5000) -> None:
    """Blocking entry point (reference runs on port 5000, app.py:239)."""
    srv = make_server(service, host, port)
    print(f"serving on http://{host}:{srv.server_address[1]}")
    try:
        srv.serve_forever()
    finally:
        srv.server_close()
