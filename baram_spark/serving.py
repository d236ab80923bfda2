"""REST serving tier — the ``baram serve`` analog.

Re-implements the reference's API server surface
(``/root/reference/src/commands/serve.rs:311-470, 688-760``) over the
preloaded search engine:

    GET /api/search?q=...&mode=hybrid|keyword|bm25|vector|knn&k=10
        [&category=...&date_from=...&date_to=...&threshold=...]
        → {"query", "mode", "total", "results": [SearchResult...]}
    GET /api/health → {"status", "service", "version", ...}

SearchResult mirrors ``src/embedding/mod.rs:88-116``: id ("oid_aid"),
score, title, 500-char content, category, publisher, url, published_at,
highlights (1 title + 3 content fragments).

Architecture note (the 100-TB story): this is the OpenSearch-NODE analog —
one serving process holds the postings (engine ``preload=True``), the doc
metadata projection, and the embedding matrix resident, and answers with
zero Spark jobs. At full scale each such node serves one shard-set and a
thin router fans out/merges (exactly the reference's OpenSearch topology);
Spark remains the build/analytics plane. The stdlib threaded HTTP server
stands in for axum."""

from __future__ import annotations

import json
import threading
from datetime import datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from .query.bm25 import DEFAULT_K
from .query.engine import MAX_K, SearchEngine
from .query.hybrid import hash_embed, highlight, hybrid_search

VERSION = "0.2.0"


def _parse_date(s: str | None):
    if not s:
        return None
    for fmt in ("%Y-%m-%d", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"bad date: {s!r} (use YYYY-MM-DD[THH:MM:SS])")


class ServingContext:
    """Everything a serving node keeps resident: preloaded postings,
    doc-metadata projection, and the build-time embedding matrix."""

    def __init__(self, spark, index_dir: str, dim: int = 64):
        import os

        import pyarrow.dataset as ds

        self.engine = SearchEngine(spark, index_dir, preload=True)
        self.dim = dim
        local = index_dir.rstrip("/").removeprefix("file:")
        cols = ["doc_id", "oid", "aid", "title", "text", "category",
                "publisher", "url", "published_at"]
        committed = self.engine._committed  # snapshot manifest, if present
        docs_ds = ds.dataset(
            f"{local}/docs", format="parquet", partitioning="hive"
        )
        gen_filter = (
            ds.field("gen").isin(committed)
            if committed and "gen" in docs_ds.schema.names else None
        )
        docs = docs_ds.to_table(columns=cols, filter=gen_filter).to_pydict()
        self.meta: dict[int, dict] = {}
        for i in range(len(docs["doc_id"])):
            self.meta[int(docs["doc_id"][i])] = {
                c: docs[c][i] for c in cols if c != "doc_id"
            }
        denied = set(
            int(x) for x in (self.engine._denied.tolist()
                             if self.engine._denied is not None else [])
        )
        if denied:
            self.meta = {
                d: m for d, m in self.meta.items() if d not in denied
            }
        self.emb_ids = None
        self.emb = None
        emb_dir = f"{local}/embeddings"
        if os.path.exists(emb_dir):
            tbl = ds.dataset(
                emb_dir, format="parquet", partitioning="hive"
            ).to_table(columns=["doc_id", "embedding"])
            ids = np.asarray(tbl["doc_id"].to_pylist(), dtype=np.int64)
            mat = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
            keep = np.array([i not in denied for i in ids.tolist()])
            self.emb_ids, self.emb = ids[keep], mat[keep]

    def refresh(self) -> None:
        """Re-open at the latest committed snapshot (OpenSearch _refresh
        analog): new generations/deletions become searchable in place."""
        self.__init__(self.engine.spark, self.engine.index_dir, dim=self.dim)

    # -- candidate filter (driver-side: metadata already resident) --------
    def _allowed(self, category, date_from, date_to):
        if category is None and date_from is None and date_to is None:
            return None
        out = []
        for doc_id, m in self.meta.items():
            if category is not None and m["category"] != category:
                continue
            pub = m["published_at"]
            if date_from is not None and (pub is None or pub < date_from):
                continue
            if date_to is not None and (pub is None or pub > date_to):
                continue
            out.append(doc_id)
        return np.array(sorted(out), dtype=np.int64)

    def _knn(self, query_text: str, k: int, allowed) -> list[tuple[int, float]]:
        if self.emb is None or self.emb_ids is None or not self.emb_ids.size:
            return []
        qv = hash_embed(query_text, self.dim)
        ids, mat = self.emb_ids, self.emb
        if allowed is not None:
            idx = np.searchsorted(allowed, ids)
            idx_c = np.minimum(idx, max(allowed.size - 1, 0))
            mask = (
                (idx < allowed.size) & (allowed[idx_c] == ids)
                if allowed.size else np.zeros(ids.size, dtype=bool)
            )
            ids, mat = ids[mask], mat[mask]
        if not ids.size:
            return []
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cos = (mat @ qv) / norms
        order = np.lexsort((ids, -cos))[:k]
        return [(int(ids[i]), float(cos[i])) for i in order]

    def search(self, q: str, mode: str = "hybrid", k: int = DEFAULT_K,
               category: str | None = None, date_from=None, date_to=None,
               threshold: float | None = None) -> dict:
        k = min(k, MAX_K)
        allowed = self._allowed(category, date_from, date_to)
        allowed_ids = allowed.tolist() if allowed is not None else None

        def bm25():
            return self.engine.search(
                q, k=k, min_score=threshold, mode="local",
                allowed_ids=allowed_ids,
            )

        if mode in ("keyword", "bm25"):
            hits = bm25()
        elif mode in ("vector", "knn"):
            hits = self._knn(q, k, allowed)
            if threshold is not None:
                hits = [(d, s) for d, s in hits if s >= threshold]
        elif mode == "hybrid":
            hits = hybrid_search(bm25(), self._knn(q, k, allowed), k=k)
        else:
            raise ValueError(f"unknown mode {mode!r}")

        results = []
        for doc_id, score in hits:
            m = self.meta.get(doc_id)
            if m is None:
                continue
            text = m["text"] or ""
            content = text if len(text) <= 500 else text[:497] + "..."
            pub = m["published_at"]
            results.append(
                {
                    "id": f"{m['oid']}_{m['aid']}",
                    "score": score,
                    "title": m["title"],
                    "content": content,
                    "category": m["category"],
                    "publisher": m["publisher"],
                    "url": m["url"],
                    "published_at": pub.isoformat() if pub else None,
                    "highlights": (
                        highlight(m["title"] or "", q, n_fragments=1,
                                  frag_len=100)
                        + highlight(text, q)
                    ) or None,
                }
            )
        return {"query": q, "mode": mode, "total": len(results),
                "results": results}

    def health(self) -> dict:
        return {
            "status": "ok",
            "service": "baram-spark-api",
            "version": VERSION,
            "index_connected": True,
            "document_count": len(self.meta),
        }


def make_server(ctx: ServingContext, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Build (without starting) the HTTP server; port 0 picks a free port."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, obj: dict):
            body = json.dumps(obj, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API)
            u = urlparse(self.path)
            qs = {kk: vv[0] for kk, vv in parse_qs(u.query).items()}
            try:
                if u.path == "/api/health":
                    self._send(200, ctx.health())
                elif u.path == "/api/refresh":
                    ctx.refresh()
                    self._send(200, {"refreshed": True,
                                     "document_count": len(ctx.meta)})
                elif u.path == "/api/search":
                    q = (qs.get("q") or "").strip()
                    if not q:
                        self._send(400, {
                            "error": "Query parameter 'q' cannot be empty",
                            "code": 400,
                        })
                        return
                    self._send(200, ctx.search(
                        q,
                        mode=qs.get("mode", "hybrid"),
                        k=int(qs.get("k", DEFAULT_K)),
                        category=qs.get("category"),
                        date_from=_parse_date(qs.get("date_from")),
                        date_to=_parse_date(qs.get("date_to")),
                        threshold=(float(qs["threshold"])
                                   if "threshold" in qs else None),
                    ))
                else:
                    self._send(404, {"error": "not found", "code": 404})
            except ValueError as e:
                self._send(400, {"error": str(e), "code": 400})
            except Exception as e:  # pragma: no cover - defensive 500
                self._send(500, {"error": f"Search failed: {e}", "code": 500})

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever_in_thread(server: ThreadingHTTPServer) -> threading.Thread:
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t
