"""Thin serving router — the coordinator of the multi-node topology.

``serving.py`` (module docstring) promises the reference's OpenSearch
layout: each serving node holds one shard-set resident; a thin router
fans a query out and merges. This module is that router — the
coordinating-node analog of the reference's OpenSearch client fan-out
(``/root/reference/src/embedding/mod.rs:469-535`` runs one _search that
OpenSearch internally scatter-gathers; here the scatter-gather is
explicit).

Identity contract (pinned by ``tests/test_router.py``): on an index
split with ``index.split.split_index`` (global stats copied verbatim),
the router's response is rank- AND score-identical to a single
``ServingContext`` over the unsplit index, for every mode and filter —
on the EXACT serving paths, which is every keyword query and every
vector/hybrid query while the corpus is under ``ivf_threshold``. Above
the threshold both topologies switch to approximate IVF vector serving
*together* (activation is keyed to the same global committed embedding
count — the split descriptor's ``n_embeddings``, see
``index/split.py`` / ``serving._Snapshot``), at which point surfaced
candidates still carry identical scores (same normalized dot product
against the same global stats) but the candidate SETS are approximate
and may differ between topologies, as between any two IVF builds:

* **keyword / vector**: each node returns its exact local top-k with
  globally-correct scores (global idf/avgdl ride in the copied stats
  tables); the router k-merges with the engine's canonical tie-break
  (score desc, doc_id asc — ``query/engine.py:625-628``) and dedupes by
  doc_id (replicated shards stay correct). A per-hit score threshold
  commutes with the merge, so it passes through to the nodes.
* **hybrid**: min-max fusion must normalize over the GLOBAL top-k lists,
  not per node — per-node fusion would use different min/max bounds and
  break identity. The router therefore fans out the keyword and vector
  sub-queries separately (2 requests/node, in parallel), k-merges each
  list globally, and runs the same ``hybrid_search`` the single node
  runs; ``threshold`` applies to the FINAL fused scores, exactly like
  ``ServingContext.search``.

Scale note: router work is O(k · n_nodes) per query — merge of n_nodes
top-k lists plus one fusion over ≤2k hits; no index state, no Spark, so
routers scale horizontally behind any TCP balancer.
"""

from __future__ import annotations

import json
import threading
from concurrent.futures import ThreadPoolExecutor
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.error import HTTPError, URLError
from urllib.parse import parse_qs, urlencode, urlparse
from urllib.request import Request, urlopen

from .query.bm25 import DEFAULT_K
from .query.engine import MAX_K
from .query.hybrid import hybrid_search
from .serving import VERSION

_MODES = {"keyword", "bm25", "vector", "knn", "hybrid"}


class ClientError(RuntimeError):
    """A node classified the request as a CLIENT error (4xx): the router
    must answer with the same status class, not a 502 — a malformed
    date_from is the caller's bug, not a gateway failure (and the 502
    body leaked internal node URLs)."""

    def __init__(self, code: int, detail: str):
        super().__init__(detail)
        self.code = int(code)
        self.detail = detail


class NodeError(RuntimeError):
    """A serving node failed or was unreachable (router answers 502)."""

    def __init__(self, node: str, detail: str):
        super().__init__(f"node {node}: {detail}")
        self.node = node
        self.detail = detail


class Router:
    """Transport-agnostic fan-out/merge logic (the HTTP handler below is
    a thin shell over this, so tests can drive it directly)."""

    def __init__(self, node_urls: list[str], timeout: float = 30.0):
        if not node_urls:
            raise ValueError("need at least one node url")
        self.nodes = [u.rstrip("/") for u in node_urls]
        self.timeout = timeout
        self._pool = ThreadPoolExecutor(
            max_workers=max(8, 2 * len(self.nodes)),
            thread_name_prefix="router-fan",
        )

    # -- transport ---------------------------------------------------------
    def _call(self, node: str, path: str, method: str = "GET") -> dict:
        url = f"{node}{path}"
        try:
            req = Request(url, method=method)
            with urlopen(req, timeout=self.timeout) as r:
                return json.loads(r.read().decode("utf-8"))
        except HTTPError as e:
            # a node's 4xx/5xx is a protocol answer, not transport failure
            try:
                body = json.loads(e.read().decode("utf-8"))
            except Exception:
                body = {"error": str(e)}
            detail = (body.get("error", str(e))
                      if isinstance(body, dict) else str(body))
            if 400 <= e.code < 500:
                # client-class answer: surface verbatim WITHOUT the node
                # url (no internal topology in client-facing errors)
                raise ClientError(e.code, detail) from e
            raise NodeError(node, detail) from e
        except (URLError, OSError, ValueError) as e:
            raise NodeError(node, str(e)) from e

    def _fan(self, calls: list[tuple[str, str, str]]) -> list[dict]:
        """Run (node, path, method) calls in parallel; raise the first
        NodeError (a partial answer would silently drop shards)."""
        futs = [self._pool.submit(self._call, n, p, m) for n, p, m in calls]
        return [f.result() for f in futs]

    # -- merge primitives ----------------------------------------------------
    @staticmethod
    def _merge_results(bodies: list[dict], k: int) -> list[dict]:
        """Global top-k of per-node result lists: canonical tie-break
        (score desc, doc_id asc), dedupe by doc_id (first = best)."""
        items: list[dict] = []
        for b in bodies:
            items.extend(b.get("results") or [])
        items.sort(key=lambda r: (-r["score"], r["doc_id"]))
        seen: set[int] = set()
        out: list[dict] = []
        for r in items:
            d = r["doc_id"]
            if d in seen:
                continue
            seen.add(d)
            out.append(r)
            if len(out) == k:
                break
        return out

    # -- endpoints -----------------------------------------------------------
    def search(self, qs: dict[str, str]) -> dict:
        q = (qs.get("q") or "").strip()
        if not q:
            raise ValueError("Query parameter 'q' cannot be empty")
        mode = qs.get("mode", "hybrid")
        if mode not in _MODES:
            raise ValueError(f"unknown mode {mode!r}")
        k = int(qs.get("k", DEFAULT_K))
        if k <= 0:
            return {"query": q, "mode": mode, "total": 0, "results": []}
        k = min(k, MAX_K)

        passthrough = {
            key: qs[key]
            for key in ("category", "publisher", "date_from", "date_to")
            if key in qs
        }

        if mode != "hybrid":
            sub = dict(passthrough, q=q, mode=mode, k=str(k))
            if "threshold" in qs:  # per-hit filter — commutes with merge
                sub["threshold"] = qs["threshold"]
            path = f"/api/search?{urlencode(sub)}"
            bodies = self._fan([(n, path, "GET") for n in self.nodes])
            results = self._merge_results(bodies, k)
            return {"query": q, "mode": mode, "total": len(results),
                    "results": results}

        # hybrid: fuse at the router over the GLOBAL top-k sub-lists
        kw_path = "/api/search?" + urlencode(
            dict(passthrough, q=q, mode="keyword", k=str(k)))
        vec_path = "/api/search?" + urlencode(
            dict(passthrough, q=q, mode="vector", k=str(k)))
        bodies = self._fan(
            [(n, kw_path, "GET") for n in self.nodes]
            + [(n, vec_path, "GET") for n in self.nodes]
        )
        n = len(self.nodes)
        kw = self._merge_results(bodies[:n], k)
        vec = self._merge_results(bodies[n:], k)
        bw = qs.get("bm25_weight")
        bw = 0.3 if bw is None else max(0.0, min(float(bw), 1.0))
        fused = hybrid_search(
            [(r["doc_id"], r["score"]) for r in kw],
            [(r["doc_id"], r["score"]) for r in vec],
            k=k, bm25_weight=bw, knn_weight=1.0 - bw,
        )
        if "threshold" in qs:  # final fused scores, like the single node
            t = float(qs["threshold"])
            fused = [(d, s) for d, s in fused if s >= t]
        meta = {r["doc_id"]: r for r in kw}
        for r in vec:
            meta.setdefault(r["doc_id"], r)
        results = [dict(meta[d], score=s) for d, s in fused]
        return {"query": q, "mode": "hybrid", "total": len(results),
                "results": results}

    def health(self) -> dict:
        # concurrent probes: two unreachable nodes must cost ONE timeout,
        # not two serial ones — a load balancer's probe budget is seconds
        futs = [self._pool.submit(self._call, n, "/api/health")
                for n in self.nodes]
        bodies = []
        errors = []
        for fut in futs:
            try:
                bodies.append(fut.result())
            except (NodeError, ClientError) as e:
                errors.append(str(e))
        ok = not errors and all(b.get("status") == "ok" for b in bodies)
        return {
            "status": "ok" if ok else "degraded",
            "service": "baram-spark-router",
            "version": VERSION,
            "nodes": len(self.nodes),
            "nodes_ok": len(bodies),
            "document_count": sum(
                int(b.get("document_count", 0)) for b in bodies),
            "errors": errors or None,
        }

    def refresh(self) -> dict:
        bodies = self._fan(
            [(n, "/api/refresh", "POST") for n in self.nodes])
        return {
            "refreshed": all(b.get("refreshed") for b in bodies),
            "document_count": sum(
                int(b.get("document_count", 0)) for b in bodies),
        }

    def _node_events(self, node: str, category: str | None) -> dict:
        """ALL of one node's (category-filtered) clusters, walking the
        node's offset pagination (page cap 200) until its reported total
        is reached — a node holding >200 clusters must not be silently
        truncated to its first page."""
        events: list[dict] = []
        message = None
        while True:
            sub = {"limit": "200", "offset": str(len(events))}
            if category is not None:
                sub["category"] = category
            b = self._call(node, f"/api/events?{urlencode(sub)}")
            page = b.get("events") or []
            events.extend(page)
            message = message or b.get("message")
            if not page or len(events) >= int(b.get("total", 0)):
                return {"events": events, "message": message}

    def list_events(self, category: str | None = None, offset: int = 0,
                    limit: int = 20) -> dict:
        """Merged event clusters: full union across nodes (each node's
        pagination walked to its total), dedupe by event_id, the nodes'
        canonical sort, then paginate at the router."""
        futs = [self._pool.submit(self._node_events, n, category)
                for n in self.nodes]
        bodies = [f.result() for f in futs]
        by_id: dict[str, dict] = {}
        for b in bodies:
            for e in b["events"]:
                by_id.setdefault(e.get("event_id", ""), e)
        evs = sorted(
            by_id.values(),
            key=lambda e: (-int(e.get("article_count", 0)),
                           e.get("event_id", "")),
        )
        if not evs:
            return {"total": 0, "events": [],
                    "message": bodies[0]["message"]
                    or "No clusters found."}
        total = len(evs)
        limit = max(0, min(limit, 200))
        offset = max(0, min(offset, total))
        return {"total": total, "offset": offset, "limit": limit,
                "events": evs[offset:offset + limit]}

    def get_event(self, event_id: str) -> dict | None:
        from urllib.parse import quote

        path = f"/api/events/{quote(event_id)}"
        futs = [(n, self._pool.submit(self._call, n, path))
                for n in self.nodes]
        found, first_err = None, None
        for _node, fut in futs:
            try:
                b = fut.result()
                if found is None:
                    found = b
            except ClientError as e:
                if e.code != 404:
                    first_err = first_err or e
            except NodeError as e:
                first_err = first_err or e
        if found is not None:
            return found
        if first_err is not None:
            raise first_err
        return None


def make_router_server(router: Router, host: str = "127.0.0.1",
                       port: int = 0) -> ThreadingHTTPServer:
    """HTTP shell over :class:`Router` — same endpoint surface as a
    serving node, so clients cannot tell a router from a node."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, obj: dict):
            body = json.dumps(obj, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type",
                             "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):  # noqa: N802 (stdlib API)
            u = urlparse(self.path)
            try:
                if u.path == "/api/refresh":
                    self._send(200, router.refresh())
                else:
                    self._send(404, {"error": "not found", "code": 404})
            except ClientError as e:
                self._send(e.code, {"error": e.detail, "code": e.code})
            except NodeError as e:
                self._send(502, {"error": str(e), "code": 502})
            except Exception as e:  # pragma: no cover - defensive 500
                # without this, a non-NodeError abort drops the
                # connection with no JSON body at all
                self._send(500, {"error": f"Refresh failed: {e}",
                                 "code": 500})

        def do_GET(self):  # noqa: N802 (stdlib API)
            u = urlparse(self.path)
            qs = {kk: vv[0] for kk, vv in parse_qs(u.query).items()}
            try:
                if u.path == "/api/health":
                    self._send(200, router.health())
                elif u.path == "/api/refresh":
                    self._send(200, router.refresh())
                elif u.path == "/api/events":
                    self._send(200, router.list_events(
                        category=qs.get("category"),
                        offset=int(qs.get("offset", 0)),
                        limit=int(qs.get("limit", 20)),
                    ))
                elif u.path.startswith("/api/events/"):
                    from urllib.parse import unquote

                    eid = unquote(u.path.rsplit("/", 1)[1])
                    ev = router.get_event(eid)
                    if ev is None:
                        self._send(404, {
                            "error": f"Event '{eid}' not found",
                            "code": 404,
                        })
                    else:
                        self._send(200, ev)
                elif u.path == "/api/search":
                    self._send(200, router.search(qs))
                elif u.path == "/":
                    self._send(200, {
                        "service": "baram-spark router",
                        "version": VERSION,
                        "nodes": router.nodes,
                        "endpoints": {
                            "health": "GET /api/health",
                            "search": ("GET /api/search?q=<query>"
                                       "&mode=hybrid|keyword|vector&k=10"),
                            "events": "GET /api/events",
                            "event_detail": "GET /api/events/:event_id",
                            "refresh": "POST /api/refresh",
                        },
                    })
                else:
                    self._send(404, {"error": "not found", "code": 404})
            except ValueError as e:
                self._send(400, {"error": str(e), "code": 400})
            except ClientError as e:
                self._send(e.code, {"error": e.detail, "code": e.code})
            except NodeError as e:
                self._send(502, {"error": str(e), "code": 502})
            except Exception as e:  # pragma: no cover - defensive 500
                self._send(500, {"error": f"Search failed: {e}",
                                 "code": 500})

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever_in_thread(server: ThreadingHTTPServer) -> threading.Thread:
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t
