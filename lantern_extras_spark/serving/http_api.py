"""HTTP serving transport for collections — the reference's `start-server`
mode (lantern_cli/src/http_server/mod.rs:148-171) re-expressed over
CollectionStore with the Python stdlib (no actix/no framework):

- routes mirror the reference exactly (collection.rs / search.rs / index.rs /
  pq.rs route decorators):
    GET    /collections                      list
    POST   /collections                      create {name, schema?}
    GET    /collections/{name}               info
    PUT    /collections/{name}               insert {rows: [...]}
    DELETE /collections/{name}               drop
    POST   /collections/{name}/search        vector/text search
    POST   /collections/{name}/index         create index
    DELETE /index/{index_name}               drop index
    POST   /collections/{name}/pq            quantize collection column
- optional HTTP Basic auth (mod.rs:62-75: when credentials are configured,
  every request must carry them; 401 otherwise);
- request payloads capped at 1 GB (mod.rs:154-157 JsonConfig limit);
- metric names accept the reference's spelling (`cosine`) and map onto the
  engine's (`cos`).

Spark-side: each request runs the SAME library calls a notebook would
(CollectionStore / create_external_index / PQ build+quantize) — the server is
a transport, not an engine; one SparkSession serves all requests (Spark
sessions are thread-safe for job submission; concurrent requests become
concurrent Spark jobs scheduled by the driver).
"""

from __future__ import annotations

import base64
import hmac
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from lantern_extras_spark.collections import CollectionStore

MAX_PAYLOAD_BYTES = 1024 * 1024 * 1024  # reference: 1 GB JSON cap

_METRIC_ALIASES = {"cosine": "cos", "cos": "cos", "l2sq": "l2sq", "hamming": "hamming"}


def _map_metric(name: str | None, default: str = "l2sq") -> str:
    if name is None:
        return default
    m = _METRIC_ALIASES.get(name)
    if m is None:
        raise ValueError(f"unknown metric {name!r} (cosine/l2sq/hamming)")
    return m


class _ApiHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "lantern-extras-spark"

    # -- plumbing ----------------------------------------------------------

    def log_message(self, fmt, *args):  # quiet by default; server keeps a log
        self.server.access_log.append(fmt % args)

    def _reply(self, status: int, payload=None) -> None:
        body = json.dumps(payload if payload is not None else {}).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _authorized(self) -> bool:
        creds = self.server.auth
        if creds is None:
            return True
        header = self.headers.get("Authorization", "")
        if not header.startswith("Basic "):
            return False
        try:
            got = base64.b64decode(header[6:]).decode()
        except Exception:  # noqa: BLE001 — malformed header is just unauthorized
            return False
        # constant-time compare: a == check leaks a prefix-length timing
        # side channel an attacker can use to recover credentials byte-wise
        return hmac.compare_digest(
            got.encode(), f"{creds[0]}:{creds[1]}".encode()
        )

    def _body(self) -> dict:
        length = int(self.headers.get("Content-Length") or 0)
        if length > MAX_PAYLOAD_BYTES:
            raise _HttpError(413, f"payload {length} bytes > 1 GB cap")
        if length == 0:
            return {}
        data = self.rfile.read(length)
        try:
            parsed = json.loads(data)
        except json.JSONDecodeError as e:
            raise _HttpError(400, f"invalid JSON body: {e}") from e
        if not isinstance(parsed, dict):
            raise _HttpError(400, "JSON body must be an object")
        return parsed

    def _dispatch(self, method: str) -> None:
        if not self._authorized():
            # drain any request body before replying: an unread body left on
            # the socket desyncs HTTP/1.1 keep-alive (the next request would
            # be parsed starting mid-body)
            try:
                length = int(self.headers.get("Content-Length") or 0)
            except ValueError:
                length = 0
            if length > 0:
                if length > MAX_PAYLOAD_BYTES:
                    self.close_connection = True
                else:
                    remaining = length
                    while remaining > 0:
                        chunk = self.rfile.read(min(remaining, 1 << 20))
                        if not chunk:
                            break
                        remaining -= len(chunk)
            self._reply(401, {"error": "Unauthorized"})
            return
        try:
            handled = self._route(method)
        except _HttpError as e:
            self._reply(e.status, {"error": e.message})
            return
        except ValueError as e:
            self._reply(400, {"error": str(e)})
            return
        except Exception as e:  # noqa: BLE001 — transport boundary
            self._reply(500, {"error": f"{type(e).__name__}: {e}"})
            return
        if not handled:
            self._reply(404, {"error": f"no route for {method} {self.path}"})

    def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler contract
        self._dispatch("GET")

    def do_POST(self):  # noqa: N802
        self._dispatch("POST")

    def do_PUT(self):  # noqa: N802
        self._dispatch("PUT")

    def do_DELETE(self):  # noqa: N802
        self._dispatch("DELETE")

    # -- routes ------------------------------------------------------------

    def _route(self, method: str) -> bool:
        store: CollectionStore = self.server.store
        path = self.path.split("?", 1)[0].rstrip("/") or "/"

        # API documentation (reference mod.rs:158-161: utoipa swagger at
        # /swagger-ui/ + /api-docs/openapi.json, behind the same auth wrap)
        if path == "/api-docs/openapi.json" and method == "GET":
            self._reply(200, _openapi_spec())
            return True
        if path in ("/swagger-ui", "/swagger-ui/index.html") and method == "GET":
            body = _swagger_html().encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return True

        if path == "/collections":
            if method == "GET":
                self._reply(200, [store.get_collection(n) for n in store.list_collections()])
                return True
            if method == "POST":
                body = self._body()
                name = body.get("name")
                if not name:
                    raise _HttpError(400, "missing collection name")
                schema = body.get("schema")
                if isinstance(schema, dict):
                    # the reference takes {"col": "SQL TYPE"} maps; map the
                    # common SQL spellings onto Spark DDL
                    schema = ", ".join(
                        f"{c} {_sql_type_to_spark(t)}" for c, t in schema.items()
                    )
                store.create_collection(name, schema)
                self._reply(200, store.get_collection(name))
                return True
            return False

        m = re.fullmatch(r"/collections/([^/]+)", path)
        if m:
            name = m.group(1)
            if method == "GET":
                self._reply(200, store.get_collection(name))
                return True
            if method == "DELETE":
                store.delete_collection(name)
                self._reply(200, {})
                return True
            if method == "PUT":
                rows = self._body().get("rows") or []
                n = store.insert(name, rows) if rows else 0
                self._reply(200, {"inserted": n})
                return True
            return False

        m = re.fullmatch(r"/collections/([^/]+)/search", path)
        if m and method == "POST":
            body = self._body()
            k = int(body.get("k") or 10)
            res = store.search(
                m.group(1),
                query_vec=body.get("query_vector"),
                query_text=body.get("query_text"),
                query_model=body.get("query_model") or "hash/test-model",
                k=k,
                metric=_map_metric(body.get("metric")),
                vec_col=body.get("column") or "vector",
                ef=body.get("ef"),
            )
            select = body.get("select")
            if select:
                cols = [c.strip() for c in select.split(",")]
                res = res.select(*cols)
            self._reply(200, {"rows": [r.asDict(recursive=True) for r in res.collect()]})
            return True

        m = re.fullmatch(r"/collections/([^/]+)/index", path)
        if m and method == "POST":
            body = self._body()
            path_built = store.create_index(
                m.group(1),
                column=body.get("column") or "vector",
                metric=_map_metric(body.get("metric")),
                ef=int(body.get("ef") or 64),
                ef_construction=int(body.get("ef_construction") or 128),
                m=int(body.get("m") or 16),
                pq=bool(body.get("pq") or False),
                index_name=body.get("name"),
            )
            self._reply(200, {"index": path_built})
            return True

        m = re.fullmatch(r"/index/([^/]+)", path)
        if m and method == "DELETE":
            import os
            import shutil

            idx = m.group(1)
            for coll in store.list_collections():
                p = os.path.join(store._path(coll), f"_index_{idx}")
                if os.path.isdir(p):
                    shutil.rmtree(p)
                    self._reply(200, {})
                    return True
            raise _HttpError(400, f"no such index {idx!r}")

        m = re.fullmatch(r"/collections/([^/]+)/pq", path)
        if m and method == "POST":
            body = self._body()
            if "splits" not in body:
                raise _HttpError(400, "missing required field: splits")
            out = quantize_collection(
                store, m.group(1),
                column=body.get("column") or "vector",
                splits=int(body["splits"]),
                clusters=int(body.get("clusters") or 256),
                limit=body.get("limit"),
            )
            self._reply(200, out)
            return True

        return False


def _openapi_spec() -> dict:
    """OpenAPI 3.0 document for the collections API — the reference exposes
    the same via utoipa (`#[openapi(...)]`, http_server/mod.rs:78) at
    /api-docs/openapi.json; every route this server implements is listed with
    its request/response shapes, so standard tooling (swagger-ui, codegen,
    contract tests) works against this engine unchanged."""
    coll = {"type": "object", "properties": {
        "name": {"type": "string"},
        "schema": {"type": "object", "additionalProperties": {"type": "string"}},
        "rows": {"type": "integer"},
    }}
    err = {"type": "object", "properties": {"error": {"type": "string"}}}

    def op(summary, req=None, resp=None, params=None):
        o = {"summary": summary, "responses": {
            "200": {"description": "OK", "content": {"application/json": {
                "schema": resp or {"type": "object"}}}},
            "400": {"description": "Bad request", "content": {"application/json": {
                "schema": err}}},
        }}
        if req is not None:
            o["requestBody"] = {"required": True, "content": {
                "application/json": {"schema": req}}}
        if params:
            o["parameters"] = params
        return o

    name_param = [{"name": "name", "in": "path", "required": True,
                   "schema": {"type": "string", "pattern": "^[A-Za-z0-9_.-]+$"}}]
    vec = {"type": "array", "items": {"type": "number", "format": "float"}}
    return {
        "openapi": "3.0.3",
        "info": {"title": "lantern-extras-spark collections API",
                 "description": "Spark-backed re-expression of the reference's "
                                "start-server HTTP surface (collection CRUD, "
                                "vector/text search, index build, PQ).",
                 "version": "1.0.0"},
        "components": {"securitySchemes": {"basic": {"type": "http", "scheme": "basic"}},
                       "schemas": {"Collection": coll, "Error": err}},
        "security": [{"basic": []}],
        "paths": {
            "/collections": {
                "get": op("List collections",
                          resp={"type": "array", "items": coll}),
                "post": op("Create a collection",
                           req={"type": "object", "required": ["name"],
                                "properties": {"name": {"type": "string"},
                                               "schema": {"type": "object",
                                                          "additionalProperties": {"type": "string"}}}},
                           resp=coll),
            },
            "/collections/{name}": {
                "get": op("Collection info", resp=coll, params=name_param),
                "put": op("Insert rows",
                          req={"type": "object", "properties": {
                              "rows": {"type": "array", "items": {"type": "object"}}}},
                          resp={"type": "object", "properties": {
                              "inserted": {"type": "integer"}}},
                          params=name_param),
                "delete": op("Drop collection", params=name_param),
            },
            "/collections/{name}/search": {
                "post": op("Vector / text top-k search",
                           req={"type": "object", "properties": {
                               "query_vector": vec,
                               "query_text": {"type": "string"},
                               "query_model": {"type": "string"},
                               "k": {"type": "integer", "default": 10},
                               "metric": {"type": "string",
                                          "enum": ["cosine", "l2sq", "hamming"]},
                               "column": {"type": "string", "default": "vector"},
                               "ef": {"type": "integer"},
                               "select": {"type": "string"}}},
                           resp={"type": "object", "properties": {
                               "rows": {"type": "array", "items": {"type": "object"}}}},
                           params=name_param),
            },
            "/collections/{name}/index": {
                "post": op("Create vector index",
                           req={"type": "object", "properties": {
                               "column": {"type": "string", "default": "vector"},
                               "metric": {"type": "string",
                                          "enum": ["cosine", "l2sq", "hamming"]},
                               "ef": {"type": "integer", "default": 64},
                               "ef_construction": {"type": "integer", "default": 128},
                               "m": {"type": "integer", "default": 16},
                               "pq": {"type": "boolean", "default": False},
                               "name": {"type": "string"}}},
                           resp={"type": "object", "properties": {
                               "index": {"type": "string"}}},
                           params=name_param),
            },
            "/index/{index_name}": {
                "delete": op("Drop index", params=[
                    {"name": "index_name", "in": "path", "required": True,
                     "schema": {"type": "string"}}]),
            },
            "/collections/{name}/pq": {
                "post": op("Product-quantize a collection column",
                           req={"type": "object", "required": ["splits"],
                                "properties": {
                                    "column": {"type": "string", "default": "vector"},
                                    "splits": {"type": "integer"},
                                    "clusters": {"type": "integer", "default": 256},
                                    "limit": {"type": "integer"}}},
                           params=name_param),
            },
        },
    }


def _swagger_html() -> str:
    """Self-contained docs page (no CDN/network dependency — the sandbox and
    air-gapped deployments alike can read it): renders the OpenAPI spec's
    routes inline from /api-docs/openapi.json."""
    return """<!doctype html><html><head><meta charset="utf-8">
<title>lantern-extras-spark API</title>
<style>body{font-family:sans-serif;margin:2em;max-width:60em}
code{background:#f0f0f0;padding:1px 4px;border-radius:3px}
.m{display:inline-block;width:4.5em;font-weight:bold}</style></head><body>
<h1>lantern-extras-spark collections API</h1>
<p>Spec: <a href="/api-docs/openapi.json">/api-docs/openapi.json</a> (OpenAPI 3.0
&mdash; point any swagger-ui / codegen tool at it).</p>
<div id="routes">loading&hellip;</div>
<script>
fetch('/api-docs/openapi.json').then(r=>r.json()).then(s=>{
  const el=document.getElementById('routes'); el.innerHTML='';
  for (const [p,ops] of Object.entries(s.paths))
    for (const [m,o] of Object.entries(ops)) {
      const d=document.createElement('div');
      d.innerHTML='<span class="m">'+m.toUpperCase()+'</span> <code>'+p+
                  '</code> &mdash; '+o.summary;
      el.appendChild(d);
    }
}).catch(e=>{document.getElementById('routes').textContent='spec fetch failed: '+e});
</script></body></html>"""


class _HttpError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


def _sql_type_to_spark(t: str) -> str:
    """The reference's create-collection schema values are SQL type strings
    (`REAL[]`, `TEXT`, `bigint ...`); map the ones its docs/examples use."""
    s = t.strip().lower()
    if s.endswith("[]"):
        inner = _sql_type_to_spark(s[:-2])
        return f"array<{inner}>"
    if s.startswith(("bigint", "serial", "int8")):
        return "bigint"
    if s.startswith(("int", "serial4")):
        return "int"
    if s in ("real", "float4"):
        return "float"
    if s in ("double precision", "float8", "double"):
        return "double"
    if s in ("text", "varchar", "jsonb", "json") or s.startswith("varchar"):
        return "string"
    if s in ("bool", "boolean"):
        return "boolean"
    if s == "bytea":
        return "binary"
    return s  # already Spark DDL


def quantize_collection(
    store: CollectionStore,
    name: str,
    column: str = "vector",
    splits: int = 8,
    clusters: int = 256,
    limit: int | None = None,
) -> dict:
    """`POST /collections/{name}/pq` (http_server/pq.rs:47-118): build a PQ
    codebook over the collection column (optionally on a `limit`-row subset)
    and materialize the quantized codes as `<column>_pq` alongside the data.
    The codebook artifact lands under the collection dir as `_pq_<column>`
    (underscore-prefixed, ignored by parquet scans of the collection)."""
    import os
    import shutil

    from lantern_extras_spark.operators import pq as PQ

    df = store.read(name)
    cb = PQ.build_codebook(
        df, vec_col=column, splits=splits, k=clusters,
        max_train_rows=limit or 100_000,
    )
    coded = PQ.quantize(df, cb, vec_col=column, out_col=f"{column}_pq")
    p = store._path(name)
    PQ.save_codebook(cb, os.path.join(p, f"_pq_{column}"))
    # parquet can't overwrite its own input: stage once, then swap data files
    tmp = p + "__pq_stage"
    coded.write.mode("overwrite").parquet(tmp)
    for sub in os.listdir(p):
        full = os.path.join(p, sub)
        if not sub.startswith(("_pq_", "_index_")):
            (shutil.rmtree if os.path.isdir(full) else os.remove)(full)
    for sub in os.listdir(tmp):
        os.rename(os.path.join(tmp, sub), os.path.join(p, sub))
    os.rmdir(tmp)
    return {"collection": name, "column": column, "codes_column": f"{column}_pq",
            "splits": splits, "clusters": clusters}


class CollectionServer(ThreadingHTTPServer):
    """`with CollectionServer(spark, root) as s: requests to 127.0.0.1:s.port`.

    `auth=(user, password)` enables HTTP Basic auth for every route
    (reference mod.rs:131-141: credentials configured → enforced globally)."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, spark, root: str, host: str = "127.0.0.1", port: int = 0,
                 auth: tuple[str, str] | None = None):
        super().__init__((host, port), _ApiHandler)
        self.store = CollectionStore(spark, root)
        self.auth = auth
        self.port = self.server_address[1]
        self.access_log: list[str] = []
        self._thread: threading.Thread | None = None

    def start(self) -> "CollectionServer":
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
        self.server_close()

    def __enter__(self) -> "CollectionServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
