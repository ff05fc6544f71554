"""Multimodal plumbing: schema, sentinel failure semantics (ort_runtime.rs:956-960),
metadata sniffing, frame sampling stub."""

import pytest

from lantern_extras_spark.multimodal import (
    decode_image_features,
    fake_image_feature,
    frame_sample,
    with_media_metadata,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, bytearray(b"\xff\xd8\xff\xe0" + b"jpegdata" * 10), "image"),
        (2, None, "image"),                      # null payload -> sentinel
        (3, bytearray(b""), "image"),            # empty payload -> sentinel
        (4, bytearray(b"\x89PNG\r\n" + b"x" * 50), "image"),
        (5, bytearray(b"plain bytes, unknown format"), "blob"),
    ]
    return spark.createDataFrame(rows, "media_id long, media binary, media_type string")


def test_decode_sentinel_semantics(media):
    out = {r["media_id"]: r["feature"] for r in decode_image_features(media, dim=8).collect()}
    assert out[2] == [-1.0] * 8 and out[3] == [-1.0] * 8  # sentinel, NOT null
    assert out[1] != [-1.0] * 8 and len(out[1]) == 8
    # deterministic (feature column is float32; compare with tolerance)
    expect = fake_image_feature(bytes(b"\xff\xd8\xff\xe0" + b"jpegdata" * 10), 8)
    assert out[1] == pytest.approx(expect, abs=1e-6)


def test_oversized_payload_sentinel(spark):
    big = spark.createDataFrame(
        [(1, bytearray(b"x" * 1000), "image")], "media_id long, media binary, media_type string"
    )
    out = decode_image_features(big, dim=4, max_bytes=100).first()
    assert out["feature"] == [-1.0] * 4  # reference 20MB-cap behavior, scaled down


def test_metadata_sniffing(media):
    got = {r["media_id"]: (r["media_format"], r["media_bytes"]) for r in with_media_metadata(media).collect()}
    assert got[1][0] == "jpeg"
    assert got[4][0] == "png"
    assert got[5][0] == "unknown"
    assert got[2] == (None, None) or got[2][1] is None


def test_pil_decoder_is_clearly_stubbed(media):
    with pytest.raises((NotImplementedError, Exception)):
        decode_image_features(media, decoder="pil").collect()


def test_frame_sample(media):
    out = {r["media_id"]: r["frames"] for r in frame_sample(media, n_frames=3).collect()}
    assert out[2] is None and out[3] is None
    assert len(out[1]) == 3


# ---------------------------------------------------------------------------
# Image-fetch scaffolding (U6 fetch caps) against an injected transport
# ---------------------------------------------------------------------------

# module-level fake transport state: picklable, ships to executors
_FAKE_SITE = {
    "http://ok/a": (200, b"\xff\xd8\xff\xe0" + b"img" * 20, None),
    "http://redir/1": (302, None, "http://redir/2"),
    "http://redir/2": (302, None, "http://ok/a"),
    "http://redir/loop1": (302, None, "http://redir/loop2"),
    "http://redir/loop2": (302, None, "http://redir/loop3"),
    "http://redir/loop3": (302, None, "http://ok/a"),
    "http://big/payload": (200, b"x" * 2048, None),
    "http://err/500": (500, None, None),
    "http://err/empty": (200, b"", None),
}


def fake_transport(url, timeout_s):
    if url == "http://slow/never":
        raise TimeoutError
    if url not in _FAKE_SITE:
        return (404, None, None)
    return _FAKE_SITE[url]


def test_fetch_bytes_caps():
    from lantern_extras_spark.multimodal.media import fetch_bytes

    data, err = fetch_bytes("http://ok/a", fake_transport)
    assert err is None and data.startswith(b"\xff\xd8")
    # 2 redirects allowed...
    data, err = fetch_bytes("http://redir/1", fake_transport)
    assert err is None and data is not None
    # ...3 is one too many (reference cap)
    data, err = fetch_bytes("http://redir/loop1", fake_transport)
    assert data is None and "redirect" in err
    # payload cap
    data, err = fetch_bytes("http://big/payload", fake_transport, max_bytes=1024)
    assert data is None and "cap" in err
    # timeout and status errors
    assert fetch_bytes("http://slow/never", fake_transport)[1].startswith("timeout")
    assert fetch_bytes("http://err/500", fake_transport)[1] == "http 500"
    assert fetch_bytes("http://err/empty", fake_transport)[1] == "empty body"
    assert fetch_bytes("http://gone/404", fake_transport)[1] == "http 404"


def test_fetch_bytes_requires_transport():
    from lantern_extras_spark.multimodal.media import fetch_bytes

    with pytest.raises(NotImplementedError):
        fetch_bytes("http://anything", None)


def test_fetch_media_pipeline_sentinel_composition(spark):
    """fetch_media + decode_image_features end to end: failures become null
    payloads with error strings, then the [-1]*dim sentinel — row alignment
    preserved (reference ort_runtime.rs:925-997 semantics)."""
    from lantern_extras_spark.multimodal.media import fetch_media

    # nested def: cloudpickle ships it by value (a test-module-level function
    # pickles by reference and executors can't import test modules)
    site = dict(_FAKE_SITE)

    def transport(url, timeout_s):
        if url == "http://slow/never":
            raise TimeoutError
        return site.get(url, (404, None, None))

    rows = [
        (1, "http://ok/a"),
        (2, "http://redir/1"),
        (3, "http://redir/loop1"),
        (4, "http://slow/never"),
        (5, None),
        (6, "http://big/payload"),
    ]
    df = spark.createDataFrame(rows, "media_id long, url string")
    fetched = fetch_media(df, transport=transport, max_bytes=1024)
    out = decode_image_features(fetched, dim=4)
    got = {r["media_id"]: (r["media"] is not None, r["fetch_error"], r["feature"]) for r in out.collect()}
    assert got[1][0] and got[1][1] is None and got[1][2] != [-1.0] * 4
    assert got[2][0]  # redirect chain within cap succeeds
    for mid, expect_err in [(3, "redirect"), (4, "timeout"), (5, "null url"), (6, "cap")]:
        ok, err, feat = got[mid]
        assert not ok and expect_err in err and feat == [-1.0] * 4
    # identical payloads produce identical features (fetch is deterministic)
    assert got[1][2] == got[2][2]


def test_urllib_transport_against_local_server():
    """Drive the real stdlib transport against a loopback HTTP server:
    redirects surfaced (not followed) so fetch_bytes enforces the 2-hop cap,
    status and payload-cap behavior end to end."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from lantern_extras_spark.multimodal.media import fetch_bytes, urllib_transport

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/ok":
                body = b"\xff\xd8payload"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.startswith("/redir"):
                n = int(self.path[len("/redir"):])
                target = "/ok" if n <= 1 else f"/redir{n - 1}"
                self.send_response(302)
                self.send_header("Location", f"http://127.0.0.1:{self.server.server_port}{target}")
                self.end_headers()
            elif self.path == "/big":
                body = b"x" * 4096
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        data, err = fetch_bytes(f"{base}/ok", urllib_transport)
        assert err is None and data == b"\xff\xd8payload"
        # 2 hops allowed, 3 rejected by the fetcher (transport surfaces each 302)
        data, err = fetch_bytes(f"{base}/redir2", urllib_transport)
        assert err is None and data is not None
        data, err = fetch_bytes(f"{base}/redir3", urllib_transport)
        assert data is None and "redirect" in err
        data, err = fetch_bytes(f"{base}/big", urllib_transport, max_bytes=1024)
        assert data is None and "cap" in err
        assert fetch_bytes(f"{base}/gone", urllib_transport)[1] == "http 404"
    finally:
        srv.shutdown()


def test_urllib_transport_rejects_non_http_schemes():
    """A hostile URL column (file://, ftp://, data:) must not reach the
    default opener — local-file disclosure via the dataset. The fetcher maps
    the transport's ValueError to a per-row error."""
    from lantern_extras_spark.multimodal.media import fetch_bytes, urllib_transport

    for url in ("file:///etc/hosts", "ftp://example.com/x", "data:text/plain,hi"):
        data, err = fetch_bytes(url, urllib_transport)
        assert data is None and "unsupported URL scheme" in err


def test_fetch_bytes_plumbs_max_bytes_to_three_arg_transport():
    """A transport accepting (url, timeout_s, max_bytes) receives the CALLER's
    cap, so raising max_bytes above the module default cannot silently
    truncate the payload behind a passing size check."""
    from lantern_extras_spark.multimodal.media import FETCH_MAX_BYTES, fetch_bytes

    seen = {}

    def transport(url, timeout_s, max_bytes):
        seen["max_bytes"] = max_bytes
        return 200, b"x" * 10, None

    big_cap = FETCH_MAX_BYTES * 2
    data, err = fetch_bytes("http://ok/x", transport, max_bytes=big_cap)
    assert err is None and data == b"x" * 10
    assert seen["max_bytes"] == big_cap
