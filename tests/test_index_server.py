"""N2 index-server protocol loopback tests (INIT/END/ERR, PQ codebook path,
F16/I8/F64 element kinds), S5 get_vectors over a fake transport, and the H6
create_index → search(use_index) → reindex round-trip — the untested surfaces
called out by the round-4 review."""

import gzip
import io
import socket
import struct
import tarfile

import numpy as np
import pytest

from lantern_extras_spark.serving.index_server import (
    END_MSG,
    ERR_MSG,
    INIT_MSG,
    IndexServer,
    build_index_via_server,
    stream_index_build,
)

DIM = 3
VECS = [(i, [float(i), float(i % 3), 0.25 * i]) for i in range(20)]


@pytest.fixture(scope="module")
def server():
    with IndexServer() as s:
        yield s


def _raw_handshake(port: int) -> socket.socket:
    sock = socket.create_connection(("127.0.0.1", port), timeout=10)
    version, stype = struct.unpack("<II", sock.recv(8))
    assert (version, stype) == (1, 1)
    return sock


def _send_init(sock: socket.socket, *, pq=0, metric=3, quant=0, dim=DIM, m=8,
               efc=16, ef=16, n_cent=0, n_sub=0, cap=0, bits=32) -> None:
    sock.sendall(struct.pack(
        "<12I", INIT_MSG, pq, metric, quant, dim, m, efc, ef, n_cent, n_sub,
        cap, bits,
    ))


def _recv_u32(sock: socket.socket) -> int:
    return struct.unpack("<I", sock.recv(4))[0]


# -- happy paths ------------------------------------------------------------

def test_f32_roundtrip(server):
    count, idx = stream_index_build("127.0.0.1", server.port, VECS, dim=DIM)
    assert count == len(VECS)
    hits = idx.search(np.asarray(VECS[5][1], np.float32), k=1)
    assert hits[0][0] == 5 and hits[0][1] == pytest.approx(0.0)


@pytest.mark.parametrize("bits,tol", [(64, 0.0), (16, 1e-2), (8, 0.0)])
def test_nonstandard_element_bits(server, bits, tol):
    """F64/F16/I8 wire elements dequantize to f32 at ingest (stretch item:
    reference server.rs:93-99 scalar kinds). I8 rows are pre-quantized ints."""
    rows = (
        [(i, [i - 5, (i % 3) - 1, 2 * i - 20]) for i in range(12)]
        if bits == 8
        else [(i, [float(i), float(i % 3) / 2, 0.5 * i]) for i in range(12)]
    )
    count, idx = stream_index_build(
        "127.0.0.1", server.port, rows, dim=DIM, element_bits=bits,
    )
    assert count == len(rows)
    q = np.asarray(rows[7][1], np.float32)
    hits = idx.search(q, k=1)
    assert hits[0][0] == 7 and hits[0][1] == pytest.approx(0.0, abs=tol)


def test_b1_hamming_roundtrip(server):
    """B1 bit-packed rows under the hamming metric (metric_kind 8,
    quantization 5): dim=12 spans two packed bytes, exercising the
    non-byte-aligned tail."""
    rng = np.random.RandomState(7)
    rows = [(i, rng.randint(0, 2, 12).tolist()) for i in range(16)]
    count, idx = stream_index_build(
        "127.0.0.1", server.port, rows, dim=12, metric_kind="hamming",
        element_bits=1,
    )
    assert count == 16
    q = np.asarray(rows[9][1], np.float32)
    hits = idx.search(q, k=1)
    assert hits[0][1] == pytest.approx(0.0)  # an identical bit vector exists
    got = idx.search(np.zeros(12, np.float32), k=16)
    # hamming distance == popcount of each stored vector
    want = sorted(sum(v) for _, v in rows)
    assert sorted(d for _, d in got) == pytest.approx(want)


def test_pq_codebook_path(server):
    """pq=1 streams an f32 codebook; rows insert as their quantized
    reconstruction, so every search hit lands exactly on a centroid."""
    cents = np.asarray([[0.0, 0.0, 0.0], [10.0, 10.0, 10.0]], np.float32)
    rows = [(0, [0.2, -0.1, 0.3]), (1, [9.8, 10.1, 9.9]), (2, [0.1, 0.0, 0.2])]
    count, idx = stream_index_build(
        "127.0.0.1", server.port, rows, dim=DIM, pq=True, codebook=cents,
        num_subvectors=1,
    )
    assert count == 3
    hits = idx.search(np.asarray([10.0, 10.0, 10.0], np.float32), k=1)
    assert hits[0][0] == 1 and hits[0][1] == pytest.approx(0.0)


def test_build_via_server_from_dataframe(server, emb):
    small = emb.limit(30)
    dim = len(small.select("embedding").first()[0])
    count, idx = build_index_via_server(
        small, "127.0.0.1", server.port, vec_col="embedding", id_col="vec_id",
    )
    assert count == 30
    first = small.select("vec_id", "embedding").first()
    hits = idx.search(np.asarray(first["embedding"], np.float32), k=1)
    assert hits[0][0] == first["vec_id"]


# -- ERR paths --------------------------------------------------------------

@pytest.mark.parametrize(
    "kw",
    [
        dict(metric=7),            # no such metric kind
        dict(quant=5, bits=1),     # B1 under a float metric (l2sq default)
        dict(metric=8, quant=5, bits=1, pq=1, n_sub=1, n_cent=2),  # pq over B1
        dict(bits=12),             # no such element width
        dict(dim=0),
        dict(pq=1, n_sub=0, n_cent=4),      # ZeroDivision guard
        dict(pq=1, n_sub=2, n_cent=4),      # dim=3 not divisible by 2
        dict(pq=1, n_sub=1, n_cent=0),
    ],
)
def test_err_on_bad_header(server, kw):
    sock = _raw_handshake(server.port)
    try:
        _send_init(sock, **kw)
        assert _recv_u32(sock) == ERR_MSG
    finally:
        sock.close()


def test_err_on_codebook_count_mismatch(server):
    """Fewer codebook rows than num_centroids must ERR before the setup ack
    rather than killing the handler thread and stranding the client."""
    sock = _raw_handshake(server.port)
    try:
        _send_init(sock, pq=1, n_sub=1, n_cent=4)
        for _ in range(2):  # only 2 of the promised 4 rows
            sock.sendall(np.zeros(DIM, "<f4").tobytes())
        sock.sendall(struct.pack("<I", END_MSG))
        assert _recv_u32(sock) == ERR_MSG
    finally:
        sock.close()


def test_client_raises_on_rejected_setup(server):
    with pytest.raises(ValueError, match="unsupported metric"):
        stream_index_build("127.0.0.1", server.port, [], dim=DIM, metric_kind="jaccard")


# -- S5 get_vectors over a fake transport -----------------------------------

def _fvecs_bytes(vectors) -> bytes:
    out = b""
    for v in vectors:
        out += struct.pack("<I", len(v)) + np.asarray(v, "<f4").tobytes()
    return out


def test_get_vectors_tar_gz(spark):
    from lantern_extras_spark.sources.vecs import get_vectors

    payload = _fvecs_bytes([[1.0, 2.0], [3.0, 4.0]])
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        info = tarfile.TarInfo("sift/base.fvecs")
        info.size = len(payload)
        tar.addfile(info, io.BytesIO(payload))

    def transport(url, timeout_s, max_bytes=None):
        return 200, buf.getvalue(), None

    df = get_vectors(spark, "https://example.test/sift.tar.gz", transport=transport)
    rows = df.orderBy("row_id").collect()
    assert [r["vector"] for r in rows] == [[1.0, 2.0], [3.0, 4.0]]
    assert rows[0]["member"] == "sift/base.fvecs"


def test_get_vectors_plain_gz(spark):
    from lantern_extras_spark.sources.vecs import get_vectors

    blob = gzip.compress(_fvecs_bytes([[7.0, 8.0]]))

    def transport(url, timeout_s, max_bytes=None):
        return 200, blob, None

    df = get_vectors(spark, "https://example.test/base.fvecs.gz", transport=transport)
    assert [r["vector"] for r in df.collect()] == [[7.0, 8.0]]


def test_get_vectors_error_propagates(spark):
    from lantern_extras_spark.sources.vecs import get_vectors

    def transport(url, timeout_s, max_bytes=None):
        return 404, None, None

    with pytest.raises(IOError, match="get_vectors"):
        get_vectors(spark, "https://example.test/missing.tar.gz", transport=transport)


# -- H6 create_index → search(use_index) → reindex round-trip ----------------

def test_collection_index_roundtrip(spark, tmp_path):
    from lantern_extras_spark.collections import CollectionStore
    from lantern_extras_spark.operators.hnsw import reindex_external_index

    store = CollectionStore(spark, str(tmp_path / "c"))
    store.create_collection("docs")
    store.insert("docs", [
        {"vector": [float(i), float(i % 4), 1.0], "data": f"d{i}"}
        for i in range(32)
    ])
    path = store.create_index("docs", column="vector", metric="l2sq",
                              ef=64, ef_construction=64, m=8)
    hits = store.search("docs", query_vec=[4.0, 0.0, 1.0], k=3,
                        metric="l2sq", use_index=True)
    got = [r["id"] for r in hits.collect()]
    assert got[0] == 5  # id 5 holds vector [4,0,1] (ids are 1-based)
    assert len(got) == 3

    # metric mismatch fails loudly instead of returning wrong-metric distances
    with pytest.raises(ValueError, match="metric"):
        store.search("docs", query_vec=[4.0, 0.0, 1.0], k=3,
                     metric="cos", use_index=True)

    # custom-named index is resolvable through its catalog column
    store.create_index("docs", column="vector", metric="l2sq",
                       index_name="my_idx", m=8)
    assert store.search("docs", query_vec=[4.0, 0.0, 1.0], k=1,
                        metric="l2sq", use_index=True).count() == 1

    # reindex rebuilds from the recorded source parquet; search still answers
    reindex_external_index(spark, path)
    hits2 = store.search("docs", query_vec=[4.0, 0.0, 1.0], k=3,
                         metric="l2sq", use_index=True)
    assert [r["id"] for r in hits2.collect()][0] == 5


# -- TLS transport ----------------------------------------------------------

@pytest.fixture(scope="module")
def tls_material(tmp_path_factory):
    """Self-signed localhost cert via the openssl CLI (no extra python deps)."""
    import shutil
    import subprocess

    if shutil.which("openssl") is None:
        pytest.skip("openssl CLI not available")
    d = tmp_path_factory.mktemp("tls")
    cert, key = d / "cert.pem", d / "key.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "1",
         "-subj", "/CN=localhost",
         "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1"],
        check=True, capture_output=True,
    )
    return str(cert), str(key)


def test_tls_roundtrip_and_rejects_plaintext(tls_material):
    """The byte protocol runs unchanged over TLS (the reference server's
    --cert/--key mode, external_index_server_test.rs SSL case): same build
    result as plaintext, cert verified against the test CA; an unverified
    client fails the handshake instead of silently skipping verification."""
    import ssl

    cert, key = tls_material
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert, key)
    with IndexServer(ssl_context=ctx) as s:
        count, idx = stream_index_build(
            "127.0.0.1", s.port, VECS, dim=DIM, cafile=cert,
            server_hostname="localhost",
        )
        assert count == len(VECS)
        hits = idx.search(np.asarray(VECS[5][1], np.float32), k=1)
        assert hits[0][0] == 5 and hits[0][1] == pytest.approx(0.0)

        # default trust store does not contain the self-signed cert
        with pytest.raises(ssl.SSLError):
            stream_index_build(
                "127.0.0.1", s.port, VECS, dim=DIM,
                ssl_context=ssl.create_default_context(),
                server_hostname="localhost", timeout_s=10,
            )
