"""N2 — external-index streaming protocol (reference
`lantern_cli/src/external_index/server.rs:22-34,76-156,213-434`).

Wire format, byte-for-byte the reference's (all integers little-endian):

- on connect the server writes `u32 PROTOCOL_VERSION (1)` then
  `u32 SERVER_TYPE (0x1 = indexing server)` (server.rs:180-183);
- the client sends one 48-byte INIT frame:
  `[u32 INIT_MSG = 0x13333337][11 × u32: pq, metric_kind, quantization, dim,
  m, ef_construction, ef, num_centroids, num_subvectors, estimated_capacity,
  element_bits]` (server.rs:33-34,76-90);
- metric_kind: 1 = cos, 3 = l2sq (8 = hamming — unsupported here, the graph
  kernel is float-metric; cli.rs:56-69), quantization 0..=1 = F32, 2 = F64,
  3 = F16, 4 = I8, 5 = B1 (server.rs:93-99); row frames carry
  `element_bits`-wide elements (receive_rows: LABEL_SIZE + dim ·
  element_bits/8, bit-packed ceil(dim/8) for B1) and non-f32 elements are
  dequantized to f32 at ingest — the graph itself is f32. B1 requires
  metric_kind 8 (hamming); float metrics over bit vectors are rejected;
- if `pq`, the client streams codebook frames of `dim × 4` bytes (one
  centroid row of f32s per frame, num_centroids total) terminated by a
  4-byte `u32 END_MSG = 0x31333337` frame (server.rs:107-125);
- the server acks setup with one `0x00` byte (server.rs:205);
- the client streams row frames of `8 + dim × 4` bytes
  (`[u64 label][dim × f32]`, server.rs:168-172,226-231) terminated by
  END_MSG. As in the reference, frames carry no per-frame magic: END is
  detected by the first 4 bytes of a frame, so frame sizes must be exact
  (server.rs:280-306);
- the server replies `u64 tuple_count`, `u64 index_size`, then the
  serialized index (server.rs:378-425).

The returned artifact is this engine's `HnswIndex.to_bytes()` npz (not a
`.usearch` file — the graph format is original, the protocol semantics are
the parity surface). With `pq=1` rows are quantized-then-reconstructed
through the streamed codebook before insertion, the reference's
pq_construction/pq_output behavior (server.rs:139-152) in f32 space.
"""

from __future__ import annotations

import socket
import socketserver
import ssl
import struct
import threading

import numpy as np

from lantern_extras_spark.operators.hnsw import HnswIndex

PROTOCOL_VERSION = 1
SERVER_TYPE_INDEXING = 0x1
INIT_MSG = 0x13333337
END_MSG = 0x31333337
ERR_MSG = 0x37333337
_HEADER_PARAMS = 11  # pq..element_bits
INIT_FRAME_SIZE = 4 * (1 + _HEADER_PARAMS)

_METRIC_FROM_U32 = {1: "cos", 3: "l2sq", 8: "hamming"}  # cli.rs:56-69
_METRIC_TO_U32 = {v: k for k, v in _METRIC_FROM_U32.items()}

# scalar element kinds by wire width (receive_rows sizes frames from
# element_bits, server.rs:224-230); everything dequantizes to f32 at ingest.
# element_bits=1 is B1: ceil(dim/8) bytes/row, MSB-first bit unpack, and
# requires the hamming metric (bit vectors have no float geometry).
_DTYPE_FROM_BITS = {64: "<f8", 32: "<f4", 16: "<f2", 8: "<i1"}
_MAX_QUANTIZATION = 5  # 0..=1 F32, 2 F64, 3 F16, 4 I8, 5 B1 (server.rs:93-99)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        buf += chunk
    return buf


def _read_frame(sock: socket.socket, expected_size: int) -> bytes | None:
    """One protocol frame: END is the first u32 (server.rs:280-306); data
    frames are exactly `expected_size` bytes. Returns None on END."""
    head = _recv_exact(sock, 4)
    if struct.unpack("<I", head)[0] == END_MSG:
        return None
    return head + _recv_exact(sock, expected_size - 4)


class _IndexHandler(socketserver.BaseRequestHandler):
    def handle(self) -> None:  # one connection = one index build
        sock = self.request
        sock.sendall(struct.pack("<II", PROTOCOL_VERSION, SERVER_TYPE_INDEXING))
        init = _recv_exact(sock, INIT_FRAME_SIZE)
        fields = struct.unpack(f"<{1 + _HEADER_PARAMS}I", init)
        if fields[0] != INIT_MSG:
            sock.sendall(struct.pack("<I", ERR_MSG))
            return
        (pq, metric_kind, quantization, dim, m, efc, ef,
         num_centroids, num_subvectors, _capacity, element_bits) = fields[1:]
        try:
            metric = _METRIC_FROM_U32[metric_kind]
            if quantization > _MAX_QUANTIZATION:
                raise ValueError("unknown scalar quantization")
            elem_dtype = _DTYPE_FROM_BITS.get(element_bits)
            if element_bits == 1:
                # B1 bit vectors carry no float geometry — hamming only
                if metric != "hamming":
                    raise ValueError("element_bits=1 requires the hamming metric")
            elif elem_dtype is None:
                raise ValueError(f"unsupported element_bits {element_bits}")
            if dim < 1:
                raise ValueError("dim must be >= 1")
            if pq == 1 and (
                element_bits == 1
                or num_subvectors < 1
                or dim % num_subvectors
                or num_centroids < 1
            ):
                raise ValueError("invalid pq header")
        except (KeyError, ValueError):
            sock.sendall(struct.pack("<I", ERR_MSG))
            return

        codebook = None
        if pq == 1:
            # codebook frames are always f32 (bytes_to_f32_vec_le,
            # server.rs:107-125) regardless of row element kind
            rows = []
            while True:
                frame = _read_frame(sock, dim * 4)
                if frame is None:
                    break
                rows.append(np.frombuffer(frame, dtype="<f4"))
            if len(rows) != num_centroids:
                # malformed codebook: reply ERR instead of dying mid-reshape
                # and leaving the client blocked on the setup ack
                sock.sendall(struct.pack("<I", ERR_MSG))
                return
            # [num_centroids][dim] → per-subvector centroid tensors
            cb = np.asarray(rows, dtype=np.float32).reshape(num_centroids, dim)
            sub = dim // num_subvectors
            codebook = [
                np.ascontiguousarray(cb[:, s * sub:(s + 1) * sub])
                for s in range(num_subvectors)
            ]

        sock.sendall(b"\x00")  # setup ack (server.rs:205)

        idx = HnswIndex(dim=dim, m=max(m, 2), ef_construction=max(efc, ef, 1),
                        metric=metric, seed=self.server.seed)
        # receive_rows frame sizing (server.rs:224-230): bit-packed when
        # element_bits < 8, else dim * element_bits/8 bytes of elements
        row_size = 8 + (-(-dim // 8) if element_bits == 1 else dim * (element_bits // 8))
        count = 0
        while True:
            frame = _read_frame(sock, row_size)
            if frame is None:
                break
            (label,) = struct.unpack_from("<Q", frame)
            if element_bits == 1:
                bits = np.unpackbits(
                    np.frombuffer(frame, dtype=np.uint8, offset=8), bitorder="big"
                )
                vec = bits[:dim].astype(np.float32)
            else:
                vec = np.frombuffer(frame, dtype=elem_dtype, offset=8).astype(
                    np.float32
                )
            if codebook is not None:
                # pq_construction: insert the quantized reconstruction
                parts = []
                sub = dim // num_subvectors
                for s, cents in enumerate(codebook):
                    d = cents - vec[s * sub:(s + 1) * sub][None, :]
                    parts.append(cents[int(np.argmin(np.einsum("ij,ij->i", d, d)))])
                vec = np.concatenate(parts)
            idx.add_batch([label], vec[None, :])
            count += 1

        blob = idx.to_bytes()
        sock.sendall(struct.pack("<Q", count))
        sock.sendall(struct.pack("<Q", len(blob)))
        sock.sendall(blob)


class IndexServer(socketserver.ThreadingTCPServer):
    """Loopback-friendly indexing server; `with IndexServer() as s: s.port`.

    Pass `ssl_context` (an `ssl.SSLContext` loaded with the server cert/key)
    to serve the same byte protocol over TLS — the reference's `--cert/--key`
    mode (`external_index/server.rs` SSL arm; exercised by
    `external_index_server_test.rs`'s SSL case). The TLS handshake is
    deferred to the handler thread (`do_handshake_on_connect=False`) so a
    slow or broken client can't stall the accept loop.

    I8 note (element_bits=8): rows are ingested as raw int8 values cast to
    f32. The reference's usearch I8 ScalarKind instead stores
    scale-quantized floats (value ≈ round(f · 127) with the scale reapplied
    on read), so absolute I8 value semantics diverge: this server treats the
    wire integers as the caller's pre-quantized representation and does not
    rescale. Relative geometry (and therefore neighbor ranking) matches for
    any uniform scale; callers needing reference value parity should send
    `round(f * 127)` and rescale query vectors the same way."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, host: str = "127.0.0.1", port: int = 0, seed: int = 42,
                 ssl_context: ssl.SSLContext | None = None):
        super().__init__((host, port), _IndexHandler)
        self.seed = seed
        self.port = self.server_address[1]
        self._ssl_context = ssl_context
        self._thread: threading.Thread | None = None

    def get_request(self):
        sock, addr = super().get_request()
        if self._ssl_context is not None:
            sock = self._ssl_context.wrap_socket(
                sock, server_side=True, do_handshake_on_connect=False
            )
        return sock, addr

    def start(self) -> "IndexServer":
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
        self.server_close()

    def __enter__(self) -> "IndexServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def stream_index_build(
    host: str,
    port: int,
    rows,
    dim: int,
    metric_kind: str = "l2sq",
    m: int = 16,
    ef_construction: int = 64,
    ef: int = 64,
    pq: bool = False,
    codebook: np.ndarray | None = None,
    num_subvectors: int = 0,
    element_bits: int = 32,
    timeout_s: float = 60.0,
    cafile: str | None = None,
    ssl_context: ssl.SSLContext | None = None,
    server_hostname: str | None = None,
) -> tuple[int, HnswIndex]:
    """Protocol client: stream `(label, vector)` rows, get back
    (tuple_count, index). `codebook` is [num_centroids][dim] f32 when pq.
    `element_bits` selects the wire element kind (64 f64 / 32 f32 / 16 f16 /
    8 i8 pre-quantized ints / 1 B1 bit-packed 0-1 vectors, hamming metric
    only); the server dequantizes to f32 at ingest.

    TLS: pass `cafile` (trust anchor for the server cert — the reference
    client's CA-file argument) or a ready `ssl_context`; `server_hostname`
    defaults to `host` for certificate name checking."""
    if metric_kind not in _METRIC_TO_U32:
        raise ValueError(f"unsupported metric {metric_kind!r}")
    elem_dtype = _DTYPE_FROM_BITS.get(element_bits)
    if elem_dtype is None and element_bits != 1:
        raise ValueError(f"unsupported element_bits {element_bits}")
    quantization = {64: 2, 32: 0, 16: 3, 8: 4, 1: 5}[element_bits]
    if cafile is not None and ssl_context is None:
        ssl_context = ssl.create_default_context(cafile=cafile)
    raw_sock = socket.create_connection((host, port), timeout=timeout_s)
    if ssl_context is not None:
        raw_sock = ssl_context.wrap_socket(
            raw_sock, server_hostname=server_hostname or host
        )
    with raw_sock as sock:
        version, server_type = struct.unpack("<II", _recv_exact(sock, 8))
        if version != PROTOCOL_VERSION or server_type != SERVER_TYPE_INDEXING:
            raise ConnectionError(
                f"unexpected handshake version={version} type={server_type}"
            )
        n_centroids = int(codebook.shape[0]) if pq else 0
        sock.sendall(struct.pack(
            f"<{1 + _HEADER_PARAMS}I",
            INIT_MSG, int(pq), _METRIC_TO_U32[metric_kind], quantization, dim,
            m, ef_construction, ef, n_centroids, num_subvectors, 0,
            element_bits,
        ))
        if pq:
            cb = np.asarray(codebook, dtype="<f4")
            for row in cb:
                sock.sendall(row.tobytes())
            sock.sendall(struct.pack("<I", END_MSG))
        ack = _recv_exact(sock, 1)
        if ack != b"\x00":
            raise ConnectionError(f"server rejected setup (0x{ack.hex()})")
        count_sent = 0
        for label, vec in rows:
            arr = np.asarray(vec)
            if arr.shape[0] != dim:
                raise ValueError(f"row {label}: dim {arr.shape[0]} != {dim}")
            payload = (
                np.packbits(arr.astype(bool), bitorder="big")
                if element_bits == 1
                else arr.astype(elem_dtype)
            )
            sock.sendall(struct.pack("<Q", int(label)) + payload.tobytes())
            count_sent += 1
        sock.sendall(struct.pack("<I", END_MSG))
        (tuple_count,) = struct.unpack("<Q", _recv_exact(sock, 8))
        (size,) = struct.unpack("<Q", _recv_exact(sock, 8))
        blob = _recv_exact(sock, size)
    return int(tuple_count), HnswIndex.from_bytes(blob)


def build_index_via_server(
    df,
    host: str,
    port: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    **kwargs,
) -> tuple[int, HnswIndex]:
    """Stream a DataFrame's rows to an indexing server — the reference's
    create_usearch_index scan→stream loop (external_index/mod.rs:336-374).
    Deliberately single-stream (the protocol is); rows arrive through
    `toLocalIterator` so only one partition is resident driver-side. For
    cluster-parallel builds use `build_hnsw_shards` — this path exists for
    protocol parity with external indexing services."""
    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("empty DataFrame")
    dim = len(first[0])
    it = (
        (r[id_col], r[vec_col])
        for r in df.select(id_col, vec_col).toLocalIterator()
    )
    return stream_index_build(host, port, it, dim=dim, **kwargs)
