"""ORT activation path (reference ort_runtime.rs:316-533, 701-768).

onnxruntime/tokenizers are not installable in this container, so the suite is
split by what each test needs:

- Fake-session tests run TODAY: the injectable session/tokenizer seams drive
  everything downstream of the two imports — tokenizer-encode + padding,
  input-name dispatch, memory-aware chunking, pooling dispatch, the padded
  processed_tokens ledger — with numpy fakes.
- ModelCache tests run TODAY: the reference's 80%-of-free-memory guard
  (clear-all second chance, then fail loudly) driven by an injected
  free_mem_fn and fake "model weights".
- The real-ORT test skips unless `import onnxruntime` succeeds; the ONNX
  graph it loads is hand-serialized protobuf (no `onnx` package needed), so
  the whole path lights up the day the env gains onnxruntime — one pip
  install from activation, nothing else missing.

No Spark session needed anywhere here (pure-python runtime layer).
"""

import numpy as np
import pytest

from lantern_extras_spark.embeddings import runtimes as R
from lantern_extras_spark.embeddings.runtimes import MEM_PERCENT_THRESHOLD, ModelCache, OrtRuntime


class FakeEncoding:
    def __init__(self, ids, type_ids=None):
        self.ids = list(ids)
        self.attention_mask = [1] * len(ids)
        self.type_ids = list(type_ids) if type_ids else [0] * len(ids)


class FakeTokenizer:
    """Whitespace tokenizer: token id = word length (deterministic, no vocab)."""

    def encode_batch(self, texts):
        return [FakeEncoding([len(w) for w in t.split()]) for t in texts]


class FakeSession:
    """ORT InferenceSession stand-in: hidden[b, s, d] = ids[b, s] + d/10."""

    def __init__(self, dim=3, input_names=("input_ids", "attention_mask")):
        self._dim = dim
        self._input_names = list(input_names)
        self.seen_feeds = []

    def get_inputs(self):
        class _I:
            def __init__(self, name):
                self.name = name

        return [_I(n) for n in self._input_names]

    def run(self, _out, feed):
        self.seen_feeds.append(sorted(feed))
        ids = np.asarray(feed["input_ids"], dtype=np.float32)
        hidden = ids[:, :, None] + np.arange(self._dim, dtype=np.float32)[None, None, :] / 10.0
        return [hidden]


def _rt(session=None, tokenizer=None, **params):
    defaults = {"pooling": "mean", "seq_len": 16, "dimensions": 3}
    defaults.update(params)
    return OrtRuntime(
        "test/fake-ort", defaults,
        session=session or FakeSession(), tokenizer=tokenizer or FakeTokenizer(),
    )


def test_process_mean_pool_matches_manual():
    rt = _rt()
    res = rt.process(["aa bbb c", "dddd"])
    # text 0: ids [2,3,1] → masked mean = 2.0; text 1: ids [4] padded to width 3
    got = np.asarray(res.embeddings)
    assert got.shape == (2, 3)
    np.testing.assert_allclose(got[0], [2.0, 2.1, 2.2], rtol=1e-6)
    np.testing.assert_allclose(got[1], [4.0, 4.1, 4.2], rtol=1e-6)


def test_processed_tokens_counts_padded_matrix():
    """Reference ort_runtime.rs:463-466: processed_tokens = len of the
    CONCATENATED PADDED id vectors, padding included."""
    res = _rt().process(["aa bbb c", "dddd"])
    assert res.processed_tokens == 2 * 3  # batch 2 × padded width 3


def test_truncation_at_seq_len():
    res = _rt(seq_len=2).process(["a bb ccc dddd"])
    # 4 tokens truncated to seq_len=2 → mean of ids [1,2]
    np.testing.assert_allclose(np.asarray(res.embeddings)[0][0], 1.5, rtol=1e-6)
    assert res.processed_tokens == 2


def test_chunking_is_batch_invariant(monkeypatch):
    """Force 1-row micro-batches via a tiny free-memory reading: results must
    be identical to the single-chunk run (the reference chunks by available
    memory the same way, ort_runtime.rs:393-442)."""
    texts = [f"{'x' * (i + 1)} yy" for i in range(5)]
    whole = _rt().process(texts)
    monkeypatch.setattr(R, "_free_memory_bytes", lambda: 1)
    sess = FakeSession()
    chunked = _rt(session=sess).process(texts)
    assert len(sess.seen_feeds) == 5  # 1 row per session.run
    np.testing.assert_allclose(whole.embeddings, chunked.embeddings, rtol=1e-6)
    assert whole.processed_tokens == chunked.processed_tokens


def test_feeds_only_declared_inputs():
    s2 = FakeSession(input_names=("input_ids", "attention_mask"))
    _rt(session=s2).process(["a b"])
    assert s2.seen_feeds == [["attention_mask", "input_ids"]]
    s3 = FakeSession(input_names=("input_ids", "attention_mask", "token_type_ids"))
    _rt(session=s3).process(["a b"])
    assert s3.seen_feeds == [["attention_mask", "input_ids", "token_type_ids"]]


def test_missing_attention_mask_input_fails_loudly():
    """Mirrors the reference's explicit check (ort_runtime.rs:492-498)."""
    with pytest.raises(ValueError, match="attention_mask"):
        _rt(session=FakeSession(input_names=("input_ids",))).process(["a"])


def test_cls_pooling_via_params():
    res = _rt(pooling="cls").process(["aa bbb c"])
    # cls = first token row: ids[0]=2
    np.testing.assert_allclose(np.asarray(res.embeddings)[0], [2.0, 2.1, 2.2], rtol=1e-6)


def test_empty_batch():
    res = _rt().process([])
    assert res.embeddings == [] and res.processed_tokens == 0


# ---------------------------------------------------------------------------
# ModelCache: the reference's 80% free-memory guard (ort_runtime.rs:701-768)
# ---------------------------------------------------------------------------

def test_cache_under_threshold_keeps_encoders():
    cache = ModelCache(free_mem_fn=lambda: 1000)
    cache.put("m1", ("s1", "t1"))
    cache.ensure_memory(int(1000 * (MEM_PERCENT_THRESHOLD / 100) - 1))
    assert len(cache) == 1 and cache.clear_count == 0
    assert cache.get("m1") == ("s1", "t1")


def test_cache_over_threshold_clears_all_then_passes():
    """Eviction is clear-ALL (the reference wipes every MODEL_INFO_MAP encoder,
    not one LRU entry); freeing memory lets the re-check pass."""
    readings = iter([1000, 10_000])  # after clearing, memory recovered
    cache = ModelCache(free_mem_fn=lambda: next(readings))
    cache.put("m1", ("s1", "t1"))
    cache.put("m2", ("s2", "t2"))
    cache.ensure_memory(900)  # 90% of free → trip the guard
    assert len(cache) == 0 and cache.clear_count == 1


def test_cache_still_over_after_clear_raises_reference_error():
    cache = ModelCache(free_mem_fn=lambda: 1000)
    cache.put("m1", ("s1", "t1"))
    with pytest.raises(MemoryError, match="Not enough free memory"):
        cache.ensure_memory(900)
    assert len(cache) == 0  # the second-chance clear still happened


def test_runtime_uses_injected_cache_for_load(monkeypatch):
    """A cached (session, tokenizer) is reused without re-import: the cache is
    the executor-singleton model store (ort_runtime.rs:915-916 analog)."""
    cache = ModelCache(free_mem_fn=lambda: 1 << 40)
    cache.put("test/fake-ort|None", (FakeSession(), FakeTokenizer()))
    rt = OrtRuntime("test/fake-ort", {"pooling": "mean", "seq_len": 16}, cache=cache)
    res = rt.process(["aa bbb c"])  # would raise NotImplementedError on a miss
    np.testing.assert_allclose(np.asarray(res.embeddings)[0][0], 2.0, rtol=1e-6)


def test_uncached_load_without_ort_raises_not_implemented():
    rt = OrtRuntime("BAAI/bge-small-en", {"data_path": "/nonexistent"})
    with pytest.raises(NotImplementedError, match="onnxruntime"):
        rt.process(["hello"])


# ---------------------------------------------------------------------------
# Real onnxruntime (skip-if-absent): hand-serialized ONNX graph, no `onnx`
# package needed. hidden = Unsqueeze(Cast(input_ids)) — (batch, seq, 1) float,
# so mean pooling returns the masked mean of token ids: exactly what the fake
# session computes at d=0, tying the two paths together.
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _vi(field: int, value: int) -> bytes:  # wire type 0
    return _varint((field << 3) | 0) + _varint(value)


def _ld(field: int, payload: bytes) -> bytes:  # wire type 2
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _s(field: int, text: str) -> bytes:
    return _ld(field, text.encode())


def _dim_param(name: str) -> bytes:  # TensorShapeProto.Dimension.dim_param = 2
    return _ld(1, _s(2, name))


def _dim_value(v: int) -> bytes:  # TensorShapeProto.Dimension.dim_value = 1
    return _ld(1, _vi(1, v))


def _value_info(name: str, elem_type: int, dims: bytes) -> bytes:
    # ValueInfoProto{name=1, type=2}; TypeProto{tensor_type=1};
    # TypeProto.Tensor{elem_type=1, shape=2}; TensorShapeProto{dim=1 repeated}
    tensor = _vi(1, elem_type) + _ld(2, dims)
    return _s(1, name) + _ld(2, _ld(1, tensor))


def tiny_onnx_model_bytes() -> bytes:
    """ModelProto for: last_hidden_state = Unsqueeze(Cast<float>(input_ids),
    axes=[2]) — opset 11 (axes as attribute), IR version 6."""
    # AttributeProto{name=1, i=3, ints=8 repeated, type=20}; INT=2, INTS=7
    cast_attr = _s(1, "to") + _vi(3, 1) + _vi(20, 2)  # to=FLOAT(1)
    unsq_attr = _s(1, "axes") + _vi(8, 2) + _vi(20, 7)  # axes=[2]
    # NodeProto{input=1, output=2, name=3, op_type=4, attribute=5}
    cast_node = (
        _s(1, "input_ids") + _s(2, "casted") + _s(3, "cast0")
        + _s(4, "Cast") + _ld(5, cast_attr)
    )
    unsq_node = (
        _s(1, "casted") + _s(2, "last_hidden_state") + _s(3, "unsq0")
        + _s(4, "Unsqueeze") + _ld(5, unsq_attr)
    )
    in_ids = _value_info("input_ids", 7, _dim_param("batch") + _dim_param("seq"))  # INT64
    out_h = _value_info(
        "last_hidden_state", 1, _dim_param("batch") + _dim_param("seq") + _dim_value(1)
    )
    # GraphProto{node=1, name=2, input=11, output=12}
    graph = _ld(1, cast_node) + _ld(1, unsq_node) + _s(2, "tiny") + _ld(11, in_ids) + _ld(12, out_h)
    # ModelProto{ir_version=1, graph=7, opset_import=8}; OperatorSetId{version=2}
    return _vi(1, 6) + _ld(7, graph) + _ld(8, _vi(2, 11))


def _pb_fields(buf: bytes) -> dict[int, list]:
    """Minimal protobuf wire-format reader (varint + length-delimited only —
    all this model uses): field_number → list of raw values."""
    out: dict[int, list] = {}
    i = 0
    while i < len(buf):
        tag = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            tag |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[i : i + ln]
            i += ln
        else:  # pragma: no cover — this encoder never emits other wire types
            raise AssertionError(f"unexpected wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


def test_tiny_onnx_model_wire_format():
    """The hand-serialized ModelProto must decode to the intended structure —
    guards against tag/length bugs that would only surface the day the env
    gains onnxruntime (when the skip lifts, the model has to load)."""
    m = _pb_fields(tiny_onnx_model_bytes())
    assert m[1] == [6]  # ir_version
    opset = _pb_fields(m[8][0])
    assert opset[2] == [11]
    g = _pb_fields(m[7][0])
    assert g[2] == [b"tiny"]
    nodes = [_pb_fields(n) for n in g[1]]
    assert [n[4][0] for n in nodes] == [b"Cast", b"Unsqueeze"]
    assert nodes[0][1] == [b"input_ids"] and nodes[0][2] == [b"casted"]
    assert nodes[1][1] == [b"casted"] and nodes[1][2] == [b"last_hidden_state"]
    cast_attr = _pb_fields(nodes[0][5][0])
    assert cast_attr[1] == [b"to"] and cast_attr[3] == [1] and cast_attr[20] == [2]
    unsq_attr = _pb_fields(nodes[1][5][0])
    assert unsq_attr[1] == [b"axes"] and unsq_attr[8] == [2] and unsq_attr[20] == [7]
    vin = _pb_fields(g[11][0])
    assert vin[1] == [b"input_ids"]
    tin = _pb_fields(_pb_fields(vin[2][0])[1][0])
    assert tin[1] == [7]  # INT64
    vout = _pb_fields(g[12][0])
    assert vout[1] == [b"last_hidden_state"]
    tout = _pb_fields(_pb_fields(vout[2][0])[1][0])
    assert tout[1] == [1]  # FLOAT
    dims = [_pb_fields(d) for d in _pb_fields(tout[2][0])[1]]
    assert dims[2][1] == [1]  # trailing hidden dim is fixed at 1


def test_real_onnxruntime_end_to_end(tmp_path):
    """Activation test: with onnxruntime installed, the REAL session drives the
    same process() path the fakes pin — masked-mean of token ids, batch
    invariance, padded token ledger. Skips (cleanly) in this container."""
    ort = pytest.importorskip("onnxruntime")
    model_path = tmp_path / "model.onnx"
    model_path.write_bytes(tiny_onnx_model_bytes())
    sess = ort.InferenceSession(str(model_path), providers=["CPUExecutionProvider"])
    rt = OrtRuntime(
        "test/tiny-onnx", {"pooling": "mean", "seq_len": 16, "dimensions": 1},
        session=sess, tokenizer=FakeTokenizer(),
    )
    res = rt.process(["aa bbb c", "dddd"])
    got = np.asarray(res.embeddings)
    assert got.shape == (2, 1)
    np.testing.assert_allclose(got[:, 0], [2.0, 4.0], rtol=1e-6)
    assert res.processed_tokens == 6
    halves = rt.process(["aa bbb c"]).embeddings + rt.process(["dddd"]).embeddings
    np.testing.assert_allclose(np.asarray(halves)[:, 0], [2.0, 4.0], rtol=1e-6)
