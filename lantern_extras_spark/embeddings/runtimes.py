"""Embedding runtimes — the engine's U1–U8 surface (SURVEY.md §2.8).

Runtime dispatch mirrors the reference's `EmbeddingRuntime` enum
(lantern_cli/src/embeddings/core/mod.rs:59-110): each runtime implements
`process(texts) -> EmbeddingResult(embeddings, processed_tokens)`.

Runtimes:
- **HashRuntime** — deterministic md5-based embeddings, reproducible in any
  engine (the correctness-oracle model; also the default in environments
  without model weights, like this container).
- **OrtRuntime** — local ONNX inference, fully implemented: tokenize →
  memory-aware micro-batches → session.run → pooling, with the reference's
  80%-free-memory cache eviction (ModelCache). Only the `onnxruntime`/
  `tokenizers` imports are env-gated (absent in this container →
  NotImplementedError with a clear message); the session/tokenizer seams are
  injectable, so the whole path is pinned by tests today and activates with
  one pip install (tests/test_ort_activation.py).
- **OpenAIRuntime / CohereRuntime** — HTTP API runtimes with the reference's
  batching and retry semantics (token-budget packing ≤8190 via cl100k-ish
  estimate, cohere 96 inputs/request, 5 retries with 4 s·(attempt+1) backoff —
  core/openai_runtime.rs:179-247, cohere_runtime.rs:139, core/utils.rs:88-99).
  The transport is injectable so tests exercise packing/retry without network.

Executor-singleton pattern: `get_runtime` memoizes per (runtime, model, params)
in the worker process — each Spark python worker loads a model at most once, the
Spark analog of the reference's global MODEL_INFO_MAP (ort_runtime.rs:915-916).
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass
from typing import Callable, Sequence

from lantern_extras_spark.embeddings.registry import model_dim

# Reference retry policy: 5 attempts, 4000 ms * (attempt+1) backoff (core/utils.rs:88-99)
MAX_RETRIES = 5
BACKOFF_BASE_S = 4.0
# Reference OpenAI token budget per request (openai_runtime.rs:51-68)
OPENAI_MAX_TOKENS_PER_REQUEST = 8190
COHERE_MAX_INPUTS_PER_REQUEST = 96


@dataclass
class EmbeddingResult:
    """Mirror of the reference's EmbeddingResult (core/runtime.rs:1-4)."""

    embeddings: list[list[float]]
    processed_tokens: int


def approx_token_count(text: str) -> int:
    """Whitespace token count — the deterministic estimate the hash test
    runtime ledgers with (its oracle parity depends on it staying trivial)."""
    return len(text.split())


def token_counter(method: str = "bpe"):
    """Resolve the usage-ledger/packing token counter.

    The reference counts *exact* tokenizer tokens — tiktoken cl100k_base for
    OpenAI (openai_runtime.rs:50-66), the model's HF tokenizer for ORT
    (text_embedding_test.rs:88 asserts exact counts). "bpe" is the vendored
    byte-level BPE over the committed mini-vocab (functions/bpe.py): exact and
    reproducible w.r.t. that vocab, no network. "whitespace" keeps the legacy
    estimate."""
    if method == "bpe":
        from lantern_extras_spark.functions.bpe import bpe_token_count

        return bpe_token_count
    if method == "whitespace":
        return approx_token_count
    raise ValueError(f"unknown token_method {method!r}")


class BaseRuntime:
    name = "base"

    def __init__(self, model: str, params: dict | None = None):
        self.model = model
        self.params = params or {}

    def process(self, texts: Sequence[str]) -> EmbeddingResult:
        raise NotImplementedError

    def dim(self) -> int:
        return model_dim(self.model, int(self.params.get("dimensions", 16)))


class HashRuntime(BaseRuntime):
    """Deterministic embedding: element i = hash32(model:i:text)/2^32·2−1.

    Bit-identical to the native Column expression `hash_embedding` in
    pipeline.py and to the DuckDB oracle SQL — so the full pipeline
    (filters → embed → write-back → search) is verifiable end to end.
    """

    name = "hash"

    def process(self, texts: Sequence[str]) -> EmbeddingResult:
        d = self.dim()
        out = []
        for t in texts:
            vec = []
            for i in range(d):
                h = int(hashlib.md5(f"{self.model}:{i}:{t}".encode()).hexdigest()[:8], 16)
                vec.append(h / 4294967296.0 * 2.0 - 1.0)
            out.append(vec)
        return EmbeddingResult(out, sum(approx_token_count(t) for t in texts))


# Reference memory guard: loading a model whose file size is ≥80% of free
# memory first clears the whole encoder cache, re-checks, then fails loudly
# (ort_runtime.rs:715 MEM_PERCENT_THRESHOLD, :711-768 check_available_memory).
MEM_PERCENT_THRESHOLD = 80.0


def _free_memory_bytes() -> int:
    """Free RAM + free swap, the reference's sysinfo formula
    (ort_runtime.rs:717-719: (total−used) + (swap_total−swap_used))."""
    free = swap_free = 0
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                k, v = line.split(":", 1)
                if k == "MemAvailable":
                    free = int(v.split()[0]) * 1024
                elif k == "SwapFree":
                    swap_free = int(v.split()[0]) * 1024
    except OSError:  # pragma: no cover — non-linux
        return 1 << 40
    return free + swap_free


class ModelCache:
    """Executor-process encoder cache with the reference's memory-pressure
    eviction (ort_runtime.rs:701-768): `ensure_memory(model_bytes)` before a
    load — if the model would take ≥80% of free memory, drop EVERY cached
    encoder (the reference clears the whole MODEL_INFO_MAP, not one LRU
    entry), re-measure, and raise the reference's "Not enough free memory"
    error if still over. `free_mem_fn` is injectable so tests drive the
    threshold logic without real model weights."""

    def __init__(self, free_mem_fn: Callable[[], int] | None = None):
        self._cache: dict[str, tuple] = {}
        self._free_mem_fn = free_mem_fn or _free_memory_bytes
        self.clear_count = 0

    def __len__(self) -> int:
        return len(self._cache)

    def get(self, key: str):
        return self._cache.get(key)

    def put(self, key: str, encoder) -> None:
        self._cache[key] = encoder

    def clear(self) -> None:
        self._cache.clear()
        self.clear_count += 1

    def ensure_memory(self, model_bytes: int) -> None:
        free = float(self._free_mem_fn())
        pct = model_bytes / max(free, 1.0) * 100.0
        if pct < MEM_PERCENT_THRESHOLD:
            return
        self.clear()  # second chance: evict every cached encoder, re-check
        free = float(self._free_mem_fn())
        pct = model_bytes / max(free, 1.0) * 100.0
        if pct >= MEM_PERCENT_THRESHOLD:
            mem_avail_mb = free / 1024.0 / 1024.0
            percent_diff = pct - MEM_PERCENT_THRESHOLD
            mem_needed_mb = mem_avail_mb + mem_avail_mb / (100.0 / max(percent_diff, 1e-9))
            raise MemoryError(
                f"Not enough free memory to run the model. Memory needed: "
                f"{mem_needed_mb:.2f}MB, Memory available: {mem_avail_mb:.2f}MB"
            )


MODEL_CACHE = ModelCache()


class OrtRuntime(BaseRuntime):
    """Local ONNX inference (reference ort_runtime.rs:316-533). The full
    pipeline is implemented: tokenizer-encode (padding + seq_len truncation) →
    memory-aware micro-batches → session.run feeding exactly the inputs the
    graph declares (input_ids / attention_mask / token_type_ids,
    ort_runtime.rs:444-490) → pooling.pool() by the registry's per-model
    strategy → EmbeddingResult with the reference's padded-token accounting
    (processed_tokens counts the concatenated padded id matrix,
    ort_runtime.rs:465).

    Activation: `params['data_path']` names a directory with model.onnx +
    tokenizer.json; needs the `onnxruntime` + `tokenizers` pip packages (not
    installed in this container — tests/test_ort_activation.py skips unless
    present and lights up the day they are). The session/tokenizer seams are
    injectable (`session`, `tokenizer` ctor kwargs) so everything downstream
    of the imports — chunking, input-name dispatch, pooling, token ledger,
    the cache's memory guard — is exercised today with numpy fakes.

    Sessions live in MODEL_CACHE keyed by (model, data_path): one load per
    executor process, evicted together under memory pressure like the
    reference's MODEL_INFO_MAP."""

    name = "ort"

    def __init__(self, model: str, params: dict | None = None, *,
                 session=None, tokenizer=None, cache: ModelCache | None = None):
        super().__init__(model, params)
        self._session = session
        self._tokenizer = tokenizer
        self._cache = cache if cache is not None else MODEL_CACHE
        self._injected = session is not None

    def _spec(self):
        from lantern_extras_spark.embeddings.registry import MODEL_REGISTRY

        return MODEL_REGISTRY.get(self.model)

    def _seq_len(self) -> int:
        spec = self._spec()
        return int(self.params.get("seq_len", spec.seq_len if spec else 512))

    def _pooling(self) -> str:
        spec = self._spec()
        return str(self.params.get("pooling", spec.pooling if spec else "mean"))

    def dim(self) -> int:
        spec = self._spec()
        if spec:
            return spec.dim
        return int(self.params.get("dimensions", 16))

    def _load(self):
        if self._session is not None:
            return
        data_path = self.params.get("data_path")
        key = f"{self.model}|{data_path}"
        cached = self._cache.get(key)
        if cached is not None:
            self._session, self._tokenizer = cached
            return
        try:
            import onnxruntime as ort
            from tokenizers import Tokenizer
        except ImportError as e:  # pragma: no cover - environment dependent
            raise NotImplementedError(
                "OrtRuntime requires onnxruntime + tokenizers (not installed in "
                "this environment). Use runtime='hash' for deterministic testing, "
                "or install the ORT stack and point runtime_params['data_path'] "
                "at a directory containing model.onnx + tokenizer.json."
            ) from e
        if not data_path:  # pragma: no cover - needs ORT present
            raise NotImplementedError(
                "Model weight download is not available in this environment. "
                "Provide runtime_params['data_path'] with pre-downloaded model "
                "files (model.onnx + tokenizer.json)."
            )
        import os

        model_file = os.path.join(data_path, "model.onnx")
        self._cache.ensure_memory(os.path.getsize(model_file))
        opts = ort.SessionOptions()
        opts.graph_optimization_level = ort.GraphOptimizationLevel.ORT_ENABLE_ALL
        session = ort.InferenceSession(
            model_file, sess_options=opts, providers=["CPUExecutionProvider"]
        )
        tok_file = os.path.join(data_path, "tokenizer.json")
        tokenizer = Tokenizer.from_file(tok_file) if os.path.exists(tok_file) else None
        if tokenizer is not None:
            # reference EncoderService::new applies padding+truncation params
            # when the tokenizer file lacks them (ort_runtime.rs:330-343)
            tokenizer.enable_padding()
            tokenizer.enable_truncation(max_length=self._seq_len())
        self._session, self._tokenizer = session, tokenizer
        self._cache.put(key, (session, tokenizer))

    @staticmethod
    def chunk_for_memory(n_rows: int, seq_len: int, dim: int, free_bytes: int) -> int:
        """Memory-aware micro-batch size (the reference's adaptive chunking idea,
        ort_runtime.rs:362-442): bytes/row ≈ activations + IO buffers, with a
        1.2× safety factor; at least 1 row."""
        per_row = (seq_len * dim * 8 * 4) * 1.2
        return max(1, min(n_rows, int(free_bytes / max(per_row, 1))))

    def _encode(self, texts: Sequence[str]):
        """texts → (input_ids, attention_mask, token_type_ids) int64 matrices,
        padded to the batch max (≤ seq_len)."""
        import numpy as np

        if self._tokenizer is None:
            raise NotImplementedError(
                f"model {self.model!r} needs a tokenizer.json next to model.onnx"
            )
        encs = self._tokenizer.encode_batch(list(texts))
        seq_len = self._seq_len()
        width = max(1, min(max(len(e.ids) for e in encs), seq_len))
        n = len(encs)
        ids = np.zeros((n, width), dtype=np.int64)
        mask = np.zeros((n, width), dtype=np.int64)
        types = np.zeros((n, width), dtype=np.int64)
        for i, e in enumerate(encs):
            L = min(len(e.ids), width)
            ids[i, :L] = e.ids[:L]
            mask[i, :L] = e.attention_mask[:L]
            tt = getattr(e, "type_ids", None)
            if tt:
                types[i, :L] = tt[:L]
        return ids, mask, types

    def process(self, texts: Sequence[str]) -> EmbeddingResult:
        import numpy as np

        from lantern_extras_spark.embeddings.pooling import pool

        if not texts:
            return EmbeddingResult([], 0)
        self._load()
        ids, mask, types = self._encode(texts)
        # reference processed_tokens = length of the concatenated padded id
        # vector (ort_runtime.rs:463-466) — padding included by design
        processed = int(ids.size)
        feed_all = {"input_ids": ids, "attention_mask": mask, "token_type_ids": types}
        input_names = [i.name for i in self._session.get_inputs()]
        if "attention_mask" not in input_names:
            raise ValueError(
                f"Could not get attention_mask from session inputs: {input_names}"
            )
        chunk = self.chunk_for_memory(
            len(texts), ids.shape[1], self.dim(), _free_memory_bytes()
        )
        strategy = self._pooling()
        out: list[list[float]] = []
        for lo in range(0, len(texts), chunk):
            feed = {k: v[lo : lo + chunk] for k, v in feed_all.items() if k in input_names}
            hidden = self._session.run(None, feed)[0]
            pooled = pool(strategy, np.asarray(hidden), mask[lo : lo + chunk])
            out.extend([[float(x) for x in row] for row in pooled])
        return EmbeddingResult(out, processed)


Transport = Callable[[str, Sequence[str], dict], list[list[float]]]


def echo_transport(model: str, texts: Sequence[str], params: dict) -> list[list[float]]:
    """Deterministic offline transport (params: {"transport": "echo"}): vector =
    [len(text), n_tokens, 0...]. Lets the full API-runtime path (packing, retry,
    alignment) run end-to-end in workers without network access."""
    dim = int(params.get("dimensions", 4))
    return [[float(len(t)), float(approx_token_count(t))] + [0.0] * (dim - 2) for t in texts]


def resolve_transport(params: dict) -> Transport | None:
    """Transports are resolvable by name through runtime_params so they survive
    serialization into executor python workers ('echo' built-in; 'module:attr'
    dotted path for custom endpoints)."""
    spec = params.get("transport")
    if spec is None or callable(spec):
        return spec
    if spec == "echo":
        return echo_transport
    if isinstance(spec, str) and ":" in spec:
        import importlib

        mod, attr = spec.split(":", 1)
        return getattr(importlib.import_module(mod), attr)
    raise ValueError(f"unresolvable transport spec {spec!r}")


def _retrying(call: Callable[[], list[list[float]]]) -> list[list[float]]:
    """Reference retry loop: 5 attempts, 4 s·(attempt+1) sleep (core/utils.rs:88-99)."""
    last: Exception | None = None
    for attempt in range(MAX_RETRIES):
        try:
            return call()
        except NotImplementedError:
            raise  # configuration problem, not a transient API failure
        except Exception as e:  # noqa: BLE001 — API errors are retryable by contract
            last = e
            if attempt < MAX_RETRIES - 1:
                time.sleep(BACKOFF_BASE_S * (attempt + 1) * float(_SLEEP_SCALE[0]))
    raise RuntimeError(f"embedding request failed after {MAX_RETRIES} retries: {last}") from last


_SLEEP_SCALE = [1.0]  # tests shrink this to avoid real sleeps


class OpenAIRuntime(BaseRuntime):
    """OpenAI-compatible embedding API runtime.

    Greedy token-budget packing: requests carry as many texts as fit in 8190
    estimated tokens (reference openai_runtime.rs:179-209). `dimensions` is only
    honored for v3 models (openai_runtime.rs:239-243 — preserved quirk).
    `transport(model, texts, params) -> vectors` is injectable; the default
    raises (no network in this environment).
    """

    name = "openai"

    def __init__(self, model: str, params: dict | None = None, transport: Transport | None = None):
        super().__init__(model, params)
        self.transport = transport or resolve_transport(self.params) or self._no_network
        # exact BPE counts by default — the cl100k role (openai_runtime.rs:50-66)
        self._count = token_counter(self.params.get("token_method", "bpe"))

    @staticmethod
    def _no_network(model: str, texts: Sequence[str], params: dict) -> list[list[float]]:
        raise NotImplementedError(
            "No network transport configured for OpenAIRuntime (STUB in this "
            "environment). Inject transport=... or use runtime='hash'."
        )

    def _request_params(self) -> dict:
        p = dict(self.params)
        # dimensions only for v3 models — reference quirk (openai_runtime.rs:239-243)
        if "dimensions" in p and "-3-" not in self.model:
            p.pop("dimensions")
        return p

    def pack_batches(self, texts: Sequence[str]) -> list[list[str]]:
        batches: list[list[str]] = []
        cur: list[str] = []
        cur_tokens = 0
        for t in texts:
            n = min(self._count(t), OPENAI_MAX_TOKENS_PER_REQUEST)
            if cur and cur_tokens + n > OPENAI_MAX_TOKENS_PER_REQUEST:
                batches.append(cur)
                cur, cur_tokens = [], 0
            cur.append(t)
            cur_tokens += n
        if cur:
            batches.append(cur)
        return batches

    def process(self, texts: Sequence[str]) -> EmbeddingResult:
        out: list[list[float]] = []
        tokens = 0
        params = self._request_params()
        for batch in self.pack_batches(texts):
            vecs = _retrying(lambda b=batch: self.transport(self.model, b, params))
            assert len(vecs) == len(batch), "transport must return one vector per input"
            out.extend(vecs)
            tokens += sum(self._count(t) for t in batch)
        return EmbeddingResult(out, tokens)


class CohereRuntime(BaseRuntime):
    """Cohere embedding API runtime: 96 inputs/request (cohere_runtime.rs:139);
    `input_type` defaults to 'search_query' on the scalar path — the job path
    passes 'search_document' (reference quirk, embeddings.rs:112 vs daemon.rs:165)."""

    name = "cohere"

    def __init__(self, model: str, params: dict | None = None, transport: Transport | None = None):
        super().__init__(model, params)
        self.params.setdefault("input_type", "search_query")
        self.transport = transport or resolve_transport(self.params) or OpenAIRuntime._no_network
        self._count = token_counter(self.params.get("token_method", "bpe"))

    def process(self, texts: Sequence[str]) -> EmbeddingResult:
        out: list[list[float]] = []
        tokens = 0
        for i in range(0, len(texts), COHERE_MAX_INPUTS_PER_REQUEST):
            batch = list(texts[i : i + COHERE_MAX_INPUTS_PER_REQUEST])
            vecs = _retrying(lambda b=batch: self.transport(self.model, b, self.params))
            assert len(vecs) == len(batch)
            out.extend(vecs)
            tokens += sum(self._count(t) for t in batch)
        return EmbeddingResult(out, tokens)


_RUNTIME_CLASSES = {
    "hash": HashRuntime,
    "ort": OrtRuntime,
    "openai": OpenAIRuntime,
    "cohere": CohereRuntime,
}

_RUNTIME_CACHE: dict[str, BaseRuntime] = {}


def get_runtime(runtime: str, model: str, params: dict | None = None) -> BaseRuntime:
    """Per-process runtime singleton (the executor-local model cache, U5)."""
    if runtime not in _RUNTIME_CLASSES:
        raise ValueError(f"unknown runtime {runtime!r}; expected {sorted(_RUNTIME_CLASSES)}")
    key = f"{runtime}|{model}|{json.dumps(params or {}, sort_keys=True)}"
    if key not in _RUNTIME_CACHE:
        _RUNTIME_CACHE[key] = _RUNTIME_CLASSES[runtime](model, params)
    return _RUNTIME_CACHE[key]
