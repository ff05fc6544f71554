"""Model registry — the Spark analog of the reference's ORT model table and
per-model default batch sizes.

Reference: model list `lantern_cli/src/embeddings/core/ort_runtime.rs:281-301`
(18 models: bge family, e5, gte, MiniLM, mpnet, jina v2, CLIP text+visual,
splade-v3, bge-m3); batch-size table `lantern_cli/src/embeddings/mod.rs:417-447`
(values reproduced in BASELINE.md). Model names and dimensions are public
(HuggingFace model cards).

`batch_size` here controls the Arrow batch fed to the inference pandas UDF —
the same role the reference's value plays for its inference chunks.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ModelSpec:
    name: str
    runtime: str  # ort | openai | cohere | hash
    dim: int
    batch_size: int
    seq_len: int = 512
    pooling: str = "mean"  # cls | mean | relu_log_max (splade sparse)
    sparse: bool = False


_SPECS = [
    # ORT (local ONNX) models — reference ort_runtime.rs:281-301, batch sizes mod.rs:417-447
    ModelSpec("clip/ViT-B-32-textual", "ort", 512, 2000, 77, "cls"),
    ModelSpec("clip/ViT-B-32-visual", "ort", 512, 50, 224, "cls"),
    ModelSpec("BAAI/bge-small-en", "ort", 384, 300, 512, "cls"),
    ModelSpec("BAAI/bge-base-en", "ort", 768, 100, 512, "cls"),
    ModelSpec("BAAI/bge-large-en", "ort", 1024, 60, 512, "cls"),
    ModelSpec("BAAI/bge-m3", "ort", 1024, 100, 8192, "cls"),
    ModelSpec("jinaai/jina-embeddings-v2-small-en", "ort", 512, 500, 8192, "mean"),
    ModelSpec("jinaai/jina-embeddings-v2-base-en", "ort", 768, 80, 8192, "mean"),
    ModelSpec("intfloat/e5-base-v2", "ort", 768, 300, 512, "mean"),
    ModelSpec("intfloat/e5-large-v2", "ort", 1024, 100, 512, "mean"),
    ModelSpec("llmrails/ember-v1", "ort", 1024, 100, 512, "mean"),
    ModelSpec("thenlper/gte-base", "ort", 768, 1000, 512, "mean"),
    ModelSpec("thenlper/gte-large", "ort", 1024, 800, 512, "mean"),
    ModelSpec("microsoft/all-MiniLM-L12-v2", "ort", 384, 1000, 512, "mean"),
    ModelSpec("naver/splade-v3", "ort", 30522, 150, 512, "relu_log_max", sparse=True),
    ModelSpec("sentence-transformers/all-mpnet-base-v2", "ort", 768, 400, 512, "mean"),
    ModelSpec("sentence-transformers/multi-qa-mpnet-base-dot-v1", "ort", 768, 300, 512, "mean"),
    # API runtimes — openai 500/row batches, cohere 5000 (reference mod.rs:417-447)
    ModelSpec("openai/text-embedding-ada-002", "openai", 1536, 500, 8191),
    ModelSpec("openai/text-embedding-3-small", "openai", 1536, 500, 8191),
    ModelSpec("openai/text-embedding-3-large", "openai", 3072, 500, 8191),
    ModelSpec("cohere/embed-english-v3.0", "cohere", 1024, 5000, 512),
    ModelSpec("cohere/embed-multilingual-v3.0", "cohere", 1024, 5000, 512),
    # Deterministic test model (this engine only): portable md5-based embedding
    ModelSpec("hash/test-model", "hash", 16, 10000, 10**9),
]

MODEL_REGISTRY: dict[str, ModelSpec] = {s.name: s for s in _SPECS}

DEFAULT_BATCH_SIZE = 100  # reference fallback, mod.rs:446


def model_dim(model: str, default: int = 16) -> int:
    spec = MODEL_REGISTRY.get(model)
    return spec.dim if spec else default


def default_batch_size(model: str) -> int:
    spec = MODEL_REGISTRY.get(model)
    return spec.batch_size if spec else DEFAULT_BATCH_SIZE


def get_available_models(runtime: str = "ort") -> list[str]:
    """Reference X7 `get_available_models` (lantern_extras/src/embeddings.rs:152-165)."""
    return [s.name for s in _SPECS if s.runtime == runtime]


def get_available_runtimes() -> list[str]:
    """Reference X8 (embeddings.rs:167-172) plus this engine's 'hash' runtime."""
    return ["ort", "openai", "cohere", "hash"]
