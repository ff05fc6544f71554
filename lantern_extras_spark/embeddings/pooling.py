"""Pooling strategies: token-level hidden states → one vector per text.

Numpy ports of the reference's PoolingStrategy (lantern_cli/src/embeddings/
core/ort_runtime.rs:30-131) — executable and tested here even though the ONNX
inference that produces the hidden states is env-blocked (no onnxruntime in
this container). When a real ORT stack is present, OrtRuntime feeds its
`last_hidden_state` (batch × seq × dim) and attention mask straight into
`pool()`; until then these functions are pinned by fixture tests so the
numeric semantics can't drift.

Semantics (bit-faithful to the reference):
- cls: hidden[:, 0, :] — the [CLS] token row (ort_runtime.rs:72-84).
- mean: attention-masked token mean; denominator clamped to ≥1e-9, so a fully
  masked row yields ~0-vectors, not NaN (ort_runtime.rs:86-114).
- relu_log_max: SPLADE sparse pooling — ln(1 + relu(x)), multiplied by the
  mask, max over the sequence axis (ort_runtime.rs:37-70). NOTE the reference
  masks AFTER the log transform and maxes with a −inf identity, so masked
  positions contribute 0 (not −inf) because the mask multiply zeroes them —
  reproduced exactly, including the all-masked row giving the max of zeros.
"""

from __future__ import annotations

import numpy as np

POOLING_STRATEGIES = ("cls", "mean", "relu_log_max")


def cls_pool(hidden: np.ndarray) -> np.ndarray:
    """(batch, seq, dim) → (batch, dim): first-token row."""
    return np.asarray(hidden)[:, 0, :]


def mean_pool(hidden: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
    """Masked token mean; denominator clamped at 1e-9 like the reference."""
    h = np.asarray(hidden, dtype=np.float32)
    m = np.asarray(attention_mask, dtype=np.float32)[:, :, None]
    summed = (h * m).sum(axis=1)
    counts = np.maximum(m.sum(axis=1), 1e-9)
    return summed / counts


def relu_log_max_pool(hidden: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
    """SPLADE pooling: max over seq of mask · ln(1 + relu(x))."""
    h = np.asarray(hidden, dtype=np.float32)
    m = np.asarray(attention_mask, dtype=np.float32)[:, :, None]
    transformed = np.log1p(np.maximum(h, 0.0)) * m
    return transformed.max(axis=1)


def pool(strategy: str, hidden: np.ndarray, attention_mask: np.ndarray | None = None) -> np.ndarray:
    """Dispatch by ModelSpec.pooling (registry.py); mirrors PoolingStrategy::pool."""
    if strategy == "cls":
        return cls_pool(hidden)
    if attention_mask is None:
        raise ValueError(f"pooling {strategy!r} requires an attention mask")
    if strategy == "mean":
        return mean_pool(hidden, attention_mask)
    if strategy == "relu_log_max":
        return relu_log_max_pool(hidden, attention_mask)
    raise ValueError(f"unknown pooling strategy {strategy!r}; expected one of {POOLING_STRATEGIES}")
