"""Pooling strategy semantics pinned against hand-computed fixtures
(reference PoolingStrategy, ort_runtime.rs:30-131)."""

import numpy as np
import pytest

from lantern_extras_spark.embeddings import pooling as P
from lantern_extras_spark.embeddings.registry import MODEL_REGISTRY


# batch=2, seq=3, dim=2
HIDDEN = np.array(
    [
        [[1.0, -2.0], [3.0, 4.0], [5.0, -6.0]],
        [[0.5, 0.5], [-1.0, 2.0], [9.0, 9.0]],  # row 2 token 3 is padding
    ],
    dtype=np.float32,
)
MASK = np.array([[1, 1, 1], [1, 1, 0]], dtype=np.int64)


def test_cls_pool_takes_first_token():
    out = P.cls_pool(HIDDEN)
    assert out.tolist() == [[1.0, -2.0], [0.5, 0.5]]


def test_mean_pool_respects_mask():
    out = P.mean_pool(HIDDEN, MASK)
    assert out[0] == pytest.approx([(1 + 3 + 5) / 3, (-2 + 4 - 6) / 3])
    # padded token 3 of row 2 is excluded from sum AND count
    assert out[1] == pytest.approx([(0.5 - 1.0) / 2, (0.5 + 2.0) / 2])


def test_mean_pool_fully_masked_row_is_finite():
    out = P.mean_pool(HIDDEN, np.zeros_like(MASK))
    assert np.isfinite(out).all() and np.abs(out).max() < 1e-3  # ~0, never NaN


def test_relu_log_max_pool():
    out = P.relu_log_max_pool(HIDDEN, MASK)
    # col 0 row 0: max(ln(1+1), ln(1+3), ln(1+5)) ; negatives relu to ln(1)=0
    assert out[0] == pytest.approx([np.log(6.0), np.log(5.0)])
    # row 1: padded 9.0 token zeroed by the mask; max is ln(1+0.5), ln(1+2)
    assert out[1] == pytest.approx([np.log(1.5), np.log(3.0)])


def test_pool_dispatch_matches_registry():
    assert P.pool("cls", HIDDEN).shape == (2, 2)
    assert P.pool("mean", HIDDEN, MASK).shape == (2, 2)
    assert P.pool("relu_log_max", HIDDEN, MASK).shape == (2, 2)
    with pytest.raises(ValueError, match="attention mask"):
        P.pool("mean", HIDDEN)
    with pytest.raises(ValueError, match="unknown pooling"):
        P.pool("max", HIDDEN, MASK)
    # every pooling value in the registry is executable
    for spec in MODEL_REGISTRY.values():
        P.pool(spec.pooling, HIDDEN, MASK)
