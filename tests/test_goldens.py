"""Golden-vector tests mirroring the reference's embedding test strategy
(lantern_cli/tests/text_embedding_test.rs, SURVEY.md §5.1):

- pinned expected vectors with a cosine-distance tolerance and EXACT token
  counts (reference asserts both);
- batch invariance: the same input repeated batch_size× yields the same vector
  in every slot (text_embedding_test.rs:135-152);
- mixed batches preserve row↔vector mapping (:154-158).

The model here is the deterministic hash runtime (real ONNX models are not in
this container); the test *shape* is the reference's, and these goldens pin the
hash model against accidental change — which would silently break every stored
embedding and the correctness oracle.
"""

import math

import pytest

from lantern_extras_spark.embeddings.pipeline import embed_column
from lantern_extras_spark.embeddings.runtimes import HashRuntime

# (input, exact token count, first 4 elements of the golden embedding)
GOLDENS = [
    ("Hello world!", 2, [-0.04954618, 0.96542835, -0.08116966, 0.07563853]),
    ("The weather is lovely today.", 5, [0.82305606, 0.6939615, 0.49340373, -0.12564378]),
]
COS_TOLERANCE = 0.01  # reference dense-model tolerance


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_golden_vectors_and_exact_tokens():
    rt = HashRuntime("hash/test-model")
    for text, n_tokens, head in GOLDENS:
        res = rt.process([text])
        assert res.processed_tokens == n_tokens  # exact, like the reference
        got = res.embeddings[0]
        assert len(got) == 16
        assert 1.0 - _cos(got[:4], head) < COS_TOLERANCE
        assert got[:4] == pytest.approx(head, abs=1e-7)


def test_batch_invariance():
    """Same input repeated batch× must give the same vector in each slot."""
    rt = HashRuntime("hash/test-model")
    res = rt.process(["Hello world!"] * 17)
    assert len(res.embeddings) == 17
    assert all(v == res.embeddings[0] for v in res.embeddings)
    assert res.processed_tokens == 2 * 17


def test_mixed_batch_row_vector_mapping(spark):
    """Mixed-input batches preserve the row↔vector pairing through the whole
    Spark pipeline (order alignment under Arrow batching)."""
    texts = [f"document number {i} body" for i in range(50)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    out = {r["id"]: r["e"] for r in embed_column(df, "t", "e").collect()}
    rt = HashRuntime("hash/test-model")
    for i in (0, 7, 23, 49):
        expect = rt.process([texts[i]]).embeddings[0]
        assert out[i] == pytest.approx(expect, abs=1e-6)
