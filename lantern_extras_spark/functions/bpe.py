"""Vendored byte-level BPE tokenizer — exact, deterministic token counts.

The reference's usage ledger and request packing count *exact* tokenizer
tokens (HF tokenizer for ORT models, tiktoken cl100k_base for OpenAI —
lantern_cli/src/embeddings/core/openai_runtime.rs:50-66; exact counts asserted
in lantern_cli/tests/text_embedding_test.rs:88). Neither tokenizer stack is
installable in this environment, so this module vendors the *algorithm* —
byte-level BPE with a GPT-2-style pre-tokenizer — over a committed mini-vocab
(`bpe_vocab.txt`, trained once by tools/train_bpe_vocab.py on a fixed corpus,
no network). Counts are exact and reproducible w.r.t. that vocab: the same
role cl100k plays for the reference, at mini scale.

Pure Python, no dependencies; for bulk DataFrame counting use
`bpe_token_count_col` (Arrow-batched pandas UDF) — the per-text encode is
O(len·merges) and must not run row-at-a-time on the JVM side.
"""

from __future__ import annotations

import re
from functools import lru_cache
from pathlib import Path

# GPT-2's published pre-tokenization pattern (contractions, letter runs,
# digit runs, punctuation runs, whitespace) — public knowledge.
PRETOKEN_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)

VOCAB_PATH = Path(__file__).with_name("bpe_vocab.txt")


def train_bpe(corpus: list[str], n_merges: int) -> list[tuple[int, int]]:
    """Standard BPE training: start from raw bytes, repeatedly merge the most
    frequent adjacent token pair. Deterministic: ties break on the smaller
    (left, right) id pair. Returns the merge list (rank = position); merged
    pair (a, b) becomes token id 256 + rank."""
    words: dict[tuple[int, ...], int] = {}
    for text in corpus:
        for tok in PRETOKEN_RE.findall(text):
            seq = tuple(tok.encode("utf-8"))
            words[seq] = words.get(seq, 0) + 1

    merges: list[tuple[int, int]] = []
    for rank in range(n_merges):
        pairs: dict[tuple[int, int], int] = {}
        for seq, n in words.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        new_id = 256 + rank
        merged: dict[tuple[int, ...], int] = {}
        for seq, n in words.items():
            out: list[int] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            t = tuple(out)
            merged[t] = merged.get(t, 0) + n
        words = merged
        merges.append(best)
    return merges


class Bpe:
    """Byte-level BPE encoder over a merge list."""

    def __init__(self, merges: list[tuple[int, int]]):
        self.merges = list(merges)
        self.ranks = {pair: i for i, pair in enumerate(self.merges)}
        # id → bytes, for decode / vocab introspection
        self.vocab: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
        for i, (a, b) in enumerate(self.merges):
            self.vocab[256 + i] = self.vocab[a] + self.vocab[b]

    def _encode_word(self, seq: tuple[int, ...]) -> tuple[int, ...]:
        ids = list(seq)
        while len(ids) > 1:
            best_rank, best_pos = None, None
            for i, pair in enumerate(zip(ids, ids[1:])):
                r = self.ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pos = r, i
            if best_rank is None:
                break
            new_id = 256 + best_rank
            pair = (ids[best_pos], ids[best_pos + 1])
            out: list[int] = []
            i = 0
            while i < len(ids):
                if i + 1 < len(ids) and (ids[i], ids[i + 1]) == pair:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(ids[i])
                    i += 1
            ids = out
        return tuple(ids)

    @lru_cache(maxsize=65536)
    def _encode_word_cached(self, seq: tuple[int, ...]) -> tuple[int, ...]:
        return self._encode_word(seq)

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for tok in PRETOKEN_RE.findall(text):
            ids.extend(self._encode_word_cached(tuple(tok.encode("utf-8"))))
        return ids

    def decode(self, ids: list[int]) -> str:
        return b"".join(self.vocab[i] for i in ids).decode("utf-8", errors="replace")

    def count(self, text: str) -> int:
        return len(self.encode(text))


def save_merges(merges: list[tuple[int, int]], path: Path = VOCAB_PATH) -> None:
    path.write_text("\n".join(f"{a} {b}" for a, b in merges) + "\n")


def load_merges(path: Path | None = None) -> list[tuple[int, int]]:
    """Load the merge list. With no path, reads the committed vocab through
    importlib.resources so it works when the package ships to executors as a
    zip (addPyFile) — a plain filesystem read would fail inside the archive."""
    if path is None:
        from importlib import resources

        text = resources.files("lantern_extras_spark.functions").joinpath("bpe_vocab.txt").read_text()
    else:
        text = Path(path).read_text()
    merges = []
    for line in text.splitlines():
        line = line.strip()
        if line:
            a, b = line.split()
            merges.append((int(a), int(b)))
    return merges


@lru_cache(maxsize=1)
def default_bpe() -> Bpe:
    """The committed mini-vocab tokenizer (process-wide singleton)."""
    return Bpe(load_merges())


def bpe_token_count(text: str) -> int:
    """Exact token count under the committed mini-vocab — the usage-ledger and
    request-packing counter (reference counts cl100k/HF tokens here)."""
    return default_bpe().count(text)


@lru_cache(maxsize=8)
def _bpe_for(merges_key: tuple[tuple[int, int], ...]) -> "Bpe":
    """Per-process encoder cache for trained merge tables: one Bpe instance
    per distinct vocab per executor, however many Arrow batches flow through."""
    return Bpe(list(merges_key))


def bpe_token_count_col(col, merges: list[tuple[int, int]] | None = None):
    """Arrow-batched pandas UDF: exact BPE token count of a string column.

    With `merges=None` counts under the committed mini-vocab; pass a merge
    table from `train_bpe_on_corpus` to count under a corpus-trained vocab —
    the exact-token bridge `pack_sequences(counter="exact")` budgets with
    (reference posture: exact cl100k/HF counts drive request packing,
    text_embedding_test.rs:88)."""
    from pyspark.sql.functions import pandas_udf

    merges_key = tuple((int(a), int(b)) for a, b in merges) if merges is not None else None

    @pandas_udf("int")
    def _count(s):
        enc = default_bpe() if merges_key is None else _bpe_for(merges_key)
        return s.map(lambda t: enc.count(t) if t is not None else None)

    return _count(col)


def train_bpe_on_corpus(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 500,
    sample_docs: int = 10_000,
    salt: str = "bpe",
    n_rows: int | None = None,
) -> list[tuple[int, int]]:
    """Train a BPE merge table on a DataFrame corpus via a deterministic
    hash sample — the distributed bridge to `train_bpe`.

    Tokenizer training is the one corpus-wide step real pipelines run on a
    SAMPLE by design: merge statistics converge long before corpus scale
    (GPT-2's vocab came from ~40 GB; a 100 TB corpus adds nothing but cost),
    so the scale-correct shape is "bounded deterministic sample → exact
    driver-side training", not an n_merges-round distributed pair-count loop.

    Determinism end to end: rows are kept where hash32(salt:id) < p·2³²
    (same keyed-sample contract as `sampled_percentiles` — rerun-stable,
    partitioning-independent), and `train_bpe`'s word-frequency accumulation
    is order-insensitive with total tie-breaking, so the SAME corpus always
    yields the SAME merge list on any cluster layout. Collect volume is
    bounded by `sample_docs` documents.

    Returns the merge list for `Bpe(merges)`; persist with `save_merges`.
    """
    from pyspark.sql import functions as F

    from lantern_extras_spark.functions.hashing import hash32

    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if sample_docs < 1:
        raise ValueError("sample_docs must be >= 1")
    n = n_rows if n_rows is not None else df.count()
    thresh = min(1.0, float(sample_docs) / max(n, 1)) * 4294967296.0
    h = hash32(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    texts = [
        r[0]
        for r in df.where(h.cast("double") < F.lit(thresh))
        .select(F.col(text_col))
        .collect()
        if r[0]
    ]
    return train_bpe(texts, n_merges)
