"""Train the committed BPE mini-vocab (functions/bpe_vocab.txt) on a fixed,
in-repo corpus — run once, commit the output; counts stay reproducible forever
(no network, no external tokenizer files). 512 merges keeps the vocab small
while compressing common English + code text well below whitespace counts.
"""

from __future__ import annotations

from lantern_extras_spark.functions.bpe import VOCAB_PATH, save_merges, train_bpe

# Fixed training corpus: plain English prose + query/code-flavored text, the
# two text shapes the engine's documents tables carry. Edit = retrain = new
# vocab file = changed counts; golden tests pin the current file.
CORPUS = [
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm "
    "windowsill and the birds sing in the tall green trees beside the quiet river",
    "large scale data processing engines partition work across many executors and "
    "shuffle intermediate results between stages of the physical plan",
    "embedding vectors are arrays of floating point numbers produced by neural "
    "network models and compared with cosine or euclidean distance functions",
    "select count distinct from table where value greater than threshold group by "
    "key order by total descending limit ten",
    "the training corpus for a language model is deduplicated with minhash "
    "signatures and locality sensitive hashing before tokenization",
    "streaming jobs checkpoint their state so that failures resume exactly once "
    "without reprocessing committed batches",
    "documents contain words and punctuation, numbers like 12345 and 3.14, "
    "identifiers like doc_id and vec_id, and markers such as [IGNORE] or EMPTY.",
    "it's the user's job to choose a model; we'll measure throughput and they've "
    "agreed we're counting exact tokens, don't approximate.",
    "product quantization splits vectors into subvectors and assigns each to the "
    "nearest centroid of a codebook learned with k means clustering",
    "the daemon polls job tables on an interval, routes labels to runtimes, and "
    "records usage rows tokens failed created at into the ledger",
]

if __name__ == "__main__":
    merges = train_bpe(CORPUS, n_merges=512)
    save_merges(merges)
    print(f"wrote {len(merges)} merges to {VOCAB_PATH}")
