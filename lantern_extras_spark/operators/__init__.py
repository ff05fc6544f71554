from lantern_extras_spark.operators.knn import knn_join, topk, ground_truth, recall  # noqa: F401
from lantern_extras_spark.operators.dedup import (  # noqa: F401
    decontaminate,
    dedup_clusters,
    dedup_paragraphs,
    dedup_paragraphs_within,
    dedup_spans,
    embedding_neardup_pairs,
    dedup_keep_best,
    exact_dedup,
    band_keys,
    lsh_candidate_pairs,
    lsh_tune,
    minhash_signatures,
    minhash_dedup,
    minhash_dedup_incremental,
    ngram_jaccard_pairs,
    simhash,
)
from lantern_extras_spark.operators.hnsw import (  # noqa: F401
    build_hnsw_shards,
    create_external_index,
    hnsw_topk,
    hnsw_topk_batch,
    reindex_external_index,
)
from lantern_extras_spark.operators.textstats import (  # noqa: F401
    bigram_logprob_score,
    chunk_documents,
    gopher_filter,
    language_id,
    quality_metrics,
    repetition_stats,
    corpus_report,
    distinct_ngram_ratio,
    pii_stats,
    label_by_keywords,
    strip_boilerplate_lines,
    unigram_logprob_score,
    vocab_coverage,
)
from lantern_extras_spark.operators.sampling import (  # noqa: F401
    hash_split,
    mixture_weights,
    pack_sequences,
    pack_sequences_concat,
    quota_sample,
    resample_mixture,
    stratified_take,
    temperature_weights,
    weighted_reservoir,
)
from lantern_extras_spark.operators.sketches import (  # noqa: F401
    cms_build,
    cms_estimate,
    cms_merge,
    hll_build,
    hll_estimate,
    hll_merge,
    bottomk_sample,
    bottomk_merge,
    bottomk_percentiles,
)
from lantern_extras_spark.operators.selection import (  # noqa: F401
    bucket_profile,
    corpus_divergence,
    dsir_log_weights,
    dsir_select,
    hashed_ngram_buckets,
)
from lantern_extras_spark.operators.pq import build_codebook, quantize, adc_topk, decode  # noqa: F401
from lantern_extras_spark.operators.autotune import autotune_pq, AutotuneResults, select_best  # noqa: F401
from lantern_extras_spark.operators.ivf import build_ivf, ivf_topk, assign_cells  # noqa: F401
from lantern_extras_spark.operators.temporal import asof_join, range_join  # noqa: F401
from lantern_extras_spark.operators.sq import (  # noqa: F401
    sq8_encode,
    sq8_knn_join,
    sq8_pack,
    sq8_recall_vs_exact,
    sq8_topk,
    sq8_train,
    sq8_unpack,
)
