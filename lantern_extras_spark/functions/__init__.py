from lantern_extras_spark.functions.vector import (  # noqa: F401
    cos_dist,
    cos_sim,
    hamming_dist,
    inner_product,
    l2_dist,
    l2sq_dist,
    vector_norm,
    vector_checksum,
)
from lantern_extras_spark.functions.hashing import hash32, hash_unit  # noqa: F401
from lantern_extras_spark.functions.url import (  # noqa: F401
    canonicalize_url,
    url_domain,
    url_host,
)
from lantern_extras_spark.functions.text import (  # noqa: F401
    bpe_ish_token_count,
    char_ngrams,
    clean_text,
    normalize_for_matching,
    punct_ratio,
    redact_pii,
    token_count,
    tokens,
    uniq_token_ratio,
    word_ngrams,
)
