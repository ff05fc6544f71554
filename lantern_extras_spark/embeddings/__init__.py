from lantern_extras_spark.embeddings.registry import MODEL_REGISTRY, default_batch_size, model_dim  # noqa: F401
from lantern_extras_spark.embeddings.runtimes import (  # noqa: F401
    EmbeddingResult,
    get_runtime,
    HashRuntime,
    OpenAIRuntime,
    CohereRuntime,
    OrtRuntime,
)
from lantern_extras_spark.embeddings.pipeline import (  # noqa: F401
    create_embeddings,
    embed_column,
    hash_embedding,
    ignore_filter,
    missing_filter,
    ERROR_SENTINEL,
)
