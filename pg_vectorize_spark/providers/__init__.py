from pg_vectorize_spark.providers.base import EmbeddingProvider, ChatProvider
from pg_vectorize_spark.providers.registry import (
    Model,
    ModelSource,
    parse_model,
    get_provider,
)
from pg_vectorize_spark.providers.local import LocalHashEmbedder

__all__ = [
    "EmbeddingProvider",
    "ChatProvider",
    "Model",
    "ModelSource",
    "parse_model",
    "get_provider",
    "LocalHashEmbedder",
]
