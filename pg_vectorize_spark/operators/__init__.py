from pg_vectorize_spark.operators.search import (
    semantic_search,
    full_text_search,
    hybrid_search,
)

__all__ = ["semantic_search", "full_text_search", "hybrid_search"]
