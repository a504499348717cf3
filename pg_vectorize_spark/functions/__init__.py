from pg_vectorize_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
    embed_expr,
    query_vector_lit,
)
from pg_vectorize_spark.functions.text import (
    tokens_expr,
    token_count_expr,
    fts_score_expr,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "embed_expr",
    "query_vector_lit",
    "tokens_expr",
    "token_count_expr",
    "fts_score_expr",
]
