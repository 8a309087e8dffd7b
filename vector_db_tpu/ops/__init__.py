from vector_db_tpu.ops.distance import (
    l2_sq,
    l2_sq_pairwise,
    cosine_distance_pairwise,
    squared_norms,
)
from vector_db_tpu.ops.topk import masked_top_k_smallest
from vector_db_tpu.ops.exact import exact_search, exact_search_tiled

__all__ = [
    "l2_sq",
    "l2_sq_pairwise",
    "cosine_distance_pairwise",
    "squared_norms",
    "masked_top_k_smallest",
    "exact_search",
    "exact_search_tiled",
]
