from tdr.index.build import (
    SparseIndex,
    IndexStats,
    build_index,
    compute_idf,
    build_tfidf_index,
    quantize_head,
)

__all__ = [
    "SparseIndex",
    "IndexStats",
    "build_index",
    "compute_idf",
    "build_tfidf_index",
    "quantize_head",
]
