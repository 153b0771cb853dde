from tdr.parallel.dense import (
    ShardedFlatIndex,
    build_sharded_flat_index,
    sharded_flat_search,
    sharded_flat_search_prf,
    sharded_row_to_doc,
)
from tdr.parallel.mesh import make_mesh, data_sharding, replicated
from tdr.parallel.pipeline import PipelinedCascade
from tdr.parallel.sharded import (
    ShardedSparseIndex,
    build_sharded_index,
    grid_score_topk,
    sharded_score_topk,
    spmd_global_stats,
    dp_score_topk,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "PipelinedCascade",
    "ShardedFlatIndex",
    "build_sharded_flat_index",
    "sharded_flat_search",
    "sharded_flat_search_prf",
    "sharded_row_to_doc",
    "ShardedSparseIndex",
    "build_sharded_index",
    "grid_score_topk",
    "sharded_score_topk",
    "spmd_global_stats",
    "dp_score_topk",
]
