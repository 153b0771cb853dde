from tdr.parallel.mesh import make_mesh, data_sharding, replicated
from tdr.parallel.pipeline import PipelinedCascade
from tdr.parallel.sharded import (
    ShardedSparseIndex,
    build_sharded_index,
    sharded_score_topk,
    spmd_global_stats,
    dp_score_topk,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "PipelinedCascade",
    "ShardedSparseIndex",
    "build_sharded_index",
    "sharded_score_topk",
    "spmd_global_stats",
    "dp_score_topk",
]
