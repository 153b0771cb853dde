from tdr.ops.score import (
    score_batch,
    score_and_topk,
    score_and_topk_fused,
    score_pairs,
    topk_language_filtered,
    topk_masked,
)

__all__ = [
    "score_batch",
    "score_and_topk",
    "score_and_topk_fused",
    "score_pairs",
    "topk_language_filtered",
    "topk_masked",
]
