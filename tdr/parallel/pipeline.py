"""True pipeline parallelism across mesh subsets (SURVEY.md §2c "Pipeline
parallelism").

The reference's cascades run stage-1-then-stage-2 on one processor with a
host hop between stages (cosine→BM25:
cosine_similarity_bm25_reranking.py:228-236; sentence-BM25→LM:
team_run1.py:173-295).  ``tdr.rank.cascade`` already fuses both stages
into ONE dispatch on one chip; this module is the multi-chip form: the
candidate index lives on one device group, the re-rank index on another,
and query batches FLOW through the two stages —

    t:      stage1(b0) | stage1(b1) | stage1(b2) | ...
                        stage2(b0)  | stage2(b1) | stage2(b2)

Under jax's async dispatch this overlap needs no explicit scheduling: each
stage's computations are enqueued on ITS devices, the only cross-stage
dependency is batch i's small (Q, C) candidate set (moved device-to-device
with `jax.device_put`, itself async), so stage-2 of batch i runs on group
B while group A scores batch i+1.  The host never blocks until the final
result gather.

This is the deployment shape for a serving pod: the wide candidate scan
(large index, bandwidth-bound) scales over its own devices while the
re-rank (compute-light, latency-bound) rides separate ones.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from tdr.models.sparse import SparseModel
from tdr.ops.score import score_and_topk_fused
from tdr.rank.cascade import rerank_pairs_topk
from tdr.text.preprocess import Preprocessor


@dataclass
class PipelinedCascade:
    """Two-stage cascade with each stage pinned to its own device group.

    ``cand_model`` / ``rank_model`` must index the same doc partition (same
    docid order).  Their index pytrees are placed on ``stage1_device`` /
    ``stage2_device`` at construction; per retrieve, batches are dispatched
    round-robin through both stages before any result is collected.
    """

    cand_model: SparseModel
    rank_model: SparseModel
    stage1_device: object
    stage2_device: object
    candidates: int = 200
    query_batch: int = 128
    preprocessor: Preprocessor = field(
        default_factory=lambda: Preprocessor("best"))

    def __post_init__(self) -> None:
        assert self.cand_model.docids == self.rank_model.docids, (
            "cascade stages must index the same doc partition")
        self._idx1 = jax.device_put(self.cand_model.index, self.stage1_device)
        self._idx2 = jax.device_put(self.rank_model.index, self.stage2_device)

    def retrieve(self, queries: Sequence[str], lang: str, k: int = 10
                 ) -> List[List[str]]:
        """Top-k docids per query; stage-2 of batch i overlaps stage-1 of
        batch i+1 across the two device groups."""
        pp = self.preprocessor
        toks = [pp(q, lang) for q in queries]
        C = min(self.candidates, self.cand_model.index.n_docs)
        k_eff = min(k, C)
        B = self.query_batch

        pending = []
        for s in range(0, len(toks), B):
            chunk = toks[s:s + B]
            n = len(chunk)
            if n < B:
                chunk = chunk + [[]] * (B - n)
            # encode against each stage's vocab (they may differ)
            qids1, qw1 = self.cand_model.encode_query_tokens(chunk)
            qids2, qw2 = self.rank_model.encode_query_tokens(chunk)

            # stage 1 on group A: wide top-C candidate scan (computation
            # follows its arguments' placement); tail engine resolved per
            # index — each stage's index has its own DMA-padding guarantee
            v1, rows = score_and_topk_fused(
                self._idx1,
                jax.device_put(qids1, self.stage1_device),
                jax.device_put(qw1, self.stage1_device),
                top_k=C, tail_budget=self.cand_model.tail_budget,
                tail_engine=self.cand_model._resolved_tail_engine())

            # ship ONLY the small (B, C) candidate set to group B (async)
            v1_b = jax.device_put(v1, self.stage2_device)
            rows_b = jax.device_put(rows, self.stage2_device)

            # stage 2 on group B: exact re-rank of the candidates
            vals, out_rows = rerank_pairs_topk(
                self._idx2,
                jax.device_put(qids2, self.stage2_device),
                jax.device_put(qw2, self.stage2_device),
                rows_b, v1_b, k_eff,
                tail_budget=self.rank_model.tail_budget,
                tail_engine=self.rank_model._resolved_tail_engine())
            pending.append((s, n, vals, out_rows))

        # ONE packed device->host transfer for all batches (per-batch
        # np.asarray is a serialized RPC round trip per call — the exact
        # pattern router._gather_pending exists to avoid)
        from tdr.rank.router import _gather_pending

        results: List[List[str]] = [[] for _ in toks]
        if pending:
            vals_all, rows_all = _gather_pending(
                [p[2] for p in pending], [p[3] for p in pending])
            for i, (s, n, _, _) in enumerate(pending):
                for j in range(n):
                    results[s + j] = [
                        self.rank_model.docids[r]
                        for r, v in zip(rows_all[i][j], vals_all[i][j])
                        if np.isfinite(v)
                    ]
        return results
