"""Cascade retrieval: candidate generation → re-ranking.

Reproduces the reference's hybrid pipelines (SURVEY.md §2a):
* cosine → BM25 re-rank: top-C cosine candidates, BM25-score each, keep
  top-k (cosine_similarity_bm25_reranking.py:228-236, C=200).
* generic two-stage form also covers BM25 → dense-LM re-rank
  (team_run1.py:173-295) once the dense model lands.

On TPU the cascade is: stage-1 ``score_and_topk`` with k=C (wide top-k),
stage-2 ``score_pairs`` (binary-search CSR lookups) over the (Q, C)
candidate matrix, final ``lax.top_k`` — no host round-trip between stages
beyond the orchestration loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tdr.models.sparse import SparseModel
from tdr.ops.score import (
    NEG_INF,
    score_and_topk_fused,
    score_candidates_fused,
    score_pairs,
)
from tdr.text.preprocess import Preprocessor


@partial(jax.jit, static_argnames=("C", "k", "tail_budget", "cand_engine",
                                   "rank_engine"))
def cascade_score_topk(
    cand_index, rank_index,
    qids1: jnp.ndarray, qw1: jnp.ndarray,      # stage-1 encoding (cand vocab)
    qids2: jnp.ndarray, qw2: jnp.ndarray,      # stage-2 encoding (rank vocab)
    C: int, k: int, tail_budget: int,
    cand_engine: str = "xla", rank_engine: str = "xla",
):
    """Both cascade stages in ONE device dispatch (no host hop between
    stages): wide fused top-C candidates → fused candidate re-score →
    final top-k.  The reference runs stage-1-then-stage-2 with a host round
    trip (cosine_similarity_bm25_reranking.py:228-236).

    The tail engine is resolved PER INDEX (``pallas_tail_available`` checks
    each index's DMA-padding invariant — a freshly built candidate index
    must not drag a legacy checkpointed rank index onto the segment-DMA
    path)."""
    vals1, cand_rows = score_and_topk_fused(
        cand_index, qids1, qw1, top_k=C, tail_budget=tail_budget,
        tail_engine=cand_engine)
    return rerank_pairs_topk(rank_index, qids2, qw2, cand_rows, vals1,
                             min(k, C), tail_budget=tail_budget,
                             tail_engine=rank_engine)


@partial(jax.jit, static_argnames=("k", "tail_budget", "tail_engine",
                                   "exact_pairs"))
def rerank_pairs_topk(
    rank_index, qids2: jnp.ndarray, qw2: jnp.ndarray,
    cand_rows: jnp.ndarray, vals1: jnp.ndarray, k: int,
    tail_budget: int = 2048, tail_engine: str = "xla",
    exact_pairs: bool = False,
):
    """Stage-2 alone: re-rank explicit candidate rows + final top-k.  Split
    out so the mesh-subset pipeline (tdr.parallel.pipeline) can run it on
    its own device group.

    Default engine is ``score_candidates_fused`` (head matmul + compacted-
    tail candidate match — the binary-search pair scorer's per-step gathers
    measured ~0.9 s per 256-query batch and dominated the cascade);
    ``exact_pairs=True`` keeps the f32-exact binary-search scorer."""
    if exact_pairs:
        re_scores = score_pairs(rank_index, qids2, qw2, cand_rows)
    else:
        re_scores = score_candidates_fused(
            rank_index, qids2, qw2, cand_rows,
            tail_budget=tail_budget, tail_engine=tail_engine)
    re_scores = jnp.where(jnp.isfinite(vals1), re_scores, NEG_INF)
    vals, sel = jax.lax.top_k(re_scores, k)
    rows = jnp.take_along_axis(cand_rows, sel, axis=1)
    return vals, rows


def _engine_of(model) -> str:
    """The model's OWN resolved tail engine (availability is per index)."""
    return (model._resolved_tail_engine()
            if hasattr(model, "_resolved_tail_engine") else "xla")


@dataclass
class CascadeRetriever:
    """Two-stage retrieve: candidate_models[lang] → rerank_models[lang]."""

    candidate_models: Dict[str, SparseModel]
    rerank_models: Dict[str, SparseModel]
    candidates: int = 200
    preprocessor: Preprocessor = field(default_factory=lambda: Preprocessor("best"))
    query_batch: int = 128
    default_lang: str = "en"

    def _group(self, langs: Sequence[str]) -> Dict[str, List[int]]:
        groups: Dict[str, List[int]] = {}
        for i, lang in enumerate(langs):
            key = lang if lang in self.candidate_models else self.default_lang
            groups.setdefault(key, []).append(i)
        return groups

    def _tokenize(self, queries: Sequence[str], q_idx: Sequence[int],
                  lang: str) -> List[List[str]]:
        """Native batch tokenization for the default pipeline (same policy
        as LanguageRouter._tokenize — query preprocessing dominated the
        cascade wall clock at full-corpus scale on the Python path)."""
        if self.preprocessor.spec.name == "best":
            from tdr.text.fast import fast_available

            if fast_available():
                from tdr.text.fast import fast_tokenize_texts

                return fast_tokenize_texts([queries[i] for i in q_idx], lang)
        return [self.preprocessor(queries[i], lang) for i in q_idx]

    def retrieve(
        self, queries: Sequence[str], langs: Sequence[str], k: int = 10
    ) -> List[List[str]]:
        from tdr.rank.router import _gather_pending

        results: List[Optional[List[str]]] = [None] * len(queries)
        # phase 1: dispatch every batch asynchronously (host tokenization of
        # later chunks overlaps device scoring of earlier ones); phase 2:
        # pull ALL batch results in one packed device→host transfer —
        # per-batch np.asarray syncs are full RPC round trips on remote
        # backends (same dispatch economics as LanguageRouter)
        pending = []   # (rank_model, sel, vals_dev, rows_dev, n_chunk)
        for lang, q_idx in self._group(langs).items():
            cand_m = self.candidate_models[lang]
            rank_m = self.rerank_models[lang]
            assert cand_m.docids == rank_m.docids, (
                "cascade stages must index the same doc partition"
            )
            toks = self._tokenize(queries, q_idx, lang)
            pipelined = hasattr(cand_m, "index") and hasattr(rank_m, "index")
            n_docs = (cand_m.index.n_docs if hasattr(cand_m, "index")
                      else cand_m.sindex.n_docs)
            C = min(self.candidates, n_docs)
            for s in range(0, len(q_idx), self.query_batch):
                sel = q_idx[s : s + self.query_batch]
                chunk = toks[s : s + self.query_batch]
                n_chunk = len(chunk)
                if n_chunk < self.query_batch:
                    chunk = chunk + [[]] * (self.query_batch - n_chunk)
                if pipelined:
                    # both stages in one device dispatch
                    qids1, qw1 = cand_m.encode_query_tokens(chunk)
                    qids2, qw2 = rank_m.encode_query_tokens(chunk)
                    vals, rows = cascade_score_topk(
                        cand_m.index, rank_m.index, qids1, qw1, qids2, qw2,
                        C=C, k=min(k, C),
                        tail_budget=getattr(cand_m, "tail_budget", 1024),
                        cand_engine=_engine_of(cand_m),
                        rank_engine=_engine_of(rank_m))
                    pending.append((rank_m, sel, vals, rows, n_chunk))
                    continue
                # fallback (e.g. sharded stage-1 model): two dispatches
                _, cand_rows = cand_m.topk_tokens(chunk, C)
                re_scores = rank_m.score_candidates_tokens(chunk, cand_rows)
                cand_rows, re_scores = cand_rows[:n_chunk], re_scores[:n_chunk]
                order = np.argsort(-re_scores, axis=1, kind="stable")[:, :k]
                for j, (rows, o) in zip(sel, zip(cand_rows, order)):
                    results[j] = [rank_m.docids[rows[c]] for c in o]
        # one packed gather per distinct (B, k) result shape (a partition
        # smaller than k yields a narrower top-k and cannot stack with the
        # rest)
        by_shape: Dict[tuple, List[int]] = {}
        for i, p in enumerate(pending):
            by_shape.setdefault(tuple(p[2].shape), []).append(i)
        for idxs in by_shape.values():
            vals_all, rows_all = _gather_pending(
                [pending[i][2] for i in idxs], [pending[i][3] for i in idxs])
            for g, i in enumerate(idxs):
                rank_m, sel, _, _, n = pending[i]
                for j, (rr, vv) in zip(sel, zip(rows_all[g][:n],
                                                vals_all[g][:n])):
                    results[j] = [rank_m.docids[r]
                                  for r, v in zip(rr, vv) if np.isfinite(v)]
        return [r if r is not None else [] for r in results]
