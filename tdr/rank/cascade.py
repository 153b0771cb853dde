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
from typing import Dict, List, Optional, Sequence

import numpy as np

from tdr.models.sparse import SparseModel
from tdr.text.preprocess import Preprocessor


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

    def retrieve(
        self, queries: Sequence[str], langs: Sequence[str], k: int = 10
    ) -> List[List[str]]:
        results: List[Optional[List[str]]] = [None] * len(queries)
        for lang, q_idx in self._group(langs).items():
            cand_m = self.candidate_models[lang]
            rank_m = self.rerank_models[lang]
            assert cand_m.docids == rank_m.docids, (
                "cascade stages must index the same doc partition"
            )
            toks = [self.preprocessor(queries[i], lang) for i in q_idx]
            C = min(self.candidates, cand_m.index.n_docs)
            for s in range(0, len(q_idx), self.query_batch):
                sel = q_idx[s : s + self.query_batch]
                chunk = toks[s : s + self.query_batch]
                # stage 1: wide top-C candidates
                n_chunk = len(chunk)
                if n_chunk < self.query_batch:
                    chunk = chunk + [[]] * (self.query_batch - n_chunk)
                _, cand_rows = cand_m.topk_tokens(chunk, C)
                # stage 2: exact re-score of candidates, final top-k
                re_scores = rank_m.score_candidates_tokens(chunk, cand_rows)
                cand_rows, re_scores = cand_rows[:n_chunk], re_scores[:n_chunk]
                order = np.argsort(-re_scores, axis=1, kind="stable")[:, :k]
                for j, (rows, o) in zip(sel, zip(cand_rows, order)):
                    results[j] = [rank_m.docids[rows[c]] for c in o]
        return [r if r is not None else [] for r in results]
