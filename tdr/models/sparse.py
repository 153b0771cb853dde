"""Sparse retrieval models: per-language BM25 and TF-IDF cosine.

A *model* bundles vocab + sparse score-row index + docid table for one
document partition (usually one language — the reference keeps one BM25
model + docid map per language, bm25_ranking.ipynb:262-325,
final_implementation.py:320-330).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from tdr.index.build import SparseIndex, build_index, build_tfidf_index
from tdr.ops.score import (
    score_and_topk,
    score_and_topk_fused,
    score_candidates_fused,
    score_pairs,
)
from tdr.text.vocab import Vocab, build_vocab, encode_docs, encode_queries
from tdr.utils.config import BM25Config, IndexConfig


@dataclass
class SparseModel:
    """Common machinery for BM25 / TF-IDF models over one doc partition."""

    vocab: Vocab
    index: SparseIndex
    docids: List[str]
    lang: str = "en"
    max_query_terms: int = 64
    query_weight: str = "unit"        # "unit" (BM25) | "idf" (cosine)
    tail_budget: int = 1024           # fused-topk tail compaction budget
    use_fused_topk: bool = True       # sort-based exact top-k (no scatter)
    # tail compaction engine: "auto" picks the segment-DMA Pallas kernel on
    # TPU (tdr.ops.pallas_tail) and the XLA sort-compactor elsewhere;
    # "pallas_interpret" forces the kernel through the interpreter (tests)
    tail_engine: str = "auto"
    # head candidate selection: "exact" (lax.top_k) | "approx"
    # (lax.approx_max_k, recall_target 0.95 — the FAISS-style speed/recall
    # trade for the sparse engine; tail contributions and the merge stay
    # exact either way).  Keep "exact" when results must be bit-stable.
    topk_mode: str = "exact"
    # batches of at most this many queries score the head with the
    # per-term ROW-GATHER engine instead of the full-head matmul: a Q=1
    # request reads ~6 head rows (a few MB) instead of the whole (D, N)
    # matrix (GBs) — measured 5.7 -> ~0.6 ms on the production en shape.
    # Composes with the router's Q∈{1,8} compile buckets, which make the
    # engine choice a stable compile key.  0 disables (always matmul).
    small_q_threshold: int = 8
    # host-side OOV query-term repair by trigram vocabulary matching
    # (tdr.text.spell) — lifts typo'd-query recall; off by default so the
    # default pipeline matches the reference's drop-unknown-terms behavior
    spell_correct: bool = False
    # RM3-style pseudo-relevance feedback (tdr.rank.feedback): mine the
    # first pass's top prf_docs documents for prf_terms expansion terms and
    # re-score once with beta-interpolated weights.  Off by default (the
    # reference scores each query exactly once); costs a second scoring
    # dispatch per batch plus a one-time doc-major index build.
    # defaults live in tdr.rank.feedback (the best full-scale sweep point:
    # 268k docs hard mode, F3/E5/b0.3/m2 = +0.4 recall vs F5/E10/b0.4 =
    # -1.0; RM3 is aggressiveness-sensitive — prefer gentle expansion)
    prf: bool = False
    prf_docs: int = 3         # = feedback.DEFAULT_FEEDBACK_DOCS
    prf_terms: int = 5        # = feedback.DEFAULT_EXPAND_TERMS
    prf_beta: float = 0.3     # = feedback.DEFAULT_BETA
    prf_min_docs: int = 2     # = feedback.DEFAULT_MIN_DOCS; expansion
                              # terms must occur in >= this many feedback
                              # docs (single-doc terms drift)

    def _repairer(self):
        """Lazily-built trigram repairer over this partition's UNIGRAM
        vocabulary (memoized on the instance).  Bigram "a_b" terms —
        materialized in term_to_id by the Python pipeline's bigram
        augmentation — are excluded: a typo'd unigram must never be
        "repaired" into a phrase term (the query side skips '_' tokens for
        the same reason), and dropping them cuts the repairer build by the
        bigram-dominated share of the vocab."""
        rep = getattr(self, "_repairer_cache", None)
        if rep is None:
            from tdr.text.spell import TrigramRepairer

            df_all = np.asarray(self.vocab.df, np.float32)
            terms, dfs = [], []
            for t, i in self.vocab.term_to_id.items():
                if "_" not in t:
                    terms.append(t)
                    dfs.append(df_all[i] if i < df_all.shape[0] else 1.0)
            rep = TrigramRepairer(terms, np.asarray(dfs, np.float32))
            self._repairer_cache = rep
        return rep

    def _resolved_tail_engine(self) -> str:
        if self.tail_engine == "auto":
            from tdr.ops.pallas_tail import pallas_tail_available

            self.tail_engine = (
                "pallas" if pallas_tail_available(self.index) else "xla")
        return self.tail_engine

    # -- query encoding ------------------------------------------------------

    def encode_query_tokens_np(
        self, token_lists: Sequence[Sequence[str]]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Host-side query encoding (no device transfer) — callers that
        batch many chunks upload all encodings in one device_put."""
        if self.spell_correct:
            token_lists = self._repairer().repair_token_lists(
                token_lists, self.vocab.term_to_id)
        qids, qw = encode_queries(token_lists, self.vocab, self.max_query_terms)
        if self.query_weight == "idf":
            # cosine query vector = idf per present term
            # (cosine_similarity_bm25_reranking.py:121-126)
            idf = np.asarray(self.index.stats.idf)
            qw = np.where(qw > 0, idf[np.clip(qids, 0, idf.shape[0] - 1)] * qw, 0.0).astype(np.float32)
        return qids, qw

    def encode_query_tokens(
        self, token_lists: Sequence[Sequence[str]]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        qids, qw = self.encode_query_tokens_np(token_lists)
        return jnp.asarray(qids), jnp.asarray(qw)

    def topk_encoded_async(self, qids, qw, k: int = 10):
        """Scoring from already-encoded (device or host) query arrays.
        With ``prf`` enabled this runs the two-pass feedback loop — both
        passes dispatch without host round trips in between."""
        if self.prf:
            qids, qw = self._prf_expand(jnp.asarray(qids), jnp.asarray(qw))
        return self._score_encoded(qids, qw, k)

    def _score_encoded(self, qids, qw, k: int):
        if self.use_fused_topk:
            if 0 < qids.shape[0] <= self.small_q_threshold:
                head_engine = "gather"
            else:
                head_engine = self._resolved_head_engine(k)
            return score_and_topk_fused(self.index, qids, qw, top_k=k,
                                        tail_budget=self.tail_budget,
                                        tail_engine=self._resolved_tail_engine(),
                                        topk_mode=self.topk_mode,
                                        head_engine=head_engine)
        return score_and_topk(self.index, qids, qw, top_k=k)

    def _resolved_head_engine(self, k: int) -> str:
        """Full-batch head engine: the fused Pallas block-max top-k
        (tdr/ops/pallas_flat.fused_head_topk) on TPU for full-vocab-head
        indexes in exact mode — the (Q, N) score matrix never lands in
        HBM; the full-head matmul otherwise."""
        if self.topk_mode not in ("exact", "exact_compact"):
            return "matmul"
        from tdr.ops.pallas_flat import fused_head_available

        if not fused_head_available(self.index, k):
            return "matmul"
        try:
            platform = jax.devices()[0].platform
        except RuntimeError:
            return "matmul"
        return "fused" if platform in ("tpu", "axon") else "matmul"

    def _doc_major(self):
        """Doc-major CSR mirror for feedback mining.  Cached ON the index
        object: model copies made with ``dataclasses.replace`` (the bench
        and CLI knob-toggle pattern) share the index, and a per-model
        cache would rebuild and hold duplicate device mirrors."""
        dmi = getattr(self.index, "_doc_major_cache", None)
        if dmi is None:
            from tdr.rank.feedback import build_doc_major

            dmi = build_doc_major(self.index)
            object.__setattr__(self.index, "_doc_major_cache", dmi)
        return dmi

    def _prf_expand(self, qids, qw):
        """First pass at k=prf_docs, then RM3 term mining + interpolation —
        returns the widened (Q, T+E) query arrays for the second pass."""
        from tdr.rank.feedback import prf_expand

        fb_vals, fb_rows = self._score_encoded(qids, qw, self.prf_docs)
        return prf_expand(self._doc_major(), self.index.vocab_size,
                          qids, qw, fb_vals, fb_rows,
                          n_expand=self.prf_terms,
                          n_feedback=self.prf_docs, beta=self.prf_beta,
                          min_docs=self.prf_min_docs)

    # -- scoring -------------------------------------------------------------

    def topk_tokens(
        self, token_lists: Sequence[Sequence[str]], k: int = 10,
        pad_to: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(scores (Q,k), local doc rows (Q,k)) for tokenized queries.

        ``pad_to`` pads the query axis to a fixed batch size so jit
        specializes on one shape (ragged final chunks would otherwise
        trigger a recompile per distinct batch size)."""
        vals, rows, n = self.topk_tokens_async(token_lists, k, pad_to)
        return np.asarray(vals)[:n], np.asarray(rows)[:n]

    def topk_tokens_async(self, token_lists, k: int = 10,
                          pad_to: Optional[int] = None):
        """Dispatch scoring without blocking: returns device arrays
        (vals, rows) plus the real query count.  Callers that queue many
        batches before converting to numpy overlap host encoding with
        device compute (jax dispatch is async)."""
        n = len(token_lists)
        if pad_to is not None and n < pad_to:
            token_lists = list(token_lists) + [[]] * (pad_to - n)
        qids, qw = self.encode_query_tokens(token_lists)
        vals, rows = self.topk_encoded_async(qids, qw, k)
        return vals, rows, n

    def retrieve_tokens(
        self, token_lists: Sequence[Sequence[str]], k: int = 10
    ) -> List[List[str]]:
        """Top-k docid lists (the reference's retrieve_top_n,
        bm25_ranking.ipynb:206-213, mapped through the docid table).
        -inf pad entries (k > corpus size) are dropped."""
        vals, rows = self.topk_tokens(token_lists, k)
        return [
            [self.docids[r] for r, v in zip(qrow, qvals) if np.isfinite(v)]
            for qrow, qvals in zip(rows, vals)
        ]

    def score_candidates_tokens(
        self, token_lists: Sequence[Sequence[str]], cand_rows: np.ndarray
    ) -> np.ndarray:
        """(Q, C) scores for explicit candidate rows (cascade re-rank) —
        fused engine (head matmul + compacted-tail match); the binary-search
        ``score_pairs`` stays available as the f32-exact oracle."""
        qids, qw = self.encode_query_tokens(token_lists)
        return np.asarray(score_candidates_fused(
            self.index, qids, qw, jnp.asarray(cand_rows),
            tail_budget=self.tail_budget,
            tail_engine=self._resolved_tail_engine()))


@dataclass
class BM25Model(SparseModel):
    """Okapi BM25 (the reference's winning engine, bm25_ranking.ipynb:166-213)."""

    @classmethod
    def from_coo(
        cls, vocab: Vocab, coo, docids: Sequence[str], lang: str = "en",
        bm25: BM25Config = BM25Config(), index_cfg: IndexConfig = IndexConfig(),
        max_query_terms: int = 64, head_size: Optional[int] = None,
    ) -> "BM25Model":
        index = build_index(*coo, vocab.size, bm25=bm25, index_cfg=index_cfg,
                            weight_kind="bm25", head_size=head_size,
                            df_host=vocab.df)
        return cls(vocab=vocab, index=index, docids=list(docids), lang=lang,
                   max_query_terms=max_query_terms, query_weight="unit")

    @classmethod
    def build(
        cls,
        doc_token_lists: Sequence[Sequence[str]],
        docids: Sequence[str],
        lang: str = "en",
        bm25: BM25Config = BM25Config(),
        index_cfg: IndexConfig = IndexConfig(),
        max_query_terms: int = 64,
        head_size: Optional[int] = None,
    ) -> "BM25Model":
        vocab = build_vocab(doc_token_lists, min_df=index_cfg.min_df)
        coo = encode_docs(doc_token_lists, vocab)
        index = build_index(*coo, vocab.size, bm25=bm25, index_cfg=index_cfg,
                            weight_kind="bm25", head_size=head_size)
        return cls(vocab=vocab, index=index, docids=list(docids), lang=lang,
                   max_query_terms=max_query_terms, query_weight="unit")


@dataclass
class TfidfCosineModel(SparseModel):
    """TF-IDF + cosine similarity (cosine_similarity_bm25_reranking.py:72-126,
    198-238): L2-normalized tf·idf doc rows, idf-weighted query vector."""

    @classmethod
    def from_coo(
        cls, vocab: Vocab, coo, docids: Sequence[str], lang: str = "en",
        index_cfg: IndexConfig = IndexConfig(),
        max_query_terms: int = 64, head_size: Optional[int] = None,
    ) -> "TfidfCosineModel":
        index = build_tfidf_index(*coo, vocab.size, index_cfg=index_cfg,
                                  head_size=head_size, df_host=vocab.df)
        return cls(vocab=vocab, index=index, docids=list(docids), lang=lang,
                   max_query_terms=max_query_terms, query_weight="idf")

    @classmethod
    def build(
        cls,
        doc_token_lists: Sequence[Sequence[str]],
        docids: Sequence[str],
        lang: str = "en",
        index_cfg: IndexConfig = IndexConfig(),
        max_query_terms: int = 64,
        head_size: Optional[int] = None,
    ) -> "TfidfCosineModel":
        vocab = build_vocab(doc_token_lists, min_df=index_cfg.min_df)
        coo = encode_docs(doc_token_lists, vocab)
        index = build_tfidf_index(*coo, vocab.size, index_cfg=index_cfg,
                                  head_size=head_size)
        return cls(vocab=vocab, index=index, docids=list(docids), lang=lang,
                   max_query_terms=max_query_terms, query_weight="idf")
