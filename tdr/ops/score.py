"""L3 scoring ops over the sparse score-row index (jnp/XLA reference path).

Replaces the reference's Python postings-walk scorer
(BM25.get_scores, bm25_ranking.ipynb:191-205: ``for term in set(query): for
doc in postings: scores[doc] += ...``) and its scipy SpMM cosine ranker
(cosine_similarity_bm25_reranking.py:226) with batched, jittable device ops:

* head terms  — `lax.scan` of dense-row gathers + VPU accumulate
                (HBM-bandwidth bound; rows are premultiplied score rows)
* tail terms  — static-width masked gathers from flat CSR + scatter-add
* top-k       — `lax.top_k` over the padded doc axis with -inf masking
                (replaces np.argpartition, bm25_ranking.ipynb:206-213)

The Pallas-fused variant lives in ``tdr.ops.pallas_score``; this module is
the semantics reference it is tested against.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from tdr.index.build import SparseIndex

NEG_INF = jnp.float32(-jnp.inf)


def _head_scores(index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray) -> jnp.ndarray:
    """Accumulate dense head rows: scores (Q, N_pad)."""
    Q, T = qids.shape
    slot = index.head_slot[qids]                      # (Q, T)
    w_eff = jnp.where((slot >= 0) & (qw > 0), qw, 0.0)
    slot_c = jnp.maximum(slot, 0)

    rows_t = index.head_rows                           # (D, N_pad)

    def step(scores, xs):
        s_t, w_t = xs                                  # (Q,), (Q,)
        gathered = rows_t[s_t]                         # (Q, N_pad)
        return scores + w_t[:, None] * gathered.astype(jnp.float32), None

    # seed the carry from the rows tensor so its varying-axis type matches
    # inside shard_map (a fresh zeros literal would be device-invariant and
    # fail scan's carry typing); the 0-mul folds away in XLA
    init = jnp.zeros((Q, index.n_docs_pad), jnp.float32) + 0.0 * rows_t[0][None, :]
    scores, _ = jax.lax.scan(step, init, (slot_c.T, w_eff.T))
    return scores


def _tail_scores(index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray,
                 scores: jnp.ndarray) -> jnp.ndarray:
    """Scatter-add flat-CSR tail postings into scores (Q, N_pad)."""
    Q, T = qids.shape
    P = index.tail_pmax
    slot = index.head_slot[qids]
    df = index.stats.df[qids]                          # (Q, T)
    start = index.indptr[qids]                         # (Q, T)
    is_tail = (slot < 0) & (qw > 0)

    offs = jax.lax.broadcasted_iota(jnp.int32, (Q, T, P), 2)
    pos = start[..., None] + offs                      # (Q, T, P)
    mask = (offs < df[..., None]) & is_tail[..., None]
    pos_c = jnp.clip(pos, 0, index.postings_doc.shape[0] - 1)

    docs = index.postings_doc[pos_c]                   # (Q, T, P)
    vals = index.postings_w[pos_c] * qw[..., None]
    vals = jnp.where(mask, vals, 0.0)
    docs = jnp.where(mask, docs, 0)

    q_idx = jax.lax.broadcasted_iota(jnp.int32, (Q, T, P), 0)
    return scores.at[q_idx.reshape(-1), docs.reshape(-1)].add(vals.reshape(-1))


def score_batch_raw(index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray) -> jnp.ndarray:
    """Unmasked score matrix (Q, N_pad) — padding docs score 0."""
    qids = jnp.clip(qids, 0, index.vocab_size - 1)
    scores = _head_scores(index, qids, qw)
    return _tail_scores(index, qids, qw, scores)


def mask_invalid_docs(scores: jnp.ndarray, n_valid) -> jnp.ndarray:
    """-inf out doc columns >= n_valid (static int or traced scalar)."""
    doc_iota = jax.lax.broadcasted_iota(jnp.int32, (1, scores.shape[1]), 1)
    return jnp.where(doc_iota < n_valid, scores, NEG_INF)


@jax.jit
def score_batch(index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray) -> jnp.ndarray:
    """Full score matrix (Q, N_pad); docs >= n_docs score -inf."""
    return mask_invalid_docs(score_batch_raw(index, qids, qw), index.n_docs)


def topk_masked(scores: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return jax.lax.top_k(scores, k)


@partial(jax.jit, static_argnames=("top_k",))
def score_and_topk(
    index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray, top_k: int = 10
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched retrieve_top_n (bm25_ranking.ipynb:206-213): (vals, doc_idx).

    When top_k exceeds the padded doc count the result is padded with
    (-inf, 0) entries so output shapes stay static for the caller.
    """
    scores = score_batch(index, qids, qw)
    k_eff = min(top_k, index.n_docs_pad)
    vals, idx = jax.lax.top_k(scores, k_eff)
    if k_eff < top_k:
        pad = top_k - k_eff
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
    return vals, idx


@jax.jit
def score_pairs(
    index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray, cand: jnp.ndarray
) -> jnp.ndarray:
    """Score explicit (query, candidate-doc) pairs: (Q, C) scores.

    The cascade re-ranker (cosine candidates → BM25 re-rank,
    cosine_similarity_bm25_reranking.py:228-236) needs scores for a small
    candidate set only.  Postings within a term are doc-sorted, so each
    (term, doc) weight is found by a static 32-step binary search in the
    term's CSR segment — O(Q·T·C·log nnz) with no dense N-vector.
    """
    Q, T = qids.shape
    C = cand.shape[1]
    qids = jnp.clip(qids, 0, index.vocab_size - 1)
    start = index.indptr[qids]                         # (Q, T)
    df = index.stats.df[qids].astype(jnp.int32)        # (Q, T)
    valid = qw > 0

    docs_sorted = index.postings_doc
    nnz = docs_sorted.shape[0]

    # binary search for cand doc d in segment [start, start+df)
    lo = jnp.broadcast_to(start[:, :, None], (Q, T, C))
    hi = lo + jnp.broadcast_to(df[:, :, None], (Q, T, C))
    target = jnp.broadcast_to(cand[:, None, :], (Q, T, C))

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        mid_doc = docs_sorted[jnp.clip(mid, 0, nnz - 1)]
        go_right = mid_doc < target
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    found_pos = jnp.clip(lo, 0, nnz - 1)
    hit = (lo < start[:, :, None] + df[:, :, None]) & (
        docs_sorted[found_pos] == target
    ) & valid[:, :, None]
    w = jnp.where(hit, index.postings_w[found_pos], 0.0)
    return jnp.sum(w * qw[:, :, None], axis=1)         # (Q, C)
