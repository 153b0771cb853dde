"""L3 scoring ops over the sparse score-row index (jnp/XLA reference path).

Replaces the reference's Python postings-walk scorer
(BM25.get_scores, bm25_ranking.ipynb:191-205: ``for term in set(query): for
doc in postings: scores[doc] += ...``) and its scipy SpMM cosine ranker
(cosine_similarity_bm25_reranking.py:226) with batched, jittable device ops:

* head terms  — one full-head MXU matmul: scatter query weights into a
                dense (Q, D) matrix, contract against the resident (D, N)
                premultiplied score-row matrix (read once per batch)
* tail terms  — static-width masked gathers from flat CSR + scatter-add
                (exact path), or sort-based compaction (fused path)
* top-k       — `lax.top_k` over the padded doc axis with -inf masking
                (replaces np.argpartition, bm25_ranking.ipynb:206-213)

The Pallas-fused variant lives in ``tdr.ops.pallas_score``; this module is
the semantics reference it is tested against.
"""

from __future__ import annotations

import os as _os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from tdr.index.build import SparseIndex
from tdr.ops.topk import fast_topk, topk_grouped

NEG_INF = jnp.float32(-jnp.inf)
# query language code that matches every document (unknown-language queries
# fall back to unfiltered ranking rather than silently returning nothing)
WILDCARD_LANG = -2


_HEAD_CHUNK = 16


def int8_head_matmul(W: jnp.ndarray, rows8: jnp.ndarray) -> jnp.ndarray:
    """``W_f32 (Q, D) @ rows8_int8 (D, N)`` with the query-side scale folded
    back out: returns f32 scores still MISSING the per-doc-column
    dequantization scale (callers multiply by ``head_scale`` — after their
    collective, in the sharded paths, since a per-column factor distributes
    over the device sum).

    Query weights quantize losslessly in the common case — BM25 unit
    weights are small integers, carried through at scale 1 — and at ≤0.4%
    relative rounding otherwise (idf-weighted cosine queries)."""
    wmax = jnp.max(W, axis=1, keepdims=True)                   # (Q, 1), >= 0
    integral = (jnp.all(W == jnp.round(W), axis=1, keepdims=True)
                & (wmax <= 127.0))
    qscale = jnp.where(integral, 1.0, jnp.maximum(wmax, 1e-30) / 127.0)
    w8 = jnp.round(W / qscale).astype(jnp.int8)
    acc = jax.lax.dot_general(w8, rows8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * qscale


def _head_scores_capped(
    index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray, max_terms: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Head scores with the term loop capped at ``max_terms``.

    Head terms are compacted to the front (cheap T-wide sort), then the
    weighted row sum runs as a gather-reduce einsum over chunks of
    ``_HEAD_CHUNK`` terms.  A per-term `lax.scan` would read AND write the
    (Q, N) f32 carry in HBM on every step — at reference scale (207k docs,
    T=64) that measured 322 ms per 256-query batch; queries average only a
    handful of active head terms, so a capped single-chunk einsum does the
    whole reduction in one fused pass.  Returns (scores, overflow) where
    overflow flags queries with more active head terms than the cap (the
    caller re-scores those exactly)."""
    Q, T = qids.shape
    slot = index.head_slot[qids]                      # (Q, T)
    active = (slot >= 0) & (qw > 0)
    key = (~active).astype(jnp.int32)
    _, slot_c, w_eff = jax.lax.sort(
        (key, jnp.maximum(slot, 0), jnp.where(active, qw, 0.0)), num_keys=1)
    n_active = jnp.sum(active, axis=1)
    TH = min(max_terms, T)
    overflow = n_active > TH
    slot_c = slot_c[:, :TH]
    w_eff = w_eff[:, :TH]

    rows_t = index.head_rows                           # (D, N_pad)
    C = min(_HEAD_CHUNK, TH)
    n_chunks = (TH + C - 1) // C
    pad = n_chunks * C - TH
    if pad:
        slot_c = jnp.pad(slot_c, ((0, 0), (0, pad)))
        w_eff = jnp.pad(w_eff, ((0, 0), (0, pad)))
    slot_ch = slot_c.reshape(Q, n_chunks, C).transpose(1, 0, 2)   # (K, Q, C)
    w_ch = w_eff.reshape(Q, n_chunks, C).transpose(1, 0, 2)

    def step(scores, xs):
        s, w = xs                                      # (Q, C) each
        contrib = jnp.einsum(
            "qc,qcn->qn", w, rows_t[s].astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return scores + contrib, None

    # seed the carry from the rows tensor so its varying-axis type matches
    # inside shard_map (a fresh zeros literal would be device-invariant and
    # fail scan's carry typing); the 0-mul folds away in XLA
    init = jnp.zeros((Q, index.n_docs_pad), jnp.float32) + 0.0 * rows_t[0][None, :].astype(jnp.float32)
    scores, _ = jax.lax.scan(step, init, (slot_ch, w_ch))
    if rows_t.dtype == jnp.int8:
        # per-doc-column dequantization scale factors out of the term sum
        scores = scores * index.head_scale[None, :]
    return scores, overflow


def _head_scores(index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray) -> jnp.ndarray:
    """Exact head scores: the full-head matmul (no cap, no overflow)."""
    return _head_scores_matmul(index, qids, qw)


def _head_scores_matmul(
    index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray
) -> jnp.ndarray:
    """Head scores as ONE full-head MXU matmul: scores = W @ head_rows.

    The per-query gather-einsum (`_head_scores_capped`) reads up to TH head
    rows PER QUERY — Q*TH row reads of N floats each — and needs a term cap
    plus an overflow fallback.  This formulation scatters the query weights
    into a dense (Q, D) matrix over ALL D head slots and contracts it
    against the resident (D, N) head matrix directly: the head matrix is
    read exactly ONCE per batch (its size is the HBM-budget the index was
    built with, so this is the bandwidth floor for any head engine), there
    is no gather materialization, no per-query or per-batch term cap, and
    no overflow path.  EXACT for every query; the reduction runs on the
    MXU.  (A batch-unique-slot gather variant was tried first — it reads
    fewer rows but pays a (U, N) gather materialization; the full-head
    matmul measured faster and is far simpler.)
    """
    Q, T = qids.shape
    D = index.head_rows.shape[0]

    slot = index.head_slot[qids]                        # (Q, T)
    active = (slot >= 0) & (qw > 0)
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (Q, T), 0)
    W = jnp.zeros((Q, D), jnp.float32).at[
        q_idx.reshape(-1), jnp.where(active, slot, 0).reshape(-1)
    ].add(jnp.where(active, qw, 0.0).reshape(-1))
    if index.head_rows.dtype == jnp.int8:
        # int8 scalar-quantized head (build.quantize_head): per-query and
        # per-doc scales ride OUTPUT axes, so the contraction itself is a
        # native int8×int8→int32 MXU matmul (half the HBM bytes of bf16,
        # 2× the systolic rate).
        return int8_head_matmul(W, index.head_rows) * index.head_scale[None, :]
    # match the rows' dtype so the contraction is a native MXU matmul
    # (BM25 unit weights are exact in bf16; idf weights round at ~4e-3,
    # the same order as the bf16 rows themselves)
    W = W.astype(index.head_rows.dtype)
    return jnp.einsum("qd,dn->qn", W, index.head_rows,
                      preferred_element_type=jnp.float32)


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


def _topk_2stage(
    scores: jnp.ndarray, k: int, block: int = 1024
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a long doc axis in two passes.

    ``lax.top_k`` over (Q, 262k) sorts full rows; splitting the doc axis
    into blocks, taking each block's top-k, and re-top-k'ing the Q x (nb*k)
    winners does asymptotically less comparison work.  Exact, including
    lax.top_k's lowest-index-wins tie order: an element outside its block's
    top-k is dominated by k elements globally, and block-major concatenation
    preserves index order for ties.

    MEASURED SLOWER than plain ``lax.top_k`` on TPU v5e (k=10, (256, 262144)
    f32: ~+18 ms per batch — /tmp A/B, round 2); XLA's top_k is already
    tiled well there.  Kept as a correctness-tested alternative for
    backends where full-row sorts dominate; NOT on the production path.
    """
    Q, N = scores.shape
    if k > block or N < 4 * block or N % block:
        return jax.lax.top_k(scores, k)
    nb = N // block
    v1, i1 = jax.lax.top_k(scores.reshape(Q, nb, block), k)     # (Q, nb, k)
    base = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1) * block
    gi = (i1 + base).reshape(Q, nb * k)
    v2, sel = jax.lax.top_k(v1.reshape(Q, nb * k), k)
    return v2, jnp.take_along_axis(gi, sel, axis=1)


@partial(jax.jit, static_argnames=("top_k",))
def topk_language_filtered(
    scores: jnp.ndarray,        # (Q, N)
    doc_langs: jnp.ndarray,     # (N,) int32 language code per doc
    query_langs: jnp.ndarray,   # (Q,) int32 language code per query
    top_k: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-index language-filtered top-k: keep only docs whose language
    matches the query's (the reference's walk-the-argsort filter,
    text_preprocessing_and_stopwords.py:252-268 — here a masked top_k).

    A query code of ``WILDCARD_LANG`` disables the filter for that query
    (plain top-k) — used when the query's language is unknown."""
    q = query_langs[:, None]
    mask = (doc_langs[None, :] == q) | (q == WILDCARD_LANG)
    return fast_topk(jnp.where(mask, scores, NEG_INF), top_k)


def _scatter_topk(
    index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray, top_k: int,
    n_valid=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    scores = mask_invalid_docs(score_batch_raw(index, qids, qw),
                               index.n_docs if n_valid is None else n_valid)
    k_eff = min(top_k, index.n_docs_pad)
    vals, idx = fast_topk(scores, k_eff)
    if k_eff < top_k:
        pad = top_k - k_eff
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
    return vals, idx


@partial(jax.jit, static_argnames=("top_k",))
def score_and_topk(
    index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray, top_k: int = 10
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched retrieve_top_n (bm25_ranking.ipynb:206-213): (vals, doc_idx).

    When top_k exceeds the padded doc count the result is padded with
    (-inf, 0) entries so output shapes stay static for the caller.
    """
    return _scatter_topk(index, qids, qw, top_k)


def _tail_compact(index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray,
                  budget: int, max_tail_terms: int = 16):
    """Compact tail posting slots to a static ``budget`` per query.

    Two compaction levels, both computed from the term table alone so no
    posting memory is touched until the final (small) gather — on TPU the
    sorts are cheap while random gathers cost ~8ns/element:

    1. term level: queries rarely have more than a few tail (rare) terms —
       sort the T term slots tail-first and keep ``max_tail_terms``;
    2. slot level: sort the (MT·P) posting slots active-first and keep
       ``budget``.

    Returns (docs (Q,B), vals (Q,B), active (Q,B), overflow (Q,)); overflow
    flags queries that exceeded either static cap (handled by the caller
    with an exact-scatter fallback).
    """
    Q, T = qids.shape
    P = index.tail_pmax
    slot = index.head_slot[qids]
    df = index.stats.df[qids].astype(jnp.int32)
    start = index.indptr[qids]
    is_tail = (slot < 0) & (qw > 0)

    # --- level 1: keep at most MT tail terms (T-wide sort, trivial) -------
    MT = min(max_tail_terms, T)
    tkey = (~is_tail).astype(jnp.int32)
    _, start_c, df_c, qw_c, tail_c = jax.lax.sort(
        (tkey, start, df, qw, is_tail.astype(jnp.int32)), num_keys=1)
    start_c, df_c, qw_c = start_c[:, :MT], df_c[:, :MT], qw_c[:, :MT]
    tail_c = tail_c[:, :MT] > 0
    overflow = jnp.sum(is_tail, axis=1) > MT

    # --- level 2: keep at most ``budget`` posting slots -------------------
    offs = jax.lax.broadcasted_iota(jnp.int32, (Q, MT, P), 2)
    active = (offs < df_c[..., None]) & tail_c[..., None]      # (Q, MT, P)
    pos = (start_c[..., None] + offs).reshape(Q, MT * P)
    wq = jnp.broadcast_to(qw_c[..., None], (Q, MT, P)).reshape(Q, MT * P)
    active = active.reshape(Q, MT * P)

    B = min(budget, MT * P)
    if B < MT * P:
        overflow = overflow | (jnp.sum(active, axis=1) > B)
        # pack (inactive flag, term index) into ONE int32 sort key so the
        # sort carries just two operands; wq is reconstructed afterwards
        # from the term index with a tiny one-hot contraction
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (Q, MT, P), 1).reshape(Q, MT * P)
        key = ((~active).astype(jnp.int32) << 6) | t_idx       # MT <= 64
        key, pos = jax.lax.sort((key, pos), num_keys=1)
        key, pos = key[:, :B], pos[:, :B]
        active = (key >> 6) == 0
        t_sel = key & 63
        wq = jnp.einsum(
            "qbm,qm->qb",
            jax.nn.one_hot(t_sel, MT, dtype=jnp.float32), qw_c,
        )

    pos_safe = jnp.clip(pos, 0, index.postings_doc.shape[0] - 1)
    # inactive slots get sentinel doc id n_docs_pad (one PAST the padded
    # range) so they can never share a segment run with a real document
    docs = jnp.where(active, index.postings_doc[pos_safe], index.n_docs_pad)
    vals = jnp.where(active, index.postings_w[pos_safe] * wq, 0.0)
    return docs, vals, active, overflow


@partial(jax.jit, static_argnames=("top_k", "tail_budget", "tail_engine",
                                   "topk_mode", "head_engine"))
def _fused_topk_core(
    index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray, top_k: int,
    tail_budget: int, tail_engine: str = "xla", n_valid=None,
    topk_mode: str = "exact", head_engine: str = "matmul",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    qids = jnp.clip(qids, 0, index.vocab_size - 1)
    Q = qids.shape[0]

    # 1) head scores.  head_engine="matmul": one full-head MXU matmul —
    #    exact, no overflow path, reads the ENTIRE (D, N) head per batch
    #    (the right trade when Q is large: the read amortizes over Q).
    #    head_engine="gather": per-term row gather-einsum — reads only the
    #    ~active-terms head rows (T·N floats vs D·N), the serving engine
    #    for tiny Q where the full-head read is thousands of times the
    #    touched data (VERDICT r4 #5: kernel_q1 paid the whole 2.7 GB head).
    #    Queries with more than _HEAD_CHUNK active head terms overflow to
    #    the exact scatter fallback (rare; the caller's lax.cond).
    #    (n_valid overrides the static doc count — document shards carry a
    #    per-device valid length, tdr.parallel.sharded)
    if head_engine == "gather":
        head, overflow_h = _head_scores_capped(index, qids, qw, _HEAD_CHUNK)
    elif head_engine in ("fused", "fused_interpret"):
        # full-vocab-head fast path without the (Q, N) score matrix: the
        # Pallas block-max kernel + candidate rescore (tdr/ops/pallas_flat
        # fused_head_topk).  Only reachable when the head covers the vocab
        # (no tail merge needs materialized scores) — _resolve_head_engine
        # guards this; asserted here so a bad caller fails loudly.
        from tdr.ops.pallas_flat import fused_head_topk

        assert index.head_size >= index.vocab_size, "fused head needs no tail"
        k = min(top_k, index.n_docs_pad)
        hv, hi = fused_head_topk(index, qids, qw, top_k=k, n_valid=n_valid,
                                 interpret=(head_engine == "fused_interpret"))
        if k < top_k:
            hv = jnp.pad(hv, ((0, 0), (0, top_k - k)),
                         constant_values=-jnp.inf)
            hi = jnp.pad(hi, ((0, 0), (0, top_k - k)))
        return hv, hi, jnp.zeros((Q,), bool)
    else:
        head = _head_scores_matmul(index, qids, qw)
        overflow_h = jnp.zeros((Q,), bool)
    head = mask_invalid_docs(head, index.n_docs if n_valid is None else n_valid)
    k = min(top_k, index.n_docs_pad)
    if topk_mode == "approx":
        # lax.approx_max_k (TPU PartialReduce): the selection over the long
        # doc axis is the second-largest cost after the matmul (~3.3 ms of
        # the 6.7 ms en pass at (256, 262k)); approx selection runs it in
        # <1 ms at recall_target=0.95 (measured 0.98 top-10 overlap on the
        # dense path, BENCH_r03 dense_flat_approx_*).  Only the HEAD
        # candidate selection is approximate — tail-touched docs and the
        # final merge stay exact.  Falls back to exact off-TPU.
        hv, hi = jax.lax.approx_max_k(head, k, recall_target=0.95)
    else:
        if topk_mode == "exact_compact":
            # WIDENED head candidate set (tail-bearing indexes only): the
            # tier-1 exactness bound caps a non-candidate doc's head score
            # by the WORST selected head value, so selecting k_sel >> k
            # head candidates tightens the bound base from hv[k] to
            # hv[k_sel] — which lets tier 1 keep far fewer tail slots (M
            # below) for the same no-trip rate.  The economics: one extra
            # head candidate costs a (Q, 1) searchsorted + merge column
            # (~ns); one extra tail slot costs a head[q, d] random-access
            # gather element (~19 ns, THE dominant tier-1 cost).  Trading
            # 54 wide-head candidates for 384 gather slots is the round-5
            # measured win.
            k_sel = min(max(2 * k, 64), index.n_docs_pad) \
                if index.head_size < index.vocab_size else k
            k_sel = int(_os.environ.get("TDR_AB_KSEL", k_sel))
            # grouped-8 selection: reduce the (Q, N) scores to per-8-doc
            # maxima (one streaming VPU read) and top-k the 8x-shorter
            # groups — bit-identical to lax.top_k (tdr.ops.topk docstring
            # proof); measured 8.31 -> 7.66 ms fused with the stress head
            # matmul (round 5; round 3's grouped A/B lost with group=128
            # because the k*128 candidate gather dominated).
            hv, hi = topk_grouped(head, k_sel, group=8)
            # the TopK custom call's output feeding the tier-2 lax.cond
            # chain lowers the whole pass ~6x worse (measured 130 vs 13.3
            # ms straight-line core; approx_max_k upstream of the SAME
            # cond is fine at 11.2) — a barrier decouples the custom call
            # from the conditional's scheduling
            hv, hi = jax.lax.optimization_barrier((hv, hi))
        else:
            hv, hi = fast_topk(head, k)                     # (Q, k)

    # full-vocab head (the waterfill budget split saturates small-vocab
    # languages, router.py): every term is a head row, the tail is empty —
    # scoring IS the matmul + top_k, skip the tail machinery entirely
    if index.head_size >= index.vocab_size:
        if k < top_k:
            pad = top_k - k
            hv = jnp.pad(hv, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            hi = jnp.pad(hi, ((0, 0), (0, pad)))
        return hv, hi, overflow_h

    # 2) compacted tail slots → per-doc tail sums via sorted segment cumsum
    #    The effective budget is floored at 4x the widest tail posting list
    #    so ordinary multi-term queries cannot overflow into the expensive
    #    exact fallback (tail_pmax is static, so this stays one compile).
    budget = min(max(tail_budget, 4 * index.tail_pmax),
                 16 * index.tail_pmax)
    if tail_engine in ("pallas", "pallas_interpret"):
        # segment-DMA compactor (tdr.ops.pallas_tail): contiguous per-term
        # DMA instead of per-element gathers; vals come -1-encoded
        from tdr.ops.pallas_tail import tail_compact_pallas

        docs, v_enc, overflow = tail_compact_pallas(
            index, qids, qw, budget,
            interpret=(tail_engine == "pallas_interpret"))
    else:
        docs, vals, act, overflow = _tail_compact(index, qids, qw, budget)
        # pack the active flag into the value's sign (weights are >= 0) so
        # the doc-sort carries two operands instead of three
        v_enc = jnp.where(act, vals, -1.0)
    overflow = overflow | overflow_h
    B = docs.shape[1]
    d_s, v_s = jax.lax.sort((docs, v_enc), num_keys=1)
    m_s = v_s >= 0
    v_s = jnp.maximum(v_s, 0.0)

    cs = jnp.cumsum(v_s, axis=1)
    cs_excl = cs - v_s
    is_first = jnp.concatenate(
        [jnp.ones((Q, 1), bool), d_s[:, 1:] != d_s[:, :-1]], axis=1)
    is_last = jnp.concatenate(
        [d_s[:, 1:] != d_s[:, :-1], jnp.ones((Q, 1), bool)], axis=1)
    # run base propagated right via running max (weights are >= 0, so the
    # exclusive cumsum at each run start is non-decreasing)
    base = jax.lax.cummax(jnp.where(is_first, cs_excl, -jnp.inf), axis=1)
    tail_sum = cs - base                                       # valid at is_last

    # exact scores of tail-touched docs: head[q, d] + tail_sum.  Only each
    # run's LAST slot carries a complete sum — one live slot per unique
    # touched doc — and the expensive part is the per-element head[q, d]
    # gather (XLA lowers it to ~4-20 ns/element HBM loads; measured ~11 of
    # the 20.9 ms vocab-stress pass at (Q=256, B=2048) — round-4
    # profiling).  Its cost is linear in the gathered width, so tier 1
    # below gathers only the M live slots with the LARGEST tail sums;
    # a post-merge bound decides whether that was provably exact.

    def _merge(cand_docs, cand_vals, hv_m):
        """top-k of the head candidates ++ tail candidates, deduped.
        Exact: any true top-k doc's exact entry ranks <= 2k-1 in the merged
        list — at most k-1 better docs x 2 entries each."""
        all_vals = jnp.concatenate([hv_m, cand_vals], axis=1)
        all_docs = jnp.concatenate([hi, cand_docs], axis=1)
        k2 = min(2 * k, all_vals.shape[1])
        mv, msel = jax.lax.top_k(all_vals, k2)
        mdocs = jnp.take_along_axis(all_docs, msel, axis=1)
        eq = mdocs[:, :, None] == mdocs[:, None, :]            # (Q, 2k, 2k)
        earlier = jax.lax.broadcasted_iota(jnp.int32, (1, k2, k2), 2) < \
            jax.lax.broadcasted_iota(jnp.int32, (1, k2, k2), 1)
        dup = jnp.any(eq & earlier, axis=2)
        sel_order = jnp.argsort(dup.astype(jnp.int32), axis=1,
                                stable=True)[:, :k]
        return (jnp.take_along_axis(mv, sel_order, axis=1),
                jnp.take_along_axis(mdocs, sel_order, axis=1))

    _merge_mode = _os.environ.get("TDR_DEBUG_MERGE", "normal")

    def _head_at(d_x):
        # row-batched gather: take_along_axis keeps the batch dim so XLA
        # gathers within each 1 MB head row instead of the flat 268 MB
        # operand (A/B'd fresh-process on the v5e: 8.3 -> 7.0 ms at
        # (Q=256, B=2048, N=262k); the flat-index form was the round-4
        # original)
        if _merge_mode == "zero":          # debug ablation: gather cost
            return jnp.zeros_like(d_x, jnp.float32)
        src = head
        if _merge_mode == "barrier":       # debug: defuse from producers
            src = jax.lax.optimization_barrier(head)
        return jnp.take_along_axis(
            src, jnp.minimum(d_x, index.n_docs_pad - 1), axis=1)

    live = is_last & m_s
    if topk_mode == "exact_compact":
        # the widened head candidate set (k_sel above) tightens the tier-2
        # bound base enough that tier 1 holds at HALF the slot budget —
        # the M-slot head[q, d] gather is the dominant tier-1 cost
        # (~19 ns/slot/query), so M is sized as small as the no-trip rate
        # allows: max(256, pmax) measured trip-free on the vocab-stress
        # workload where max(512, 2*pmax) was the pre-widening minimum.
        M = min(B, max(256, index.tail_pmax))
        M = int(_os.environ.get("TDR_AB_M", M))
    else:
        M = min(B, max(512, 2 * index.tail_pmax))
    if topk_mode in ("approx", "exact_compact") and M < B:
        # tier 1: keep the M largest-tail live slots (a dropped doc's total
        # is then bounded by hv_k + tau).  Head candidates get their EXACT
        # totals too (a head-top-k doc whose live slot was dropped would
        # otherwise be undercounted and mis-ranked): binary-search each
        # head doc's run end in the doc-sorted slots and add its tail sum.
        lkey = jnp.where(live, -tail_sum, jnp.inf)
        lkey_s, d_c, ts_c = jax.lax.sort((lkey, d_s, tail_sum), num_keys=1)
        live_c = jnp.isfinite(lkey_s[:, :M])
        tau = jnp.maximum(jnp.where(jnp.isfinite(lkey_s[:, M]),
                                    -lkey_s[:, M], 0.0), 0.0)   # max dropped
        d_c, ts_c = d_c[:, :M], ts_c[:, :M]
        posr = jax.vmap(
            lambda row, q: jnp.searchsorted(row, q, side="right"))(
                d_s, hi) - 1
        posr_c = jnp.clip(posr, 0, B - 1)
        hit = ((posr >= 0)
               & (jnp.take_along_axis(d_s, posr_c, axis=1) == hi)
               & jnp.take_along_axis(m_s, posr_c, axis=1))
        hv_k = hv[:, -1]                       # pre-augmentation bound base
        # (the WORST selected head value: hv[k] in approx mode, hv[k_sel]
        # in exact_compact — the wide set makes this bound much tighter)
        hv = hv + jnp.where(
            hit, jnp.take_along_axis(tail_sum, posr_c, axis=1), 0.0)

        t1_vals, t1_docs = _merge(
            d_c, jnp.where(live_c, _head_at(d_c) + ts_c, NEG_INF), hv)
        # tier-1 exactness bound: every candidate's value is exact, and any
        # NON-candidate doc d has head(d) <= hv_k (it is not in the head
        # top-k) and tail(d) <= tau (its live slot was dropped, or it has
        # no tail at all and tau >= 0) — so if the computed k-th value
        # already beats hv_k + tau, no dropped doc can displace the result.
        # Otherwise tier 2 re-merges with ALL live slots.  The compaction is
        # gated to topk_mode="approx" above: exact mode's high-idf stress
        # tails trip the bound on most batches, and the conditional's
        # full-width branch lowers ~6x worse than the straight-line merge
        # (measured 131 vs 20.9 ms/batch on the 232k-term vocab-stress en
        # pass) — so exact stays on the always-full-width path below, and
        # the M-slot gather is an approx-mode optimization (12.4 ms bf16,
        # 10.3 ms int8, top-10 overlap 1.0 on that same pass).  Off-TPU,
        # approx_max_k falls back to exact top-k, so hv_k is exact and the
        # tau bound makes even this path exact (pinned by
        # test_live_slot_compaction_exact_beyond_budget).
        # topk_mode="exact_compact" (round 5, VERDICT r4 #2) takes this
        # same tier-1/tier-2 structure with EXACT head selection, which
        # by the argument above makes the whole result exact.  Round-5
        # rescue economics, measured on a fabricated stress-shaped index
        # (checksum-pull timing, /tmp ablations recorded in ARCHITECTURE):
        #   * the merge gather is ~10 of the 19.2 ms exact pass
        #     (zero-gather ablation 9.09 vs 19.18 ms/batch; an
        #     optimization_barrier changed nothing — genuine latency-bound
        #     random access, not a fusion pathology);
        #   * the tier-1 core alone runs 13.3 ms (M=768 of B=2048);
        #   * an alternative rescue — folding per-query bound failures
        #     into the outer overflow/scatter cond — cost 130 ms/batch
        #     WITH THE RESCUE NEVER TAKEN (overflow frac 0.0): a cond
        #     whose predicate depends on the end of the pipeline
        #     pessimizes the whole program, the same 6x signature as r4's
        #     tier-2-in-exact cut;
        #   * THIS tier-2 cond (predicate equally late, branch = the
        #     full-width re-merge, not the scatter) measures fine when
        #     rarely taken: approx mode runs 11.2 ms with it.
        # So exact_compact pays a tier-2 re-merge at the batch rate the
        # tau bound trips — a win where tails are moderate, degrading
        # toward (not past) ~matching exact where every batch trips.
        risky = jnp.any(t1_vals[:, k - 1] < hv_k + tau)

        def tier2(_):
            return _merge(d_s, jnp.where(live, _head_at(d_s) + tail_sum,
                                         NEG_INF), hv)

        vals_out, docs_out = jax.lax.cond(
            risky, tier2, lambda _: (t1_vals, t1_docs), None)
    else:
        vals_out, docs_out = _merge(
            d_s, jnp.where(live, _head_at(d_s) + tail_sum, NEG_INF), hv)
    if k < top_k:
        pad = top_k - k
        vals_out = jnp.pad(vals_out, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        docs_out = jnp.pad(docs_out, ((0, 0), (0, pad)))
    return vals_out, docs_out, overflow


@partial(jax.jit, static_argnames=("top_k", "tail_budget", "tail_engine",
                                   "topk_mode", "head_engine"))
def score_and_topk_fused(
    index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray, top_k: int = 10,
    tail_budget: int = 2048, tail_engine: str = "xla", n_valid=None,
    topk_mode: str = "exact", head_engine: str = "matmul",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k without the tail scatter (the scatter dominates
    `score_and_topk` ~10x on TPU).

    Decomposition:  score(d) = head(d) + tail(d), where tail(d) != 0 for at
    most `tail_budget` docs per query (checked).  Head scores are dense VPU
    row accumulates; tail postings are compacted to the budget BEFORE any
    random gather — by a ~free TPU sort (tail_engine="xla") or by the
    contiguous segment-DMA Pallas kernel (tail_engine="pallas",
    tdr.ops.pallas_tail; "pallas_interpret" runs it in the interpreter for
    CPU tests) — summed per doc with a sorted segment cumsum, and merged
    with the head top-k via a top-2k + dedupe that is provably exact (see
    _fused_topk_core).

    Queries that exceed the head-term cap or tail budget (rare: many terms
    in one query) are re-scored by the exact scatter path — inside a
    `lax.cond`, so the common no-overflow case pays neither the scatter
    compute nor a host round-trip for the overflow flag.

    ``head_engine="gather"`` swaps the full-head matmul for the per-term
    row-gather engine (reads ~T head rows instead of the whole (D, N)
    matrix) — the SERVING engine for tiny query batches, where the
    Q-independent full-head read dominates end-to-end latency (VERDICT r4
    #5: kernel_q1 was 5.7 of the 6.1 ms single-query overhead).  Queries
    with more than ``_HEAD_CHUNK`` active head terms ride the same
    exact-scatter overflow fallback.  SparseModel picks the engine by
    batch size (``small_q_threshold``).
    """
    vals, docs, overflow = _fused_topk_core(index, qids, qw, top_k,
                                            tail_budget, tail_engine, n_valid,
                                            topk_mode, head_engine)

    def fallback(args):
        vals, docs, overflow = args
        sv, sd = _scatter_topk(index, qids, qw, top_k, n_valid)
        return (jnp.where(overflow[:, None], sv, vals),
                jnp.where(overflow[:, None], sd, docs))

    def keep(args):
        vals, docs, _ = args
        return vals, docs

    return jax.lax.cond(jnp.any(overflow), fallback, keep,
                        (vals, docs, overflow))


@partial(jax.jit, static_argnames=("tail_budget", "tail_engine"))
def score_candidates_fused(
    index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray,
    cand: jnp.ndarray, tail_budget: int = 2048, tail_engine: str = "xla",
) -> jnp.ndarray:
    """(Q, C) scores for explicit candidate rows via the fused decomposition.

    ``score_pairs`` walks a 32-step binary search whose (Q, T, C) gathers
    cost ~100M element loads per 256-query batch (~0.9 s measured on v5e —
    it dominated the cascade).  Here: head scores come from the full-head
    matmul (read once) gathered at the candidates; tail contributions from
    the compacted (docs, vals) slots matched against the candidates with a
    chunked equality-weighted sum (VPU compares, no random gathers).
    Matches ``score_pairs`` up to head-row dtype rounding (bf16 heads);
    exact for f32 heads.  Queries whose tail overflows the budget fall
    back to ``score_pairs`` rows inside the same jit.
    """
    Q, C = cand.shape
    qids = jnp.clip(qids, 0, index.vocab_size - 1)
    head = _head_scores_matmul(index, qids, qw)               # (Q, N)
    flat = (jax.lax.broadcasted_iota(jnp.int32, (Q, C), 0) * index.n_docs_pad
            + jnp.clip(cand, 0, index.n_docs_pad - 1))
    head_at = jnp.take(head.reshape(-1), flat.reshape(-1)).reshape(Q, C)

    if index.head_size >= index.vocab_size:
        return head_at                                        # empty tail

    budget = min(max(tail_budget, 4 * index.tail_pmax), 16 * index.tail_pmax)
    if tail_engine in ("pallas", "pallas_interpret"):
        from tdr.ops.pallas_tail import tail_compact_pallas

        docs, v_enc, overflow = tail_compact_pallas(
            index, qids, qw, budget,
            interpret=(tail_engine == "pallas_interpret"))
    else:
        docs, vals, act, overflow = _tail_compact(index, qids, qw, budget)
        v_enc = jnp.where(act, vals, -1.0)
    v_pos = jnp.maximum(v_enc, 0.0)                           # dead lanes -> 0

    # chunked equality-weighted sum: tail_at[q, c] = sum_w v[q,w]*(docs==cand)
    CH = 16
    n_ch = (C + CH - 1) // CH
    cand_p = jnp.pad(cand, ((0, 0), (0, n_ch * CH - C)), constant_values=-1)
    cand_ch = cand_p.reshape(Q, n_ch, CH).transpose(1, 0, 2)  # (n_ch, Q, CH)

    def step(_, cc):
        eq = docs[:, None, :] == cc[:, :, None]               # (Q, CH, W)
        return None, jnp.sum(jnp.where(eq, v_pos[:, None, :], 0.0), axis=2)

    _, tail_ch = jax.lax.scan(step, None, cand_ch)            # (n_ch, Q, CH)
    tail_at = tail_ch.transpose(1, 0, 2).reshape(Q, n_ch * CH)[:, :C]
    fused = head_at + tail_at

    def fallback(args):
        fused, overflow = args
        exact = score_pairs(index, qids, qw, cand)
        return jnp.where(overflow[:, None], exact, fused)

    return jax.lax.cond(jnp.any(overflow), fallback,
                        lambda a: a[0], (fused, overflow))


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
