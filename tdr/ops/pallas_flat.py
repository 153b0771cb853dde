"""Pallas TPU kernel: fused dense flat-search scoring + selection.

The XLA exact path (tdr/models/dense.py `flat_search`) materializes the
full (Q, N) score matrix in HBM and re-reads it for the top-k custom call
— at the production shape (256 x 262144 f32) that is ~536 MB of score
traffic per batch against a 134 MB bf16 embedding read, which pins the
exact engine at ~0.24 of its bandwidth roofline (VERDICT r4 weak #2).
``jax.lax.approx_max_k`` proves the memory system can feed the matmul
(0.62 ms/batch) but its selection is approximate.

This module keeps the selection EXACT while never letting the score
matrix touch HBM, in two phases:

* **Phase 1 (Pallas kernel)**: grid over document blocks.  Each step
  streams one (B, D) embedding block into VMEM, runs the (B, D) x (D, Qp)
  matmul on the MXU, applies the per-doc bias (padding mask, l2's -||d||^2
  term, SQ8 dequant scales) and reduces the VMEM-resident (B, Qp) scores
  to per-sub-block maxima over groups of ``sub`` consecutive documents.
  Output: (N/sub, Qp) f32 — 1/(2*sub) of the score-matrix bytes.  HBM
  traffic = the embedding read + the maxima write.  The (B, Qp) ->
  (B/sub, sub, Qp) view splits the MAJOR (sublane) axis, which Mosaic
  supports; the doc axis is deliberately placed on sublanes (scores are
  computed transposed, (docs, queries)) because lane-axis regrouping is
  not.
* **Phase 2 (XLA)**: ``lax.top_k`` over the (Q, N/sub) group maxima picks
  k groups per query, the k*sub candidate rows are gathered and rescored
  exactly in f32, and a 2-key (value desc, global row asc) sort finishes.

EXACTNESS: identical argument to ``tdr.ops.topk.topk_grouped`` — group
selection is lexical by (max desc, group id asc), so for any element e
outside the k chosen groups there are k groups whose max outranks e under
(value desc, index asc); the chosen groups therefore contain the entire
true top-k, and the exact rescore + 2-key sort reproduces ``lax.top_k``'s
ordering over true f32 scores.  (The rescore accumulates in f32 from the
stored dtype, so values can differ from the XLA engine's bf16-input matmul
by an ulp — the tests bound this.)

Replaces the reference's FAISS ``IndexFlatIP.search`` surface
(faiss_based_ANN_Implementation.py:281-289) at speed-of-light traffic.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 128
NEG = jnp.float32(-1e30)          # finite -inf stand-in: survives 0*x math

# VMEM budget for one grid step's score tile + embedding block (bytes).
# The TPU scoped-vmem limit is 16 MB and Pallas double-buffers the input
# blocks, so the working set must leave ~2x headroom (measured: a 12 MB
# budget OOM'd the v5e scoped vmem at 16.75/16.00 MB).
_VMEM_STEP_BUDGET = 5 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(n: int, qp: int, d: int, esize: int, sub: int) -> int:
    """Largest doc-block size that divides n, keeps the (B, Qp) f32 score
    tile + (B, D) embedding block under the VMEM step budget, and keeps the
    (B/sub,) output tile sublane-aligned (B multiple of 8*sub)."""
    for b in (8192, 4096, 2048, 1024, 512, 256, 128):
        if n % b:
            continue
        if b % (8 * sub):
            continue
        if b * (qp * 4 + d * esize) <= _VMEM_STEP_BUDGET:
            return b
    return 0


def _make_kernel(sub: int, alpha: float, is_int8: bool):
    def body(s, bias_ref, out_ref):
        # s: (B, Qp) f32 scores for this doc block, doc axis on sublanes.
        s = alpha * s + bias_ref[:]                  # (B, 1) -> lanes bcast
        b = s.shape[0]
        out_ref[:] = jnp.max(s.reshape(b // sub, sub, s.shape[1]), axis=1)

    if is_int8:
        def kernel(qT_ref, emb_ref, bias_ref, dscale_ref, qscale_ref,
                   out_ref):
            acc = jax.lax.dot_general(
                emb_ref[:], qT_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            s = acc.astype(jnp.float32) * dscale_ref[:] * qscale_ref[:]
            body(s, bias_ref, out_ref)
    else:
        def kernel(qT_ref, emb_ref, bias_ref, out_ref):
            s = jax.lax.dot_general(
                emb_ref[:], qT_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            body(s, bias_ref, out_ref)
    return kernel


def fused_flat_available(embeddings, top_k: int = 10, sub: int = 8) -> bool:
    """Static-shape gate for the fused engine: TPU backend (or interpret),
    lane-aligned dims, and a corpus big enough that the two-phase pass can
    win (tiny corpora are already sub-ms on the XLA path).
    ``TDR_PALLAS_FLAT=0`` opts out."""
    if os.environ.get("TDR_PALLAS_FLAT", "1") != "1":
        return False
    n, d = embeddings.shape
    if d % _LANES or n % (8 * sub) or n < 8192:
        return False
    if embeddings.dtype not in (jnp.bfloat16, jnp.float32, jnp.int8):
        return False
    return n // sub >= top_k and _pick_block(n, _LANES, d,
                                             embeddings.dtype.itemsize,
                                             sub) > 0


@partial(jax.jit, static_argnames=("top_k", "metric", "n_docs", "sub",
                                   "interpret"))
def fused_flat_topk(
    embeddings: jnp.ndarray,
    q: jnp.ndarray,
    top_k: int = 10,
    metric: str = "ip",
    n_docs: int = 0,
    doc_sq: Optional[jnp.ndarray] = None,
    doc_scale: Optional[jnp.ndarray] = None,
    n_valid: Optional[jnp.ndarray] = None,
    sub: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact flat top-k with fused block scoring (module docstring).

    Arguments mirror a ``FlatIndex``'s fields; ``n_valid`` optionally
    overrides the static ``n_docs`` with a traced per-call count (the
    doc-sharded engine's per-shard valid length).  Returns (vals, rows)
    with the same semantics as ``tdr.models.dense.flat_search``: "ip"
    vals are inner products, "l2" vals are true -||q-d||^2; padding and
    out-of-range slots are -inf with row 0.
    """
    N, D = embeddings.shape
    Q = q.shape[0]
    Qp = _round_up(max(Q, 1), _LANES)
    is_int8 = embeddings.dtype == jnp.int8
    esize = embeddings.dtype.itemsize
    alpha = 2.0 if metric == "l2" else 1.0
    B = _pick_block(N, Qp, D, esize, sub)
    ng = N // sub

    # per-doc additive bias: padding mask (+ -||d||^2 for l2)
    limit = n_valid if n_valid is not None else n_docs
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    valid = iota_n < limit
    if metric == "l2":
        dsq = jnp.nan_to_num(doc_sq.astype(jnp.float32), posinf=-NEG)
        bias = jnp.where(valid, -dsq[:, None], NEG)
    else:
        bias = jnp.where(valid, 0.0, NEG)
    bias = bias.astype(jnp.float32)

    qf = q.astype(jnp.float32)
    qpad = jnp.zeros((Qp, D), jnp.float32).at[:Q].set(qf)
    if is_int8:
        from tdr.models.dense import quantize_queries_int8

        q8, qs = quantize_queries_int8(qpad)
        qT, qscale = q8.T, qs.T                       # (D, Qp), (1, Qp)
        # the query the kernel actually scored with — the phase-2 rescore
        # must use the SAME effective query, or group selection (kernel
        # scores) and final ranking (rescore scores) disagree at the
        # quantization scale instead of the f32-accumulation scale
        q_eff = q8.astype(jnp.float32)[:Q] * qs[:Q]
        dscale = doc_scale.astype(jnp.float32)[:, None]   # (N, 1)
        args = (qT, embeddings, bias, dscale, qscale)
        in_specs = [
            pl.BlockSpec((D, Qp), lambda i: (0, 0)),
            pl.BlockSpec((B, D), lambda i: (i, 0)),
            pl.BlockSpec((B, 1), lambda i: (i, 0)),
            pl.BlockSpec((B, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, Qp), lambda i: (0, 0)),
        ]
    else:
        qT = qpad.astype(embeddings.dtype).T
        q_eff = qT.T.astype(jnp.float32)[:Q]
        args = (qT, embeddings, bias)
        in_specs = [
            pl.BlockSpec((D, Qp), lambda i: (0, 0)),
            pl.BlockSpec((B, D), lambda i: (i, 0)),
            pl.BlockSpec((B, 1), lambda i: (i, 0)),
        ]

    gmaxT = pl.pallas_call(
        _make_kernel(sub, alpha, is_int8),
        grid=(N // B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B // sub, Qp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ng, Qp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * D * Qp,
            bytes_accessed=N * D * esize + ng * Qp * 4 + D * Qp * esize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)

    # ---- phase 2: group select + exact rescore -------------------------
    gmax = gmaxT.T[:Q]                                # (Q, ng)
    k_g = min(top_k, ng)
    _, gsel = jax.lax.top_k(gmax, k_g)                # (Q, k_g) group ids
    offs = jax.lax.broadcasted_iota(jnp.int32, (Q, k_g, sub), 2)
    cols = (gsel[:, :, None] * sub + offs).reshape(Q, k_g * sub)
    cand = embeddings[cols].astype(jnp.float32)       # (Q, k_g*sub, D)
    if is_int8:
        cand = cand * doc_scale[cols][..., None]
    dots = jnp.einsum("qd,qkd->qk", q_eff, cand,
                      preferred_element_type=jnp.float32)
    scores = alpha * dots + bias[cols, 0]
    # exact (value desc, global row asc) order — lax.top_k's tie rule
    negv, rows = jax.lax.sort((-scores, cols), num_keys=2)
    k_eff = min(top_k, k_g * sub)
    vals, rows = -negv[:, :k_eff], rows[:, :k_eff]
    dead = vals <= NEG / 2
    vals = jnp.where(dead, -jnp.inf, vals)
    rows = jnp.where(dead, 0, rows)
    if metric == "l2":
        q_sq = jnp.sum(qf ** 2, axis=1, keepdims=True)
        vals = jnp.where(jnp.isfinite(vals), vals - q_sq, vals)
    if k_eff < top_k:
        vals = jnp.pad(vals, ((0, 0), (0, top_k - k_eff)),
                       constant_values=-jnp.inf)
        rows = jnp.pad(rows, ((0, 0), (0, top_k - k_eff)))
    return vals, rows


# --------------------------------------------------------------------------
# Sparse full-vocab-head fused top-k (the headline BM25 engine's hot branch)
# --------------------------------------------------------------------------

def _make_head_kernel(sub: int):
    def kernel(wT_ref, head_ref, bias_ref, out_ref):
        # contraction over the slot axis (sublanes of BOTH operands):
        # (D, B) x (D, Qp) -> (B, Qp), docs on sublanes like the dense kernel
        s = jax.lax.dot_general(
            head_ref[:], wT_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + bias_ref[:]
        b = s.shape[0]
        out_ref[:] = jnp.max(s.reshape(b // sub, sub, s.shape[1]), axis=1)
    return kernel


def _pick_head_block(n: int, qp: int, d: int, esize: int, sub: int) -> int:
    for b in (2048, 1024, 512, 256, 128):
        if n % b or b % (8 * sub):
            continue
        if b * (d * esize + qp * 4) + d * qp * esize <= _VMEM_STEP_BUDGET:
            return b
    return 0


def fused_head_available(index, top_k: int = 10, sub: int = 8) -> bool:
    """Gate for the sparse-head fused engine: full-vocab head (no tail —
    the merge needs no materialized score matrix), bf16/f32 head, shapes
    lane-aligned, and a corpus big enough that (a) the win matters and
    (b) we spend the one-time slow Mosaic compile only on partitions that
    earn it.  ``TDR_PALLAS_HEAD=0`` opts out."""
    if os.environ.get("TDR_PALLAS_HEAD", "1") != "1":
        return False
    if index.head_size < index.vocab_size:
        return False
    d, n = index.head_rows.shape
    if index.head_rows.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if d % 8 or n % (8 * sub) or n < 65536 or n // sub < top_k:
        return False
    return _pick_head_block(n, _LANES, d, index.head_rows.dtype.itemsize,
                            sub) > 0


@partial(jax.jit, static_argnames=("top_k", "sub", "interpret"))
def fused_head_topk(
    index,
    qids: jnp.ndarray,
    qw: jnp.ndarray,
    top_k: int = 10,
    n_valid=None,
    sub: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact head-score top-k without materializing the (Q, N) score
    matrix — the sparse sibling of ``fused_flat_topk`` for FULL-VOCAB-HEAD
    indexes (the headline en configuration, where scoring IS the head
    matmul + top-k, tdr/ops/score.py `_fused_topk_core`'s early return).

    Phase 1 streams the (D, N) head through VMEM in doc blocks (docs land
    on sublanes, so the per-``sub``-doc max is a supported major-axis
    reshape) and writes only group maxima.  Phase 2 re-scores the k*sub
    candidate docs from the CSR-active terms directly: score[q, d] =
    sum_t qw[t] * head[slot_t, d] — a (Q, T, k*sub) element gather, tiny
    next to the score matrix the XLA path writes and re-reads.
    """
    from tdr.index.build import SparseIndex  # noqa: F401  (type anchor)

    D, N = index.head_rows.shape
    Q, T = qids.shape
    Qp = _round_up(max(Q, 1), _LANES)
    esize = index.head_rows.dtype.itemsize
    B = _pick_head_block(N, Qp, D, esize, sub)
    ng = N // sub

    qids = jnp.clip(qids, 0, index.vocab_size - 1)
    slot = index.head_slot[qids]                           # (Q, T)
    active = (slot >= 0) & (qw > 0)
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (Q, T), 0)
    W = jnp.zeros((Q, D), jnp.float32).at[
        q_idx.reshape(-1), jnp.where(active, slot, 0).reshape(-1)
    ].add(jnp.where(active, qw, 0.0).reshape(-1))
    Wt = jnp.zeros((D, Qp), index.head_rows.dtype).at[:, :Q].set(
        W.T.astype(index.head_rows.dtype))

    limit = n_valid if n_valid is not None else index.n_docs
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    bias = jnp.where(iota_n < limit, 0.0, NEG).astype(jnp.float32)

    gmaxT = pl.pallas_call(
        _make_head_kernel(sub),
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((D, Qp), lambda i: (0, 0)),
            pl.BlockSpec((D, B), lambda i: (0, i)),
            pl.BlockSpec((B, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((B // sub, Qp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ng, Qp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * D * Qp,
            bytes_accessed=N * D * esize + ng * Qp * 4 + D * Qp * esize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Wt, index.head_rows, bias)

    gmax = gmaxT.T[:Q]                                     # (Q, ng)
    k_g = min(top_k, ng)
    _, gsel = jax.lax.top_k(gmax, k_g)
    offs = jax.lax.broadcasted_iota(jnp.int32, (Q, k_g, sub), 2)
    cols = (gsel[:, :, None] * sub + offs).reshape(Q, k_g * sub)
    # exact rescore from the active terms: the effective per-term weight is
    # the SLOT-summed, head-dtype-rounded value the kernel contracted with
    # (duplicate-slot terms double-count if rescored from raw qw)
    w_eff = W[q_idx, jnp.where(active, slot, 0)].astype(
        index.head_rows.dtype).astype(jnp.float32)         # (Q, T)
    w_eff = jnp.where(active, w_eff, 0.0)
    # first-occurrence guard: terms sharing a slot must contribute once
    first = jnp.ones((Q, T), bool)
    if T > 1:
        eq_prior = (slot[:, :, None] == slot[:, None, :]) \
            & (jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 2)
               < jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 1))
        eq_prior = eq_prior & active[:, :, None] & active[:, None, :]
        first = ~jnp.any(eq_prior, axis=2)
    w_eff = jnp.where(first, w_eff, 0.0)
    rows_cand = index.head_rows[
        jnp.where(active, slot, 0)[:, :, None],
        cols[:, None, :]].astype(jnp.float32)              # (Q, T, k_g*sub)
    scores = jnp.einsum("qt,qtc->qc", w_eff, rows_cand,
                        preferred_element_type=jnp.float32)
    scores = scores + bias[cols, 0]
    negv, rows = jax.lax.sort((-scores, cols), num_keys=2)
    k_eff = min(top_k, k_g * sub)
    vals, rows = -negv[:, :k_eff], rows[:, :k_eff]
    dead = vals <= NEG / 2
    vals = jnp.where(dead, -jnp.inf, vals)
    rows = jnp.where(dead, 0, rows)
    if k_eff < top_k:
        vals = jnp.pad(vals, ((0, 0), (0, top_k - k_eff)),
                       constant_values=-jnp.inf)
        rows = jnp.pad(rows, ((0, 0), (0, top_k - k_eff)))
    return vals, rows
