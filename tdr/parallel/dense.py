"""Mesh-sharded dense (embedding) flat search.

SURVEY.md §2b's FAISS-equivalent plan verbatim: "brute-force … dot-product
top-k as JAX kernels over a **sharded doc-embedding matrix**, per-shard
``jax.lax.top_k`` merged with ``all_gather``/``psum`` across the mesh"
(reference single-device search: faiss_based_ANN_Implementation.py:281-289).
This is the regime where IVF's crossover argument lands (ARCHITECTURE
"Crossover note"): ≥30M docs at 256-dim bf16 per chip, the flat matrix no
longer fits one device's HBM — so the (N, D) matrix shards over the mesh
"data" axis and every chip streams its local block at full bandwidth.

Scoring math is UNCHANGED by the sharding: the document axis is the
matmul's OUTPUT axis (the contraction runs over D), so each per-shard score
equals the single-device score exactly — no summation-order drift, unlike
reduction-axis (vocab-TP) sharding.  The merge is a k-sized `all_gather` +
global top-k, the same collective shape as the sparse doc-sharded engine
(tdr/parallel/sharded.py `sharded_score_topk`).

Supports the full dtype matrix of the single-device engine
(tdr/models/dense.py): bf16 (default), f32, and int8/SQ8 (per-doc scales
shard with the doc axis), metrics "ip" and "l2", and approximate selection
(`jax.lax.approx_max_k` per shard — each shard's recall target applies to
its local candidates, so the merged recall is ≥ the single-device approx
mode's).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tdr.models.dense import (NEG_INF, _round_up, _sq8_quantize,
                              quantize_queries_int8)
from tdr.ops.topk import fast_topk, merge_gathered_topk


@jax.tree_util.register_dataclass
@dataclass
class ShardedFlatIndex:
    """Per-shard FlatIndex arrays stacked on a leading shard axis."""

    embeddings: jnp.ndarray       # (S, N_loc_pad, D) bf16/f32 or int8
    doc_sq: Optional[jnp.ndarray] = None      # (S, N_loc_pad) f32 (l2)
    doc_scale: Optional[jnp.ndarray] = None   # (S, N_loc_pad) f32 (int8)
    n_valid: Optional[jnp.ndarray] = None     # (S,) int32 docs per shard

    n_shards: int = dataclasses.field(metadata=dict(static=True), default=1)
    n_docs: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_loc_pad: int = dataclasses.field(metadata=dict(static=True), default=0)
    metric: str = dataclasses.field(metadata=dict(static=True), default="ip")


def _shard_bounds(n_docs: int, n_shards: int) -> np.ndarray:
    return np.linspace(0, n_docs, n_shards + 1).astype(np.int64)


def build_sharded_flat_index(
    embeddings: np.ndarray,
    n_shards: int,
    pad_multiple: int = 128,
    metric: str = "ip",
    dtype: str = "bfloat16",
) -> ShardedFlatIndex:
    """Partition document embeddings into ``n_shards`` contiguous row
    ranges, padded to a common local length (static shapes per device).

    Same dtype semantics as ``build_flat_index``: bf16 halves the resident
    HBM and the matmul runs bf16 anyway; int8 (SQ8) quantizes per document
    row — the per-doc scale lands on the matmul's output axis, so each
    shard's contraction is a native int8×int8→int32 MXU matmul."""
    assert metric in ("ip", "l2"), metric
    assert dtype in ("bfloat16", "float32", "int8"), dtype
    n, d = embeddings.shape
    bounds = _shard_bounds(n, n_shards)
    n_local = np.diff(bounds)
    n_loc_pad = max(_round_up(max(int(n_local.max()) if n else 1, 1),
                              pad_multiple), pad_multiple)

    e = np.zeros((n_shards, n_loc_pad, d), np.float32)
    for s in range(n_shards):
        e[s, : n_local[s]] = embeddings[bounds[s]:bounds[s + 1]]
    doc_sq = None
    if metric == "l2":
        sq = np.full((n_shards, n_loc_pad), np.inf, np.float32)
        for s in range(n_shards):
            blk = embeddings[bounds[s]:bounds[s + 1]].astype(np.float64)
            sq[s, : n_local[s]] = (blk ** 2).sum(1).astype(np.float32)
        doc_sq = jnp.asarray(sq)
    doc_scale = None
    if dtype == "int8":
        e, scale = _sq8_quantize(e, axis=2)          # per document row
        emb_j = jnp.asarray(e)
        doc_scale = jnp.asarray(scale)
    elif dtype == "bfloat16":
        emb_j = jnp.asarray(e).astype(jnp.bfloat16)
    else:
        emb_j = jnp.asarray(e)
    return ShardedFlatIndex(
        embeddings=emb_j, doc_sq=doc_sq, doc_scale=doc_scale,
        n_valid=jnp.asarray(n_local, jnp.int32),
        n_shards=n_shards, n_docs=n, n_loc_pad=n_loc_pad, metric=metric,
    )


@partial(jax.jit, static_argnames=("mesh", "top_k", "approx",
                                   "recall_target"))
def sharded_flat_search(
    mesh: Mesh,
    sindex: ShardedFlatIndex,
    q: jnp.ndarray,
    top_k: int = 10,
    approx: bool = False,
    recall_target: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Q, D) replicated queries vs the doc-sharded embedding matrix.

    Per device: one local (Q, D)·(D, N_loc) matmul + local top-k; merge:
    `all_gather` over "data" + global top-k (S·k candidates per query —
    negligible ICI traffic).  Returns (vals (Q, k), GLOBAL row ids (Q, k));
    map rows back to corpus rows with ``sharded_row_to_doc``."""
    S = sindex.n_shards
    n_loc_pad = sindex.n_loc_pad
    k_local = min(top_k, n_loc_pad)
    is_int8 = sindex.embeddings.dtype == jnp.int8

    if is_int8:
        q_in, qs = quantize_queries_int8(q)
    else:
        qs = None
        q_in = q.astype(sindex.embeddings.dtype)

    def local_fn(emb, pack, n_valid, q_in, qs):
        doc_sq, doc_scale = pack
        q_loc = jax.lax.pcast(q_in, "data", to="varying")
        if is_int8:
            acc = jax.lax.dot_general(q_loc, emb[0], (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            qs_loc = jax.lax.pcast(qs, "data", to="varying")
            dots = acc.astype(jnp.float32) * qs_loc * doc_scale[0][None, :]
        else:
            dots = jnp.dot(q_loc, emb[0].T,
                           preferred_element_type=jnp.float32)
        if sindex.metric == "l2":
            scores = 2.0 * dots - doc_sq[0][None, :]
        else:
            scores = dots
        slot = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(slot < n_valid[0], scores, NEG_INF)
        if approx:
            vals, rows = jax.lax.approx_max_k(scores, k_local,
                                              recall_target=recall_target)
        else:
            vals, rows = fast_topk(scores, k_local)
        rows = jnp.where(jnp.isfinite(vals), rows, 0)
        grows = rows + jax.lax.axis_index("data") * n_loc_pad
        return jax.lax.all_gather(vals, "data"), jax.lax.all_gather(grows, "data")

    # placeholders keep the in_specs arity static when l2/int8 is off
    doc_sq = (sindex.doc_sq if sindex.doc_sq is not None
              else jnp.zeros((S, 1), jnp.float32))
    doc_scale = (sindex.doc_scale if sindex.doc_scale is not None
                 else jnp.zeros((S, 1), jnp.float32))
    qs_in = qs if qs is not None else jnp.zeros((q.shape[0], 1), jnp.float32)
    vals_g, rows_g = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("data"), (P("data"), P("data")), P("data"), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,   # all_gather outputs are device-invariant
    )(sindex.embeddings, (doc_sq, doc_scale), sindex.n_valid, q_in, qs_in)

    vals, rows = merge_gathered_topk(vals_g, rows_g, top_k)
    if sindex.metric == "l2":
        q_sq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        vals = jnp.where(jnp.isfinite(vals), vals - q_sq, vals)
    return vals, rows


@partial(jax.jit, static_argnames=("mesh", "top_k", "n_feedback", "approx",
                                   "recall_target"))
def sharded_flat_search_prf(
    mesh: Mesh,
    sindex: ShardedFlatIndex,
    q: jnp.ndarray,
    top_k: int = 10,
    n_feedback: int = 3,
    alpha: float = 0.5,
    approx: bool = False,
    recall_target: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rocchio feedback over the doc-sharded matrix (the mesh version of
    ``tdr.models.dense.flat_search_prf``).

    The feedback centroid is computed WITHOUT materializing a gather over
    the sharded embeddings: each device sums the feedback rows IT owns
    (global row ids decompose as shard·n_loc_pad + local) and a ``psum``
    over "data" merges the partial sums — k·F·D floats of ICI traffic per
    query batch, the same collective economics as the top-k merge.  The
    refined queries then take the ordinary sharded second pass.  Scoring
    math matches the single-device function exactly (doc axis = output
    axis), so results agree with ``flat_search_prf`` up to first-pass
    ties."""
    fb_vals, fb_rows = sharded_flat_search(
        mesh, sindex, q, top_k=n_feedback, approx=approx,
        recall_target=recall_target)
    finite = jnp.isfinite(fb_vals)
    n_loc_pad = sindex.n_loc_pad
    is_int8 = sindex.embeddings.dtype == jnp.int8

    def local_centroid(emb, doc_scale, fb_rows, finite):
        s = jax.lax.axis_index("data")
        local = fb_rows - s * n_loc_pad                    # (Q, F)
        mine = (local >= 0) & (local < n_loc_pad) & finite
        lsafe = jnp.clip(local, 0, n_loc_pad - 1)
        e = emb[0][lsafe].astype(jnp.float32)              # (Q, F, D)
        if is_int8:
            e = e * doc_scale[0][lsafe][..., None]
        e = jnp.where(mine[..., None], e, 0.0)
        part = jnp.sum(e, axis=1)                          # (Q, D)
        cnt = jnp.sum(mine, axis=1).astype(jnp.float32)    # (Q,)
        return (jax.lax.psum(part, "data"),
                jax.lax.psum(cnt, "data"))

    doc_scale = (sindex.doc_scale if sindex.doc_scale is not None
                 else jnp.zeros((sindex.n_shards, 1), jnp.float32))
    tot, cnt = jax.shard_map(
        local_centroid, mesh=mesh,
        in_specs=(P("data"), P("data"), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,   # psum outputs are device-invariant
    )(sindex.embeddings, doc_scale, fb_rows, finite)
    centroid = tot / jnp.maximum(cnt, 1e-9)[:, None]

    qf = q.astype(jnp.float32)
    if sindex.metric == "l2":
        q2 = (1.0 - alpha) * qf + alpha * centroid
    else:
        q2 = qf + alpha * centroid
        qn = jnp.linalg.norm(qf, axis=1, keepdims=True)
        q2n = jnp.maximum(jnp.linalg.norm(q2, axis=1, keepdims=True), 1e-9)
        q2 = q2 * (qn / q2n)
    any_fb = jnp.any(finite, axis=1, keepdims=True)
    q2 = jnp.where(any_fb, q2, qf)
    return sharded_flat_search(mesh, sindex, q2.astype(q.dtype), top_k=top_k,
                               approx=approx, recall_target=recall_target)


def sharded_row_to_doc(sindex: ShardedFlatIndex, rows: np.ndarray) -> np.ndarray:
    """Map sharded global rows (shard·pad + local) back to corpus rows."""
    bounds = _shard_bounds(sindex.n_docs, sindex.n_shards)
    shard = rows // sindex.n_loc_pad
    local = rows % sindex.n_loc_pad
    return bounds[shard] + local
