"""Dense-embedding retrieval: brute-force and IVF ANN search on TPU.

Replaces the reference's FAISS path (SURVEY.md §2b): TF-IDF→SVD→
`IndexFlatIP`/`IndexFlatL2` (faiss_based_ANN_Implementation.py:269-289) and
BERT-embedding search (corpus_processing_and_embedding.py:197-247) become:

* **brute-force**: doc-embedding matrix (N_pad, D) resident in HBM; search =
  one (Q, D) x (D, N) matmul on the MXU fused with `lax.top_k` — exact, and
  at this corpus scale usually faster than any ANN on TPU.
* **IVF**: k-means centroids (trained on device); search probes the
  ``nprobe`` nearest clusters via a dense gather of cluster-bucketed
  embeddings.  Buckets are padded to the max cluster size (static shapes).

Both operate on L2-normalized embeddings, so inner product == cosine
(`faiss.normalize_L2` + IndexFlatIP semantics).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tdr.models.encoder import DualEncoder, encode
from tdr.ops.topk import fast_topk
from tdr.text.hash_tokenizer import encode_batch
from tdr.utils.config import DenseConfig

NEG_INF = jnp.float32(-jnp.inf)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sq8_quantize(x: np.ndarray, axis: int):
    """Symmetric per-slice int8 quantization: ``x ≈ codes * scale`` with
    the scale taken over ``axis`` (rows for flat indexes, the embedding
    dim for IVF bucket entries).  All-zero slices get scale 0 and stay
    exactly zero."""
    vmax = np.abs(x).max(axis=axis, keepdims=True)
    scale = vmax / 127.0
    inv = np.where(scale > 0, 1.0 / np.maximum(scale, 1e-30), 0.0)
    codes = np.rint(x * inv).astype(np.int8)
    return codes, np.squeeze(scale, axis=axis).astype(np.float32)


def quantize_queries_int8(q: jnp.ndarray):
    """Symmetric per-row int8 query quantization for SQ8 search: returns
    (q8 (Q, D) int8, scale (Q, 1) f32) with q ≈ q8 · scale.  Shared by the
    single-device and mesh-sharded flat engines so the epsilon/rounding
    cannot drift between them."""
    qf = q.astype(jnp.float32)
    qmax = jnp.max(jnp.abs(qf), axis=1, keepdims=True)
    qs = jnp.maximum(qmax, 1e-30) / 127.0
    return jnp.round(qf / qs).astype(jnp.int8), qs


def _pad_target(n: int, batch: int) -> int:
    """Pad encoder batches to a power of two (min 32, capped at ``batch``) so
    tiny inputs don't pay a full-batch transformer forward while compile
    shapes stay bounded to {32, 64, ..., batch}."""
    t = 32
    while t < n:
        t <<= 1
    return min(max(t, 32), max(batch, 32))


# --------------------------------------------------------------------------
# Brute-force flat index
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass
class FlatIndex:
    """Exact flat search: inner product (IndexFlatIP) or unnormalized
    squared-L2 (IndexFlatL2, corpus_processing_and_embedding.py:204-208).

    For the L2 metric the doc squared norms are precomputed once at build;
    search ranks by ``2·q·d − ‖d‖²`` (equal ordering to −‖q−d‖², the ‖q‖²
    term is constant per query) so the hot loop stays one MXU matmul."""

    embeddings: jnp.ndarray       # (N_pad, D) float32/bf16, or int8 (SQ8)
    doc_sq: Optional[jnp.ndarray] = None   # (N_pad,) f32 ‖d‖² (L2 metric)
    # int8 scalar quantization (FAISS IndexScalarQuantizer/SQ8 analogue):
    # embeddings[n] ≈ int8[n] * doc_scale[n]; the per-doc scale rides the
    # output axis of the search matmul, so scoring runs int8×int8→int32
    doc_scale: Optional[jnp.ndarray] = None  # (N_pad,) f32
    n_docs: int = dataclasses.field(metadata=dict(static=True), default=0)
    metric: str = dataclasses.field(metadata=dict(static=True), default="ip")


def _resolve_flat_engine(index: "FlatIndex", top_k: int, approx: bool,
                         engine: str) -> str:
    """Pick the exact-scoring engine at trace time (host-side only:
    backend + static shapes).  "auto" -> the fused Pallas block-max engine
    (tdr/ops/pallas_flat.py) on TPU backends whenever the shapes qualify —
    it is exact and ~2-4x the XLA path's bandwidth efficiency (the (Q, N)
    score matrix never lands in HBM); the XLA path otherwise.  "fused"
    forces the kernel (interpret-mode off-TPU, for tests); "xla" forces
    the materialized-scores path.  approx mode always takes the XLA path
    (``approx_max_k`` is already selection-fused)."""
    if approx or engine == "xla":
        return "xla"
    from tdr.ops.pallas_flat import fused_flat_available

    ok = fused_flat_available(index.embeddings, top_k)
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "none"
    if engine == "fused":
        if not ok:
            raise ValueError(
                f"fused flat engine unavailable for shape "
                f"{index.embeddings.shape} dtype {index.embeddings.dtype}")
        return "fused" if platform in ("tpu", "axon") else "fused_interpret"
    assert engine == "auto", engine
    return "fused" if (ok and platform in ("tpu", "axon")) else "xla"


@partial(jax.jit, static_argnames=("top_k", "approx", "recall_target",
                                   "engine"))
def flat_search(index: FlatIndex, q: jnp.ndarray, top_k: int = 10,
                approx: bool = False, recall_target: float = 0.95,
                engine: str = "auto"):
    """(Q, D) queries → (vals, rows): one MXU matmul + top_k.

    The doc matrix is stored bf16 (build_flat_index) so no per-batch N·D
    cast runs and the resident index is half the HBM (the batch timing is
    dominated by top_k + dispatch, so the win is memory, not latency).

    Metric "ip": vals are inner products, descending.  Metric "l2": vals
    are NEGATED squared L2 distances (descending, i.e. nearest first) over
    the raw, unnormalized embeddings — ``faiss.IndexFlatL2.search``
    returns the same ranking with vals negated.

    ``approx=True`` swaps the exact top-k for ``jax.lax.approx_max_k``
    (the TPU PartialReduce custom call) at the given per-query
    ``recall_target`` — the brute-force analogue of FAISS's approximate
    modes: the matmul still scores every document, only the selection is
    approximate.  On non-TPU backends it falls back to exact.

    int8 (SQ8) indexes run the matmul int8×int8→int32 on the MXU — half
    the bf16 HBM read, 2× the systolic rate — and dequantize the (Q, N)
    output with the per-query × per-doc scales (both on output axes, so
    nothing approximate enters the reduction).

    ``engine`` selects the exact-scoring implementation (see
    ``_resolve_flat_engine``); on TPU the default resolves to the fused
    Pallas block-max kernel, which is exact and never materializes the
    (Q, N) score matrix in HBM."""
    eng = _resolve_flat_engine(index, top_k, approx, engine)
    if eng != "xla":
        from tdr.ops.pallas_flat import fused_flat_topk

        return fused_flat_topk(
            index.embeddings, q, top_k=top_k, metric=index.metric,
            n_docs=index.n_docs, doc_sq=index.doc_sq,
            doc_scale=index.doc_scale,
            interpret=(eng == "fused_interpret"))
    if index.embeddings.dtype == jnp.int8:
        q8, qs = quantize_queries_int8(q)
        acc = jax.lax.dot_general(q8, index.embeddings,
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        dots = acc.astype(jnp.float32) * qs * index.doc_scale[None, :]
    else:
        dots = jnp.dot(
            q.astype(index.embeddings.dtype), index.embeddings.T,
            preferred_element_type=jnp.float32,
        )
    if index.metric == "l2":
        # rank by 2qd − ‖d‖²; add the per-query −‖q‖² afterwards so the
        # returned vals are true −‖q−d‖²
        scores = 2.0 * dots - index.doc_sq[None, :]
    else:
        scores = dots
    doc_iota = jax.lax.broadcasted_iota(jnp.int32, (1, scores.shape[1]), 1)
    scores = jnp.where(doc_iota < index.n_docs, scores, NEG_INF)
    k = min(top_k, scores.shape[1])
    if approx:
        vals, rows = jax.lax.approx_max_k(scores, k,
                                          recall_target=recall_target)
    else:
        vals, rows = fast_topk(scores, k)
    if index.metric == "l2":
        q_sq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        vals = jnp.where(jnp.isfinite(vals), vals - q_sq, vals)
    if k < top_k:
        vals = jnp.pad(vals, ((0, 0), (0, top_k - k)), constant_values=-jnp.inf)
        rows = jnp.pad(rows, ((0, 0), (0, top_k - k)))
    return vals, rows


@partial(jax.jit, static_argnames=("top_k", "n_feedback", "approx",
                                   "recall_target", "engine"))
def flat_search_prf(index: FlatIndex, q: jnp.ndarray, top_k: int = 10,
                    n_feedback: int = 3, alpha: float = 0.5,
                    approx: bool = False, recall_target: float = 0.95,
                    engine: str = "auto"):
    """Rocchio pseudo-relevance feedback for dense search (the embedding-
    space sibling of the sparse engine's RM3, tdr.rank.feedback): first
    pass top-F, pull the query toward the feedback centroid, one second
    pass.  Two matmuls, no host round trip — both passes trace into one
    jit.

    ``metric="ip"``: the refined query is rescaled to the ORIGINAL query
    norm so inner-product scores stay on the caller's scale (and alpha=0
    is bit-identical to plain flat_search).  ``metric="l2"``: classic
    interpolation ``(1-alpha)·q + alpha·centroid`` in the unnormalized
    space.  Feedback embeddings dequantize per-doc for int8 (SQ8)
    indexes."""
    fb_vals, fb_rows = flat_search(index, q, top_k=n_feedback,
                                   approx=approx,
                                   recall_target=recall_target,
                                   engine=engine)
    finite = jnp.isfinite(fb_vals)
    rows_safe = jnp.where(finite, fb_rows, 0)
    emb = index.embeddings[rows_safe].astype(jnp.float32)   # (Q, F, D)
    if index.embeddings.dtype == jnp.int8:
        emb = emb * index.doc_scale[rows_safe][..., None]
    w = finite.astype(jnp.float32)
    centroid = (jnp.sum(emb * w[..., None], axis=1)
                / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-9))
    qf = q.astype(jnp.float32)
    if index.metric == "l2":
        q2 = (1.0 - alpha) * qf + alpha * centroid
    else:
        q2 = qf + alpha * centroid
        qn = jnp.linalg.norm(qf, axis=1, keepdims=True)
        q2n = jnp.maximum(jnp.linalg.norm(q2, axis=1, keepdims=True), 1e-9)
        q2 = q2 * (qn / q2n)
    # a query with NO finite feedback (empty index slice) keeps itself
    any_fb = jnp.any(finite, axis=1, keepdims=True)
    q2 = jnp.where(any_fb, q2, qf)
    return flat_search(index, q2.astype(q.dtype), top_k=top_k,
                       approx=approx, recall_target=recall_target,
                       engine=engine)


def build_flat_index(embeddings: np.ndarray, pad_multiple: int = 128,
                     metric: str = "ip", dtype: str = "bfloat16") -> FlatIndex:
    """``dtype="bfloat16"`` (default): the search matmul runs in bf16
    anyway; storing f32 doubled the HBM read AND paid an N·D cast per
    batch.  ``dtype="int8"``: per-doc symmetric scalar quantization (the
    FAISS SQ8 trade — half the bf16 bytes again, ≤0.4% per-entry rounding;
    the L2 correction term ‖d‖² stays exact f32)."""
    assert metric in ("ip", "l2"), metric
    assert dtype in ("bfloat16", "int8"), dtype
    n, d = embeddings.shape
    n_pad = max(_round_up(max(n, 1), pad_multiple), pad_multiple)
    e = np.zeros((n_pad, d), np.float32)
    e[:n] = embeddings
    doc_sq = None
    if metric == "l2":
        # ‖d‖² in f64 then f32: padding rows get +inf so they can never
        # win the 2qd − ‖d‖² ranking even before the n_docs mask
        sq = np.full(n_pad, np.inf, np.float32)
        sq[:n] = (embeddings.astype(np.float64) ** 2).sum(1).astype(np.float32)
        doc_sq = jnp.asarray(sq)
    if dtype == "int8":
        e8, scale = _sq8_quantize(e, axis=1)
        return FlatIndex(embeddings=jnp.asarray(e8), doc_sq=doc_sq,
                         doc_scale=jnp.asarray(scale),
                         n_docs=n, metric=metric)
    return FlatIndex(embeddings=jnp.asarray(e).astype(jnp.bfloat16),
                     doc_sq=doc_sq, n_docs=n, metric=metric)


# --------------------------------------------------------------------------
# IVF (inverted-file) partitioned index
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass
class IvfIndex:
    """k-means partitioned ANN index (IndexIVFFlat equivalent)."""

    centroids: jnp.ndarray        # (nlist, D)
    buckets: jnp.ndarray          # (nlist, bucket_pad, D) f32 or int8 (SQ8)
    bucket_rows: jnp.ndarray      # (nlist, bucket_pad) int32 original rows
    bucket_counts: jnp.ndarray    # (nlist,) int32
    # IVF+SQ8 (FAISS IndexIVFScalarQuantizer analogue): per-vector scale;
    # the probed-bucket gather is IVF's bottleneck (random HBM traffic,
    # see ARCHITECTURE "Crossover note") — int8 buckets quarter it vs f32
    bucket_scale: Optional[jnp.ndarray] = None   # (nlist, bucket_pad) f32
    n_docs: int = dataclasses.field(metadata=dict(static=True), default=0)
    nlist: int = dataclasses.field(metadata=dict(static=True), default=0)
    bucket_pad: int = dataclasses.field(metadata=dict(static=True), default=0)


@partial(jax.jit, static_argnames=("nlist", "iters"))
def _kmeans(emb: jnp.ndarray, key: jnp.ndarray, nlist: int, iters: int = 10):
    """Spherical k-means on device: assignments by max inner product."""
    n = emb.shape[0]
    init_idx = jax.random.choice(key, n, (nlist,), replace=False)
    cent = emb[init_idx]

    def step(cent, _):
        sim = emb @ cent.T                                    # (N, nlist)
        assign = jnp.argmax(sim, axis=1)
        one_hot = jax.nn.one_hot(assign, nlist, dtype=jnp.float32)
        sums = one_hot.T @ emb                                # (nlist, D)
        norms = jnp.linalg.norm(sums, axis=1, keepdims=True)
        new_cent = jnp.where(norms > 1e-6, sums / jnp.maximum(norms, 1e-6), cent)
        return new_cent, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    sim = emb @ cent.T
    return cent, jnp.argmax(sim, axis=1)


@partial(jax.jit, static_argnames=("chunk",))
def _assign_chunked(emb: jnp.ndarray, cent: jnp.ndarray, chunk: int):
    """argmax_j emb@cent[j] in row chunks: the (N, nlist) similarity never
    materializes (at multi-million-doc scale it would not fit HBM)."""
    n, d = emb.shape
    n_pad = _round_up(n, chunk)
    emb_p = jnp.pad(emb, ((0, n_pad - n), (0, 0)))
    blocks = emb_p.reshape(n_pad // chunk, chunk, d)

    def one(blk):
        sim = blk.astype(jnp.float32) @ cent.T
        return jnp.argmax(sim, axis=1).astype(jnp.int32)

    return jax.lax.map(one, blocks).reshape(n_pad)[:n]


@partial(jax.jit, static_argnames=("nlist", "iters", "chunk"))
def _kmeans_chunked(emb: jnp.ndarray, key: jnp.ndarray, nlist: int,
                    iters: int, chunk: int):
    """Spherical k-means with chunked assignment + one-hot accumulation —
    the multi-million-doc twin of ``_kmeans`` (peak memory per step is
    (chunk, nlist) instead of (N, nlist))."""
    n, d = emb.shape
    init_idx = jax.random.choice(key, n, (nlist,), replace=False)
    cent = emb[init_idx].astype(jnp.float32)
    n_pad = _round_up(n, chunk)
    emb_p = jnp.pad(emb, ((0, n_pad - n), (0, 0)))
    blocks = emb_p.reshape(n_pad // chunk, chunk, d)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (n_pad // chunk, chunk), 0) \
        * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (n_pad // chunk, chunk), 1)
    valid = row0 < n

    def step(cent, _):
        def acc(carry, xs):
            blk, v = xs
            blkf = blk.astype(jnp.float32)
            sim = blkf @ cent.T                          # (chunk, nlist)
            assign = jnp.argmax(sim, axis=1)
            oh = jax.nn.one_hot(assign, nlist, dtype=jnp.float32) \
                * v[:, None]
            return (carry[0] + oh.T @ blkf, carry[1] + oh.sum(0)), None

        (sums, cnt), _ = jax.lax.scan(
            acc, (jnp.zeros((nlist, d), jnp.float32),
                  jnp.zeros((nlist,), jnp.float32)),
            (blocks, valid))
        norms = jnp.linalg.norm(sums, axis=1, keepdims=True)
        new_cent = jnp.where(norms > 1e-6, sums / jnp.maximum(norms, 1e-6),
                             cent)
        return new_cent, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    return cent


def build_ivf_index_device(
    embeddings: jnp.ndarray,
    nlist: int = 2048,
    iters: int = 8,
    seed: int = 0,
    dtype: str = "int8",
    train_subsample: Optional[int] = None,
    assign_chunk: Optional[int] = None,
) -> IvfIndex:
    """IVF build that scales to multi-million-document corpora (the
    regime where IVF can actually beat flat search — ARCHITECTURE
    "Crossover note"): k-means trains on a ``train_subsample`` (FAISS
    practice: ~40 points per centroid), assignments run in chunks so the
    (N, nlist) similarity never materializes, and the bucket fill is one
    device gather instead of ``build_ivf_index``'s Python loop.

    ``embeddings`` is a DEVICE-resident (N, D) array (f32/bf16) — nothing
    round-trips to host except the (N,) assignment vector.  ``dtype``
    follows ``build_ivf_index`` ("int8" quantizes bucket entries per
    vector on device; recommended at scale — the probed-bucket gather is
    IVF's bottleneck and int8 quarters it)."""
    assert dtype in ("float32", "int8"), dtype
    n, d = embeddings.shape
    nlist = min(nlist, max(n, 1))
    key = jax.random.PRNGKey(seed)
    sub = min(n, train_subsample or max(nlist * 40, 4096))
    if assign_chunk is None:
        # keep the per-chunk (chunk, nlist) f32 sim tile around 128 MB
        assign_chunk = max(1024, min(65536, (1 << 27) // max(nlist * 4, 1)))
    if sub < n:
        pick = jax.random.choice(key, n, (sub,), replace=False)
        train = embeddings[pick]
    else:
        train = embeddings
    cent = _kmeans_chunked(train, key, nlist, iters, min(assign_chunk, sub))
    assign = np.asarray(_assign_chunked(embeddings, cent, assign_chunk))

    counts = np.bincount(assign, minlength=nlist)
    bucket_pad = max(8, _round_up(int(counts.max()) if n else 1, 8))
    # vectorized bucket fill: stable-sort rows by bucket, compute each
    # row's within-bucket position, one fancy-index store
    order = np.argsort(assign, kind="stable").astype(np.int64)
    starts = np.zeros(nlist + 1, np.int64)
    starts[1:] = np.cumsum(counts)
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts[:-1], counts)
    rows = np.zeros((nlist, bucket_pad), np.int32)
    rows[assign[order], pos] = order.astype(np.int32)

    rows_j = jnp.asarray(rows)
    gathered = embeddings[rows_j.reshape(-1)].reshape(nlist, bucket_pad, d)
    slot = jax.lax.broadcasted_iota(jnp.int32, (nlist, bucket_pad, 1), 1)
    gathered = jnp.where(slot < jnp.asarray(counts)[:, None, None],
                         gathered, 0).astype(jnp.float32)
    scale = None
    if dtype == "int8":
        vmax = jnp.max(jnp.abs(gathered), axis=2, keepdims=True)
        sc = vmax / 127.0
        inv = jnp.where(sc > 0, 1.0 / jnp.maximum(sc, 1e-30), 0.0)
        buckets = jnp.round(gathered * inv).astype(jnp.int8)
        scale = jnp.squeeze(sc, axis=2)
    else:
        buckets = gathered
    return IvfIndex(
        centroids=cent,
        buckets=buckets,
        bucket_rows=rows_j,
        bucket_counts=jnp.asarray(counts.astype(np.int32)),
        bucket_scale=scale,
        n_docs=n, nlist=nlist, bucket_pad=bucket_pad,
    )


def build_ivf_index(
    embeddings: np.ndarray, nlist: int = 64, iters: int = 10, seed: int = 0,
    dtype: str = "float32",
) -> IvfIndex:
    """``dtype="int8"`` scalar-quantizes the bucket entries per vector
    (centroids and the coarse quantizer stay f32) — the IVF+SQ8 trade."""
    assert dtype in ("float32", "int8"), dtype
    n, d = embeddings.shape
    nlist = min(nlist, max(n, 1))
    emb_j = jnp.asarray(embeddings, jnp.float32)
    cent, assign = _kmeans(emb_j, jax.random.PRNGKey(seed), nlist, iters)
    assign = np.asarray(assign)

    counts = np.bincount(assign, minlength=nlist)
    bucket_pad = max(8, _round_up(int(counts.max()) if n else 1, 8))
    buckets = np.zeros((nlist, bucket_pad, d), np.float32)
    rows = np.zeros((nlist, bucket_pad), np.int32)
    fill = np.zeros(nlist, np.int64)
    for i, c in enumerate(assign):
        buckets[c, fill[c]] = embeddings[i]
        rows[c, fill[c]] = i
        fill[c] += 1
    scale = None
    if dtype == "int8":
        buckets, sc = _sq8_quantize(buckets, axis=2)        # per bucket entry
        scale = jnp.asarray(sc)
    return IvfIndex(
        centroids=cent,
        buckets=jnp.asarray(buckets),
        bucket_rows=jnp.asarray(rows),
        bucket_counts=jnp.asarray(counts.astype(np.int32)),
        bucket_scale=scale,
        n_docs=n, nlist=nlist, bucket_pad=bucket_pad,
    )


@partial(jax.jit, static_argnames=("top_k", "nprobe"))
def ivf_search(index: IvfIndex, q: jnp.ndarray, top_k: int = 10, nprobe: int = 8):
    """Probe the nprobe nearest clusters per query; exact search inside."""
    Q = q.shape[0]
    nprobe = min(nprobe, index.nlist)
    c_sim = q @ index.centroids.T                             # (Q, nlist)
    _, probe = jax.lax.top_k(c_sim, nprobe)                   # (Q, nprobe)

    cand_emb = index.buckets[probe]                           # (Q, np, Bp, D)
    cand_rows = index.bucket_rows[probe]                      # (Q, np, Bp)
    cand_cnt = index.bucket_counts[probe]                     # (Q, np)

    if index.buckets.dtype == jnp.int8:
        # SQ8 buckets: the gather moves 1/4 the f32 bytes; dequantization
        # is one per-vector multiply on the (Q, np, Bp) output
        scores = jnp.einsum("qd,qpbd->qpb", q,
                            cand_emb.astype(jnp.float32))
        scores = scores * index.bucket_scale[probe]
    else:
        scores = jnp.einsum("qd,qpbd->qpb", q, cand_emb)      # (Q, np, Bp)
    slot = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
    scores = jnp.where(slot < cand_cnt[..., None], scores, NEG_INF)

    flat_scores = scores.reshape(Q, -1)
    flat_rows = cand_rows.reshape(Q, -1)
    k = min(top_k, flat_scores.shape[1])
    vals, sel = jax.lax.top_k(flat_scores, k)
    rows = jnp.take_along_axis(flat_rows, sel, axis=1)
    if k < top_k:
        vals = jnp.pad(vals, ((0, 0), (0, top_k - k)), constant_values=-jnp.inf)
        rows = jnp.pad(rows, ((0, 0), (0, top_k - k)))
    return vals, rows


def _encode_texts(
    model, params, cfg, texts: Sequence[str], batch: int = 256,
    pull_group: int = 64,
) -> np.ndarray:
    """Batched encoder forward over a text list with GROUPED device→host
    pulls.

    The per-batch ``np.asarray`` sync costs a full backend round trip
    (30-50 ms on remote-tunnel backends, CLAUDE.md measurement rules) — at
    corpus scale (e.g. the 600k-sentence embedding pass of the sentence
    cascade, team_run1.py:225-239 semantics) per-batch pulling spends
    minutes on RPCs alone.  Here every batch is dispatched asynchronously
    and full batches are pulled ``pull_group`` at a time through one
    device-side concatenate (one transfer per group, ~batch·group rows)."""
    if not texts:
        return np.zeros((0, cfg.dim), np.float32)
    full: list = []          # dispatched (batch, D) device arrays
    outs: List[np.ndarray] = []

    def _flush():
        if not full:
            return
        if len(full) == 1:
            outs.append(np.asarray(full[0]))
        else:
            outs.append(np.asarray(jnp.concatenate(full, axis=0)))
        full.clear()

    tail: List[np.ndarray] = []
    n_texts = len(texts)
    for s in range(0, n_texts, batch):
        chunk = list(texts[s:s + batch])
        n = len(chunk)
        target = _pad_target(n, batch)
        if n < target:
            chunk += [""] * (target - n)
        ids, mask = encode_batch(chunk, cfg.vocab_size, cfg.max_len)
        e = encode(model, params, jnp.asarray(ids), jnp.asarray(mask))
        if n == target:
            full.append(e)
            if len(full) >= pull_group:
                _flush()
        else:
            # ragged tail (different padded shape): pull separately
            tail.append(np.asarray(e)[:n])
    _flush()
    outs.extend(tail)
    return np.concatenate(outs, axis=0)[:n_texts]


# --------------------------------------------------------------------------
# Dense retrieval model (encoder + index + docids)
# --------------------------------------------------------------------------

@dataclass
class DenseModel:
    """Encoder + corpus embedding index, mirroring the reference's
    embed-then-FAISS pipeline as one object."""

    model: DualEncoder
    params: object
    cfg: DenseConfig
    docids: List[str]
    flat: Optional[FlatIndex] = None
    ivf: Optional[IvfIndex] = None

    @classmethod
    def build(
        cls, model: DualEncoder, params, cfg: DenseConfig,
        texts: Sequence[str], docids: Sequence[str],
        batch: int = 256, with_ivf: bool = False,
    ) -> "DenseModel":
        emb = _encode_texts(model, params, cfg, texts, batch)
        out = cls(model=model, params=params, cfg=cfg, docids=list(docids),
                  flat=build_flat_index(emb))
        if with_ivf:
            out.ivf = build_ivf_index(emb, nlist=cfg.ivf_nlist)
        return out

    def encode_queries(self, texts: Sequence[str], batch: int = 256) -> np.ndarray:
        return _encode_texts(self.model, self.params, self.cfg, texts, batch)

    def retrieve(
        self, queries: Sequence[str], k: int = 10, use_ivf: bool = False,
        nprobe: Optional[int] = None,
    ) -> List[List[str]]:
        q = jnp.asarray(self.encode_queries(queries))
        if use_ivf:
            assert self.ivf is not None, "build with with_ivf=True first"
            vals, rows = ivf_search(self.ivf, q, top_k=k,
                                    nprobe=nprobe or self.cfg.ivf_nprobe)
        else:
            vals, rows = flat_search(self.flat, q, top_k=k)
        vals, rows = np.asarray(vals), np.asarray(rows)
        return [
            [self.docids[r] for r, v in zip(qr, qv) if np.isfinite(v)]
            for qr, qv in zip(rows, vals)
        ]


def evaluate_dense(
    dense: DenseModel,
    queries: Sequence[str],
    positives: Sequence[str],
    langs: Optional[Sequence[str]] = None,
    k: int = 10,
    nprobes: Sequence[int] = (1, 2, 4, 8, 16),
) -> dict:
    """Held-out evaluation report for a dense retriever.

    Mirrors the reference's FAISS eval flow
    (faiss_based_ANN_Implementation.py:292-303) but on queries the encoder
    was NOT trained on: flat (exact) recall@k, the IVF recall-vs-nprobe
    curve, and a per-language breakdown when ``langs`` is given."""
    from tdr.eval.metrics import recall_at_k

    report: dict = {"n_queries": len(queries), "k": k}
    flat_res = dense.retrieve(queries, k=k)
    report["flat_recall"] = recall_at_k(flat_res, positives, k)
    if langs is not None:
        by_lang: dict = {}
        for i, l in enumerate(langs):
            by_lang.setdefault(l, []).append(i)
        report["flat_recall_per_lang"] = {
            l: recall_at_k([flat_res[i] for i in idx],
                           [positives[i] for i in idx], k)
            for l, idx in sorted(by_lang.items())
        }
    if dense.ivf is not None:
        nlist = int(dense.ivf.centroids.shape[0])
        report["ivf_recall_vs_nprobe"] = {
            int(p): recall_at_k(
                dense.retrieve(queries, k=k, use_ivf=True, nprobe=int(p)),
                positives, k)
            for p in nprobes if p <= nlist
        }
    return report
