"""L2 index build: term-doc statistics + the sparse score-row index, on device.

The reference builds its index with Python dict loops — per-doc Counters, DF
dicts, inverted index lists (BM25.build, bm25_ranking.ipynb:178-190;
compute_tf_df_and_avgdl, cosine_similarity_bm25_reranking.py:129-172).  Here
the whole build is XLA segment ops over flat COO arrays: DF via segment_sum,
IDF as a vectorized formula, CSR layout via one stable sort — jittable passes
(SURVEY.md §7 step 2).

TPU-first layout — the *sparse score-row index*:

Every retrieval model in the reference (Okapi BM25, TF-IDF cosine) scores a
query as  ``score(q, d) = Σ_t  q_weight[t] · row[t, d]``  where ``row`` is a
per-term vector over documents (BM25: idf·tf·(k1+1)/(tf+k1·(1−b+dl/avgdl));
TF-IDF: normalized tf·idf).  Postings lengths span 1..200k+ docs, which a
static-shape machine cannot gather uniformly, so rows are split by document
frequency:

* **head** — the top-D terms by df (D capped by an HBM byte budget) get
  fully dense rows ``head_rows (D, N_pad)``.  These terms own almost all
  nnz mass; scoring them is sequential row gathers + VPU accumulate
  (HBM-bandwidth bound, no MXU waste on one-hot matmuls).
* **tail** — everything else stays in a flat CSR (sorted by term) and is
  scored with static-width masked gathers: tail df is bounded by the head
  threshold, so ``tail_pmax`` is a true static bound, not a truncation.

Global statistics (idf, avgdl, head-term selection) are *inputs* to the core
build so a document-sharded index (tdr.parallel) can inject corpus-global
values while each shard lays out only its local postings.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tdr.utils.config import BM25Config, IndexConfig


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bucket(n: int, multiple: int = 128) -> int:
    """Round n up onto a {2^k, 1.5·2^k} geometric grid (then to a hardware
    multiple) — static-shape quantization so jit kernels are shared across
    corpora (see IndexConfig.shape_bucketing)."""
    n = max(n, 1)
    k = max((n - 1).bit_length() - 1, 0)
    for cand in (1 << k, (3 << k) // 2, 1 << (k + 1), 3 << k):
        if cand >= n:
            return _round_up(cand, multiple)
    return _round_up(n, multiple)


# --------------------------------------------------------------------------
# IDF — all three reference variants (SURVEY.md §2a "IDF computation")
# --------------------------------------------------------------------------

def compute_idf(df: jnp.ndarray, n_docs: int, variant: str = "bm25") -> jnp.ndarray:
    """df (V,) → idf (V,).

    variant="bm25":       ln(1 + (N-df+0.5)/(df+0.5))   bm25_ranking.ipynb:188-190
    variant="bm25_plus1": ln((N-df+0.5)/(df+0.5) + 1)   team_run1.py:187 (same value)
    variant="classic":    ln((N+1)/(df+1)) + 1          faiss_based_ANN_Implementation.py:88
    """
    df = df.astype(jnp.float32)
    n = jnp.float32(n_docs)
    if variant in ("bm25", "bm25_plus1"):
        return jnp.log1p((n - df + 0.5) / (df + 0.5))
    if variant == "classic":
        return jnp.log((n + 1.0) / (df + 1.0)) + 1.0
    raise ValueError(f"unknown idf variant: {variant}")


@partial(jax.jit, static_argnames=("vocab_size",))
def segment_df(term_ids: jnp.ndarray, vocab_size: int) -> jnp.ndarray:
    """Document frequency per term from COO term ids (padding = vocab_size)."""
    valid = term_ids < vocab_size
    return jax.ops.segment_sum(
        valid.astype(jnp.float32),
        jnp.where(valid, term_ids, 0),
        num_segments=vocab_size,
    )


def _compute_idf_np(df: np.ndarray, n_docs: int, variant: str) -> np.ndarray:
    """Host-numpy twin of compute_idf (keeps the no-sync build path pure)."""
    df = np.asarray(df, np.float32)
    n = np.float32(n_docs)
    if variant in ("bm25", "bm25_plus1"):
        return np.log1p((n - df + 0.5) / (df + 0.5)).astype(np.float32)
    if variant == "classic":
        return (np.log((n + 1.0) / (df + 1.0)) + 1.0).astype(np.float32)
    raise ValueError(f"unknown idf variant: {variant}")


def _select_head_np(df: np.ndarray, head_size: int) -> np.ndarray:
    """Host-numpy twin of select_head, matching lax.top_k tie order
    (descending value, lowest index first)."""
    vocab_size = df.shape[0]
    head_slot = np.full(vocab_size, -1, np.int32)
    if head_size > 0:
        order = np.lexsort((np.arange(vocab_size), -np.asarray(df)))[:head_size]
        keep = np.asarray(df)[order] > 0
        head_slot[order[keep]] = np.arange(head_size, dtype=np.int32)[keep]
    return head_slot


@partial(jax.jit, static_argnames=("head_size",))
def select_head(df: jnp.ndarray, head_size: int) -> jnp.ndarray:
    """head_slot (V,): slot id in [0, head_size) for the top-df terms, -1 else."""
    vocab_size = df.shape[0]
    head_slot = jnp.full((vocab_size,), -1, jnp.int32)
    if head_size > 0:
        head_df, head_terms = jax.lax.top_k(df, head_size)
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (head_size, 1), 0).squeeze(-1)
        head_slot = head_slot.at[head_terms].set(jnp.where(head_df > 0, slot_ids, -1))
    return head_slot


@jax.jit
def _quantize_head_rows(head_rows: jnp.ndarray):
    """Per-doc-column symmetric int8 quantization of the dense head.

    Scale granularity is the DOCUMENT column (the matmul's output axis):
    ``head[d, n] ≈ q8[d, n] * scale[n]``, so the scale factors out of the
    term-sum and is applied AFTER the int8×int8→int32 MXU contraction —
    nothing approximate ever enters the reduction itself.  Score weights
    are >= 0 (idf·tf-saturation), so the full [0, 127] range is used.
    Empty (padded) doc columns get scale 0 and stay exactly zero.

    The FAISS scalar-quantizer (SQ8) analogue for the sparse engine: the
    reference stores f32 postings (bm25_ranking.ipynb:158-205); this trades
    ~0.4% per-entry rounding for half the HBM traffic of bf16 and the 2×
    int8 MXU rate."""
    rows = head_rows.astype(jnp.float32)
    colmax = jnp.max(jnp.abs(rows), axis=0)                  # (N_pad,)
    scale = colmax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q8 = jnp.round(rows * inv[None, :]).astype(jnp.int8)
    return q8, scale


def quantize_head(index: "SparseIndex") -> "SparseIndex":
    """Return a copy of ``index`` with an int8 scalar-quantized head
    (see ``_quantize_head_rows``).  No-op if already quantized."""
    if index.head_rows.dtype == jnp.int8:
        return index
    q8, scale = _quantize_head_rows(index.head_rows)
    return dataclasses.replace(index, head_rows=q8, head_scale=scale)


# --------------------------------------------------------------------------
# Index containers (pytrees)
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass
class IndexStats:
    """Per-partition statistics (the reference's tf/df/avgdl pickles).

    ``df`` is the LOCAL postings length per term (drives CSR segment bounds);
    ``idf`` and ``avgdl`` are GLOBAL when the index is a shard of a larger
    corpus.
    """

    df: jnp.ndarray          # (V,) float32 — local postings length
    idf: jnp.ndarray         # (V,) float32 — global idf
    doc_len: jnp.ndarray     # (N_pad,) float32, zero beyond n_docs
    avgdl: jnp.ndarray       # () float32 — global average doc length


@jax.tree_util.register_dataclass
@dataclass
class SparseIndex:
    """Sparse score-row index: dense head + flat-CSR tail.

    Static (aux) fields carry shapes the scoring jit specializes on.
    """

    # flat CSR over ALL terms (canonical artifact; checkpointed)
    indptr: jnp.ndarray          # (V+1,) int32
    postings_doc: jnp.ndarray    # (nnz_pad,) int32, padded with 0
    postings_w: jnp.ndarray      # (nnz_pad,) float32 score weights, padded 0
    postings_tf: jnp.ndarray     # (nnz_pad,) float32 raw tf, padded 0
    # dense head
    head_slot: jnp.ndarray       # (V,) int32: slot in head_rows, or -1
    head_rows: jnp.ndarray       # (D, N_pad) float32/bf16, or int8 quantized
    stats: IndexStats
    # per-doc-column dequantization scale for int8 heads (None otherwise):
    # head[d, n] ≈ head_rows[d, n] * head_scale[n].  The scale rides the
    # OUTPUT axis of the score matmul, so scoring runs int8×int8→int32 on
    # the MXU and rescales the (Q, N) result — see _head_scores_matmul.
    head_scale: Optional[jnp.ndarray] = None   # (N_pad,) float32

    n_docs: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_docs_pad: int = dataclasses.field(metadata=dict(static=True), default=0)
    vocab_size: int = dataclasses.field(metadata=dict(static=True), default=0)
    tail_pmax: int = dataclasses.field(metadata=dict(static=True), default=0)
    head_size: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def nnz(self) -> int:
        return int(self.postings_doc.shape[0])

    def memory_bytes(self) -> int:
        return int(sum(
            np.prod(x.shape) * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(self)
        ))


# --------------------------------------------------------------------------
# Device-side build core
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=(
    "vocab_size", "n_docs_pad", "head_size", "k1", "b", "dl_scaled_by_b",
    "weight_kind"))
def _build_core(
    doc_ids: jnp.ndarray,      # (nnz_pad,) int32, padding has term_id == vocab_size
    term_ids: jnp.ndarray,     # (nnz_pad,) int32
    tfs: jnp.ndarray,          # (nnz_pad,) float32, padded 0
    doc_len: jnp.ndarray,      # (n_docs_pad,) float32
    idf: jnp.ndarray,          # (V,) float32 — possibly corpus-global
    head_slot: jnp.ndarray,    # (V,) int32 — possibly corpus-global selection
    avgdl: jnp.ndarray,        # () float32 — possibly corpus-global
    *,
    vocab_size: int,
    n_docs_pad: int,
    head_size: int,
    k1: float,
    b: float,
    dl_scaled_by_b: bool,
    weight_kind: str,          # "bm25" | "tfidf"
):
    valid = term_ids < vocab_size
    t_clamped = jnp.where(valid, term_ids, 0)
    d_clamped = jnp.clip(doc_ids, 0, n_docs_pad - 1)

    # local postings length per term (CSR segment bounds)
    df_local = jax.ops.segment_sum(valid.astype(jnp.float32), t_clamped,
                                   num_segments=vocab_size)

    # per-entry score weight
    dl = doc_len[d_clamped]
    if weight_kind == "bm25":
        # denominator: tf + k1*(1 - b + [b·]dl/avgdl); the winning reference
        # variant does NOT scale dl/avgdl by b (bm25_ranking.ipynb:202)
        norm = (b if dl_scaled_by_b else 1.0) * dl / avgdl
        denom = tfs + k1 * (1.0 - b + norm)
        w = idf[t_clamped] * tfs * (k1 + 1.0) / jnp.where(denom > 0, denom, 1.0)
    elif weight_kind == "tfidf":
        w = idf[t_clamped] * tfs
    else:
        raise ValueError(weight_kind)
    w = jnp.where(valid, w, 0.0)

    if weight_kind == "tfidf":
        # per-doc L2 norm over tfidf values
        sq = jax.ops.segment_sum(w * w, d_clamped, num_segments=n_docs_pad)
        inv = jnp.where(sq > 0, jax.lax.rsqrt(sq), 0.0)
        w = w * inv[d_clamped]

    # CSR layout: stable sort by term id (padding term_id==V sorts last)
    order = jnp.argsort(term_ids, stable=True)
    postings_doc = jnp.where(valid[order], doc_ids[order], 0).astype(jnp.int32)
    postings_w = w[order]
    postings_tf = jnp.where(valid[order], tfs[order], 0.0)
    indptr = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(df_local.astype(jnp.int32))]
    )

    # dense head rows: scatter premultiplied weights
    entry_slot = head_slot[t_clamped]
    in_head = (entry_slot >= 0) & valid
    head_rows = jnp.zeros((max(head_size, 1), n_docs_pad), jnp.float32)
    head_rows = head_rows.at[
        jnp.where(in_head, entry_slot, 0), d_clamped
    ].add(jnp.where(in_head, w, 0.0))

    # max LOCAL tail df → static gather width (host reads it afterwards)
    tail_df_max = jnp.max(jnp.where(head_slot >= 0, 0.0, df_local)) if vocab_size else jnp.float32(0)

    return indptr, postings_doc, postings_w, postings_tf, head_rows, df_local, tail_df_max


def _pad_docs(n_docs: int, cfg: IndexConfig) -> int:
    n_docs_pad = max(_round_up(max(n_docs, 1), cfg.doc_pad_multiple),
                     cfg.doc_pad_multiple)
    if cfg.shape_bucketing:
        n_docs_pad = _bucket(n_docs_pad, cfg.doc_pad_multiple)
    return n_docs_pad


def _head_itemsize(cfg: IndexConfig) -> int:
    return {"bfloat16": 2, "int8": 1}.get(cfg.head_dtype, 4)


def full_head_bytes(vocab_size: int, n_docs: int, cfg: IndexConfig) -> int:
    """HBM bytes needed to give EVERY vocab term a dense head row — beyond
    this the tail is empty (pure-MXU scoring) and more budget is useless.
    Used by the router's waterfill budget split."""
    n_docs_pad = _pad_docs(n_docs, cfg)
    vocab_pad = _bucket(max(vocab_size, 1), 128) if cfg.shape_bucketing else vocab_size
    return vocab_pad * n_docs_pad * _head_itemsize(cfg)


def _auto_head_size(vocab_size: int, n_docs_pad: int, cfg: IndexConfig) -> int:
    """Head row count from the HBM byte budget (at the configured row dtype:
    bf16 rows fit twice as many terms per byte as f32)."""
    if n_docs_pad == 0:
        return 0
    d = int(cfg.head_budget_bytes // (_head_itemsize(cfg) * n_docs_pad))
    d = max(0, min(d, vocab_size))
    return (d // 8) * 8 if d >= 8 else (1 if d > 0 else 0)


def _pad_coo(doc_ids, term_ids, tfs, vocab_size, nnz_pad):
    nnz = int(doc_ids.shape[0])
    di = np.zeros(nnz_pad, np.int32)
    ti = np.full(nnz_pad, vocab_size, np.int32)   # sentinel pads sort last
    tv = np.zeros(nnz_pad, np.float32)
    di[:nnz] = doc_ids
    ti[:nnz] = term_ids
    tv[:nnz] = tfs
    return di, ti, tv


def build_index(
    doc_ids: np.ndarray,
    term_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    vocab_size: int,
    bm25: BM25Config = BM25Config(),
    index_cfg: IndexConfig = IndexConfig(),
    weight_kind: str = "bm25",
    head_size: Optional[int] = None,
    # sharded-build overrides (corpus-global statistics)
    idf: Optional[np.ndarray] = None,
    head_slot: Optional[np.ndarray] = None,
    avgdl: Optional[float] = None,
    n_docs_pad: Optional[int] = None,
    nnz_pad: Optional[int] = None,
    tail_pmax: Optional[int] = None,
    df_host: Optional[np.ndarray] = None,
) -> SparseIndex:
    """Host wrapper: pad COO to static shapes, run the jitted build, derive
    the static tail gather width.

    Inputs are the COO arrays from ``tdr.text.encode_docs`` (one entry per
    unique (doc, term) pair).  The ``idf``/``head_slot``/``avgdl`` overrides
    let ``tdr.parallel`` build document shards against corpus-global stats.

    ``df_host`` (the vocab's document frequencies, already known to the
    fast encoder) moves idf / head selection / tail_pmax to host numpy so
    the build dispatches WITHOUT any device sync: the per-language builds
    of a multilingual corpus then overlap on the device queue instead of
    serializing on a tail_pmax round trip each (39 s of 67 s at reference
    scale measured through the remote tunnel).
    """
    n_docs = int(doc_lens.shape[0])
    bucketing = index_cfg.shape_bucketing
    if n_docs_pad is None:
        n_docs_pad = _pad_docs(n_docs, index_cfg)
    nnz = int(doc_ids.shape[0])
    nnz_pad_injected = nnz_pad
    if nnz_pad is None:
        nnz_pad = max(_round_up(max(nnz, 1), index_cfg.nnz_pad_multiple),
                      index_cfg.nnz_pad_multiple)
        if bucketing:
            nnz_pad = _bucket(nnz_pad, index_cfg.nnz_pad_multiple)
    # vocab axis is also a static dim (indptr, idf, head_slot shapes);
    # padding terms get df=0 and are unreachable from queries
    vocab_pad = _bucket(max(vocab_size, 1), 128) if bucketing else vocab_size

    di, ti, tv = _pad_coo(doc_ids, term_ids, tfs, vocab_pad, nnz_pad)
    dl = np.zeros(n_docs_pad, np.float32)
    dl[:n_docs] = doc_lens

    # global statistics (computed locally unless injected by a sharded build)
    if idf is not None:
        # injected arrays fix the vocab axis (sharded builds)
        vocab_pad = int(np.asarray(idf).shape[0])
    if idf is None or head_slot is None:
        if df_host is not None:
            # host path: no device round trip anywhere in this build
            df_g = np.zeros(vocab_pad, np.float32)
            df_g[:len(df_host)] = np.asarray(df_host, np.float32)
        else:
            df_g = segment_df(jnp.asarray(ti), vocab_pad)
        if idf is None:
            idf = (_compute_idf_np(df_g, n_docs, bm25.idf_variant)
                   if df_host is not None
                   else compute_idf(df_g, n_docs, bm25.idf_variant))
        if head_slot is None:
            if head_size is None:
                if index_cfg.head_min_df > 0:
                    head_size = int(np.sum(np.asarray(df_g) >= index_cfg.head_min_df)
                                    if df_host is not None
                                    else jnp.sum(df_g >= index_cfg.head_min_df))
                else:
                    head_size = _auto_head_size(vocab_pad, n_docs_pad, index_cfg)
                if bucketing and 256 < head_size < vocab_pad:
                    head_size = (head_size // 256) * 256   # floor: stay in budget
                    # (skipped at full vocab coverage — flooring there would
                    # re-create a tail the budget already paid to eliminate)
            head_size = min(head_size, vocab_pad)
            head_slot = (_select_head_np(df_g, head_size)
                         if df_host is not None
                         else select_head(df_g, head_size))
        if df_host is not None and tail_pmax is None:
            tail_df = df_g[np.asarray(head_slot) < 0]
            tail_pmax = int(tail_df.max()) if tail_df.size else 0
            if tail_pmax <= 0:
                tail_pmax = 8
            elif bucketing:
                tail_pmax = _bucket(tail_pmax, 8)
            else:
                tail_pmax = max(8, _round_up(tail_pmax, 128))
    if head_size is None:
        head_size = int(jnp.max(head_slot)) + 1 if vocab_pad else 0
    if avgdl is None:
        avgdl = float(doc_lens.sum() / max(n_docs, 1))

    (indptr, postings_doc, postings_w, postings_tf, head_rows, df_local,
     tail_df_max) = _build_core(
        jnp.asarray(di), jnp.asarray(ti), jnp.asarray(tv), jnp.asarray(dl),
        jnp.asarray(idf, dtype=jnp.float32), jnp.asarray(head_slot),
        jnp.asarray(avgdl, dtype=jnp.float32),
        vocab_size=vocab_pad, n_docs_pad=n_docs_pad,
        head_size=head_size, k1=bm25.k1,
        b=bm25.b, dl_scaled_by_b=bm25.dl_scaled_by_b, weight_kind=weight_kind,
    )

    head_scale = None
    if index_cfg.head_dtype == "bfloat16":
        head_rows = head_rows.astype(jnp.bfloat16)
    elif index_cfg.head_dtype == "int8":
        head_rows, head_scale = _quantize_head_rows(head_rows)

    if tail_pmax is None:
        tail_pmax = int(np.asarray(tail_df_max))
        if tail_pmax <= 0:
            tail_pmax = 8
        elif bucketing:
            tail_pmax = _bucket(tail_pmax, 8)
        else:
            tail_pmax = max(8, _round_up(tail_pmax, 128))

    # segment-DMA bounds invariant (tdr.ops.pallas_tail): a tail-segment DMA
    # reads a 1024-aligned window of up to round_up(tail_pmax+1023, 1024)
    # entries starting at/below the segment start (<= nnz), so the postings
    # arrays must extend that far past the last real entry.  When nnz_pad
    # was injected (sharded builds: every shard must share one shape) grow
    # from the injected pad, not the local nnz, so the target is identical
    # across shards.
    dma_win = _round_up(tail_pmax + 1023, 1024)
    need = (nnz_pad_injected + dma_win if nnz_pad_injected is not None
            else nnz + dma_win)
    if int(postings_doc.shape[0]) < need:
        grow = (_bucket(need, index_cfg.nnz_pad_multiple) if bucketing
                else _round_up(need, index_cfg.nnz_pad_multiple))
        pad = grow - int(postings_doc.shape[0])
        postings_doc = jnp.pad(postings_doc, (0, pad))
        postings_w = jnp.pad(postings_w, (0, pad))
        postings_tf = jnp.pad(postings_tf, (0, pad))

    stats = IndexStats(df=df_local, idf=jnp.asarray(idf, dtype=jnp.float32),
                       doc_len=jnp.asarray(dl),
                       avgdl=jnp.asarray(avgdl, dtype=jnp.float32))
    return SparseIndex(
        indptr=indptr,
        postings_doc=postings_doc,
        postings_w=postings_w,
        postings_tf=postings_tf,
        head_slot=jnp.asarray(head_slot),
        head_rows=head_rows,
        stats=stats,
        head_scale=head_scale,
        n_docs=n_docs,
        n_docs_pad=n_docs_pad,
        vocab_size=vocab_pad,
        tail_pmax=tail_pmax,
        head_size=head_size,
    )


def build_tfidf_index(*args, **kwargs) -> SparseIndex:
    """TF-IDF cosine index: same layout, L2-normalized tf·idf rows
    (cosine_similarity_bm25_reranking.py:72-110 + :210-211 semantics —
    the hand-rolled sparse embedder with classic idf, normalized docs)."""
    kwargs.setdefault("weight_kind", "tfidf")
    bm25 = kwargs.pop("bm25", BM25Config(idf_variant="classic"))
    if bm25.idf_variant == "bm25":
        bm25 = dataclasses.replace(bm25, idf_variant="classic")
    return build_index(*args, bm25=bm25, **kwargs)
