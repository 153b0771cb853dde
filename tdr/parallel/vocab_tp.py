"""Vocab-axis tensor parallelism for the sparse full-head engine.

SURVEY §2c's TP row: "shard the vocab axis of the CSR index … when |V|
exceeds one chip's HBM" — the motivating case is the reference's en
partition, whose bigram-inflated term_freqs needed 208 pickle shards just
to fit Kaggle I/O (final_implementation.py:228).  At production settings
tdr's en index is a FULL-VOCAB HEAD (the waterfill budget saturates it,
tdr/rank/router.py), so its entire scoring engine is one (Q, D) x (D, N)
matmul — and TP over the vocab axis is plain matmul tensor parallelism:

* ``head_rows`` is split along the head-slot (D) axis over the mesh
  "model" axis: each device holds (D/S, N) — 1/S of the index HBM, the
  capacity win the strategy exists for;
* each device scatters its slice of the query weights (terms whose slot
  falls in its range) and computes a PARTIAL (Q, N) score matrix;
* partials are summed with ``psum_scatter`` along the DOC axis — each
  device ends with the fully-summed (Q, N/S) slice, so the full (Q, N)
  matrix is never replicated (an all-reduce would move S× the bytes);
* local top-k per doc slice (the same grouped top-k as the single-chip
  path), then an ``all_gather`` of (Q, k) candidates + global merge —
  identical to the doc-sharded merge (tdr/parallel/sharded.py).

**Hybrid TP for tail-bearing indexes** (round 5 — VERDICT r4 top item):
at reference vocabulary scale the head budget does NOT cover the vocab
(stress en: 5,632 head slots over 232k terms, head coverage 2.4% —
exactly SURVEY §2c's "|V| exceeds one chip's HBM" case, the en
term_freqs that needed 208 pickle shards,
/root/reference/final_implementation.py:228).  The hybrid composes:

* the head (the HBM capacity problem — its bytes are the budget) is
  slot-sharded exactly as above: 1/S of the head per device;
* the tail CSR is REPLICATED per device — tail df is bounded by the
  head threshold, so tail postings are a small fraction of the head's
  bytes (the measured stress-en ratio is recorded in the bench's
  ``stress_vocab_tp`` section); the replicated copy strips the head
  rows, so only CSR arrays + stats travel;
* after ``psum_scatter`` each device owns the fully-summed head scores
  for its doc slice [me·n_loc, (me+1)·n_loc) — tail postings are
  compacted ONCE per device (replicated work, no collective) and
  scatter-added only where their doc falls in that slice, so the tail
  contribution needs no extra communication at all;
* queries that overflow the compaction budget fall back to the exact
  in-range postings scatter inside the same program (rare: the budget
  floors at 4x the widest tail posting list, mirroring the single-chip
  engine's guarantee).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tdr.index.build import SparseIndex, _round_up
from tdr.ops.score import NEG_INF, _tail_compact, int8_head_matmul
from tdr.ops.topk import fast_topk


@jax.tree_util.register_dataclass
@dataclass
class VocabShardedIndex:
    """Head-slot-sharded index for TP; hybrid when the index has a tail.

    ``tail_index`` is None for full-vocab-head indexes (pure matmul TP);
    for tail-bearing indexes it is the original SparseIndex with the head
    rows stripped to a dummy — the CSR postings, df stats and head_slot
    travel REPLICATED to every device (small next to the sharded head,
    which is the capacity problem TP solves)."""

    head_rows: jnp.ndarray       # (S, D_loc, N_pad) — slot-axis shards
    head_slot: jnp.ndarray       # (V,) int32, global slot ids (replicated)
    # int8-quantized heads: per-doc-column scale, split along the doc axis
    # to match psum_scatter's tiling (device i dequantizes its own slice
    # AFTER the collective — the per-column factor distributes over the
    # device sum, and the partials travel as exact-integer-valued f32)
    head_scale: "jnp.ndarray | None" = None   # (S, N_pad // S) float32
    tail_index: "SparseIndex | None" = None   # replicated tail CSR (hybrid)
    n_docs: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_docs_pad: int = dataclasses.field(metadata=dict(static=True), default=0)
    vocab_size: int = dataclasses.field(metadata=dict(static=True), default=0)
    d_local: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_shards: int = dataclasses.field(metadata=dict(static=True), default=1)

    def per_device_bytes(self) -> dict:
        """Measured per-device HBM layout (not arithmetic): sharded head
        slice + replicated tail arrays."""
        head = int(np.prod(self.head_rows.shape[1:])
                   * self.head_rows.dtype.itemsize)
        if self.head_scale is not None:
            head += int(np.prod(self.head_scale.shape[1:]) * 4)
        tail = 0
        if self.tail_index is not None:
            tail = int(sum(
                np.prod(x.shape) * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves(self.tail_index)))
        repl = int(self.head_slot.shape[0] * 4)
        return {"head_shard_bytes": head, "replicated_tail_bytes": tail,
                "replicated_slot_bytes": repl,
                "total_per_device_bytes": head + tail + repl}


def vocab_shard_layout(index: SparseIndex, n_shards: int) -> dict:
    """Per-device byte layout of ``vocab_shard_index(index, n_shards)``
    WITHOUT materializing the shards — the same shape arithmetic the
    sharder applies, for capacity planning at shard counts the current
    host cannot hold (bench ``stress_vocab_tp`` tp8 sizing)."""
    D, N = index.head_rows.shape
    d_loc = _round_up(-(-D // n_shards), 8)
    n_pad = _round_up(-(-N // n_shards), 128) * n_shards
    head = d_loc * n_pad * index.head_rows.dtype.itemsize
    if index.head_scale is not None:
        head += (n_pad // n_shards) * 4
    tail = 0
    if index.head_size < index.vocab_size:
        nnz = int(index.postings_doc.shape[0])
        V = int(index.head_slot.shape[0])
        # indptr + postings_doc (i32) + postings_w (f32) + df (f32)
        # + the head_slot copy embedded in the tail pytree
        tail = (V + 1) * 4 + nnz * 8 + V * 4 + V * 4
    repl = int(index.head_slot.shape[0]) * 4
    return {"n_shards": n_shards, "head_shard_bytes": int(head),
            "replicated_tail_bytes": int(tail),
            "replicated_slot_bytes": repl,
            "total_per_device_bytes": int(head + tail + repl)}


def vocab_shard_index(index: SparseIndex, n_shards: int) -> VocabShardedIndex:
    """Split a SparseIndex along the head-slot axis for TP.

    Full-vocab-head indexes shard into a pure-matmul TP engine; indexes
    with a tail (``head_size < vocab_size`` — the reference-scale en
    regime) get the HYBRID layout: sharded head + replicated tail CSR
    (see module docstring).  Pads D and N to multiples of the shard count
    (padded slots score 0, padded docs are masked)."""
    D, N = index.head_rows.shape
    d_loc = _round_up(-(-D // n_shards), 8)
    n_pad = _round_up(-(-N // n_shards), 128) * n_shards
    rows = index.head_rows
    scale = index.head_scale
    if d_loc * n_shards != D or n_pad != N:
        rows = jnp.pad(rows, ((0, d_loc * n_shards - D), (0, n_pad - N)))
        if scale is not None:
            scale = jnp.pad(scale, (0, n_pad - N))
    tail_index = None
    if index.head_size < index.vocab_size:
        # strip everything the tail scorer does not read (the head travels
        # sharded above; postings_tf/doc_len/idf serve PRF and rebuild
        # paths, not _tail_compact) — the replicated copy is indptr +
        # postings_doc/w + df + head_slot only.  head_slot stays inside so
        # _tail_compact can identify tail terms.
        dummy = jnp.zeros((1,), jnp.float32)
        tail_index = dataclasses.replace(
            index, head_rows=jnp.zeros((1, 1), index.head_rows.dtype),
            head_scale=None,
            postings_tf=dummy,
            stats=dataclasses.replace(index.stats, doc_len=dummy,
                                      idf=dummy))
    return VocabShardedIndex(
        head_rows=rows.reshape(n_shards, d_loc, n_pad),
        head_slot=index.head_slot,
        head_scale=(None if scale is None
                    else scale.reshape(n_shards, n_pad // n_shards)),
        tail_index=tail_index,
        n_docs=index.n_docs,
        n_docs_pad=n_pad,
        vocab_size=index.vocab_size,
        d_local=d_loc,
        n_shards=n_shards,
    )


@partial(jax.jit, static_argnames=("mesh", "top_k", "axis", "tail_budget"))
def vocab_tp_score_topk(
    mesh: Mesh,
    vindex: VocabShardedIndex,
    qids: jnp.ndarray,
    qw: jnp.ndarray,
    top_k: int = 10,
    axis: str = "model",
    tail_budget: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score replicated queries against the vocab-sharded head.

    Per device: partial matmul over its slot range → ``psum_scatter``
    (doc axis) → [hybrid: in-range tail scatter-add] → masked local
    top-k → ``all_gather`` + global merge.
    Returns (vals (Q, k), doc rows (Q, k)), replicated.
    """
    S = vindex.n_shards
    N = vindex.n_docs_pad
    n_loc = N // S
    d_loc = vindex.d_local
    Q, T = qids.shape
    k_local = min(top_k, n_loc)

    def local_fn(head_pack, head_slot, tail_index, qids, qw):
        rows, hs = head_pack
        rows = rows[0]                                     # (d_loc, N)
        me = jax.lax.axis_index(axis)
        qids_c = jnp.clip(qids, 0, vindex.vocab_size - 1)
        slot = head_slot[qids_c]
        local_slot = slot - me * d_loc
        active = (slot >= 0) & (qw > 0) & (local_slot >= 0) & (local_slot < d_loc)
        q_idx = jax.lax.broadcasted_iota(jnp.int32, (Q, T), 0)
        W = jnp.zeros((Q, d_loc), jnp.float32).at[
            q_idx.reshape(-1),
            jnp.where(active, local_slot, 0).reshape(-1),
        ].add(jnp.where(active, qw, 0.0).reshape(-1))
        if rows.dtype == jnp.int8:
            # int8 head: the partial contraction runs int8×int8→int32 on
            # the MXU; the per-doc-column dequantization scale distributes
            # over the device sum, so it is applied AFTER psum_scatter to
            # the local doc slice only
            part = int8_head_matmul(W, rows)               # (Q, N) partial
        else:
            W = W.astype(rows.dtype)                       # native MXU matmul
            part = jnp.einsum("qd,dn->qn", W, rows,
                              preferred_element_type=jnp.float32)
        # sum partials AND shard the doc axis in one collective: each device
        # ends with the fully-summed (Q, n_loc) slice of the score matrix
        scores = jax.lax.psum_scatter(part, axis, scatter_dimension=1,
                                      tiled=True)          # (Q, n_loc)
        if hs is not None:
            scores = scores * hs[0][None, :]
        if tail_index is not None:
            # HYBRID: tail contributions for THIS device's doc slice.  The
            # compaction is replicated work (cheap sorts over the term
            # table); the scatter keeps only in-range postings, so the
            # tail needs no collective of its own.  Tail values are exact
            # f32 added after dequantization — same semantics as the
            # single-chip fused engine.
            budget = min(max(tail_budget, 4 * tail_index.tail_pmax),
                         16 * tail_index.tail_pmax)
            docs, vals, act, overflow = _tail_compact(
                tail_index, qids_c, qw, budget)
            dloc_doc = docs - me * n_loc
            inr = act & (dloc_doc >= 0) & (dloc_doc < n_loc)
            b_idx = jax.lax.broadcasted_iota(jnp.int32, docs.shape, 0)
            compacted = scores.at[
                b_idx.reshape(-1),
                jnp.where(inr, dloc_doc, 0).reshape(-1),
            ].add(jnp.where(inr, vals, 0.0).reshape(-1))

            def exact_tail(scores):
                # rare overflow fallback: scatter the RAW in-range postings
                # (the single-chip engine's exact-scatter twin, restricted
                # to this device's slice) for the whole batch
                Pw = tail_index.tail_pmax
                t_slot = tail_index.head_slot[qids_c]
                df = tail_index.stats.df[qids_c].astype(jnp.int32)
                start = tail_index.indptr[qids_c]
                is_tail = (t_slot < 0) & (qw > 0)
                offs = jax.lax.broadcasted_iota(jnp.int32, (Q, T, Pw), 2)
                pos = start[..., None] + offs
                mask = (offs < df[..., None]) & is_tail[..., None]
                pos_c = jnp.clip(pos, 0, tail_index.postings_doc.shape[0] - 1)
                d_all = tail_index.postings_doc[pos_c] - me * n_loc
                v_all = tail_index.postings_w[pos_c] * qw[..., None]
                ok = mask & (d_all >= 0) & (d_all < n_loc)
                qq = jax.lax.broadcasted_iota(jnp.int32, (Q, T, Pw), 0)
                return scores.at[
                    qq.reshape(-1), jnp.where(ok, d_all, 0).reshape(-1)
                ].add(jnp.where(ok, v_all, 0.0).reshape(-1))

            scores = jax.lax.cond(jnp.any(overflow), exact_tail,
                                  lambda s: compacted, scores)
        # mask padded/invalid docs in GLOBAL coordinates
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_loc), 1) + me * n_loc
        scores = jnp.where(col < vindex.n_docs, scores, NEG_INF)
        vals, rloc = fast_topk(scores, k_local)
        grows = jnp.where(jnp.isfinite(vals), rloc + me * n_loc, 0)
        vals_g = jax.lax.all_gather(vals, axis)            # (S, Q, k)
        rows_g = jax.lax.all_gather(grows, axis)
        return vals_g, rows_g

    vals_g, rows_g = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )((vindex.head_rows, vindex.head_scale), vindex.head_slot,
      vindex.tail_index, qids, qw)

    vals_m = jnp.transpose(vals_g, (1, 0, 2)).reshape(Q, S * k_local)
    rows_m = jnp.transpose(rows_g, (1, 0, 2)).reshape(Q, S * k_local)
    k_eff = min(top_k, S * k_local)
    # exact lax.top_k tie order on the merged candidates: 2-key sort by
    # (-val, global row) — shard-major concatenation is not row-ordered
    negv, rsel = jax.lax.sort((-vals_m, rows_m), num_keys=2)
    vals, rows = -negv[:, :k_eff], rsel[:, :k_eff]
    if k_eff < top_k:
        pad = top_k - k_eff
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
    return vals, rows


@dataclass
class VocabTpBM25Model:
    """Router-compatible wrapper: the same ``topk_tokens`` surface as
    ``SparseModel`` over a vocab-TP index (mixes into a ``LanguageRouter``
    alongside single-chip and doc-sharded models)."""

    vocab: object
    vindex: VocabShardedIndex
    docids: list
    mesh: Mesh
    lang: str = "en"
    max_query_terms: int = 64

    @classmethod
    def from_model(cls, model, mesh: Mesh, axis: str = "model"):
        n = mesh.shape[axis]
        return cls(vocab=model.vocab,
                   vindex=vocab_shard_index(model.index, n),
                   docids=list(model.docids), mesh=mesh, lang=model.lang,
                   max_query_terms=model.max_query_terms)

    def encode_query_tokens(self, token_lists):
        from tdr.text.vocab import encode_queries

        qids, qw = encode_queries(token_lists, self.vocab, self.max_query_terms)
        return jnp.asarray(qids), jnp.asarray(qw)

    def topk_tokens(self, token_lists, k: int = 10, pad_to=None):
        n = len(token_lists)
        if pad_to is not None and n < pad_to:
            token_lists = list(token_lists) + [[]] * (pad_to - n)
        qids, qw = self.encode_query_tokens(token_lists)
        vals, rows = vocab_tp_score_topk(self.mesh, self.vindex, qids, qw,
                                         top_k=k)
        return np.asarray(vals)[:n], np.asarray(rows)[:n]

    def retrieve_tokens(self, token_lists, k: int = 10):
        vals, rows = self.topk_tokens(token_lists, k, pad_to=len(token_lists))
        return [
            [self.docids[r] for r, v in zip(qr, qv) if np.isfinite(v)]
            for qr, qv in zip(rows, vals)
        ]
