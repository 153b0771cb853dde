"""Document-axis sharded indexing + scoring with collective top-k merge.

This is the TPU replacement for the reference's two corpus-scaling hacks
(SURVEY.md §2c, §5 "long-context"): chunked scoring over 5000-doc blocks
(document_ranking_with_bm25.py:319-364) and sharded pickle I/O
(final_implementation.py:187-287).  The document axis is sharded over the
mesh "data" axis; each device scores its local shard with the exact same
kernels as the single-chip path and keeps a local top-k; shard results are
merged with an `all_gather` + global `lax.top_k` (k is tiny, so the gather
is (S·k) per query — negligible ICI traffic).

Corpus-global statistics (idf, avgdl, head-term selection) are computed
once over the full COO and injected into every shard's build, so sharded
scores are bitwise-comparable to the single-chip index.
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

from tdr.index.build import (
    IndexStats,
    SparseIndex,
    build_index,
    compute_idf,
    segment_df,
    select_head,
    _auto_head_size,
    _bucket,
    _pad_coo,
    _round_up,
)
from tdr.ops.score import score_and_topk_fused
from tdr.parallel.mesh import data_sharding, replicated
from tdr.utils.config import BM25Config, IndexConfig


@jax.tree_util.register_dataclass
@dataclass
class ShardedSparseIndex:
    """Per-shard SparseIndex arrays stacked on a leading shard axis, with
    corpus-global idf / head selection shared across shards."""

    indptr: jnp.ndarray          # (S, V+1) int32
    postings_doc: jnp.ndarray    # (S, nnz_pad) int32 — LOCAL doc rows
    postings_w: jnp.ndarray      # (S, nnz_pad) float32
    postings_tf: jnp.ndarray     # (S, nnz_pad) float32
    head_slot: jnp.ndarray       # (V,) int32 — shared
    head_rows: jnp.ndarray       # (S, D, N_loc_pad) float32/bf16 or int8
    df_local: jnp.ndarray        # (S, V) float32
    idf: jnp.ndarray             # (V,) float32 — global
    doc_len: jnp.ndarray         # (S, N_loc_pad) float32
    avgdl: jnp.ndarray           # () float32 — global
    n_valid: jnp.ndarray         # (S,) int32 — docs per shard
    # per-doc-column dequantization scales for int8 heads (None otherwise);
    # each shard scores its local docs, so scales shard with the doc axis
    head_scale: Optional[jnp.ndarray] = None  # (S, N_loc_pad) float32

    n_shards: int = dataclasses.field(metadata=dict(static=True), default=1)
    n_docs: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_docs_pad_local: int = dataclasses.field(metadata=dict(static=True), default=0)
    vocab_size: int = dataclasses.field(metadata=dict(static=True), default=0)
    tail_pmax: int = dataclasses.field(metadata=dict(static=True), default=0)
    head_size: int = dataclasses.field(metadata=dict(static=True), default=0)


@partial(jax.jit, static_argnames=("mesh", "vocab_size"))
def spmd_global_stats(
    mesh: Mesh,
    term_ids: jnp.ndarray,      # (S, nnz_pad) int32, padding == vocab_size
    doc_len: jnp.ndarray,       # (S, N_loc_pad) float32
    vocab_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Corpus-global (df, total_doc_len) via per-shard segment reductions +
    `psum` over the mesh "data" axis — the index-build collective pattern
    (SURVEY.md §2c: "index build as per-shard scan + global psum of
    DF/avgdl stats").  Host-side computation is equivalent; this path keeps
    the build on-device for multi-host deployments."""

    def local_fn(ti, dl):
        valid = ti[0] < vocab_size
        df_local = jax.ops.segment_sum(
            valid.astype(jnp.float32), jnp.where(valid, ti[0], 0),
            num_segments=vocab_size)
        df = jax.lax.psum(df_local, "data")
        total = jax.lax.psum(jnp.sum(dl[0]), "data")
        return df, total

    return jax.shard_map(
        local_fn, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P(), P()), check_vma=False,
    )(term_ids, doc_len)


def build_sharded_index(
    doc_ids: np.ndarray,
    term_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    vocab_size: int,
    n_shards: int,
    bm25: BM25Config = BM25Config(),
    index_cfg: IndexConfig = IndexConfig(),
    weight_kind: str = "bm25",
    head_size: Optional[int] = None,
) -> ShardedSparseIndex:
    """Partition documents into ``n_shards`` contiguous ranges and build each
    shard against corpus-global statistics."""
    n_docs = int(doc_lens.shape[0])
    bounds = np.linspace(0, n_docs, n_shards + 1).astype(np.int64)
    n_local = np.diff(bounds)
    n_loc_pad = max(
        _round_up(max(int(n_local.max()) if n_docs else 1, 1), index_cfg.doc_pad_multiple),
        index_cfg.doc_pad_multiple,
    )
    if index_cfg.shape_bucketing:
        n_loc_pad = _bucket(n_loc_pad, index_cfg.doc_pad_multiple)
        vocab_size = _bucket(max(vocab_size, 1), 128)

    # ---- corpus-global statistics -----------------------------------------
    nnz = int(doc_ids.shape[0])
    nnz_pad_full = max(_round_up(max(nnz, 1), index_cfg.nnz_pad_multiple),
                       index_cfg.nnz_pad_multiple)
    _, ti_full, _ = _pad_coo(doc_ids, term_ids, tfs, vocab_size, nnz_pad_full)
    df_g = segment_df(jnp.asarray(ti_full), vocab_size)
    idf_variant = bm25.idf_variant if weight_kind == "bm25" else "classic"
    idf = compute_idf(df_g, n_docs, idf_variant)
    if head_size is None:
        if index_cfg.head_min_df > 0:
            head_size = int(jnp.sum(df_g >= index_cfg.head_min_df))
        else:
            head_size = _auto_head_size(vocab_size, n_loc_pad, index_cfg)
    head_size = min(head_size, vocab_size)
    head_slot = select_head(df_g, head_size)
    avgdl = float(doc_lens.sum() / max(n_docs, 1))

    # static tail bound shared by all shards: max GLOBAL df among tail terms
    # (each shard's local df can only be smaller)
    df_g_np = np.asarray(df_g)
    slot_np = np.asarray(head_slot)
    tail_df = df_g_np[slot_np < 0]
    tail_pmax = int(tail_df.max()) if tail_df.size else 0
    if tail_pmax <= 0:
        tail_pmax = 8
    elif index_cfg.shape_bucketing:
        tail_pmax = _bucket(tail_pmax, 8)
    else:
        tail_pmax = max(8, _round_up(tail_pmax, 128))

    # ---- per-shard builds --------------------------------------------------
    per_entry_shard = np.searchsorted(bounds[1:], doc_ids, side="right")
    max_local_nnz = int(np.bincount(per_entry_shard, minlength=n_shards).max()) if nnz else 1
    nnz_pad = max(_round_up(max(max_local_nnz, 1), index_cfg.nnz_pad_multiple),
                  index_cfg.nnz_pad_multiple)
    if index_cfg.shape_bucketing:
        nnz_pad = _bucket(nnz_pad, index_cfg.nnz_pad_multiple)

    shards = []
    for s in range(n_shards):
        sel = per_entry_shard == s
        local = build_index(
            doc_ids[sel] - bounds[s], term_ids[sel], tfs[sel],
            doc_lens[bounds[s]:bounds[s + 1]],
            vocab_size, bm25=bm25, index_cfg=index_cfg, weight_kind=weight_kind,
            head_size=head_size, idf=np.asarray(idf), head_slot=slot_np,
            avgdl=avgdl, n_docs_pad=n_loc_pad, nnz_pad=nnz_pad,
            tail_pmax=tail_pmax,
        )
        shards.append(local)

    stack = lambda get: jnp.stack([get(sh) for sh in shards])
    return ShardedSparseIndex(
        indptr=stack(lambda sh: sh.indptr),
        postings_doc=stack(lambda sh: sh.postings_doc),
        postings_w=stack(lambda sh: sh.postings_w),
        postings_tf=stack(lambda sh: sh.postings_tf),
        head_slot=shards[0].head_slot,
        head_rows=stack(lambda sh: sh.head_rows),
        head_scale=(None if shards[0].head_scale is None
                    else stack(lambda sh: sh.head_scale)),
        df_local=stack(lambda sh: sh.stats.df),
        idf=shards[0].stats.idf,
        doc_len=stack(lambda sh: sh.stats.doc_len),
        avgdl=shards[0].stats.avgdl,
        n_valid=jnp.asarray(n_local, jnp.int32),
        n_shards=n_shards,
        n_docs=n_docs,
        n_docs_pad_local=n_loc_pad,
        vocab_size=vocab_size,
        tail_pmax=tail_pmax,
        head_size=head_size,
    )


@partial(jax.jit, static_argnames=("mesh", "top_k"))
def sharded_score_topk(
    mesh: Mesh,
    sindex: ShardedSparseIndex,
    qids: jnp.ndarray,
    qw: jnp.ndarray,
    top_k: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score replicated queries against the doc-sharded index.

    Each device: local scoring (identical kernels to the single-chip path) +
    local top-k; merge: all_gather over the "data" axis + global top-k.
    Returns (vals (Q, k), GLOBAL doc rows (Q, k)).
    """
    S = sindex.n_shards
    k_local = min(top_k, sindex.n_docs_pad_local)
    n_loc_pad = sindex.n_docs_pad_local

    def local_fn(indptr, pdoc, pw, ptf, head_pack, df_local, doc_len,
                 n_valid, head_slot, idf, avgdl, qids, qw):
        head_rows, hs = head_pack
        # queries are replicated; cast them device-varying so they can mix
        # with the shard-varying index inside lax.scan carries
        qids = jax.lax.pcast(qids, "data", to="varying")
        qw = jax.lax.pcast(qw, "data", to="varying")
        # each block carries a leading shard axis of size 1
        stats = IndexStats(df=df_local[0], idf=idf, doc_len=doc_len[0],
                           avgdl=avgdl)
        local = SparseIndex(
            indptr=indptr[0], postings_doc=pdoc[0], postings_w=pw[0],
            postings_tf=ptf[0], head_slot=head_slot, head_rows=head_rows[0],
            stats=stats,
            head_scale=None if hs is None else hs[0],
            n_docs=n_loc_pad, n_docs_pad=n_loc_pad,
            vocab_size=sindex.vocab_size, tail_pmax=sindex.tail_pmax,
            head_size=sindex.head_size,
        )
        # the SAME fused engine as the single-chip path (full-head matmul,
        # sort-compacted tail, exact merge; overflow falls back to the
        # scatter oracle inside lax.cond) — the per-shard valid length is
        # dynamic, hence n_valid
        vals, rows = score_and_topk_fused(local, qids, qw, top_k=k_local,
                                          n_valid=n_valid[0])
        # -inf entries can carry the fused core's tail sentinel id
        # (n_docs_pad == one past the local range) — pin them to local 0 so
        # a global row never points into the NEXT shard's doc range
        rows = jnp.where(jnp.isfinite(vals), rows, 0)
        my = jax.lax.axis_index("data")
        grows = rows + my * n_loc_pad
        # gather every shard's candidates: (S, Q, k_local)
        vals_g = jax.lax.all_gather(vals, "data")
        rows_g = jax.lax.all_gather(grows, "data")
        return vals_g, rows_g

    vals_g, rows_g = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("data"), P("data"), P("data"), P("data"), P("data"), P("data"),
            P("data"), P("data"), P(), P(), P(), P(), P(),
        ),
        out_specs=(P(), P()),
        # outputs are all_gather results — identical on every device, but the
        # varying-axis checker cannot infer that statically
        check_vma=False,
    )(
        sindex.indptr, sindex.postings_doc, sindex.postings_w,
        sindex.postings_tf, (sindex.head_rows, sindex.head_scale),
        sindex.df_local, sindex.doc_len, sindex.n_valid, sindex.head_slot,
        sindex.idf, sindex.avgdl, qids, qw,
    )

    # merge: (S, Q, k_local) → (Q, S·k_local) → top-k
    from tdr.ops.topk import merge_gathered_topk

    return merge_gathered_topk(vals_g, rows_g, top_k)


@partial(jax.jit, static_argnames=("mesh", "top_k"))
def grid_score_topk(
    mesh: Mesh,
    sindex: ShardedSparseIndex,
    qids: jnp.ndarray,
    qw: jnp.ndarray,
    top_k: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2-D grid parallelism: query batch sharded over "data" x documents
    sharded over "model" — the composition of `dp_score_topk` and
    `sharded_score_topk` for fleets where NEITHER the query stream fits one
    row NOR the index fits one chip.  Each (q-row, doc-col) device scores
    its local query block against its local doc shard with the same fused
    engine; the k-sized merge collective (`all_gather` + global top-k)
    rides the "model" axis only, so rows never exchange queries.

    Build the index with ``n_shards = mesh.shape["model"]``.  Returns
    (vals (Q, k), GLOBAL rows (Q, k)) — map rows back to corpus docs with
    ``global_row_to_doc``.
    """
    S = sindex.n_shards
    assert S == mesh.shape["model"], (S, dict(mesh.shape))
    n_data = mesh.shape["data"]
    Q = qids.shape[0]
    Q_pad = -(-Q // n_data) * n_data
    if Q_pad != Q:
        qids = jnp.pad(qids, ((0, Q_pad - Q), (0, 0)))
        qw = jnp.pad(qw, ((0, Q_pad - Q), (0, 0)))
    k_local = min(top_k, sindex.n_docs_pad_local)
    n_loc_pad = sindex.n_docs_pad_local

    def local_fn(indptr, pdoc, pw, ptf, head_pack, df_local, doc_len,
                 n_valid, head_slot, idf, avgdl, qids, qw):
        head_rows, hs = head_pack
        # the query block is "data"-sharded but "model"-invariant; the
        # index is "model"-sharded — cast queries model-varying to mix
        qids = jax.lax.pcast(qids, "model", to="varying")
        qw = jax.lax.pcast(qw, "model", to="varying")
        stats = IndexStats(df=df_local[0], idf=idf, doc_len=doc_len[0],
                           avgdl=avgdl)
        local = SparseIndex(
            indptr=indptr[0], postings_doc=pdoc[0], postings_w=pw[0],
            postings_tf=ptf[0], head_slot=head_slot, head_rows=head_rows[0],
            stats=stats,
            head_scale=None if hs is None else hs[0],
            n_docs=n_loc_pad, n_docs_pad=n_loc_pad,
            vocab_size=sindex.vocab_size, tail_pmax=sindex.tail_pmax,
            head_size=sindex.head_size,
        )
        vals, rows = score_and_topk_fused(local, qids, qw, top_k=k_local,
                                          n_valid=n_valid[0])
        rows = jnp.where(jnp.isfinite(vals), rows, 0)
        my = jax.lax.axis_index("model")
        grows = rows + my * n_loc_pad
        # (S, q_local, k_local) per device; identical across the row
        vals_g = jax.lax.all_gather(vals, "model")
        rows_g = jax.lax.all_gather(grows, "model")
        # merge inside the shard so outputs stay "data"-sharded
        from tdr.ops.topk import merge_gathered_topk

        return merge_gathered_topk(vals_g, rows_g, top_k)

    vals, rows = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("model"), P("model"), P("model"), P("model"), P("model"),
            P("model"), P("model"), P("model"), P(), P(), P(),
            P("data"), P("data"),
        ),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )(
        sindex.indptr, sindex.postings_doc, sindex.postings_w,
        sindex.postings_tf, (sindex.head_rows, sindex.head_scale),
        sindex.df_local, sindex.doc_len, sindex.n_valid, sindex.head_slot,
        sindex.idf, sindex.avgdl, qids, qw,
    )
    return vals[:Q], rows[:Q]


def global_row_to_doc(sindex: ShardedSparseIndex, rows: np.ndarray) -> np.ndarray:
    """Map sharded global rows (shard*pad + local) back to corpus doc rows."""
    bounds = np.linspace(0, sindex.n_docs, sindex.n_shards + 1).astype(np.int64)
    shard = rows // sindex.n_docs_pad_local
    local = rows % sindex.n_docs_pad_local
    return bounds[shard] + local


@dataclass
class ShardedBM25Model:
    """Router-compatible model over a document-sharded index.

    Presents the same ``topk_tokens`` surface as ``tdr.models.SparseModel``
    so a ``LanguageRouter`` can mix single-chip and sharded per-language
    models (e.g. shard only the dominant `en` partition across the mesh).

    ``layout="doc"`` (default) shards documents over the mesh "data" axis
    with replicated queries (`sharded_score_topk`); ``layout="grid"``
    composes query-DP with doc-sharding — queries over "data", documents
    over "model" (`grid_score_topk`) — for fleets where neither axis fits.
    """

    vocab: object                 # tdr.text.vocab.Vocab
    sindex: ShardedSparseIndex
    docids: list
    mesh: Mesh
    lang: str = "en"
    max_query_terms: int = 64
    query_weight: str = "unit"
    layout: str = "doc"

    @classmethod
    def build(cls, doc_token_lists, docids, mesh: Mesh, lang: str = "en",
              bm25=None, index_cfg=None, max_query_terms: int = 64,
              layout: str = "doc"):
        from tdr.text.vocab import build_vocab, encode_docs
        from tdr.utils.config import BM25Config, IndexConfig

        assert layout in ("doc", "grid"), layout
        bm25 = bm25 or BM25Config()
        index_cfg = index_cfg or IndexConfig()
        vocab = build_vocab(doc_token_lists, min_df=index_cfg.min_df)
        coo = encode_docs(doc_token_lists, vocab)
        n_shards = (mesh.shape["data"] if layout == "doc"
                    else mesh.shape["model"])
        sindex = build_sharded_index(
            *coo, vocab.size, n_shards=n_shards, bm25=bm25,
            index_cfg=index_cfg)
        return cls(vocab=vocab, sindex=sindex, docids=list(docids), mesh=mesh,
                   lang=lang, max_query_terms=max_query_terms, layout=layout)

    def encode_query_tokens(self, token_lists):
        from tdr.text.vocab import encode_queries

        qids, qw = encode_queries(token_lists, self.vocab, self.max_query_terms)
        return jnp.asarray(qids), jnp.asarray(qw)

    def topk_tokens(self, token_lists, k: int = 10, pad_to=None):
        n = len(token_lists)
        if pad_to is not None and n < pad_to:
            token_lists = list(token_lists) + [[]] * (pad_to - n)
        qids, qw = self.encode_query_tokens(token_lists)
        if self.layout == "grid":
            vals, grows = grid_score_topk(self.mesh, self.sindex, qids, qw,
                                          top_k=k)
        else:
            vals, grows = sharded_score_topk(self.mesh, self.sindex, qids, qw,
                                             top_k=k)
        rows = global_row_to_doc(self.sindex, np.asarray(grows))
        return np.asarray(vals)[:n], rows[:n]

    def retrieve_tokens(self, token_lists, k: int = 10):
        vals, rows = self.topk_tokens(token_lists, k, pad_to=len(token_lists))
        return [
            [self.docids[r] for r, v in zip(qr, qv) if np.isfinite(v)]
            for qr, qv in zip(rows, vals)
        ]


def dp_score_topk(
    mesh: Mesh,
    index: SparseIndex,
    qids: jnp.ndarray,
    qw: jnp.ndarray,
    top_k: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Query-axis data parallelism: index replicated, query batch sharded
    over the "data" axis (the deployment mode when the index fits one chip;
    the reference's query batching, SURVEY.md §2c "data parallelism — query
    axis", scaled across devices)."""
    from tdr.ops.score import score_and_topk

    Q = qids.shape[0]
    n_data = mesh.shape["data"]
    Q_pad = -(-Q // n_data) * n_data
    if Q_pad != Q:
        qids = jnp.pad(qids, ((0, Q_pad - Q), (0, 0)))
        qw = jnp.pad(qw, ((0, Q_pad - Q), (0, 0)))
    index_r = jax.device_put(index, replicated(mesh))
    qids_s = jax.device_put(qids, data_sharding(mesh, qids.ndim))
    qw_s = jax.device_put(qw, data_sharding(mesh, qw.ndim))
    vals, rows = score_and_topk(index_r, qids_s, qw_s, top_k=top_k)
    return vals[:Q], rows[:Q]
