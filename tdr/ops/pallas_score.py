"""Pallas TPU kernel for dense head-row score accumulation.

Computes  ``scores[q, :] = Σ_t qw[q, t] · head_rows[slot[q, t], :]``  — the
hot loop of BM25/TF-IDF scoring (the reference's postings walk,
bm25_ranking.ipynb:191-205, recast as dense row accumulation).

Why a kernel: the XLA formulation is a `lax.scan` whose (Q, N) carry lives
in HBM, so every term step reads rows AND reads+writes the carry — ~2.5x
the bandwidth of the rows alone.  Here the accumulator stays in VMEM across
the whole term loop:

* grid = (Q, T_head): the term axis is grid-minor, and the output block for
  query q is the same for every t, so Pallas keeps the (1, N_pad) f32
  accumulator resident in VMEM across the t-loop (block revisiting);
* the row input's index_map reads the scalar-prefetched slot table, so the
  Pallas pipeline itself double-buffers the HBM row fetches;
* query terms are compacted head-first (one cheap T-wide sort) and the
  static term-loop width is capped at ``max_head_terms`` — queries with
  more active head terms are detected and fall back to the XLA path.

VMEM: pipeline row buffers + the f32 accumulator ≈ 2·N_pad·itemsize +
N_pad·4B — fits to ~1.5M docs per shard; larger shards fall back (and
should instead be doc-sharded across the mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tdr.index.build import SparseIndex

# beyond this doc-axis width the VMEM buffers stop fitting comfortably
MAX_PALLAS_N = 1_500_000
DEFAULT_MAX_HEAD_TERMS = 16


def _head_kernel(n_active_ref, slots_ref, qw_ref, row_ref, out_ref):
    q = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(t < n_active_ref[q])
    def _():
        out_ref[0, 0, :] += qw_ref[q, t] * row_ref[0, 0, :].astype(jnp.float32)


@jax.jit
def _prep_terms(index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray):
    """Compact head terms to the front so the kernel loop is tight."""
    qids = jnp.clip(qids, 0, index.vocab_size - 1)
    slot = index.head_slot[qids]                       # (Q, T)
    active = (slot >= 0) & (qw > 0)
    key = (~active).astype(jnp.int32)
    _, slot_c, qw_c = jax.lax.sort(
        (key, jnp.maximum(slot, 0), jnp.where(active, qw, 0.0)), num_keys=1)
    n_active = jnp.sum(active, axis=1).astype(jnp.int32)
    return slot_c.astype(jnp.int32), qw_c, n_active


@partial(jax.jit, static_argnames=("max_head_terms", "interpret"))
def _head_scores_pallas_core(
    index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray,
    max_head_terms: int, interpret: bool,
):
    Q, T = qids.shape
    N = index.n_docs_pad
    slots, qw_c, n_active = _prep_terms(index, qids, qw)
    TH = min(max_head_terms, T)
    overflow = n_active > TH
    slots = slots[:, :TH]
    qw_c = qw_c[:, :TH]
    # 3D layouts so the (1, 1, N) blocks satisfy TPU tiling rules
    rows = index.head_rows.reshape(index.head_rows.shape[0], 1, N)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,          # n_active, slots, qw
        grid=(Q, TH),
        in_specs=[
            # the Pallas pipeline fetches head_rows[slots[q, t]] per step —
            # double-buffered by the pipeline itself
            pl.BlockSpec((1, 1, N), lambda q, t, n_a, sl, w: (sl[q, t], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, N), lambda q, t, n_a, sl, w: (q, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _head_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Q, 1, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * TH * N,
            bytes_accessed=Q * TH * N * rows.dtype.itemsize + Q * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_active, slots, qw_c, rows)
    return out.reshape(Q, N), overflow


def head_scores_pallas(
    index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray,
    max_head_terms: int = DEFAULT_MAX_HEAD_TERMS,
    interpret: bool = False,
) -> jnp.ndarray:
    """(Q, N_pad) float32 head scores via the Pallas kernel.

    Queries with more than ``max_head_terms`` active head terms are
    re-scored with the XLA reference path (rare; detected exactly).
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU test
    suite)."""
    if index.head_rows.dtype == jnp.int8:
        raise NotImplementedError(
            "head_scores_pallas is the off-path reference kernel and does "
            "not implement int8 dequantization — use the production "
            "full-head matmul (tdr.ops.score), which scores quantized "
            "heads natively")
    out, overflow = _head_scores_pallas_core(
        index, qids, qw, max_head_terms, interpret)

    # overflow fallback stays INSIDE jit (lax.cond) — a bool() on the flag
    # would host-sync every batch, the exact per-batch tunnel round-trip the
    # fused XLA path removed (commit a6e3508)
    def fallback(out):
        from tdr.ops.score import _head_scores

        ref = _head_scores(index, jnp.clip(qids, 0, index.vocab_size - 1), qw)
        return jnp.where(overflow[:, None], ref, out)

    return jax.lax.cond(jnp.any(overflow), fallback, lambda o: o, out)


def pallas_head_available(index: SparseIndex) -> bool:
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    # the axon PJRT plugin exposes TPU devices under its own platform name
    return (dev.platform in ("tpu", "axon")
            and index.n_docs_pad <= MAX_PALLAS_N
            and index.head_rows.dtype != jnp.int8)
