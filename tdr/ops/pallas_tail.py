"""Pallas TPU kernel: tail-posting segment gather with in-kernel compaction.

XLA's gather lowers to per-element loads on TPU (~4-20 ns/element measured
on v5e — round-2 profiling): compacting ~2048 tail posting slots per query
via element gathers costs ~11 ms per 256-query batch, more than half the
fused scoring pass (score.py).  But tail postings are CONTIGUOUS per term
in the CSR (build.py sorts postings by term id), so per (query, term) one
async DMA moves the whole segment at HBM streaming bandwidth instead of
per-element loads.

Replaces the slot-level compaction of ``score._tail_compact`` (the
reference's postings walk, bm25_ranking.ipynb:191-205, is the semantic
ancestor of both).  Contract, with grid = one step per query:

* level-1 term compaction happens OUTSIDE in XLA (a cheap T-wide sort):
  kernel inputs are (Q, MT) segment starts / lengths / query weights,
  inactive terms having len = 0.
* the output block starts as all-dead lanes (doc = sentinel, val = -1 —
  the encoding score._fused_topk_core's sign-packed doc-sort consumes);
* per active term t the kernel DMAs a window of the postings arrays into
  double-buffered VMEM scratch, then places the segment at its compacted
  offset off_t = Σ_{s<t} len_s with a dynamic lane ROLL + full-block
  masked select.  Mosaic constraints shape both steps:
    - 1-D memrefs are tiled in 1024-element units, so the DMA source
      window is the segment's start aligned DOWN to 1024 with a
      1024-multiple width DW >= 1023 + P — the residual misalignment
      delta = start - astart just joins the roll shift;
    - vector stores at unaligned dynamic lane offsets are illegal, so the
      roll (``tpu.dynamic_rotate``) + select places the segment instead —
      a few VPU passes over W lanes, no alignment requirement at all.
  The select keeps exactly lanes [off_t, off_t+len_t), so DMA-window
  garbage (before the segment start or past its length) never lands.

The output width W covers budget + P so a full segment at the clamped
offset never wraps into live lanes; queries whose compacted total exceeds
the budget (or have more than MT tail terms) are flagged overflow and
re-scored exactly by the caller — the same contract as the XLA path.

Bounds: every DMA reads [astart, astart + DW) with astart <= start <=
nnz; ``build_index`` pads the postings arrays so nnz + DW fits
(nnz_pad >= nnz + 1023 + tail_pmax rounded up), and
``pallas_tail_available`` re-checks the invariant on loaded indexes built
before that guarantee existed.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tdr.index.build import SparseIndex

DEFAULT_MAX_TAIL_TERMS = 16
_ALIGN = 1024      # Mosaic 1-D memref tiling (int32/float32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def dma_window(tail_pmax: int) -> int:
    """1024-multiple DMA width covering any 1024-misaligned segment of
    length <= tail_pmax."""
    return _round_up(tail_pmax + _ALIGN - 1, _ALIGN)


def _make_kernel(MT: int, DW: int, W: int, sentinel: int):
    def kernel(astarts_ref, deltas_ref, lens_ref, offs_ref, qw_ref,
               doc_hbm, w_hbm, docs_out, vals_out, dpad, wpad, sems):
        q = pl.program_id(0)

        def doc_dma(slot, t):
            a = pl.multiple_of(astarts_ref[q, t], _ALIGN)
            return pltpu.make_async_copy(
                doc_hbm.at[pl.ds(a, DW)],
                dpad.at[slot, 0, pl.ds(0, DW)], sems.at[slot, 0])

        def w_dma(slot, t):
            a = pl.multiple_of(astarts_ref[q, t], _ALIGN)
            return pltpu.make_async_copy(
                w_hbm.at[pl.ds(a, DW)],
                wpad.at[slot, 0, pl.ds(0, DW)], sems.at[slot, 1])

        # all-dead init: doc sentinel sorts last, val -1 marks the lane
        # inactive for the caller
        docs_out[:] = jnp.full((1, 1, W), sentinel, jnp.int32)
        vals_out[:] = jnp.full((1, 1, W), -1.0, jnp.float32)

        @pl.when(lens_ref[q, 0] > 0)
        def _():
            doc_dma(0, 0).start()
            w_dma(0, 0).start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

        def body(t, carry):
            slot = jax.lax.rem(t, 2)

            # prefetch the next active segment while this one lands
            if MT > 1:
                @pl.when(jnp.logical_and(t + 1 < MT, lens_ref[q, t + 1] > 0))
                def _():
                    doc_dma(1 - slot, t + 1).start()
                    w_dma(1 - slot, t + 1).start()

            @pl.when(lens_ref[q, t] > 0)
            def _():
                doc_dma(slot, t).wait()
                w_dma(slot, t).wait()
                off = offs_ref[q, t]
                # buffer lane delta+i must land on output lane off+i:
                # cyclic shift by off - delta (+W keeps it nonnegative)
                shift = off - deltas_ref[q, t] + W
                sel = jnp.logical_and(lane >= off,
                                      lane < off + lens_ref[q, t])
                d_roll = pltpu.roll(dpad[slot], shift, axis=1)
                v_roll = pltpu.roll(wpad[slot] * qw_ref[q, t], shift, axis=1)
                docs_out[0] = jnp.where(sel, d_roll, docs_out[0])
                vals_out[0] = jnp.where(sel, v_roll, vals_out[0])

            return carry

        jax.lax.fori_loop(0, MT, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("budget", "max_tail_terms", "interpret"))
def tail_compact_pallas(
    index: SparseIndex, qids: jnp.ndarray, qw: jnp.ndarray, budget: int,
    max_tail_terms: int = DEFAULT_MAX_TAIL_TERMS, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compacted tail slots via segment DMA: (docs (Q, W), vals (Q, W),
    overflow (Q,)) with W >= budget + tail_pmax; vals == -1 marks dead
    lanes (same encoding the fused core's doc-sort consumes)."""
    Q, T = qids.shape
    P = index.tail_pmax
    qids = jnp.clip(qids, 0, index.vocab_size - 1)
    slot = index.head_slot[qids]
    df = index.stats.df[qids].astype(jnp.int32)
    start = index.indptr[qids]
    is_tail = (slot < 0) & (qw > 0)

    MT = min(max_tail_terms, T)
    tkey = (~is_tail).astype(jnp.int32)
    _, start_c, df_c, qw_c, tail_c = jax.lax.sort(
        (tkey, start, df, qw, is_tail.astype(jnp.int32)), num_keys=1)
    start_c, df_c, qw_c = start_c[:, :MT], df_c[:, :MT], qw_c[:, :MT]
    tail_c = tail_c[:, :MT] > 0
    overflow = jnp.sum(is_tail, axis=1) > MT

    lens = jnp.where(tail_c, df_c, 0).astype(jnp.int32)
    starts = jnp.where(tail_c, start_c, 0).astype(jnp.int32)
    astarts = (starts // _ALIGN) * _ALIGN
    deltas = starts - astarts
    cum = jnp.cumsum(lens, axis=1)
    overflow = overflow | (cum[:, -1] > budget)
    offs = jnp.minimum(cum - lens, budget).astype(jnp.int32)

    DW = dma_window(P)
    W = _round_up(max(budget + P, DW), 128)
    sentinel = index.n_docs_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,        # astarts, deltas, lens, offs, qw
        grid=(Q,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # postings_doc (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # postings_w (HBM)
        ],
        # (1, 1, W) blocks: TPU tiling wants the last two block dims
        # divisible by (8, 128) or equal to the array dims — the singleton
        # middle dim + full-width last dim satisfy that for any W
        out_specs=(
            pl.BlockSpec((1, 1, W), lambda q, *_: (q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W), lambda q, *_: (q, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 1, W), jnp.int32),       # DMA window at lane 0
            pltpu.VMEM((2, 1, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    docs, vals = pl.pallas_call(
        _make_kernel(MT, DW, W, sentinel),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Q, 1, W), jnp.int32),
            jax.ShapeDtypeStruct((Q, 1, W), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=Q * MT * W,
            bytes_accessed=Q * MT * DW * 8 + Q * W * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(astarts, deltas, lens, offs, qw_c.astype(jnp.float32),
      index.postings_doc, index.postings_w)
    return docs.reshape(Q, W), vals.reshape(Q, W), overflow


def pallas_tail_available(index: SparseIndex) -> bool:
    """Kernel usable: TPU backend + postings padded by >= the aligned DMA
    window (the segment-DMA bounds invariant; checked concretely so
    indexes saved before the invariant existed fall back to the XLA
    compactor).

    Opt-in (TDR_PALLAS_TAIL=1) while the Mosaic lowering of the segment
    DMA is being landed: interpret-mode semantics are pinned by
    tests/test_pallas_tail.py, but the current Mosaic release rejects
    1-D HBM->VMEM DMAs with mismatched tilings, so auto-select keeps the
    XLA compactor as the production default until the 2-D lowering is in.
    """
    import os

    if os.environ.get("TDR_PALLAS_TAIL", "0") != "1":
        return False
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    if dev.platform not in ("tpu", "axon"):
        return False
    nnz = int(np.asarray(index.indptr[-1]))
    return index.postings_doc.shape[0] >= nnz + dma_window(index.tail_pmax)
