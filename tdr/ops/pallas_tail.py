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
* per active term t the kernel DMAs a window of the postings into
  double-buffered VMEM scratch and places the segment at its compacted
  flat offset off_t = Σ_{s<t} len_s.  Mosaic's memory rules shape both
  steps, so everything is expressed on a 2-D (rows × 128 lanes) layout:
    - the postings arrays are VIEWED as (nnz_pad/128, 128); the DMA
      window is R_W rows starting at the segment's start aligned DOWN to
      a whole (8, 128) tile (``pl.multiple_of`` proves the alignment);
      the residual delta = start − 128·arow joins the placement shift;
    - vector stores at dynamic lane offsets are illegal, so placement is
      a flat cyclic shift by (off − delta), decomposed on the 2-D layout
      as lane-roll by s%128 + row-rolls by s/128 and s/128+1 selected by
      lane < s%128 (``tpu.dynamic_rotate`` on each axis), then a masked
      select of exactly lanes [off_t, off_t+len_t).  DMA-window garbage
      (before the segment start or past its length) never lands.

The output width W covers budget + tail_pmax so a full segment at the
clamped offset never wraps into live lanes; queries whose compacted total
exceeds the budget (or have more than MT tail terms) are flagged overflow
and re-scored exactly by the caller — the same contract as the XLA path.

Bounds: every DMA reads rows [arow, arow + R_W) with 128·arow <= start <=
nnz and R_W·128 = round_up(tail_pmax + 1023, 1024); ``build_index`` pads
the postings arrays past nnz by that window, and ``pallas_tail_available``
re-checks the invariant on loaded indexes built before the guarantee
existed.
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
_LANES = 128
_TILE_ROWS = 8
_ALIGN = _LANES * _TILE_ROWS       # 1024 elements = one (8, 128) int32 tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def dma_window(tail_pmax: int) -> int:
    """Window size (elements, 1024-multiple) covering any tile-misaligned
    segment of length <= tail_pmax."""
    return _round_up(tail_pmax + _ALIGN - 1, _ALIGN)


def _make_kernel(MT: int, RW: int, RB: int, sentinel: int):
    W = RB * _LANES

    def kernel(arows_ref, deltas_ref, lens_ref, offs_ref, qw_ref,
               doc_hbm, w_hbm, docs_out, vals_out, dpad, wpad, sems):
        q = pl.program_id(0)

        def doc_dma(slot, t):
            a = pl.multiple_of(arows_ref[q, t], _TILE_ROWS)
            return pltpu.make_async_copy(
                doc_hbm.at[pl.ds(a, RW), :],
                dpad.at[slot, pl.ds(0, RW), :], sems.at[slot, 0])

        def w_dma(slot, t):
            a = pl.multiple_of(arows_ref[q, t], _TILE_ROWS)
            return pltpu.make_async_copy(
                w_hbm.at[pl.ds(a, RW), :],
                wpad.at[slot, pl.ds(0, RW), :], sems.at[slot, 1])

        # all-dead init: doc sentinel sorts last, val -1 marks the lane
        # inactive for the caller
        docs_out[:] = jnp.full((1, RB, _LANES), sentinel, jnp.int32)
        vals_out[:] = jnp.full((1, RB, _LANES), -1.0, jnp.float32)

        @pl.when(lens_ref[q, 0] > 0)
        def _():
            doc_dma(0, 0).start()
            w_dma(0, 0).start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (RB, _LANES), 1)
        flat = (jax.lax.broadcasted_iota(jnp.int32, (RB, _LANES), 0) * _LANES
                + lane)

        def place(x, s_lane, s_row):
            """Flat cyclic shift on the row-major (RB, 128) layout: element
            at flat index i lands at (i + 128*s_row + s_lane) mod W."""
            a = pltpu.roll(x, s_lane, axis=1)
            b = pltpu.roll(a, s_row, axis=0)
            c = pltpu.roll(a, s_row + 1, axis=0)
            return jnp.where(lane < s_lane, c, b)

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
                # buffer flat index delta+i must land on output flat index
                # off+i: shift by off - delta (+W keeps it nonnegative)
                s = off - deltas_ref[q, t] + W
                s_lane = jax.lax.rem(s, _LANES)
                s_row = jax.lax.rem(s // _LANES, RB)
                sel = jnp.logical_and(flat >= off,
                                      flat < off + lens_ref[q, t])
                d_roll = place(dpad[slot], s_lane, s_row)
                v_roll = place(wpad[slot] * qw_ref[q, t], s_lane, s_row)
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
    arows = (starts // _ALIGN) * _TILE_ROWS          # tile-aligned row index
    deltas = starts - (starts // _ALIGN) * _ALIGN
    cum = jnp.cumsum(lens, axis=1)
    overflow = overflow | (cum[:, -1] > budget)
    offs = jnp.minimum(cum - lens, budget).astype(jnp.int32)

    DW = dma_window(P)
    RW = DW // _LANES
    W = _round_up(max(budget + P, DW), _ALIGN)
    RB = W // _LANES
    sentinel = index.n_docs_pad

    nnz_pad = int(index.postings_doc.shape[0])
    if nnz_pad % _LANES:
        raise ValueError(
            f"pallas tail compactor needs 128-multiple postings padding, "
            f"got {nnz_pad} (pallas_tail_available should have gated this)")
    doc2d = index.postings_doc.reshape(nnz_pad // _LANES, _LANES)
    w2d = index.postings_w.reshape(nnz_pad // _LANES, _LANES)

    def run(arows_c, deltas_c, lens_c, offs_c, qw_cc):
        Qc = arows_c.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,        # arows, deltas, lens, offs, qw
            grid=(Qc,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # postings_doc 2-D (HBM)
                pl.BlockSpec(memory_space=pl.ANY),   # postings_w 2-D (HBM)
            ],
            out_specs=(
                pl.BlockSpec((1, RB, _LANES), lambda q, *_: (q, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RB, _LANES), lambda q, *_: (q, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, RB, _LANES), jnp.int32),  # DMA window, row 0
                pltpu.VMEM((2, RB, _LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        return pl.pallas_call(
            _make_kernel(MT, RW, RB, sentinel),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((Qc, RB, _LANES), jnp.int32),
                jax.ShapeDtypeStruct((Qc, RB, _LANES), jnp.float32),
            ),
            cost_estimate=pl.CostEstimate(
                flops=Qc * MT * W,
                bytes_accessed=Qc * MT * DW * 8 + Qc * W * 8,
                transcendentals=0,
            ),
            interpret=interpret,
        )(arows_c, deltas_c, lens_c, offs_c, qw_cc, doc2d, w2d)

    # the scalar-prefetch tables live in SMEM (~1 MB): chunk the query axis
    # so (Qc, MT) x 5 arrays stay well under it at any batch size
    QCH = 256
    qw_f = qw_c.astype(jnp.float32)
    if Q <= QCH:
        docs, vals = run(arows, deltas, lens, offs, qw_f)
    else:
        parts = [
            run(arows[s:s + QCH], deltas[s:s + QCH], lens[s:s + QCH],
                offs[s:s + QCH], qw_f[s:s + QCH])
            for s in range(0, Q, QCH)
        ]
        docs = jnp.concatenate([p[0] for p in parts])
        vals = jnp.concatenate([p[1] for p in parts])
    return docs.reshape(Q, W), vals.reshape(Q, W), overflow


def pallas_tail_available(index: SparseIndex) -> bool:
    """Kernel usable: TPU backend + postings padded by >= the aligned DMA
    window (the segment-DMA bounds invariant; checked concretely so
    indexes saved before the invariant existed fall back to the XLA
    compactor).  Measured on v5e at the en-scale tail-heavy config
    (207k docs, head 3072, batch 256): 28.2 ms/batch vs 40.1 for the XLA
    compactor, exact row/score parity across the full query set.
    TDR_PALLAS_TAIL=0 opts out."""
    import os

    if os.environ.get("TDR_PALLAS_TAIL", "1") != "1":
        return False
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    if dev.platform not in ("tpu", "axon"):
        return False
    nnz_pad = int(index.postings_doc.shape[0])
    if nnz_pad % _LANES:
        return False
    nnz = int(np.asarray(index.indptr[-1]))
    return nnz_pad >= nnz + dma_window(index.tail_pmax)
