"""Top-k over a long document axis: measured engine selection.

``jax.lax.top_k`` on TPU lowers to a partial-selection custom call, NOT a
full-row sort.  Round 3 measured it directly against a grouped two-phase
selection (group-max → top-k groups → gather + rescan) on the production
shapes, with the only timing methodology that survives this environment's
dispatch memoization and early-acking ``block_until_ready`` (256 distinct
back-to-back dispatches, device-generated inputs, one sync):

    (256, 262144) f32, k=10, fused after a (256,256)x(256,262144) matmul,
    TPU v5e:   matmul + lax.top_k      3.35 ms/call
               matmul + topk_grouped   9.17 ms/call

The grouped pass loses ~3x: its (Q, k·128) ``take_along_axis`` gather and
2-key rescan sort cost far more than XLA's native TopK saves.  (An earlier
scan-stacked microbenchmark suggested the opposite — 8.3 ms vs 0.9 ms —
but that was an artifact of measuring inside ``lax.scan`` on stacked
inputs; the end-to-end wall clock contradicts it, and the end-to-end
number is the one the CLAUDE.md measurement rules trust.)

``fast_topk`` is therefore ``lax.top_k`` today, kept as the single
indirection point so the choice is re-measurable per hardware generation.
``topk_grouped`` stays available (exactness-tested) for stacks where the
native TopK is weak.  The reference's equivalents are ``np.argpartition``
(bm25_ranking.ipynb:206-213) and ``torch.topk``
(document_ranking_with_bm25.py:235).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def merge_gathered_topk(
    vals_g: jnp.ndarray, rows_g: jnp.ndarray, top_k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge per-shard top-k candidates after an ``all_gather``.

    (S, Q, k_local) stacked candidates → global (Q, top_k): transpose to
    per-query (Q, S·k_local), one ``lax.top_k``, gather the matching rows,
    pad with −inf if fewer than ``top_k`` candidates exist.  The single
    merge used by every sharded engine (sparse doc-sharding, the 2-D grid,
    dense sharded flat) so tie-breaking and the padding sentinel cannot
    drift between them."""
    S, Q, kl = vals_g.shape
    vals_m = jnp.transpose(vals_g, (1, 0, 2)).reshape(Q, S * kl)
    rows_m = jnp.transpose(rows_g, (1, 0, 2)).reshape(Q, S * kl)
    k_eff = min(top_k, S * kl)
    vals, sel = jax.lax.top_k(vals_m, k_eff)
    rows = jnp.take_along_axis(rows_m, sel, axis=1)
    if k_eff < top_k:
        pad = top_k - k_eff
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
    return vals, rows


def fast_topk(scores: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k along the last axis — the measured-fastest engine for the
    current hardware (see module docstring for the A/B)."""
    return jax.lax.top_k(scores, k)


@partial(jax.jit, static_argnames=("k", "group"))
def topk_grouped(
    scores: jnp.ndarray, k: int, group: int = 128
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact grouped top-k along the last axis of a 2-D score matrix —
    bit-identical to ``jax.lax.top_k(scores, k)``; OFF the hot paths on
    v5e (measured 3x slower fused, module docstring).

    1. group-reduce: view the row as ``ng = N/G`` groups of ``G`` lanes and
       take each group's max — one streaming VPU pass, output (Q, ng);
    2. select groups: ``lax.top_k`` over the (Q, ng) group maxes;
    3. gather + rescan: gather the k winning groups' G columns each
       ((Q, k·G) candidates) and take the exact top-k there.

    EXACTNESS (including ``lax.top_k``'s value-desc/index-asc tie order):
    let e be any element outside the k selected groups.  Group selection is
    lexical by (max desc, group-id asc), so there are k groups each of
    which beats e's group.  Each such group's max either (a) exceeds e's
    value, or (b) equals it with a smaller group id — and a smaller group
    id means every element of that group has a smaller global index than e.
    Either way that max outranks e under (value desc, index asc); k
    distinct elements outrank e, so e is not in the true top-k.  Hence the
    selected groups contain the entire true top-k and an exact (value desc,
    index asc) selection among their columns reproduces ``lax.top_k``
    bit-for-bit.  (Only edge: a -0.0 score sorts as equal-to-0.0 here but
    below it under lax.sort's total order; retrieval scores are sums of
    non-negative weights or -inf masks, which never produce -0.0.)

    Falls back to ``lax.top_k`` outright when the shape gives the grouped
    pass no advantage (short rows, k·group >= N, or N not group-aligned).
    """
    Q, N = scores.shape
    ng = N // group
    if N % group or ng < k or k * group * 2 >= N:
        return jax.lax.top_k(scores, k)

    gmax = jnp.max(scores.reshape(Q, ng, group), axis=-1)       # (Q, ng)
    _, gsel = jax.lax.top_k(gmax, k)                            # (Q, k)
    offs = jax.lax.broadcasted_iota(jnp.int32, (Q, k, group), 2)
    cols = (gsel[..., None] * group + offs).reshape(Q, k * group)
    cand = jnp.take_along_axis(scores, cols, axis=1)            # (Q, k·G)
    # exact (value desc, index asc) selection: 2-key ascending sort on
    # (-value, global index) — candidate positions are NOT globally
    # index-ordered (groups arrive in rank order), so a bare top_k over
    # cand would break lax.top_k's lowest-index-wins tie rule
    negv, idx = jax.lax.sort((-cand, cols), num_keys=2)
    return -negv[:, :k], idx[:, :k]
