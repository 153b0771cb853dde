"""Pseudo-relevance feedback (RM3-style query expansion) — beyond-reference.

The reference pipelines score each query exactly once
(/root/reference/bm25_ranking.ipynb:206-213 retrieve_top_n;
final_implementation.py's batch drivers are the same single pass).  Classic
IR systems (Lucene/Anserini RM3) instead mine the FIRST pass's top
documents for expansion terms and re-score once with the enriched query —
a large recall lever exactly when the query's own terms are weak (typos,
paraphrase, short queries), which is the hard-mode failure case.

TPU-first design — everything after the first pass is ONE fused dispatch:

* a doc-major mirror of the flat CSR (``DocMajorIndex``) is built once per
  model by a single jitted sort (term-major slots → doc-major), giving
  each document's (term, score-weight) row as a contiguous segment;
* ``prf_expand`` gathers the top-F feedback docs' segments (static width
  ``p_doc`` = the partition's widest doc, rounded up for shape bucketing),
  weights each slot by its doc's normalized first-pass score, reduces
  duplicate terms with the same sorted-run segment-sum the scoring engine
  uses (score.py), masks terms already present in the query, and emits the
  top-E expansion terms with RM3-interpolated weights ``beta * w/max(w)``
  appended to the original (qids, qw) — so the second pass is the ordinary
  scoring engine on a (Q, T+E) query batch, and duplicate-free by
  construction (the head scatter and the tail walk are ADDITIVE in
  repeated term ids, so masking query-present terms is what keeps the
  original weights intact).

Per-query work is O(F · p_doc · log(F · p_doc)) on the VPU; there are no
host round trips between the two passes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdr.index.build import SparseIndex

# shipped defaults = the best point of the full-scale sweep (268k docs,
# hard mode): gentle expansion.  The aggressive classic-RM3 point
# (F=5, E=10, beta=0.4) LOSES ~1 recall point at that scale
# (ARCHITECTURE.md "RM3 pseudo-relevance feedback").  SparseModel's prf_*
# fields mirror these — keep them in one place.
DEFAULT_FEEDBACK_DOCS = 3
DEFAULT_EXPAND_TERMS = 5
DEFAULT_BETA = 0.3
DEFAULT_MIN_DOCS = 2
# cap on the per-doc segment width the expansion jit specializes on: one
# pathological wide doc would otherwise inflate EVERY query's sort and
# present-mask working set (W = F * p_doc slots/query)
MAX_P_DOC = 1024


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DocMajorIndex:
    """Doc-major mirror of a SparseIndex's flat CSR (feedback mining)."""

    terms: jnp.ndarray       # (nnz_pad,) int32 term id, doc-major sorted
    w: jnp.ndarray           # (nnz_pad,) float32 score weight of the slot
    doc_start: jnp.ndarray   # (n_docs_pad + 1,) int32 CSR offsets by doc

    p_doc: int = dataclasses.field(metadata=dict(static=True), default=0)


def build_doc_major(index: SparseIndex, pad_multiple: int = 64) -> DocMajorIndex:
    """Host-side one-time inversion of the CSR (numpy argsort).

    Deliberately NOT jitted: each (nnz_pad, vocab) shape would pay a
    30-190 s remote compile on the tunnel backend (measured 195 s across
    the 7 reference-scale languages for a sort numpy does in seconds),
    and the mirror is built once per model.  ``p_doc`` (the static gather
    width the expansion jit specializes on) is the widest doc rounded up
    to ``pad_multiple`` so nearby corpora share a compile."""
    indptr = np.asarray(index.indptr)
    pd = np.asarray(index.postings_doc)
    pw = np.asarray(index.postings_w)
    nnz = int(indptr[-1])
    term_of = np.repeat(
        np.arange(indptr.shape[0] - 1, dtype=np.int32),
        np.diff(indptr).astype(np.int64))
    order = np.argsort(pd[:nnz], kind="stable")
    t_s = term_of[order]
    w_s = pw[:nnz][order]
    d_sorted = pd[:nnz][order]
    doc_start = np.searchsorted(
        d_sorted, np.arange(index.n_docs_pad + 1), side="left"
    ).astype(np.int32)
    widest = int(np.max(np.diff(doc_start))) if index.n_docs_pad else 1
    if widest > MAX_P_DOC:
        # truncate outlier-wide docs to their MAX_P_DOC highest-weight
        # terms so one pathological doc cannot inflate every query's
        # expansion working set (mining quality is insensitive: expansion
        # takes the top-E of the combined weights anyway)
        keep = np.ones(nnz, bool)
        lens = np.diff(doc_start)
        for d in np.nonzero(lens > MAX_P_DOC)[0]:
            lo, hi = int(doc_start[d]), int(doc_start[d + 1])
            seg_w = w_s[lo:hi]
            drop = np.argpartition(seg_w, len(seg_w) - MAX_P_DOC)[
                : len(seg_w) - MAX_P_DOC]
            keep[lo + drop] = False
        t_s, w_s, d_sorted = t_s[keep], w_s[keep], d_sorted[keep]
        nnz = t_s.shape[0]
        doc_start = np.searchsorted(
            d_sorted, np.arange(index.n_docs_pad + 1), side="left"
        ).astype(np.int32)
        widest = int(np.max(np.diff(doc_start)))
    t_pad = np.zeros(max(nnz, 1), np.int32)
    w_pad = np.zeros(max(nnz, 1), np.float32)
    t_pad[:nnz] = t_s
    w_pad[:nnz] = w_s
    p_doc = int(np.ceil(max(widest, 1) / pad_multiple)) * pad_multiple
    return DocMajorIndex(terms=jnp.asarray(t_pad), w=jnp.asarray(w_pad),
                         doc_start=jnp.asarray(doc_start), p_doc=p_doc)


@partial(jax.jit, static_argnames=("n_expand", "min_docs",
                                   "count_rank_clamp"))
def prf_mine(
    dmi: DocMajorIndex,
    vocab_size: int,
    qids: jnp.ndarray,          # (Q, T) int32 — THIS segment's encoding
    qw: jnp.ndarray,            # (Q, T) float32
    w_d: jnp.ndarray,           # (Q, F) relevance-model doc weights
    rows_f: jnp.ndarray,        # (Q, F) doc rows INTO THIS segment
    finite: jnp.ndarray,        # (Q, F) bool — rows valid in this segment
    n_expand: int = DEFAULT_EXPAND_TERMS,
    min_docs: int = DEFAULT_MIN_DOCS,
    count_rank_clamp: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mining core: top-``n_expand`` (term id, RAW pooled total, feedback-
    doc count) per query from one doc-major mirror.  ``w_d`` comes from the
    caller so a SEGMENTED store can normalize doc weights over the GLOBAL
    feedback set and pool raw totals across segments at the term-string
    level (tdr.rank.segmented, which passes min_docs=1 here and applies the
    co-occurrence gate on the SUMMED counts) — invalid slots carry
    total=-inf.

    ``count_rank_clamp`` ranks candidates by (min(count, clamp), total)
    lexicographically instead of total alone.  The segmented store needs
    it: one high-weight feedback doc's PRIVATE terms carry the largest raw
    totals, so a pure-total top-E window fills with count-1 terms and
    truncates away exactly the co-occurring terms the min_docs gate is
    meant to keep (measured: 4 of 5 model-path expansion terms lost at
    E_mine=10).  With clamp=min_docs, every within-segment count>=min_docs
    term outranks every count-1 term while ties inside a class still order
    by total — the model path's selection is a prefix of the window, and
    cross-segment 1+1 co-occurrences remain minable behind it.  The
    default clamp=1 reproduces the pure-total ranking."""
    Q, T = qids.shape
    F = w_d.shape[1]
    E, P = n_expand, dmi.p_doc
    rows_f = jnp.where(finite, rows_f, 0)

    # gather each feedback doc's (term, weight) segment at static width P
    start = dmi.doc_start[rows_f]                            # (Q, F)
    dlen = dmi.doc_start[rows_f + 1] - start
    offs = jax.lax.broadcasted_iota(jnp.int32, (Q, F, P), 2)
    m = (offs < dlen[..., None]) & finite[..., None]
    pos = jnp.clip(start[..., None] + offs, 0, dmi.terms.shape[0] - 1)
    g_terms = jnp.where(m, dmi.terms[pos], vocab_size)       # sentinel last
    g_w = jnp.where(m, dmi.w[pos] * w_d[..., None], 0.0)

    # accumulate duplicate terms across the F docs: sort by term, sorted
    # segment-sum (cumsum minus run base — the score.py pattern), run-last
    # slot carries the total
    W = F * P
    t_flat = g_terms.reshape(Q, W)
    w_flat = g_w.reshape(Q, W)
    t_s, w_s = jax.lax.sort((t_flat, w_flat), num_keys=1)
    cs = jnp.cumsum(w_s, axis=1)
    is_first = jnp.concatenate(
        [jnp.ones((Q, 1), bool), t_s[:, 1:] != t_s[:, :-1]], axis=1)
    is_last = jnp.concatenate(
        [t_s[:, 1:] != t_s[:, :-1], jnp.ones((Q, 1), bool)], axis=1)
    base = jax.lax.cummax(jnp.where(is_first, cs - w_s, -jnp.inf), axis=1)
    total = cs - base

    # co-occurrence evidence: each feedback doc contributes at most one
    # slot per term (doc rows are unique-term), so the run length IS the
    # number of feedback docs containing the term — requiring >= min_docs
    # rejects single-doc idiosyncrasies (the expansion-drift failure mode
    # measured at 268k docs: one near-topic doc's private terms hijack the
    # expansion)
    pos_i = jax.lax.broadcasted_iota(jnp.int32, (Q, W), 1)
    run_start = jax.lax.cummax(jnp.where(is_first, pos_i, -1), axis=1)
    run_len = pos_i - run_start + 1

    # mask terms the query already carries (head scatter / tail walk are
    # additive in duplicates — expansion must not reweight original terms)
    q_active = qw > 0
    present = jnp.any(
        (t_s[:, :, None] == qids[:, None, :]) & q_active[:, None, :], axis=2)
    cand = jnp.where(is_last & (t_s < vocab_size) & ~present & (total > 0)
                     & (run_len >= min_docs),
                     total, -jnp.inf)

    if count_rank_clamp <= 1:
        ew, esel = jax.lax.top_k(cand, E)                    # (Q, E)
        eterm = jnp.take_along_axis(t_s, esel, axis=1)
        ecount = jnp.take_along_axis(run_len, esel, axis=1)  # valid: is_last
        return eterm, ew, ecount
    # (count-class, total) descending two-key sort; invalid slots sink
    cclass = jnp.where(jnp.isfinite(cand),
                       -jnp.minimum(run_len, count_rank_clamp).astype(
                           jnp.float32),
                       jnp.inf)
    neg_total = jnp.where(jnp.isfinite(cand), -cand, jnp.inf)
    _, nt_s, t_sel, rl_sel = jax.lax.sort(
        (cclass, neg_total, t_s, run_len), num_keys=2)
    return t_sel[:, :E], -nt_s[:, :E], rl_sel[:, :E]


def relevance_doc_weights(fb_vals: jnp.ndarray, n_feedback: int):
    """(w_d (Q, F), finite (Q, F), rows-slice helper): relevance-model doc
    weights — first-pass scores normalized over the feedback set (BM25 /
    tf-idf scores are >= 0).  Shared by the model-level and segmented PRF
    paths so the normalization cannot drift between them."""
    vals_f = fb_vals[:, :n_feedback]
    finite = jnp.isfinite(vals_f) & (vals_f > 0)
    sv = jnp.where(finite, vals_f, 0.0)
    w_d = sv / jnp.maximum(jnp.sum(sv, axis=1, keepdims=True), 1e-9)
    return w_d, finite


def scale_expansion(ew, qw, beta: float):
    """RM3 interpolation: ``beta * total/max(total) * max(qw)`` — scaled
    into the caller's query-weight regime, so idf-weighted cosine queries
    (original weights at idf scale, 5-15) get expansion terms that
    actually participate rather than beta-sized no-ops.  -inf (invalid)
    slots come back weight 0."""
    ok = jnp.isfinite(ew)
    norm = jnp.maximum(jnp.max(jnp.where(ok, ew, 0.0), axis=1, keepdims=True),
                       1e-9)
    qscale = jnp.maximum(jnp.max(qw, axis=1, keepdims=True), 1e-9)
    return ok, jnp.where(ok, beta * (ew / norm) * qscale, 0.0)


@partial(jax.jit, static_argnames=("n_expand", "n_feedback", "min_docs"))
def prf_expand(
    dmi: DocMajorIndex,
    vocab_size: int,
    qids: jnp.ndarray,          # (Q, T) int32
    qw: jnp.ndarray,            # (Q, T) float32
    fb_vals: jnp.ndarray,       # (Q, >=F) first-pass scores (desc)
    fb_rows: jnp.ndarray,       # (Q, >=F) first-pass doc rows
    n_expand: int = DEFAULT_EXPAND_TERMS,
    n_feedback: int = DEFAULT_FEEDBACK_DOCS,
    beta: float = DEFAULT_BETA,
    min_docs: int = DEFAULT_MIN_DOCS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RM3 expansion: returns (qids2 (Q, T+E), qw2 (Q, T+E)).

    Mining + interpolation in one fused dispatch (see ``prf_mine`` /
    ``scale_expansion`` for the pieces the segmented store re-composes).
    Expansion terms are often tail terms; heavily-expanded long queries
    can cross the engine's max-tail-terms compaction level and take its
    exact fallback — the gentle default E keeps that rare (measured warm
    2-pass cost 1.6x a single pass at reference scale)."""
    w_d, finite = relevance_doc_weights(fb_vals, n_feedback)
    eterm, ew, _ = prf_mine(dmi, vocab_size, qids, qw, w_d,
                            fb_rows[:, :n_feedback], finite,
                            n_expand=n_expand, min_docs=min_docs)
    ok, e_w = scale_expansion(ew, qw, beta)
    e_t = jnp.where(ok, eterm, 0)
    return (jnp.concatenate([qids, e_t], axis=1),
            jnp.concatenate([qw, e_w.astype(qw.dtype)], axis=1))
