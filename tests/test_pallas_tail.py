"""Segment-DMA tail compactor (tdr.ops.pallas_tail): interpret-mode parity.

The kernel's forward-overwrite compaction (each term's P-wide window covers
the previous term's garbage lanes) plus the final sentinel/-1 masking must
reproduce the XLA sort-based compactor exactly through the whole fused
top-k (score._fused_topk_core consumes both encodings identically).
Real-TPU execution is exercised by bench.py and the A/B harness.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tdr.index import build_index
from tdr.ops.pallas_tail import pallas_tail_available, tail_compact_pallas
from tdr.ops.score import _tail_compact, score_and_topk, score_and_topk_fused
from tdr.text import build_vocab, encode_docs, encode_queries
from tdr.utils.config import IndexConfig

CFG = IndexConfig(doc_pad_multiple=128, nnz_pad_multiple=64,
                  head_budget_bytes=1 << 16, head_dtype="float32")


def _world(seed=0, n_docs=400, vocab_n=900, n_queries=24, qlen=(1, 12)):
    rng = np.random.RandomState(seed)
    docs = [[f"t{rng.randint(vocab_n)}" for _ in range(rng.randint(5, 80))]
            for _ in range(n_docs)]
    vocab = build_vocab(docs)
    coo = encode_docs(docs, vocab)
    queries = [[f"t{rng.randint(vocab_n)}" for _ in range(rng.randint(*qlen))]
               for _ in range(n_queries)]
    qids, qw = encode_queries(queries, vocab, 16)
    return vocab, coo, jnp.asarray(qids), jnp.asarray(qw)


def _compact_as_sets(docs, vals):
    """Compacted (doc → summed val) maps per query, ignoring slot order and
    dead lanes (docs==sentinel / val<0)."""
    out = []
    for d_row, v_row in zip(np.asarray(docs), np.asarray(vals)):
        m = {}
        for d, v in zip(d_row, v_row):
            if v >= 0:
                m[int(d)] = m.get(int(d), 0.0) + float(v)
        out.append(m)
    return out


@pytest.mark.parametrize("seed", [0, 7])
def test_compactor_matches_xla(seed):
    vocab, coo, qids, qw = _world(seed=seed)
    idx = build_index(*coo, vocab.size, index_cfg=CFG, head_size=16)
    budget = 4 * idx.tail_pmax
    dx, vx, ax, ox = _tail_compact(idx, jnp.clip(qids, 0, vocab.size - 1),
                                   qw, budget)
    dp, vp, op = tail_compact_pallas(idx, qids, qw, budget, interpret=True)
    assert np.array_equal(np.asarray(ox), np.asarray(op))
    ref = _compact_as_sets(dx, np.where(np.asarray(ax), np.asarray(vx), -1.0))
    got = _compact_as_sets(dp, vp)
    for q, (r, g) in enumerate(zip(ref, got)):
        if not np.asarray(ox)[q]:       # overflowed rows are caller-handled
            assert set(r) == set(g), f"query {q} docs differ"
            for d in r:
                np.testing.assert_allclose(g[d], r[d], rtol=1e-5, atol=1e-6)


def test_fused_topk_same_results_end_to_end():
    vocab, coo, qids, qw = _world(seed=3)
    idx = build_index(*coo, vocab.size, index_cfg=CFG, head_size=16)
    vx, rx = score_and_topk_fused(idx, qids, qw, top_k=10, tail_budget=64,
                                  tail_engine="xla")
    vp, rp = score_and_topk_fused(idx, qids, qw, top_k=10, tail_budget=64,
                                  tail_engine="pallas_interpret")
    vs, rs = score_and_topk(idx, qids, qw, top_k=10)
    assert np.array_equal(np.asarray(rx), np.asarray(rp))
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vp),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vs),
                               rtol=1e-4, atol=1e-5)


def test_tail_only_and_overflow_queries():
    vocab, coo, _, _ = _world(seed=5)
    idx = build_index(*coo, vocab.size, index_cfg=CFG, head_size=16)
    head_slot = np.asarray(idx.head_slot)
    df = np.asarray(idx.stats.df)
    tail_terms = np.where((head_slot < 0) & (df > 0))[0]
    rng = np.random.RandomState(1)
    T = 32
    qids = np.zeros((6, T), np.int32)
    qw = np.zeros((6, T), np.float32)
    for i, n in enumerate([1, 2, 5, 16, 17, min(30, len(tail_terms))]):
        n = min(n, len(tail_terms))
        pick = rng.choice(tail_terms, n, replace=False)
        qids[i, :n] = pick
        qw[i, :n] = 1.0
    vx, rx = score_and_topk_fused(idx, jnp.asarray(qids), jnp.asarray(qw),
                                  top_k=10, tail_budget=64, tail_engine="xla")
    vp, rp = score_and_topk_fused(idx, jnp.asarray(qids), jnp.asarray(qw),
                                  top_k=10, tail_budget=64,
                                  tail_engine="pallas_interpret")
    assert np.array_equal(np.asarray(rx), np.asarray(rp))
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vp),
                               rtol=1e-5, atol=1e-5)


def test_postings_padding_invariant():
    """build_index guarantees nnz_pad >= nnz + tail_pmax (the DMA bounds
    invariant pallas_tail_available re-checks)."""
    vocab, coo, _, _ = _world(seed=2, n_docs=100, vocab_n=300)
    idx = build_index(*coo, vocab.size, index_cfg=CFG, head_size=8)
    nnz = int(np.asarray(idx.indptr[-1]))
    assert idx.postings_doc.shape[0] >= nnz + idx.tail_pmax
    assert idx.postings_doc.shape[0] == idx.postings_w.shape[0]
    assert idx.postings_doc.shape[0] == idx.postings_tf.shape[0]


def test_available_is_false_on_cpu():
    vocab, coo, _, _ = _world(seed=2, n_docs=100, vocab_n=300)
    idx = build_index(*coo, vocab.size, index_cfg=CFG, head_size=8)
    # the test suite pins JAX_PLATFORMS=cpu (conftest) — auto-select must
    # fall back to the XLA compactor there
    assert pallas_tail_available(idx) is False
