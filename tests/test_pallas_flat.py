"""Exactness tests for the fused Pallas flat-search engine
(tdr/ops/pallas_flat.py) — interpret mode on the CPU suite, against both
the XLA engine and an f64 numpy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from tdr.models.dense import build_flat_index, flat_search, flat_search_prf
from tdr.ops.pallas_flat import fused_flat_available, fused_flat_topk

N, D = 8192, 128        # smallest fused-eligible shape


def _world(seed=0, n=N - 37, q=29):
    rng = np.random.RandomState(seed)
    emb = rng.randn(n, D).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = rng.randn(q, D).astype(np.float32)
    return emb, queries


def _overlap(a, b):
    return np.mean([len(set(x) & set(y)) / len(x) for x, y in zip(a, b)])


@pytest.mark.parametrize("metric", ["ip", "l2"])
@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_fused_matches_xla(metric, dtype):
    emb, queries = _world()
    idx = build_flat_index(emb, metric=metric, dtype=dtype)
    q = jnp.asarray(queries)
    v_x, r_x = map(np.asarray, flat_search(idx, q, 10, engine="xla"))
    v_f, r_f = map(np.asarray, flat_search(idx, q, 10, engine="fused"))
    # rescore runs f32 where the XLA matmul ran bf16/int8 inputs: values
    # agree to input-precision rounding, rows to near-tie flips
    assert _overlap(r_x, r_f) >= 0.99
    tol = 0.08 if dtype == "int8" else 0.02
    np.testing.assert_allclose(v_f, v_x, atol=tol, rtol=tol)
    # descending order, finite
    assert np.all(np.diff(v_f, axis=1) <= 1e-6)


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_fused_exact_vs_f64_oracle(metric):
    """bf16-stored index: the fused top-k must equal the top-k of the f64
    scores computed from the SAME bf16-rounded inputs the engine scores
    with (stored embeddings AND the engine's bf16-cast queries) — the
    selection is exact; the only permitted divergence is an f32-
    accumulation near-tie at the rank-10 boundary."""
    emb, queries = _world(seed=3)
    idx = build_flat_index(emb, metric=metric)      # bf16 storage
    stored = np.asarray(idx.embeddings.astype(jnp.float32), np.float64)
    q_eff = np.asarray(
        jnp.asarray(queries).astype(jnp.bfloat16).astype(jnp.float32),
        np.float64)
    n = idx.n_docs
    q = jnp.asarray(queries)
    v_f, r_f = map(np.asarray, flat_search(idx, q, 10, engine="fused"))
    for i, qi in enumerate(q_eff):
        s = stored[:n] @ qi
        if metric == "l2":
            # engine vals are -||q-d||^2 built from 2qd - ||d||^2 - ||q||^2
            # with ||q||^2 from the RAW f32 query (matches the XLA engine)
            s = 2.0 * s - (stored[:n] ** 2).sum(1) \
                - float((queries[i].astype(np.float64) ** 2).sum())
        order = np.argsort(-s, kind="stable")[:10]
        mism = set(r_f[i]) ^ set(order)
        if mism:        # f32-accumulation tie at the boundary only
            bound = np.sort(s)[::-1][9]
            assert all(abs(s[d] - bound) < 1e-4 for d in mism), f"query {i}"
        np.testing.assert_allclose(np.sort(v_f[i])[::-1],
                                   np.sort(s)[::-1][:10],
                                   rtol=2e-4, atol=2e-4)


def test_fused_handles_few_valid_docs():
    """n_docs far below the padded length: padding never surfaces, short
    result rows pad with -inf / row 0 like the XLA engine."""
    rng = np.random.RandomState(1)
    emb = rng.randn(6, D).astype(np.float32)
    pad = np.zeros((N - 6, D), np.float32)
    idx = build_flat_index(np.vstack([emb, pad]), metric="ip")
    idx = type(idx)(embeddings=idx.embeddings, doc_sq=None, doc_scale=None,
                    n_docs=6, metric="ip")
    q = jnp.asarray(rng.randn(4, D).astype(np.float32))
    v, r = map(np.asarray, flat_search(idx, q, 10, engine="fused"))
    assert np.all(np.isfinite(v[:, :6]))
    assert np.all(v[:, 6:] == -np.inf)
    assert np.all(r < 6)


def test_fused_n_valid_override():
    """Traced n_valid (the sharded engine's per-shard count) masks docs
    past the dynamic limit."""
    emb, queries = _world(seed=5, n=N)
    idx = build_flat_index(emb, metric="ip")
    q = jnp.asarray(queries[:5])
    v, r = fused_flat_topk(idx.embeddings, q, top_k=10, metric="ip",
                           n_docs=N, n_valid=jnp.int32(100), interpret=True)
    assert np.all(np.asarray(r) < 100)
    v2, r2 = fused_flat_topk(idx.embeddings[:, :], q, top_k=10, metric="ip",
                             n_docs=100, interpret=True)
    np.testing.assert_array_equal(np.asarray(r), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v2))


def test_fused_prf_path():
    """flat_search_prf threads the engine through both passes."""
    emb, queries = _world(seed=7)
    idx = build_flat_index(emb)
    q = jnp.asarray(queries[:8])
    v_x, r_x = map(np.asarray,
                   flat_search_prf(idx, q, 10, engine="xla"))
    v_f, r_f = map(np.asarray,
                   flat_search_prf(idx, q, 10, engine="fused"))
    assert _overlap(r_x, r_f) >= 0.95


def test_availability_gate():
    assert fused_flat_available(jnp.zeros((8192, 128), jnp.bfloat16))
    assert not fused_flat_available(jnp.zeros((4096, 128), jnp.bfloat16))
    assert not fused_flat_available(jnp.zeros((8192, 100), jnp.bfloat16))
    assert not fused_flat_available(jnp.zeros((8192, 128), jnp.int32))
    # auto on CPU resolves to xla (no pallas): plain call must work
    emb, queries = _world(seed=9)
    idx = build_flat_index(emb)
    v, r = flat_search(idx, jnp.asarray(queries[:3]), 10)
    assert np.asarray(v).shape == (3, 10)


class TestFusedHeadTopk:
    """Sparse full-vocab-head fused engine (fused_head_topk) vs the
    matmul+top_k engine, interpret mode."""

    def _index(self, n_docs=600, vocab_n=500, seed=11):
        from tdr.index import build_index
        from tdr.text import build_vocab, encode_docs
        from tdr.utils.config import IndexConfig

        rng = np.random.RandomState(seed)
        docs = [[f"t{rng.randint(vocab_n)}"
                 for _ in range(rng.randint(5, 120))]
                for _ in range(n_docs)]
        vocab = build_vocab(docs)
        coo = encode_docs(docs, vocab)
        idx = build_index(*coo, vocab.size,
                          index_cfg=IndexConfig(doc_pad_multiple=64,
                                                nnz_pad_multiple=64,
                                                head_budget_bytes=1 << 30),
                          head_size=None)
        assert idx.head_size >= idx.vocab_size, "test needs full-vocab head"
        return vocab, idx

    def test_matches_matmul_engine(self):
        from tdr.ops.score import score_and_topk_fused
        from tdr.text import encode_queries

        vocab, idx = self._index()
        rng = np.random.RandomState(3)
        queries = [[f"t{rng.randint(500)}" for _ in range(rng.randint(1, 9))]
                   for _ in range(23)]
        queries[1] = queries[1][:2] * 3          # duplicate-slot guard path
        qids, qw = encode_queries(queries, vocab, 16)
        qids, qw = jnp.asarray(qids), jnp.asarray(qw)
        v_m, d_m = score_and_topk_fused(idx, qids, qw, top_k=10,
                                        tail_budget=256)
        v_f, d_f = score_and_topk_fused(idx, qids, qw, top_k=10,
                                        tail_budget=256,
                                        head_engine="fused_interpret")
        v_m, d_m, v_f, d_f = map(np.asarray, (v_m, d_m, v_f, d_f))
        for q in range(v_m.shape[0]):
            fin = np.isfinite(v_m[q])
            np.testing.assert_allclose(v_f[q][fin], v_m[q][fin],
                                       rtol=2e-3, atol=2e-3)
            assert len(set(d_f[q][fin]) & set(d_m[q][fin])) >= fin.sum() - 1

    def test_availability_gate(self):
        from tdr.ops.pallas_flat import fused_head_available

        _, idx = self._index()
        # small corpus: gated off (compile cost not worth it)
        assert not fused_head_available(idx, 10)
        import dataclasses
        big = dataclasses.replace(
            idx, head_rows=jnp.zeros((64, 65536), jnp.bfloat16))
        assert fused_head_available(big, 10)
        assert not fused_head_available(
            dataclasses.replace(big, head_rows=jnp.zeros((64, 65536),
                                                         jnp.int8)), 10)
