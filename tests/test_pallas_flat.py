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
