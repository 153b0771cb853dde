"""Mesh-sharded dense flat search == single-device flat search.

SURVEY.md §2b's FAISS plan ("sharded doc-embedding matrix, per-shard top_k
merged with all_gather"); VERDICT r3 missing #2.  The doc axis is the
matmul's OUTPUT axis, so per-shard scores equal single-device scores
exactly — these tests assert value equality across the full dtype matrix
(bf16 / f32 / int8) and both metrics, plus row agreement where scores are
untied.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdr.models.dense import build_flat_index, flat_search
from tdr.parallel import (
    build_sharded_flat_index,
    make_mesh,
    sharded_flat_search,
    sharded_row_to_doc,
)

N_DOCS, DIM, Q, K = 1000, 32, 16, 10


def _world(seed=0, normalized=True):
    rng = np.random.RandomState(seed)
    emb = rng.randn(N_DOCS, DIM).astype(np.float32)
    if normalized:
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.randn(Q, DIM).astype(np.float32)
    if normalized:
        q /= np.linalg.norm(q, axis=1, keepdims=True)
    return emb, jnp.asarray(q)


def _single_rows_to_doc(rows):
    return rows   # single-device flat index rows ARE corpus rows (padded>n masked)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_sharded_matches_single_device_ip(dtype):
    emb, q = _world()
    mesh = make_mesh(data=jax.device_count())
    sflat = build_sharded_flat_index(emb, n_shards=jax.device_count(),
                                     pad_multiple=64, dtype=dtype)
    v_s, r_s = sharded_flat_search(mesh, sflat, q, top_k=K)
    docs_s = sharded_row_to_doc(sflat, np.asarray(r_s))

    single_dtype = "bfloat16" if dtype == "float32" else dtype
    # single-device build_flat_index only stores bf16/int8; for the f32
    # sharded config compare against an exact f32 oracle instead
    if dtype == "float32":
        scores = emb @ np.asarray(q).T.astype(np.float32)   # (N, Q)
        order = np.argsort(-scores, axis=0)[:K].T            # (Q, K)
        np.testing.assert_array_equal(docs_s, order)
        np.testing.assert_allclose(
            np.asarray(v_s),
            np.take_along_axis(scores.T, order, axis=1), rtol=1e-5, atol=1e-6)
        return
    flat = build_flat_index(emb, pad_multiple=64, dtype=single_dtype)
    v_1, r_1 = flat_search(flat, q, top_k=K)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_1),
                               rtol=1e-5, atol=1e-6)
    # rows must agree wherever the scores are untied (bf16/int8 rounding can
    # create genuine ties whose order is unspecified)
    v1 = np.asarray(v_1)
    untied = np.ones_like(v1, bool)
    untied[:, 1:] &= v1[:, 1:] != v1[:, :-1]
    untied[:, :-1] &= v1[:, :-1] != v1[:, 1:]
    np.testing.assert_array_equal(docs_s[untied], np.asarray(r_1)[untied])


def test_sharded_matches_single_device_l2():
    emb, q = _world(seed=3, normalized=False)
    mesh = make_mesh(data=jax.device_count())
    sflat = build_sharded_flat_index(emb, n_shards=jax.device_count(),
                                     pad_multiple=64, metric="l2",
                                     dtype="bfloat16")
    flat = build_flat_index(emb, pad_multiple=64, metric="l2")
    v_s, r_s = sharded_flat_search(mesh, sflat, q, top_k=K)
    v_1, r_1 = flat_search(flat, q, top_k=K)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_1),
                               rtol=1e-4, atol=1e-4)
    docs_s = sharded_row_to_doc(sflat, np.asarray(r_s))
    agree = np.mean(docs_s == np.asarray(r_1))
    assert agree > 0.95, f"row agreement {agree}"


def test_sharded_approx_mode_overlap():
    emb, q = _world(seed=7)
    mesh = make_mesh(data=jax.device_count())
    sflat = build_sharded_flat_index(emb, n_shards=jax.device_count(),
                                     pad_multiple=64)
    v_ex, r_ex = sharded_flat_search(mesh, sflat, q, top_k=K)
    v_ap, r_ap = sharded_flat_search(mesh, sflat, q, top_k=K, approx=True)
    d_ex = sharded_row_to_doc(sflat, np.asarray(r_ex))
    d_ap = sharded_row_to_doc(sflat, np.asarray(r_ap))
    overlap = np.mean([len(set(a) & set(b)) / K for a, b in zip(d_ex, d_ap)])
    assert overlap >= 0.9, overlap


def test_sharded_uneven_docs_and_small_k():
    """n_docs not divisible by the shard count; padding rows never win."""
    rng = np.random.RandomState(1)
    emb = rng.randn(777, 16).astype(np.float32)
    q = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    mesh = make_mesh(data=jax.device_count())
    sflat = build_sharded_flat_index(emb, n_shards=jax.device_count(),
                                     pad_multiple=8, dtype="float32")
    v, r = sharded_flat_search(mesh, sflat, q, top_k=5)
    docs = sharded_row_to_doc(sflat, np.asarray(r))
    assert np.all(docs[np.isfinite(np.asarray(v))] < 777)
    scores = emb @ np.asarray(q).T
    want = np.argsort(-scores, axis=0)[:5].T
    np.testing.assert_array_equal(docs, want)


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_sharded_prf_matches_single_device(dtype):
    """Mesh Rocchio == single-device Rocchio: the psum-merged partial
    centroid must equal the gather-based centroid, so both passes agree
    (same clustered world as test_dense.py::TestFlatPrf)."""
    from tdr.models.dense import flat_search_prf
    from tdr.parallel import sharded_flat_search_prf

    rng = np.random.RandomState(11)
    centers = rng.randn(4, DIM).astype(np.float32) * 3
    emb = np.concatenate(
        [c + 0.3 * rng.randn(64, DIM).astype(np.float32) for c in centers])
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[list(range(0, 256, 17))] + \
        0.4 * rng.randn(16, DIM).astype(np.float32)
    q = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))

    mesh = make_mesh(data=jax.device_count())
    sflat = build_sharded_flat_index(emb, n_shards=jax.device_count(),
                                     pad_multiple=64, dtype=dtype)
    flat = build_flat_index(emb, pad_multiple=64, dtype=dtype)
    v_s, r_s = sharded_flat_search_prf(mesh, sflat, q, top_k=K,
                                       n_feedback=5, alpha=0.6)
    v_1, r_1 = flat_search_prf(flat, q, top_k=K, n_feedback=5, alpha=0.6)
    docs_s = sharded_row_to_doc(sflat, np.asarray(r_s))
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_1),
                               rtol=1e-4, atol=1e-5)
    v1 = np.asarray(v_1)
    untied = np.ones_like(v1, bool)
    untied[:, 1:] &= v1[:, 1:] != v1[:, :-1]
    untied[:, :-1] &= v1[:, :-1] != v1[:, 1:]
    np.testing.assert_array_equal(docs_s[untied], np.asarray(r_1)[untied])


def test_sharded_prf_feedback_helps_like_single(tmp_path):
    """The mesh feedback pass recovers noised-query targets at least as
    well as plain sharded search (mirror of the single-device test)."""
    from tdr.parallel import sharded_flat_search_prf

    rng = np.random.RandomState(12)
    centers = rng.randn(4, DIM).astype(np.float32) * 3
    emb = np.concatenate(
        [c + 0.3 * rng.randn(64, DIM).astype(np.float32) for c in centers])
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    targets = list(range(0, 256, 13))
    q = emb[targets] + 0.55 * rng.randn(len(targets), DIM).astype(np.float32)
    q = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
    mesh = make_mesh(data=jax.device_count())
    sflat = build_sharded_flat_index(emb, n_shards=jax.device_count(),
                                     pad_multiple=64)
    _, r0 = sharded_flat_search(mesh, sflat, q, top_k=5)
    _, r1 = sharded_flat_search_prf(mesh, sflat, q, top_k=5,
                                    n_feedback=5, alpha=0.6)
    d0 = sharded_row_to_doc(sflat, np.asarray(r0))
    d1 = sharded_row_to_doc(sflat, np.asarray(r1))
    hit0 = sum(1 for i, t in enumerate(targets) if t in d0[i])
    hit1 = sum(1 for i, t in enumerate(targets) if t in d1[i])
    assert hit1 >= hit0
