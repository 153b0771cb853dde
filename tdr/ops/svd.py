"""Randomized SVD dimensionality reduction on the sparse TF-IDF index.

Replaces the reference's sklearn TruncatedSVD over scipy CSR
(faiss_based_ANN_Implementation.py:269-278, 256/300 components;
text_preprocessing_and_batch_processing.py:210-219) with a JAX randomized
range-finder SVD that never materializes the dense (N x V) matrix:

    Y = A @ G          (sparse-dense product via postings scatter, on device)
    Q = qr(Y)          (orthonormal range basis)
    B = Q^T @ A        (again via postings, transposed)
    U_b S V^T = svd(B) (small dense SVD)
    doc embeddings = Q @ U_b * S ;  query projection = V

A is the (N docs x V terms) TF-IDF matrix stored term-major in the
SparseIndex; both products are segment scatters over the flat postings,
which XLA handles once per build (not per query).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdr.index.build import SparseIndex


def _term_of_posting(index: SparseIndex) -> jnp.ndarray:
    """(nnz_pad,) int32: owning term id per posting slot (from indptr)."""
    nnz = index.postings_doc.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (nnz, 1), 0).squeeze(-1)
    # searchsorted over indptr: term t owns [indptr[t], indptr[t+1])
    return jnp.searchsorted(index.indptr, pos, side="right").astype(jnp.int32) - 1


@partial(jax.jit, static_argnames=("rank", "oversample", "iters"))
def tfidf_svd(
    index: SparseIndex, key: jnp.ndarray, rank: int = 256,
    oversample: int = 16, iters: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """→ (doc_emb (N_pad, rank), singular values (rank,), Vt (rank, V)).

    ``doc_emb`` rows are the TruncatedSVD doc coordinates (U*S); queries
    project with ``Vt`` (q_low = Vt @ q_sparse).
    """
    V = index.vocab_size
    N = index.n_docs_pad
    r = min(rank + oversample, min(V, N))
    w = index.postings_w                       # (nnz,) tf-idf values (L2-normed docs)
    docs = index.postings_doc
    terms = jnp.clip(_term_of_posting(index), 0, V - 1)
    # padding slots have w == 0, so they contribute nothing

    def a_mat(X):              # (V, k) -> (N, k):  A @ X
        contrib = w[:, None] * X[terms]
        return jnp.zeros((N, X.shape[1]), jnp.float32).at[docs].add(contrib)

    def at_mat(Y):             # (N, k) -> (V, k):  A^T @ Y
        contrib = w[:, None] * Y[docs]
        return jnp.zeros((V, Y.shape[1]), jnp.float32).at[terms].add(contrib)

    G = jax.random.normal(key, (V, r), jnp.float32)
    Y = a_mat(G)
    # power iterations sharpen the spectrum (randomized SVD standard)
    for _ in range(iters):
        Y, _ = jnp.linalg.qr(Y)
        Y = a_mat(at_mat(Y))
    Q, _ = jnp.linalg.qr(Y)                    # (N, r)
    B = at_mat(Q).T                            # (r, V)
    Ub, S, Vt = jnp.linalg.svd(B, full_matrices=False)
    k = min(rank, S.shape[0])
    doc_emb = (Q @ Ub[:, :k]) * S[None, :k]
    return doc_emb, S[:k], Vt[:k]


def project_queries(
    Vt: jnp.ndarray, qids: jnp.ndarray, qw: jnp.ndarray
) -> jnp.ndarray:
    """Sparse query vectors → low-rank coordinates: (Q, rank)."""
    Vq = Vt.T[jnp.clip(qids, 0, Vt.shape[1] - 1)]      # (Q, T, rank)
    return jnp.einsum("qtr,qt->qr", Vq, qw)


def l2_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """faiss.normalize_L2 equivalent."""
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)
