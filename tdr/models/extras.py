"""Auxiliary rankers from the reference's experimental branches.

* ``LogisticRegressionRanker`` — the from-scratch sigmoid + gradient-descent
  ranker (text_preprocessing_and_tfidf.py:112-144, 261-285: 1000 epochs,
  lr 0.01, trained on query vectors against positive/negative doc labels).
  Here: the same model as a jitted optax-free JAX loop (full-batch GD, the
  reference's exact schedule) over low-rank or dense feature vectors.
* ``UnigramLanguageModel`` — the abandoned unigram LM
  (text_preprocessing_and_embedding_setup.py:238-260): corpus term
  probabilities; document score = sum of log term probs of the query (the
  reference multiplied raw probs; log-space avoids underflow, identical
  ranking).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tdr.index.build import SparseIndex


# --------------------------------------------------------------------------
# from-scratch logistic regression (JAX)
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("epochs",))
def _train_logreg(X: jnp.ndarray, y: jnp.ndarray, lr: float, epochs: int):
    n, d = X.shape

    def epoch(carry, _):
        w, b = carry
        z = X @ w + b
        p = jax.nn.sigmoid(z)
        dz = (p - y) / n
        return (w - lr * (X.T @ dz), b - lr * jnp.sum(dz)), None

    (w, b), _ = jax.lax.scan(
        epoch, (jnp.zeros((d,), jnp.float32), jnp.float32(0.0)), None,
        length=epochs)
    return w, b


@dataclass
class LogisticRegressionRanker:
    w: Optional[jnp.ndarray] = None
    b: Optional[jnp.ndarray] = None
    lr: float = 0.01
    epochs: int = 1000

    def fit(self, X: np.ndarray, y: np.ndarray) -> "LogisticRegressionRanker":
        self.w, self.b = _train_logreg(
            jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
            self.lr, self.epochs)
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        assert self.w is not None, "fit first"
        return np.asarray(jax.nn.sigmoid(jnp.asarray(X, jnp.float32) @ self.w + self.b))

    def rank(self, X: np.ndarray, k: int = 10) -> np.ndarray:
        p = self.predict_proba(X)
        return np.argsort(-p, kind="stable")[:k]


# --------------------------------------------------------------------------
# unigram language model
# --------------------------------------------------------------------------

@dataclass
class UnigramLanguageModel:
    log_prob: jnp.ndarray       # (V,) corpus unigram log-probabilities

    @classmethod
    def from_index(cls, index: SparseIndex, smoothing: float = 1.0) -> "UnigramLanguageModel":
        """Corpus term counts from the CSR tf values (CountVectorizer
        equivalent), Laplace-smoothed."""
        V = index.vocab_size
        terms = jnp.clip(
            jnp.searchsorted(index.indptr,
                             jax.lax.broadcasted_iota(
                                 jnp.int32, (index.postings_tf.shape[0], 1), 0
                             ).squeeze(-1), side="right") - 1, 0, V - 1)
        counts = jnp.zeros((V,), jnp.float32).at[terms].add(index.postings_tf)
        probs = (counts + smoothing) / (jnp.sum(counts) + smoothing * V)
        return cls(jnp.log(probs))

    def score_queries(self, qids: np.ndarray, qw: np.ndarray) -> np.ndarray:
        """Per-query log-probability under the corpus unigram model
        (compute_document_probability semantics, in log space)."""
        lp = self.log_prob[np.clip(qids, 0, self.log_prob.shape[0] - 1)]
        return np.asarray(jnp.sum(jnp.where(qw > 0, lp * qw, 0.0), axis=1))
