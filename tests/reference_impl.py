"""Naive NumPy re-implementations of the reference's scoring formulas.

These are *golden oracles* for the device kernels — straight transcriptions
of the math in SURVEY.md §2a (written independently against the formulas, not
copied code).  Everything is O(Python loops); only used on tiny corpora.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Sequence

import numpy as np


def idf_bm25(n_docs: int, df: int) -> float:
    """ln(1 + (N-df+0.5)/(df+0.5)) — bm25_ranking.ipynb:188-190."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def idf_classic(n_docs: int, df: int) -> float:
    """ln((N+1)/(df+1)) + 1 — faiss_based_ANN_Implementation.py:88."""
    return math.log((n_docs + 1.0) / (df + 1.0)) + 1.0


class NaiveBM25:
    """Reference-formula BM25 over token lists.

    ``dl_scaled_by_b=False`` reproduces the winning variant's denominator
    ``tf + k1*(1 - b + dl/avgdl)`` (bm25_ranking.ipynb:202).
    """

    def __init__(self, docs_tokens: Sequence[Sequence[str]], k1=1.5, b=0.75,
                 dl_scaled_by_b=False):
        self.k1, self.b, self.dl_scaled_by_b = k1, b, dl_scaled_by_b
        self.n = len(docs_tokens)
        self.tf = [Counter(toks) for toks in docs_tokens]
        self.dl = [sum(c.values()) for c in self.tf]
        self.avgdl = sum(self.dl) / max(self.n, 1)
        self.df = Counter()
        for c in self.tf:
            self.df.update(c.keys())
        self.idf = {t: idf_bm25(self.n, d) for t, d in self.df.items()}

    def score(self, query_tokens: Sequence[str], doc: int) -> float:
        s = 0.0
        for t in set(query_tokens):
            tf = self.tf[doc].get(t, 0)
            if tf == 0 or t not in self.idf:
                continue
            norm = (self.b if self.dl_scaled_by_b else 1.0) * self.dl[doc] / self.avgdl
            denom = tf + self.k1 * (1.0 - self.b + norm)
            s += self.idf[t] * tf * (self.k1 + 1.0) / denom
        return s

    def get_scores(self, query_tokens: Sequence[str]) -> np.ndarray:
        return np.array([self.score(query_tokens, d) for d in range(self.n)])

    def top_n(self, query_tokens: Sequence[str], n: int) -> List[int]:
        s = self.get_scores(query_tokens)
        return list(np.argsort(-s, kind="stable")[:n])


class NaiveTfidfCosine:
    """Hand-rolled TF-IDF + cosine (cosine_similarity_bm25_reranking.py:72-126,
    198-238 semantics: classic idf, raw tf, per-doc L2 normalization, query
    vector = idf per present term)."""

    def __init__(self, docs_tokens: Sequence[Sequence[str]]):
        self.n = len(docs_tokens)
        self.tf = [Counter(toks) for toks in docs_tokens]
        self.df = Counter()
        for c in self.tf:
            self.df.update(c.keys())
        self.idf = {t: idf_classic(self.n, d) for t, d in self.df.items()}
        self.docvecs: List[Dict[str, float]] = []
        for c in self.tf:
            v = {t: cnt * self.idf[t] for t, cnt in c.items()}
            norm = math.sqrt(sum(x * x for x in v.values())) or 1.0
            self.docvecs.append({t: x / norm for t, x in v.items()})

    def get_scores(self, query_tokens: Sequence[str]) -> np.ndarray:
        qv = {t: self.idf[t] for t in set(query_tokens) if t in self.idf}
        out = np.zeros(self.n)
        for d, dv in enumerate(self.docvecs):
            out[d] = sum(w * dv.get(t, 0.0) for t, w in qv.items())
        return out
