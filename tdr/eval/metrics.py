"""L5 evaluation: Recall@k, MRR@k, per-language breakdown.

Mirrors the reference's evaluators: evaluate_recall_at_k
(bm25_ranking.ipynb:329-364 — hit if the positive doc appears in the top-k),
MRR@{1,5,10} + Recall@{1,5,10} (team_run1.py:296-325), and the per-language
recall breakdown (text_preprocessing_and_embedding_setup.py:535-562).
Returns a structured metrics dict instead of prints.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence


def recall_at_k(
    retrieved: Sequence[Sequence[str]], positives: Sequence[str], k: int = 10
) -> float:
    """Fraction of queries whose positive doc is in the top-k."""
    if not retrieved:
        return 0.0
    hits = sum(1 for r, p in zip(retrieved, positives) if p in r[:k])
    return hits / len(retrieved)


def mrr_at_k(
    retrieved: Sequence[Sequence[str]], positives: Sequence[str], k: int = 10
) -> float:
    """Mean reciprocal rank of the positive doc within the top-k."""
    if not retrieved:
        return 0.0
    total = 0.0
    for r, p in zip(retrieved, positives):
        try:
            total += 1.0 / (list(r[:k]).index(p) + 1)
        except ValueError:
            pass
    return total / len(retrieved)


def evaluate_retrieval(
    retrieved: Sequence[Sequence[str]],
    positives: Sequence[str],
    langs: Optional[Sequence[str]] = None,
    ks: Sequence[int] = (1, 5, 10),
) -> Dict[str, object]:
    """Full report: recall@k / mrr@k for each k, plus per-language recall@max(k)."""
    report: Dict[str, object] = {"n_queries": len(retrieved)}
    for k in ks:
        report[f"recall@{k}"] = recall_at_k(retrieved, positives, k)
        report[f"mrr@{k}"] = mrr_at_k(retrieved, positives, k)
    if langs is not None:
        kmax = max(ks)
        by_lang: Dict[str, List[int]] = {}
        for i, l in enumerate(langs):
            by_lang.setdefault(l, []).append(i)
        report["per_language"] = {
            l: {
                "n": len(idx),
                f"recall@{kmax}": recall_at_k(
                    [retrieved[i] for i in idx], [positives[i] for i in idx], kmax
                ),
            }
            for l, idx in sorted(by_lang.items())
        }
    return report
