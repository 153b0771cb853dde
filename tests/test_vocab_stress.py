"""Vocab-stress synthetic mode (VERDICT r3 #3): reference-scale vocabulary
so the head budget CANNOT cover the dominant partition's vocab and the
tail machinery carries real load.
"""

import numpy as np

from tdr.data.synthetic import (
    STRESS_VOCAB,
    SyntheticSpec,
    _bulk_words,
    synthetic_corpus,
)


def test_bulk_words_deterministic_and_unique():
    for lang, n in [("en", 25_000), ("ar", 25_000), ("ko", 25_000)]:
        w1 = _bulk_words(lang, n, 3)
        w2 = _bulk_words(lang, n, 3)
        assert w1 == w2
        assert len(set(w1)) == n
    # different seeds give different orders
    assert _bulk_words("en", 1000, 1) != _bulk_words("en", 1000, 2)


def test_default_path_untouched_by_stress_flag():
    """vocab_stress=False must produce the same corpus as before the flag
    existed (every pinned recall band in the suite depends on it)."""
    c1, q1 = synthetic_corpus(SyntheticSpec(n_docs=120, n_queries=10, seed=5))
    c2, q2 = synthetic_corpus(SyntheticSpec(n_docs=120, n_queries=10, seed=5,
                                            vocab_stress=False))
    assert c1.texts == c2.texts and q1.queries == q2.queries


def test_stress_mode_exceeds_head_budget_and_retrieves():
    """At a small doc count with the stress vocab and a tiny head budget the
    en index must be tail-bearing (head < vocab) and still retrieve."""
    from tdr.models import BM25Model
    from tdr.rank import build_language_models, LanguageRouter
    from tdr.eval import recall_at_k
    from tdr.utils.config import IndexConfig

    corpus, queries = synthetic_corpus(SyntheticSpec(
        n_docs=400, n_queries=40, seed=11, hard=True, vocab_stress=True,
        langs=("en", "fr")))
    models = build_language_models(
        corpus, BM25Model,
        index_cfg=IndexConfig(head_budget_bytes=1 << 20))
    en = models["en"]
    assert en.index.head_size < en.vocab.size, (
        en.index.head_size, en.vocab.size)
    assert en.index.tail_pmax > 0
    router = LanguageRouter(models, query_batch=16)
    res = router.retrieve(queries.queries, queries.langs, k=10)
    r = recall_at_k(res, queries.positive_docs, 10)
    assert r > 0.5, r


def test_stress_vocab_targets_cover_survey_bars():
    """SURVEY §7 bars: en >= 200k unigrams; latin raw vocab 60k (bigram
    augmentation inflates realized index vocab well past it)."""
    assert STRESS_VOCAB["en"] >= 200_000
    for l in ("fr", "de", "es", "it"):
        assert STRESS_VOCAB[l] >= 50_000
