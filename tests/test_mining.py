"""Hard-negative mining + pseudo-query augmentation (tdr.train.mining).

The reference never refreshes negatives (train.csv's are static;
team_run1.py re-ranks with a frozen model).  These tests pin the DPR/ANCE
mining loop tdr adds on top: negatives come from the live retriever's own
top ranks, positives are never mined as negatives, and the augmented
QuerySets feed train_dense_retriever unchanged.
"""

import numpy as np
import pytest

from tdr.data import SyntheticSpec, synthetic_corpus
from tdr.rank import LanguageRouter, build_language_models
from tdr.train.mining import (
    concat_querysets,
    make_pseudo_queries,
    mine_hard_negatives,
)


@pytest.fixture(scope="module")
def small_world():
    corpus, queries = synthetic_corpus(
        SyntheticSpec(n_docs=400, n_queries=40, seed=11, hard=True,
                      ref_proportions=False, langs=("en", "fr")))
    router = LanguageRouter(build_language_models(corpus), query_batch=64)
    return corpus, queries, router


def test_mined_negatives_shape_and_exclusion(small_world):
    corpus, queries, router = small_world
    mined = mine_hard_negatives(router, queries, n_neg=2, depth=10,
                                fallback_docids=corpus.docids)
    assert mined.negative_docs is not None
    assert len(mined.negative_docs) == len(queries)
    known = set(corpus.docids)
    for negs, pos in zip(mined.negative_docs, mined.positive_docs):
        assert len(negs) == 2
        assert pos not in negs          # the positive is never a negative
        assert len(set(negs)) == len(negs) or negs[0] != negs[1]
        assert set(negs) <= known
    # everything else is untouched
    assert mined.queries == queries.queries
    assert mined.positive_docs == queries.positive_docs


def test_mined_negatives_are_top_ranked(small_world):
    """Negatives must be the retriever's HIGHEST-ranked non-positives —
    that is the entire point vs the random fallback."""
    corpus, queries, router = small_world
    mined = mine_hard_negatives(router, queries, n_neg=2, depth=10)
    ranked = router.retrieve(queries.queries, queries.langs, k=11)
    for docs, pos, negs in zip(ranked, queries.positive_docs,
                               mined.negative_docs):
        expect = [d for d in docs if d != pos][:2]
        assert negs == expect


def test_skip_top_offsets_the_window(small_world):
    corpus, queries, router = small_world
    m0 = mine_hard_negatives(router, queries, n_neg=1, depth=10)
    m1 = mine_hard_negatives(router, queries, n_neg=1, depth=10, skip_top=1)
    ranked = router.retrieve(queries.queries, queries.langs, k=12)
    for docs, pos, a, b in zip(ranked, queries.positive_docs,
                               m0.negative_docs, m1.negative_docs):
        nonpos = [d for d in docs if d != pos]
        assert a == nonpos[:1]
        assert b == nonpos[1:2]


def test_requires_positives(small_world):
    corpus, queries, router = small_world
    import dataclasses
    unlabeled = dataclasses.replace(queries, positive_docs=None)
    with pytest.raises(ValueError):
        mine_hard_negatives(router, unlabeled)


def test_pseudo_queries_point_at_their_document(small_world):
    corpus, _, router = small_world
    pqs = make_pseudo_queries(corpus, 50, seed=3)
    assert len(pqs) == 50
    by_id = dict(zip(corpus.docids, corpus.texts))
    lang_of = dict(zip(corpus.docids, corpus.langs))
    for q, pos, lang in zip(pqs.queries, pqs.positive_docs, pqs.langs):
        doc_toks = set(by_id[pos].split())
        q_toks = q.split()
        assert 3 <= len(q_toks) <= 6
        assert set(q_toks) <= doc_toks   # every term came from the positive
        assert lang == lang_of[pos]
    # deterministic under a fixed seed
    again = make_pseudo_queries(corpus, 50, seed=3)
    assert again.queries == pqs.queries
    assert again.positive_docs == pqs.positive_docs


def test_pseudo_queries_retrievable(small_world):
    """Sanity: rare-term pseudo-queries should mostly retrieve their own
    document — they are (query, positive) training pairs, not noise."""
    corpus, _, router = small_world
    pqs = make_pseudo_queries(corpus, 40, seed=5)
    res = router.retrieve(pqs.queries, pqs.langs, k=10)
    hit = sum(pos in docs for docs, pos in zip(res, pqs.positive_docs))
    assert hit >= 30   # >= 75% — df-weighted terms are distinctive


def test_exhausted_fallback_pool_terminates(small_world):
    """ADVICE r4 regression: a fallback pool with no eligible candidate
    (all entries == pos) used to rejection-sample forever.  Now the list
    simply stays short (the trainer pads downstream)."""
    corpus, queries, router = small_world
    one = queries.query_ids[:1], queries.queries[:1], queries.langs[:1]
    import dataclasses
    q1 = dataclasses.replace(queries, query_ids=list(one[0]),
                             queries=list(one[1]), langs=list(one[2]),
                             positive_docs=queries.positive_docs[:1],
                             negative_docs=None)
    pos = q1.positive_docs[0]
    mined = mine_hard_negatives(router, q1, n_neg=400, depth=2,
                                fallback_docids=[pos, pos])
    assert len(mined.negative_docs[0]) < 400        # short, not hung
    assert pos not in mined.negative_docs[0]
    # distinct-pool padding: negatives stay unique
    negs = mined.negative_docs[0]
    assert len(negs) == len(set(negs))


def test_pseudo_queries_degenerate_corpus_raises():
    """ADVICE r4 regression: a corpus where no document clears terms_lo
    used to resample forever; now it raises."""
    from tdr.data.loaders import Corpus

    tiny = Corpus(docids=["a", "b"], texts=["x y", "z"], langs=["en", "en"])
    with pytest.raises(ValueError, match="terms_lo"):
        make_pseudo_queries(tiny, 4)


def test_concat_querysets(small_world):
    corpus, queries, router = small_world
    pqs = make_pseudo_queries(corpus, 10, seed=1)
    both = concat_querysets([queries, pqs])
    assert len(both) == len(queries) + 10
    assert both.queries[: len(queries)] == queries.queries
    assert both.positive_docs[-10:] == pqs.positive_docs
    # negative_docs merge only when every part has them
    assert both.negative_docs is None
    mined_a = mine_hard_negatives(router, queries, n_neg=1)
    mined_b = mine_hard_negatives(router, pqs, n_neg=1,
                                  fallback_docids=corpus.docids)
    merged = concat_querysets([mined_a, mined_b])
    assert merged.negative_docs is not None
    assert len(merged.negative_docs) == len(both)


def test_mined_triples_feed_the_trainer(small_world):
    """End-to-end: mined QuerySet drives train_dense_retriever with its
    explicit-negatives path (no random fallback)."""
    corpus, queries, router = small_world
    from tdr.train import train_dense_retriever
    from tdr.utils.config import DenseConfig

    mined = mine_hard_negatives(router, queries, n_neg=2, depth=10,
                                fallback_docids=corpus.docids)
    cfg = DenseConfig(vocab_size=512, dim=16, depth=1, heads=2, max_len=16)
    model, state, metrics = train_dense_retriever(
        corpus, mined, cfg, epochs=1, batch_size=8, n_neg=2, lr=1e-3)
    assert np.isfinite(metrics["loss"])
    assert len(metrics["loss_curve"]) == 1
