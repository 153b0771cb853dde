"""Small-batch compile buckets (VERDICT r3 #6): single/small serving
queries pad to Q∈{1,8} instead of the full query_batch, and mixed-bucket
calls still resolve correctly through the shape-grouped packed gather.
"""

import numpy as np

from tdr.data import synthetic_corpus, SyntheticSpec
from tdr.eval import recall_at_k
from tdr.models import BM25Model
from tdr.rank import LanguageRouter, build_language_models
from tdr.utils.config import IndexConfig


def _world():
    corpus, queries = synthetic_corpus(SyntheticSpec(
        n_docs=240, n_queries=40, seed=9, ref_proportions=False,
        langs=("en", "fr")))
    models = build_language_models(
        corpus, BM25Model, index_cfg=IndexConfig(
            doc_pad_multiple=8, nnz_pad_multiple=64,
            head_budget_bytes=1 << 20))
    return models, queries


def test_pad_target_selects_buckets():
    models, _ = _world()
    r = LanguageRouter(models, query_batch=64)
    assert r._pad_target(1) == 1
    assert r._pad_target(2) == 8
    assert r._pad_target(8) == 8
    assert r._pad_target(9) == 64
    assert r._pad_target(64) == 64
    # buckets >= query_batch never apply
    r2 = LanguageRouter(models, query_batch=4)
    assert r2._pad_target(1) == 1
    assert r2._pad_target(3) == 4
    # disabled buckets restore the single-shape behavior
    r3 = LanguageRouter(models, query_batch=64, query_buckets=())
    assert r3._pad_target(1) == 64


def test_bucketed_results_match_full_batch():
    """Every bucket and mixed-bucket composition returns the same results
    as the single-shape router."""
    models, queries = _world()
    full = LanguageRouter(models, query_batch=64, query_buckets=())
    bucketed = LanguageRouter(models, query_batch=64)
    want = full.retrieve(queries.queries, queries.langs, k=5)

    # single query (bucket 1)
    for i in (0, 3, 17):
        got = bucketed.retrieve([queries.queries[i]], [queries.langs[i]], k=5)
        assert got == [want[i]]
    # small group (bucket 8)
    got = bucketed.retrieve(queries.queries[:5], queries.langs[:5], k=5)
    assert got == want[:5]
    # full set: en group (>8) rides query_batch while fr (<8 per chunk) may
    # ride a small bucket — mixed shapes in ONE call
    got = bucketed.retrieve(queries.queries, queries.langs, k=5)
    assert got == want
    # scores path too
    got_d, got_s = bucketed.retrieve_with_scores(
        queries.queries[:3], queries.langs[:3], k=5)
    want_d, want_s = full.retrieve_with_scores(
        queries.queries[:3], queries.langs[:3], k=5)
    assert got_d == want_d
    np.testing.assert_allclose(got_s, want_s)


def test_bucketed_recall_is_sane():
    models, queries = _world()
    r = LanguageRouter(models, query_batch=16)
    res = [r.retrieve([q], [l], k=10)[0]
           for q, l in zip(queries.queries, queries.langs)]
    assert recall_at_k(res, queries.positive_docs, 10) > 0.9
