"""Golden tests: device index build + scoring vs naive reference formulas."""

import numpy as np
import pytest

import jax.numpy as jnp

from tdr.text import build_vocab, encode_docs, encode_queries
from tdr.index import build_index, build_tfidf_index, compute_idf
from tdr.ops import score_batch, score_and_topk, score_pairs
from tdr.utils.config import BM25Config, IndexConfig

from tests.reference_impl import NaiveBM25, NaiveTfidfCosine, idf_bm25, idf_classic

DOCS = [
    "the cat sat on the mat".split(),
    "the dog chased the cat around".split(),
    "quantum computing with superconducting qubits".split(),
    "cats and dogs and cats again cats".split(),
    "mat mat mat dog".split(),
    "superconducting qubits require cryogenic cooling".split(),
]
QUERIES = [
    "cat mat".split(),
    "superconducting qubits".split(),
    "dog".split(),
    "cat cat cat".split(),          # duplicate terms: scored once (set semantics)
    "nonexistent term".split(),
]


def _build(docs=DOCS, head_size=None, **bm25_kw):
    vocab = build_vocab(docs)
    coo = encode_docs(docs, vocab)
    idx = build_index(*coo, vocab.size, bm25=BM25Config(**bm25_kw),
                      index_cfg=IndexConfig(doc_pad_multiple=8, nnz_pad_multiple=16, head_dtype="float32"),
                      head_size=head_size)
    return vocab, idx


@pytest.mark.parametrize("head_size", [0, 2, 4, None])  # None = auto (all-head here)
def test_bm25_scores_match_reference(head_size):
    vocab, idx = _build(head_size=head_size)
    ref = NaiveBM25(DOCS)
    qids, qw = encode_queries(QUERIES, vocab, max_terms=8)
    scores = np.asarray(score_batch(idx, jnp.asarray(qids), jnp.asarray(qw)))
    for qi, q in enumerate(QUERIES):
        expect = ref.get_scores(q)
        got = scores[qi, : len(DOCS)]
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-5)
    # padded docs masked to -inf
    assert np.all(np.isneginf(scores[:, len(DOCS):]))


def test_bm25_textbook_variant():
    """dl_scaled_by_b=True is the textbook b·dl/avgdl denominator
    (team_run1.py:193)."""
    vocab, idx = _build(dl_scaled_by_b=True)
    ref = NaiveBM25(DOCS, dl_scaled_by_b=True)
    qids, qw = encode_queries(QUERIES[:3], vocab, max_terms=8)
    scores = np.asarray(score_batch(idx, jnp.asarray(qids), jnp.asarray(qw)))
    for qi, q in enumerate(QUERIES[:3]):
        np.testing.assert_allclose(scores[qi, : len(DOCS)], ref.get_scores(q),
                                   rtol=2e-4, atol=1e-5)


def test_topk_order_matches_reference():
    vocab, idx = _build()
    ref = NaiveBM25(DOCS)
    qids, qw = encode_queries(QUERIES[:4], vocab, max_terms=8)
    vals, docs = score_and_topk(idx, jnp.asarray(qids), jnp.asarray(qw), top_k=3)
    vals, docs = np.asarray(vals), np.asarray(docs)
    for qi, q in enumerate(QUERIES[:4]):
        expect_scores = ref.get_scores(q)
        # compare score multisets at k (order among ties may differ)
        np.testing.assert_allclose(
            sorted(vals[qi], reverse=True),
            sorted(np.sort(expect_scores)[::-1][:3], reverse=True),
            rtol=2e-4, atol=1e-5,
        )
        # the argmax doc must match when unique
        if expect_scores[np.argmax(expect_scores)] > np.partition(expect_scores, -2)[-2]:
            assert docs[qi, 0] == np.argmax(expect_scores)


def test_score_pairs_matches_full_scores():
    vocab, idx = _build(head_size=2)
    qids, qw = encode_queries(QUERIES, vocab, max_terms=8)
    full = np.asarray(score_batch(idx, jnp.asarray(qids), jnp.asarray(qw)))
    cand = np.tile(np.arange(len(DOCS), dtype=np.int32), (len(QUERIES), 1))
    pair = np.asarray(score_pairs(idx, jnp.asarray(qids), jnp.asarray(qw),
                                  jnp.asarray(cand)))
    np.testing.assert_allclose(pair, full[:, : len(DOCS)], rtol=2e-4, atol=1e-5)


def test_idf_variants():
    df = jnp.asarray([1.0, 3.0, 6.0])
    n = 6
    np.testing.assert_allclose(
        np.asarray(compute_idf(df, n, "bm25")),
        [idf_bm25(n, 1), idf_bm25(n, 3), idf_bm25(n, 6)], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(compute_idf(df, n, "classic")),
        [idf_classic(n, 1), idf_classic(n, 3), idf_classic(n, 6)], rtol=1e-5, atol=1e-5)


def test_index_stats_match_reference():
    vocab, idx = _build()
    ref = NaiveBM25(DOCS)
    assert idx.n_docs == len(DOCS)
    np.testing.assert_allclose(float(idx.stats.avgdl), ref.avgdl, rtol=1e-5)
    for term, tid in vocab.term_to_id.items():
        assert int(idx.stats.df[tid]) == ref.df[term]
        np.testing.assert_allclose(float(idx.stats.idf[tid]), ref.idf[term], rtol=1e-4)
    dl = np.asarray(idx.stats.doc_len)[: len(DOCS)]
    np.testing.assert_allclose(dl, ref.dl)


def test_csr_layout_sorted_and_consistent():
    vocab, idx = _build(head_size=3)
    indptr = np.asarray(idx.indptr)
    docs = np.asarray(idx.postings_doc)
    assert indptr[0] == 0
    assert indptr[-1] == sum(len(set(d)) for d in DOCS)
    for t in range(vocab.size):
        seg = docs[indptr[t]:indptr[t + 1]]
        assert np.all(np.diff(seg) > 0), "postings must be doc-sorted, unique"


def test_tfidf_cosine_matches_reference():
    vocab = build_vocab(DOCS)
    coo = encode_docs(DOCS, vocab)
    for head_size in (0, 3, None):
        idx = build_tfidf_index(*coo, vocab.size,
                                index_cfg=IndexConfig(doc_pad_multiple=8, nnz_pad_multiple=16, head_dtype="float32"),
                                head_size=head_size)
        ref = NaiveTfidfCosine(DOCS)
        qids, qw = encode_queries(QUERIES, vocab, max_terms=8)
        # query weight = idf per present term (cosine_similarity_bm25_reranking.py:121-126)
        qidf = np.asarray(idx.stats.idf)[qids] * (qw > 0)
        scores = np.asarray(score_batch(idx, jnp.asarray(qids), jnp.asarray(qidf)))
        for qi, q in enumerate(QUERIES):
            np.testing.assert_allclose(scores[qi, : len(DOCS)], ref.get_scores(q),
                                       rtol=2e-4, atol=1e-5)


def test_tail_wider_than_head_threshold_unreachable():
    """Every tail term's df must be <= tail_pmax (static bound is exact)."""
    for head_size in (0, 1, 2, 5):
        vocab, idx = _build(head_size=head_size)
        df = np.asarray(idx.stats.df)
        slot = np.asarray(idx.head_slot)
        tail_df = df[slot < 0]
        if len(tail_df):
            assert tail_df.max() <= idx.tail_pmax


def test_empty_query_scores_zero():
    vocab, idx = _build()
    qids = jnp.zeros((1, 8), jnp.int32)
    qw = jnp.zeros((1, 8), jnp.float32)
    scores = np.asarray(score_batch(idx, qids, qw))
    np.testing.assert_allclose(scores[0, : len(DOCS)], 0.0)


def test_df_host_build_matches_device_build():
    """build_index(df_host=...) (the no-sync path) must produce the same
    index as the device-stat path: same head selection (lax.top_k tie
    order), idf, tail_pmax, postings and head rows."""
    rng = np.random.RandomState(4)
    docs = [[f"t{rng.randint(400)}" for _ in range(rng.randint(4, 40))]
            for _ in range(250)]
    vocab = build_vocab(docs)
    coo = encode_docs(docs, vocab)
    cfg = IndexConfig(doc_pad_multiple=128, nnz_pad_multiple=64,
                      head_budget_bytes=1 << 17, head_dtype="float32")
    a = build_index(*coo, vocab.size, index_cfg=cfg)
    b = build_index(*coo, vocab.size, index_cfg=cfg, df_host=vocab.df)
    assert a.head_size == b.head_size
    assert a.tail_pmax == b.tail_pmax
    assert np.array_equal(np.asarray(a.head_slot), np.asarray(b.head_slot))
    np.testing.assert_allclose(np.asarray(a.stats.idf),
                               np.asarray(b.stats.idf), rtol=1e-6)
    assert np.array_equal(np.asarray(a.postings_doc),
                          np.asarray(b.postings_doc))
    np.testing.assert_allclose(np.asarray(a.head_rows),
                               np.asarray(b.head_rows), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.postings_w),
                               np.asarray(b.postings_w), rtol=1e-6)
