"""RM3 pseudo-relevance feedback (tdr.rank.feedback) — beyond-reference.

The reference scores each query once; these tests pin the two-pass
expansion loop: the doc-major mirror against a COO oracle, the miner's
term choices on a controlled corpus, and the end-to-end opt-in surface.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tdr.index import build_index
from tdr.models import BM25Model
from tdr.rank import build_doc_major, prf_expand
from tdr.text import build_vocab, encode_docs
from tdr.utils.config import IndexConfig

CFG = IndexConfig(doc_pad_multiple=8, nnz_pad_multiple=64,
                  head_budget_bytes=1 << 18, head_dtype="float32")


def _world(rng, n_docs=120, vocab_n=300):
    docs = [[f"t{rng.randint(vocab_n)}" for _ in range(rng.randint(5, 60))]
            for _ in range(n_docs)]
    vocab = build_vocab(docs)
    coo = encode_docs(docs, vocab)
    idx = build_index(*coo, vocab.size, index_cfg=CFG, head_size=16)
    return docs, vocab, coo, idx


class TestDocMajor:
    def test_matches_coo_oracle(self):
        """Every (doc, term, weight) of the CSR appears exactly once in the
        doc-major mirror, within its doc's [start, end) segment."""
        rng = np.random.RandomState(3)
        docs, vocab, coo, idx = _world(rng)
        dmi = build_doc_major(idx)
        terms = np.asarray(dmi.terms)
        w = np.asarray(dmi.w)
        ds = np.asarray(dmi.doc_start)

        indptr = np.asarray(idx.indptr)
        pd = np.asarray(idx.postings_doc)
        pw = np.asarray(idx.postings_w)
        nnz = int(indptr[-1])
        got = {}
        for d in range(len(docs)):
            for p in range(ds[d], ds[d + 1]):
                got[(d, int(terms[p]))] = float(w[p])
        want = {}
        for t in range(vocab.size):
            for p in range(indptr[t], indptr[t + 1]):
                want[(int(pd[p]), t)] = float(pw[p])
        assert got == want and len(got) == nnz
        # p_doc covers the widest doc and is bucket-rounded
        widest = max(ds[d + 1] - ds[d] for d in range(len(docs)))
        assert dmi.p_doc >= widest and dmi.p_doc % 64 == 0

    def test_outlier_wide_doc_is_truncated(self):
        """One pathological 2000-unique-term doc must not inflate p_doc
        (and with it every query's expansion working set) past MAX_P_DOC:
        the wide doc keeps its MAX_P_DOC highest-weight terms, every other
        doc keeps its full segment."""
        from tdr.rank.feedback import MAX_P_DOC

        docs = [[f"w{j}" for j in range(2000)]] + \
               [[f"a{i}_{j}" for j in range(5)] for i in range(30)]
        vocab = build_vocab(docs)
        coo = encode_docs(docs, vocab)
        idx = build_index(*coo, vocab.size, index_cfg=CFG, head_size=16)
        dmi = build_doc_major(idx)
        ds = np.asarray(dmi.doc_start)
        assert ds[1] - ds[0] == MAX_P_DOC
        assert dmi.p_doc == MAX_P_DOC
        for d in range(1, 31):
            assert ds[d + 1] - ds[d] == 5
        # kept slots are the wide doc's highest-weight terms
        w = np.asarray(dmi.w)[ds[0]:ds[1]]
        indptr = np.asarray(idx.indptr)
        pw = np.asarray(idx.postings_w)
        pd_host = np.asarray(idx.postings_doc)
        all_w0 = np.sort(pw[:int(indptr[-1])][pd_host[:int(indptr[-1])] == 0])
        np.testing.assert_allclose(np.sort(w), all_w0[-MAX_P_DOC:], rtol=1e-6)

    def test_pad_docs_are_empty(self):
        rng = np.random.RandomState(4)
        docs, vocab, coo, idx = _world(rng, n_docs=50)
        dmi = build_doc_major(idx)
        ds = np.asarray(dmi.doc_start)
        nnz = int(np.asarray(idx.indptr)[-1])
        assert ds[len(docs)] == nnz
        assert all(ds[d] == nnz for d in range(len(docs), idx.n_docs_pad))


class TestExpansion:
    def _controlled(self):
        """Docs about one 'topic' share co-occurring terms; the query hits
        only one of them — expansion must mine the co-occurring rest."""
        topic = [["alpha", "beta", "gamma", "delta"] + [f"n{i}_{j}"
                                                        for j in range(2)]
                 for i in range(20)]
        noise = [[f"x{i}_{j}" for j in range(6)] for i in range(40)]
        docs = topic + noise
        ids = [f"d{i}" for i in range(len(docs))]
        return docs, ids

    def test_mines_cooccurring_terms(self):
        docs, ids = self._controlled()
        m = BM25Model.build(docs, ids, index_cfg=CFG)
        qids, qw = m.encode_query_tokens([["alpha"]])
        vals, rows = m._score_encoded(qids, qw, 5)
        q2, w2 = prf_expand(m._doc_major(), m.index.vocab_size, qids, qw,
                            vals, rows, n_expand=4, n_feedback=5, beta=0.5)
        T = qids.shape[1]
        exp_terms = {int(t) for t, w in zip(np.asarray(q2)[0, T:],
                                            np.asarray(w2)[0, T:]) if w > 0}
        names = {t: i for t, i in m.vocab.term_to_id.items()}
        assert names["beta"] in exp_terms
        assert names["gamma"] in exp_terms
        assert names["delta"] in exp_terms
        # the query's own term must NOT be re-added
        assert names["alpha"] not in exp_terms
        # expansion weights are beta-scaled relative to the strongest term
        w_exp = np.asarray(w2)[0, T:]
        assert 0 < w_exp.max() <= 0.5 + 1e-6

    def test_beta_weights_bounded_and_original_intact(self):
        docs, ids = self._controlled()
        m = BM25Model.build(docs, ids, index_cfg=CFG)
        qids, qw = m.encode_query_tokens([["alpha", "beta"]])
        vals, rows = m._score_encoded(qids, qw, 5)
        q2, w2 = prf_expand(m._doc_major(), m.index.vocab_size, qids, qw,
                            vals, rows, n_expand=4, n_feedback=5, beta=0.3)
        T = qids.shape[1]
        np.testing.assert_array_equal(np.asarray(q2)[:, :T], np.asarray(qids))
        np.testing.assert_array_equal(np.asarray(w2)[:, :T], np.asarray(qw))

    def test_no_feedback_docs_is_safe(self):
        """Queries with no scoring hits (all -inf / 0) must expand to
        nothing rather than crash or emit junk terms."""
        docs, ids = self._controlled()
        m = BM25Model.build(docs, ids, index_cfg=CFG)
        qids = jnp.zeros((1, 4), jnp.int32)
        qw = jnp.zeros((1, 4), jnp.float32)
        vals = jnp.full((1, 5), -jnp.inf)
        rows = jnp.zeros((1, 5), jnp.int32)
        q2, w2 = prf_expand(m._doc_major(), m.index.vocab_size, qids, qw,
                            vals, rows, n_expand=4, n_feedback=5, beta=0.5)
        assert float(np.asarray(w2)[0, 4:].sum()) == 0.0


class TestModelSurface:
    _controlled = TestExpansion._controlled

    def test_prf_recall_on_weak_queries(self):
        """Hard case the feature exists for: the query carries ONE shared
        topic term plus junk; BM25 alone cannot separate the target from
        its topic-mates, feedback's co-occurrence terms must not HURT, and
        a query whose own term is too weak gains candidates."""
        # topic docs share topic terms AND each carries a signature
        docs = [[f"top{i % 4}_a", f"top{i % 4}_b", f"top{i % 4}_c",
                 f"sig{i}"] for i in range(60)]
        ids = [f"d{i}" for i in range(60)]
        base = BM25Model.build(docs, ids, index_cfg=CFG)
        prf = BM25Model.build(docs, ids, index_cfg=CFG)
        prf.prf = True
        prf.prf_docs = 3
        prf.prf_terms = 4
        queries = [[f"sig{i}", f"top{i % 4}_a"] for i in range(20)]
        r0 = base.retrieve_tokens(queries, k=10)
        r1 = prf.retrieve_tokens(queries, k=10)
        hit0 = sum(1 for i, r in enumerate(r0) if f"d{i}" in r)
        hit1 = sum(1 for i, r in enumerate(r1) if f"d{i}" in r)
        assert hit1 >= hit0  # expansion must not lose resolvable targets

    def test_prf_off_is_identical_to_base(self):
        """Turning prf ON and back OFF must leave the off path bit-identical
        to a model that never ran feedback (no cached-state leakage)."""
        rng = np.random.RandomState(13)
        docs, vocab, coo, idx = _world(rng)
        ids = [f"d{i}" for i in range(len(docs))]
        m0 = BM25Model.build(docs, ids, index_cfg=CFG)
        m1 = BM25Model.build(docs, ids, index_cfg=CFG)
        q = [list(docs[i][:3]) for i in range(10)]
        m1.prf = True
        m1.topk_tokens(q, k=10)          # runs the two-pass loop
        m1.prf = False
        np.testing.assert_array_equal(
            m0.topk_tokens(q, k=10)[1], m1.topk_tokens(q, k=10)[1])

    def test_prf_idf_weighted_expansion_participates(self):
        """On idf-weighted cosine queries the expansion weights must land
        in the idf scale (beta * max(qw)), not at unit scale where they
        would be ranking no-ops."""
        docs, ids = self._controlled()
        from tdr.models import TfidfCosineModel

        m = TfidfCosineModel.build(docs, ids, index_cfg=CFG)
        qids, qw = m.encode_query_tokens([["alpha"]])
        vals, rows = m._score_encoded(qids, qw, 5)
        q2, w2 = prf_expand(m._doc_major(), m.index.vocab_size, qids, qw,
                            vals, rows, n_expand=4, n_feedback=5, beta=0.5)
        T = qids.shape[1]
        w_exp = np.asarray(w2)[0, T:]
        q_max = float(np.asarray(qw)[0].max())
        assert q_max > 1.0               # idf scale, not unit
        assert w_exp.max() > 0.4 * q_max
