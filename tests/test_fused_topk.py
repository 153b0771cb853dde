"""Exactness tests for the fused (sort-based, scatter-free) top-k path and
the bfloat16 dense-head default."""

import numpy as np
import pytest

import jax.numpy as jnp

from tdr.text import build_vocab, encode_docs, encode_queries
from tdr.index import build_index
from tdr.ops import score_and_topk_fused, score_batch
from tdr.utils.config import IndexConfig

F32 = dict(doc_pad_multiple=8, nnz_pad_multiple=64, head_budget_bytes=1 << 18,
           head_dtype="float32")


def _random_world(rng, n_docs=400, vocab_n=600, n_queries=16, max_qlen=20):
    docs = [[f"t{rng.randint(vocab_n)}" for _ in range(rng.randint(5, 150))]
            for _ in range(n_docs)]
    vocab = build_vocab(docs)
    coo = encode_docs(docs, vocab)
    queries = [[f"t{rng.randint(vocab_n)}" for _ in range(rng.randint(1, max_qlen))]
               for _ in range(n_queries)]
    qids, qw = encode_queries(queries, vocab, 24)
    return vocab, coo, jnp.asarray(qids), jnp.asarray(qw)


@pytest.mark.parametrize("head_size", [0, 16, None])
@pytest.mark.parametrize("budget", [64, 1024])
def test_fused_exact_vs_full_scores(head_size, budget):
    rng = np.random.RandomState(7)
    vocab, coo, qids, qw = _random_world(rng)
    idx = build_index(*coo, vocab.size, index_cfg=IndexConfig(**F32),
                      head_size=head_size)
    v, d = score_and_topk_fused(idx, qids, qw, top_k=10, tail_budget=budget)
    v, d = np.asarray(v), np.asarray(d)
    full = np.asarray(score_batch(idx, qids, qw))
    for q in range(v.shape[0]):
        np.testing.assert_allclose(v[q], np.sort(full[q])[::-1][:10],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(full[q][d[q]], v[q], rtol=1e-4, atol=1e-5)
        assert len(set(d[q].tolist())) == 10


def test_fused_exact_when_pad_equals_ndocs():
    """Regression: sentinel doc id must not collide with the last REAL doc
    when n_docs == n_docs_pad (found by the padded-sentinel segment bug)."""
    rng = np.random.RandomState(3)
    vocab, coo, qids, qw = _random_world(rng, n_docs=400)  # 400 % 8 == 0
    idx = build_index(*coo, vocab.size,
                      index_cfg=IndexConfig(**F32, shape_bucketing=False),
                      head_size=16)
    assert idx.n_docs == idx.n_docs_pad
    v, d = score_and_topk_fused(idx, qids, qw, top_k=10, tail_budget=1024)
    full = np.asarray(score_batch(idx, qids, qw))
    for q in range(np.asarray(v).shape[0]):
        np.testing.assert_allclose(np.asarray(v)[q], np.sort(full[q])[::-1][:10],
                                   rtol=1e-4, atol=1e-5)


def test_overflow_fallback_tiny_budget():
    """Budgets far below the active posting count must still be exact via the
    scatter fallback."""
    rng = np.random.RandomState(11)
    vocab, coo, qids, qw = _random_world(rng)
    idx = build_index(*coo, vocab.size, index_cfg=IndexConfig(**F32), head_size=0)
    v, d = score_and_topk_fused(idx, qids, qw, top_k=10, tail_budget=16)
    full = np.asarray(score_batch(idx, qids, qw))
    for q in range(np.asarray(v).shape[0]):
        np.testing.assert_allclose(np.asarray(v)[q], np.sort(full[q])[::-1][:10],
                                   rtol=1e-4, atol=1e-5)


def test_live_slot_compaction_exact_beyond_budget():
    """Round-4 live-slot compaction (approx-mode only; exact mode takes the
    always-full-width merge): when a query touches MORE unique tail docs
    than the compaction width M (=512 floor), the dropped docs are the
    smallest tails and the tau-bound must either prove the result exact or
    re-merge full-width — off-TPU approx_max_k falls back to exact top-k,
    so either way the output equals the full oracle.  World: 1200 docs,
    all-tail index (head_size=0), 20-term queries with ~100-doc posting
    lists → ~900 unique touched docs > M, while total slots stay under the
    2048 budget (no slot overflow, so the compaction path itself is what
    runs)."""
    rng = np.random.RandomState(17)
    # ~60 "topic" terms each appearing in ~100 docs + per-doc noise terms
    docs = []
    for d in range(1200):
        toks = [f"noise{d}_{j}" for j in range(3)]
        for t in range(60):
            if rng.rand() < 100 / 1200:
                toks.append(f"topic{t}")
        docs.append(toks)
    vocab = build_vocab(docs)
    coo = encode_docs(docs, vocab)
    idx = build_index(*coo, vocab.size, index_cfg=IndexConfig(**F32),
                      head_size=0)
    assert int(idx.tail_pmax) >= 129, "world must force B > M"
    queries = [[f"topic{t}" for t in rng.choice(60, 20, replace=False)]
               for _ in range(8)]
    from tdr.text import encode_queries

    qids, qw = encode_queries(queries, vocab, 24)
    v, d = score_and_topk_fused(idx, jnp.asarray(qids), jnp.asarray(qw),
                                top_k=10, tail_budget=2048,
                                topk_mode="approx")
    full = np.asarray(score_batch(idx, jnp.asarray(qids), jnp.asarray(qw)))
    for q in range(np.asarray(v).shape[0]):
        np.testing.assert_allclose(np.asarray(v)[q],
                                   np.sort(full[q])[::-1][:10],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(full[q][np.asarray(d)[q]], np.asarray(v)[q],
                                   rtol=1e-4, atol=1e-5)


def test_bf16_head_preserves_ranking():
    """The bfloat16 head default may perturb scores ~1e-2 relative but must
    preserve top-k doc sets on clearly-separated data."""
    rng = np.random.RandomState(5)
    vocab, coo, qids, qw = _random_world(rng)
    f32 = build_index(*coo, vocab.size, index_cfg=IndexConfig(**F32))
    bf16 = build_index(*coo, vocab.size,
                       index_cfg=IndexConfig(**{**F32, "head_dtype": "bfloat16"}))
    v1, d1 = score_and_topk_fused(f32, qids, qw, top_k=10)
    v2, d2 = score_and_topk_fused(bf16, qids, qw, top_k=10)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=2e-2, atol=1e-2)
    # top-10 sets mostly identical (ordering may swap near-ties)
    agree = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(np.asarray(d1), np.asarray(d2))
    ])
    assert agree >= 0.9, agree


def test_topk_2stage_exact_parity():
    """_topk_2stage (off the production path on v5e; kept for backends
    where full-row sorts dominate) must match lax.top_k exactly, ties
    included."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdr.ops.score import _topk_2stage

    rng = np.random.RandomState(0)
    # duplicate values force tie-order checking
    scores = rng.randint(0, 50, (7, 8192)).astype(np.float32)
    v1, i1 = jax.lax.top_k(jnp.asarray(scores), 10)
    v2, i2 = _topk_2stage(jnp.asarray(scores), 10, block=1024)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # non-divisible / small-N fallback path
    v3, i3 = _topk_2stage(jnp.asarray(scores[:, :3000]), 10, block=1024)
    v4, i4 = jax.lax.top_k(jnp.asarray(scores[:, :3000]), 10)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i4))


def test_full_head_matmul_matches_capped_einsum():
    """The full-head matmul engine must agree with the capped-einsum
    reference for every query under the cap, and be exact (no cap) for
    many-term queries where the einsum would overflow."""
    import jax.numpy as jnp

    from tdr.ops.score import _head_scores_capped, _head_scores_matmul

    rng = np.random.RandomState(13)
    vocab, coo, qids, qw = _random_world(rng)
    idx = build_index(*coo, vocab.size, index_cfg=IndexConfig(**F32))
    q_d, w_d = jnp.asarray(qids), jnp.asarray(qw)
    ref, ovf = _head_scores_capped(idx, q_d, w_d, qids.shape[1])  # uncapped
    got = _head_scores_matmul(idx, q_d, w_d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    assert not bool(np.asarray(ovf).any())


class TestScoreCandidatesFused:
    """score_candidates_fused == score_pairs on f32-head indexes (head
    matmul + compacted-tail candidate match vs the binary-search oracle)."""

    def _world(self, seed=0, head_size=16):
        from tdr.index import build_index
        from tdr.text import build_vocab, encode_docs, encode_queries
        from tdr.utils.config import IndexConfig

        rng = np.random.RandomState(seed)
        docs = [[f"t{rng.randint(700)}" for _ in range(rng.randint(5, 60))]
                for _ in range(350)]
        vocab = build_vocab(docs)
        coo = encode_docs(docs, vocab)
        cfg = IndexConfig(doc_pad_multiple=128, nnz_pad_multiple=64,
                          head_budget_bytes=1 << 16, head_dtype="float32")
        idx = build_index(*coo, vocab.size, index_cfg=cfg, head_size=head_size)
        queries = [[f"t{rng.randint(700)}" for _ in range(rng.randint(1, 10))]
                   for _ in range(20)]
        qids, qw = encode_queries(queries, vocab, 16)
        cand = rng.randint(0, idx.n_docs, (20, 33)).astype(np.int32)
        return idx, jnp.asarray(qids), jnp.asarray(qw), jnp.asarray(cand)

    @pytest.mark.parametrize("engine", ["xla", "pallas_interpret"])
    def test_matches_binary_search_oracle(self, engine):
        from tdr.ops.score import score_candidates_fused, score_pairs

        idx, qids, qw, cand = self._world()
        want = np.asarray(score_pairs(idx, qids, qw, cand))
        got = np.asarray(score_candidates_fused(
            idx, qids, qw, cand, tail_budget=64, tail_engine=engine))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_full_head_coverage_shortcut(self):
        from tdr.ops.score import score_candidates_fused, score_pairs

        idx, qids, qw, cand = self._world(seed=3, head_size=4096)
        assert idx.head_size >= idx.vocab_size  # explicit full coverage
        want = np.asarray(score_pairs(idx, qids, qw, cand))
        got = np.asarray(score_candidates_fused(idx, qids, qw, cand))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_overflow_falls_back_exactly(self):
        from tdr.ops.score import score_candidates_fused, score_pairs

        idx, qids, qw, cand = self._world(seed=5)
        # a query touching many tail terms overflows a tiny budget
        head_slot = np.asarray(idx.head_slot)
        df = np.asarray(idx.stats.df)
        tail_terms = np.where((head_slot < 0) & (df > 0))[0][:16]
        q2 = np.asarray(qids).copy()
        w2 = np.asarray(qw).copy()
        q2[0, :len(tail_terms)] = tail_terms
        w2[0, :len(tail_terms)] = 1.0
        want = np.asarray(score_pairs(idx, jnp.asarray(q2), jnp.asarray(w2), cand))
        got = np.asarray(score_candidates_fused(
            idx, jnp.asarray(q2), jnp.asarray(w2), cand, tail_budget=8))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestGatherHeadEngine:
    """head_engine="gather" (the small-Q serving engine, VERDICT r4 #5):
    per-term row gathers must reproduce the full-head matmul engine on
    every index layout, and over-cap queries must ride the exact-scatter
    fallback."""

    def _check(self, idx, qids, qw, rtol=1e-4):
        vm, dm = score_and_topk_fused(idx, qids, qw, top_k=10,
                                      tail_budget=256)
        vg, dg = score_and_topk_fused(idx, qids, qw, top_k=10,
                                      tail_budget=256, head_engine="gather")
        vm, vg = np.asarray(vm), np.asarray(vg)
        np.testing.assert_allclose(vg, vm, rtol=rtol, atol=1e-5)
        # doc agreement wherever the margin beats accumulation-order noise
        margin = np.abs(vm - np.roll(vm, -1, axis=1)) > 1e-4
        same = (np.asarray(dg) == np.asarray(dm)) | ~np.isfinite(vm)
        assert (same | ~margin)[:, :-1].all()

    @pytest.mark.parametrize("head_size", [0, 16, None])
    def test_matches_matmul_engine(self, head_size):
        rng = np.random.RandomState(11)
        vocab, coo, qids, qw = _random_world(rng, n_queries=8)
        idx = build_index(*coo, vocab.size, index_cfg=IndexConfig(**F32),
                          head_size=head_size)
        self._check(idx, qids, qw)
        self._check(idx, qids[:1], qw[:1])           # the Q=1 serving shape

    def test_int8_head(self):
        from tdr.index import quantize_head

        rng = np.random.RandomState(13)
        vocab, coo, qids, qw = _random_world(rng, n_queries=4)
        idx = quantize_head(
            build_index(*coo, vocab.size, index_cfg=IndexConfig(**F32)))
        self._check(idx, qids, qw, rtol=1e-3)

    def test_over_cap_falls_back_exactly(self):
        """A query with more active head terms than _HEAD_CHUNK overflows
        to the exact scatter path — results still match the matmul engine."""
        rng = np.random.RandomState(17)
        vocab, coo, qids, qw = _random_world(rng)
        idx = build_index(*coo, vocab.size, index_cfg=IndexConfig(**F32),
                          head_size=64)
        head_terms = np.where(np.asarray(idx.head_slot) >= 0)[0][:24]
        assert head_terms.size >= 20 > 16
        qids1 = jnp.asarray(head_terms[None, :].astype(np.int32))
        qw1 = jnp.ones((1, head_terms.size), jnp.float32)
        self._check(idx, qids1, qw1)

    def test_model_routes_small_batches(self):
        """SparseModel picks the gather engine for small batches and the
        matmul engine past the threshold — results identical either way."""
        from tdr.models import BM25Model

        rng = np.random.RandomState(19)
        docs = [[f"t{rng.randint(300)}" for _ in range(rng.randint(5, 60))]
                for _ in range(200)]
        ids = [f"d{i}" for i in range(200)]
        m = BM25Model.build(docs, ids, index_cfg=IndexConfig(**F32))
        queries = [[f"t{rng.randint(300)}" for _ in range(4)]
                   for _ in range(12)]
        import dataclasses
        m_off = dataclasses.replace(m, small_q_threshold=0)
        got = m.retrieve_tokens(queries[:1], k=5)     # Q=1 -> gather
        want = m_off.retrieve_tokens(queries[:1], k=5)
        assert got == want
        got8 = m.retrieve_tokens(queries[:8], k=5)    # Q=8 -> gather
        want8 = m_off.retrieve_tokens(queries[:8], k=5)
        assert got8 == want8
        got12 = m.retrieve_tokens(queries, k=5)       # Q=12 -> matmul
        assert got12 == m_off.retrieve_tokens(queries, k=5)


@pytest.mark.parametrize("heavy", [False, True])
def test_exact_compact_matches_exact(heavy):
    """topk_mode="exact_compact" (round 5): tier-1 M-slot merge with the
    per-query bound folded into the overflow/scatter rescue — results must
    match plain exact mode exactly, including when queries are tail-heavy
    enough to drop live slots (the rescue path)."""
    rng = np.random.RandomState(11)
    vocab, coo, qids, qw = _random_world(rng, n_docs=700, vocab_n=900,
                                         n_queries=24)
    idx = build_index(*coo, vocab.size, index_cfg=IndexConfig(**F32),
                      head_size=32)
    if heavy:
        # repeat the densest terms so live tail slots exceed the M cut
        df = np.asarray(idx.stats.df)
        dense_terms = np.argsort(-df)[:40]
        q = np.asarray(qids).copy()
        q[:, :12] = dense_terms[rng.randint(0, 40, (q.shape[0], 12))]
        qids = jnp.asarray(q)
        qw = jnp.asarray(np.maximum(np.asarray(qw), 1.0))
    v_e, d_e = score_and_topk_fused(idx, qids, qw, top_k=10, tail_budget=512)
    v_c, d_c = score_and_topk_fused(idx, qids, qw, top_k=10, tail_budget=512,
                                    topk_mode="exact_compact")
    v_e, d_e, v_c, d_c = map(np.asarray, (v_e, d_e, v_c, d_c))
    np.testing.assert_allclose(v_c, v_e, rtol=1e-6, atol=1e-6)
    for a, b, va in zip(d_c, d_e, v_e):
        assert set(a[np.isfinite(va)]) == set(b[np.isfinite(va)])
