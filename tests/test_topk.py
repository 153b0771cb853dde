"""topk_grouped must be bit-identical to lax.top_k, ties and masks included."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdr.ops.topk import topk_grouped


def _assert_same(scores, k, group=128):
    v0, i0 = jax.lax.top_k(scores, k)
    v1, i1 = topk_grouped(scores, k, group)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


class TestTopkGrouped:
    def test_random_f32(self):
        rng = np.random.RandomState(0)
        s = jnp.asarray(rng.randn(7, 4096).astype(np.float32))
        _assert_same(s, 10)

    def test_heavy_ties_integer_values(self):
        """Small-integer scores collide constantly — the tie order
        (lowest index wins) must match lax.top_k exactly."""
        rng = np.random.RandomState(1)
        s = jnp.asarray(rng.randint(0, 4, (5, 2048)).astype(np.float32))
        _assert_same(s, 16)

    def test_all_equal_rows(self):
        s = jnp.zeros((3, 1024), jnp.float32)
        _assert_same(s, 8)

    def test_neg_inf_masking(self):
        """Masked (invalid-doc) columns are -inf; real docs must win and
        -inf padding must appear in lax.top_k order."""
        rng = np.random.RandomState(2)
        s = rng.randn(4, 2048).astype(np.float32)
        s[:, 100:] = -np.inf              # only 100 valid docs
        _assert_same(jnp.asarray(s), 12)

    def test_duplicates_across_groups(self):
        """The same max value in many groups exercises the lexical
        group-selection tie proof."""
        s = np.zeros((2, 2048), np.float32)
        s[0, [5, 130, 260, 1900]] = 7.0    # same value, 4 different groups
        s[1, 1000:1200] = 3.0              # a long run crossing groups
        _assert_same(jnp.asarray(s), 6)

    def test_k_larger_than_groups_falls_back(self):
        rng = np.random.RandomState(3)
        s = jnp.asarray(rng.randn(2, 512).astype(np.float32))
        _assert_same(s, 10)               # ng=4 < k -> fallback path

    def test_unaligned_n_falls_back(self):
        rng = np.random.RandomState(4)
        s = jnp.asarray(rng.randn(2, 1000).astype(np.float32))
        _assert_same(s, 5)

    def test_large_k_candidate_regime(self):
        """Cascade-style k (hundreds of candidates)."""
        rng = np.random.RandomState(5)
        s = jnp.asarray(rng.randn(3, 65536).astype(np.float32))
        _assert_same(s, 200)

    @pytest.mark.parametrize("group", [64, 128, 256])
    def test_group_widths(self, group):
        rng = np.random.RandomState(6)
        s = jnp.asarray(rng.randn(3, 8192).astype(np.float32))
        _assert_same(s, 10, group)


class TestApproxTopkMode:
    """topk_mode="approx" on the sparse engine (lax.approx_max_k head
    selection).  On CPU approx_max_k lowers to an exact selection, so the
    mode must return the same doc sets as exact here; on TPU it is the
    measured speed/recall trade (bench kernel section)."""

    def test_fused_engine_approx_mode_matches_exact_on_cpu(self):
        from tdr.data import SyntheticSpec, synthetic_corpus
        from tdr.models import BM25Model
        from tdr.text import Preprocessor
        from tdr.utils.config import IndexConfig

        corpus, queries = synthetic_corpus(
            SyntheticSpec(n_docs=400, n_queries=40, seed=13,
                          ref_proportions=False, langs=("en",)))
        pp = Preprocessor("best")
        toks = [pp(t, "en") for t in corpus.texts]
        m = BM25Model.build(toks, corpus.docids, lang="en",
                            index_cfg=IndexConfig(head_budget_bytes=1 << 20))
        qt = [pp(q, "en") for q in queries.queries]
        ve, re_ = m.topk_tokens(qt, k=10)
        m.topk_mode = "approx"
        va, ra = m.topk_tokens(qt, k=10)
        # same docs per query (order may differ among score ties)
        for r1, r2, v1, v2 in zip(re_, ra, ve, va):
            np.testing.assert_allclose(np.sort(v1), np.sort(v2), rtol=1e-6)
            assert set(r1[np.isfinite(v1)].tolist()) \
                == set(r2[np.isfinite(v2)].tolist())

    def test_full_head_model_approx_mode(self):
        """Small-vocab index where the head covers the vocab (the en case
        at reference scale): approx mode hits the no-tail fast path."""
        from tdr.data import SyntheticSpec, synthetic_corpus
        from tdr.models import BM25Model
        from tdr.text import Preprocessor
        from tdr.utils.config import IndexConfig

        corpus, queries = synthetic_corpus(
            SyntheticSpec(n_docs=300, n_queries=20, seed=17,
                          ref_proportions=False, langs=("en",)))
        pp = Preprocessor("best")
        toks = [pp(t, "en") for t in corpus.texts]
        m = BM25Model.build(toks, corpus.docids, lang="en",
                            index_cfg=IndexConfig(head_budget_bytes=1 << 30))
        assert m.index.head_size >= m.index.vocab_size
        qt = [pp(q, "en") for q in queries.queries]
        ve, re_ = m.topk_tokens(qt, k=10)
        m.topk_mode = "approx"
        va, ra = m.topk_tokens(qt, k=10)
        for r1, r2, v1, v2 in zip(re_, ra, ve, va):
            np.testing.assert_allclose(np.sort(v1), np.sort(v2), rtol=1e-6)
