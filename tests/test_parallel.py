"""Multi-device tests on the 8-way virtual CPU mesh (conftest sets
--xla_force_host_platform_device_count=8).

Property under test: doc-sharded scoring over the mesh is *equivalent* to
single-device scoring of the same corpus (global idf/avgdl injection +
all_gather top-k merge must not change results).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdr.data import synthetic_corpus, SyntheticSpec
from tdr.index import build_index
from tdr.ops import score_and_topk, score_batch
from tdr.parallel import (
    build_sharded_index,
    dp_score_topk,
    make_mesh,
    sharded_score_topk,
)
from tdr.parallel.sharded import global_row_to_doc
from tdr.text import build_vocab, encode_docs, encode_queries, preprocess_texts
from tdr.utils.config import IndexConfig

CFG = IndexConfig(doc_pad_multiple=8, nnz_pad_multiple=64, head_budget_bytes=1 << 20, head_dtype="float32")


@pytest.fixture(scope="module")
def world():
    corpus, queries = synthetic_corpus(
        SyntheticSpec(n_docs=300, n_queries=24, seed=17, ref_proportions=False,
                      langs=("en",))
    )
    toks = preprocess_texts(corpus.texts, corpus.langs)
    vocab = build_vocab(toks)
    coo = encode_docs(toks, vocab)
    qtoks = preprocess_texts(queries.queries, queries.langs)
    qids, qw = encode_queries(qtoks, vocab, max_terms=16)
    return vocab, coo, jnp.asarray(qids), jnp.asarray(qw)


def test_eight_devices_available():
    assert jax.device_count() >= 8


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_matches_single_device(world, n_shards):
    vocab, coo, qids, qw = world
    single = build_index(*coo, vocab.size, index_cfg=CFG)
    sharded = build_sharded_index(*coo, vocab.size, n_shards=n_shards,
                                  index_cfg=CFG)
    mesh = make_mesh(data=n_shards)

    vals_1, rows_1 = score_and_topk(single, qids, qw, top_k=10)
    vals_s, rows_s = sharded_score_topk(mesh, sharded, qids, qw, top_k=10)
    docs_s = global_row_to_doc(sharded, np.asarray(rows_s))

    np.testing.assert_allclose(np.asarray(vals_s), np.asarray(vals_1),
                               rtol=1e-4, atol=1e-5)
    # same docs wherever scores are not tied with the next rank
    v1 = np.asarray(vals_1)
    for q in range(v1.shape[0]):
        strict = np.ones(10, bool)
        strict[:-1] &= v1[q, :-1] > v1[q, 1:] + 1e-6
        strict[1:] &= v1[q, 1:] < v1[q, :-1] - 1e-6
        np.testing.assert_array_equal(docs_s[q][strict], np.asarray(rows_1)[q][strict])


def test_sharded_global_idf_injected(world):
    """Shard-local df must NOT drive idf: a 4-shard index carries the same
    idf table as the single-device build."""
    vocab, coo, _, _ = world
    single = build_index(*coo, vocab.size, index_cfg=CFG)
    sharded = build_sharded_index(*coo, vocab.size, n_shards=4, index_cfg=CFG)
    np.testing.assert_allclose(np.asarray(sharded.idf),
                               np.asarray(single.stats.idf), rtol=1e-6)
    assert float(sharded.avgdl) == pytest.approx(float(single.stats.avgdl), rel=1e-6)


def test_dp_query_sharding_matches(world):
    vocab, coo, qids, qw = world
    index = build_index(*coo, vocab.size, index_cfg=CFG)
    mesh = make_mesh(data=8)
    vals_1, rows_1 = score_and_topk(index, qids, qw, top_k=10)
    vals_dp, rows_dp = dp_score_topk(mesh, index, qids, qw, top_k=10)
    np.testing.assert_allclose(np.asarray(vals_dp), np.asarray(vals_1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(rows_dp), np.asarray(rows_1))


def test_sharded_determinism(world):
    vocab, coo, qids, qw = world
    sharded = build_sharded_index(*coo, vocab.size, n_shards=4, index_cfg=CFG)
    mesh = make_mesh(data=4)
    v1, r1 = sharded_score_topk(mesh, sharded, qids, qw, top_k=10)
    v2, r2 = sharded_score_topk(mesh, sharded, qids, qw, top_k=10)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_sharded_model_in_router(world):
    """ShardedBM25Model presents the SparseModel surface to the router."""
    from tdr.data import synthetic_corpus, SyntheticSpec
    from tdr.parallel.sharded import ShardedBM25Model
    from tdr.rank import LanguageRouter
    from tdr.text import Preprocessor

    corpus, queries = synthetic_corpus(
        SyntheticSpec(n_docs=200, n_queries=20, seed=61, ref_proportions=False,
                      langs=("en",)))
    pp = Preprocessor("best")
    toks = [pp(t, "en") for t in corpus.texts]
    mesh = make_mesh(data=4)
    model = ShardedBM25Model.build(toks, corpus.docids, mesh, index_cfg=CFG)
    router = LanguageRouter({"en": model}, query_batch=8)
    results = router.retrieve(queries.queries, queries.langs, k=10)
    from tdr.eval import recall_at_k

    assert recall_at_k(results, queries.positive_docs) >= 0.95


def test_sharded_index_checkpoint_roundtrip(world, tmp_path):
    from tdr.ckpt.registry import load_sharded_index, save_sharded_index

    vocab, coo, qids, qw = world
    sharded = build_sharded_index(*coo, vocab.size, n_shards=4, index_cfg=CFG)
    mesh = make_mesh(data=4)
    v1, r1 = sharded_score_topk(mesh, sharded, qids, qw, top_k=10)
    path = str(tmp_path / "sharded")
    save_sharded_index(path, sharded)
    loaded = load_sharded_index(path)
    v2, r2 = sharded_score_topk(mesh, loaded, qids, qw, top_k=10)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_single_device_determinism(world):
    """Same inputs => bitwise-equal top-k across repeated runs (the
    determinism check SURVEY.md §5 plans in place of race detection)."""
    from tdr.index import build_index
    from tdr.ops import score_and_topk_fused

    vocab, coo, qids, qw = world
    idx = build_index(*coo, vocab.size, index_cfg=CFG)
    v1, r1 = score_and_topk_fused(idx, qids, qw, top_k=10)
    v2, r2 = score_and_topk_fused(idx, qids, qw, top_k=10)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_spmd_global_stats_match_host(world):
    """psum-reduced per-shard DF/avgdl must equal single-pass host stats."""
    from tdr.index.build import segment_df
    from tdr.parallel.sharded import spmd_global_stats

    vocab, coo, _, _ = world
    sharded = build_sharded_index(*coo, vocab.size, n_shards=4, index_cfg=CFG)
    mesh = make_mesh(data=4)
    # rebuild the stacked padded term arrays the shards were built from
    import jax.numpy as jnp

    # term ids per shard can be recovered from indptr/df? simpler: recompute
    # from the raw COO with the same split the builder used
    doc_ids, term_ids, tfs, doc_lens = coo
    n_docs = len(doc_lens)
    bounds = np.linspace(0, n_docs, 5).astype(np.int64)
    shard_of = np.searchsorted(bounds[1:], doc_ids, side="right")
    nnz_pad = int(max(np.bincount(shard_of, minlength=4).max(), 1))
    nnz_pad = ((nnz_pad + 63) // 64) * 64
    ti = np.full((4, nnz_pad), vocab.size, np.int32)
    for s in range(4):
        sel = term_ids[shard_of == s]
        ti[s, :len(sel)] = sel
    df_spmd, total_spmd = spmd_global_stats(
        mesh, jnp.asarray(ti), sharded.doc_len, vocab.size)
    df_host = segment_df(jnp.asarray(
        np.concatenate([term_ids, np.full(16, vocab.size, np.int32)])), vocab.size)
    np.testing.assert_allclose(np.asarray(df_spmd), np.asarray(df_host))
    np.testing.assert_allclose(float(total_spmd), float(doc_lens.sum()))


class TestPipelinedCascade:
    """Mesh-subset pipeline parallelism (tdr.parallel.pipeline): stage-1
    candidate scan on one device, stage-2 re-rank on another, equivalent
    to the single-device cascade."""

    def _models(self):
        from tdr.models import BM25Model, TfidfCosineModel
        from tdr.text import Preprocessor
        from tdr.utils.config import IndexConfig

        corpus, queries = synthetic_corpus(
            SyntheticSpec(n_docs=400, n_queries=40, seed=9, hard=True,
                          langs=("en",), ref_proportions=False))
        pp = Preprocessor("best")
        toks = [pp(t, "en") for t in corpus.texts]
        cfg = IndexConfig(head_budget_bytes=1 << 18)
        cand = TfidfCosineModel.build(toks, corpus.docids, lang="en",
                                      index_cfg=cfg)
        rank = BM25Model.build(toks, corpus.docids, lang="en", index_cfg=cfg)
        return cand, rank, corpus, queries

    def test_matches_single_device_cascade(self):
        from tdr.parallel import PipelinedCascade
        from tdr.rank import CascadeRetriever

        cand, rank, corpus, queries = self._models()
        devs = jax.devices()
        assert len(devs) >= 2
        pipe = PipelinedCascade(cand, rank, stage1_device=devs[0],
                                stage2_device=devs[1], candidates=50,
                                query_batch=16)
        got = pipe.retrieve(queries.queries, "en", k=10)

        single = CascadeRetriever({"en": cand}, {"en": rank}, candidates=50,
                                  query_batch=16)
        want = single.retrieve(queries.queries, ["en"] * len(queries.queries),
                               k=10)
        assert got == want

    def test_stage_indices_live_on_their_groups(self):
        from tdr.parallel import PipelinedCascade

        cand, rank, _, _ = self._models()
        devs = jax.devices()
        pipe = PipelinedCascade(cand, rank, stage1_device=devs[0],
                                stage2_device=devs[1])
        d1 = list(pipe._idx1.head_rows.devices())
        d2 = list(pipe._idx2.head_rows.devices())
        assert d1 == [devs[0]] and d2 == [devs[1]]


@pytest.mark.parametrize("grid", [(2, 4), (4, 2), (1, 8), (8, 1)])
def test_grid_2d_matches_single_device(world, grid):
    """2-D composition (round 4): query batch sharded over "data" x index
    sharded over "model" must equal the single-device fused engine — the
    scaling mode where neither the query stream nor the corpus fits one
    chip."""
    from tdr.parallel import grid_score_topk

    n_data, n_model = grid
    vocab, coo, qids, qw = world
    single = build_index(*coo, vocab.size, index_cfg=CFG)
    sharded = build_sharded_index(*coo, vocab.size, n_shards=n_model,
                                  index_cfg=CFG)
    mesh = make_mesh(data=n_data, model=n_model)

    vals_1, rows_1 = score_and_topk(single, qids, qw, top_k=10)
    vals_g, rows_g = grid_score_topk(mesh, sharded, qids, qw, top_k=10)
    docs_g = global_row_to_doc(sharded, np.asarray(rows_g))

    np.testing.assert_allclose(np.asarray(vals_g), np.asarray(vals_1),
                               rtol=1e-4, atol=1e-5)
    v1 = np.asarray(vals_1)
    for q in range(v1.shape[0]):
        strict = np.ones(10, bool)
        strict[:-1] &= v1[q, :-1] > v1[q, 1:] + 1e-6
        strict[1:] &= v1[q, 1:] < v1[q, :-1] - 1e-6
        np.testing.assert_array_equal(
            docs_g[q][strict], np.asarray(rows_1)[q][strict])


def test_grid_2d_ragged_query_count(world):
    """Q not divisible by the data axis: padding must not leak."""
    from tdr.parallel import grid_score_topk

    vocab, coo, qids, qw = world
    sharded = build_sharded_index(*coo, vocab.size, n_shards=2,
                                  index_cfg=CFG)
    single = build_index(*coo, vocab.size, index_cfg=CFG)
    mesh = make_mesh(data=4, model=2)
    q_odd = qids[:7]
    w_odd = qw[:7]
    vals_g, _ = grid_score_topk(mesh, sharded, q_odd, w_odd, top_k=5)
    vals_1, _ = score_and_topk(single, q_odd, w_odd, top_k=5)
    assert vals_g.shape == (7, 5)
    np.testing.assert_allclose(np.asarray(vals_g), np.asarray(vals_1),
                               rtol=1e-4, atol=1e-5)


def test_grid_layout_model_in_router(world):
    """A grid-layout ShardedBM25Model must serve through the LanguageRouter
    exactly like a single-chip model (the production surface of the 2-D
    composition)."""
    from tdr.models import BM25Model
    from tdr.parallel.sharded import ShardedBM25Model
    from tdr.rank import LanguageRouter
    from tdr.data import synthetic_corpus, SyntheticSpec
    from tdr.text import preprocess_texts as pp_texts

    corpus, queries = synthetic_corpus(SyntheticSpec(
        n_docs=160, n_queries=20, seed=13, ref_proportions=False,
        langs=("en",)))
    toks = pp_texts(corpus.texts, corpus.langs)
    mesh = make_mesh(data=4, model=2)
    single = BM25Model.build(toks, corpus.docids, lang="en", index_cfg=CFG)
    grid = ShardedBM25Model.build(toks, corpus.docids, mesh, lang="en",
                                  index_cfg=CFG, layout="grid")
    assert grid.sindex.n_shards == 2
    r_single = LanguageRouter({"en": single}, query_batch=8).retrieve(
        queries.queries, queries.langs, k=5)
    r_grid = LanguageRouter({"en": grid}, query_batch=8).retrieve(
        queries.queries, queries.langs, k=5)
    assert r_grid == r_single
