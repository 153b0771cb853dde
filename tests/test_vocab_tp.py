"""Vocab-axis tensor parallelism (SURVEY §2c TP row): the slot-sharded
head-matmul engine must match the single-device full-vocab-head engine.

psum_scatter sums f32 partials in a different order than one contraction,
so value checks are allclose, not bitwise; doc sets are compared where the
score margin makes the order unambiguous."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdr.data import synthetic_corpus, SyntheticSpec
from tdr.index import build_index
from tdr.ops import score_and_topk
from tdr.parallel import make_mesh
from tdr.parallel.vocab_tp import (
    VocabTpBM25Model, vocab_shard_index, vocab_tp_score_topk)
from tdr.text import build_vocab, encode_docs, encode_queries, preprocess_texts
from tdr.utils.config import IndexConfig

# huge head budget -> full-vocab head (the production en configuration)
CFG = IndexConfig(doc_pad_multiple=8, nnz_pad_multiple=64,
                  head_budget_bytes=1 << 30, head_dtype="float32")


@pytest.fixture(scope="module")
def world():
    corpus, queries = synthetic_corpus(
        SyntheticSpec(n_docs=300, n_queries=24, seed=23, ref_proportions=False,
                      langs=("en",)))
    toks = preprocess_texts(corpus.texts, corpus.langs)
    vocab = build_vocab(toks)
    coo = encode_docs(toks, vocab)
    qtoks = preprocess_texts(queries.queries, queries.langs)
    qids, qw = encode_queries(qtoks, vocab, max_terms=16)
    index = build_index(*coo, vocab.size, index_cfg=CFG)
    assert index.head_size >= index.vocab_size, "fixture must be full-head"
    return index, jnp.asarray(qids), jnp.asarray(qw)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_vocab_tp_matches_single_device(world, n_shards):
    index, qids, qw = world
    vindex = vocab_shard_index(index, n_shards)
    # capacity invariant: each device holds ~1/S of the SLOT axis (the doc
    # axis re-pads each slice to a 128 multiple — negligible at production
    # N, dominant only at this toy scale)
    assert vindex.head_rows.shape[0] == n_shards
    D = index.head_rows.shape[0]
    assert vindex.d_local <= -(-D // n_shards) + 8

    mesh = make_mesh(data=1, model=n_shards)
    vals_1, rows_1 = score_and_topk(index, qids, qw, top_k=10)
    vals_t, rows_t = vocab_tp_score_topk(mesh, vindex, qids, qw, top_k=10)

    np.testing.assert_allclose(np.asarray(vals_t), np.asarray(vals_1),
                               rtol=1e-5, atol=1e-5)
    # doc agreement wherever the margin beats float noise
    v1 = np.asarray(vals_1)
    margin_ok = np.abs(v1 - np.roll(v1, -1, axis=1)) > 1e-4
    same = (np.asarray(rows_t) == np.asarray(rows_1)) | ~np.isfinite(v1)
    assert (same | ~margin_ok)[:, :-1].all()


def test_vocab_tp_deterministic(world):
    index, qids, qw = world
    vindex = vocab_shard_index(index, 4)
    mesh = make_mesh(data=1, model=4)
    v1, r1 = vocab_tp_score_topk(mesh, vindex, qids, qw, top_k=10)
    v2, r2 = vocab_tp_score_topk(mesh, vindex, qids, qw, top_k=10)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


@pytest.fixture(scope="module")
def tail_world():
    """Tail-bearing index (tiny head budget) — the reference-scale en
    regime the HYBRID vocab-TP engine exists for (VERDICT r4 missing #3:
    the stress en index has head coverage 2.4%)."""
    corpus, queries = synthetic_corpus(
        SyntheticSpec(n_docs=300, n_queries=24, seed=3, ref_proportions=False,
                      langs=("en",)))
    toks = preprocess_texts(corpus.texts, corpus.langs)
    vocab = build_vocab(toks)
    coo = encode_docs(toks, vocab)
    tiny = IndexConfig(doc_pad_multiple=8, nnz_pad_multiple=64,
                       head_budget_bytes=1 << 12)   # head cannot cover vocab
    index = build_index(*coo, vocab.size, index_cfg=tiny)
    assert 0 < index.head_size < index.vocab_size
    qtoks = preprocess_texts(queries.queries, queries.langs)
    qids, qw = encode_queries(qtoks, vocab, max_terms=16)
    return index, jnp.asarray(qids), jnp.asarray(qw)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_hybrid_tp_matches_single_device(tail_world, n_shards):
    index, qids, qw = tail_world
    vindex = vocab_shard_index(index, n_shards)
    assert vindex.tail_index is not None
    # the replicated tail must NOT carry the head rows (that would undo
    # the capacity win the sharding exists for)
    assert vindex.tail_index.head_rows.size == 1
    # capacity invariant: each device holds ~1/S of the slot axis (floored
    # at 8 rows — at production D the shard is 1/S of the head bytes)
    D = index.head_rows.shape[0]
    assert vindex.d_local <= max(8, -(-D // n_shards) + 8)
    assert vindex.per_device_bytes()["head_shard_bytes"] > 0

    mesh = make_mesh(data=1, model=n_shards)
    vals_1, rows_1 = score_and_topk(index, qids, qw, top_k=10)
    vals_t, rows_t = vocab_tp_score_topk(mesh, vindex, qids, qw, top_k=10)

    np.testing.assert_allclose(np.asarray(vals_t), np.asarray(vals_1),
                               rtol=1e-5, atol=1e-5)
    v1 = np.asarray(vals_1)
    margin_ok = np.abs(v1 - np.roll(v1, -1, axis=1)) > 1e-4
    same = (np.asarray(rows_t) == np.asarray(rows_1)) | ~np.isfinite(v1)
    assert (same | ~margin_ok)[:, :-1].all()


def test_layout_matches_materialized(tail_world):
    """vocab_shard_layout's arithmetic must equal the ACTUAL byte layout of
    a materialized shard set (it exists so the bench can size shard counts
    the host can't hold — drift would make those numbers fiction)."""
    from tdr.parallel.vocab_tp import vocab_shard_layout

    index, _, _ = tail_world
    for s in (2, 4):
        vindex = vocab_shard_index(index, s)
        got = vindex.per_device_bytes()
        want = vocab_shard_layout(index, s)
        assert got["head_shard_bytes"] == want["head_shard_bytes"]
        # materialized tail carries the stripped dummy leaves (a few bytes)
        assert abs(got["replicated_tail_bytes"]
                   - want["replicated_tail_bytes"]) < 64


def test_hybrid_tp_deterministic(tail_world):
    index, qids, qw = tail_world
    vindex = vocab_shard_index(index, 4)
    mesh = make_mesh(data=1, model=4)
    v1, r1 = vocab_tp_score_topk(mesh, vindex, qids, qw, top_k=10)
    v2, r2 = vocab_tp_score_topk(mesh, vindex, qids, qw, top_k=10)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_hybrid_tp_int8(tail_world):
    """int8 head + hybrid tail: quantized partials dequantize after the
    collective; the tail adds exact f32 — matches the single-chip int8
    engine's top-10 docs wherever the margin beats quantization noise."""
    from tdr.index import quantize_head

    index, qids, qw = tail_world
    index8 = quantize_head(index)
    vindex = vocab_shard_index(index8, 4)
    mesh = make_mesh(data=1, model=4)
    vals_1, rows_1 = score_and_topk(index8, qids, qw, top_k=10)
    vals_t, rows_t = vocab_tp_score_topk(mesh, vindex, qids, qw, top_k=10)
    np.testing.assert_allclose(np.asarray(vals_t), np.asarray(vals_1),
                               rtol=1e-4, atol=1e-4)


def test_hybrid_tp_overflow_fallback(tail_world):
    """A query with more tail terms than the compaction caps trips the
    exact in-range postings scatter; results must still match the exact
    single-chip engine."""
    index, _, _ = tail_world
    # 16+ distinct tail terms in one query overflows max_tail_terms
    tail_terms = np.where(np.asarray(index.head_slot) < 0)[0]
    tail_terms = tail_terms[np.asarray(index.stats.df)[tail_terms] > 0][:24]
    assert tail_terms.size >= 20
    qids = jnp.asarray(tail_terms[None, :].astype(np.int32))
    qw = jnp.ones((1, tail_terms.size), jnp.float32)
    vindex = vocab_shard_index(index, 4)
    mesh = make_mesh(data=1, model=4)
    vals_1, rows_1 = score_and_topk(index, qids, qw, top_k=10)
    vals_t, rows_t = vocab_tp_score_topk(mesh, vindex, qids, qw, top_k=10)
    np.testing.assert_allclose(np.asarray(vals_t), np.asarray(vals_1),
                               rtol=1e-5, atol=1e-5)


def test_router_mixes_vocab_tp_model():
    """A LanguageRouter can serve one language from a vocab-TP model and
    the rest from single-chip models (the EP x TP mix)."""
    from tdr.models import BM25Model
    from tdr.rank import LanguageRouter, build_language_models

    corpus, queries = synthetic_corpus(
        SyntheticSpec(n_docs=240, n_queries=24, seed=29, ref_proportions=False,
                      langs=("en", "fr")))
    models = build_language_models(corpus, BM25Model, index_cfg=CFG)
    mesh = make_mesh(data=1, model=4)
    mixed = dict(models)
    mixed["en"] = VocabTpBM25Model.from_model(models["en"], mesh)

    base = LanguageRouter(models, query_batch=8).retrieve(
        queries.queries, queries.langs, k=10)
    got = LanguageRouter(mixed, query_batch=8).retrieve(
        queries.queries, queries.langs, k=10)
    agree = sum(a == b for a, b in zip(base, got))
    assert agree >= int(0.9 * len(base))   # ties may reorder a few
