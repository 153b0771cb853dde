"""int8 scalar-quantized dense head (the FAISS SQ8 analogue for the sparse
engine, tdr.index.build.quantize_head / IndexConfig.head_dtype="int8").

Quantization is per-doc-column with the scale applied on the matmul's
OUTPUT axis, so the contraction itself runs int8×int8→int32 and nothing
approximate enters the reduction.  These tests pin:

* reconstruction error ≤ scale/2 per entry,
* score / top-k fidelity vs the f32 engine on both the full-head and the
  head+tail configurations,
* integer query weights pass through losslessly (qscale == 1),
* checkpoint round trip (single model + doc-sharded index),
* mesh equivalence (doc sharding and vocab TP) with quantized heads,
* the off-path Pallas head kernel refuses int8 indexes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tdr.index import build_index, quantize_head
from tdr.ops import score_and_topk, score_and_topk_fused
from tdr.parallel import make_mesh
from tdr.text import build_vocab, encode_docs, encode_queries
from tdr.utils.config import IndexConfig

PAD = dict(doc_pad_multiple=8, nnz_pad_multiple=64)
F32 = dict(**PAD, head_dtype="float32")


def _random_world(rng, n_docs=400, vocab_n=600, n_queries=16):
    docs = [[f"t{rng.randint(vocab_n)}" for _ in range(rng.randint(5, 120))]
            for _ in range(n_docs)]
    vocab = build_vocab(docs)
    coo = encode_docs(docs, vocab)
    queries = [[f"t{rng.randint(vocab_n)}" for _ in range(rng.randint(1, 12))]
               for _ in range(n_queries)]
    qids, qw = encode_queries(queries, vocab, 16)
    return vocab, coo, jnp.asarray(qids), jnp.asarray(qw)


@pytest.fixture(scope="module")
def world():
    rng = np.random.RandomState(17)
    return _random_world(rng)


def test_dequant_reconstruction(world):
    vocab, coo, _, _ = world
    idx = build_index(*coo, vocab.size,
                      index_cfg=IndexConfig(**F32, head_budget_bytes=1 << 30))
    q = quantize_head(idx)
    assert q.head_rows.dtype == jnp.int8
    scale = np.asarray(q.head_scale)
    recon = np.asarray(q.head_rows, np.float32) * scale[None, :]
    orig = np.asarray(idx.head_rows, np.float32)
    assert np.all(np.abs(recon - orig) <= scale[None, :] / 2 + 1e-7)
    # empty (padded) doc columns stay exactly zero
    empty = np.abs(orig).max(axis=0) == 0
    assert np.all(recon[:, empty] == 0)
    # halves bf16 / quarters f32 head bytes
    assert q.memory_bytes() < idx.memory_bytes()


@pytest.mark.parametrize("head_budget", [1 << 30, 1 << 16])
def test_quantized_topk_fidelity(world, head_budget):
    """Full-head (pure matmul) and head+tail (fused merge) configurations:
    ≥90% average top-10 doc overlap and ≤2% score error vs the f32 engine."""
    vocab, coo, qids, qw = world
    idx = build_index(*coo, vocab.size,
                      index_cfg=IndexConfig(**F32, head_budget_bytes=head_budget))
    q = quantize_head(idx)
    v1, r1 = score_and_topk_fused(idx, qids, qw, top_k=10)
    v2, r2 = score_and_topk_fused(q, qids, qw, top_k=10)
    v1, v2 = np.asarray(v1), np.asarray(v2)
    fin = np.isfinite(v1) & np.isfinite(v2)
    np.testing.assert_allclose(v2[fin], v1[fin], rtol=2e-2, atol=1e-4)
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(np.asarray(r1), np.asarray(r2))])
    assert overlap >= 0.9, overlap


def test_unit_weights_quantize_losslessly(world):
    """Integer query weights ride through at qscale 1: the int8 engine must
    equal the numpy dequantized-matmul oracle to f32 rounding."""
    vocab, coo, qids, qw = world
    idx = build_index(*coo, vocab.size,
                      index_cfg=IndexConfig(**F32, head_budget_bytes=1 << 30))
    q = quantize_head(idx)
    assert q.head_size >= q.vocab_size  # full head: scoring is the matmul
    from tdr.ops.score import _head_scores_matmul

    got = np.asarray(_head_scores_matmul(q, qids, qw))
    # numpy oracle: exact integer accumulate, then dequantize per column
    slot = np.asarray(q.head_slot)[np.asarray(qids)]
    W = np.zeros((qids.shape[0], q.head_rows.shape[0]), np.float64)
    qw_np = np.asarray(qw)
    for i in range(qids.shape[0]):
        for t in range(qids.shape[1]):
            if slot[i, t] >= 0 and qw_np[i, t] > 0:
                W[i, slot[i, t]] += qw_np[i, t]
    assert np.all(W == np.round(W)) and W.max() <= 127
    acc = W @ np.asarray(q.head_rows, np.float64)
    want = acc * np.asarray(q.head_scale, np.float64)[None, :]
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5,
                               atol=1e-6)


def test_build_config_int8(world):
    vocab, coo, qids, qw = world
    idx = build_index(*coo, vocab.size,
                      index_cfg=IndexConfig(**PAD, head_dtype="int8",
                                            head_budget_bytes=1 << 30))
    assert idx.head_rows.dtype == jnp.int8
    assert idx.head_scale is not None
    # int8 heads fit 2x the terms of bf16 for the same byte budget
    from tdr.index.build import _auto_head_size

    cfg8 = IndexConfig(**PAD, head_dtype="int8", head_budget_bytes=1 << 20)
    cfgb = IndexConfig(doc_pad_multiple=8, nnz_pad_multiple=64,
                       head_dtype="bfloat16", head_budget_bytes=1 << 20)
    assert _auto_head_size(10_000, 1024, cfg8) == 2 * _auto_head_size(
        10_000, 1024, cfgb)
    # and it scores
    v, r = score_and_topk_fused(idx, qids, qw, top_k=5)
    assert np.isfinite(np.asarray(v)).any()


def test_ckpt_roundtrip_int8(tmp_path, world):
    from tdr.ckpt import load_sparse_model, save_sparse_model
    from tdr.models import BM25Model

    rng = np.random.RandomState(5)
    docs = [[f"t{rng.randint(200)}" for _ in range(rng.randint(5, 40))]
            for _ in range(120)]
    m = BM25Model.build(docs, [f"d{i}" for i in range(120)], lang="en",
                        index_cfg=IndexConfig(**PAD, head_dtype="int8"))
    assert m.index.head_rows.dtype == jnp.int8
    save_sparse_model(str(tmp_path / "m"), m)
    m2 = load_sparse_model(str(tmp_path / "m"))
    assert m2.index.head_rows.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(m2.index.head_rows),
                                  np.asarray(m.index.head_rows))
    np.testing.assert_array_equal(np.asarray(m2.index.head_scale),
                                  np.asarray(m.index.head_scale))
    toks = [[f"t{rng.randint(200)}" for _ in range(4)] for _ in range(6)]
    v1, r1 = m.topk_tokens(toks, 5)
    v2, r2 = m2.topk_tokens(toks, 5)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(v1, v2)


def test_sharded_int8_matches_single(world):
    """Doc-sharded scoring with int8 heads == single-device int8 scoring
    (per-doc-column scales are identical in both layouts, so the engines
    see bit-identical quantized data)."""
    from tdr.parallel import build_sharded_index, sharded_score_topk
    from tdr.parallel.sharded import global_row_to_doc

    vocab, coo, qids, qw = world
    cfg = IndexConfig(**PAD, head_dtype="int8", head_budget_bytes=1 << 16)
    # pin head_size: auto-sizing derives it from the LOCAL doc pad, which
    # differs between layouts — the comparison needs one head/tail split
    single = build_index(*coo, vocab.size, index_cfg=cfg, head_size=64)
    sharded = build_sharded_index(*coo, vocab.size, n_shards=4, index_cfg=cfg,
                                  head_size=64)
    assert sharded.head_scale is not None
    mesh = make_mesh(data=4)
    vals_1, rows_1 = score_and_topk(single, qids, qw, top_k=10)
    vals_s, rows_s = sharded_score_topk(mesh, sharded, qids, qw, top_k=10)
    docs_s = global_row_to_doc(sharded, np.asarray(rows_s))
    v1 = np.asarray(vals_1)
    np.testing.assert_allclose(np.asarray(vals_s), v1, rtol=1e-4, atol=1e-5)
    for q in range(v1.shape[0]):
        strict = np.ones(10, bool)
        strict[:-1] &= v1[q, :-1] > v1[q, 1:] + 1e-6
        strict[1:] &= v1[q, 1:] < v1[q, :-1] - 1e-6
        np.testing.assert_array_equal(docs_s[q][strict],
                                      np.asarray(rows_1)[q][strict])


def test_vocab_tp_int8_matches_single(world):
    """Vocab-TP with an int8 head: unit (integer) query weights quantize at
    scale 1 on every device, so the partial int8 sums match the single-chip
    engine exactly (up to psum_scatter f32 summation order)."""
    from tdr.parallel.vocab_tp import vocab_shard_index, vocab_tp_score_topk

    vocab, coo, qids, qw = world
    idx = build_index(*coo, vocab.size,
                      index_cfg=IndexConfig(**F32, head_budget_bytes=1 << 30))
    q = quantize_head(idx)
    vindex = vocab_shard_index(q, 4)
    assert vindex.head_scale is not None
    mesh = make_mesh(data=1, model=4)
    vals_1, rows_1 = score_and_topk(q, qids, qw, top_k=10)
    vals_t, rows_t = vocab_tp_score_topk(mesh, vindex, qids, qw, top_k=10)
    np.testing.assert_allclose(np.asarray(vals_t), np.asarray(vals_1),
                               rtol=1e-5, atol=1e-5)
    v1 = np.asarray(vals_1)
    margin_ok = np.abs(v1 - np.roll(v1, -1, axis=1)) > 1e-4
    same = (np.asarray(rows_t) == np.asarray(rows_1)) | ~np.isfinite(v1)
    assert (same | ~margin_ok)[:, :-1].all()


def test_pallas_head_refuses_int8(world):
    from tdr.ops.pallas_score import head_scores_pallas, pallas_head_available

    vocab, coo, qids, qw = world
    idx = build_index(*coo, vocab.size,
                      index_cfg=IndexConfig(**F32, head_budget_bytes=1 << 30))
    q = quantize_head(idx)
    assert not pallas_head_available(q)
    with pytest.raises(NotImplementedError):
        head_scores_pallas(q, qids, qw)


def test_dense_flat_int8_sq8():
    """Dense SQ8 (FAISS IndexScalarQuantizer analogue): int8 flat search
    matches bf16 flat search on both metrics within quantization noise."""
    from tdr.models.dense import build_flat_index, flat_search

    rng = np.random.RandomState(3)
    emb = rng.randn(500, 64).astype(np.float32)
    emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb_n[rng.randint(0, 500, 32)] + 0.05 * rng.randn(32, 64).astype(np.float32)

    for metric, base in (("ip", emb_n), ("l2", emb)):
        fb = build_flat_index(base, metric=metric)
        f8 = build_flat_index(base, metric=metric, dtype="int8")
        assert f8.embeddings.dtype == jnp.int8 and f8.doc_scale is not None
        vb, rb = flat_search(fb, jnp.asarray(q), top_k=10)
        v8, r8 = flat_search(f8, jnp.asarray(q), top_k=10)
        overlap = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(np.asarray(rb), np.asarray(r8))])
        assert overlap >= 0.9, (metric, overlap)
        # rank-1 (the near-duplicate seed doc) must agree
        assert (np.asarray(rb)[:, 0] == np.asarray(r8)[:, 0]).mean() >= 0.95


def test_int8_ckpt_version_gate(tmp_path):
    """Quantized checkpoints stamp format_version 2 so pre-int8 readers
    (which would silently mis-rank int8 rows without the scale) refuse;
    and a newer-than-this-build version raises here too."""
    import json
    import os

    import pytest

    from tdr.ckpt import load_sparse_model, save_sparse_model
    from tdr.models import BM25Model
    from tdr.utils.config import IndexConfig

    rng = np.random.RandomState(2)
    docs = [[f"t{rng.randint(100)}" for _ in range(10)] for _ in range(60)]
    m8 = BM25Model.build(docs, [f"d{i}" for i in range(60)], lang="en",
                         index_cfg=IndexConfig(**PAD, head_dtype="int8"))
    p8 = str(tmp_path / "q8")
    save_sparse_model(p8, m8)
    meta = json.load(open(os.path.join(p8, "meta.json")))
    assert meta["format_version"] == 2
    mb = BM25Model.build(docs, [f"d{i}" for i in range(60)], lang="en",
                         index_cfg=IndexConfig(**PAD))
    pb = str(tmp_path / "bf16")
    save_sparse_model(pb, mb)
    meta_b = json.load(open(os.path.join(pb, "meta.json")))
    assert meta_b["format_version"] == 1   # plain ckpts stay old-readable

    meta["format_version"] = 99
    json.dump(meta, open(os.path.join(p8, "meta.json"), "w"))
    with pytest.raises(ValueError, match="newer than"):
        load_sparse_model(p8)


def test_ivf_sq8_matches_f32_ivf():
    """IVF+SQ8 (quantized bucket entries, f32 coarse quantizer): same
    probes as f32 IVF, ≥90% top-10 overlap, rank-1 preserved."""
    from tdr.models.dense import build_ivf_index, ivf_search

    rng = np.random.RandomState(7)
    emb = rng.randn(600, 48).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[rng.randint(0, 600, 24)] + 0.03 * rng.randn(24, 48).astype(np.float32)

    f32 = build_ivf_index(emb, nlist=16, seed=1)
    q8 = build_ivf_index(emb, nlist=16, seed=1, dtype="int8")
    assert q8.buckets.dtype == jnp.int8 and q8.bucket_scale is not None
    np.testing.assert_array_equal(np.asarray(f32.bucket_rows),
                                  np.asarray(q8.bucket_rows))
    vf, rf = ivf_search(f32, jnp.asarray(q), top_k=10, nprobe=8)
    v8, r8 = ivf_search(q8, jnp.asarray(q), top_k=10, nprobe=8)
    overlap = np.mean([len(set(a.tolist()) & set(b.tolist())) / 10
                       for a, b in zip(np.asarray(rf), np.asarray(r8))])
    assert overlap >= 0.9, overlap
    assert (np.asarray(rf)[:, 0] == np.asarray(r8)[:, 0]).mean() >= 0.9


def test_grid_int8_matches_single(world):
    """2-D grid (query-DP x doc-sharding) with int8 heads == single-device
    int8 scoring (round 4: the grid engine must carry the quantized path
    too)."""
    from tdr.parallel import build_sharded_index, grid_score_topk
    from tdr.parallel.sharded import global_row_to_doc

    vocab, coo, qids, qw = world
    cfg = IndexConfig(**PAD, head_dtype="int8", head_budget_bytes=1 << 16)
    single = build_index(*coo, vocab.size, index_cfg=cfg, head_size=64)
    sharded = build_sharded_index(*coo, vocab.size, n_shards=2, index_cfg=cfg,
                                  head_size=64)
    mesh = make_mesh(data=4, model=2)
    vals_1, rows_1 = score_and_topk(single, qids, qw, top_k=10)
    vals_g, rows_g = grid_score_topk(mesh, sharded, qids, qw, top_k=10)
    docs_g = global_row_to_doc(sharded, np.asarray(rows_g))
    v1 = np.asarray(vals_1)
    np.testing.assert_allclose(np.asarray(vals_g), v1, rtol=1e-4, atol=1e-5)
    for q in range(v1.shape[0]):
        strict = np.ones(10, bool)
        strict[:-1] &= v1[q, :-1] > v1[q, 1:] + 1e-6
        strict[1:] &= v1[q, 1:] < v1[q, :-1] - 1e-6
        np.testing.assert_array_equal(docs_g[q][strict],
                                      np.asarray(rows_1)[q][strict])
