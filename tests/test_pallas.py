"""Pallas head-accumulation kernel: interpret-mode correctness on CPU.

Real-TPU execution of the same kernel is exercised by bench.py / manual
runs; here the kernel LOGIC (double-buffered DMA, active-term loop, f32
accumulation) is validated against the XLA reference scorer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdr.index import build_index
from tdr.ops.pallas_score import head_scores_pallas
from tdr.ops.score import _head_scores
from tdr.text import build_vocab, encode_docs, encode_queries
from tdr.utils.config import IndexConfig

CFG = IndexConfig(doc_pad_multiple=128, nnz_pad_multiple=64,
                  head_budget_bytes=1 << 18, head_dtype="float32")


def _world(seed=0, n_docs=300, vocab_n=500, n_queries=16):
    rng = np.random.RandomState(seed)
    docs = [[f"t{rng.randint(vocab_n)}" for _ in range(rng.randint(5, 100))]
            for _ in range(n_docs)]
    vocab = build_vocab(docs)
    coo = encode_docs(docs, vocab)
    queries = [[f"t{rng.randint(vocab_n)}" for _ in range(rng.randint(1, 10))]
               for _ in range(n_queries)]
    qids, qw = encode_queries(queries, vocab, 16)
    return vocab, coo, jnp.asarray(qids), jnp.asarray(qw)


@pytest.mark.parametrize("head_size", [8, 64, None])
def test_kernel_matches_xla_reference(head_size):
    vocab, coo, qids, qw = _world()
    idx = build_index(*coo, vocab.size, index_cfg=CFG, head_size=head_size)
    ref = np.asarray(_head_scores(idx, jnp.clip(qids, 0, vocab.size - 1), qw))
    got = np.asarray(head_scores_pallas(idx, qids, qw, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_kernel_empty_and_full_queries():
    vocab, coo, qids, qw = _world()
    idx = build_index(*coo, vocab.size, index_cfg=CFG, head_size=32)
    # one query with zero active terms, one fully padded batch
    qw0 = qw.at[0].set(0.0)
    got = np.asarray(head_scores_pallas(idx, qids, qw0, interpret=True))
    assert np.allclose(got[0], 0.0)
    ref = np.asarray(_head_scores(idx, jnp.clip(qids, 0, vocab.size - 1), qw0))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_kernel_bf16_rows():
    vocab, coo, qids, qw = _world(seed=3)
    idx = build_index(*coo, vocab.size,
                      index_cfg=IndexConfig(doc_pad_multiple=128,
                                            nnz_pad_multiple=64,
                                            head_budget_bytes=1 << 18,
                                            head_dtype="bfloat16"),
                      head_size=64)
    ref = np.asarray(_head_scores(idx, jnp.clip(qids, 0, vocab.size - 1), qw))
    got = np.asarray(head_scores_pallas(idx, qids, qw, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=1e-2)
