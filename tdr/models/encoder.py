"""Dense multilingual encoder: a MiniLM-class transformer in flax.

Replaces the reference's inference-only torch/HF encoder (AutoModel
`paraphrase-multilingual-MiniLM-L12-v2`, mean-pooled last_hidden_state,
batch 32, truncate 512 — team_run1.py:211-239,
corpus_processing_and_embedding.py:89-117) with a JAX/flax transformer that
is *trainable* on the reference's (query, positive, negatives) triples and
shards over the device mesh:

* batch axis → "data" (DP)
* attention heads + MLP hidden → "model" (TP), expressed with
  `nn.with_partitioning` so `jit` + NamedSharding lay params out over the
  mesh and XLA inserts the all-reduces.

bfloat16 compute / float32 params+reductions — MXU-friendly.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tdr.utils.config import DenseConfig


class MlpBlock(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(
            self.hidden, dtype=self.dtype,
            kernel_init=nn.with_partitioning(nn.initializers.xavier_uniform(), (None, "model")),
            bias_init=nn.with_partitioning(nn.initializers.zeros_init(), ("model",)),
            name="up",
        )(x)
        h = nn.gelu(h)
        return nn.Dense(
            self.dim, dtype=self.dtype,
            kernel_init=nn.with_partitioning(nn.initializers.xavier_uniform(), ("model", None)),
            bias_init=nn.with_partitioning(nn.initializers.zeros_init(), (None,)),
            name="down",
        )(h)


class EncoderBlock(nn.Module):
    dim: int
    heads: int
    mlp_hidden: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask):
        # pre-LN attention; heads sharded over "model"
        y = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            dtype=self.dtype,
            qkv_features=self.dim,
            kernel_init=nn.with_partitioning(nn.initializers.xavier_uniform(), (None, "model")),
            out_kernel_init=nn.with_partitioning(nn.initializers.xavier_uniform(), ("model", None)),
            name="attn",
        )(y, y, mask=mask)
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x)
        x = x + MlpBlock(self.dim, self.mlp_hidden, self.dtype, name="mlp")(y)
        return x


class DualEncoder(nn.Module):
    """Shared-weight text encoder producing L2-normalized embeddings."""

    cfg: DenseConfig

    @nn.compact
    def __call__(self, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        x = nn.Embed(
            cfg.vocab_size, cfg.dim, dtype=dtype,
            embedding_init=nn.with_partitioning(
                nn.initializers.normal(0.02), (None, None)),
            name="tok_embed",
        )(ids)
        pos = self.param(
            "pos_embed",
            nn.with_partitioning(nn.initializers.normal(0.02), (None, None)),
            (cfg.max_len, cfg.dim), jnp.float32,
        )
        x = x + pos[None, : x.shape[1]].astype(dtype)

        attn_mask = nn.make_attention_mask(mask > 0, mask > 0, dtype=dtype)
        for i in range(cfg.depth):
            x = EncoderBlock(
                cfg.dim, cfg.heads, int(cfg.dim * cfg.mlp_ratio), dtype,
                name=f"block_{i}",
            )(x, attn_mask)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln_out")(x)

        # mean pooling over valid tokens (team_run1.py:225-239 semantics)
        m = mask[..., None].astype(jnp.float32)
        pooled = jnp.sum(x.astype(jnp.float32) * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1.0)
        # L2 normalize (faiss.normalize_L2 equivalent)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-6)


def init_encoder(cfg: DenseConfig, seed: int = 0):
    """(model, params) with partitioning metadata attached."""
    model = DualEncoder(cfg)
    ids = jnp.zeros((2, cfg.max_len), jnp.int32)
    mask = jnp.ones((2, cfg.max_len), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), ids, mask)["params"]
    return model, params


@partial(jax.jit, static_argnames=("model",))
def encode(model: DualEncoder, params, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return model.apply({"params": params}, ids, mask)
