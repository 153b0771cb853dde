"""HF weight import: BERT/MiniLM-class state dicts → flax params.

The reference's strongest dense re-ranker is the pretrained
`paraphrase-multilingual-MiniLM-L12-v2` sentence-transformer
(team_run1.py:211-214, mean-pooled last_hidden_state).  tdr's trainable
`DualEncoder` (tdr/models/encoder.py) is pre-LN and cannot load those
weights faithfully, so this module provides:

* ``BertEncoder`` — a faithful flax implementation of the HF ``BertModel``
  encoder stack (post-LN residuals, learned absolute positions, token-type
  embeddings) with sentence-transformers pooling (masked mean + L2 norm,
  team_run1.py:231-239 semantics), TP-partitioned like the rest of tdr
  (qkv/MLP-hidden over the "model" mesh axis);
* ``convert_hf_bert`` — a name-mapped torch ``state_dict`` → flax params
  converter (no torch import needed at call time: any mapping of
  dotted names to numpy-convertible arrays works);
* ``minilm_l12_config`` — the real model's dimensions, so downloaded
  weights drop straight in when an environment has them.

Parity is pinned in tests/test_convert.py against a randomly-initialized
``transformers.BertModel`` built offline from a config (no downloads):
converted flax forward == torch forward to f32 tolerance.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    dim: int = 384
    depth: int = 12
    heads: int = 12
    mlp_hidden: int = 1536
    max_len: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


def minilm_l12_config() -> BertConfig:
    """paraphrase-multilingual-MiniLM-L12-v2 (BertModel architecture over
    the XLM-R vocabulary; sentence-transformers config.json)."""
    return BertConfig(vocab_size=250037, dim=384, depth=12, heads=12,
                      mlp_hidden=1536, max_len=512, type_vocab_size=2)


class _BertSelfAttention(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, additive_mask):
        cfg = self.cfg
        hd = cfg.dim // cfg.heads
        dense = partial(
            nn.DenseGeneral, features=(cfg.heads, hd), axis=-1,
            dtype=self.dtype,
            kernel_init=nn.with_partitioning(
                nn.initializers.xavier_uniform(), (None, "model", None)),
            bias_init=nn.with_partitioning(
                nn.initializers.zeros_init(), ("model", None)),
        )
        q = dense(name="query")(x)
        k = dense(name="key")(x)
        v = dense(name="value")(x)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         preferred_element_type=jnp.float32)
        att = att / np.sqrt(hd) + additive_mask
        att = jax.nn.softmax(att, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        return nn.DenseGeneral(
            features=cfg.dim, axis=(-2, -1), dtype=self.dtype,
            kernel_init=nn.with_partitioning(
                nn.initializers.xavier_uniform(), ("model", None, None)),
            bias_init=nn.with_partitioning(nn.initializers.zeros_init(), (None,)),
            name="out",
        )(ctx)


class _BertLayer(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, additive_mask):
        cfg = self.cfg
        # post-LN residuals (BertModel), unlike tdr's pre-LN DualEncoder
        a = _BertSelfAttention(cfg, self.dtype, name="attn")(x, additive_mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="attn_ln")(x + a)
        h = nn.Dense(
            cfg.mlp_hidden, dtype=self.dtype,
            kernel_init=nn.with_partitioning(
                nn.initializers.xavier_uniform(), (None, "model")),
            bias_init=nn.with_partitioning(nn.initializers.zeros_init(), ("model",)),
            name="mlp_up",
        )(x)
        h = nn.gelu(h, approximate=False)       # BERT uses exact gelu
        h = nn.Dense(
            cfg.dim, dtype=self.dtype,
            kernel_init=nn.with_partitioning(
                nn.initializers.xavier_uniform(), ("model", None)),
            bias_init=nn.with_partitioning(nn.initializers.zeros_init(), (None,)),
            name="mlp_down",
        )(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                            name="mlp_ln")(x + h)


class BertEncoder(nn.Module):
    """HF BertModel encoder + sentence-transformers pooling.

    Output: masked-mean-pooled, L2-normalized (B, dim) f32 embeddings —
    exactly the reference's re-ranker representation (team_run1.py:231-239).
    """

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        B, L = ids.shape
        we = nn.Embed(cfg.vocab_size, cfg.dim, dtype=jnp.float32,
                      name="word_embeddings")(ids)
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (cfg.max_len, cfg.dim), jnp.float32)
        tte = self.param("token_type_embeddings",
                         nn.initializers.normal(0.02),
                         (cfg.type_vocab_size, cfg.dim), jnp.float32)
        x = we + pos[None, :L] + tte[0][None, None]   # token_type 0 throughout
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="embed_ln")(x).astype(self.dtype)

        additive = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9
                             ).astype(jnp.float32)
        for i in range(cfg.depth):
            x = _BertLayer(cfg, self.dtype, name=f"layer_{i}")(x, additive)

        m = mask[..., None].astype(jnp.float32)
        pooled = jnp.sum(x.astype(jnp.float32) * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1e-9)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


def _np(t) -> np.ndarray:
    """torch tensor / numpy array → numpy (torch never imported here)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_hf_bert(state_dict: Mapping[str, Any], cfg: BertConfig) -> Dict:
    """HF ``BertModel.state_dict()`` → params for :class:`BertEncoder`.

    Accepts keys with or without the ``bert.`` / ``0.auto_model.`` prefixes
    sentence-transformers checkpoints carry.  torch ``nn.Linear`` stores
    (out, in) — transposed into flax's (in, out); qkv kernels are reshaped
    to DenseGeneral's (in, heads, head_dim) layout.
    """
    sd: Dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        for pre in ("0.auto_model.", "auto_model.", "bert."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = _np(v)

    hd = cfg.dim // cfg.heads

    def lin(prefix, transpose=True):
        w = sd[f"{prefix}.weight"]
        return {"kernel": w.T if transpose else w, "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def qkv(prefix):
        w = sd[f"{prefix}.weight"].T.reshape(cfg.dim, cfg.heads, hd)
        b = sd[f"{prefix}.bias"].reshape(cfg.heads, hd)
        return {"kernel": w, "bias": b}

    params: Dict[str, Any] = {
        "word_embeddings": {
            "embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": sd["embeddings.position_embeddings.weight"],
        "token_type_embeddings": sd["embeddings.token_type_embeddings.weight"],
        "embed_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.depth):
        e = f"encoder.layer.{i}"
        out_w = sd[f"{e}.attention.output.dense.weight"]   # (dim, dim) torch
        params[f"layer_{i}"] = {
            "attn": {
                "query": qkv(f"{e}.attention.self.query"),
                "key": qkv(f"{e}.attention.self.key"),
                "value": qkv(f"{e}.attention.self.value"),
                # DenseGeneral contracting (heads, hd) -> dim wants kernel
                # (heads, hd, dim); torch Linear weight is (dim, heads*hd)
                "out": {"kernel": out_w.T.reshape(cfg.heads, hd, cfg.dim),
                        "bias": sd[f"{e}.attention.output.dense.bias"]},
            },
            "attn_ln": ln(f"{e}.attention.output.LayerNorm"),
            "mlp_up": lin(f"{e}.intermediate.dense"),
            "mlp_down": lin(f"{e}.output.dense"),
            "mlp_ln": ln(f"{e}.output.LayerNorm"),
        }
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_sentence_transformer(model_dir: str, cfg: BertConfig = None):
    """Local sentence-transformers checkpoint dir → (BertEncoder, params).

    Reads ``pytorch_model.bin`` / ``model.safetensors`` from ``model_dir``
    (no network).  Gated on torch/safetensors availability — this
    environment has torch-cpu baked in.
    """
    import os

    cfg = cfg or minilm_l12_config()
    st = os.path.join(model_dir, "model.safetensors")
    pt = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        sd = load_file(st)
    elif os.path.exists(pt):
        import torch

        sd = torch.load(pt, map_location="cpu", weights_only=True)
    else:
        raise FileNotFoundError(f"no weights in {model_dir}")
    model = BertEncoder(cfg)
    return model, convert_hf_bert(sd, cfg)
