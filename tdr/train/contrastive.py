"""Contrastive dual-encoder training with DP x TP mesh sharding.

The reference ships training *data* — train.csv rows carry
(query, positive_docs, negative_docs) (SURVEY.md §0) — but never trains its
dense encoder (it runs a frozen HF model; its only from-scratch learner is a
logistic-regression ranker, text_preprocessing_and_tfidf.py:112-144).  This
module supplies the missing subsystem: InfoNCE training of the dense
retriever with in-batch negatives plus the CSV's explicit hard negatives.

Parallelism: one `jit`-compiled train step whose inputs carry
`NamedSharding`s — batch over the mesh "data" axis (DP), parameters laid
out by their `nn.with_partitioning` metadata over "model" (TP).  XLA
inserts the psum/all-reduce collectives (scaling-book recipe: annotate,
let XLA place collectives over ICI).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tdr.models.encoder import DualEncoder, init_encoder
from tdr.utils.config import DenseConfig
from tdr.utils.trace import log


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    cfg: DenseConfig, lr: float = 3e-4, weight_decay: float = 0.01, seed: int = 0
) -> Tuple[DualEncoder, TrainState, optax.GradientTransformation]:
    model, params = init_encoder(cfg, seed)
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(params)
    return model, TrainState(params, opt_state, jnp.zeros((), jnp.int32)), tx


def contrastive_loss(
    q_emb: jnp.ndarray,          # (B, D) normalized
    p_emb: jnp.ndarray,          # (B, D) normalized positives
    n_emb: Optional[jnp.ndarray] = None,   # (B, Nn, D) explicit negatives
    temperature: float = 0.05,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """InfoNCE with in-batch negatives (+ optional hard negatives)."""
    B = q_emb.shape[0]
    logits = q_emb @ p_emb.T                                  # (B, B)
    if n_emb is not None:
        neg = jnp.einsum("bd,bnd->bn", q_emb, n_emb)          # (B, Nn)
        logits = jnp.concatenate([logits, neg], axis=1)
    logits = logits / temperature
    labels = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0).squeeze(-1)
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    acc = (jnp.argmax(logits, axis=1) == labels).mean()
    return loss, {"loss": loss, "accuracy": acc}


def make_train_step(
    model: DualEncoder,
    tx: optax.GradientTransformation,
    temperature: float = 0.05,
) -> Callable:
    """Build the jitted train step.  Donates the state for in-place updates."""

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def loss_fn(params):
            q = model.apply({"params": params}, batch["q_ids"], batch["q_mask"])
            p = model.apply({"params": params}, batch["p_ids"], batch["p_mask"])
            n = None
            if "n_ids" in batch:
                B, Nn, L = batch["n_ids"].shape
                flat = model.apply(
                    {"params": params},
                    batch["n_ids"].reshape(B * Nn, L),
                    batch["n_mask"].reshape(B * Nn, L),
                )
                n = flat.reshape(B, Nn, -1)
            return contrastive_loss(q, p, n, temperature)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


# -- sharding ---------------------------------------------------------------

def param_shardings(mesh: Mesh, params) -> Any:
    """NamedShardings from the params' nn.with_partitioning metadata."""
    specs = nn.get_partition_spec(params)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_train_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Lay out params/opt_state over the mesh per their partitioning.

    Optimizer moments mirror the param tree, so param-shaped opt leaves
    (adam m/v) get the SAME shardings as their params — replicating them
    would forfeit the tensor-parallel memory saving (moments are 2x the
    param bytes).  Scalar/step leaves replicate."""
    p_sh = param_shardings(mesh, state.params)
    params = jax.device_put(state.params, p_sh)

    # Optimizer moments (adam mu/nu in optax's ScaleByAdamState) are whole
    # subtrees with the params' exact treedef, so pair them STRUCTURALLY:
    # any opt-state node whose pytree structure equals the param tree gets
    # the param shardings leaf-for-leaf; everything else (step counters,
    # scalars) replicates.  Shape-keyed matching would silently collide for
    # two same-shaped params with different partition specs.
    param_treedef = jax.tree_util.tree_structure(state.params)
    replicated = NamedSharding(mesh, P())

    def _is_param_mirror(node) -> bool:
        try:
            return jax.tree_util.tree_structure(node) == param_treedef
        except Exception:
            return False

    def _put_node(node):
        if _is_param_mirror(node):
            return jax.device_put(node, p_sh)
        return jax.tree.map(lambda l: jax.device_put(l, replicated), node)

    opt_state = jax.tree.map(_put_node, state.opt_state,
                             is_leaf=_is_param_mirror)
    return TrainState(params, opt_state,
                      jax.device_put(state.step, NamedSharding(mesh, P())))


def batch_shardings(mesh: Mesh, batch: Dict[str, jnp.ndarray]) -> Dict[str, NamedSharding]:
    return {
        k: NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))
        for k, v in batch.items()
    }


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    sh = batch_shardings(mesh, batch)
    return {k: jax.device_put(jnp.asarray(v), sh[k]) for k, v in batch.items()}


# -- data pipeline ----------------------------------------------------------

def make_batches(
    queries, corpus_texts_by_id: Dict[str, str], cfg: DenseConfig,
    batch_size: int, n_neg: int = 2, seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield hashed-encoded (query, positive, negatives) batches from a
    QuerySet with positive_docs / negative_docs (train.csv schema)."""
    from tdr.text.hash_tokenizer import encode_batch

    rng = np.random.RandomState(seed)
    idx = [i for i, p in enumerate(queries.positive_docs or [])
           if p in corpus_texts_by_id]
    rng.shuffle(idx)
    all_ids = list(corpus_texts_by_id)
    for s in range(0, len(idx) - batch_size + 1, batch_size):
        sel = idx[s:s + batch_size]
        q_texts = [queries.queries[i] for i in sel]
        p_texts = [corpus_texts_by_id[queries.positive_docs[i]] for i in sel]
        n_texts = []
        for i in sel:
            negs = list(queries.negative_docs[i]) if queries.negative_docs else []
            negs = [n for n in negs if n in corpus_texts_by_id][:n_neg]
            while len(negs) < n_neg:
                negs.append(all_ids[rng.randint(len(all_ids))])
            n_texts.extend(corpus_texts_by_id[n] for n in negs)
        q_ids, q_mask = encode_batch(q_texts, cfg.vocab_size, cfg.max_len)
        p_ids, p_mask = encode_batch(p_texts, cfg.vocab_size, cfg.max_len)
        n_ids, n_mask = encode_batch(n_texts, cfg.vocab_size, cfg.max_len)
        B = len(sel)
        yield {
            "q_ids": q_ids, "q_mask": q_mask,
            "p_ids": p_ids, "p_mask": p_mask,
            "n_ids": n_ids.reshape(B, n_neg, -1),
            "n_mask": n_mask.reshape(B, n_neg, -1),
        }


def train_dense_retriever(
    corpus, train_queries, cfg: DenseConfig,
    mesh: Optional[Mesh] = None,
    epochs: int = 1, batch_size: int = 32, n_neg: int = 2,
    lr: float = 3e-4, seed: int = 0,
) -> Tuple[DualEncoder, TrainState, Dict[str, float]]:
    """Full training loop (host data pipeline + device steps)."""
    model, state, tx = create_train_state(cfg, lr=lr, seed=seed)
    step_fn = make_train_step(model, tx)
    if mesh is not None:
        state = shard_train_state(mesh, state)
    by_id = dict(zip(corpus.docids, corpus.texts))
    last: Dict[str, float] = {}
    curve = []
    for ep in range(epochs):
        metrics = None
        for batch in make_batches(train_queries, by_id, cfg, batch_size, n_neg,
                                  seed=seed + ep):
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, batch)
        if metrics is None:
            log.warning(
                "epoch %d: no full batch of usable (query, positive) pairs — "
                "need >= batch_size (%d) queries whose positives are in the "
                "corpus", ep, batch_size)
            break
        last = {k: float(v) for k, v in metrics.items()}
        curve.append(round(last.get("loss", float("nan")), 4))
        log.info("epoch %d: %s", ep, last)
    # per-epoch end-of-epoch losses — the training curve callers report
    # (VERDICT r3 #5 asks the bench to show it next to the re-rank uplift)
    last["loss_curve"] = curve
    return model, state, last
