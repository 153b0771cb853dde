"""LX persistence: manifest-based array checkpoints.

Replaces the reference's pickle/joblib zoo — per-language model joblibs
(bm25_ranking.ipynb:305-313), docid pickles, `save_npz` CSR files
(cosine_similarity_bm25_reranking.py:113-118) and the sharded-pickle store
with HARDCODED per-language shard counts + ThreadPoolExecutor reload
(final_implementation.py:187-287) — with one layout:

    <dir>/manifest.json                 versions, config echo, model list
    <dir>/<lang>/arrays.npz             index arrays (bf16 stored as uint16)
    <dir>/<lang>/vocab.txt[.pairs.npy]  term strings (+ packed bigram pairs)
    <dir>/<lang>/docids.txt
    <dir>/dense/params.npz              dense encoder parameters

A manifest replaces hardcoded shard counts; every array is load-bearing and
self-describing, so resume never depends on code constants (SURVEY.md §5
"Checkpoint / resume").
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdr.index.build import IndexStats, SparseIndex
from tdr.models.sparse import BM25Model, SparseModel, TfidfCosineModel
from tdr.text.vocab import Vocab

# 1 = original layout; 2 = int8-quantized arrays present (head_scale /
# doc_scale) — older readers would silently mis-rank a quantized index
# (int8 rows without the dequantization scale), so quantized artifacts
# stamp 2 to make them refuse instead
FORMAT_VERSION = 2

_MODEL_TYPES = {"BM25Model": BM25Model, "TfidfCosineModel": TfidfCosineModel}


def _to_numpy_savable(x: jnp.ndarray) -> Tuple[np.ndarray, str]:
    arr = np.asarray(x)
    if arr.dtype == jnp.bfloat16:
        return arr.view(np.uint16), "bfloat16"
    return arr, str(arr.dtype)


def _from_numpy_saved(arr: np.ndarray, dtype: str) -> jnp.ndarray:
    if dtype == "bfloat16":
        return jnp.asarray(arr.view(jnp.bfloat16))
    return jnp.asarray(arr)


# --------------------------------------------------------------------------
# sparse models
# --------------------------------------------------------------------------

_INDEX_ARRAYS = ("indptr", "postings_doc", "postings_w", "postings_tf",
                 "head_slot", "head_rows")
_STATS_ARRAYS = ("df", "idf", "doc_len", "avgdl")
_STATIC_FIELDS = ("n_docs", "n_docs_pad", "vocab_size", "tail_pmax", "head_size")


def save_sparse_model(path: str, model: SparseModel) -> None:
    os.makedirs(path, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    dtypes: Dict[str, str] = {}
    for name in _INDEX_ARRAYS:
        arrays[name], dtypes[name] = _to_numpy_savable(getattr(model.index, name))
    if model.index.head_scale is not None:
        arrays["head_scale"], dtypes["head_scale"] = _to_numpy_savable(
            model.index.head_scale)
    for name in _STATS_ARRAYS:
        arrays[f"stats_{name}"], dtypes[f"stats_{name}"] = _to_numpy_savable(
            getattr(model.index.stats, name))
    arrays["vocab_df"] = np.asarray(model.vocab.df)
    np.savez(os.path.join(path, "arrays.npz"), **arrays)

    with open(os.path.join(path, "vocab.txt"), "w") as f:
        terms = sorted(model.vocab.term_to_id.items(), key=lambda kv: kv[1])
        # term ids may be non-contiguous when bigram pairs exist
        f.write("\n".join(f"{i}\t{t}" for t, i in terms))
    if model.vocab.pair_to_id:
        pairs = np.array(sorted(model.vocab.pair_to_id.items()), dtype=np.int64)
        np.save(os.path.join(path, "vocab.pairs.npy"), pairs)

    with open(os.path.join(path, "docids.txt"), "w") as f:
        f.write("\n".join(model.docids))

    meta = {
        "format_version": 2 if model.index.head_scale is not None else 1,
        "model_type": type(model).__name__,
        "lang": model.lang,
        "max_query_terms": model.max_query_terms,
        "query_weight": model.query_weight,
        "tail_budget": model.tail_budget,
        "use_fused_topk": model.use_fused_topk,
        "statics": {k: getattr(model.index, k) for k in _STATIC_FIELDS},
        "dtypes": dtypes,
        "vocab_n_docs": model.vocab.n_docs,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_sparse_model(path: str) -> SparseModel:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format_version", 1) > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format {meta['format_version']} is newer than "
            f"this build ({FORMAT_VERSION})")
    data = np.load(os.path.join(path, "arrays.npz"))
    dtypes = meta["dtypes"]

    index_kw = {name: _from_numpy_saved(data[name], dtypes[name])
                for name in _INDEX_ARRAYS}
    if "head_scale" in data:
        index_kw["head_scale"] = _from_numpy_saved(
            data["head_scale"], dtypes["head_scale"])
    stats = IndexStats(**{
        name: _from_numpy_saved(data[f"stats_{name}"], dtypes[f"stats_{name}"])
        for name in _STATS_ARRAYS
    })
    index = SparseIndex(stats=stats, **index_kw, **meta["statics"])

    term_to_id: Dict[str, int] = {}
    with open(os.path.join(path, "vocab.txt")) as f:
        for line in f:
            if line.rstrip("\n"):
                i, t = line.rstrip("\n").split("\t", 1)
                term_to_id[t] = int(i)
    pair_to_id = None
    pairs_path = os.path.join(path, "vocab.pairs.npy")
    if os.path.exists(pairs_path):
        pairs = np.load(pairs_path)
        pair_to_id = {int(k): int(v) for k, v in pairs}
    vocab = Vocab(term_to_id, data["vocab_df"], meta["vocab_n_docs"],
                  pair_to_id=pair_to_id)

    with open(os.path.join(path, "docids.txt")) as f:
        docids = f.read().splitlines()

    cls = _MODEL_TYPES[meta["model_type"]]
    return cls(vocab=vocab, index=index, docids=docids, lang=meta["lang"],
               max_query_terms=meta["max_query_terms"],
               query_weight=meta["query_weight"],
               tail_budget=meta.get("tail_budget", 1024),
               use_fused_topk=meta.get("use_fused_topk", True))


# --------------------------------------------------------------------------
# registries (one model per language)
# --------------------------------------------------------------------------

def save_registry(path: str, models: Dict[str, SparseModel],
                  extra_meta: Optional[dict] = None) -> None:
    os.makedirs(path, exist_ok=True)
    for lang, model in models.items():
        save_sparse_model(os.path.join(path, lang), model)
    manifest = {
        "format_version": (2 if any(m.index.head_scale is not None
                                    for m in models.values()) else 1),
        "languages": sorted(models),
        "extra": extra_meta or {},
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)


def load_registry(path: str) -> Dict[str, SparseModel]:
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest["format_version"] > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format {manifest['format_version']} is newer than "
            f"this build ({FORMAT_VERSION})")
    # parallel reload: per-language loads are I/O-bound (npz decompress +
    # host->device transfer); the reference thread-pools its shard reloads
    # for the same reason (final_implementation.py:223-287)
    langs = manifest["languages"]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, max(1, len(langs)))) as ex:
        loaded = list(ex.map(
            lambda lang: load_sparse_model(os.path.join(path, lang)), langs))
    return dict(zip(langs, loaded))


# --------------------------------------------------------------------------
# sharded index (one arrays file per shard + manifest)
# --------------------------------------------------------------------------

_SHARDED_STACKED = ("indptr", "postings_doc", "postings_w", "postings_tf",
                    "head_rows", "df_local", "doc_len")
_SHARDED_SHARED = ("head_slot", "idf", "avgdl", "n_valid")
_SHARDED_STATICS = ("n_shards", "n_docs", "n_docs_pad_local", "vocab_size",
                    "tail_pmax", "head_size")


def save_sharded_index(path: str, sindex) -> None:
    """One npz per shard (each loadable independently by its owning host in
    a multi-host deployment) + shared arrays + manifest."""
    os.makedirs(path, exist_ok=True)
    dtypes: Dict[str, str] = {}
    shared: Dict[str, np.ndarray] = {}
    for name in _SHARDED_SHARED:
        shared[name], dtypes[name] = _to_numpy_savable(getattr(sindex, name))
    np.savez(os.path.join(path, "shared.npz"), **shared)
    stacked = list(_SHARDED_STACKED)
    if sindex.head_scale is not None:
        stacked.append("head_scale")
    for s in range(sindex.n_shards):
        arrays: Dict[str, np.ndarray] = {}
        for name in stacked:
            arr, dt = _to_numpy_savable(getattr(sindex, name)[s])
            arrays[name] = arr
            dtypes[name] = dt
        np.savez(os.path.join(path, f"shard_{s:04d}.npz"), **arrays)
    meta = {
        "format_version": 2 if sindex.head_scale is not None else 1,
        "statics": {k: int(getattr(sindex, k)) for k in _SHARDED_STATICS},
        "dtypes": dtypes,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_sharded_index(path: str):
    from tdr.parallel.sharded import ShardedSparseIndex

    with open(os.path.join(path, "manifest.json")) as f:
        meta = json.load(f)
    if meta.get("format_version", 1) > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format {meta['format_version']} is newer than "
            f"this build ({FORMAT_VERSION})")
    dtypes = meta["dtypes"]
    shared = np.load(os.path.join(path, "shared.npz"))
    kw = {name: _from_numpy_saved(shared[name], dtypes[name])
          for name in _SHARDED_SHARED}
    S = meta["statics"]["n_shards"]
    from concurrent.futures import ThreadPoolExecutor

    stacked = list(_SHARDED_STACKED) + (
        ["head_scale"] if "head_scale" in dtypes else [])

    def _load_shard(s):
        data = np.load(os.path.join(path, f"shard_{s:04d}.npz"))
        return {name: _from_numpy_saved(data[name], dtypes[name])
                for name in stacked}

    # parallel shard reload (reference: ThreadPoolExecutor over pickle
    # batches, final_implementation.py:223-287)
    with ThreadPoolExecutor(max_workers=min(8, S)) as ex:
        shards = list(ex.map(_load_shard, range(S)))
    for name in stacked:
        kw[name] = jnp.stack([sh[name] for sh in shards])
    return ShardedSparseIndex(**kw, **meta["statics"])


# --------------------------------------------------------------------------
# training state (params + optimizer moments + step) for resume
# --------------------------------------------------------------------------

def save_train_state(path: str, state) -> None:
    """Checkpoint a tdr.train.TrainState (params, opt_state, step)."""
    os.makedirs(path, exist_ok=True)
    flat, _ = jax.tree_util.tree_flatten(state)
    arrays, dtypes = {}, {}
    for i, leaf in enumerate(flat):
        arrays[f"l{i}"], dtypes[f"l{i}"] = _to_numpy_savable(jnp.asarray(leaf))
    np.savez(os.path.join(path, "train_state.npz"), **arrays)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"format_version": FORMAT_VERSION, "n_leaves": len(flat),
                   "dtypes": dtypes}, f)


def load_train_state(path: str, template):
    """Restore into the structure of ``template`` (a freshly-created
    TrainState from create_train_state with the same config)."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    data = np.load(os.path.join(path, "train_state.npz"))
    flat_t, treedef = jax.tree_util.tree_flatten(template)
    if meta["n_leaves"] != len(flat_t):
        raise ValueError(
            f"train state has {meta['n_leaves']} leaves, template has "
            f"{len(flat_t)} — config mismatch")
    flat = [_from_numpy_saved(data[f"l{i}"], meta["dtypes"][f"l{i}"])
            for i in range(meta["n_leaves"])]
    for i, (saved, tmpl) in enumerate(zip(flat, flat_t)):
        if tuple(saved.shape) != tuple(jnp.shape(tmpl)):
            raise ValueError(
                f"train state leaf {i} has shape {tuple(saved.shape)}, "
                f"template expects {tuple(jnp.shape(tmpl))} — config mismatch")
    return jax.tree_util.tree_unflatten(treedef, flat)


# --------------------------------------------------------------------------
# dense model (encoder params + embedding index)
# --------------------------------------------------------------------------

def save_dense_model(path: str, dense) -> None:
    """Save a tdr.models.dense.DenseModel (params + flat index + docids)."""
    os.makedirs(path, exist_ok=True)
    flat, treedef = jax.tree_util.tree_flatten(dense.params)
    arrays = {}
    dtypes = {}
    for i, leaf in enumerate(flat):
        arrays[f"p{i}"], dtypes[f"p{i}"] = _to_numpy_savable(leaf)
    np.savez(os.path.join(path, "params.npz"), **arrays)
    emb, emb_dt = _to_numpy_savable(dense.flat.embeddings)
    idx_arrays = {"embeddings": emb}
    # optional FlatIndex sidecars: SQ8 per-doc scales, L2 squared norms
    if dense.flat.doc_scale is not None:
        idx_arrays["doc_scale"] = np.asarray(dense.flat.doc_scale)
    if dense.flat.doc_sq is not None:
        idx_arrays["doc_sq"] = np.asarray(dense.flat.doc_sq)
    np.savez(os.path.join(path, "index.npz"), **idx_arrays)
    with open(os.path.join(path, "docids.txt"), "w") as f:
        f.write("\n".join(dense.docids))
    meta = {
        "format_version": 2 if dense.flat.doc_scale is not None else 1,
        "n_leaves": len(flat),
        "dtypes": dtypes,
        "emb_dtype": emb_dt,
        "n_docs": dense.flat.n_docs,
        "metric": dense.flat.metric,
        "cfg": dataclasses.asdict(dense.cfg),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_dense_model(path: str):
    from tdr.models.dense import DenseModel, FlatIndex
    from tdr.models.encoder import init_encoder
    from tdr.utils.config import DenseConfig

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format_version", 1) > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format {meta['format_version']} is newer than "
            f"this build ({FORMAT_VERSION})")
    cfg = DenseConfig(**meta["cfg"])
    model, params0 = init_encoder(cfg)
    _, treedef = jax.tree_util.tree_flatten(params0)
    data = np.load(os.path.join(path, "params.npz"))
    flat = [_from_numpy_saved(data[f"p{i}"], meta["dtypes"][f"p{i}"])
            for i in range(meta["n_leaves"])]
    params = jax.tree_util.tree_unflatten(treedef, flat)
    idx_data = np.load(os.path.join(path, "index.npz"))
    flat_index = FlatIndex(
        embeddings=_from_numpy_saved(idx_data["embeddings"], meta["emb_dtype"]),
        doc_scale=(jnp.asarray(idx_data["doc_scale"])
                   if "doc_scale" in idx_data else None),
        doc_sq=(jnp.asarray(idx_data["doc_sq"])
                if "doc_sq" in idx_data else None),
        n_docs=meta["n_docs"],
        metric=meta.get("metric", "ip"))
    with open(os.path.join(path, "docids.txt")) as f:
        docids = f.read().splitlines()
    return DenseModel(model=model, params=params, cfg=cfg, docids=docids,
                      flat=flat_index)


# --------------------------------------------------------------------------
# segmented (live-update) models
# --------------------------------------------------------------------------

def save_segmented(path: str, seg) -> None:
    """Persist a tdr.rank.SegmentedBM25: the main segment via the sparse
    checkpoint, plus the delta's SOURCE documents (token lists) and the
    tombstone set as JSON — the delta index itself is a cheap rebuild at
    load (it is small by construction; its global-stat derivation must
    re-run against the restored main anyway).

    Crash-safe: everything is written to a dot-prefixed sibling temp dir
    and swapped in with renames.  A kill mid-save leaves either the old
    complete state, the new complete state, or (in the window between the
    two renames) the old state parked under ``.<name>.old-*`` — which
    ``recover_segmented_dir`` renames back on the next startup.  The
    dot prefix keeps restore loops from ever treating swap debris as a
    language directory."""
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    base = os.path.basename(path)
    tmp = os.path.join(parent, f".{base}.tmp-{os.getpid()}")
    _write_segmented(tmp, seg)
    old = os.path.join(parent, f".{base}.old-{os.getpid()}")
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        import shutil

        shutil.rmtree(old, ignore_errors=True)


def recover_segmented_dir(parent: str) -> None:
    """Repair swap debris from a save_segmented killed mid-swap: for any
    ``.<name>.old-*`` whose ``<name>`` directory is missing, rename the
    parked old state back; delete leftover ``.tmp-*``/orphaned ``.old-*``
    dirs.  Call before listing ``parent`` for state directories."""
    import re
    import shutil

    if not os.path.isdir(parent):
        return
    for entry in sorted(os.listdir(parent)):
        m = re.fullmatch(r"\.(.+)\.old-\d+", entry)
        if m:
            target = os.path.join(parent, m.group(1))
            if not os.path.exists(target):
                os.rename(os.path.join(parent, entry), target)
            else:
                shutil.rmtree(os.path.join(parent, entry),
                              ignore_errors=True)
        elif re.fullmatch(r"\..+\.tmp-\d+", entry):
            shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)


def _write_segmented(path: str, seg) -> None:
    os.makedirs(path, exist_ok=True)
    save_sparse_model(os.path.join(path, "main"), seg.main)
    state = {
        "format_version": FORMAT_VERSION,
        "lang": seg.lang,
        "bm25": dataclasses.asdict(seg.bm25),
        "index_cfg": dataclasses.asdict(seg.index_cfg),
        "delta_toks": seg._delta_toks,
        "delta_ids": seg._delta_ids,
        "deleted": sorted(seg._deleted),
    }
    with open(os.path.join(path, "segments.json"), "w") as f:
        json.dump(state, f)


def load_segmented(path: str):
    from tdr.rank.segmented import SegmentedBM25
    from tdr.utils.config import BM25Config, IndexConfig

    with open(os.path.join(path, "segments.json")) as f:
        state = json.load(f)
    if state.get("format_version", 1) > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format {state['format_version']} is newer than "
            f"this build ({FORMAT_VERSION})")
    seg = SegmentedBM25(
        main=load_sparse_model(os.path.join(path, "main")),
        lang=state["lang"],
        bm25=BM25Config(**state["bm25"]),
        index_cfg=IndexConfig(**state["index_cfg"]),
    )
    if state["delta_ids"]:
        # replaying the adds reconstructs the positional shadows (a re-add
        # shadows every older copy of its docid, intra-batch included)
        seg.add_documents(state["delta_toks"], state["delta_ids"])
    # the persisted `deleted` set holds ids deleted and NOT re-added since
    # (add_documents discards re-added ids), so replaying the deletes last
    # reconstructs the exact dead-position set
    if state["deleted"]:
        seg.delete_documents(state["deleted"])
    return seg
