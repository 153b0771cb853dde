"""L4 retrieval orchestration: per-language model routing + query batching.

The reference's expert-parallel analogue: 7 independent per-language BM25
models with docid maps; queries grouped by language and routed
(bm25_ranking.ipynb:262-325, 368-395; final_implementation.py:320-330
groupby("lang"); SURVEY.md §2c "Model partitioning by language").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple, Type

import jax.numpy as jnp
import numpy as np

from tdr.data.loaders import Corpus
from tdr.models.sparse import BM25Model, SparseModel
from tdr.text.preprocess import Preprocessor
from tdr.utils.config import BM25Config, IndexConfig
from tdr.utils.trace import Tracer, log


def build_language_models(
    corpus: Corpus,
    model_cls: Type[SparseModel] = BM25Model,
    preprocessor: Optional[Preprocessor] = None,
    bm25: BM25Config = BM25Config(),
    index_cfg: IndexConfig = IndexConfig(),
    max_query_terms: int = 64,
    head_size: Optional[int] = None,
    tracer: Optional[Tracer] = None,
    use_native: bool = True,
    resume_dir: Optional[str] = None,
) -> Dict[str, SparseModel]:
    """Partition corpus by language, preprocess, and build one model per
    language (bm25_ranking.ipynb:262-313).

    ``use_native=True`` routes corpus preprocessing through the C++
    tokenizer + vectorized encoding (tdr.text.fast) when available and the
    preprocessor is the default "best" pipeline; falls back to the Python
    path otherwise.

    ``resume_dir`` makes the build crash-resumable: each finished language
    model is checkpointed there and already-complete languages are loaded
    instead of rebuilt — the principled version of the reference's
    os.path.exists pickle guards (SURVEY.md §5 "Failure detection").
    """
    pp = preprocessor or Preprocessor("best")
    tracer = tracer or Tracer("build_language_models")
    by_lang: Dict[str, List[int]] = {}
    for i, lang in enumerate(corpus.langs):
        by_lang.setdefault(lang, []).append(i)

    fast = False
    if use_native and preprocessor is None:
        from tdr.text.fast import fast_available

        fast = fast_available()

    models: Dict[str, SparseModel] = {}
    n_total = max(len(corpus.langs), 1)
    import dataclasses as _dc

    from tdr.text.vocab import build_vocab, encode_docs

    # --- phase 1: preprocess + encode every (non-resumed) language --------
    # Languages encode CONCURRENTLY on a thread pool: the C++ tokenizer
    # releases the GIL for the scan and numpy for the counting passes (the
    # reference fans preprocessing over a process pool, team_run1.py:102-109
    # — threads suffice here because the hot loops are native).
    to_encode = []
    for lang, rows in sorted(by_lang.items()):
        if resume_dir is not None:
            import os

            from tdr.ckpt import load_sparse_model

            lang_dir = os.path.join(resume_dir, lang)
            if os.path.exists(os.path.join(lang_dir, "meta.json")):
                models[lang] = load_sparse_model(lang_dir)
                log.info("resumed '%s' model from %s", lang, lang_dir)
                continue
        to_encode.append((lang, rows))

    def _encode_one(lang, rows):
        docids = [corpus.docids[i] for i in rows]
        if fast:
            from tdr.text.fast import fast_encode_corpus

            texts = [corpus.texts[i] for i in rows]
            vocab, *coo = fast_encode_corpus(
                texts, [lang] * len(rows), min_df=index_cfg.min_df)
            coo = tuple(coo)
        else:
            toks = [pp(corpus.texts[i], lang) for i in rows]
            vocab = build_vocab(toks, min_df=index_cfg.min_df)
            coo = encode_docs(toks, vocab)
        return lang, (vocab, coo, docids, len(rows))

    encoded: Dict[str, tuple] = {}   # lang -> (vocab, coo, docids, n_docs)
    if len(to_encode) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with tracer.span("encode:all", n_langs=len(to_encode)):
            with ThreadPoolExecutor(max_workers=min(8, len(to_encode))) as ex:
                for lang, payload in ex.map(
                        lambda a: _encode_one(*a), to_encode):
                    encoded[lang] = payload
    else:
        for lang, rows in to_encode:
            with tracer.span(f"encode:{lang}", n_docs=len(rows)):
                encoded[lang] = _encode_one(lang, rows)[1]

    # --- phase 2: waterfill the TOTAL dense-head budget -------------------
    # Baseline share is the language's document count (a tiny language must
    # not build a head as large as the dominant one: with 7 resident
    # indexes the sum can exceed HBM — measured as a 20x end-to-end
    # slowdown from memory churn at reference fidelity).  But no language
    # is handed more than it can USE: once the head covers the whole vocab
    # the tail is empty (pure-MXU scoring) and extra budget is dead weight,
    # so saturated languages donate their surplus to the still-hungry ones
    # (a small-vocab dominant language — e.g. en without bigrams — then
    # scores entirely on the head matmul).
    from tdr.index.build import full_head_bytes

    stats = {lang: (full_head_bytes(vocab.size, n, index_cfg), float(n))
             for lang, (vocab, _, _, n) in encoded.items()}
    # resumed models' heads already occupy HBM — charge them against the
    # total before waterfilling the remaining languages, or a single
    # non-resumed language could be handed the whole budget on top of
    # them (the resident-head overcommit the split exists to prevent)
    resumed_bytes = sum(
        int(np.prod(m.index.head_rows.shape)) * m.index.head_rows.dtype.itemsize
        for m in models.values())
    allocs = _waterfill_head_budget(
        max(index_cfg.head_budget_bytes - resumed_bytes, 0), stats)

    # --- phase 3: build one index per language ----------------------------
    for lang, (vocab, coo, docids, n) in encoded.items():
        lang_cfg = _dc.replace(index_cfg, head_budget_bytes=allocs[lang])
        with tracer.span(f"build:{lang}", n_docs=n):
            kwargs = dict(lang=lang, index_cfg=lang_cfg,
                          max_query_terms=max_query_terms, head_size=head_size)
            if model_cls is BM25Model:
                kwargs["bm25"] = bm25
            models[lang] = model_cls.from_coo(vocab, coo, docids, **kwargs)
        log.info("built %s model for '%s': %d docs, vocab %d, head %d, tail_pmax %d",
                 model_cls.__name__, lang, n,
                 models[lang].vocab.size, models[lang].index.head_size,
                 models[lang].index.tail_pmax)
        if resume_dir is not None:
            import os

            from tdr.ckpt import save_sparse_model

            save_sparse_model(os.path.join(resume_dir, lang), models[lang])

    # the builds above dispatch WITHOUT device syncs (df_host path), so all
    # languages overlap on the device queue; drain once so callers (and
    # build timing) see completed indexes
    import jax

    jax.block_until_ready([m.index.postings_w for m in models.values()])
    return models


def _waterfill_head_budget(
    total_bytes: int, stats: Dict[str, Tuple[int, float]],
    floor_bytes: int = 64 << 20,
) -> Dict[str, int]:
    """Split ``total_bytes`` of head budget: every language first gets
    ``min(need, floor_bytes)`` (floors scale down together if even they
    exceed the budget), then the remainder is waterfilled — shares
    proportional to weight (doc count), capped at each language's ``need``
    (full-vocab coverage), surplus re-poured over the still-hungry
    languages until spent.

    CONSERVES the budget: ``sum(allocs) <= total_bytes`` always (the
    pre-fix applied the floor AFTER allocation, so many small languages
    could overcommit HBM by up to n_langs * floor — the hole the split
    exists to close).

    ``stats``: {lang: (need_bytes, weight)} → {lang: alloc_bytes}."""
    budget = int(total_bytes)
    # phase 0: reserve the floors out of the total (a floor never exceeds
    # what the language can use)
    base = {lang: min(need, floor_bytes) for lang, (need, _) in stats.items()}
    base_sum = sum(base.values())
    if budget <= 0:
        return {lang: 0 for lang in stats}
    if base_sum > budget:
        scale = budget / base_sum
        return {lang: int(b * scale) for lang, b in base.items()}
    budget -= base_sum
    alloc = dict(base)
    hungry = {lang: (need - base[lang], w)
              for lang, (need, w) in stats.items() if need > base[lang]}
    while hungry and budget > 0:
        wsum = sum(w for _, w in hungry.values())
        if wsum <= 0:
            break
        saturated = {
            lang: need for lang, (need, w) in hungry.items()
            if need <= int(budget * w / wsum)
        }
        if not saturated:
            for lang, (_, w) in hungry.items():
                alloc[lang] += int(budget * w / wsum)
            break
        for lang, need in saturated.items():
            alloc[lang] += need
            budget -= need
            del hungry[lang]
    return alloc


def _pack_pending(vals_list, rows_list):
    """Device-side packing for `_gather_pending` — jitted so the whole
    stack+bitcast tree is ONE dispatch instead of ~16 eager ops (13
    bitcasts + 3 stacks at the reference query load).  Measured: this does
    NOT move the end-to-end wall (the post-dispatch gather wait is device
    compute draining, ~150 ms at reference load — a 0.5 s host sleep after
    dispatch drops the gather to 37 ms); kept for dispatch hygiene.  The
    list arity is static per trace; callers bucket it to a power of two so
    compile count stays logarithmic in batch count."""
    import jax

    return jnp.stack(
        [jnp.stack([jax.lax.bitcast_convert_type(v, jnp.int32)
                    for v in vals_list]),
         jnp.stack(rows_list)])


_pack_pending_jit = None


def _gather_pending(vals_list, rows_list):
    """Stack per-batch (B, k) results on device and pull them to the host
    in ONE transfer.  Packing happens in the INTEGER domain (scores bitcast
    to int32 bits, not rows to f32): doc rows < 2^23 are f32 denormals,
    and TPU vector copies flush denormals to zero — rows-as-f32 silently
    zeroed every result (caught as recall=0 in the bench).

    The pending list is padded to a power of two (duplicating batch 0 —
    ~20 KB of extra transfer per pad slot) so the jitted pack compiles
    O(log n_batches) shapes instead of one per distinct batch count."""
    global _pack_pending_jit
    import jax

    if _pack_pending_jit is None:
        _pack_pending_jit = jax.jit(_pack_pending)
    n = len(vals_list)
    m = 1
    while m < n:
        m <<= 1
    if m != n:
        vals_list = list(vals_list) + [vals_list[0]] * (m - n)
        rows_list = list(rows_list) + [rows_list[0]] * (m - n)
    host = np.asarray(_pack_pending_jit(vals_list, rows_list))
    return host[0][:n].view(np.float32), host[1][:n]


@dataclass
class LanguageRouter:
    """Routes queries to per-language models and merges results in input
    order (retrieve_test_queries, bm25_ranking.ipynb:368-395)."""

    models: Dict[str, SparseModel]
    preprocessor: Preprocessor = field(default_factory=lambda: Preprocessor("best"))
    query_batch: int = 128
    default_lang: str = "en"
    detect_missing_lang: bool = True   # fast_langdetect path (team_run1.py:49-77)
    use_native: bool = True            # C++ tokenizer for query preprocessing
    # small-batch compile buckets (VERDICT r3 #6): a single serving query
    # used to pad to the full query_batch, paying the (Q, N) score
    # write/read and a Q-row top-k for Q=query_batch.  Chunks now pad to
    # the smallest bucket that fits (then query_batch); each bucket is one
    # extra compile per language (one-time with the persistent cache).
    # () restores the single-shape behavior.
    query_buckets: Tuple[int, ...] = (1, 8)

    def _tokenize(self, queries: Sequence[str], q_idx: Sequence[int],
                  lang: str) -> List[List[str]]:
        """Tokenize one language group — native batch path when the default
        "best" pipeline is in play (query preprocessing was ~35% of warm
        end-to-end retrieval on the Python path), else the Python
        preprocessor."""
        if self.use_native and self.preprocessor.spec.name == "best":
            from tdr.text.fast import fast_available

            if fast_available():
                from tdr.text.fast import fast_tokenize_texts

                return fast_tokenize_texts(
                    [queries[i] for i in q_idx], lang)
        return [self.preprocessor(queries[i], lang) for i in q_idx]

    def _group(self, langs: Optional[Sequence[str]], queries: Sequence[str]) -> Dict[str, List[int]]:
        groups: Dict[str, List[int]] = {}
        for i in range(len(queries)):
            lang = langs[i] if langs is not None else None
            if (lang is None or lang == "" or lang not in self.models):
                if self.detect_missing_lang:
                    from tdr.text.langid import detect_language

                    lang = detect_language(queries[i], default=self.default_lang)
                if lang not in self.models:
                    lang = self.default_lang
            groups.setdefault(lang, []).append(i)
        return groups

    def _batches_resolved(self, queries, langs, k):
        """Dispatch every batch asynchronously, resolve everything with
        ONE packed device→host transfer, and return (model, sel,
        vals (n,k), rows (n,k)) per batch.

        Phase 1 queues device work while the host keeps tokenizing /
        encoding the next chunks (batch sizes follow
        final_implementation.ipynb:470-506; every chunk is padded to
        query_batch so jit sees ONE query shape).  Phase 2 stacks all
        results on device and pulls once — every np.asarray of a device
        array is a full RPC round trip on remote backends (30-50 ms
        measured on the axon tunnel); per-batch conversion serialized
        2×n_batches round trips and dominated end-to-end retrieval.
        Sharded models return trimmed host arrays (their collective
        already synced) and resolve inline."""
        resolved = []
        pending = []
        for lang, q_idx in self._group(langs, queries).items():
            model = self.models[lang]
            toks = self._tokenize(queries, q_idx, lang)
            for s in range(0, len(q_idx), self.query_batch):
                chunk = toks[s : s + self.query_batch]
                sel = q_idx[s : s + self.query_batch]
                pad_to = self._pad_target(len(chunk))
                if hasattr(model, "topk_tokens_async"):
                    vals, rows, n = model.topk_tokens_async(
                        chunk, k, pad_to=pad_to)
                    pending.append((model, sel, vals, rows, n))
                else:
                    # sharded models encode + sync internally
                    vals, rows = model.topk_tokens(chunk, k, pad_to=pad_to)
                    resolved.append((model, sel, vals, rows))
        # (A grouped-upload variant — encode a whole language group and
        # device_put it once — was built and A/B'd: no reliable win over
        # per-batch uploads on this backend, so the simpler flow stays.)

        if pending:
            # mixed-bucket calls produce per-batch arrays of different
            # shapes; jnp.stack needs uniform shapes.  Pad the smaller
            # batches up to the largest pending shape ON DEVICE (a cheap
            # async dispatch) so everything still comes back in the ONE
            # packed pull — a per-shape-group pull would pay an extra
            # 30-50 ms RPC per bucket shape on tunnel backends (round-4
            # review finding)
            b_max = max(p[2].shape[0] for p in pending)
            packed = []
            for model, sel, vals, rows, n in pending:
                b = vals.shape[0]
                if b < b_max:
                    vals = jnp.pad(vals, ((0, b_max - b), (0, 0)),
                                   constant_values=-jnp.inf)
                    rows = jnp.pad(rows, ((0, b_max - b), (0, 0)))
                packed.append((model, sel, vals, rows, n))
            vals_all, rows_all = _gather_pending(
                [p[2] for p in packed], [p[3] for p in packed])
            for i, (model, sel, _, _, n) in enumerate(packed):
                resolved.append((model, sel, vals_all[i][:n], rows_all[i][:n]))
        return resolved

    def _pad_target(self, n: int) -> int:
        """Smallest compile bucket that fits ``n``, else the full batch."""
        for b in sorted(self.query_buckets):
            if n <= b < self.query_batch:
                return b
        return self.query_batch

    @staticmethod
    def _map_docids(model, vals: np.ndarray, rows: np.ndarray) -> List[List[str]]:
        """(n, k) rows → docid lists via one vectorized object-array gather.

        The per-element ``model.docids[r]`` loop cost 45 ms per 2000-query
        retrieve (measured; ~12% of the wall after the encode fix) — a
        cached ``np.asarray(docids, dtype=object)`` gather + ``tolist`` is
        14x cheaper.  The finite mask only matters when k exceeds the
        partition (pad entries are -inf), so the all-finite common case
        skips per-row masking."""
        arr = getattr(model, "_docid_arr", None)
        if arr is None or len(arr) != len(model.docids):
            arr = np.asarray(model.docids, dtype=object)
            model._docid_arr = arr
        names = arr[np.clip(rows, 0, len(arr) - 1)]
        finite = np.isfinite(vals)
        if bool(finite.all()):
            return [row.tolist() for row in names]
        return [names[j][finite[j]].tolist() for j in range(names.shape[0])]

    def retrieve(
        self, queries: Sequence[str], langs: Optional[Sequence[str]] = None,
        k: int = 10,
    ) -> List[List[str]]:
        """Top-k docids per query, in input order.  ``langs=None`` (or
        unknown codes) routes by detected language."""
        results: List[Optional[List[str]]] = [None] * len(queries)
        for model, sel, vals, rows in self._batches_resolved(queries, langs, k):
            for j, docs in zip(sel, self._map_docids(model, vals, rows)):
                results[j] = docs
        return [r if r is not None else [] for r in results]

    def retrieve_with_scores(
        self, queries: Sequence[str], langs: Optional[Sequence[str]] = None,
        k: int = 10,
    ) -> Tuple[List[List[str]], np.ndarray]:
        docid_out: List[Optional[List[str]]] = [None] * len(queries)
        score_out = np.zeros((len(queries), k), np.float32)
        for model, sel, vals, rows in self._batches_resolved(queries, langs, k):
            docs_rows = self._map_docids(model, vals, rows)
            for i, j in enumerate(sel):
                docid_out[j] = docs_rows[i]
                score_out[j] = vals[i]
        return [r if r is not None else [] for r in docid_out], score_out
