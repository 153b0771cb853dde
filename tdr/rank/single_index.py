"""Single shared index over the whole multilingual corpus, with per-query
language filtering at top-k.

The reference's pure TF-IDF pipeline builds ONE index over all 268k docs and
filters the ranking by the query's language while walking the argsort
(text_preprocessing_and_stopwords.py:189-275, filter at :252-268).  The
per-language router is usually better (smaller indexes, no cross-language
vocabulary collisions), but this variant is part of the reference's surface
and is occasionally right (e.g. code-mixed corpora).

TPU shape: one sparse score-row index; the language filter is a masked
`lax.top_k` (tdr.ops.topk_language_filtered) over int8 language codes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Type

import jax.numpy as jnp
import numpy as np

from tdr.data.loaders import Corpus
from tdr.models.sparse import SparseModel, TfidfCosineModel
from tdr.ops.score import (
    WILDCARD_LANG,
    mask_invalid_docs,
    score_batch_raw,
    topk_language_filtered,
)
from tdr.text.preprocess import Preprocessor
from tdr.utils.config import IndexConfig


@dataclass
class SingleIndexRetriever:
    """One index, all languages; ranking filtered to the query's language."""

    model: SparseModel
    doc_lang_codes: jnp.ndarray          # (N_pad,) int32
    lang_to_code: Dict[str, int]
    preprocessor: Preprocessor = field(default_factory=lambda: Preprocessor("best"))
    query_batch: int = 128

    @classmethod
    def build(
        cls,
        corpus: Corpus,
        model_cls: Type[SparseModel] = TfidfCosineModel,
        index_cfg: IndexConfig = IndexConfig(),
        preprocessor: Optional[Preprocessor] = None,
        **model_kw,
    ) -> "SingleIndexRetriever":
        pp = preprocessor or Preprocessor("best")
        toks = [pp(t, l) for t, l in zip(corpus.texts, corpus.langs)]
        model = model_cls.build(toks, corpus.docids, lang="multi",
                                index_cfg=index_cfg, **model_kw)
        lang_to_code = {l: i for i, l in enumerate(sorted(set(corpus.langs)))}
        codes = np.full(model.index.n_docs_pad, -1, np.int32)
        codes[: len(corpus)] = [lang_to_code[l] for l in corpus.langs]
        return cls(model=model, doc_lang_codes=jnp.asarray(codes),
                   lang_to_code=lang_to_code, preprocessor=pp)

    def _query_code(self, query: str, lang: str) -> int:
        """Language code for a query; unknown languages fall back to
        detection, then to unfiltered ranking (LanguageRouter-style) instead
        of a code that matches no document."""
        code = self.lang_to_code.get(lang)
        if code is None:
            from tdr.text.langid import detect_language

            code = self.lang_to_code.get(
                detect_language(query, default=""), WILDCARD_LANG)
        return code

    def retrieve(
        self, queries: Sequence[str], langs: Sequence[str], k: int = 10
    ) -> List[List[str]]:
        out: List[List[str]] = []
        m = self.model
        for s in range(0, len(queries), self.query_batch):
            chunk_q = list(queries[s : s + self.query_batch])
            chunk_l = list(langs[s : s + self.query_batch])
            n = len(chunk_q)
            pad = self.query_batch - n
            toks = [self.preprocessor(q, l) for q, l in zip(chunk_q, chunk_l)]
            toks += [[]] * pad
            qids, qw = m.encode_query_tokens(toks)
            q_codes = jnp.asarray(
                [self._query_code(q, l) for q, l in zip(chunk_q, chunk_l)]
                + [WILDCARD_LANG] * pad,
                jnp.int32)
            scores = mask_invalid_docs(
                score_batch_raw(m.index, jnp.clip(qids, 0, m.index.vocab_size - 1), qw),
                m.index.n_docs)
            k_eff = min(k, m.index.n_docs_pad)
            vals, rows = topk_language_filtered(
                scores, self.doc_lang_codes, q_codes, top_k=k_eff)
            vals, rows = np.asarray(vals)[:n], np.asarray(rows)[:n]
            for qv, qr in zip(vals, rows):
                out.append([m.docids[r] for r, v in zip(qr, qv)
                            if np.isfinite(v) and r < len(m.docids)])
        return out
