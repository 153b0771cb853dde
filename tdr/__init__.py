"""tdr — TPU-native multilingual document retrieval.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of the
reference system ``Harkeerat2002/document-retrieval`` (see SURVEY.md): multilingual
(en/fr/de/es/it/ar/ko) document retrieval over large corpora, with

* host-side per-language tokenization / stemming / lemmatization  (``tdr.text``)
* a padded-CSR term–doc index built with XLA segment ops            (``tdr.index``)
* Okapi BM25 scoring as fused gather/accumulate TPU kernels         (``tdr.ops``)
* TF-IDF cosine and dense-transformer re-rankers as batched matmul  (``tdr.models``)
* mesh-sharded scoring with collective top-k merges                 (``tdr.parallel``)
* retrieval orchestration (language routing, cascades)              (``tdr.rank``)
* Recall@k / MRR@k evaluation and submission writing                (``tdr.eval``)
* manifest-based sharded array checkpoints                          (``tdr.ckpt``)

Layer map mirrors SURVEY.md §1 (L0 data … L5 eval, LX persistence).
"""

__version__ = "0.1.0"

LANGS = ("ar", "de", "en", "es", "fr", "it", "ko")
