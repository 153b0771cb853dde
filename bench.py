#!/usr/bin/env python
"""tdr headline benchmark: batched BM25 retrieval throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference completes its 2,000-query test retrieval within the
Kaggle 10-minute budget on CPU (BASELINE.md — "Retrieval time budget"), i.e.
~3.33 queries/sec.  The north star is >=100x that (BASELINE.json).

The corpus is synthetic (the Kaggle dataset is not redistributable) but
shaped like the reference's: 7 languages at the reference's proportions,
Zipf vocabulary, long documents.  Scale via env:
  TDR_BENCH_DOCS    (default 20000)
  TDR_BENCH_QUERIES (default 2000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_QPS = 2000.0 / 600.0   # reference: 2000 queries / 10-min budget


def main() -> None:
    from tdr.utils.jax_cache import enable as enable_jax_cache

    enable_jax_cache()
    import jax
    import numpy as np

    from tdr.data import synthetic_corpus, SyntheticSpec
    from tdr.models import BM25Model
    from tdr.rank import LanguageRouter, build_language_models
    from tdr.eval import recall_at_k
    from tdr.text.preprocess import Preprocessor
    from tdr.utils.config import IndexConfig
    from tdr.utils.trace import log

    n_docs = int(os.environ.get("TDR_BENCH_DOCS", 20000))
    n_queries = int(os.environ.get("TDR_BENCH_QUERIES", 2000))

    log.info("bench: %d docs, %d queries, devices=%s", n_docs, n_queries, jax.devices())
    corpus, queries = synthetic_corpus(
        SyntheticSpec(n_docs=n_docs, n_queries=n_queries, seed=42)
    )

    t0 = time.perf_counter()
    models = build_language_models(
        corpus, BM25Model,
        index_cfg=IndexConfig(head_budget_bytes=1 << 28),
    )
    build_s = time.perf_counter() - t0
    log.info("index build (host preprocess + device build): %.1fs", build_s)

    router = LanguageRouter(models, query_batch=256)

    # warmup: one padded batch per language compiles the single query shape
    for l in sorted(set(queries.langs)):
        i = queries.langs.index(l)
        router.retrieve([queries.queries[i]], [l], k=10)

    t0 = time.perf_counter()
    results = router.retrieve(queries.queries, queries.langs, k=10)
    jax.block_until_ready(jax.numpy.zeros(()))
    elapsed = time.perf_counter() - t0

    qps = n_queries / elapsed
    recall = recall_at_k(results, queries.positive_docs, 10)
    log.info("retrieval: %.2fs for %d queries -> %.1f qps (recall@10=%.3f)",
             elapsed, n_queries, qps, recall)

    print(json.dumps({
        "metric": "bm25_retrieval_queries_per_sec",
        "value": round(qps, 2),
        "unit": "queries/sec",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
        "extra": {
            "n_docs": n_docs,
            "n_queries": n_queries,
            "recall_at_10": round(recall, 4),
            "index_build_sec": round(build_s, 1),
            "retrieve_sec": round(elapsed, 2),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
