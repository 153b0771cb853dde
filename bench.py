#!/usr/bin/env python
"""tdr headline benchmark: batched BM25 retrieval throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Baseline: the reference completes its 2,000-query test retrieval within the
Kaggle 10-minute budget on CPU (BASELINE.md — "Retrieval time budget"), i.e.
~3.33 queries/sec.  The north star is >=100x that (BASELINE.json).

Fidelity: defaults to the reference's FULL scale — 268,022 docs at the
reference's per-language proportions, 2,000 queries — on the HARD synthetic
benchmark (near-duplicate distractor groups, typo'd queries, cross-language
vocabulary collisions), so the reported recall sits meaningfully below 1.0
and can regress.  The corpus itself is synthetic (the Kaggle dataset is not
redistributable).

Also reports a roofline figure for the device scoring kernel on the largest
(en) partition: a bytes-moved model for the fused head+tail+top-k pass vs
measured time vs peak HBM bandwidth.

Scale via env:
  TDR_BENCH_DOCS     (default 268022)
  TDR_BENCH_QUERIES  (default 2000)
  TDR_PEAK_GBPS      (default 819 — TPU v5e peak HBM bandwidth)
  TDR_BENCH_VOCAB_STRESS=1  reference-scale vocabulary section (en >=200k
      unigram index terms, tail CSR live on the dominant partition);
      scale with TDR_BENCH_STRESS_DOCS / TDR_BENCH_STRESS_QUERIES
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_QPS = 2000.0 / 600.0   # reference: 2000 queries / 10-min budget
BASELINE_RECALL = 0.77599       # reference Kaggle Recall@10 (real data; the
                                # hard-synthetic recall is not comparable but
                                # is reported so regressions are visible)


def _fail_json(error: str, **extra) -> None:
    """Emit ONE clean parseable JSON line and exit nonzero (VERDICT r3 #1b:
    BENCH_r03 was a multi-minute stack trace with parsed=null; a down tunnel
    must cost seconds and leave a machine-readable tail)."""
    print(json.dumps({
        "metric": "bm25_retrieval_queries_per_sec",
        "value": None,
        "unit": "queries/sec",
        "vs_baseline": None,
        "error": error,
        "extra": extra,
    }), flush=True)
    sys.exit(2)


def _probe_backend(timeout_s: float = 120.0) -> str:
    """Probe the jax backend in a SUBPROCESS with a hard timeout.

    The axon TPU tunnel has two failure modes (CLAUDE.md): backend init
    raises Unavailable, or jax.devices() hangs forever — in THIS process a
    hang would be unkillable from Python.  A subprocess probe converts both
    into a fast, attributable failure.  Returns the backend name on success.
    """
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return "cpu"   # smoke runs stay off the TPU; nothing to probe
    import subprocess

    code = ("import jax; "
            "print('BACKEND=' + jax.default_backend() + "
            "':' + str(len(jax.devices())))")
    try:
        p = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        _fail_json("tpu_unavailable",
                   detail=f"backend probe hung >{timeout_s:.0f}s "
                          f"(tunnel down, jax.devices() stall)")
    if p.returncode != 0:
        tail = (p.stderr or "").strip().splitlines()[-1:]
        _fail_json("tpu_unavailable",
                   detail=f"backend probe rc={p.returncode}",
                   probe_tail=tail)
    for line in p.stdout.splitlines():
        if line.startswith("BACKEND="):
            backend = line.split("=", 1)[1].split(":")[0]
            print(f"[bench] backend probe OK: {line.split('=', 1)[1]}",
                  file=sys.stderr, flush=True)
            return backend
    _fail_json("tpu_unavailable", detail="probe printed no backend line")
    raise AssertionError("unreachable")


def roofline_model(Q: int, N: int, D: int, head_itemsize: int,
                   covers_vocab: bool, tail_budget: int, tail_pmax: int,
                   peak_gbps: float, peak_tflops: float) -> dict:
    """PURE byte/flop model of the shipping full-head engine — extracted so
    the measurement core is unit-testable (VERDICT r3 #8; r2 shipped a
    broken byte model silently because only wiring was tested).

    Traffic model (tdr/ops/score.py `_fused_topk_core`):
      1. full-head MXU matmul W (Q, D) @ head_rows (D, N): reads the ENTIRE
         head matrix once per batch (D*N*head_itemsize) and writes the f32
         score matrix (Q*N*4);
      2. top-k reads the score matrix back (Q*N*4);
      3. tail (skipped when the head covers the vocab): compacted posting
         DMA + sorts, ~ Q * min(tail_budget, 16*tail_pmax) * 8.
    FLOPs: 2*Q*D*N (the MXU contracts the full W even though it is mostly
    zeros — the engine's design trade).  The floor is
    max(bytes/peak_bw, flops/peak_flops)."""
    model_bytes = D * N * head_itemsize + 2 * Q * N * 4
    if not covers_vocab:
        model_bytes += Q * min(tail_budget, 16 * tail_pmax) * 8
    model_flops = 2.0 * Q * D * N
    t_bw = model_bytes / (peak_gbps * 1e9)
    t_fl = model_flops / (peak_tflops * 1e12)
    return {
        "model_bytes": int(model_bytes),
        "model_flops": model_flops,
        "floor_s_bandwidth": t_bw,
        "floor_s_compute": t_fl,
        "floor_s": max(t_bw, t_fl),
    }


def median_time(times) -> float:
    """The headline aggregation: median of the timed passes (VERDICT r2 #2:
    the headline must carry its variance, not a best manual run).  Sorted
    copy; for even counts this picks the UPPER median (index len//2), the
    conservative/slower side — pinned by test_bench_sections."""
    ts = sorted(times)
    if not ts:
        raise ValueError("no timings")
    return ts[len(ts) // 2]


_BENCH_T0 = time.time()


def _over_deadline() -> bool:
    """Soft time budget (TDR_BENCH_DEADLINE_S, default 2700): once spent,
    remaining OPTIONAL sections are skipped so the headline still ships
    inside the driver's hard timeout (a cold remote-compile run pays
    30-190s per new shape; MULTICHIP_r03 died rc=124 on exactly this class
    of budget blowout)."""
    return time.time() - _BENCH_T0 > float(
        os.environ.get("TDR_BENCH_DEADLINE_S", "2700"))


def _section(name: str, fn):
    """Run one OPTIONAL bench section; on failure return an error stub
    instead of killing the whole bench (a green artifact with one failed
    section beats an rc=1 stack trace with no headline — the r03 lesson).
    Past the soft deadline the section is skipped with a stub."""
    import traceback

    from tdr.utils.trace import log

    if _over_deadline():
        log.warning("bench section %r skipped: over TDR_BENCH_DEADLINE_S",
                    name)
        return {"section_skipped": "over_deadline"}
    try:
        return fn()
    # Exception, not BaseException: Ctrl-C / SystemExit must still stop
    # the bench (review finding) — only real failures become stubs
    except Exception as e:   # noqa: BLE001 — the headline must survive
        log.error("bench section %r failed: %s", name, e)
        traceback.print_exc()
        return {"section_error": f"{type(e).__name__}: {e}"[:300]}


def _kernel_roofline(model, batch: int, peak_gbps: float,
                     peak_tflops: float = 197.0):
    """Time the fused device scoring pass on one index against a byte AND
    flop model of the PRODUCTION engine (VERDICT r2 #1a: the previous model
    described the retired batch-unique-slot engine).

    The shipping engine (tdr/ops/score.py `_fused_topk_core`) is:
      1. full-head MXU matmul  W (Q, D) @ head_rows (D, N)
         — reads the ENTIRE head matrix once per batch regardless of how
           many rows the queries touch:      D * N * head_bytes
         — writes the f32 score matrix:      Q * N * 4
      2. top-k over the score matrix — reads it back:  Q * N * 4
         (the grouped top-k also reads the k*G candidate gather, < 1%)
      3. tail (skipped when the head covers the vocab): compacted posting
         DMA + sorts, ~ Q * tail_budget * 8
    FLOPs: 2 * Q * D * N for the matmul (the MXU contracts the full W even
    though it is mostly zeros — that is the engine's design trade).

    The floor is max(bytes / peak_bw, flops / peak_flops); `roofline_frac`
    is floor / measured — the fraction of speed-of-light the engine runs
    at under ITS OWN traffic model.  `hbm_utilization` is achieved bytes/s
    over peak, comparable across rounds.

    Memoization guard: the axon backend caches identical dispatches, so
    each timed call uses a DIFFERENT query batch (pipelined, one sync).
    Sync amortization: the one trailing block_until_ready costs a ~25 ms
    backend RPC — at n_rep=8 that inflated every per-batch time by ~3 ms
    (r2's 9.66 ms / 0.34 util en reading is really 6.4 ms / 0.51 at
    n_rep=256); 64 reps puts the distortion under 0.4 ms/batch.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdr.ops.score import score_and_topk_fused

    index = model.index
    Q = batch
    T = model.max_query_terms
    rng = np.random.RandomState(0)
    n_rep = 64
    batches = []
    for r in range(n_rep + 1):
        qids = rng.randint(0, index.vocab_size, (Q, T)).astype(np.int32)
        qw = np.zeros((Q, T), np.float32)
        qw[:, :6] = 1.0  # ~6 active terms per query, like the bench queries
        batches.append((jnp.asarray(qids), jnp.asarray(qw)))

    engine = model._resolved_tail_engine()
    # round-5 timing rule (CLAUDE.md): block_until_ready EARLY-ACKS on this
    # tunnel — every timed region ends with a device checksum of all
    # outputs pulled to host, so work cannot be acked away
    pack = jax.jit(lambda vs: sum(jnp.sum(v) for v in vs))

    def _chk(outs):
        return float(np.asarray(pack([o[0].astype(jnp.float32)
                                      for o in outs])))

    def timed(f):
        _chk([f(batches[-1])])                     # compile + warm
        t0 = time.perf_counter()
        outs = [f(b) for b in batches[:n_rep]]
        _chk(outs)
        return (time.perf_counter() - t0) / n_rep, outs

    fn = lambda b: score_and_topk_fused(index, b[0], b[1], top_k=10,
                                        tail_budget=model.tail_budget,
                                        tail_engine=engine)
    dt, outs = timed(fn)

    # approx head selection A/B (topk_mode="approx"): same engine, the
    # head candidate top-k swapped for lax.approx_max_k @ recall 0.95
    fa = lambda b: score_and_topk_fused(index, b[0], b[1], top_k=10,
                                        tail_budget=model.tail_budget,
                                        tail_engine=engine,
                                        topk_mode="approx")
    exact_docs = np.asarray(outs[0][1])
    dt_a, outs_a = timed(fa)
    approx_docs = np.asarray(outs_a[0][1])

    # exact_compact A/B (round 5): tier-1 M-slot merge, still exact —
    # pays a full-width tier-2 re-merge per tau-bound-tripped batch
    fc = lambda b: score_and_topk_fused(index, b[0], b[1], top_k=10,
                                        tail_budget=model.tail_budget,
                                        tail_engine=engine,
                                        topk_mode="exact_compact")
    dt_c, outs_c = timed(fc)
    compact_docs = np.asarray(outs_c[0][1])
    overlap_c = np.mean([len(set(e) & set(a)) / len(e)
                         for e, a in zip(exact_docs, compact_docs)])
    del outs_c
    overlap = np.mean([len(set(e) & set(a)) / len(e)
                       for e, a in zip(exact_docs, approx_docs)])

    # int8 scalar-quantized head A/B (IndexConfig.head_dtype="int8" /
    # build.quantize_head): int8×int8→int32 MXU matmul, per-doc-column
    # dequantization on the output — halves the dominant head-read bytes
    # of bf16 and doubles the systolic rate; tail + merge stay exact
    from tdr.index.build import quantize_head

    index8 = quantize_head(index)
    f8 = lambda b: score_and_topk_fused(index8, b[0], b[1], top_k=10,
                                        tail_budget=model.tail_budget,
                                        tail_engine=engine)
    dt_8, outs_8 = timed(f8)
    int8_docs = np.asarray(outs_8[0][1])
    overlap_8 = np.mean([len(set(e) & set(a)) / len(e)
                         for e, a in zip(exact_docs, int8_docs)])
    # int8 + approx selection stacked: the two optimizations are orthogonal
    f8a = lambda b: score_and_topk_fused(index8, b[0], b[1], top_k=10,
                                         tail_budget=model.tail_budget,
                                         tail_engine=engine,
                                         topk_mode="approx")
    dt_8a, outs_8a = timed(f8a)
    del index8, outs_8, outs_8a

    N = int(index.n_docs_pad)
    D = int(index.head_rows.shape[0])
    covers = bool(index.head_size >= index.vocab_size)
    rm = roofline_model(Q, N, D, index.head_rows.dtype.itemsize, covers,
                        model.tail_budget, int(index.tail_pmax),
                        peak_gbps, peak_tflops)
    model_bytes, model_flops = rm["model_bytes"], rm["model_flops"]
    t_bw, t_fl, floor = (rm["floor_s_bandwidth"], rm["floor_s_compute"],
                         rm["floor_s"])
    gbps = model_bytes / dt / 1e9
    return {
        "batch": Q,
        "n_docs_pad": N,
        "head_rows": D,
        "tail_engine": engine,
        "head_covers_vocab": covers,
        "kernel_ms_per_batch": round(dt * 1e3, 2),
        "kernel_approx_ms_per_batch": round(dt_a * 1e3, 2),
        "kernel_approx_top10_overlap": round(float(overlap), 4),
        "kernel_exact_compact_ms_per_batch": round(dt_c * 1e3, 2),
        "kernel_exact_compact_top10_overlap": round(float(overlap_c), 4),
        "kernel_int8_ms_per_batch": round(dt_8 * 1e3, 2),
        "kernel_int8_top10_overlap": round(float(overlap_8), 4),
        "kernel_int8_approx_ms_per_batch": round(dt_8a * 1e3, 2),
        "model_bytes_per_batch": int(model_bytes),
        "model_gflops_per_batch": round(model_flops / 1e9, 1),
        "floor_ms_bandwidth": round(t_bw * 1e3, 2),
        "floor_ms_compute": round(t_fl * 1e3, 2),
        "achieved_gbps": round(gbps, 1),
        "peak_gbps": peak_gbps,
        "hbm_utilization": round(gbps / peak_gbps, 3),
        "roofline_frac": round(floor / dt, 3),
    }


def _cascade_bench(n_docs: int = 207_363, n_queries: int = 1000,
                   sent_docs: int = 100_000, sent_queries: int = 500) -> dict:
    """Cascade benchmarks at REFERENCE scale (VERDICT r2 #4: the r2 numbers
    were 5k-doc toys).

    * cosine→BM25 cascade over the en partition at its full reference size
      (207,363 docs — the reference scores candidates over the whole corpus,
      cosine_similarity_bm25_reranking.py:198-238; tdr's cascade is
      language-routed by design, so the dominant partition is the scale
      unit).  Candidates come from the entire partition.
    * sentence-BM25 → dense-LM cascade at >=100k docs / >=500k sentences
      (the reference builds its sentence index over the whole corpus with a
      process pool, team_run1.py:80-124): reports sentence-index build time,
      the one-time corpus-wide embedding pass, and end-to-end qps + recall.

    Scale via TDR_BENCH_CASCADE_DOCS / TDR_BENCH_SENT_DOCS (set small for
    smoke runs)."""
    import time

    import jax

    from tdr.data import synthetic_corpus, SyntheticSpec
    from tdr.eval import recall_at_k
    from tdr.models import BM25Model, TfidfCosineModel
    from tdr.models.dense import DenseModel
    from tdr.rank import CascadeRetriever, SentenceBM25, SentenceLmCascade
    from tdr.train import train_dense_retriever
    from tdr.utils.config import DenseConfig, IndexConfig
    from tdr.utils.trace import log

    n_docs = int(os.environ.get("TDR_BENCH_CASCADE_DOCS", n_docs))
    sent_docs = int(os.environ.get("TDR_BENCH_SENT_DOCS", sent_docs))

    # ~1 GiB head budget per stage index: en's unigram vocab saturates to a
    # mostly-head index at this size while the two stages + the headline
    # models fit HBM together
    cfg = IndexConfig(head_budget_bytes=1 << 30)
    corpus, queries = synthetic_corpus(
        SyntheticSpec(n_docs=n_docs, n_queries=n_queries, seed=7, hard=True,
                      ref_proportions=False, langs=("en",)))

    # ONE fast-encode pass feeds both stage indexes (identical tokenization)
    from tdr.text.fast import fast_available, fast_encode_corpus

    t0 = time.perf_counter()
    if fast_available():
        vocab, *coo = fast_encode_corpus(
            corpus.texts, ["en"] * len(corpus.texts))
        coo = tuple(coo)
        cand = TfidfCosineModel.from_coo(vocab, coo, corpus.docids,
                                         lang="en", index_cfg=cfg)
        rank = BM25Model.from_coo(vocab, coo, corpus.docids,
                                  lang="en", index_cfg=cfg)
    else:
        from tdr.text import Preprocessor

        pp = Preprocessor("best")
        toks = [pp(t, "en") for t in corpus.texts]
        cand = TfidfCosineModel.build(toks, corpus.docids, lang="en",
                                      index_cfg=cfg)
        rank = BM25Model.build(toks, corpus.docids, lang="en", index_cfg=cfg)
    build_s = time.perf_counter() - t0
    log.info("cascade stage indexes built: %.1fs at %d docs", build_s, n_docs)

    cas = CascadeRetriever({"en": cand}, {"en": rank}, candidates=200,
                           query_batch=256)
    cas.retrieve(queries.queries[:1], ["en"], k=10)  # warm
    cas.retrieve(queries.queries, queries.langs, k=10)  # full-shape warm
    t0 = time.perf_counter()
    res = cas.retrieve(queries.queries, queries.langs, k=10)
    jax.block_until_ready(jax.numpy.zeros(()))
    dt = time.perf_counter() - t0
    out = {
        "cosine_bm25_cascade_qps": round(n_queries / dt, 1),
        "cosine_bm25_cascade_recall_at_10": round(
            recall_at_k(res, queries.positive_docs, 10), 4),
        "cascade_build_sec": round(build_s, 1),
        "cascade_n_docs": n_docs,
        "cascade_n_queries": n_queries,
    }
    # release stage indexes before sentences (NB: `coo` only exists on the
    # fast-encode branch — ADVICE r3: del'ing it unconditionally crashed the
    # pure-Python fallback)
    del cas, cand, rank, res
    coo = None

    # sentence-LM cascade at >=500k sentences: small trained encoder,
    # corpus-wide precomputed embeddings.  n_dev extra queries form a DEV
    # split for the fusion-alpha tuner — tuned on dev, evaluated on the
    # disjoint sent_queries tail (no leakage).
    n_dev = 200
    corpus2, queries2 = synthetic_corpus(
        SyntheticSpec(n_docs=sent_docs, n_queries=sent_queries + n_dev,
                      seed=7, hard=True, ref_proportions=False, langs=("en",),
                      sentences_per_doc=6))
    dcfg = DenseConfig(vocab_size=4000, dim=64, depth=2, heads=4, max_len=32)

    # Encoder training data (VERDICT r4 #4 — the DPR/ANCE mining recipe,
    # tdr/train/mining.py, wired into the cascade it was built for):
    #   * pairs: the n_dev DEV queries + ICT pseudo-queries from corpus
    #     text alone — the EVAL tail never enters training (r4's flow
    #     trained on the full query set, eval queries included; that
    #     leakage is closed here)
    #   * negatives: mined from the serving BM25 engine's top ranks — the
    #     exact documents the re-ranker must reorder at the cascade
    #     boundary — instead of the trainer's random-doc fallback
    from tdr.rank import LanguageRouter, build_language_models
    from tdr.train.mining import (concat_querysets, make_pseudo_queries,
                                  mine_hard_negatives)

    doc_models = build_language_models(corpus2)
    doc_router = LanguageRouter(doc_models, query_batch=256)
    import dataclasses as _dc

    dev_qs = _dc.replace(
        queries2,
        query_ids=queries2.query_ids[:n_dev],
        queries=queries2.queries[:n_dev],
        langs=queries2.langs[:n_dev],
        positive_docs=queries2.positive_docs[:n_dev],
        negative_docs=None,
    )
    t0 = time.perf_counter()
    pqs = make_pseudo_queries(corpus2, int(os.environ.get(
        "TDR_BENCH_PSEUDO_QUERIES", 4000)), seed=11)
    mined = mine_hard_negatives(doc_router, concat_querysets([dev_qs, pqs]),
                                n_neg=2, depth=20,
                                fallback_docids=corpus2.docids, seed=11)
    mine_s = time.perf_counter() - t0
    log.info("mined %d training queries (%d pseudo) in %.1fs",
             len(mined.queries), len(pqs.queries), mine_s)
    model, state, train_metrics = train_dense_retriever(
        corpus2, mined, dcfg, epochs=3, batch_size=50, n_neg=2, lr=1e-3)
    dense = DenseModel.build(model, state.params, dcfg,
                             corpus2.texts[:1], corpus2.docids[:1], batch=32)
    t0 = time.perf_counter()
    sb = SentenceBM25.build(corpus2.docids, corpus2.texts, "en", index_cfg=cfg)
    sent_build_s = time.perf_counter() - t0
    log.info("sentence index built: %.1fs, %d sentences", sent_build_s,
             len(sb.texts))
    lm = SentenceLmCascade({"en": sb}, dense, bm25_candidates=100)
    t0 = time.perf_counter()
    sb.precompute_embeddings(dense)          # one-time corpus embedding pass
    embed_s = time.perf_counter() - t0
    # tune fusion alpha + doc-evidence weight on the dev split (one stage
    # pass, host re-fusions over the 2-D grid)
    alpha, curve = lm.tune_fusion_alpha(
        queries2.queries[:n_dev], queries2.langs[:n_dev],
        queries2.positive_docs[:n_dev], k=10)
    log.info("fusion tuned on %d dev queries: alpha=%.2f doc_agg=%.2f "
             "(curve %s)", n_dev, alpha, lm.doc_agg_weight,
             {str(a): round(r, 3) for a, r in curve.items()})
    q_ev = queries2.queries[n_dev:]
    l_ev = queries2.langs[n_dev:]
    p_ev = queries2.positive_docs[n_dev:]
    warm = q_ev[: lm.query_batch]
    lm.retrieve(warm, ["en"] * len(warm), k=10)  # warm the one chunk shape
    t0 = time.perf_counter()
    res2, s1 = lm.retrieve(q_ev, l_ev, k=10, with_stage1=True)
    dt2 = time.perf_counter() - t0

    # RRF ensemble: doc-level BM25 + the sentence cascade are DIFFERENT
    # engines over the same corpus (doc-granular lexical vs
    # sentence-granular lexical→dense); reciprocal-rank fusing their top-k
    # lists measured +2 recall points over the best single engine at 20k
    # docs — report the at-scale number next to both singles
    from tdr.rank import rrf_fuse

    res_doc = doc_router.retrieve(q_ev, l_ev, k=10)
    rrf_recall = recall_at_k(rrf_fuse([res_doc, res2], k=10), p_ev, 10)
    out.update({
        "sentence_lm_cascade_qps": round(sent_queries / dt2, 1),
        "sentence_lm_cascade_recall_at_10": round(
            recall_at_k(res2, p_ev, 10), 4),
        # stage-1 diagnostics: BM25-order recall@10 (is the re-rank a win?)
        # and the full candidate-set recall — the ceiling ANY re-ranker of
        # these candidates could reach
        "sentence_bm25_only_recall_at_10": round(
            recall_at_k(s1, p_ev, 10), 4),
        "sentence_candidate_ceiling_recall": round(
            recall_at_k(s1, p_ev, max(len(r) for r in s1)), 4),
        "doc_bm25_recall_at_10": round(recall_at_k(res_doc, p_ev, 10), 4),
        "rrf_doc_cascade_recall_at_10": round(rrf_recall, 4),
        "sentence_fusion_alpha": lm.fusion_alpha,
        "sentence_doc_agg_weight": lm.doc_agg_weight,
        "sentence_encoder_loss_curve": train_metrics.get("loss_curve"),
        "sentence_train_queries": len(mined.queries),
        "sentence_train_pseudo_queries": len(pqs.queries),
        "sentence_mined_negatives": True,
        "sentence_mine_sec": round(mine_s, 1),
        "sentence_alpha_dev_curve": {str(a): round(r, 4)
                                     for a, r in curve.items()},
        "sentence_index_build_sec": round(sent_build_s, 1),
        "sentence_embed_once_sec": round(embed_s, 1),
        "n_sentences": len(sb.texts),
        "sentence_n_docs": sent_docs,
        "sentence_n_queries": sent_queries,
    })
    return out


def _vocab_stress_bench(peak_gbps: float) -> dict:
    """Reference-scale VOCABULARY benchmark (VERDICT r3 #3): the default
    synthetic corpus's 4000-term vocab lets the waterfill saturate en at a
    full-vocab head, so the tail CSR, the Pallas segment-DMA compactor and
    the head/tail split never carry load in the headline numbers.  This
    section rebuilds the 7-language corpus with ``vocab_stress=True`` (en
    realizes >=200k unigram index terms; the latin languages' bigram
    augmentation inflates their realized vocabs toward the reference's
    208-pickle-shard en regime, final_implementation.py:228) and reports:

    * the waterfill allocation under real pressure (no language saturates);
    * per-language head coverage + tail shape (head_covers_vocab must be
      FALSE on en — the whole point);
    * the en kernel roofline with the tail compactor ON-path;
    * end-to-end qps + recall at this vocabulary scale;
    * vocab-TP sizing at 8 shards (per-device head HBM, and the head
      coverage an 8-chip aggregate budget would buy).

    Scale via TDR_BENCH_STRESS_DOCS / TDR_BENCH_STRESS_QUERIES."""
    import time

    import jax
    import numpy as np

    from tdr.data import synthetic_corpus, SyntheticSpec
    from tdr.eval import recall_at_k
    from tdr.models import BM25Model
    from tdr.rank import LanguageRouter, build_language_models
    from tdr.utils.config import IndexConfig
    from tdr.utils.trace import log

    n_docs = int(os.environ.get("TDR_BENCH_STRESS_DOCS", 268_022))
    n_queries = int(os.environ.get("TDR_BENCH_STRESS_QUERIES", 500))
    head_budget = int(os.environ.get("TDR_HEAD_BUDGET", 1 << 32))

    t0 = time.perf_counter()
    corpus, queries = synthetic_corpus(SyntheticSpec(
        n_docs=n_docs, n_queries=n_queries, seed=11, hard=True,
        vocab_stress=True))
    gen_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    models = build_language_models(
        corpus, BM25Model, index_cfg=IndexConfig(head_budget_bytes=head_budget))
    build_s = time.perf_counter() - t0
    per_lang = {}
    for l, m in sorted(models.items()):
        idx = m.index
        per_lang[l] = {
            "vocab": int(m.vocab.size),
            "head": int(idx.head_size),
            "head_coverage": round(idx.head_size / max(m.vocab.size, 1), 4),
            "head_bytes": int(np.prod(idx.head_rows.shape)
                              * idx.head_rows.dtype.itemsize),
            "tail_pmax": int(idx.tail_pmax),
        }
    log.info("vocab-stress build: %.1fs, per-lang %s", build_s, per_lang)
    # at smoke scales (few thousand docs) the N axis is short enough that
    # the budget covers even a 250k-slot head; the claim this section
    # exists to prove only binds at reference document counts
    at_scale = n_docs >= 100_000
    if at_scale:
        assert per_lang["en"]["head"] < per_lang["en"]["vocab"], \
            "stress corpus failed to exceed the en head budget"

    router = LanguageRouter(models, query_batch=256)
    for l in sorted(set(queries.langs)):
        i = queries.langs.index(l)
        router.retrieve([queries.queries[i]], [l], k=10)
    router.retrieve(queries.queries, queries.langs, k=10)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = router.retrieve(queries.queries, queries.langs, k=10)
        jax.block_until_ready(jax.numpy.zeros(()))
        times.append(time.perf_counter() - t0)
    times.sort()
    recall = recall_at_k(res, queries.positive_docs, 10)

    roofline = _kernel_roofline(models["en"], batch=256, peak_gbps=peak_gbps)
    if at_scale:
        assert roofline["head_covers_vocab"] is False

    # HYBRID vocab-TP on the tail-bearing stress en index (round 5: the r4
    # section was sizing arithmetic dressed as measurement — now the hybrid
    # engine RUNS on this index).  One real chip means one shard here: the
    # full shard_map path executes (slot-sharded head matmul, psum_scatter,
    # per-device tail scatter, all_gather merge) and is timed against the
    # single-chip fused engine; 8-way EXECUTION is validated on the virtual
    # CPU mesh (MULTICHIP dryrun step 5c + tests/test_vocab_tp.py), and the
    # 8-way per-device layout below is the sharder's own shape math
    # (vocab_shard_layout, equality-tested against materialized shards).
    def _tp_section():
        import jax.numpy as jnp

        from tdr.ops.score import score_and_topk_fused
        from tdr.parallel import make_mesh
        from tdr.parallel.vocab_tp import (
            vocab_shard_index, vocab_shard_layout, vocab_tp_score_topk)

        en_model = models["en"]
        en = en_model.index
        vindex = vocab_shard_index(en, 1)
        # at smoke scales the stress corpus may still fit a full head; the
        # hybrid flag records which engine actually ran
        hybrid = vindex.tail_index is not None
        if at_scale:
            assert hybrid, "stress en must be hybrid at reference scale"
        mesh = make_mesh(model=1)
        Qb, T = 256, en_model.max_query_terms
        rng = np.random.RandomState(5)
        n_rep = 32
        tb = []
        for _ in range(n_rep + 1):
            qids = rng.randint(0, en.vocab_size, (Qb, T)).astype(np.int32)
            qw = np.zeros((Qb, T), np.float32)
            qw[:, :6] = 1.0
            tb.append((jnp.asarray(qids), jnp.asarray(qw)))
        fn = lambda b: vocab_tp_score_topk(mesh, vindex, b[0], b[1], top_k=10,
                                           tail_budget=en_model.tail_budget)
        jax.block_until_ready(fn(tb[-1]))
        t0 = time.perf_counter()
        outs = [fn(b) for b in tb[:n_rep]]
        jax.block_until_ready(outs)
        dt_tp = (time.perf_counter() - t0) / n_rep
        # exactness vs the single-chip fused engine on the same batch
        ref = score_and_topk_fused(en, tb[0][0], tb[0][1], top_k=10,
                                   tail_budget=en_model.tail_budget,
                                   tail_engine=en_model._resolved_tail_engine())
        r_tp = np.asarray(outs[0][1])
        r_ref = np.asarray(ref[1])
        overlap = float(np.mean([len(set(a) & set(b)) / 10.0
                                 for a, b in zip(r_tp, r_ref)]))
        out = {
            "hybrid_tp_runs_on_tail_bearing_index": hybrid,
            "tp1_onchip_kernel_ms_per_batch": round(dt_tp * 1e3, 2),
            "tp1_onchip_qps": round(Qb / dt_tp, 1),
            "tp1_top10_overlap_vs_fused": round(overlap, 4),
            "tp1_per_device_bytes": vindex.per_device_bytes(),
            "tp8_layout": vocab_shard_layout(en, 8),
            "tp8_execution": "8-way hybrid validated on virtual CPU mesh "
                             "(dryrun step 5c; tests/test_vocab_tp.py)",
        }
        del vindex, tb, outs
        return out

    tp = _section("stress_vocab_tp", _tp_section)
    out = {
        "stress_n_docs": n_docs,
        "stress_n_queries": n_queries,
        "stress_gen_sec": round(gen_s, 1),
        "stress_build_sec": round(build_s, 1),
        "stress_qps": round(n_queries / times[len(times) // 2], 1),
        "stress_retrieve_sec": [round(t, 3) for t in times],
        "stress_recall_at_10": round(recall, 4),
        "stress_per_lang": per_lang,
        "stress_kernel_roofline_en": roofline,
        "stress_vocab_tp": tp,
    }
    log.info("vocab-stress bench: %s", out)
    return out


def _latency_bench(router, queries, n: int = 30) -> dict:
    """Single-query serving latency, decomposed (VERDICT r2 #6).

    Reports the bare backend round-trip floor — one no-op dispatch plus a
    1-element device→host pull, which on the axon tunnel is a 30-50 ms RPC
    — so `p50 − floor` isolates the framework's own per-request overhead
    (tokenize + encode + padded scoring kernel + result decode)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    # backend floor: dispatch a trivial kernel on fresh input and pull the
    # scalar result (fresh input per call defeats the backend's dispatch
    # memoization)
    noop = jax.jit(lambda x: x + 1.0)
    np.asarray(noop(jnp.zeros((), jnp.float32)))  # warm/compile
    floors = []
    for i in range(n):
        t0 = time.perf_counter()
        np.asarray(noop(jnp.float32(i)))
        floors.append(time.perf_counter() - t0)
    floors.sort()
    floor_p50 = floors[len(floors) // 2]

    samples = []
    for i in range(min(n, len(queries.queries))):
        t0 = time.perf_counter()
        router.retrieve([queries.queries[i]], [queries.langs[i]], k=10)
        samples.append(time.perf_counter() - t0)
    samples.sort()
    p50 = samples[len(samples) // 2]

    # Q=1 kernel share (VERDICT r3 #6 decomposition, r4 #5 fix): the
    # serving path now routes small batches to the per-term ROW-GATHER
    # head engine (SparseModel.small_q_threshold) — a single query reads
    # ~6 head rows instead of the whole (D, N) matrix.  Time BOTH engines
    # pipelined on the largest partition: kernel_q1_ms is what serving
    # pays (gather), kernel_q1_matmul_ms is the r4 baseline it replaced;
    # p50 − floor − kernel isolates the ACTUAL framework overhead
    # (tokenize + encode + pack + result decode).
    from tdr.ops.score import score_and_topk_fused

    big = max(router.models, key=lambda l: router.models[l].index.n_docs)
    model = router.models[big]
    index = model.index
    rng = np.random.RandomState(3)
    T = model.max_query_terms
    engine = model._resolved_tail_engine()
    kb = []
    for _ in range(33):
        qids = jnp.asarray(rng.randint(0, index.vocab_size, (1, T)), jnp.int32)
        qw = jnp.zeros((1, T), jnp.float32).at[:, :6].set(1.0)
        kb.append((qids, qw))

    def _time_q1(head_engine):
        kfn = lambda b: score_and_topk_fused(index, b[0], b[1], top_k=10,
                                             tail_budget=model.tail_budget,
                                             tail_engine=engine,
                                             head_engine=head_engine)
        jax.block_until_ready(kfn(kb[-1]))
        t0 = time.perf_counter()
        outs = [kfn(b) for b in kb[:32]]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / 32

    kernel_q1 = _time_q1("gather")     # what serving actually runs
    kernel_q1_mm = _time_q1("matmul")  # the r4 full-head baseline

    return {
        "single_query_p50_ms": round(p50 * 1e3, 1),
        "single_query_p90_ms": round(samples[int(len(samples) * 0.9)] * 1e3, 1),
        "backend_floor_p50_ms": round(floor_p50 * 1e3, 1),
        "framework_overhead_p50_ms": round((p50 - floor_p50) * 1e3, 1),
        "kernel_q1_ms": round(kernel_q1 * 1e3, 2),
        "kernel_q1_matmul_ms": round(kernel_q1_mm * 1e3, 2),
        "framework_minus_kernel_p50_ms": round(
            (p50 - floor_p50 - kernel_q1) * 1e3, 1),
        "latency_samples": len(samples),
    }


def _dense_search_bench(n_docs: int = 262_144, dim: int = 256,
                        batch: int = 256, peak_tflops: float = 197.0,
                        n_rep: int = 64) -> dict:
    """Dense (embedding) search throughput on the MXU: brute-force flat
    top-10 over synthetic-random embeddings (search cost is independent of
    embedding quality) + approx_max_k + IVF at nlist=512/nprobe=16.

    Timing: n_rep DISTINCT device-generated query batches, one sync (the
    trusted methodology, tdr/ops/topk.py + CLAUDE.md — fresh inputs defeat
    dispatch memoization, and at n_rep=8 the trailing-sync RPC inflated
    every per-batch reading by ~3 ms: r2's 6.43 ms exact is 3.3 ms).

    approx_max_k is the TPU PartialReduce custom call — the brute-force
    analogue of FAISS's approximate modes: every document is still scored
    on the MXU; only the top-k selection is approximate.  Its measured
    top-10 overlap vs the exact engine is reported next to the speed."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdr.models.dense import (
        build_flat_index, build_ivf_index, flat_search, ivf_search)

    n_docs = int(os.environ.get("TDR_BENCH_DENSE_DOCS", n_docs))
    n_rep = int(os.environ.get("TDR_BENCH_DENSE_REPS", n_rep))
    rng = np.random.RandomState(0)
    emb = rng.randn(n_docs, dim).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    flat = build_flat_index(emb)
    make_q = jax.jit(lambda key: jax.random.normal(key, (batch, dim),
                                                   jnp.float32))
    keys = jax.random.split(jax.random.PRNGKey(7), n_rep)
    qs = [make_q(k) for k in keys]
    jax.block_until_ready(qs)

    # timing: this tunnel's block_until_ready EARLY-ACKS (round-5 probe:
    # dispatch+block of 64 distinct batches returned in 0.24 ms/call while
    # the actual work surfaced only at data-pull time), so every timed
    # region ends with a device-side checksum of ALL outputs pulled to
    # host — work cannot be acked away.  The one pull RPC (~25 ms)
    # amortizes over len(qs) calls.
    pack = jax.jit(lambda vs: jnp.stack([v.sum() for v in vs]).sum())

    def timed(fn):
        float(np.asarray(pack([fn(qs[-1])[0], fn(qs[-2])[0]])))  # warm
        t0 = time.perf_counter()
        outs = [fn(q) for q in qs]
        float(np.asarray(pack([o[0] for o in outs])))
        return (time.perf_counter() - t0) / len(qs)

    dt = timed(lambda q: flat_search(flat, q, 10))          # auto: fused on TPU
    dt_xla = timed(lambda q: flat_search(flat, q, 10, engine="xla"))
    dt_ap = timed(lambda q: flat_search(flat, q, 10, approx=True))
    from tdr.models.dense import _resolve_flat_engine
    engine = _resolve_flat_engine(flat, 10, False, "auto")
    # approx quality: mean top-10 overlap vs exact on one batch
    _, r_ex = flat_search(flat, qs[0], 10)
    _, r_xla = flat_search(flat, qs[0], 10, engine="xla")
    _, r_ap = flat_search(flat, qs[0], 10, approx=True)
    r_ex, r_xla, r_ap = np.asarray(r_ex), np.asarray(r_xla), np.asarray(r_ap)
    overlap = float(np.mean([len(set(r_ex[i]) & set(r_ap[i])) / 10.0
                             for i in range(batch)]))
    overlap_xla = float(np.mean([len(set(r_ex[i]) & set(r_xla[i])) / 10.0
                                 for i in range(batch)]))

    flops = 2.0 * batch * n_docs * dim
    n_pad = int(flat.embeddings.shape[0])
    if engine == "xla":
        # read the bf16 doc matrix once, write the f32 score matrix, read
        # it back for the top-k custom call
        model_bytes = n_pad * dim * 2 + 2 * batch * n_pad * 4
    else:
        # fused engine (tdr/ops/pallas_flat.py): the score matrix never
        # lands in HBM — emb read + per-8-doc maxima write + transposed
        # re-read + the k*8-row rescore gather
        model_bytes = (n_pad * dim * 2 + 2 * (n_pad // 8) * batch * 4
                       + batch * 10 * 8 * dim * 2)
    peak_gbps = float(os.environ.get("TDR_PEAK_GBPS", 819.0))
    floor = max(model_bytes / (peak_gbps * 1e9), flops / (peak_tflops * 1e12))
    out = {
        "dense_flat_engine": engine,
        "dense_flat_qps": round(batch / dt, 1),
        "dense_flat_ms_per_batch": round(dt * 1e3, 2),
        "dense_flat_mfu": round(flops / dt / (peak_tflops * 1e12), 4),
        "dense_flat_model_bytes": int(model_bytes),
        "dense_flat_floor_ms": round(floor * 1e3, 2),
        "dense_flat_roofline_frac": round(floor / dt, 3),
        "dense_flat_xla_ms_per_batch": round(dt_xla * 1e3, 2),
        "dense_flat_fused_vs_xla_top10_overlap": round(overlap_xla, 4),
        # the r4 target was stated against the MATERIALIZED-scores byte
        # model (floor 0.82 ms at this shape): keep that frac comparable
        "dense_flat_frac_of_xla_model_floor": round(
            (n_pad * dim * 2 + 2 * batch * n_pad * 4)
            / (peak_gbps * 1e9) / dt, 3),
        "dense_flat_approx_qps": round(batch / dt_ap, 1),
        "dense_flat_approx_ms_per_batch": round(dt_ap * 1e3, 2),
        "dense_flat_approx_mfu": round(flops / dt_ap / (peak_tflops * 1e12), 4),
        "dense_flat_approx_top10_overlap": round(overlap, 4),
        "dense_n_docs": n_docs,
        "dense_dim": dim,
        "dense_timing_reps": n_rep,
    }

    # int8 (SQ8) flat A/B: int8×int8→int32 MXU matmul, per-query × per-doc
    # dequantization on the output (FAISS IndexScalarQuantizer analogue)
    flat8 = build_flat_index(emb, dtype="int8")
    dt_8 = timed(lambda q: flat_search(flat8, q, 10))
    dt_8ap = timed(lambda q: flat_search(flat8, q, 10, approx=True))
    _, r_8 = flat_search(flat8, qs[0], 10)
    r_8 = np.asarray(r_8)
    overlap8 = float(np.mean([len(set(r_ex[i]) & set(r_8[i])) / 10.0
                              for i in range(batch)]))
    out.update({
        "dense_flat_int8_qps": round(batch / dt_8, 1),
        "dense_flat_int8_ms_per_batch": round(dt_8 * 1e3, 2),
        "dense_flat_int8_top10_overlap": round(overlap8, 4),
        "dense_flat_int8_approx_qps": round(batch / dt_8ap, 1),
        "dense_flat_int8_approx_ms_per_batch": round(dt_8ap * 1e3, 2),
    })
    del flat8

    ivf = build_ivf_index(emb, nlist=512)
    dt_ivf = timed(lambda q: ivf_search(ivf, q, 10, nprobe=16))
    out["dense_ivf_qps_nprobe16"] = round(batch / dt_ivf, 1)
    _, r_ivf = ivf_search(ivf, qs[0], 10, nprobe=16)
    r_ivf = np.asarray(r_ivf)
    del ivf
    # IVF+SQ8: quantized bucket entries quarter the probed-gather bytes
    # (the IVF bottleneck — see ARCHITECTURE crossover note).  Quality is
    # reported next to the speed (CLAUDE.md: every perf knob ships with a
    # recall/overlap recheck): overlap vs the f32 IVF at the same nprobe.
    ivf8 = build_ivf_index(emb, nlist=512, dtype="int8")
    dt_ivf8 = timed(lambda q: ivf_search(ivf8, q, 10, nprobe=16))
    _, r_ivf8 = ivf_search(ivf8, qs[0], 10, nprobe=16)
    r_ivf8 = np.asarray(r_ivf8)
    out["dense_ivf_sq8_qps_nprobe16"] = round(batch / dt_ivf8, 1)
    out["dense_ivf_sq8_top10_overlap"] = round(float(np.mean(
        [len(set(r_ivf[i]) & set(r_ivf8[i])) / 10.0
         for i in range(batch)])), 4)
    return out


def _ivf_crossover_bench(n_docs: int = None, nlist: int = None,
                         rep: int = None, batches=(32, 256)) -> dict:
    """VERDICT r4 #7: locate the flat-vs-IVF crossover with a measurement
    instead of the ARCHITECTURE note's assertion.

    Dense-only synthetic at TDR_BENCH_IVF_DOCS (default 2^21 ≈ 2.1M) docs
    x 256-dim, generated ON DEVICE as a mixture of clusters (docs =
    normalized center + noise): iid-gaussian embeddings are the degenerate
    no-structure case where IVF can only lose; real sentence embeddings
    cluster, and the mixture gives k-means real structure, like FAISS's
    own benchmark corpora.  Ground truth = the exact flat engine.

    The crossover is BATCH-dependent: flat's one matrix read amortizes
    over the whole query batch, while IVF's probed-bucket gather scales
    with Q — flat reads N·D bytes/batch, IVF ~ Q·nprobe·bucket_pad·D.  So
    the section reports both a serving-ish batch (32) and the bench batch
    (256) across nprobe, with recall@10 against exact."""
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdr.models.dense import (build_ivf_index_device, flat_search,
                                  ivf_search)

    n_docs = n_docs or int(os.environ.get("TDR_BENCH_IVF_DOCS", 1 << 21))
    dim = 256
    nlist = nlist or int(os.environ.get("TDR_BENCH_IVF_NLIST", 4096))
    n_clusters = nlist
    rep = rep or int(os.environ.get("TDR_BENCH_IVF_REPS", 16))

    @partial(jax.jit, static_argnames=("n", "d", "c"))
    def gen(key, n, d, c):
        kc, kn, ka = jax.random.split(key, 3)
        centers = jax.random.normal(kc, (c, d), jnp.float32)
        centers /= jnp.linalg.norm(centers, axis=1, keepdims=True)
        assign = jax.random.randint(ka, (n,), 0, c)
        # per-coordinate noise 0.05 -> noise NORM ~ 0.05*sqrt(d) = 0.8 of
        # the unit center: moderate clusters (a 0.35 coefficient would give
        # noise norm 5.6 - pure noise, the degenerate case again)
        e = centers[assign] + 0.05 * jax.random.normal(kn, (n, d), jnp.float32)
        e /= jnp.linalg.norm(e, axis=1, keepdims=True)
        return e.astype(jnp.bfloat16), centers

    t0 = time.perf_counter()
    emb, centers = gen(jax.random.PRNGKey(0), n_docs, dim, n_clusters)
    jax.block_until_ready(emb)
    gen_s = time.perf_counter() - t0

    # flat indexes share the device-resident matrix (no host round trip)
    from tdr.models.dense import FlatIndex
    flat16 = FlatIndex(embeddings=emb, n_docs=n_docs, metric="ip")

    t0 = time.perf_counter()
    ivf = build_ivf_index_device(emb, nlist=nlist, iters=8, dtype="int8")
    jax.block_until_ready(ivf.buckets)
    ivf_build_s = time.perf_counter() - t0

    @partial(jax.jit, static_argnames=("q",))
    def make_q(key, q):
        kc, kn = jax.random.split(key)
        pick = jax.random.randint(kc, (q,), 0, n_clusters)
        e = centers[pick] + 0.05 * jax.random.normal(kn, (q, dim), jnp.float32)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    out: dict = {"ivf_n_docs": n_docs, "ivf_dim": dim, "ivf_nlist": nlist,
                 "ivf_bucket_pad": ivf.bucket_pad,
                 "ivf_gen_sec": round(gen_s, 1),
                 "ivf_build_sec": round(ivf_build_s, 1),
                 "ivf_bucket_max_over_mean": round(
                     ivf.bucket_pad / (n_docs / nlist), 2)}
    for Qb in batches:
        keys = jax.random.split(jax.random.PRNGKey(5), rep + 1)
        qs = [make_q(k, Qb) for k in keys]
        jax.block_until_ready(qs)

        def timed(fn):
            jax.block_until_ready(fn(qs[-1]))
            t0 = time.perf_counter()
            outs = [fn(x) for x in qs[:rep]]
            jax.block_until_ready(outs)
            return (time.perf_counter() - t0) / rep

        dt_flat = timed(lambda x: flat_search(flat16, x, 10))
        exact = [np.asarray(flat_search(flat16, x, 10)[1]) for x in qs[:2]]
        sec = {"flat_exact_qps": round(Qb / dt_flat, 1),
               "flat_exact_ms": round(dt_flat * 1e3, 2)}
        for nprobe in (4, 8, 16, 32):
            dt = timed(lambda x, p=nprobe: ivf_search(ivf, x, 10, nprobe=p))
            got = [np.asarray(ivf_search(ivf, x, 10, nprobe=nprobe)[1])
                   for x in qs[:2]]
            rec = float(np.mean([
                len(set(g) & set(e)) / 10.0
                for G, E in zip(got, exact) for g, e in zip(G, E)]))
            sec[f"ivf_np{nprobe}_qps"] = round(Qb / dt, 1)
            sec[f"ivf_np{nprobe}_ms"] = round(dt * 1e3, 2)
            sec[f"ivf_np{nprobe}_recall_vs_exact"] = round(rec, 4)
        out[f"batch_{Qb}"] = sec
    return out


def _real_text_bench() -> dict:
    """The only NON-synthetic recall numbers in the bench (VERDICT r4 #8):
    the checked-in real-text multilingual eval (tdr/data/realtext.py — 140
    original encyclopedic paragraphs / 70 keyword queries across the seven
    reference languages) through the standard build + router path.

    At 20 docs per language recall@10 is near-saturated by construction;
    the informative numbers are recall@1 and MRR@10 — real morphology,
    stopword density, and query-document vocabulary mismatch are exactly
    what the synthetic corpora cannot exercise.  The reference's own
    real-data headline is recall@10 on 268k docs
    (/root/reference/README.md:7-9); this section does not claim that
    scale, it removes the '100% of recall numbers are synthetic' caveat."""
    from tdr.data.loaders import Corpus
    from tdr.data.realtext import real_eval_corpus
    from tdr.eval import recall_at_k
    from tdr.eval.metrics import mrr_at_k
    from tdr.models import BM25Model
    from tdr.rank import LanguageRouter, build_language_models

    docs, docids, dlangs, queries, qlangs, positives = real_eval_corpus()
    corpus = Corpus(docids, docs, dlangs)
    models = build_language_models(corpus, BM25Model)
    router = LanguageRouter(models, query_batch=16)
    res = router.retrieve(queries, qlangs, k=10)
    per_lang = {}
    for l in sorted(set(qlangs)):
        idx = [i for i, x in enumerate(qlangs) if x == l]
        per_lang[l] = round(recall_at_k([res[i][:1] for i in idx],
                                        [positives[i] for i in idx], 1), 3)
    return {
        "n_docs": len(docs),
        "n_queries": len(queries),
        "recall_at_1": round(recall_at_k([r[:1] for r in res],
                                         positives, 1), 4),
        "recall_at_10": round(recall_at_k(res, positives, 10), 4),
        "mrr_at_10": round(mrr_at_k(res, positives, 10), 4),
        "recall_at_1_per_lang": per_lang,
    }


def main() -> None:
    _probe_backend()   # fail fast + clean if the TPU tunnel is down

    from tdr.utils.jax_cache import enable as enable_jax_cache

    enable_jax_cache()
    import jax

    # The environment's sitecustomize registers the axon TPU plugin and
    # overrides the JAX_PLATFORMS env var; re-assert it so smoke runs
    # (JAX_PLATFORMS=cpu python bench.py) actually stay off the TPU.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from tdr.data import synthetic_corpus, SyntheticSpec
    from tdr.models import BM25Model
    from tdr.rank import LanguageRouter, build_language_models
    from tdr.eval import recall_at_k
    from tdr.utils.config import IndexConfig
    from tdr.utils.trace import log

    n_docs = int(os.environ.get("TDR_BENCH_DOCS", 268_022))
    n_queries = int(os.environ.get("TDR_BENCH_QUERIES", 2000))
    peak_gbps = float(os.environ.get("TDR_PEAK_GBPS", 819.0))

    log.info("bench: %d docs, %d queries, devices=%s", n_docs, n_queries, jax.devices())
    t0 = time.perf_counter()
    corpus, queries = synthetic_corpus(
        SyntheticSpec(n_docs=n_docs, n_queries=n_queries, seed=42, hard=True)
    )
    gen_s = time.perf_counter() - t0
    log.info("synthetic corpus generated in %.1fs", gen_s)

    # 4 GB total head budget: the waterfill split (router.py) saturates en
    # at full-vocab coverage (~2.1 GB -> empty tail, pure-MXU scoring) and
    # pours the surplus over the bigram-inflated latin vocabs; total index
    # HBM stays ~5 GB of the chip's 16.
    head_budget = int(os.environ.get("TDR_HEAD_BUDGET", 1 << 32))
    t0 = time.perf_counter()
    models = build_language_models(
        corpus, BM25Model,
        index_cfg=IndexConfig(head_budget_bytes=head_budget),
    )
    build_s = time.perf_counter() - t0
    log.info("index build (host preprocess + device build): %.1fs", build_s)

    query_batch = int(os.environ.get("TDR_QUERY_BATCH", 256))
    router = LanguageRouter(models, query_batch=query_batch)

    # warmup: one padded batch per language compiles the single query
    # shape, then one FULL pass compiles the result-gather stack (its
    # shape depends on the total batch count)
    for l in sorted(set(queries.langs)):
        i = queries.langs.index(l)
        router.retrieve([queries.queries[i]], [l], k=10)
    router.retrieve(queries.queries, queries.langs, k=10)

    # median of n_timed full passes (VERDICT r2 #2: the headline must be
    # the captured artifact with its variance visible, not a best manual run)
    n_timed = int(os.environ.get("TDR_BENCH_REPS", 5))
    times = []
    for _ in range(n_timed):
        t0 = time.perf_counter()
        results = router.retrieve(queries.queries, queries.langs, k=10)
        jax.block_until_ready(jax.numpy.zeros(()))
        times.append(time.perf_counter() - t0)
    elapsed = median_time(times)
    times.sort()

    qps = n_queries / elapsed
    recall = recall_at_k(results, queries.positive_docs, 10)
    log.info("retrieval: median %.2fs of %s for %d queries -> %.1f qps "
             "(hard recall@10=%.3f)",
             elapsed, [round(t, 2) for t in times], n_queries, qps, recall)
    from tdr.eval import evaluate_retrieval

    eval_report = evaluate_retrieval(results, queries.positive_docs,
                                     queries.langs, ks=(1, 5, 10))
    log.info("eval report: %s", eval_report)

    # spell-correction A/B (tdr.text.spell trigram OOV repair, opt-in on
    # the model): one extra full pass with repairs on — recall delta and
    # the host cost are reported; the headline keeps the reference-parity
    # drop-unknown-terms pipeline
    def _spell_section():
        import dataclasses as _dc

        router_sc = LanguageRouter(
            {l: _dc.replace(m, spell_correct=True) for l, m in models.items()},
            query_batch=query_batch)
        t0 = time.perf_counter()
        res_sc = router_sc.retrieve(queries.queries, queries.langs, k=10)
        spell_cold = time.perf_counter() - t0   # includes repairer builds
        t0 = time.perf_counter()
        res_sc = router_sc.retrieve(queries.queries, queries.langs, k=10)
        spell_warm = time.perf_counter() - t0
        out = {
            "spell_recall_at_10": round(
                recall_at_k(res_sc, queries.positive_docs, 10), 4),
            "spell_retrieve_sec_warm": round(spell_warm, 2),
            "spell_repairer_build_sec": round(spell_cold - spell_warm, 1),
        }
        log.info("spell-correct A/B: %s (baseline recall %0.4f)", out, recall)
        return out

    spell = {}
    if os.environ.get("TDR_BENCH_SPELL", "1") == "1":
        spell = _section("spell", _spell_section)

    # RM3 pseudo-relevance feedback A/B (tdr.rank.feedback, opt-in on the
    # model): first pass mines top-F docs for expansion terms, one
    # re-score with interpolated weights.  Reported alone AND stacked with
    # spell (the two compose: spell fixes OOV query terms, feedback adds
    # the target's co-occurring terms the query never had).
    def _prf_section():
        import dataclasses as _dc

        router_prf = LanguageRouter(
            {l: _dc.replace(m, prf=True) for l, m in models.items()},
            query_batch=query_batch)
        t0 = time.perf_counter()
        res_prf = router_prf.retrieve(queries.queries, queries.langs, k=10)
        prf_cold = time.perf_counter() - t0    # includes doc-major builds
        t0 = time.perf_counter()
        res_prf = router_prf.retrieve(queries.queries, queries.langs, k=10)
        prf_warm = time.perf_counter() - t0
        router_both = LanguageRouter(
            {l: _dc.replace(m, prf=True, spell_correct=True)
             for l, m in models.items()},
            query_batch=query_batch)
        router_both.retrieve(queries.queries[:1], queries.langs[:1], k=10)
        res_both = router_both.retrieve(queries.queries, queries.langs, k=10)
        out = {
            "prf_recall_at_10": round(
                recall_at_k(res_prf, queries.positive_docs, 10), 4),
            "prf_spell_recall_at_10": round(
                recall_at_k(res_both, queries.positive_docs, 10), 4),
            "prf_retrieve_sec_warm": round(prf_warm, 2),
            # one-time: doc-major host build + the prf_expand / widened
            # second-pass jit compiles (the compiles dominate on the
            # tunnel's remote compiler; persistent-cached afterwards)
            "prf_first_pass_onetime_sec": round(prf_cold - prf_warm, 1),
        }
        log.info("prf A/B: %s (baseline recall %0.4f)", out, recall)
        return out

    prf = {}
    if os.environ.get("TDR_BENCH_PRF", "1") == "1":
        prf = _section("prf", _prf_section)

    # end-to-end FAST profile: int8 scalar-quantized heads + approx_max_k
    # head selection on every model (the two config knobs stacked), same
    # queries — reported with ITS OWN recall next to the exact headline
    def _fast_section():
        import dataclasses as _dc

        from tdr.index import quantize_head

        models_fast = {
            l: _dc.replace(m, index=quantize_head(m.index),
                           topk_mode="approx")
            for l, m in models.items()}
        router_fast = LanguageRouter(models_fast, query_batch=query_batch)
        for l in sorted(set(queries.langs)):
            i = queries.langs.index(l)
            router_fast.retrieve([queries.queries[i]], [l], k=10)
        router_fast.retrieve(queries.queries, queries.langs, k=10)
        fast_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res_fast = router_fast.retrieve(queries.queries, queries.langs,
                                            k=10)
            jax.block_until_ready(jax.numpy.zeros(()))
            fast_times.append(time.perf_counter() - t0)
        fast_times.sort()
        out = {
            "fast_profile": "int8 head + approx_max_k selection",
            "fast_qps": round(n_queries / fast_times[1], 1),
            "fast_retrieve_sec": round(fast_times[1], 3),
            "fast_recall_at_10": round(
                recall_at_k(res_fast, queries.positive_docs, 10), 4),
        }
        log.info("fast profile: %s", out)
        return out

    fast = {}
    if os.environ.get("TDR_BENCH_FAST", "1") == "1":
        fast = _section("fast_profile", _fast_section)

    # live-update (segmented) section: wrap the LARGEST partition, add a
    # batch of documents, measure add latency + retrievability + the
    # post-update query pass (proves the Lucene-style segment design at
    # reference scale; tdr/rank/segmented.py)
    def _segmented_section():
        from tdr.rank import SegmentedBM25
        from tdr.text import preprocess_texts

        big = max(models, key=lambda l: models[l].index.n_docs)
        # same index config as the bench build: delta segments must share
        # the main's BM25/index parameters for cross-segment comparability
        seg = SegmentedBM25(main=models[big], lang=big,
                            index_cfg=IndexConfig(head_budget_bytes=head_budget))
        new_texts = [f"freshdoc {i} zyqx{i} kwv{i} live segment update"
                     for i in range(100)]
        new_toks = preprocess_texts(new_texts, [big] * 100)
        t0 = time.perf_counter()
        seg.add_documents(new_toks, [f"live{i}" for i in range(100)])
        add_sec = time.perf_counter() - t0
        hits = sum(
            seg.retrieve_tokens([[f"zyqx{i}"]], k=3)[0][:1] == [f"live{i}"]
            for i in range(0, 100, 10))
        qset = new_toks[:256] * 3

        def _median3(fn):
            fn()                                   # compile + warm
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            ts.sort()
            return ts[1]

        # warm pass-vs-main ratio (VERDICT r4 #6: the monolithic-batch
        # dispatch measured ~10x the main engine; the chunked store rides
        # the router's compile shapes and pulls once)
        seg_query_sec = _median3(lambda: seg.topk_tokens(qset, k=10))
        qb = seg.query_batch

        def _main_pass():
            pend = [models[big].topk_tokens_async(qset[s:s + qb], 10,
                                                  pad_to=qb)
                    for s in range(0, len(qset), qb)]
            from tdr.rank.router import _gather_pending

            _gather_pending([p[0] for p in pend], [p[1] for p in pend])

        main_query_sec = _median3(_main_pass)
        # PRF composed with the live store (round 5: the old model-level
        # refusal replaced by store-orchestrated global RM3)
        seg.prf = True
        seg_prf_sec = _median3(lambda: seg.topk_tokens(qset[:256], k=10))
        seg.prf = False
        out = {
            "segmented_partition": big,
            "segmented_main_docs": models[big].index.n_docs,
            "segmented_add100_sec": round(add_sec, 2),
            "segmented_added_retrievable": f"{hits}/10",
            "segmented_query_pass_sec": round(seg_query_sec, 3),
            "main_same_queries_sec": round(main_query_sec, 3),
            "segmented_vs_main_ratio": round(
                seg_query_sec / max(main_query_sec, 1e-9), 2),
            "segmented_prf_256q_sec": round(seg_prf_sec, 3),
        }
        log.info("segmented live-update: %s", out)
        return out

    seg_metrics = {}
    if os.environ.get("TDR_BENCH_SEGMENTED", "1") == "1":
        seg_metrics = _section("segmented", _segmented_section)

    # roofline on the largest partition
    biggest = max(models, key=lambda l: models[l].index.n_docs)
    roofline = _section("kernel_roofline", lambda: _kernel_roofline(
        models[biggest], batch=256, peak_gbps=peak_gbps))
    log.info("kernel roofline (%s): %s", biggest, roofline)

    latency = _section("latency", lambda: _latency_bench(router, queries))
    log.info("serving latency: %s", latency)

    real_text = {}
    if os.environ.get("TDR_BENCH_REALTEXT", "1") == "1":
        real_text = _section("real_text", _real_text_bench)
        log.info("real-text eval: %s", real_text)

    dense = {}
    if os.environ.get("TDR_BENCH_DENSE", "1") == "1":
        dense = _section("dense_search", _dense_search_bench)
        log.info("dense search bench: %s", dense)

    ivf_xover = {}
    if os.environ.get("TDR_BENCH_IVF_XOVER", "1") == "1":
        ivf_xover = _section("ivf_crossover", _ivf_crossover_bench)
        log.info("ivf crossover bench: %s", ivf_xover)

    cascade = {}
    stress = {}
    run_cascade = os.environ.get("TDR_BENCH_CASCADE", "1") == "1"
    run_stress = os.environ.get("TDR_BENCH_VOCAB_STRESS", "1") == "1"
    if run_cascade or run_stress:
        # these sections build full-partition-scale indexes of their own;
        # release the headline models' HBM first
        del router, models
    if run_cascade:
        cascade = _section("cascades", _cascade_bench)
        log.info("cascade bench: %s", cascade)
    if run_stress:
        stress = _section("vocab_stress",
                          lambda: _vocab_stress_bench(peak_gbps))

    print(json.dumps({
        "metric": "bm25_retrieval_queries_per_sec",
        "value": round(qps, 2),
        "unit": "queries/sec",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
        "extra": {
            "n_docs": n_docs,
            "n_queries": n_queries,
            "hard_recall_at_10": round(recall, 4),
            "eval_report": eval_report,
            "reference_recall_at_10_real_data": BASELINE_RECALL,
            "index_build_sec": round(build_s, 1),
            "retrieve_sec": round(elapsed, 2),
            "kernel_roofline_en": roofline,
            "segmented_updates": seg_metrics,
            "fast_profile": fast,
            "spell_correction": spell,
            "prf": prf,
            "serving_latency": latency,
            "real_text": real_text,
            "dense_search": dense,
            "ivf_crossover": ivf_xover,
            "cascades": cascade,
            "vocab_stress": stress,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:   # noqa: BLE001 — keep the driver tail clean
        import traceback

        traceback.print_exc()    # full trace to stderr for humans
        sys.stderr.flush()
        print(json.dumps({
            "metric": "bm25_retrieval_queries_per_sec",
            "value": None,
            "unit": "queries/sec",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}"[:500],
        }), flush=True)
        sys.exit(1)
