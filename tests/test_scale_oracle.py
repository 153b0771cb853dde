"""Scale oracle-agreement gate (VERDICT r1 #3).

Golden tests elsewhere run on tiny hand-made corpora; this gate checks the
full device pipeline (fused score + top-k over the head/tail score-row
index) against the float64 NaiveBM25 oracle at ~5k docs, where head-budget
capping, bucketing, and bf16 head rows are all actually exercised.
"""

import numpy as np
import pytest

from tdr.data import synthetic_corpus, SyntheticSpec
from tdr.models import BM25Model
from tdr.text import Preprocessor
from tdr.utils.config import IndexConfig

from tests.reference_impl import NaiveBM25

N_DOCS = 5000
N_QUERIES = 50
K = 10


@pytest.fixture(scope="module")
def world():
    corpus, queries = synthetic_corpus(
        SyntheticSpec(n_docs=N_DOCS, n_queries=N_QUERIES, seed=99, hard=True,
                      ref_proportions=False, langs=("en",)))
    pp = Preprocessor("best")
    doc_toks = [pp(t, "en") for t in corpus.texts]
    q_toks = [pp(q, "en") for q in queries.queries]
    # float32 head rows: this gate checks the ALGORITHM against the oracle;
    # the production bf16 head trades ~3e-4 relative score noise for 2x
    # bandwidth and is covered by the looser set-level test below
    model = BM25Model.build(
        doc_toks, corpus.docids, lang="en",
        index_cfg=IndexConfig(head_budget_bytes=1 << 22, head_dtype="float32"))
    oracle = NaiveBM25(doc_toks)
    return model, oracle, q_toks, doc_toks, corpus.docids


def test_device_topk_matches_oracle_at_scale(world):
    model, oracle, q_toks, _, _ = world
    vals, rows = model.topk_tokens(q_toks, k=K)

    disagreements = 0
    for qi, toks in enumerate(q_toks):
        ref_scores = oracle.get_scores(toks)
        ref_order = np.argsort(-ref_scores, kind="stable")
        ref_top = set(int(d) for d in ref_order[:K])
        dev_top = set(int(r) for r in rows[qi])

        # device top-k values must match the oracle's top-k values exactly
        # (up to float32 summation noise)
        np.testing.assert_allclose(
            np.sort(vals[qi])[::-1],
            np.sort(ref_scores[ref_order[:K]])[::-1],
            rtol=2e-4, atol=1e-5,
            err_msg=f"query {qi}: top-k score mismatch")

        if dev_top == ref_top:
            continue
        # set differences are only admissible at a boundary tie: every doc
        # in the symmetric difference must score within eps of the oracle's
        # k-th score
        kth = ref_scores[ref_order[K - 1]]
        for d in dev_top ^ ref_top:
            assert abs(ref_scores[d] - kth) <= 2e-4 * max(1.0, abs(kth)), (
                f"query {qi}: doc {d} disagrees beyond tie tolerance "
                f"(score {ref_scores[d]:.6f} vs kth {kth:.6f})")
        disagreements += 1

    # ties should be rare — a systematic mismatch means a scoring bug
    assert disagreements <= N_QUERIES // 5, (
        f"{disagreements}/{N_QUERIES} queries disagreed with the oracle")


def test_bf16_head_topk_close_to_oracle(world):
    """The production bf16 head must agree with the oracle at the set level
    (score noise ~3e-4 relative can swap near-ties, not real rankings)."""
    _, oracle, q_toks, doc_toks, docids = world
    model = BM25Model.build(
        doc_toks, docids, lang="en",
        index_cfg=IndexConfig(head_budget_bytes=1 << 22))  # default bf16 head
    _, rows = model.topk_tokens(q_toks, k=K)
    for qi, toks in enumerate(q_toks):
        ref_scores = oracle.get_scores(toks)
        ref_order = np.argsort(-ref_scores, kind="stable")
        kth = ref_scores[ref_order[K - 1]]
        dev_top = set(int(r) for r in rows[qi])
        ref_top = set(int(d) for d in ref_order[:K])
        for d in dev_top ^ ref_top:
            assert abs(ref_scores[d] - kth) <= 5e-3 * max(1.0, abs(kth)), (
                f"query {qi}: doc {d} beyond bf16 tie tolerance")


def test_hard_eval_is_not_saturated():
    """The hard benchmark must be able to regress: recall strictly < 1."""
    from tdr.eval import recall_at_k
    from tdr.rank import LanguageRouter, build_language_models

    corpus, queries = synthetic_corpus(
        SyntheticSpec(n_docs=2000, n_queries=300, seed=42, hard=True))
    models = build_language_models(
        corpus, BM25Model, index_cfg=IndexConfig(head_budget_bytes=1 << 22))
    res = LanguageRouter(models, query_batch=64).retrieve(
        queries.queries, queries.langs, k=10)
    r = recall_at_k(res, queries.positive_docs, 10)
    # band, not a point: sensitive to ranking quality but not flaky
    assert 0.55 <= r <= 0.97, f"hard recall@10 = {r}"


def test_hard_eval_per_language_bands():
    """Per-language recall gates (VERDICT r2 #8: the global band can hide a
    language-specific regression, e.g. a broken ko tokenizer or a stemmer
    change nuking one latin language).

    Equal language proportions so every language gets ~100 queries — at the
    reference proportions the non-en partitions draw 5-16 queries each and
    per-language assertions would be pure noise.  Measured at the time of
    writing (seed 42): ar .720  de .781  en .800  es .788  fr .745  it .759
    ko .832, overall .773; binomial sigma at n~100 is ~.045, so a .60 floor
    sits ~3 sigma below the weakest language.

    The residual spread itself is diagnosed in ARCHITECTURE.md ("hard-eval
    per-language spread"): it tracks stemmer aggressiveness under the hard
    mode's typo corruption — aggressive stemmers (it/es/fr merge 10-20% of
    the random-syllable vocab) suffer signature-term collisions, while
    conservative ones (de/en: <0.3%) lose typo'd terms outright; ar/ko skip
    stemming and sit wherever their script's typo char lands.  At reference
    proportions the per-language numbers in BENCH artifacts additionally
    carry +-0.10 of binomial noise (n~60-90/language)."""
    import numpy as np

    from tdr.rank import LanguageRouter, build_language_models

    corpus, queries = synthetic_corpus(
        SyntheticSpec(n_docs=2800, n_queries=700, seed=42, hard=True,
                      ref_proportions=False))
    models = build_language_models(
        corpus, BM25Model, index_cfg=IndexConfig(head_budget_bytes=1 << 22))
    res = LanguageRouter(models, query_batch=128).retrieve(
        queries.queries, queries.langs, k=10)
    hits = [p in r for r, p in zip(res, queries.positive_docs)]
    per = {}
    for h, lang in zip(hits, queries.langs):
        per.setdefault(lang, []).append(h)
    recalls = {lang: float(np.mean(v)) for lang, v in per.items()}
    assert set(recalls) == {"ar", "de", "en", "es", "fr", "it", "ko"}
    for lang, r in sorted(recalls.items()):
        assert r >= 0.60, f"{lang} recall@10 = {r:.3f} (n={len(per[lang])})"
    overall = float(np.mean(hits))
    assert 0.70 <= overall <= 0.92, f"overall hard recall@10 = {overall:.3f}"
