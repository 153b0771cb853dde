"""End-to-end acceptance tests on synthetic multilingual corpora.

Mirrors the reference's dev-set acceptance flow (bm25_ranking.ipynb cells
4-6): build per-language models → retrieve → Recall@10.  Synthetic queries
contain signature terms of their target doc, so a correct BM25 stack must
reach high recall; the TF-IDF cosine path and the cosine→BM25 cascade are
exercised the same way.
"""

import numpy as np
import pytest

from tdr.data import synthetic_corpus, SyntheticSpec
from tdr.eval import evaluate_retrieval, recall_at_k, write_submission, validate_submission
from tdr.models import BM25Model, TfidfCosineModel
from tdr.rank import LanguageRouter, CascadeRetriever, build_language_models
from tdr.text.preprocess import Preprocessor
from tdr.utils.config import IndexConfig

SMALL_INDEX = IndexConfig(doc_pad_multiple=8, nnz_pad_multiple=64,
                          head_budget_bytes=1 << 22)


@pytest.fixture(scope="module")
def small_world():
    corpus, queries = synthetic_corpus(SyntheticSpec(n_docs=400, n_queries=60, seed=11))
    return corpus, queries


@pytest.fixture(scope="module")
def bm25_models(small_world):
    corpus, _ = small_world
    return build_language_models(corpus, BM25Model, index_cfg=SMALL_INDEX)


class TestBM25EndToEnd:
    def test_multilingual_recall(self, small_world, bm25_models):
        corpus, queries = small_world
        router = LanguageRouter(bm25_models, query_batch=32)
        results = router.retrieve(queries.queries, queries.langs, k=10)
        report = evaluate_retrieval(results, queries.positive_docs, queries.langs)
        # signature-term queries must be easy for a correct BM25
        assert report["recall@10"] >= 0.95, report
        assert report["recall@1"] >= 0.8, report
        assert set(report["per_language"]) == set(queries.langs)

    def test_results_in_input_order_and_k_sized(self, small_world, bm25_models):
        _, queries = small_world
        router = LanguageRouter(bm25_models, query_batch=7)  # ragged batches
        results = router.retrieve(queries.queries, queries.langs, k=5)
        assert len(results) == len(queries)
        assert all(len(r) == 5 for r in results)

    def test_batch_size_invariance(self, small_world, bm25_models):
        _, queries = small_world
        r1 = LanguageRouter(bm25_models, query_batch=4).retrieve(
            queries.queries[:20], queries.langs[:20], k=10)
        r2 = LanguageRouter(bm25_models, query_batch=64).retrieve(
            queries.queries[:20], queries.langs[:20], k=10)
        assert r1 == r2

    def test_scores_descending(self, small_world, bm25_models):
        _, queries = small_world
        router = LanguageRouter(bm25_models, query_batch=32)
        _, scores = router.retrieve_with_scores(queries.queries[:10], queries.langs[:10], k=10)
        diffs = np.diff(scores, axis=1)
        assert np.all(diffs <= 1e-6)


class TestCosineAndCascade:
    @pytest.fixture(scope="class")
    def cosine_models(self, small_world):
        corpus, _ = small_world
        return build_language_models(corpus, TfidfCosineModel, index_cfg=SMALL_INDEX)

    def test_cosine_recall(self, small_world, cosine_models):
        _, queries = small_world
        router = LanguageRouter(cosine_models, query_batch=32)
        results = router.retrieve(queries.queries, queries.langs, k=10)
        # cosine is the weakest reference pipeline but synthetic queries are
        # still mostly solvable
        assert recall_at_k(results, queries.positive_docs) >= 0.8

    def test_cascade_beats_or_matches_candidates(self, small_world, cosine_models, bm25_models):
        _, queries = small_world
        cascade = CascadeRetriever(cosine_models, bm25_models, candidates=50,
                                   query_batch=32)
        results = cascade.retrieve(queries.queries, queries.langs, k=10)
        cos_results = LanguageRouter(cosine_models, query_batch=32).retrieve(
            queries.queries, queries.langs, k=10)
        r_cascade = recall_at_k(results, queries.positive_docs)
        r_cos = recall_at_k(cos_results, queries.positive_docs)
        assert r_cascade >= r_cos - 1e-9

    def test_cascade_candidate_subset(self, small_world, cosine_models, bm25_models):
        """Cascade results must come from the stage-1 candidate pool."""
        _, queries = small_world
        cascade = CascadeRetriever(cosine_models, bm25_models, candidates=20,
                                   query_batch=16)
        results = cascade.retrieve(queries.queries[:8], queries.langs[:8], k=10)
        for qi in range(8):
            lang = queries.langs[qi]
            m = cosine_models[lang if lang in cosine_models else "en"]
            toks = [Preprocessor("best")(queries.queries[qi], lang)]
            vals, cand = m.topk_tokens(toks, 20)
            cand_ids = {m.docids[r] for r, v in zip(cand[0], vals[0])
                        if np.isfinite(v) and r < len(m.docids)}
            assert set(results[qi]) <= cand_ids


class TestMetrics:
    def test_recall_and_mrr(self):
        retrieved = [["a", "b", "c"], ["x", "y", "z"], ["q", "r", "s"]]
        pos = ["b", "z", "missing"]
        assert recall_at_k(retrieved, pos, k=3) == pytest.approx(2 / 3)
        assert recall_at_k(retrieved, pos, k=1) == 0.0
        from tdr.eval import mrr_at_k
        assert mrr_at_k(retrieved, pos, k=3) == pytest.approx((1 / 2 + 1 / 3) / 3)

    def test_macro_f1_matches_sklearn_semantics(self):
        """The FAISS path's eval (faiss_based_ANN_Implementation.py:301-303):
        macro F1 over top-1 predictions, classes = labels ∪ predictions."""
        from tdr.eval import macro_f1

        # perfect predictions
        assert macro_f1([["a"], ["b"]], ["a", "b"]) == 1.0
        # one class never predicted (f1=0), one perfect, one spurious (f1=0)
        got = macro_f1([["a"], ["a"], ["c"]], ["a", "b", "a"])
        # classes a,b,c: a: tp=1 fp=1 fn=1 -> f1=0.5; b: 0; c: 0
        assert got == pytest.approx(0.5 / 3)
        # cross-check vs sklearn when available
        try:
            from sklearn.metrics import f1_score
        except ImportError:
            return
        import random

        rng = random.Random(1)
        docs = [f"d{i}" for i in range(9)]
        y_true = [rng.choice(docs) for _ in range(80)]
        y_pred = [rng.choice(docs) for _ in range(80)]
        assert macro_f1([[p] for p in y_pred], y_true) == pytest.approx(
            f1_score(y_true, y_pred, average="macro"))

    def test_submission_roundtrip(self, tmp_path):
        path = str(tmp_path / "submission.csv")
        retrieved = [[f"d{i}-{j}" for j in range(10)] for i in range(5)]
        write_submission(retrieved, path)
        assert validate_submission(path) == []

    def test_submission_validator_catches_problems(self, tmp_path):
        path = str(tmp_path / "bad.csv")
        with open(path, "w") as f:
            f.write("id,docids\n")
            f.write("0,\"['a','b']\"\n")          # wrong k
            f.write("0,\"['a','a','c','d','e','f','g','h','i','j']\"\n")  # dup id + dup docids
        probs = validate_submission(path)
        assert any("expected 10" in p for p in probs)
        assert any("duplicate id" in p for p in probs)
        assert any("duplicate docids" in p for p in probs)

    def test_wide_submission_format(self, tmp_path):
        path = str(tmp_path / "wide.csv")
        retrieved = [[f"d{i}-{j}" for j in range(10)] for i in range(3)]
        write_submission(retrieved, path, wide=True)
        import csv as _csv

        rows = list(_csv.reader(open(path)))
        assert rows[0] == ["id"] + [f"doc_{j+1}" for j in range(10)]
        assert rows[1][1] == "d0-0" and rows[1][10] == "d0-9"
        # ADVICE r1: the validator must understand the wide format too
        assert validate_submission(path) == []

    def test_wide_submission_validator_catches_problems(self, tmp_path):
        path = str(tmp_path / "wide_bad.csv")
        hdr = "id," + ",".join(f"doc_{j+1}" for j in range(10))
        with open(path, "w") as f:
            f.write(hdr + "\n")
            f.write("0," + ",".join(f"d{j}" for j in range(10)) + "\n")
            f.write("0," + ",".join("dup" for _ in range(10)) + "\n")
            f.write("1," + ",".join(f"e{j}" for j in range(9)) + ",\n")
        probs = validate_submission(path)
        assert any("duplicate id" in p for p in probs)
        assert any("duplicate docids" in p for p in probs)
        assert any("expected 10 docids, got 9" in p for p in probs)


def test_ndcg_at_k():
    """nDCG@k (single-positive case): rank-1 scores 1.0, rank-2 scores
    1/log2(3), a miss scores 0; sits between MRR and recall."""
    import math

    from tdr.eval import mrr_at_k, ndcg_at_k, recall_at_k

    retrieved = [["p0", "x"], ["x", "p1"], ["x", "y"]]
    positives = ["p0", "p1", "p2"]
    got = ndcg_at_k(retrieved, positives, k=2)
    want = (1.0 + 1.0 / math.log2(3) + 0.0) / 3
    assert abs(got - want) < 1e-12
    mrr = mrr_at_k(retrieved, positives, 2)
    rec = recall_at_k(retrieved, positives, 2)
    assert mrr <= got <= rec
    assert ndcg_at_k([], [], 5) == 0.0
