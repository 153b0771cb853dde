"""The checked-in real-text multilingual eval (tdr/data/realtext.py):
dataset invariants + end-to-end recall through the standard build/router
path — the non-synthetic recall data point (VERDICT r4 #8)."""

from tdr.data.realtext import LANGS, REAL_DOCS, REAL_QUERIES, real_eval_corpus


def test_dataset_invariants():
    assert LANGS == ("ar", "de", "en", "es", "fr", "it", "ko")
    all_ids = []
    for lang in LANGS:
        docs = REAL_DOCS[lang]
        queries = REAL_QUERIES[lang]
        assert len(docs) == 20, lang
        assert len(queries) == 10, lang
        ids = {d for d, _ in docs}
        assert len(ids) == 20, f"duplicate doc ids in {lang}"
        all_ids.extend(ids)
        for q, target in queries:
            assert target in ids, f"{lang}: query target {target} missing"
            assert q.strip() and len(q.split()) >= 2 or lang == "ko"
        for _, text in docs:
            assert len(text) >= 70, f"{lang}: doc too short"
    assert len(set(all_ids)) == len(all_ids)


def test_targets_unique_per_query():
    # each query names exactly one positive; no two queries in a language
    # share a target (keeps per-language recall interpretable)
    for lang in LANGS:
        targets = [t for _, t in REAL_QUERIES[lang]]
        assert len(set(targets)) == len(targets), lang


def test_real_text_recall_end_to_end():
    """Full pipeline on the real-text eval: preprocess (native or python),
    per-language BM25 build, router retrieve.  Floors pinned from the
    measured CPU run (recall@10 1.0, recall@1 0.986) with slack for
    tokenizer evolution — a drop below these means a real regression on
    real text, which no synthetic test would catch."""
    from tdr.data.loaders import Corpus
    from tdr.eval import recall_at_k
    from tdr.models import BM25Model
    from tdr.rank import LanguageRouter, build_language_models

    docs, docids, dlangs, queries, qlangs, positives = real_eval_corpus()
    corpus = Corpus(docids, docs, dlangs)
    models = build_language_models(corpus, BM25Model)
    router = LanguageRouter(models, query_batch=16)
    res = router.retrieve(queries, qlangs, k=10)
    r10 = recall_at_k(res, positives, 10)
    r1 = recall_at_k([r[:1] for r in res], positives, 1)
    assert r10 >= 0.95, r10
    assert r1 >= 0.90, r1
