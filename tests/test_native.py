"""Parity tests: C++ native tokenizer + fast encoding vs the Python pipeline."""

import numpy as np
import pytest

from tdr.data import synthetic_corpus, SyntheticSpec
from tdr.text import Preprocessor, build_vocab, encode_docs
from tdr.text.fast import fast_available, fast_encode_corpus

pytestmark = pytest.mark.skipif(not fast_available(),
                                reason="native tokenizer unavailable")


def _python_counts(texts, lang):
    pp = Preprocessor("best")
    toks = [pp(t, lang) for t in texts]
    vocab = build_vocab(toks)
    doc_ids, term_ids, tfs, doc_lens = encode_docs(toks, vocab)
    id2t = vocab.id_to_term()
    counts = {}
    for d, t, f in zip(doc_ids, term_ids, tfs):
        counts[(int(d), id2t[t])] = float(f)
    return counts, doc_lens


def _fast_counts(texts, lang):
    vocab, doc_ids, term_ids, tfs, doc_lens = fast_encode_corpus(
        texts, [lang] * len(texts))
    id2t = vocab.id_to_term()
    counts = {}
    for d, t, f in zip(doc_ids, term_ids, tfs):
        counts[(int(d), id2t[t])] = float(f)
    return counts, doc_lens


SENTENCES = {
    "en": ["The cats are running in the gardens!",
           "Physics, mathematics & COMPUTING: 42 qubits."],
    "fr": ["Les grandes maisons bleues étaient magnifiques.",
           "Un château très ancien, près de la rivière."],
    "de": ["Die großen Häuser waren wunderschön gebaut.",
           "Straße und Bäume im Winter."],
    "es": ["Los niños pequeños corrían por el jardín.",
           "La montaña más alta de España."],
    "it": ["Le grandi case erano bellissime davvero.",
           "Una città antica vicino al mare."],
    "ar": ["الكتاب الجديد في المدرسة الكبيرة",
           "أحب القراءة والكتابة كثيرا"],
    "ko": ["학교에서 한국어를 공부합니다", "서울의 날씨가 좋습니다"],
}


@pytest.mark.parametrize("lang", sorted(SENTENCES))
def test_token_counts_match_python_pipeline(lang):
    texts = SENTENCES[lang]
    py_counts, py_lens = _python_counts(texts, lang)
    fa_counts, fa_lens = _fast_counts(texts, lang)
    assert fa_counts == py_counts, (
        sorted(set(py_counts) - set(fa_counts))[:10],
        sorted(set(fa_counts) - set(py_counts))[:10],
    )
    np.testing.assert_array_equal(fa_lens, py_lens)


@pytest.mark.parametrize("lang", ["en", "fr", "ko", "ar"])
def test_synthetic_corpus_parity(lang):
    corpus, _ = synthetic_corpus(
        SyntheticSpec(n_docs=80, n_queries=1, seed=13, ref_proportions=False,
                      langs=(lang,)))
    py_counts, py_lens = _python_counts(corpus.texts, lang)
    fa_counts, fa_lens = _fast_counts(corpus.texts, lang)
    assert fa_counts == py_counts
    np.testing.assert_array_equal(fa_lens, py_lens)


def test_min_df_pruning_matches():
    corpus, _ = synthetic_corpus(
        SyntheticSpec(n_docs=60, n_queries=1, seed=2, ref_proportions=False,
                      langs=("en",)))
    pp = Preprocessor("best")
    toks = [pp(t, "en") for t in corpus.texts]
    py_vocab = build_vocab(toks, min_df=3)
    fa_vocab, *_ = fast_encode_corpus(corpus.texts, ["en"] * len(corpus),
                                      min_df=3)
    assert set(py_vocab.term_to_id) == set(fa_vocab.term_to_id)


def test_end_to_end_retrieval_parity():
    """Retrieval results via the native path must equal the Python path."""
    from tdr.models import BM25Model
    from tdr.rank import LanguageRouter, build_language_models
    from tdr.utils.config import IndexConfig

    cfg = IndexConfig(doc_pad_multiple=8, nnz_pad_multiple=64,
                      head_budget_bytes=1 << 20, head_dtype="float32")
    corpus, queries = synthetic_corpus(SyntheticSpec(n_docs=250, n_queries=40, seed=21))
    m_fast = build_language_models(corpus, BM25Model, index_cfg=cfg, use_native=True)
    m_py = build_language_models(corpus, BM25Model, index_cfg=cfg, use_native=False)
    r_fast = LanguageRouter(m_fast, query_batch=16).retrieve(
        queries.queries, queries.langs, k=10)
    r_py = LanguageRouter(m_py, query_batch=16).retrieve(
        queries.queries, queries.langs, k=10)
    agree = np.mean([a == b for a, b in zip(r_fast, r_py)])
    assert agree == 1.0, agree


def test_empty_and_garbage_inputs():
    for texts in ([""], ["   "], ["!!!"], ["\x00\x01\x02"], []):
        if texts:
            vocab, d, t, f, dl = fast_encode_corpus(texts, ["en"] * len(texts))
            assert dl.shape == (len(texts),)


TRICKY = [
    # '_' is punctuation in the Python path: quick_brown must split
    "The quick_brown fox and snake_case_identifiers everywhere",
    # uppercase beyond ASCII: Latin-1, Latin Ext-A odd-pair ranges, Greek
    # (incl. final sigma), Cyrillic
    "ÉCOLE Ĺudovít Ňitra ŹDŹBŁO Ž",
    "ΛΟΓΟΣ ΑΣΒΕΣΤΟΣ Σ 1Σ σπίτι ΏΡΑ",
    "МОСКВА Пушкин ЁЖИК џ Џ",
    "Ÿ ÿ ŸVES mixed_CASE_Σ",
]


def test_tricky_characters_match_python_pipeline():
    """ADVICE r1 (medium): '_' handling + non-Latin-1 uppercase parity."""
    py_counts, py_lens = _python_counts(TRICKY, "en")
    fa_counts, fa_lens = _fast_counts(TRICKY, "en")
    assert fa_counts == py_counts, (
        sorted(set(py_counts) - set(fa_counts))[:10],
        sorted(set(fa_counts) - set(py_counts))[:10],
    )
    np.testing.assert_array_equal(fa_lens, py_lens)


@pytest.mark.parametrize("lang", sorted(SENTENCES))
def test_fast_tokenize_texts_matches_python(lang):
    """Query-side native tokenization (router fast path) must produce the
    SAME ordered token lists as Preprocessor("best") — including joined
    bigrams for the latin languages."""
    from tdr.text.fast import fast_tokenize_texts

    texts = SENTENCES[lang] + ["", "   ", "quick_brown under_score"]
    pp = Preprocessor("best")
    py = [pp(t, lang) for t in texts]
    fa = fast_tokenize_texts(texts, lang)
    assert fa == py


def test_fast_tokenize_synthetic_queries_match():
    from tdr.text.fast import fast_tokenize_texts

    corpus, queries = synthetic_corpus(
        SyntheticSpec(n_docs=300, n_queries=60, seed=5, hard=True))
    pp = Preprocessor("best")
    by_lang = {}
    for q, l in zip(queries.queries, queries.langs):
        by_lang.setdefault(l, []).append(q)
    for lang, qs in sorted(by_lang.items()):
        assert fast_tokenize_texts(qs, lang) == [pp(q, lang) for q in qs], lang


class TestNativeCorpusParser:
    """C++ corpus.json parser (jsonload.cc) vs the json.load oracle."""

    CORPUS = [
        {"docid": "doc-en-1", "text": "Plain ascii text.", "lang": "en"},
        {"docid": "doc-fr-2", "text": "Écoles déjà là — çà va? ½ mètre",
         "lang": "fr"},
        {"docid": "doc-ko-3", "text": "한국어 텍스트 \"인용\" 줄\n바꿈",
         "lang": "ko"},
        {"docid": "doc-4", "text": "Escapes: \\ / \b \f \n \r \t and é",
         "lang": "ar"},
        {"docid": "doc-5", "text": "Astral: \U0001F600 pair", "lang": "en"},
        {"docid": 42, "text": "integer docid", "lang": "de",
         "extra": {"nested": [1, 2, {"x": "y"}], "flag": True, "z": None}},
        {"text": "missing lang and reordered", "docid": "doc-7"},
        {"docid": "doc-8", "text": ""},
    ]

    def _check(self, payload: bytes):
        import json as _json

        from tdr import native

        docids, texts, langs = native.parse_corpus_json(payload)
        raw = _json.loads(payload)
        assert docids == [str(r["docid"]) for r in raw]
        assert texts == [r["text"] for r in raw]
        assert langs == [r.get("lang", "en") for r in raw]

    def test_ensure_ascii_dump(self):
        import json as _json

        self._check(_json.dumps(self.CORPUS, ensure_ascii=True).encode())

    def test_raw_utf8_dump(self):
        import json as _json

        self._check(_json.dumps(self.CORPUS, ensure_ascii=False,
                                indent=2).encode("utf-8"))

    def test_empty_array(self):
        from tdr import native

        assert native.parse_corpus_json(b"  [ ]  ") == ([], [], [])

    def test_malformed_raises(self):
        from tdr import native

        with pytest.raises(ValueError):
            native.parse_corpus_json(b'[{"docid": "x", "text": ')

    def test_load_corpus_roundtrip(self, tmp_path):
        import json as _json

        from tdr.data import load_corpus

        p = tmp_path / "corpus.json"
        p.write_text(_json.dumps(self.CORPUS, ensure_ascii=False))
        c_nat = load_corpus(str(p), use_native=True)
        c_py = load_corpus(str(p), use_native=False)
        assert c_nat.docids == c_py.docids
        assert c_nat.texts == c_py.texts
        assert c_nat.langs == c_py.langs

    def test_missing_text_key_is_an_error(self):
        from tdr import native

        with pytest.raises(ValueError):
            native.parse_corpus_json(b'[{"docid": "d1", "lang": "en"}]')
        with pytest.raises(ValueError):
            native.parse_corpus_json(b'[{"text": "x", "lang": "en"}]')

    def test_duplicate_keys_last_wins(self):
        from tdr import native

        d, t, l = native.parse_corpus_json(
            b'[{"docid": "a", "docid": "b", "text": "p", "text": "q"}]')
        assert d == ["b"] and t == ["q"] and l == ["en"]

    def test_trailing_garbage_is_an_error(self):
        from tdr import native

        with pytest.raises(ValueError):
            native.parse_corpus_json(
                b'[{"docid": "a", "text": "x"}] [{"docid": "b", "text": "y"}]')

    def test_float_docid_falls_back(self):
        """Non-integer docid literals must ERROR natively (str(4e2) ==
        '400.0' in Python — the literal form would silently diverge), so
        load_corpus falls back to json.load and both paths agree."""
        from tdr import native

        with pytest.raises(ValueError):
            native.parse_corpus_json(b'[{"docid": 4e2, "text": "t"}]')
        with pytest.raises(ValueError):
            native.parse_corpus_json(b'[{"docid": bogus, "text": "t"}]')

    def test_lone_surrogate_falls_back(self):
        from tdr import native

        with pytest.raises(ValueError):
            native.parse_corpus_json(
                b'[{"docid": "a", "text": "\\ud800\\ud800"}]')
        with pytest.raises(ValueError):
            native.parse_corpus_json(b'[{"docid": "a", "text": "\\udc00"}]')

    def test_raw_control_char_falls_back(self):
        """json.load (the parity oracle) rejects raw control bytes inside
        strings (ADVICE r2): the native path must too, so such records
        route through the json.load fallback and both report malformed."""
        import json as _json

        from tdr import native

        for bad in (b'[{"docid": "a", "text": "line\nbreak"}]',
                    b'[{"docid": "a", "text": "tab\there"}]',
                    b'[{"docid": "a", "text": "nul\x00byte"}]'):
            with pytest.raises(ValueError):
                native.parse_corpus_json(bad)
            with pytest.raises(Exception):
                _json.loads(bad)   # oracle agrees these are malformed


class TestNativeHashEncode:
    """C++ feature-hash encoder (hashenc.cc) vs the Python oracle
    (tdr.text.hash_tokenizer.encode_text) — the dense encoder's ids must be
    bit-identical regardless of which path hashed the text, or embeddings
    persisted from one process would not match queries encoded in another."""

    V, L = 50_000, 128

    def _oracle(self, texts):
        from tdr.text import hash_tokenizer as ht

        ids = np.zeros((len(texts), self.L), np.int32)
        mask = np.zeros((len(texts), self.L), np.float32)
        for i, t in enumerate(texts):
            enc = ht.encode_text(t, self.V, self.L)
            ids[i, : len(enc)] = enc
            mask[i, : len(enc)] = 1.0
        return ids, mask

    def _check(self, texts):
        from tdr import native

        ids, mask = self._oracle(texts)
        ic, mc = native.hash_encode_batch(texts, self.V, self.L)
        bad = np.nonzero((ids != ic).any(axis=1) | (mask != mc).any(axis=1))[0]
        assert bad.size == 0, [(texts[b], ids[b][:12].tolist(),
                                ic[b][:12].tolist()) for b in bad[:3]]

    def test_edge_cases(self):
        self._check([
            "", "a", "The Quick_brown fox; jumps over 42 lazy dogs!",
            "Überraschung Größe straße", "él ñandú corrió",
            # Final_Sigma: Python lowers the raw TEXT first, so word-final Σ
            # (next char not cased) becomes ς — incl. before digits/space
            "ΛΟΓΟΣ Σίσυφος ΑΣ 1Σ ΣΣ", "ΛΟΓΟΣ9 ΟΔΥΣΣΕΥΣ",
            "Привет мир", "안녕하세요 한국어 조사 입니다", "مرحبا بالعالم العربية",
            "c'est l'été à Paris", "日本語のテスト", "x" * 500,
            "word " * 100, "<angle> #hash #tags", "Mixed한국어English단어",
            "µ-benchmark ª º",          # Latin-1 letters below 0xC0
        ])

    def test_real_sentences(self):
        from tests.data_realtext import REAL_SENTENCES

        texts = [s for sents in REAL_SENTENCES.values() for s in sents]
        self._check(texts)

    def test_synthetic_corpus(self):
        corpus, _ = synthetic_corpus(
            SyntheticSpec(n_docs=500, n_queries=10, seed=11, hard=True))
        self._check(list(corpus.texts))

    def test_encode_batch_routes_native(self):
        """encode_batch (the dense model's entry point) must produce the
        oracle's output whether or not it took the native path."""
        from tdr.text.hash_tokenizer import encode_batch

        texts = ["retrieval systems", "Größenordnung", "한국어 조사"]
        ids, mask = encode_batch(texts, self.V, self.L)
        oi, om = self._oracle(texts)
        np.testing.assert_array_equal(ids, oi)
        np.testing.assert_array_equal(mask, om)


def test_count_docs_matches_numpy_block():
    """countdocs.cc vs the numpy repeat/pack/np.unique tail: byte-identical
    COO (including (doc, term) sort order), doc_lens, df, and sorted
    bigram pair keys — on a random stem stream with repeats, empty docs,
    and single-token docs (no bigram possible)."""
    from tdr import native

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(29)
    n_docs, n_unigram = 200, 50
    lens = rng.randint(0, 30, n_docs)
    lens[3] = 0
    lens[4] = 1
    # force a counter-table regrow late in the stream (after ~150 epoch
    # bumps): the regrow resets the epoch stamps, and a stale-key aliasing
    # bug there would corrupt counts only for docs AFTER the regrow
    lens[150] = 5000
    doc_offsets = np.zeros(n_docs + 1, np.int64)
    doc_offsets[1:] = np.cumsum(lens)
    stream = rng.randint(0, n_unigram, int(doc_offsets[-1])).astype(np.int32)

    for bigrams in (False, True):
        d, t, f, dl, df, pk = native.count_docs(
            stream, doc_offsets, n_unigram, bigrams)
        # numpy oracle (the former inline block)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64),
                           np.diff(doc_offsets))
        if bigrams:
            left, right = stream[:-1].astype(np.int64), stream[1:].astype(np.int64)
            same = doc_of[:-1] == doc_of[1:]
            keys = ((left << 32) | right)[same]
            uniq_pairs, pair_ids = np.unique(keys, return_inverse=True)
            all_terms = np.concatenate(
                [stream.astype(np.int64), pair_ids + n_unigram])
            all_docs = np.concatenate([doc_of, doc_of[:-1][same]])
            np.testing.assert_array_equal(pk, uniq_pairs)
        else:
            all_terms, all_docs = stream.astype(np.int64), doc_of
            assert len(pk) == 0
        vocab_size = n_unigram + (len(pk) if bigrams else 0)
        want_dl = np.bincount(all_docs, minlength=n_docs).astype(np.int32)
        packed = (all_docs << 32) | all_terms
        uniq, counts = np.unique(packed, return_counts=True)
        np.testing.assert_array_equal(d, (uniq >> 32).astype(np.int32))
        np.testing.assert_array_equal(t, (uniq & 0xFFFFFFFF).astype(np.int32))
        np.testing.assert_array_equal(f, counts.astype(np.float32))
        np.testing.assert_array_equal(dl, want_dl)
        np.testing.assert_array_equal(
            df, np.bincount((uniq & 0xFFFFFFFF).astype(np.int64),
                            minlength=vocab_size).astype(np.int32))
