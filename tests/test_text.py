"""Unit tests for the host text layer (L1)."""

import numpy as np
import pytest

from tdr.text import (
    Preprocessor,
    preprocess_text,
    stopwords_for,
    stopword_union,
    build_vocab,
    encode_docs,
    encode_queries,
    detect_language,
)
from tdr.text.ko import tokenize_korean, strip_particle
from tdr.text.lemmatize import lemmatize_en
from tdr.text.preprocess import normalize_arabic, word_tokenize


class TestStopwords:
    def test_per_language_sets(self):
        assert "the" in stopwords_for("en")
        assert "les" in stopwords_for("fr")
        assert "und" in stopwords_for("de")
        assert "pero" in stopwords_for("es")
        assert "della" in stopwords_for("it")
        assert "على" in stopwords_for("ar")
        assert "그리고" in stopwords_for("ko")

    def test_union_contains_all_latin(self):
        u = stopword_union(("en", "fr", "de", "es", "it"))
        for w in ("the", "les", "und", "pero", "della"):
            assert w in u

    def test_unknown_lang_falls_back_to_english(self):
        assert stopwords_for("xx") == stopwords_for("en")


class TestTokenize:
    def test_word_tokenize_unicode(self):
        assert word_tokenize("héllo wörld, 123!") == ["héllo", "wörld", "123"]

    def test_korean_particle_strip(self):
        assert strip_particle("학교에서") == ["학교", "에서"]
        assert strip_particle("책") == ["책"]

    def test_korean_tokenize_mixed_script(self):
        toks = tokenize_korean("한국의 TPU2 칩")
        assert "한국" in toks and "칩" in toks

    def test_arabic_normalization(self):
        assert normalize_arabic("أبجد") == "ابجد"
        assert normalize_arabic("مدرسة") == "مدرسه"


class TestLemmatizer:
    @pytest.mark.parametrize(
        "word,lemma",
        [("cats", "cat"), ("churches", "church"), ("boxes", "box"),
         ("cities", "city"), ("women", "woman"), ("glasses", "glass"),
         ("news", "news"), ("bus", "bus")],
    )
    def test_en_noun_rules(self, word, lemma):
        assert lemmatize_en(word) == lemma


class TestPreprocessor:
    def test_best_pipeline_en(self):
        toks = preprocess_text("The cats are running in the gardens!", "en")
        assert "cat" in toks
        assert "garden" in toks
        assert "the" not in toks
        # en gets no bigram augmentation
        assert not any("_" in t for t in toks)

    def test_best_pipeline_fr_bigrams(self):
        toks = preprocess_text("grande maison bleue", "fr")
        unigrams = [t for t in toks if "_" not in t]
        bigrams = [t for t in toks if "_" in t]
        # Snowball-stemmed unigrams followed by joined 2-grams
        assert len(bigrams) == len(unigrams) - 1
        assert bigrams[0] == f"{unigrams[0]}_{unigrams[1]}"

    def test_best_pipeline_ko(self):
        toks = preprocess_text("학교에서 공부한다", "ko")
        assert "학교" in toks

    def test_best_pipeline_ar_keeps_script(self):
        toks = preprocess_text("الكتاب المدرسة", "ar")
        assert len(toks) >= 1
        assert all(any("؀" <= c <= "ۿ" for c in t) for t in toks)

    def test_porter_pipeline(self):
        toks = preprocess_text("running runners", "en", pipeline="porter")
        assert toks == ["run", "runner"]

    def test_rich_pipeline_strips_html_urls_numbers(self):
        toks = preprocess_text(
            "<b>Visit</b> https://example.com now 42 cats", "en", pipeline="rich"
        )
        assert "cat" in toks
        assert not any("http" in t or t.isdigit() or "<" in t for t in toks)

    def test_deterministic(self):
        a = preprocess_text("Stemming determinism test chambers", "en")
        b = preprocess_text("Stemming determinism test chambers", "en")
        assert a == b


class TestLangid:
    def test_script_detection(self):
        assert detect_language("هذا كتاب جميل عن التاريخ") == "ar"
        assert detect_language("이것은 한국어 문장입니다") == "ko"

    def test_latin_detection(self):
        assert detect_language("the quick brown fox jumps over the lazy dog") == "en"
        assert detect_language("le chat est sur la table et il dort") == "fr"
        assert detect_language("der Hund läuft schnell durch den Wald und über") == "de"


class TestVocab:
    def setup_method(self):
        self.docs = [["a", "b", "a", "c"], ["b", "c", "d"], ["c", "c", "c"]]

    def test_build_and_df(self):
        v = build_vocab(self.docs)
        assert v.size == 4
        assert v.n_docs == 3
        df = {t: v.df[i] for t, i in v.term_to_id.items()}
        assert df == {"a": 1, "b": 2, "c": 3, "d": 1}

    def test_min_df_pruning(self):
        v = build_vocab(self.docs, min_df=2)
        assert set(v.term_to_id) == {"b", "c"}

    def test_encode_docs_coo(self):
        v = build_vocab(self.docs)
        doc_ids, term_ids, tfs, doc_lens = encode_docs(self.docs, v)
        assert doc_lens.tolist() == [4, 3, 3]
        # doc 0 has tf(a)=2
        a = v.term_to_id["a"]
        mask = (doc_ids == 0) & (term_ids == a)
        assert tfs[mask].tolist() == [2.0]

    def test_encode_queries_unique_and_pad(self):
        v = build_vocab(self.docs)
        ids, w = encode_queries([["c", "c", "a"], ["zzz"]], v, max_terms=4)
        assert ids.shape == (2, 4)
        # unique terms, weight 1 each, padding weight 0
        assert w[0].tolist() == [1.0, 1.0, 0.0, 0.0]
        assert w[1].tolist() == [0.0, 0.0, 0.0, 0.0]


class TestSynthetic:
    def test_deterministic_and_solvable(self):
        from tdr.data import synthetic_corpus, SyntheticSpec

        spec = SyntheticSpec(n_docs=100, n_queries=20, seed=3)
        c1, q1 = synthetic_corpus(spec)
        c2, q2 = synthetic_corpus(spec)
        assert c1.texts == c2.texts and q1.queries == q2.queries
        assert len(c1) == 100 and len(q1) == 20
        assert set(q1.positive_docs) <= set(c1.docids)
        # all 7 languages represented
        assert set(c1.langs) == {"ar", "de", "en", "es", "fr", "it", "ko"}


class TestLoaders:
    def test_corpus_roundtrip(self, tmp_path):
        import json
        from tdr.data import load_corpus

        raw = [{"docid": "d1", "text": "hello", "lang": "en"},
               {"docid": "d2", "text": "bonjour", "lang": "fr"}]
        p = tmp_path / "corpus.json"
        p.write_text(json.dumps(raw))
        c = load_corpus(str(p))
        assert c.docids == ["d1", "d2"] and c.langs == ["en", "fr"]

    def test_query_csv(self, tmp_path):
        from tdr.data import load_queries

        p = tmp_path / "dev.csv"
        p.write_text(
            "query_id,query,positive_docs,lang\n1,hello world,d1,en\n2,bonjour,d2,fr\n"
        )
        q = load_queries(str(p))
        assert q.queries == ["hello world", "bonjour"]
        assert q.positive_docs == ["d1", "d2"]

    def test_train_val_split_seeded(self):
        from tdr.data import QuerySet, train_val_split

        qs = QuerySet([str(i) for i in range(100)], [f"q{i}" for i in range(100)],
                      ["en"] * 100)
        tr1, va1 = train_val_split(qs, 0.1, seed=42)
        tr2, va2 = train_val_split(qs, 0.1, seed=42)
        assert va1.query_ids == va2.query_ids
        assert len(va1) == 10 and len(tr1) == 90
        assert set(va1.query_ids) | set(tr1.query_ids) == set(qs.query_ids)


class TestEncodeQueriesVectorized:
    """The batch-deduped encode_queries must match the straightforward
    per-query reference loop exactly (first-seen order, in-vocab filter,
    max_terms cap, count weights)."""

    def _ref(self, query_token_lists, vocab, max_terms, unique):
        from collections import Counter

        Q = len(query_token_lists)
        ids = np.zeros((Q, max_terms), dtype=np.int32)
        w = np.zeros((Q, max_terms), dtype=np.float32)
        for q, toks in enumerate(query_token_lists):
            enc = vocab.encode(toks)
            if unique:
                counts = [(t, 1.0) for t in dict.fromkeys(enc)]
            else:
                counts = list(Counter(enc).items())
            for j, (t, c) in enumerate(counts[:max_terms]):
                ids[q, j] = t
                w[q, j] = c
        return ids, w

    @pytest.mark.parametrize("unique", [True, False])
    def test_matches_reference_loop(self, unique):
        rng = np.random.RandomState(0)
        docs = [[f"t{rng.randint(200)}" for _ in range(rng.randint(3, 30))]
                for _ in range(60)]
        vocab = build_vocab(docs)
        queries = []
        for _ in range(40):
            q = [f"t{rng.randint(260)}" for _ in range(rng.randint(0, 12))]
            if rng.rand() < 0.3:
                q += q[:3]                       # duplicates
            if rng.rand() < 0.2:
                q += ["zz-oov", "t0_t1"]         # OOV + underscore
            queries.append(q)
        queries.append([])                       # empty query
        queries.append([f"t{i}" for i in range(30)])   # > max_terms
        ids_ref, w_ref = self._ref(queries, vocab, 8, unique)
        ids_got, w_got = encode_queries(queries, vocab, 8, unique=unique)
        assert np.array_equal(ids_got, ids_ref)
        assert np.array_equal(w_got, w_ref)
