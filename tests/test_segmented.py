"""Segmented live-update retrieval (tdr.rank.segmented) — document
add/delete without a full rebuild, which the reference's frozen pickle
pipeline cannot do at all (final_implementation.py:187-287 only loads)."""

import os

import numpy as np
import pytest

from tdr.rank.segmented import SegmentedBM25
from tdr.utils.config import IndexConfig

CFG = IndexConfig(doc_pad_multiple=8, nnz_pad_multiple=64)


def _docs(rng, n, vocab_n=300, tag=""):
    toks = [[f"t{rng.randint(vocab_n)}" for _ in range(rng.randint(6, 30))]
            for _ in range(n)]
    ids = [f"{tag}d{i}" for i in range(n)]
    # give each doc a unique signature term so queries are unambiguous
    for i, t in enumerate(toks):
        t.append(f"sig_{tag}{i}")
    return toks, ids


@pytest.fixture()
def seg():
    rng = np.random.RandomState(3)
    toks, ids = _docs(rng, 120)
    return SegmentedBM25.build(toks, ids, index_cfg=CFG), toks, ids, rng


class TestAdd:
    def test_added_docs_retrievable_immediately(self, seg):
        s, toks, ids, rng = seg
        new_toks, new_ids = _docs(rng, 10, tag="new")
        s.add_documents(new_toks, new_ids)
        for i in (0, 7):
            got = s.retrieve_tokens([[f"sig_new{i}"]], k=3)[0]
            assert got[0] == f"newd{i}"

    def test_main_docs_still_retrievable(self, seg):
        s, toks, ids, rng = seg
        s.add_documents(*_docs(rng, 5, tag="new"))
        got = s.retrieve_tokens([["sig_3"]], k=3)[0]
        assert got[0] == "d3"

    def test_incremental_adds_accumulate(self, seg):
        s, toks, ids, rng = seg
        s.add_documents(*_docs(rng, 3, tag="a"))
        s.add_documents(*_docs(rng, 4, tag="b"))
        assert s.retrieve_tokens([["sig_a1"]], k=1)[0] == ["ad1"]
        assert s.retrieve_tokens([["sig_b2"]], k=1)[0] == ["bd2"]
        assert s.n_docs == 120 + 7

    def test_global_stats_keep_scores_comparable(self, seg):
        """A term appearing in both segments: the same query must rank a
        heavy-tf delta doc above a light-tf main doc (idf comparability —
        delta idf is computed against COMBINED df/n_docs)."""
        s, toks, ids, rng = seg
        # main gets one doc with the shared term once; delta one with it 5x
        s.add_documents([["shared"] * 5 + ["filler"]], ["heavy"])
        sm = s.retrieve_tokens([["shared"]], k=5)[0]
        assert sm[0] == "heavy"


class TestDelete:
    def test_deleted_doc_disappears(self, seg):
        s, toks, ids, rng = seg
        assert s.retrieve_tokens([["sig_5"]], k=1)[0] == ["d5"]
        s.delete_documents(["d5"])
        got = s.retrieve_tokens([["sig_5"]], k=3)[0]
        assert "d5" not in got

    def test_delete_from_delta(self, seg):
        s, toks, ids, rng = seg
        s.add_documents(*_docs(rng, 4, tag="x"))
        s.delete_documents(["xd2"])
        assert "xd2" not in s.retrieve_tokens([["sig_x2"]], k=3)[0]

    def test_readd_revives(self, seg):
        s, toks, ids, rng = seg
        s.delete_documents(["zz1"])
        s.add_documents([["alpha", "beta", "revive_sig"]], ["zz1"])
        assert s.retrieve_tokens([["revive_sig"]], k=1)[0] == ["zz1"]


class TestCompact:
    def test_compact_requires_corpus(self, seg):
        s, *_ = seg
        with pytest.raises(NotImplementedError):
            s.compact()

    def test_compact_with_equals_fresh_build(self, seg):
        s, toks, ids, rng = seg
        new_toks, new_ids = _docs(rng, 6, tag="n")
        s.add_documents(new_toks, new_ids)
        s.delete_documents(["d0", "nd3"])
        all_toks, all_ids = toks + new_toks, ids + new_ids
        s.compact_with(all_toks, all_ids)
        assert s.delta is None and not s._deleted
        live = [i for i in all_ids if i not in ("d0", "nd3")]
        assert s.docids == live
        # fresh reference build over the live docs must agree
        ref = SegmentedBM25.build(
            [t for t, d in zip(all_toks, all_ids) if d not in ("d0", "nd3")],
            live, index_cfg=CFG)
        q = [["sig_n1"], ["sig_44"]]
        assert s.retrieve_tokens(q, k=5) == ref.retrieve_tokens(q, k=5)

    def test_compacted_drops_tombstones(self, seg):
        s, toks, ids, rng = seg
        s.delete_documents(["d7"])
        s.compact_with(toks, ids)
        assert "d7" not in s.docids
        assert "d7" not in s.retrieve_tokens([["sig_7"]], k=3)[0]


class TestRouterIntegration:
    def test_mixed_router_serves_segmented_language(self, seg):
        from tdr.data import synthetic_corpus, SyntheticSpec
        from tdr.models import BM25Model
        from tdr.rank import LanguageRouter
        from tdr.text import preprocess_texts

        s, toks, ids, rng = seg
        corpus, queries = synthetic_corpus(SyntheticSpec(
            n_docs=80, n_queries=10, seed=5, ref_proportions=False,
            langs=("fr",)))
        fr_toks = preprocess_texts(corpus.texts, corpus.langs)
        fr = BM25Model.build(fr_toks, corpus.docids, lang="fr", index_cfg=CFG)
        router = LanguageRouter({"en": s, "fr": fr}, query_batch=8,
                                use_native=False)
        s.add_documents([["zebra", "quagga", "okapi"]], ["live1"])
        out = router.retrieve(["zebra quagga okapi"], ["en"], k=3)
        assert out[0][0] == "live1"
        # fr queries still work through the normal path
        fr_out = router.retrieve(queries.queries[:3], queries.langs[:3], k=5)
        assert all(len(r) > 0 for r in fr_out)

class TestSegmentedCheckpoint:
    def test_roundtrip_with_delta_and_tombstones(self, tmp_path, seg):
        from tdr.ckpt import load_segmented, save_segmented

        s, toks, ids, rng = seg
        s.add_documents(*_docs(rng, 5, tag="w"))
        s.delete_documents(["d2", "wd1"])
        path = str(tmp_path / "seg")
        save_segmented(path, s)
        loaded = load_segmented(path)
        assert loaded.docids == s.docids
        assert loaded._deleted == {"d2", "wd1"}
        q = [["sig_w0"], ["sig_2"], ["sig_w1"], ["sig_9"]]
        v1, r1 = s.topk_tokens(q, k=5)
        v2, r2 = loaded.topk_tokens(q, k=5)
        assert np.array_equal(r1, r2) and np.array_equal(v1, v2)
        # the tombstoned docs stay gone after reload
        assert "d2" not in loaded.retrieve_tokens([["sig_2"]], k=3)[0]
        assert "wd1" not in loaded.retrieve_tokens([["sig_w1"]], k=3)[0]
        # and updates keep working post-reload
        loaded.add_documents([["post", "reload", "sig_post"]], ["p1"])
        assert loaded.retrieve_tokens([["sig_post"]], k=1)[0] == ["p1"]


class TestUpdateSemantics:
    """Re-adding an existing docid is the UPDATE path: the stale copy must
    be shadowed (review finding: a docid-level tombstone revived the old
    main copy and served duplicates)."""

    def test_readd_shadows_stale_main_copy(self, seg):
        s, toks, ids, rng = seg
        s.add_documents([["replacement", "text", "newsig_3"]], ["d3"])
        # old signature no longer surfaces d3; the new one does
        got_new = s.retrieve_tokens([["newsig_3"]], k=3)[0]
        assert got_new[0] == "d3"
        got_old = s.retrieve_tokens([["sig_3"]], k=5)[0]
        assert "d3" not in got_old
        # no duplicates anywhere
        for row in s.retrieve_tokens([["newsig_3"], ["sig_3"]], k=10):
            assert len(row) == len(set(row))

    def test_delete_then_readd_serves_only_new(self, seg):
        s, toks, ids, rng = seg
        s.delete_documents(["d4"])
        s.add_documents([["fresh", "version", "v2sig_4"]], ["d4"])
        assert s.retrieve_tokens([["v2sig_4"]], k=3)[0][0] == "d4"
        assert "d4" not in s.retrieve_tokens([["sig_4"]], k=5)[0]

    def test_update_within_delta(self, seg):
        s, toks, ids, rng = seg
        s.add_documents([["alpha", "one", "dsig_a"]], ["dx"])
        s.add_documents([["beta", "two", "dsig_b"]], ["dx"])
        assert s.retrieve_tokens([["dsig_b"]], k=3)[0][0] == "dx"
        assert "dx" not in s.retrieve_tokens([["dsig_a"]], k=5)[0]

    def test_n_docs_counts_live_copies(self, seg):
        s, toks, ids, rng = seg
        n0 = s.n_docs
        s.add_documents([["u", "pdate", "usig"]], ["d9"])   # update: net 0
        assert s.n_docs == n0
        s.delete_documents(["d8"])
        assert s.n_docs == n0 - 1

    def test_empty_token_add_survives(self, seg):
        """Empty/stopword-only text must not crash the delta build (it
        killed the mutable server before the vocab guard)."""
        s, toks, ids, rng = seg
        s.add_documents([[]], ["emptydoc"])
        assert "emptydoc" in s.docids
        # content-free, so unretrievable — but other ops keep working
        s.add_documents([["real", "content", "rsig"]], ["r1"])
        assert s.retrieve_tokens([["rsig"]], k=1)[0] == ["r1"]

    def test_ckpt_roundtrip_preserves_shadows(self, tmp_path, seg):
        from tdr.ckpt import load_segmented, save_segmented

        s, toks, ids, rng = seg
        s.add_documents([["updated", "usig_6"]], ["d6"])   # shadows main d6
        s.delete_documents(["d1"])
        save_segmented(str(tmp_path / "s"), s)
        loaded = load_segmented(str(tmp_path / "s"))
        assert loaded._dead_rows == s._dead_rows
        assert "d6" not in loaded.retrieve_tokens([["sig_6"]], k=5)[0]
        assert loaded.retrieve_tokens([["usig_6"]], k=1)[0] == ["d6"]
        assert "d1" not in loaded.retrieve_tokens([["sig_1"]], k=5)[0]


class TestCrashSafety:
    def test_save_is_atomic_replace(self, tmp_path, seg):
        from tdr.ckpt import load_segmented, save_segmented

        s, toks, ids, rng = seg
        path = str(tmp_path / "st" / "en")
        save_segmented(path, s)
        s.add_documents([["newer", "csig"]], ["c1"])
        save_segmented(path, s)          # replace existing state
        loaded = load_segmented(path)
        assert "c1" in loaded.docids
        # no swap debris left behind
        assert [e for e in os.listdir(str(tmp_path / "st"))
                if e != "en"] == []

    def test_recover_mid_swap(self, tmp_path, seg):
        """Simulate a kill between the two swap renames: the state sits
        under .<name>.old-* and the name is missing — recovery restores
        it."""
        from tdr.ckpt import (load_segmented, recover_segmented_dir,
                              save_segmented)

        s, toks, ids, rng = seg
        parent = str(tmp_path / "st2")
        path = os.path.join(parent, "en")
        save_segmented(path, s)
        os.rename(path, os.path.join(parent, ".en.old-12345"))
        assert not os.path.exists(path)
        recover_segmented_dir(parent)
        assert os.path.exists(path)
        assert load_segmented(path).docids == s.docids

    def test_tmp_debris_cleared(self, tmp_path, seg):
        from tdr.ckpt import recover_segmented_dir, save_segmented

        s, toks, ids, rng = seg
        parent = str(tmp_path / "st3")
        save_segmented(os.path.join(parent, "en"), s)
        os.makedirs(os.path.join(parent, ".en.tmp-999"))
        recover_segmented_dir(parent)
        assert ".en.tmp-999" not in os.listdir(parent)



class TestTombstoneMargins:
    """ADVICE r3: the fixed 64-candidate tombstone margin silently dropped
    live docs under heavy delete churn.  The margin now escalates with the
    tombstone count over bucketed compile keys, and exhaustion past the
    largest bucket is counted + logged instead of silent."""

    def test_margin_escalates_and_stays_correct(self):
        # 150 docs share one hot term; delete 120 of them (> the old fixed
        # 64 margin) — every surviving doc must still be retrievable
        toks = [["hot", f"sig_{i}"] for i in range(150)]
        ids = [f"d{i}" for i in range(150)]
        seg = SegmentedBM25.build(toks, ids, index_cfg=CFG)
        seg.delete_documents([f"d{i}" for i in range(120)])
        res = seg.retrieve_tokens([["hot"]], k=30)[0]
        assert len(res) == 30
        assert all(int(d[1:]) >= 120 for d in res), res
        assert seg.truncated_queries == 0

    def test_truncation_past_largest_bucket_is_flagged(self):
        # >1024 tombstones ranked above the survivors exhaust even the
        # largest margin: the store must FLAG the truncation, not silently
        # return short/stale results
        n = 1200
        toks = [["hot", f"sig_{i}"] for i in range(n)]
        ids = [f"d{i}" for i in range(n)]
        seg = SegmentedBM25.build(toks, ids, index_cfg=CFG)
        seg.delete_documents([f"d{i}" for i in range(1100)])
        before = seg.truncated_queries
        vals, rows = seg.topk_tokens([["hot"]], k=10)
        assert seg.truncated_queries > before

    def test_truncation_flagged_with_delta_present(self):
        """Round-4 review finding: with a delta segment the concat doubled
        the saturation width, so the truncation flag never fired in the
        delete/re-add churn scenario the feature was built for."""
        n = 1200
        toks = [["hot", f"sig_{i}"] for i in range(n)]
        ids = [f"d{i}" for i in range(n)]
        seg = SegmentedBM25.build(toks, ids, index_cfg=CFG)
        # re-add one doc so a delta exists
        seg.add_documents([["hot", "sig_0"]], ["d0"])
        seg.delete_documents([f"d{i}" for i in range(1100)])
        before = seg.truncated_queries
        seg.topk_tokens([["hot"]], k=10)
        assert seg.truncated_queries > before


class TestMergePolicy:
    def test_should_compact_flags(self):
        toks = [["hot", f"sig_{i}"] for i in range(300)]
        ids = [f"d{i}" for i in range(300)]
        seg = SegmentedBM25.build(toks, ids, index_cfg=CFG)
        assert not seg.should_compact
        # heavy tombstone churn flips it
        seg.delete_documents([f"d{i}" for i in range(200)])
        assert seg.should_compact
        # a big delta flips it too
        seg2 = SegmentedBM25.build(toks, ids, index_cfg=CFG)
        seg2.add_documents([["new", f"ns_{i}"] for i in range(80)],
                           [f"n{i}" for i in range(80)])
        assert seg2.should_compact
        # a truncated query flips it
        seg3 = SegmentedBM25.build(
            [["hot", f"s{i}"] for i in range(1200)],
            [f"e{i}" for i in range(1200)], index_cfg=CFG)
        seg3.delete_documents([f"e{i}" for i in range(1100)])
        seg3.topk_tokens([["hot"]], k=10)
        assert seg3.truncated_queries and seg3.should_compact

    def test_prf_on_a_segment_model_promotes_to_store_prf(self):
        """A prf-enabled main model inside a segmented store used to be
        refused (model-level expansion covers only one segment's vocab);
        it now promotes to STORE-orchestrated PRF — feedback merged across
        segments, pooled expansion re-encoded per segment — and must stay
        consistent with the store-level flag."""
        toks = [["hot", f"s{i}"] for i in range(50)]
        seg = SegmentedBM25.build(toks, [f"d{i}" for i in range(50)],
                                  index_cfg=CFG)
        seg.main.prf = True
        v_model, r_model = seg.topk_tokens([["hot"]], k=5)
        seg.main.prf = False
        seg.prf = True
        v_store, r_store = seg.topk_tokens([["hot"]], k=5)
        np.testing.assert_array_equal(r_model, r_store)
        np.testing.assert_allclose(v_model, v_store)
        seg.prf = False
        seg.topk_tokens([["hot"]], k=5)       # plain path still clean

    def test_should_compact_resets_after_compaction(self):
        """Round-4 review finding: truncated_queries is a lifetime counter,
        so without a reset in compact_with the hint latches True forever
        and a polling caller ('if seg.should_compact: compact_with(...)')
        rebuilds on every poll after the first truncated query."""
        n = 1200
        toks = [["hot", f"sig_{i}"] for i in range(n)]
        ids = [f"d{i}" for i in range(n)]
        seg = SegmentedBM25.build(toks, ids, index_cfg=CFG)
        seg.delete_documents([f"d{i}" for i in range(1100)])
        seg.topk_tokens([["hot"]], k=10)
        assert seg.should_compact
        live = [i for i in range(n) if i >= 1100]
        seg.compact_with([toks[i] for i in live], [ids[i] for i in live])
        assert not seg.should_compact


class TestSegmentedPrf:
    """Store-orchestrated RM3 (VERDICT r4 #6): PRF composes with live
    updates — feedback merged globally, mining per segment, pooled
    expansion re-encoded into each segment's vocab."""

    def _zebra_world(self):
        # 6 main docs establish zebra<->quagga co-occurrence; filler docs
        # keep idf meaningful
        main = [["zebra", "quagga", "savanna"] for _ in range(6)]
        main += [[f"filler{i}", f"x{i % 7}"] for i in range(40)]
        ids = [f"m{i}" for i in range(len(main))]
        return main, ids

    @staticmethod
    def _positive_ids(seg, query, k=20):
        """Docids with score > 0 — docs matching NO query/expansion term
        score 0 under the full-head matmul (not -inf), so membership in a
        wide top-k alone cannot prove a term matched."""
        v, r = seg.topk_tokens([query], k=k)
        ids = seg.docids
        return [ids[x] for x, val in zip(r[0], v[0])
                if np.isfinite(val) and val > 0]

    def test_store_prf_no_delta_matches_model_prf(self):
        """With no delta and no tombstones, store PRF must reproduce
        model-level PRF (same mining formulas, host-pooled).  The fixture
        plants a dominant feedback doc with many PRIVATE terms: their raw
        totals outrank every co-occurring term, so a pure-total mining
        window truncates exactly what min_docs keeps (the count_rank_clamp
        regression — 4 of 5 expansion terms lost before the two-key
        ranking)."""
        import dataclasses

        from tdr.models import BM25Model

        rng = np.random.RandomState(7)
        toks, ids = _docs(rng, 80)
        # dominant doc: matches twice as hard, carries 20 private terms
        toks[0] = ["t1", "t1", "t2"] + [f"private{j}" for j in range(20)]
        # co-occurring expansion signal spread over lighter docs
        for d in (1, 2, 3):
            toks[d] = ["t1", "t2", "shared_a", "shared_b"]
        queries = [["t1", "t2"]] + [
            [f"t{rng.randint(300)}", f"t{rng.randint(300)}"]
            for _ in range(5)]
        model = dataclasses.replace(
            BM25Model.build(toks, ids, index_cfg=CFG), prf=True)
        vm, rm = model.topk_tokens(queries, k=5)
        seg = SegmentedBM25.build(toks, ids, index_cfg=CFG)
        seg.prf = True
        vs, rs = seg.topk_tokens(queries, k=5)
        np.testing.assert_allclose(vs, vm, rtol=1e-4, atol=1e-5)
        # doc agreement wherever the margin beats tie-order noise
        margin = np.abs(vm - np.roll(vm, -1, axis=1)) > 1e-4
        same = (rs == rm) | ~np.isfinite(vm)
        assert (same | ~margin)[:, :-1].all()

    def test_prf_reaches_delta_docs_through_main_feedback(self):
        """Expansion terms mined from MAIN feedback docs must retrieve a
        DELTA doc that shares only the expansion term — the cross-segment
        composition the old refusal forbade."""
        main, ids = self._zebra_world()
        seg = SegmentedBM25.build(main, ids, index_cfg=CFG)
        seg.add_documents([["quagga", "okapi", "reserve"]], ["live1"])
        assert "live1" not in self._positive_ids(seg, ["zebra"])
        seg.prf = True
        assert "live1" in self._positive_ids(seg, ["zebra"])

    def test_prf_counts_cooccurrence_across_segments(self):
        """min_docs co-occurrence is gated on the SUMMED per-segment
        counts: a term appearing once in a main feedback doc and once in a
        delta feedback doc passes min_docs=2."""
        main = [["zebra", "quagga", "plain"],
                ["zebra", "stripe", "plain"]]
        main += [[f"filler{i}"] for i in range(30)]
        ids = [f"m{i}" for i in range(len(main))]
        seg = SegmentedBM25.build(main, ids, index_cfg=CFG)
        # delta doc: zebra + quagga again -> quagga now co-occurs in 2
        # feedback docs, one per segment
        seg.add_documents([["zebra", "quagga", "herd"],
                           ["quagga", "museum"]],
                          ["dq", "dtarget"])
        seg.prf = True
        seg.prf_docs = 4
        seg.prf_min_docs = 2
        # reachable only via the pooled 1+1 count
        assert "dtarget" in self._positive_ids(seg, ["zebra"])

    def test_prf_feedback_excludes_tombstones(self):
        """A deleted doc must not feed expansion: tombstones are filtered
        BEFORE the feedback window."""
        main = [["hot", "poison"]]                    # the doc to delete
        main += [["hot", f"pad{i}"] for i in range(4)]
        main += [["poison", "target"], ["cold", "other"]]
        main += [[f"filler{i}"] for i in range(30)]
        ids = [f"m{i}" for i in range(len(main))]
        seg = SegmentedBM25.build(main, ids, index_cfg=CFG)
        seg.prf = True
        seg.prf_min_docs = 1
        assert "m5" in self._positive_ids(seg, ["hot"], k=30)   # via poison
        seg.delete_documents(["m0"])
        got2 = self._positive_ids(seg, ["hot"], k=30)
        assert "m5" not in got2                       # feedback is live-only
        assert "m0" not in got2

    def test_prf_deterministic(self):
        main, ids = self._zebra_world()
        seg = SegmentedBM25.build(main, ids, index_cfg=CFG)
        seg.add_documents([["quagga", "okapi"]], ["live1"])
        seg.prf = True
        v1, r1 = seg.topk_tokens([["zebra"], ["savanna"]], k=10)
        v2, r2 = seg.topk_tokens([["zebra"], ["savanna"]], k=10)
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(v1, v2)
