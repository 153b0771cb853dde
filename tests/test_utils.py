"""Utility-layer tests: config round-trip, tracer, jax cache helper."""

import json
import os

import pytest

from tdr.utils.config import BM25Config, DenseConfig, IndexConfig, TdrConfig
from tdr.utils.trace import Tracer, phase_timer


class TestConfig:
    def test_json_roundtrip(self):
        cfg = TdrConfig()
        text = cfg.to_json()
        back = TdrConfig.from_json(text)
        assert back.bm25.k1 == cfg.bm25.k1
        assert back.index.head_budget_bytes == cfg.index.head_budget_bytes
        assert back.dense.dim == cfg.dense.dim

    def test_partial_json_overrides(self):
        back = TdrConfig.from_json(json.dumps({
            "bm25": {"k1": 2.0, "idf_variant": "classic"},
            "dense": {"dim": 128},
        }))
        assert back.bm25.k1 == 2.0
        assert back.bm25.idf_variant == "classic"
        assert back.bm25.b == 0.75          # default preserved
        assert back.dense.dim == 128
        assert back.index.min_df == 1

    def test_unknown_keys_ignored(self):
        back = TdrConfig.from_json(json.dumps({"bm25": {"nonsense": 1}}))
        assert back.bm25.k1 == 1.5

    def test_reference_constants_as_defaults(self):
        """Defaults pin the reference's constants (SURVEY.md §5 config table)."""
        cfg = TdrConfig()
        assert (cfg.bm25.k1, cfg.bm25.b) == (1.5, 0.75)
        assert cfg.retrieval.top_k == 10
        assert cfg.retrieval.candidates == 200
        assert cfg.retrieval.max_candidates == 1000
        assert cfg.dense.svd_dim == 256
        assert cfg.data.split_seed == 42
        assert cfg.data.val_fraction == 0.1


class TestTracer:
    def test_nested_spans_and_report(self):
        t = Tracer("run")
        with t.span("outer", n=1):
            with t.span("inner"):
                pass
        tree = t.finish()
        assert tree["name"] == "run"
        assert tree["children"][0]["name"] == "outer"
        assert tree["children"][0]["meta"] == {"n": 1}
        assert tree["children"][0]["children"][0]["name"] == "inner"
        report = t.report()
        assert "outer" in report and "inner" in report

    def test_dump(self, tmp_path):
        t = Tracer("run")
        with t.span("phase"):
            pass
        p = str(tmp_path / "trace.json")
        t.dump(p)
        assert json.load(open(p))["children"][0]["name"] == "phase"

    def test_phase_timer_sink(self):
        sink = {}
        with phase_timer("stage", sink):
            pass
        assert "stage" in sink and sink["stage"] >= 0


class TestJaxCache:
    def test_enable_creates_dir(self, tmp_path, monkeypatch):
        from tdr.utils.jax_cache import enable

        d = str(tmp_path / "cache")
        enable(d)
        assert os.path.isdir(d)
        import jax

        assert jax.config.jax_compilation_cache_dir == d
