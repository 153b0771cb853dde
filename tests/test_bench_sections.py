"""bench.py section functions must run end-to-end (the driver captures the
round artifact from them; a crash in any section loses the whole bench).
Tiny CPU shapes — these pin wiring, not performance."""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

import bench  # noqa: E402


def test_kernel_roofline_section():
    from tdr.models import BM25Model
    from tdr.utils.config import IndexConfig

    rng = np.random.RandomState(0)
    docs = [[f"t{rng.randint(300)}" for _ in range(rng.randint(5, 30))]
            for _ in range(200)]
    m = BM25Model.build(docs, [f"d{i}" for i in range(200)],
                        index_cfg=IndexConfig(doc_pad_multiple=8,
                                              nnz_pad_multiple=64))
    out = bench._kernel_roofline(m, batch=8, peak_gbps=819.0)
    for key in ("kernel_ms_per_batch", "kernel_approx_ms_per_batch",
                "kernel_int8_ms_per_batch", "kernel_int8_approx_ms_per_batch",
                "kernel_int8_top10_overlap", "roofline_frac",
                "hbm_utilization"):
        assert key in out, key
    assert out["kernel_int8_top10_overlap"] > 0.5
    assert out["model_bytes_per_batch"] > 0


def test_dense_search_section():
    out = bench._dense_search_bench(n_docs=1024, dim=32, batch=8, n_rep=4)
    for key in ("dense_flat_qps", "dense_flat_approx_top10_overlap",
                "dense_flat_int8_top10_overlap", "dense_ivf_qps_nprobe16",
                "dense_ivf_sq8_qps_nprobe16", "dense_ivf_sq8_top10_overlap"):
        assert key in out, key
    assert out["dense_flat_int8_top10_overlap"] >= 0.8
    assert out["dense_ivf_sq8_top10_overlap"] >= 0.8
