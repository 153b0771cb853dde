"""`tdr fuse` — RRF over finished submission files (ensembling surface).

The library-level fusion (tdr.rank.rrf_fuse) is covered in
test_components.py; these pin the CLI round trip: read both submission
formats, align by query id, weight engines, validate the fused output.
"""

import os
import subprocess
import sys

import pytest

from tdr.eval import read_submission, write_submission, validate_submission

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_fuse(*argv):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", "tdr.cli", "fuse", *argv],
        capture_output=True, timeout=120, env=env, cwd=REPO)


class TestReadSubmission:
    def test_roundtrip_both_formats(self, tmp_path):
        ranks = [[f"d{i}_{j}" for j in range(10)] for i in range(4)]
        ids = [f"q{i}" for i in range(4)]
        for wide in (False, True):
            p = str(tmp_path / f"s_{wide}.csv")
            write_submission(ranks, p, ids=ids, k=10, wide=wide)
            got_ids, got = read_submission(p)
            assert got_ids == ids and got == ranks


class TestFuseCli:
    def _subs(self, tmp_path):
        # engine A ranks the target first for even queries, engine B for
        # odd ones; each ranks it 3rd otherwise.  Fill docs are DISJOINT
        # between engines, so the target is the only doc both engines
        # return -> its two reciprocal ranks beat any single-engine doc
        # and fusion puts it first everywhere
        ids = [f"q{i}" for i in range(6)]
        a, b = [], []
        for i in range(6):
            tgt = f"t{i}"
            fa = [f"xa{i}_{j}" for j in range(9)]
            fb = [f"xb{i}_{j}" for j in range(9)]
            a.append([tgt] + fa if i % 2 == 0 else fa[:2] + [tgt] + fa[2:])
            b.append(fb[:2] + [tgt] + fb[2:] if i % 2 == 0 else [tgt] + fb)
        pa, pb = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
        write_submission(a, pa, ids=ids, k=10)
        write_submission(b, pb, ids=ids, k=10, wide=True)  # mixed formats
        return ids, pa, pb

    def test_fuse_mixed_formats(self, tmp_path):
        ids, pa, pb = self._subs(tmp_path)
        out = str(tmp_path / "fused.csv")
        p = _run_fuse("--inputs", pa, pb, "--out", out)
        assert p.returncode == 0, p.stderr.decode()[-400:]
        assert validate_submission(out, expect_k=10) == []
        got_ids, fused = read_submission(out)
        assert got_ids == ids
        for i, row in enumerate(fused):
            assert row[0] == f"t{i}"      # both-engines doc wins everywhere

    def test_fuse_aligns_shuffled_ids(self, tmp_path):
        ids, pa, pb = self._subs(tmp_path)
        # rewrite b with rows in reverse id order
        b_ids, b_ranks = read_submission(pb)
        write_submission(list(reversed(b_ranks)), pb,
                         ids=list(reversed(b_ids)), k=10)
        out = str(tmp_path / "fused.csv")
        p = _run_fuse("--inputs", pa, pb, "--out", out)
        assert p.returncode == 0, p.stderr.decode()[-400:]
        got_ids, fused = read_submission(out)
        assert got_ids == ids             # first input's order
        assert all(fused[i][0] == f"t{i}" for i in range(6))

    def test_fuse_rejects_mismatched_ids(self, tmp_path):
        ids, pa, pb = self._subs(tmp_path)
        b_ids, b_ranks = read_submission(pb)
        write_submission(b_ranks, pb, ids=[f"z{i}" for i in range(6)], k=10)
        p = _run_fuse("--inputs", pa, pb, "--out", str(tmp_path / "f.csv"))
        assert p.returncode == 1

    def test_fuse_rejects_bad_weights_cleanly(self, tmp_path):
        ids, pa, pb = self._subs(tmp_path)
        p = _run_fuse("--inputs", pa, pb, "--out", str(tmp_path / "f.csv"),
                      "--weights", "1;2")
        assert p.returncode == 1
        assert b"Traceback" not in p.stderr
        assert b"comma-separated" in p.stderr

    def test_fuse_rejects_single_input(self, tmp_path):
        ids, pa, pb = self._subs(tmp_path)
        p = _run_fuse("--inputs", pa, "--out", str(tmp_path / "f.csv"))
        assert p.returncode == 1 and b"at least two" in p.stderr

    def test_fuse_rejects_shallow_inputs_before_writing(self, tmp_path):
        ids, pa, pb = self._subs(tmp_path)
        a_ids, a_ranks = read_submission(pa)
        write_submission([r[:5] for r in a_ranks], pa, ids=a_ids, k=5)
        out = tmp_path / "f.csv"
        p = _run_fuse("--inputs", pa, pb, "--out", str(out))
        assert p.returncode == 1
        assert not out.exists()          # nothing half-valid left behind
        assert b"--k is 10" in p.stderr

    def test_fuse_rejects_duplicate_ids(self, tmp_path):
        ids, pa, pb = self._subs(tmp_path)
        a_ids, a_ranks = read_submission(pa)
        a_ids[1] = a_ids[0]
        write_submission(a_ranks, pa, ids=a_ids, k=10)
        p = _run_fuse("--inputs", pa, pb, "--out", str(tmp_path / "f.csv"))
        assert p.returncode == 1 and b"duplicate query ids" in p.stderr

    def test_fuse_weights_shift_the_blend(self, tmp_path):
        ids, pa, pb = self._subs(tmp_path)
        out = str(tmp_path / "fused.csv")
        # weight engine A overwhelmingly: fused == A's ranking
        p = _run_fuse("--inputs", pa, pb, "--out", out,
                      "--weights", "100,1")
        assert p.returncode == 0
        _, fused = read_submission(out)
        _, a = read_submission(pa)
        assert fused == [r[:10] for r in a]
