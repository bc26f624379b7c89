"""Minimizer sketch unit tests.

The sketch oracle was validated bit-exactly against the reference's
mm_sketch across all bundled sequences and (w, k, HPC) combinations via a
C harness during development; these tests lock in invariants and
cross-check the native C++ implementation against the Python oracle.
"""

import os

import numpy as np
import pytest

from mm2_gb_tpu.ops.sketch import sketch_py
from mm2_gb_tpu.utils import native
from mm2_gb_tpu.utils.fastx import read_fastx


def _pos(y):
    return (int(y) & 0xFFFFFFFF) >> 1


def test_simple_properties():
    seq = "ACGTACGTGGTCAGTCAGGCATGCATGGACTGACTG" * 5
    mm = sketch_py(seq, 5, 7, 0, False)
    assert mm.shape[0] > 0
    # spans are k for non-HPC
    assert np.all((mm[:, 0] & np.uint64(0xFF)) == 7)
    # positions are within range and non-decreasing
    pos = [( int(y) & 0xFFFFFFFF) >> 1 for y in mm[:, 1]]
    assert all(6 <= p < len(seq) for p in pos)
    assert pos == sorted(pos)
    # rid is stored in the high 32 bits of y
    mm2 = sketch_py(seq, 5, 7, 3, False)
    assert np.all((mm2[:, 1] >> np.uint64(32)) == 3)


def test_window_coverage():
    """Every window of w consecutive k-mers must contain >= 1 minimizer."""
    rng = np.random.default_rng(0)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 500))
    w, k = 10, 15
    mm = sketch_py(seq, w, k, 0, False)
    pos = sorted({(int(y) & 0xFFFFFFFF) >> 1 for y in mm[:, 1]})
    # gap between consecutive minimizer end-positions can be at most w
    gaps = np.diff(np.array(pos))
    assert gaps.max(initial=0) <= w


def test_ambiguous_bases_reset():
    seq = "ACGTACGTACGTACG" + "N" * 3 + "TGCATGCATGCATGC"
    mm = sketch_py(seq, 3, 5, 0, False)
    # no k-mer may span the N run
    for y in mm[:, 1]:
        p = _pos(y)
        assert not (15 <= p < 18 + 4)


def test_hpc_spans():
    seq = "AAACCCGGGTTTAAACCCGGGTTTAAACCCGGG"
    mm = sketch_py(seq, 3, 4, 0, True)
    spans = (mm[:, 0] & np.uint64(0xFF)).astype(int)
    assert np.all(spans >= 4)  # HPC spans cover whole homopolymer runs


@pytest.mark.skipif(not native.available(), reason="native hostkit not built")
def test_native_matches_python(ref_test_dir):
    for fa in ("MT-human.fa", "q-inv.fa"):
        for (w, k, hpc) in [(10, 15, False), (19, 19, False), (10, 19, True)]:
            for rec in read_fastx(os.path.join(ref_test_dir, fa)):
                a = sketch_py(rec.seq, w, k, rec.rid, hpc)
                b = native.sketch(rec.seq.encode(), w, k, rec.rid, hpc)
                assert np.array_equal(a, b)
