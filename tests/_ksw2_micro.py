"""Canonical micro-shape device-alignment cases for the DEFAULT suite.

A cold interpret-mode XLA-CPU compile of the ksw2 Pallas kernels takes
minutes per (class, band) shape, so the full kernel-logic battery
(tests/test_ksw2_tpu.py) is slow-marked.  To keep at least one REAL
extd2 and exts2 interpret case in every default `pytest tests/` run
(reference culture: always-on device-vs-gold checkers, gpu/debug.h:35-39),
the compiled executables for the two cases below are shipped in
tests/data/jaxcache/ with a jaxlib-versioned manifest;
tools/build_test_cache.py regenerates them.

The case definitions live here so the builder and the test can never
drift apart: any change to shapes or statics goes through this module.
"""

import numpy as np

# fixed inputs: sizes chosen to hit the small (128) size class with
# band w=32; divergence pattern exercises X/I/D ops and a zdrop miss
_RNG = np.random.default_rng(20260818)
QSEQ = _RNG.integers(0, 4, 90).astype(np.uint8)
TSEQ = np.concatenate([QSEQ[:40], _RNG.integers(0, 4, 12).astype(np.uint8),
                       QSEQ[40:]]).astype(np.uint8)
W_BAND = 32

# extd2 statics (map-ont gap model)
EXTD2 = dict(q=4, e=2, q2=24, e2=1)
# exts2 statics (splice gap model)
EXTS2 = dict(q=6, e=2, q2=32, noncan=9, junc_bonus=0)


def run_extd2(interpret=True):
    from mm2_gb_tpu.ops import ksw2, ksw2_tpu
    mat = ksw2.gen_simple_mat(5, 2, -4, 1)
    flag = ksw2.KSW_EZ_APPROX_MAX
    calls = [ksw2_tpu.FillCall(QSEQ, TSEQ, W_BAND, False, -1)]
    got = ksw2_tpu.extd2_batch_device(calls, mat, EXTD2["q"], EXTD2["e"],
                                      EXTD2["q2"], EXTD2["e2"], flag,
                                      interpret=interpret)[0]
    want = ksw2.extd2(QSEQ, TSEQ, mat, EXTD2["q"], EXTD2["e"], EXTD2["q2"],
                      EXTD2["e2"], W_BAND, -1, 0, flag)
    return got, want


def run_exts2(interpret=True):
    from mm2_gb_tpu.ops import ksw2, ksw2_splice, ksw2_tpu
    mat = ksw2.gen_simple_mat(5, 2, -4, 1)
    flag = ksw2.KSW_EZ_APPROX_MAX | ksw2.KSW_EZ_SPLICE_FOR
    junc = np.zeros(TSEQ.shape[0], np.uint8)
    calls = [ksw2_tpu.FillCall(QSEQ, TSEQ, -1, False, -1)]
    got = ksw2_tpu.exts2_batch_device(calls, mat, EXTS2["q"], EXTS2["e"],
                                      EXTS2["q2"], EXTS2["noncan"],
                                      EXTS2["junc_bonus"], flag,
                                      [junc], interpret=interpret)[0]
    want = ksw2_splice.exts2(QSEQ, TSEQ, mat, EXTS2["q"], EXTS2["e"],
                             EXTS2["q2"], EXTS2["noncan"], -1,
                             EXTS2["junc_bonus"], flag, junc)
    return got, want


def check(got, want) -> None:
    assert got.score == want.score, (got.score, want.score)
    assert np.array_equal(got.cigar, want.cigar)
