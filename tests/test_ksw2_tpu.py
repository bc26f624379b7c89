"""Device extd2 (Pallas wavefront) vs the validated host oracle.

The oracle ops/ksw2.py::extd2 byte-matches ksw2_extd2_sse.c (goldens in
tests/golden/ksw2_cases.json); the device kernel must agree exactly on
(score, cigar) for the gap-fill flag configuration.

Marked `slow`: these run the Pallas kernels with interpret=True, and a
COLD interpret-mode XLA-CPU compile takes minutes per (class, band)
shape on a 1-CPU host.  Run with MM2TPU_RUN_SLOW=1 (the persistent
compile cache in conftest makes repeat runs cheap); the default suite
covers the same DP semantics through the host oracle
(tests/test_ksw2.py) and the CPU device-align pipeline routes to that
oracle (ops/ksw2_tpu._size_classes)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mm2_gb_tpu.ops import ksw2
from mm2_gb_tpu.ops.ksw2_tpu import FillCall, extd2_batch_device

MAT = ksw2.gen_simple_mat(5, 2, 4, 1)
FILL = 0x40000 if hasattr(ksw2, "KSW_EZ_APPROX_MAX") else 0
APPROX = ksw2.KSW_EZ_APPROX_MAX
RIGHT = ksw2.KSW_EZ_RIGHT


def _rand_pair(rng, qlen, tlen, div=0.1):
    base = rng.integers(0, 4, max(qlen, tlen)).astype(np.uint8)
    t = base[:tlen].copy()
    q = base[:qlen].copy()
    n_mut = int(qlen * div)
    if n_mut:
        pos = rng.integers(0, qlen, n_mut)
        q[pos] = rng.integers(0, 4, n_mut).astype(np.uint8)
    return q, t


def _check(calls, flag, q=4, e=2, q2=24, e2=1):
    got = extd2_batch_device(calls, MAT, q, e, q2, e2, flag, interpret=True)
    for c, g in zip(calls, got):
        want = ksw2.extd2(c.qseq, c.tseq, MAT, q, e, q2, e2, c.w, -1, 0, flag)
        assert g.score == want.score, (len(c.qseq), len(c.tseq), c.w)
        assert np.array_equal(g.cigar, want.cigar), \
            (len(c.qseq), len(c.tseq), c.w)


@pytest.mark.parametrize("qlen,tlen,w", [
    (40, 40, 751), (100, 97, 751), (128, 128, 50), (357, 402, 751),
    (500, 480, 100), (512, 512, 751), (33, 200, 751), (200, 33, 751),
])
def test_device_extd2_matches_oracle(qlen, tlen, w):
    rng = np.random.default_rng(qlen * 1000 + tlen)
    q, t = _rand_pair(rng, qlen, tlen)
    _check([FillCall(q, t, w, False)], APPROX)


def test_device_extd2_right_flag():
    rng = np.random.default_rng(7)
    q, t = _rand_pair(rng, 260, 255)
    _check([FillCall(q, t, 751, True)], APPROX | RIGHT)


def test_device_extd2_batch_mixed_sizes():
    rng = np.random.default_rng(11)
    calls = []
    for qlen, tlen in [(60, 63), (300, 290), (700, 710), (129, 1025)]:
        q, t = _rand_pair(rng, qlen, tlen, div=0.15)
        calls.append(FillCall(q, t, 751, False))
    _check(calls, APPROX)


def test_device_extd2_with_ambiguous_bases():
    rng = np.random.default_rng(13)
    q, t = _rand_pair(rng, 150, 150)
    q[10:14] = 4
    t[70:75] = 4
    _check([FillCall(q, t, 751, False)], APPROX)


def test_device_extd2_indels():
    rng = np.random.default_rng(17)
    t = rng.integers(0, 4, 400).astype(np.uint8)
    q = np.concatenate([t[:150], t[190:]]).astype(np.uint8)  # 40bp deletion
    _check([FillCall(q, t, 751, False)], APPROX)
    q2 = np.concatenate([t[:200],
                         rng.integers(0, 4, 25).astype(np.uint8),
                         t[200:]])  # 25bp insertion
    _check([FillCall(q2, t, 751, False)], APPROX)


def test_device_extd2_narrow_band_collapse_falls_back():
    # |qlen - tlen| > w collapses the band: host fallback must kick in
    rng = np.random.default_rng(19)
    q, t = _rand_pair(rng, 50, 400)
    _check([FillCall(q, t, 10, False)], APPROX)


def test_device_extd2_asymmetric_penalties_swap():
    # q2+e2 < q+e triggers the cost swap (extd2:96-99)
    rng = np.random.default_rng(23)
    q, t = _rand_pair(rng, 200, 200)
    _check([FillCall(q, t, 751, False)], APPROX, q=24, e=1, q2=4, e2=2)


def test_device_extd2_host_backtrack_mode():
    rng = np.random.default_rng(29)
    q, t = _rand_pair(rng, 220, 230)
    calls = [FillCall(q, t, 751, False)]
    got = extd2_batch_device(calls, MAT, 4, 2, 24, 1, APPROX,
                             interpret=True, backtrack="host")
    want = ksw2.extd2(q, t, MAT, 4, 2, 24, 1, 751, -1, 0, APPROX)
    assert got[0].score == want.score
    assert np.array_equal(got[0].cigar, want.cigar)


# ---------------------------------------------- extension (EXTZ_ONLY) mode
from mm2_gb_tpu.ops.ksw2_tpu import ext_batch_device

EXTO = ksw2.KSW_EZ_EXTZ_ONLY
REVC = ksw2.KSW_EZ_REV_CIGAR


def _check_ext(calls, flag, end_bonus=-1, q=4, e=2, q2=24, e2=1):
    got = ext_batch_device(calls, MAT, q, e, q2, e2, flag, end_bonus,
                           interpret=True)
    for c, g in zip(calls, got):
        want = ksw2.extd2(c.qseq, c.tseq, MAT, q, e, q2, e2, c.w,
                          c.zdrop, end_bonus, flag)
        assert (g.score, g.max, g.max_t, g.max_q, g.mqe, g.mqe_t,
                g.zdropped, g.reach_end) == \
               (want.score, want.max, want.max_t, want.max_q, want.mqe,
                want.mqe_t, want.zdropped, want.reach_end), \
            (len(c.qseq), len(c.tseq), c.w, c.zdrop)
        assert np.array_equal(g.cigar, want.cigar), \
            (len(c.qseq), len(c.tseq), c.w, c.zdrop)


@pytest.mark.parametrize("qlen,tlen", [(80, 90), (300, 280), (511, 700)])
def test_device_extension_matches_oracle(qlen, tlen):
    rng = np.random.default_rng(qlen)
    q, t = _rand_pair(rng, qlen, tlen)
    _check_ext([FillCall(q, t, 500, False, 400)], EXTO)


def test_device_extension_right_rev():
    # the left-extension configuration (align.c:700-711)
    rng = np.random.default_rng(41)
    q, t = _rand_pair(rng, 250, 260)
    _check_ext([FillCall(q[::-1].copy(), t[::-1].copy(), 500, True, 400)],
               EXTO | ksw2.KSW_EZ_RIGHT | REVC)


def test_device_extension_zdrop_triggers():
    # matched head then unrelated tail: the DP must Z-drop mid-matrix
    rng = np.random.default_rng(43)
    base = rng.integers(0, 4, 1200).astype(np.uint8)
    q = base[:1000].copy()
    t = base[:1200].copy()
    q[500:] = rng.integers(0, 4, 500).astype(np.uint8)  # diverge tail
    calls = [FillCall(q, t, 500, False, 100)]
    want = ksw2.extd2(q, t, MAT, 4, 2, 24, 1, 500, 100, -1, EXTO)
    assert want.zdropped    # the case must actually trigger
    _check_ext(calls, EXTO)


def test_device_extension_reach_end():
    # near-identical pair with end bonus: extension reaches the query end
    rng = np.random.default_rng(47)
    q, t = _rand_pair(rng, 200, 210, div=0.02)
    want = ksw2.extd2(q, t, MAT, 4, 2, 24, 1, 500, 400, 10, EXTO)
    assert want.reach_end
    _check_ext([FillCall(q, t, 500, False, 400)], EXTO, end_bonus=10)


# ----------------------------------------------------------- splice (exts2)
def _mk_splice_case(seed, rev=False):
    r = np.random.default_rng(seed)
    n_ex = int(r.integers(1, 4))
    qs = r.integers(0, 4, size=int(r.integers(80, 300))).astype(np.uint8)
    t = []
    bnds = (np.sort(r.choice(np.arange(1, len(qs) - 1), size=n_ex - 1,
                             replace=False)) if n_ex > 1 else [])
    pieces = np.split(qs, bnds)
    for k, p in enumerate(pieces):
        p = p.copy()
        mask = r.random(len(p)) < 0.05
        p[mask] = r.integers(0, 4, size=int(mask.sum()))
        t.append(p)
        if k < len(pieces) - 1:
            ilen = int(r.integers(60, 400))
            intr = r.integers(0, 4, size=ilen).astype(np.uint8)
            if not rev:
                intr[0], intr[1] = 2, 3
                intr[-2], intr[-1] = 0, 2
            else:
                intr[0], intr[1] = 2, 0
                intr[-2], intr[-1] = 3, 2
            t.append(intr)
    return qs, np.concatenate(t).astype(np.uint8)


@pytest.mark.parametrize("extra,rev", [
    (0, False),
    (ksw2.KSW_EZ_SPLICE_FLANK, False),
    (ksw2.KSW_EZ_RIGHT, False),
    (ksw2.KSW_EZ_SPLICE_REV | ksw2.KSW_EZ_SPLICE_FLANK, False),
    (ksw2.KSW_EZ_REV_CIGAR, True),
])
def test_device_exts2_matches_oracle(extra, rev):
    """Splice fills on device == ops/ksw2_splice.exts2 oracle, incl. BED
    junction bonuses and every splice flag variant."""
    from mm2_gb_tpu.ops import ksw2_splice as S
    from mm2_gb_tpu.ops.ksw2_tpu import FillCall, exts2_batch_device
    mat = ksw2.gen_simple_mat(5, 1, 2, 1)
    q_, e_, q2_, noncan, jb = 2, 1, 32, 9, 9
    flag = ksw2.KSW_EZ_APPROX_MAX | ksw2.KSW_EZ_SPLICE_FOR | extra
    calls, oracles, juncs = [], [], []
    for seed in range(4):
        qs, ts = _mk_splice_case(50 + seed, rev)
        r = np.random.default_rng(seed)
        junc = (r.integers(0, 4, size=len(ts)).astype(np.uint8)
                if seed % 2 else None)
        calls.append(FillCall(qs, ts, -1,
                              bool(flag & ksw2.KSW_EZ_RIGHT), -1))
        juncs.append(junc)
        oracles.append(S.exts2(qs, ts, mat, q_, e_, q2_, noncan, -1, jb,
                               flag, junc))
    devs = exts2_batch_device(calls, mat, q_, e_, q2_, noncan, jb, flag,
                              juncs, interpret=True)
    for o, d in zip(oracles, devs):
        assert o.score == d.score
        assert np.array_equal(np.asarray(o.cigar, np.uint32),
                              np.asarray(d.cigar, np.uint32))


def test_chain_kernel_is_cdna_matches_oracle():
    """is_cdna chain scoring (splice presets) on device == host oracle
    (comput_sc lchain.c:128-133 deletion branch)."""
    from mm2_gb_tpu.ops import chain as chain_ops
    from mm2_gb_tpu.ops import chain_tpu
    rng = np.random.default_rng(21)
    n = 400
    # intron-like jumps: large dr vs dq
    rpos = np.cumsum(rng.integers(1, 60, n)).astype(np.uint64)
    qpos = np.maximum.accumulate(
        np.maximum(np.cumsum(rng.integers(1, 12, n)), 1)).astype(np.uint64)
    ax = rpos
    ay = (np.uint64(15) << np.uint64(32)) | qpos
    bounds = np.array([0, n], np.int64)
    cg = float(np.float32(float(np.float32(0.8)) * 0.01 * 15))
    fd, pd = chain_tpu.dispatch_scores(ax, ay, bounds, 5000, 5000, 500,
                                       5000, cg, 0.0,
                                       is_cdna=True).collect()
    fo, po = chain_ops._chain_dp_scores(ax, ay, 5000, 5000, 500,
                                        2**31 - 1, 5000, np.float32(cg),
                                        np.float32(0.0), True, 1)
    assert np.array_equal(fo, fd)
    assert np.array_equal(po, pd)
