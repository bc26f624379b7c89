"""Device-side fill-operand prep vs the host expansion oracle.

prep_fill_operands / prep_splice_bands are plain XLA gathers (no Pallas),
so they run fast on the CPU backend and belong in the default suite: they
are the byte-critical boundary that lets the --tpu-align path ship
O(seq-bytes) per call over the host link instead of the O(rows x band)
expanded arrays (a 512-class call expands ~500x; a flowcell's fills would
ship ~19.5 GB expanded vs ~150 MB compact).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from mm2_gb_tpu.ops import ksw2
from mm2_gb_tpu.ops.ksw2_tpu import (FillCall, band_width, plan_fill_batch,
                                     plan_fill_light, plan_splice_bands,
                                     prep_fill_operands, prep_splice_bands)


def _rand_calls(rng, nb, ncalls):
    calls = []
    for _ in range(ncalls):
        qlen = int(rng.integers(0, nb + 1))
        tlen = int(rng.integers(0, nb + 1))
        w = int(rng.choice([-1, 16, 51, 200, 751]))
        calls.append(FillCall(rng.integers(0, 5, qlen).astype(np.uint8),
                              rng.integers(0, 5, tlen).astype(np.uint8),
                              w, bool(rng.integers(0, 2)), -1))
    return calls


@pytest.mark.parametrize("nb", [512, 1024])
def test_prep_fill_operands_matches_host_expansion(nb):
    rng = np.random.default_rng(11 + nb)
    for _ in range(8):
        calls = _rand_calls(rng, nb, int(rng.integers(1, 20)))
        wv = max((c.w if c.w >= 0 else max(len(c.qseq), len(c.tseq)))
                 for c in calls)
        W = band_width(wv, nb)
        full = plan_fill_batch(calls, nb, W)
        light = plan_fill_light(calls, nb, W, g_pad=full.n_groups + 1)
        assert np.array_equal(full.dropped, light.dropped)
        qb, tb, qk = prep_fill_operands(
            jax.numpy.asarray(light.meta), jax.numpy.asarray(light.qpad),
            jax.numpy.asarray(light.tpad), wb=W, r_pad=2 * nb)
        G = full.n_groups
        assert np.array_equal(light.meta[:G], full.meta)
        assert np.array_equal(np.asarray(tb)[:G], full.tband)
        assert np.array_equal(np.asarray(qk)[:G], full.qblk)
        assert np.array_equal(np.asarray(qb)[:G], full.qbytes)
        # padded tail groups must be zero (inactive pairs)
        assert not np.asarray(tb)[G:].any()


def test_prep_splice_bands_matches_host_expansion():
    from mm2_gb_tpu.ops import ksw2_splice as S
    rng = np.random.default_rng(77)
    nb = 512
    for _ in range(6):
        raw = _rand_calls(rng, nb, int(rng.integers(1, 12)))
        # the exts2 batch path runs unbanded: w = qlen + tlen
        calls = [FillCall(c.qseq, c.tseq, len(c.qseq) + len(c.tseq),
                          c.right, c.zdrop) for c in raw]
        W = band_width(max(min(len(c.qseq), len(c.tseq)) + 64
                           for c in calls), nb)
        full = plan_fill_batch(calls, nb, W)
        donors, acceptors = [], []
        dpad = np.zeros((full.n_groups, 8, nb + 16), np.int8)
        apad = np.zeros((full.n_groups, 8, nb + 16), np.int8)
        for bi, c in enumerate(calls):
            tl = len(c.tseq)
            nbytes = (tl + 15) // 16 * 16
            don, acc = S._splice_sites(np.asarray(c.tseq, np.uint8), tl,
                                       nbytes, 9, 0,
                                       ksw2.KSW_EZ_SPLICE_FOR, None)
            donors.append(don)
            acceptors.append(acc)
            if not full.dropped[bi]:
                g, pp = divmod(bi, 8)
                dpad[g, pp, :nbytes] = don[:nbytes]
                apad[g, pp, :nbytes] = acc[:nbytes]
        want_d, want_a = plan_splice_bands(full, donors, acceptors)
        got_d, got_a = prep_splice_bands(
            jax.numpy.asarray(full.meta), jax.numpy.asarray(dpad),
            jax.numpy.asarray(apad), wb=W, r_pad=2 * nb)
        assert np.array_equal(np.asarray(got_d), want_d)
        assert np.array_equal(np.asarray(got_a), want_a)


def test_native_fill_check_matches_python():
    """mmt_fill_check (native drop/row-count decisions) is bit-identical
    to the _row_params + block-base validation walk."""
    from mm2_gb_tpu.ops import ksw2_tpu as KT
    from mm2_gb_tpu.utils import native
    if not native.available():
        pytest.skip("native hostkit unavailable")
    rng = np.random.default_rng(17)
    n = 1500
    qlen = rng.integers(0, 900, n) + 1
    tlen = rng.integers(0, 900, n) + 1
    w = np.where(rng.random(n) < 0.3, qlen + tlen,
                 rng.choice([16, 51, 200, 751, 2000], n))
    for W in (256, 384, 512, 1280):
        d_nat, rt_nat = native.fill_check(qlen, tlen, w, W)
        for i in range(n):
            (_rows, st, en, st0, en0, drop,
             r_true) = KT._row_params(int(qlen[i]), int(tlen[i]),
                                      int(w[i]))
            if not drop:
                nblk = (r_true + 31) // 32
                r0s = np.arange(nblk, dtype=np.int64) * 32
                bases = KT._blk_base(st0[np.minimum(r0s, r_true - 1)])
                blk_of = _rows // 32
                if (int((en - bases[blk_of]).max()) >= W
                        or int(np.diff(bases).max(initial=0)) > 48
                        or int(np.diff(bases).min(initial=0)) < 0):
                    drop = True
            assert bool(d_nat[i]) == bool(drop)
            if not drop:
                assert rt_nat[i] == r_true
