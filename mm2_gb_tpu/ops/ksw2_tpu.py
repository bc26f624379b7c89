"""Device-side ksw2 extd2 (dual affine-gap extension DP) as a Pallas kernel.

This is the TPU realisation of SURVEY.md section 2's "second Pallas target
family" (ksw2_extd2_sse.c, the kernel behind every gap fill under -c).  The
reference computes one striped-SIMD row per target base on the CPU
(ksw2_extd2_sse.c:9-402); mm2-gb leaves alignment on the CPU entirely.  Here
the DP runs on the TPU VPU as an anti-diagonal wavefront:

  * 8 alignment pairs are packed into the 8 VPU sublanes; their state
    vectors u, v, x, y, x2, y2, s (the int8 difference formulation) live
    full-width as (8, NB) int32 arrays in VMEM, and one grid step advances
    32 anti-diagonals (statically unrolled),
  * the band window [st, en] of each anti-diagonal, the boundary constants
    and the score-row store span are pure functions of r computed as (8, 1)
    vector columns -- no scalar-unit work and no dynamic vector addressing,
  * the reversed-query register stq advances by a constant roll(+1) per row
    with one byte per pair (qseq[r], streamed in 32-column blocks) patched
    into lane 0, reproducing the reference's q[qlen-1-r+t] diagonal gather,
  * direction bytes (the backtrack matrix p) stream to HBM one
    (32 rows x 8 pairs) block per grid step; the traceback itself stays on
    the host (mm2-gb makes the same split for chaining: GPU scores, host
    backtrack, plchain.cu:99-150).

Byte-exactness: the update order, the 16-lane-aligned stale windows, the
unaligned 16-byte score-row store span and the boundary fallbacks follow
ops/ksw2.py::extd2 (the validated oracle for ksw2_extd2_sse.c) exactly;
see the oracle for the line-by-line correspondence.  Scope: the gap-fill
configuration (cigar + KSW_EZ_APPROX_MAX, optional KSW_EZ_RIGHT, no in-DP
Z-drop), which is every align_pair call in the hot loop (align.c:744-758).
Left/right extensions (EXTZ_ONLY + full H tracking) stay on the host.

Scope note: the single-gap-cost configuration (q==q2 AND e==e2, the
ksw2_extz2_sse kernel) intentionally stays on the host oracle: no preset
uses it (it needs explicit single-valued -O AND -E), and its byte
semantics differ structurally (biased unsigned-saturating int8 updates,
score clamp, a separate wl/wr window model with in-DP band collapse),
so it would be a third full kernel for a rare flag combination.
_use_device_align gates it to the host (pipeline.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np

from mm2_gb_tpu.ops import ksw2

try:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_JAX = True
except Exception:  # pragma: no cover
    _HAS_JAX = False

ROWS_PER_STEP = 32
PAIRS_PER_GROUP = 8
KSW_NEG_INF_I32 = -0x40000000
SIZE_CLASSES = (512, 1024, 2048, 4096)
# real-device ladder adds small classes: most gap fills are tens to a
# few hundred bp, and a 90 bp fill in the 512 class walks 1024 padded
# rows x 512 lanes — 16x the work and bytes of the 64 class.  The
# interpret ladder keeps the historical classes so the shipped test
# cache and the slow kernel battery stay valid (small classes are
# hardware-smoked via tools/chip_smoke.py instead).
DEVICE_SIZE_CLASSES = (64, 128, 256) + SIZE_CLASSES


def _size_classes(interpret) -> tuple:
    """Size classes available to a batch; () routes every call to the
    per-call host-oracle fallback.

    "oracle" (the implicit CPU-backend resolution) disables the device
    classes entirely: a single cold interpret-mode compile of these
    kernels takes MINUTES of XLA CPU time per (class, band) shape, and
    the host oracle is byte-identical by construction — CPU pipelines
    (fuzz --tpu-align seeds, CPU meshes, the test suite) lose nothing
    but the wait.  Explicit interpret=True (kernel-logic validation,
    tests/test_ksw2_tpu.py) keeps the ladder, capped at 1024 by default
    because the 2048/4096 interpret compiles are the slowest of all;
    MM2TPU_INTERPRET_MAX_CLASS overrides the cap."""
    if interpret == "oracle":
        return ()
    if not interpret:
        return DEVICE_SIZE_CLASSES
    import os
    cap = int(os.environ.get("MM2TPU_INTERPRET_MAX_CLASS", "1024"))
    return (tuple(s for s in DEVICE_SIZE_CLASSES if s <= cap)
            or DEVICE_SIZE_CLASSES[:1])
SCORE_LANES = 128

# flowcell-scale fill accounting (planalyze analog for the fill path):
# batch functions accumulate here; the pipeline snapshots deltas into
# TpuMetrics and -v 3 prints fill_gcells_s (useful cells / device wait).
FILL_STATS = {"wait_s": 0.0, "walked_cells": 0, "useful_cells": 0,
              "chunks": 0, "calls": 0, "host_calls": 0,
              "plan_s": 0.0, "enqueue_s": 0.0}


def fill_stats_snapshot() -> dict:
    return dict(FILL_STATS)


def _fill_acc(**kw) -> None:
    for k, v in kw.items():
        FILL_STATS[k] += v


# --------------------------------------------------------------------- plan
@dataclass
class FillCall:
    """One alignment request (qseq, tseq uint8 codes 0..4)."""
    qseq: np.ndarray
    tseq: np.ndarray
    w: int
    right: bool
    zdrop: int = -1


@dataclass
class FillPlan:
    nb: int
    r_pad: int
    n_groups: int
    w_band: int = 0
    calls: list = field(default_factory=list)
    meta: np.ndarray | None = None      # (G, 8, 8) int32: qlen/tlen/w/R/zd
    qbytes: np.ndarray | None = None    # (G, RB, 8, 32) int32: stq lane-0
    tband: np.ndarray | None = None     # (G, RB, 8, W) uint8: tseq band
    qblk: np.ndarray | None = None      # (G, RB, 8, W) uint8: stq at row0
    dropped: np.ndarray | None = None   # (B,) bool: band collapsed
    qpad: np.ndarray | None = None      # (G, 8, nb+1) uint8 (light plan)
    tpad: np.ndarray | None = None      # (G, 8, nb+1) uint8 (light plan)


def _row_params(qlen: int, tlen: int, w: int):
    """Host-side band windows (ksw2._row_window) for the backtrack adapter."""
    r_true = qlen + tlen - 1
    rows = np.arange(r_true, dtype=np.int64)
    st0 = np.maximum.reduce([np.zeros_like(rows), rows - qlen + 1,
                             (rows - w + 1) >> 1])
    en0 = np.minimum.reduce([np.full_like(rows, tlen - 1), rows,
                             (rows + w) >> 1])
    ok = st0 <= en0
    dropped = not bool(ok.all())
    if dropped:
        r_true = int(np.argmin(ok))        # first empty window
        rows = rows[:r_true]
        st0, en0 = st0[:r_true], en0[:r_true]
    st = st0 // 16 * 16
    en = (en0 + 16) // 16 * 16 - 1
    return rows, st, en, st0, en0, dropped, r_true


from mm2_gb_tpu.ops.chain_tpu import _interpret  # noqa: E402  (single
# backend check shared with the chain kernels)


def band_width(w: int, nb: int) -> int:
    """Band-compressed state width: window span + rebase margins.
    Floor 256 also for the sub-256 classes: W must cover the class's
    window extent plus the 48-lane rebase margin (the planner drops any
    call whose wall exceeds W)."""
    want = (min(w, nb) + 160 + 127) // 128 * 128
    return min(max(nb, 256), max(256, want))


def _blk_base(st0_blk0: np.ndarray) -> np.ndarray:
    return np.maximum(st0_blk0 // 16 * 16 - 16, 0)


def plan_fill_batch(calls: list[FillCall], nb: int, w_band: int) -> FillPlan:
    """Pack calls of one (size, band-width) class into device arrays
    (8 pairs/group).  State lives in band coordinates: per 32-row block,
    lane j maps to t = base(block) + j with base recomputed from the
    window formula; tband/qblk carry the target and diagonal-query bytes
    for each block's window."""
    P = PAIRS_PER_GROUP
    W = w_band
    r_pad = 2 * nb
    rb = r_pad // ROWS_PER_STEP
    G = (len(calls) + P - 1) // P
    plan = FillPlan(nb=nb, r_pad=r_pad, n_groups=G, w_band=W, calls=calls)
    meta = np.zeros((G, 8, P), np.int32)
    meta[:, 4, :] = -1
    qbytes = np.zeros((G, rb, P, ROWS_PER_STEP), np.int32)
    tband = np.zeros((G, rb, P, W), np.uint8)
    qblk = np.zeros((G, rb, P, W), np.uint8)
    dropped = np.zeros(len(calls), bool)
    jj = np.arange(W, dtype=np.int64)
    for bi, c in enumerate(calls):
        g, pp = divmod(bi, P)
        qlen, tlen = len(c.qseq), len(c.tseq)
        w = c.w if c.w >= 0 else max(qlen, tlen)
        rows, st, en, st0, en0, drop, r_true = _row_params(qlen, tlen, w)
        if not drop:
            # per-block base + coverage/rebase-step validation
            nblk = (r_true + ROWS_PER_STEP - 1) // ROWS_PER_STEP
            r0s = np.arange(nblk, dtype=np.int64) * ROWS_PER_STEP
            bases = _blk_base(st0[np.minimum(r0s, r_true - 1)])
            blk_of = rows // ROWS_PER_STEP
            if (int((en - bases[blk_of]).max()) >= W
                    or int(np.diff(bases).max(initial=0)) > 48
                    or int(np.diff(bases).min(initial=0)) < 0):
                drop = True
        dropped[bi] = drop
        if drop:          # caller falls back to the host kernel
            continue
        meta[g, :4, pp] = (qlen, tlen, w, r_true)
        meta[g, 4, pp] = c.zdrop
        qpad = np.zeros(qlen + 1, np.uint8)
        qpad[:qlen] = c.qseq
        tpad = np.zeros(tlen + 1, np.uint8)
        tpad[:tlen] = c.tseq
        for blk in range(nblk):
            base = int(bases[blk])
            r0 = blk * ROWS_PER_STEP
            tband[g, blk, pp, :] = tpad[np.minimum(base + jj, tlen)]
            qi = r0 - base - jj           # stq[j] = qseq[r0 - base - j]
            qblk[g, blk, pp, :] = np.where(
                (qi >= 0) & (qi < qlen), c.qseq[np.clip(qi, 0, qlen - 1)], 0)
            ri = r0 + np.arange(ROWS_PER_STEP) - base
            qbytes[g, blk, pp, :] = np.where(
                (ri >= 0) & (ri < qlen),
                c.qseq[np.clip(ri, 0, qlen - 1)], 0)
    plan.meta = meta
    plan.qbytes = qbytes
    plan.tband = tband
    plan.qblk = qblk
    plan.dropped = dropped
    return plan


def plan_fill_light(calls: list[FillCall], nb: int, w_band: int,
                    g_pad: int | None = None) -> FillPlan:
    """Host side of the device-prep fill path: meta + COMPACT padded
    sequences only.  The (rows x band) expansion that plan_fill_batch
    does on the host (tband/qblk/qbytes) is instead computed on device
    by prep_fill_operands, so the link ships O(qlen+tlen) bytes per call
    instead of O(r_pad*W) — the 512 class expands a 100 bp gap fill to
    512 KB, ~500x its sequence bytes.  `g_pad` pads the group count to a
    fixed micro-batch so every chunk reuses one compiled executable."""
    P = PAIRS_PER_GROUP
    G = (len(calls) + P - 1) // P
    if g_pad is not None:
        assert G <= g_pad
        G = g_pad
    plan = FillPlan(nb=nb, r_pad=2 * nb, n_groups=G, w_band=w_band,
                    calls=calls)
    meta = np.zeros((G, 8, P), np.int32)
    meta[:, 4, :] = -1
    qpad = np.zeros((G, P, nb + 1), np.uint8)
    tpad = np.zeros((G, P, nb + 1), np.uint8)
    n = len(calls)
    qlens = np.fromiter((len(c.qseq) for c in calls), np.int64, n)
    tlens = np.fromiter((len(c.tseq) for c in calls), np.int64, n)
    ws = np.fromiter(
        (c.w if c.w >= 0 else max(len(c.qseq), len(c.tseq))
         for c in calls), np.int64, n)
    from mm2_gb_tpu.utils import native
    if native.available():
        # one native pass for the drop/row-count decisions (the Python
        # per-call _row_params walk costs ~17 s per flowcell of fills)
        dropped, r_trues = native.fill_check(qlens, tlens, ws, w_band)
    else:
        dropped = np.zeros(n, bool)
        r_trues = np.zeros(n, np.int64)
        for bi in range(n):
            qlen, tlen, w = int(qlens[bi]), int(tlens[bi]), int(ws[bi])
            _rows, st, en, st0, en0, drop, r_true = _row_params(
                qlen, tlen, w)
            if not drop:
                nblk = (r_true + ROWS_PER_STEP - 1) // ROWS_PER_STEP
                r0s = np.arange(nblk, dtype=np.int64) * ROWS_PER_STEP
                bases = _blk_base(st0[np.minimum(r0s, r_true - 1)])
                blk_of = _rows // ROWS_PER_STEP
                if (int((en - bases[blk_of]).max()) >= w_band
                        or int(np.diff(bases).max(initial=0)) > 48
                        or int(np.diff(bases).min(initial=0)) < 0):
                    drop = True
            dropped[bi] = drop
            r_trues[bi] = r_true
    for bi, c in enumerate(calls):
        if dropped[bi]:
            continue
        g, pp = divmod(bi, P)
        qlen, tlen = int(qlens[bi]), int(tlens[bi])
        meta[g, :4, pp] = (qlen, tlen, ws[bi], r_trues[bi])
        meta[g, 4, pp] = c.zdrop
        qpad[g, pp, :qlen] = c.qseq
        tpad[g, pp, :tlen] = c.tseq
    plan.meta = meta
    plan.qpad = qpad
    plan.tpad = tpad
    plan.dropped = dropped
    return plan


@functools.partial(jax.jit, static_argnames=(
    "wb", "r_pad")) if _HAS_JAX else lambda f: f
def prep_fill_operands(meta, qpad, tpad, *, wb, r_pad):
    """Device-side band expansion: reproduce plan_fill_batch's
    tband/qblk/qbytes bit-for-bit from the compact padded sequences.

    All three arrays are (reversed-)contiguous gathers of qpad/tpad at
    offsets that are pure int functions of (qlen, tlen, w, blk), so the
    expansion is three vectorized gathers on device; only the compact
    bytes cross the host link.  Cross-checked against plan_fill_batch in
    tests/test_ksw2_tpu.py."""
    P = PAIRS_PER_GROUP
    rb = r_pad // ROWS_PER_STEP
    G = meta.shape[0]
    qlen = meta[:, 0, :].astype(jnp.int32)          # (G, P)
    tlen = meta[:, 1, :].astype(jnp.int32)
    w = meta[:, 2, :].astype(jnp.int32)
    n_rows = meta[:, 3, :].astype(jnp.int32)
    blk = jnp.arange(rb, dtype=jnp.int32)
    r0 = (blk * ROWS_PER_STEP)[None, None, :]       # (1, 1, rb)
    qlen_ = qlen[:, :, None]
    tlen_ = tlen[:, :, None]
    w_ = w[:, :, None]
    n_rows_ = n_rows[:, :, None]
    r0p = jnp.minimum(r0, n_rows_ - 1)
    st0 = jnp.maximum(jnp.maximum(0, r0p - qlen_ + 1),
                      (r0p - w_ + 1) >> 1)
    base = jnp.maximum(st0 // 16 * 16 - 16, 0)      # (G, P, rb)
    valid = (r0 < n_rows_) & (qlen_ > 0)            # (G, P, rb)
    qp_max = qpad.shape[2] - 1

    j = jnp.arange(wb, dtype=jnp.int32)
    # tband[g, blk, pp, j] = tpad[min(base + j, tlen)]
    idx_t = jnp.minimum(base[:, :, :, None] + j, tlen_[:, :, :, None])
    tband = jnp.where(
        valid[:, :, :, None],
        jnp.take_along_axis(tpad[:, :, None, :], idx_t, axis=3), 0)
    # qblk[g, blk, pp, j] = qseq[r0 - base - j] where 0 <= qi < qlen
    qi = r0[:, :, :, None] - base[:, :, :, None] - j
    qblk = jnp.where(
        valid[:, :, :, None] & (qi >= 0) & (qi < qlen_[:, :, :, None]),
        jnp.take_along_axis(qpad[:, :, None, :],
                            jnp.clip(qi, 0, qp_max), axis=3), 0)
    # qbytes[g, blk, pp, s] = qseq[r0 + s - base] where 0 <= ri < qlen
    s = jnp.arange(ROWS_PER_STEP, dtype=jnp.int32)
    ri = r0[:, :, :, None] + s - base[:, :, :, None]
    qbytes = jnp.where(
        valid[:, :, :, None] & (ri >= 0) & (ri < qlen_[:, :, :, None]),
        jnp.take_along_axis(qpad[:, :, None, :],
                            jnp.clip(ri, 0, qp_max), axis=3), 0)
    # host layout is (G, rb, P, ...)
    return (qbytes.transpose(0, 2, 1, 3).astype(jnp.int32),
            tband.transpose(0, 2, 1, 3),
            qblk.transpose(0, 2, 1, 3))


# ------------------------------------------------------------------- kernel
def _extd2_kernel(meta_ref, qb_ref, tband_ref, qblk_ref, p_ref, score_ref,
                  u_ref, v_ref, x_ref, y_ref, x2_ref, y2_ref,
                  s_ref, stq_ref, d_ref, acc_ref, h_ref, *,
                  wb: int, q: int, e: int, q2: int, e2: int,
                  mat0: int, mat1: int, sc_n: int, right: bool,
                  long_thres: int, long_diff: int, track_h: bool):
    rb = pl.program_id(1)
    P = PAIRS_PER_GROUP
    qe_c = q + e
    q2e2 = q2 + e2
    lane = jax.lax.broadcasted_iota(jnp.int32, (P, wb), 1)

    qlen = meta_ref[0, 0, :].reshape(P, 1)
    tlen = meta_ref[0, 1, :].reshape(P, 1)
    w = meta_ref[0, 2, :].reshape(P, 1)
    n_rows = meta_ref[0, 3, :].reshape(P, 1)
    zdrop = meta_ref[0, 4, :].reshape(P, 1)

    def _window(r):
        st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1), (r - w + 1) >> 1)
        en0 = jnp.minimum(jnp.minimum(tlen - 1, r), (r + w) >> 1)
        return st0, en0

    def _base_at(r0):
        st0, _ = _window(r0)
        return jnp.maximum(st0 // 16 * 16 - 16, 0)

    base = _base_at(rb * ROWS_PER_STEP)            # (P, 1) band origin

    @pl.when(rb == 0)
    def _init():
        u_ref[...] = jnp.full((P, wb), -qe_c, jnp.int32)
        v_ref[...] = jnp.full((P, wb), -qe_c, jnp.int32)
        x_ref[...] = jnp.full((P, wb), -qe_c, jnp.int32)
        y_ref[...] = jnp.full((P, wb), -qe_c, jnp.int32)
        x2_ref[...] = jnp.full((P, wb), -q2e2, jnp.int32)
        y2_ref[...] = jnp.full((P, wb), -q2e2, jnp.int32)
        s_ref[...] = jnp.zeros((P, wb), jnp.int32)
        acc = jnp.zeros((P, SCORE_LANES), jnp.int32)
        if track_h:
            # [2]=score [3]=max [4]=max_t [5]=max_q [6]=mqe [7]=mqe_t
            # [8]=mte [9]=mte_q [10]=dropped (Extz init, ksw2.h:30-39)
            cidx = jax.lax.broadcasted_iota(jnp.int32, (P, SCORE_LANES), 1)
            acc = jnp.where((cidx == 2) | (cidx == 6) | (cidx == 8),
                            KSW_NEG_INF_I32, acc)
            acc = jnp.where((cidx == 4) | (cidx == 5) | (cidx == 7)
                            | (cidx == 9), -1, acc)
            h_ref[...] = jnp.full((P, wb), KSW_NEG_INF_I32, jnp.int32)
        acc_ref[...] = acc

    @pl.when(rb > 0)
    def _rebase():
        # the band origin advances by a 16-multiple <= 48 per block
        # (validated by the planner); roll the persistent state left and
        # reset the freshly exposed right lanes to their init values
        delta = base - _base_at((rb - 1) * ROWS_PER_STEP)
        fresh = lane >= wb - delta

        def shift(arr, init):
            r16 = pltpu.roll(arr, wb - 16, 1)
            r32 = pltpu.roll(arr, wb - 32, 1)
            r48 = pltpu.roll(arr, wb - 48, 1)
            out = jnp.where(delta == 16, r16,
                            jnp.where(delta == 32, r32,
                                      jnp.where(delta == 48, r48, arr)))
            return jnp.where(fresh & (delta > 0), init, out)

        u_ref[...] = shift(u_ref[...], -qe_c)
        v_ref[...] = shift(v_ref[...], -qe_c)
        x_ref[...] = shift(x_ref[...], -qe_c)
        y_ref[...] = shift(y_ref[...], -qe_c)
        x2_ref[...] = shift(x2_ref[...], -q2e2)
        y2_ref[...] = shift(y2_ref[...], -q2e2)
        s_ref[...] = shift(s_ref[...], 0)
        if track_h:
            h_ref[...] = shift(h_ref[...], KSW_NEG_INF_I32)

    # the diagonal query register is a pure function of (r, base):
    # reset from the host-prepared block row, then roll(+1) per row
    stq_ref[...] = qblk_ref[0, 0].astype(jnp.int32)
    tq_seq = tband_ref[0, 0].astype(jnp.int32)
    qb_blk = qb_ref[0, 0]                        # (P, 32) int32

    for i in range(ROWS_PER_STEP):
        r = rb * ROWS_PER_STEP + i
        st0a, en0a = _window(r)                  # absolute t columns
        act = (r < n_rows) & (st0a <= en0a)
        st = st0a // 16 * 16 - base
        en = (en0a + 16) // 16 * 16 - 1 - base
        st0 = st0a - base
        en0 = en0a - base
        lst0a, len0a = _window(r - 1)
        lst = lst0a // 16 * 16 - base
        len_ = (len0a + 16) // 16 * 16 - 1 - base
        x1c = (st > -base) & (lst <= st - 1) & (st - 1 <= len_) \
            & (lst0a <= len0a) & (r > 0)
        sshi = st0 + 16 * ((en0 - st0) // 16 + 1)
        bv_s = jnp.where(r == 0, -qe_c,
                         jnp.where(r < long_thres, -e,
                                   jnp.where(r == long_thres, long_diff,
                                             -e2)))
        bv = jnp.full((P, 1), 1, jnp.int32) * bv_s
        qbyte = qb_blk[:, i].reshape(P, 1)

        mb = (lane >= st) & (lane <= en) & act

        if i > 0:
            stq = jnp.roll(stq_ref[...], 1, axis=1)
            stq = jnp.where(lane == 0, qbyte, stq)
            stq_ref[...] = stq
        else:
            stq = stq_ref[...]

        # score row, stored over the unaligned 16-byte span
        ms = (lane >= st0) & (lane < sshi) & act
        vals = jnp.where(tq_seq == stq, mat0, mat1)
        vals = jnp.where((tq_seq == 4) | (stq == 4), sc_n, vals)
        s = jnp.where(ms, vals, s_ref[...])
        s_ref[...] = s

        u = u_ref[...]
        y = y_ref[...]
        y2 = y2_ref[...]
        pr = (lane == r - base) & (en >= r - base) & act
        y = jnp.where(pr, -qe_c, y)
        y2 = jnp.where(pr, -q2e2, y2)
        u = jnp.where(pr, bv, u)

        # shifted previous-row state with boundary fallbacks
        xt1 = jnp.roll(x_ref[...], 1, axis=1)
        vt1 = jnp.roll(v_ref[...], 1, axis=1)
        x2t1 = jnp.roll(x2_ref[...], 1, axis=1)
        v1_fb = jnp.where(st0a // 16 * 16 == 0, bv, -qe_c)
        fb = (lane == st) & ~x1c
        xt1 = jnp.where(fb, -qe_c, xt1)
        x2t1 = jnp.where(fb, -q2e2, x2t1)
        vt1 = jnp.where(fb, v1_fb, vt1)

        z = s
        a = xt1 + vt1
        b_ = y + u
        a2 = x2t1 + vt1
        b2 = y2 + u
        if right:
            d = jnp.where(z > a, 0, 1).astype(jnp.int32)
            z = jnp.maximum(z, a)
            d = jnp.where(z > b_, d, 2)
            z = jnp.maximum(z, b_)
            d = jnp.where(z > a2, d, 3)
            z = jnp.maximum(z, a2)
            d = jnp.where(z > b2, d, 4)
            z = jnp.maximum(z, b2)
        else:
            d = (a > z).astype(jnp.int32)
            z = jnp.maximum(z, a)
            d = jnp.where(b_ > z, 2, d)
            z = jnp.maximum(z, b_)
            d = jnp.where(a2 > z, 3, d)
            z = jnp.maximum(z, a2)
            d = jnp.where(b2 > z, 4, d)
            z = jnp.maximum(z, b2)
        z = jnp.minimum(z, mat0)
        u_new = z - vt1
        v_new = z - u
        tq = z - q
        a = a - tq
        b_ = b_ - tq
        tq2 = z - q2
        a2 = a2 - tq2
        b2 = b2 - tq2
        if right:
            ta, tb, ta2, tb2 = a >= 0, b_ >= 0, a2 >= 0, b2 >= 0
        else:
            ta, tb, ta2, tb2 = a > 0, b_ > 0, a2 > 0, b2 > 0
        x_new = jnp.where(ta, a, 0) - qe_c
        y_new = jnp.where(tb, b_, 0) - qe_c
        x2_new = jnp.where(ta2, a2, 0) - q2e2
        y2_new = jnp.where(tb2, b2, 0) - q2e2
        d = d | jnp.where(ta, 0x08, 0) | jnp.where(tb, 0x10, 0) \
            | jnp.where(ta2, 0x20, 0) | jnp.where(tb2, 0x40, 0)

        u = jnp.where(mb, u_new, u)
        v = jnp.where(mb, v_new, v_ref[...])
        u_ref[...] = u
        v_ref[...] = v
        x_ref[...] = jnp.where(mb, x_new, x_ref[...])
        y_ref[...] = jnp.where(mb, y_new, y)
        x2_ref[...] = jnp.where(mb, x2_new, x2_ref[...])
        y2_ref[...] = jnp.where(mb, y2_new, y2)
        d_ref[i * P:(i + 1) * P, :] = jnp.where(mb, d, 0).astype(jnp.int8)

        if track_h:
            # full H tracking (oracle extd2 non-approx branch):
            # H[en0] from the previous row's corner, H[st0:en0] += v,
            # then the kernels' 4-lane blocked row argmax + Z-drop
            def msum(arr, cond):
                return jnp.sum(jnp.where(cond, arr, 0), axis=1,
                               keepdims=True)
            H = h_ref[...]
            h_en0 = jnp.where(
                en0a > 0,
                msum(H, lane == en0 - 1) + msum(u, lane == en0),
                msum(H, lane == en0) + msum(v, lane == en0))
            body = (lane >= st0) & (lane < en0)
            Hn = jnp.where(lane == en0, h_en0,
                           jnp.where(body, H + v, H))
            Hn = jnp.where(r == 0,
                           jnp.where(lane == -base, v - qe_c, H), Hn)
            H = jnp.where(act, Hn, H)
            h_ref[...] = H
            # row max with C tie-break ranks: en0 first, body lanes by
            # ((t-st0)%4, (t-st0)//4), tail by position (_row_max)
            en1 = st0 + (en0 - st0) // 4 * 4
            win = (lane >= st0) & (lane <= en0)
            dt = lane - st0
            rank = jnp.where(lane == en0, 0,
                             jnp.where(lane < en1,
                                       1 + (dt & 3) * wb + (dt >> 2),
                                       8 * wb + (lane - en1)))
            m = jnp.max(jnp.where(win, H, KSW_NEG_INF_I32), axis=1,
                        keepdims=True)
            is_m = win & (H == m)
            r_star = jnp.min(jnp.where(is_m, rank, 0x7FFFFFFF), axis=1,
                             keepdims=True)
            row_t = msum(lane, is_m & (rank == r_star)) + base
            row_t = jnp.where(r == 0, 0, row_t)
            m = jnp.where(r == 0, msum(H, lane == -base), m)
            alive = act & (acc_ref[:, 10:11] == 0)
            # mte / mqe (updated u/v row ends)
            mte, mte_q = acc_ref[:, 8:9], acc_ref[:, 9:10]
            h_at_en0 = msum(H, lane == en0)
            upd = alive & (en0a == tlen - 1) & (h_at_en0 > mte)
            acc_ref[:, 8:9] = jnp.where(upd, h_at_en0, mte)
            acc_ref[:, 9:10] = jnp.where(upd, r - (en + base), mte_q)
            mqe, mqe_t = acc_ref[:, 6:7], acc_ref[:, 7:8]
            h_at_st0 = msum(H, lane == st0)
            upd = alive & (r - st0a == qlen - 1) & (h_at_st0 > mqe)
            acc_ref[:, 6:7] = jnp.where(upd, h_at_st0, mqe)
            acc_ref[:, 7:8] = jnp.where(upd, st0a, mqe_t)
            # _apply_zdrop (ksw2.h:167-183, is_rot), e2 as the gap ext
            mx, mx_t, mx_q = (acc_ref[:, 3:4], acc_ref[:, 4:5],
                              acc_ref[:, 5:6])
            row_q = r - row_t
            better = alive & (m > mx)
            acc_ref[:, 3:4] = jnp.where(better, m, mx)
            acc_ref[:, 4:5] = jnp.where(better, row_t, mx_t)
            acc_ref[:, 5:6] = jnp.where(better, row_q, mx_q)
            tl_ = row_t - mx_t
            ql_ = row_q - mx_q
            l_ = jnp.abs(tl_ - ql_)
            drop = alive & ~better & (row_t >= mx_t) & (row_q >= mx_q) \
                & (zdrop >= 0) & (mx - m > zdrop + l_ * e2)
            acc_ref[:, 10:11] = jnp.where(drop, 1, acc_ref[:, 10:11])
            fin = alive & ~drop & (r == n_rows - 1) & (en0a == tlen - 1)
            acc_ref[:, 2:3] = jnp.where(
                fin, msum(H, lane == tlen - 1 - base), acc_ref[:, 2:3])
            continue

        # approx-max H0 walk (oracle extd2 approx branch), vectorized
        # over the 8 pairs: one masked-sum per operand; lt is absolute
        lt = acc_ref[:, 1:2]
        h0 = acc_ref[:, 0:1]
        v_lt = jnp.sum(jnp.where(lane == lt - base, v, 0), axis=1,
                       keepdims=True)
        u_lt1 = jnp.sum(jnp.where(lane == lt + 1 - base, u, 0), axis=1,
                        keepdims=True)
        c1 = (st0a <= lt) & (lt <= en0a)
        c2 = (st0a <= lt + 1) & (lt + 1 <= en0a)
        take_d1 = c1 & c2 & (u_lt1 >= v_lt)
        step = jnp.where(c1 & c2,
                         jnp.where(take_d1, u_lt1, v_lt),
                         jnp.where(c1, v_lt, u_lt1))
        new_lt = jnp.where(take_d1 | ~c1, lt + 1, lt)
        is_r0 = r == 0
        h0n = jnp.where(is_r0, v_lt - qe_c, h0 + step)
        ltn = jnp.where(is_r0, 0, new_lt)
        acc_ref[:, 0:1] = jnp.where(act, h0n, h0)
        acc_ref[:, 1:2] = jnp.where(act, ltn, lt)
        acc_ref[:, 2:3] = jnp.where(act & (r == n_rows - 1), h0n,
                                    acc_ref[:, 2:3])

    p_ref[0, 0, :, :] = d_ref[...]
    score_ref[0, :, :] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=(
    "wb", "r_pad", "q", "e", "q2", "e2", "mat0", "mat1", "sc_n", "right",
    "long_thres", "long_diff", "track_h",
    "interpret")) if _HAS_JAX else lambda f: f
def extd2_fwd_tpu(meta, qbytes, tband, qblk, *, wb, r_pad, q, e, q2, e2,
                  mat0, mat1, sc_n, right, long_thres, long_diff,
                  track_h=False, interpret=False):
    """Batched forward DP in band coordinates; returns (p, acc).

    p: (G, R_pad//32, 32*8, W) int8 direction rows, lane j = t - base(blk).
    acc: (G, 8, SCORE_LANES) int32.  Fill mode: lane 2 = ez.score.
    track_h mode: lanes [2..10] = score, max, max_t, max_q, mqe, mqe_t,
    mte, mte_q, dropped.
    """
    G = meta.shape[0]
    P = PAIRS_PER_GROUP
    rb = r_pad // ROWS_PER_STEP
    kern = functools.partial(
        _extd2_kernel, wb=wb, q=q, e=e, q2=q2, e2=e2,
        mat0=mat0, mat1=mat1, sc_n=sc_n, right=right,
        long_thres=long_thres, long_diff=long_diff, track_h=track_h)
    return pl.pallas_call(
        kern,
        grid=(G, rb),
        in_specs=[
            pl.BlockSpec((1, 8, P), lambda g, r: (g, 0, 0)),
            pl.BlockSpec((1, 1, P, ROWS_PER_STEP), lambda g, r: (g, r, 0, 0)),
            pl.BlockSpec((1, 1, P, wb), lambda g, r: (g, r, 0, 0)),
            pl.BlockSpec((1, 1, P, wb), lambda g, r: (g, r, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ROWS_PER_STEP * P, wb),
                         lambda g, r: (g, r, 0, 0)),
            pl.BlockSpec((1, P, SCORE_LANES), lambda g, r: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, rb, ROWS_PER_STEP * P, wb), jnp.int8),
            jax.ShapeDtypeStruct((G, P, SCORE_LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, wb), jnp.int32),   # u
            pltpu.VMEM((P, wb), jnp.int32),   # v
            pltpu.VMEM((P, wb), jnp.int32),   # x
            pltpu.VMEM((P, wb), jnp.int32),   # y
            pltpu.VMEM((P, wb), jnp.int32),   # x2
            pltpu.VMEM((P, wb), jnp.int32),   # y2
            pltpu.VMEM((P, wb), jnp.int32),   # s
            pltpu.VMEM((P, wb), jnp.int32),   # stq
            pltpu.VMEM((ROWS_PER_STEP * P, wb), jnp.int8),   # d rows
            pltpu.VMEM((P, SCORE_LANES), jnp.int32),         # acc
            pltpu.VMEM((P, wb), jnp.int32),                  # H (track_h)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(meta, qbytes, tband, qblk)


# ------------------------------------------------------- splice (exts2)
def plan_splice_bands(plan: FillPlan, donors: list, acceptors: list
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Band-coordinate donor/acceptor arrays matching plan's tband
    layout: (G, RB, P, W) int8 gathered per 32-row block at the block's
    band origin; positions past tlen keep the host arrays' -noncan pad."""
    P = PAIRS_PER_GROUP
    W = plan.w_band
    rb = plan.r_pad // ROWS_PER_STEP
    G = plan.n_groups
    dband = np.zeros((G, rb, P, W), np.int8)
    aband = np.zeros((G, rb, P, W), np.int8)
    jj = np.arange(W, dtype=np.int64)
    for bi, c in enumerate(plan.calls):
        if plan.dropped[bi]:
            continue
        g, pp = divmod(bi, P)
        qlen, tlen = len(c.qseq), len(c.tseq)
        w = c.w if c.w >= 0 else max(qlen, tlen)
        rows, st, en, st0, en0, drop, r_true = _row_params(qlen, tlen, w)
        nblk = (r_true + ROWS_PER_STEP - 1) // ROWS_PER_STEP
        r0s = np.arange(nblk, dtype=np.int64) * ROWS_PER_STEP
        bases = _blk_base(st0[np.minimum(r0s, r_true - 1)])
        don = donors[bi]
        acc = acceptors[bi]
        # host arrays are nbytes-sized (>= tlen); index clip stays valid
        hi = don.shape[0] - 1
        for blk in range(nblk):
            base = int(bases[blk])
            idx = np.minimum(base + jj, hi)
            dband[g, blk, pp, :] = don[idx]
            aband[g, blk, pp, :] = acc[idx]
    return dband, aband


@functools.partial(jax.jit, static_argnames=(
    "wb", "r_pad")) if _HAS_JAX else lambda f: f
def prep_splice_bands(meta, dpad, apad, *, wb, r_pad):
    """Device-side analog of plan_splice_bands: gather the per-block
    donor/acceptor scores from compact per-call arrays.  Host semantics:
    band[g, blk, pp, j] = arr[min(base + j, nbytes - 1)] with
    nbytes = (tlen + 15)//16*16 (the oracle's padded site-array size),
    zero outside valid blocks."""
    P = PAIRS_PER_GROUP
    rb = r_pad // ROWS_PER_STEP
    qlen = meta[:, 0, :].astype(jnp.int32)
    tlen = meta[:, 1, :].astype(jnp.int32)
    w = meta[:, 2, :].astype(jnp.int32)
    n_rows = meta[:, 3, :].astype(jnp.int32)
    blk = jnp.arange(rb, dtype=jnp.int32)
    r0 = (blk * ROWS_PER_STEP)[None, None, :]
    qlen_, tlen_, w_, n_rows_ = (a[:, :, None]
                                 for a in (qlen, tlen, w, n_rows))
    r0p = jnp.minimum(r0, n_rows_ - 1)
    st0 = jnp.maximum(jnp.maximum(0, r0p - qlen_ + 1),
                      (r0p - w_ + 1) >> 1)
    base = jnp.maximum(st0 // 16 * 16 - 16, 0)
    valid = (r0 < n_rows_) & (qlen_ > 0)
    hi = ((tlen_ + 15) // 16 * 16 - 1)[:, :, :, None]
    j = jnp.arange(wb, dtype=jnp.int32)
    idx = jnp.clip(jnp.minimum(base[:, :, :, None] + j, hi),
                   0, dpad.shape[2] - 1)
    dband = jnp.where(valid[:, :, :, None],
                      jnp.take_along_axis(dpad[:, :, None, :], idx,
                                          axis=3), 0)
    aband = jnp.where(valid[:, :, :, None],
                      jnp.take_along_axis(apad[:, :, None, :], idx,
                                          axis=3), 0)
    return dband.transpose(0, 2, 1, 3), aband.transpose(0, 2, 1, 3)


def _rle_cigar_splice(op_row: np.ndarray, rev_cigar: bool,
                      min_intron: int) -> np.ndarray:
    """RLE for splice op streams: op 3 runs are introns (N); tail
    sentinel op 5 runs become N only when (len-1) >= min_intron
    (ksw2_splice._backtrack tail rule), else D; adjacent equal ops
    merge after conversion."""
    ops = op_row[op_row != 255]
    if ops.size == 0:
        return np.empty(0, np.uint32)
    brk = np.nonzero(np.diff(ops))[0]
    starts = np.concatenate(([0], brk + 1))
    ends = np.concatenate((brk + 1, [ops.size]))
    out: list[int] = []
    for s, t in zip(starts, ends):
        op = int(ops[s])
        ln = int(t - s)
        if op == 5:
            op = 3 if (min_intron > 0 and ln - 1 >= min_intron) else 2
        if out and (out[-1] & 0xF) == op:
            out[-1] += ln << 4
        else:
            out.append((ln << 4) | op)
    runs = np.array(out, np.uint32)
    return runs if rev_cigar else runs[::-1].copy()


def exts2_batch_device(calls: list[FillCall], mat: np.ndarray, q: int,
                       e: int, q2: int, noncan: int, junc_bonus: int,
                       flag: int, juncs: list | None = None,
                       interpret: bool | None = None) -> list[ksw2.Extz]:
    """Splice-aware gap fills (KSW_EZ_APPROX_MAX) on the device; host
    fallback per call on band drop / oversize.  Donor/acceptor score
    arrays (incl. BED junc bonuses) come from the host oracle's
    _splice_sites, so site semantics are shared byte-for-byte."""
    from mm2_gb_tpu.ops import ksw2_splice as S

    if interpret is None:
        # implicit resolution: real kernels on TPU, host oracle on CPU
        # backends (see _size_classes); interpret=True runs the kernels
        # in interpret mode for logic validation
        interpret = "oracle" if _interpret() else False
    assert flag & ksw2.KSW_EZ_APPROX_MAX
    assert not (flag & ksw2.KSW_EZ_SCORE_ONLY)
    mat = np.asarray(mat, np.int8)
    m = 5
    mat0, mat1 = int(mat[0]), int(mat[1])
    sc_n = -e if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])
    right = bool(flag & ksw2.KSW_EZ_RIGHT)
    rev = bool(flag & ksw2.KSW_EZ_REV_CIGAR)
    long_thres = (q2 - q) // e - 1
    if q2 > q + e + long_thres * e:
        long_thres += 1
    long_diff = long_thres * e - (q2 - q)
    if juncs is None:
        juncs = [None] * len(calls)

    def host(i):
        c = calls[i]
        return S.exts2(c.qseq, c.tseq, mat, q, e, q2, noncan, c.zdrop,
                       junc_bonus, flag, juncs[i])

    out: list[ksw2.Extz | None] = [None] * len(calls)
    by_class: dict = {}
    for idx, c in enumerate(calls):
        qlen, tlen = len(c.qseq), len(c.tseq)
        mx = max(qlen, tlen)
        cls = next((sz for sz in _size_classes(interpret)
                    if mx <= sz), None)
        if cls is None or qlen == 0 or tlen == 0 or q2 <= q + e \
                or -int(mat.min()) > 2 * (q + e):
            out[idx] = host(idx)
        else:
            wbnd = band_width(min(qlen, tlen) + 64, cls)
            by_class.setdefault((cls, wbnd), []).append(idx)

    P = PAIRS_PER_GROUP

    def drain(entry) -> None:
        import time
        chunk, plan, score_dev, ops_dev = entry
        t0 = time.perf_counter()
        score_host = np.asarray(jax.device_get(score_dev))   # (G, P)
        ops_host = np.asarray(jax.device_get(ops_dev))
        _fill_acc(wait_s=time.perf_counter() - t0)
        for bi, idx in enumerate(chunk):
            if plan.dropped[bi]:
                out[idx] = host(idx)
                _fill_acc(host_calls=1)
                continue
            g, pp = divmod(bi, P)
            ez = ksw2.Extz()
            ez.score = int(score_host[g, pp])
            ez.cigar = _rle_cigar_splice(ops_host[g * P + pp], rev,
                                         long_thres)
            out[idx] = ez

    for (cls, wbnd), idxs in sorted(by_class.items()):
        g_mb = _fill_chunk_groups(cls, wbnd, interpret)
        pending: list = []
        for off in range(0, len(idxs), g_mb * P):
            chunk = idxs[off:off + g_mb * P]
            batch = []
            for i in chunk:
                c = calls[i]
                # unbanded DP (exts2 has no band): a huge w disables the
                # band terms in every window formula
                batch.append(FillCall(c.qseq, c.tseq,
                                      len(c.qseq) + len(c.tseq),
                                      c.right, c.zdrop))
            plan = plan_fill_light(batch, cls, wbnd,
                                   g_pad=_chunk_g_pad(len(chunk), g_mb))
            # compact donor/acceptor site arrays; band gather on device.
            # Group count MUST be the plan's padded G (g_pad), not g_mb:
            # a final partial chunk pads to fewer groups than the
            # micro-batch and prep_splice_bands broadcasts meta-derived
            # masks against these arrays (real-chip smoke 20260819_0904
            # caught the mismatch; interpret mode pins g_mb=1 and never
            # sees it)
            dpad = np.zeros((plan.n_groups, P, cls + 16), np.int8)
            apad = np.zeros((plan.n_groups, P, cls + 16), np.int8)
            for bi, i in enumerate(chunk):
                if plan.dropped[bi]:
                    continue
                c = calls[i]
                tl = len(c.tseq)
                nbytes = (tl + 15) // 16 * 16
                don, acc = S._splice_sites(
                    np.asarray(c.tseq, np.uint8), tl, nbytes, noncan,
                    junc_bonus, flag, juncs[i])
                g, pp = divmod(bi, P)
                dpad[g, pp, :nbytes] = don[:nbytes]
                apad[g, pp, :nbytes] = acc[:nbytes]
            if interpret is False:
                # fused single-executable path (one load per shape)
                sc2, ops_dev = exts2_chunk_tpu(
                    plan.meta, plan.qpad, plan.tpad, dpad, apad,
                    wb=wbnd, r_pad=plan.r_pad, q=q, e=e, q2=q2,
                    mat0=mat0, mat1=mat1, sc_n=sc_n, right=right,
                    long_thres=long_thres, long_diff=long_diff,
                    kmax=plan.r_pad + 32)
            else:
                meta_d = jnp.asarray(plan.meta)
                qb, tb, qk = prep_fill_operands(
                    meta_d, jnp.asarray(plan.qpad), jnp.asarray(plan.tpad),
                    wb=wbnd, r_pad=plan.r_pad)
                dband, aband = prep_splice_bands(
                    meta_d, jnp.asarray(dpad), jnp.asarray(apad),
                    wb=wbnd, r_pad=plan.r_pad)
                p_dev, score_dev = exts2_fwd_tpu(
                    meta_d, qb, tb, qk, dband, aband,
                    wb=wbnd, r_pad=plan.r_pad, q=q, e=e, q2=q2,
                    mat0=mat0, mat1=mat1, sc_n=sc_n, right=right,
                    long_thres=long_thres, long_diff=long_diff,
                    interpret=interpret)
                sc2 = score_dev[:, :, 2]
                ops_dev = backtrack_device(p_dev, meta_d,
                                           wb=wbnd, r_pad=plan.r_pad,
                                           kmax=plan.r_pad + 32,
                                           intron_ops=True)
            if interpret is False:
                _record_fill_sig("exts", cls, wbnd, plan.n_groups,
                                 (q, e, q2, mat0, mat1, sc_n, right,
                                  long_thres, long_diff))
            _fill_acc(chunks=1, calls=len(chunk),
                      walked_cells=plan.n_groups * P * plan.r_pad * wbnd,
                      useful_cells=int(plan.meta[:, 3, :].astype(
                          np.int64).sum()) * wbnd)
            pending.append((chunk, plan, sc2, ops_dev))
            if len(pending) > 2:     # bound in-flight HBM to 3 chunks
                # (<= 1.5 GB at the 512 MB chunk budget; the extra chunk
                # hides one more drain round trip behind device compute
                # on the high-latency tunnel)
                drain(pending.pop(0))
        while pending:
            drain(pending.pop(0))
    return out  # type: ignore[return-value]


def _exts2_kernel(meta_ref, qb_ref, tband_ref, qblk_ref, don_ref, acc2_ref,
                  p_ref, score_ref,
                  u_ref, v_ref, x_ref, y_ref, x2_ref,
                  s_ref, stq_ref, d_ref, acc_ref, h_ref, *,
                  wb: int, q: int, e: int, q2: int,
                  mat0: int, mat1: int, sc_n: int, right: bool,
                  long_thres: int, long_diff: int, track_h: bool):
    """Splice-aware variant of _extd2_kernel (ksw2_exts2_sse.c semantics;
    oracle ops/ksw2_splice.py::exts2).  Differences from extd2: the x2
    state is an intron opened against per-column donor scores and closed
    with per-column acceptor scores (both host-precomputed incl. BED
    junc bonuses, _splice_sites); no y2 state; x2 init/boundary -q2;
    intron extension is free (bound_v else-branch 0); no z<=mat0 cap;
    Z-drop uses gap-ext 0."""
    rb = pl.program_id(1)
    P = PAIRS_PER_GROUP
    qe_c = q + e
    lane = jax.lax.broadcasted_iota(jnp.int32, (P, wb), 1)

    qlen = meta_ref[0, 0, :].reshape(P, 1)
    tlen = meta_ref[0, 1, :].reshape(P, 1)
    w = meta_ref[0, 2, :].reshape(P, 1)
    n_rows = meta_ref[0, 3, :].reshape(P, 1)
    zdrop = meta_ref[0, 4, :].reshape(P, 1)

    def _window(r):
        st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1), (r - w + 1) >> 1)
        en0 = jnp.minimum(jnp.minimum(tlen - 1, r), (r + w) >> 1)
        return st0, en0

    def _base_at(r0):
        st0, _ = _window(r0)
        return jnp.maximum(st0 // 16 * 16 - 16, 0)

    base = _base_at(rb * ROWS_PER_STEP)

    @pl.when(rb == 0)
    def _init():
        u_ref[...] = jnp.full((P, wb), -qe_c, jnp.int32)
        v_ref[...] = jnp.full((P, wb), -qe_c, jnp.int32)
        x_ref[...] = jnp.full((P, wb), -qe_c, jnp.int32)
        y_ref[...] = jnp.full((P, wb), -qe_c, jnp.int32)
        x2_ref[...] = jnp.full((P, wb), -q2, jnp.int32)
        s_ref[...] = jnp.zeros((P, wb), jnp.int32)
        acc = jnp.zeros((P, SCORE_LANES), jnp.int32)
        if track_h:
            cidx = jax.lax.broadcasted_iota(jnp.int32, (P, SCORE_LANES), 1)
            acc = jnp.where((cidx == 2) | (cidx == 6) | (cidx == 8),
                            KSW_NEG_INF_I32, acc)
            acc = jnp.where((cidx == 4) | (cidx == 5) | (cidx == 7)
                            | (cidx == 9), -1, acc)
            h_ref[...] = jnp.full((P, wb), KSW_NEG_INF_I32, jnp.int32)
        acc_ref[...] = acc

    @pl.when(rb > 0)
    def _rebase():
        delta = base - _base_at((rb - 1) * ROWS_PER_STEP)
        fresh = lane >= wb - delta

        def shift(arr, init):
            r16 = pltpu.roll(arr, wb - 16, 1)
            r32 = pltpu.roll(arr, wb - 32, 1)
            r48 = pltpu.roll(arr, wb - 48, 1)
            out = jnp.where(delta == 16, r16,
                            jnp.where(delta == 32, r32,
                                      jnp.where(delta == 48, r48, arr)))
            return jnp.where(fresh & (delta > 0), init, out)

        u_ref[...] = shift(u_ref[...], -qe_c)
        v_ref[...] = shift(v_ref[...], -qe_c)
        x_ref[...] = shift(x_ref[...], -qe_c)
        y_ref[...] = shift(y_ref[...], -qe_c)
        x2_ref[...] = shift(x2_ref[...], -q2)
        s_ref[...] = shift(s_ref[...], 0)
        if track_h:
            h_ref[...] = shift(h_ref[...], KSW_NEG_INF_I32)

    stq_ref[...] = qblk_ref[0, 0].astype(jnp.int32)
    tq_seq = tband_ref[0, 0].astype(jnp.int32)
    donor = don_ref[0, 0].astype(jnp.int32)
    accept = acc2_ref[0, 0].astype(jnp.int32)
    qb_blk = qb_ref[0, 0]

    for i in range(ROWS_PER_STEP):
        r = rb * ROWS_PER_STEP + i
        st0a, en0a = _window(r)
        act = (r < n_rows) & (st0a <= en0a)
        st = st0a // 16 * 16 - base
        en = (en0a + 16) // 16 * 16 - 1 - base
        st0 = st0a - base
        en0 = en0a - base
        lst0a, len0a = _window(r - 1)
        lst = lst0a // 16 * 16 - base
        len_ = (len0a + 16) // 16 * 16 - 1 - base
        x1c = (st > -base) & (lst <= st - 1) & (st - 1 <= len_) \
            & (lst0a <= len0a) & (r > 0)
        sshi = st0 + 16 * ((en0 - st0) // 16 + 1)
        # bound_v (ksw2_splice.py): intron extension is free past
        # long_thres
        bv_s = jnp.where(r == 0, -qe_c,
                         jnp.where(r < long_thres, -e,
                                   jnp.where(r == long_thres, long_diff,
                                             0)))
        bv = jnp.full((P, 1), 1, jnp.int32) * bv_s
        qbyte = qb_blk[:, i].reshape(P, 1)

        mb = (lane >= st) & (lane <= en) & act

        if i > 0:
            stq = jnp.roll(stq_ref[...], 1, axis=1)
            stq = jnp.where(lane == 0, qbyte, stq)
            stq_ref[...] = stq
        else:
            stq = stq_ref[...]

        ms = (lane >= st0) & (lane < sshi) & act
        vals = jnp.where(tq_seq == stq, mat0, mat1)
        vals = jnp.where((tq_seq == 4) | (stq == 4), sc_n, vals)
        s = jnp.where(ms, vals, s_ref[...])
        s_ref[...] = s

        u = u_ref[...]
        y = y_ref[...]
        pr = (lane == r - base) & (en >= r - base) & act
        y = jnp.where(pr, -qe_c, y)
        u = jnp.where(pr, bv, u)

        xt1 = jnp.roll(x_ref[...], 1, axis=1)
        vt1 = jnp.roll(v_ref[...], 1, axis=1)
        x2t1 = jnp.roll(x2_ref[...], 1, axis=1)
        v1_fb = jnp.where(st0a // 16 * 16 == 0, bv, -qe_c)
        fb = (lane == st) & ~x1c
        xt1 = jnp.where(fb, -qe_c, xt1)
        x2t1 = jnp.where(fb, -q2, x2t1)
        vt1 = jnp.where(fb, v1_fb, vt1)

        z = s
        a = xt1 + vt1
        b_ = y + u
        a2 = x2t1 + vt1
        a2a = a2 + accept
        if right:
            d = jnp.where(z > a, 0, 1).astype(jnp.int32)
            z = jnp.maximum(z, a)
            d = jnp.where(z > b_, d, 2)
            z = jnp.maximum(z, b_)
            d = jnp.where(z > a2a, d, 3)
            z = jnp.maximum(z, a2a)
        else:
            d = (a > z).astype(jnp.int32)
            z = jnp.maximum(z, a)
            d = jnp.where(b_ > z, 2, d)
            z = jnp.maximum(z, b_)
            d = jnp.where(a2a > z, 3, d)
            z = jnp.maximum(z, a2a)
        u_new = z - vt1
        v_new = z - u
        tq = z - q
        a = a - tq
        b_ = b_ - tq
        a2 = a2 - (z - q2)
        if right:
            ta, tb = a >= 0, b_ >= 0
            ta2 = a2 >= donor
        else:
            ta, tb = a > 0, b_ > 0
            ta2 = a2 > donor
        x_new = jnp.where(ta, a, 0) - qe_c
        y_new = jnp.where(tb, b_, 0) - qe_c
        x2_new = jnp.where(ta2, a2, donor) - q2
        d = d | jnp.where(ta, 0x08, 0) | jnp.where(tb, 0x10, 0) \
            | jnp.where(ta2, 0x20, 0)

        u = jnp.where(mb, u_new, u)
        v = jnp.where(mb, v_new, v_ref[...])
        u_ref[...] = u
        v_ref[...] = v
        x_ref[...] = jnp.where(mb, x_new, x_ref[...])
        y_ref[...] = jnp.where(mb, y_new, y)
        x2_ref[...] = jnp.where(mb, x2_new, x2_ref[...])
        d_ref[i * P:(i + 1) * P, :] = jnp.where(mb, d, 0).astype(jnp.int8)

        if track_h:
            def msum(arr, cond):
                return jnp.sum(jnp.where(cond, arr, 0), axis=1,
                               keepdims=True)
            H = h_ref[...]
            h_en0 = jnp.where(
                en0a > 0,
                msum(H, lane == en0 - 1) + msum(u, lane == en0),
                msum(H, lane == en0) + msum(v, lane == en0))
            body = (lane >= st0) & (lane < en0)
            Hn = jnp.where(lane == en0, h_en0,
                           jnp.where(body, H + v, H))
            Hn = jnp.where(r == 0,
                           jnp.where(lane == -base, v - qe_c, H), Hn)
            H = jnp.where(act, Hn, H)
            h_ref[...] = H
            en1 = st0 + (en0 - st0) // 4 * 4
            win = (lane >= st0) & (lane <= en0)
            dt = lane - st0
            rank = jnp.where(lane == en0, 0,
                             jnp.where(lane < en1,
                                       1 + (dt & 3) * wb + (dt >> 2),
                                       8 * wb + (lane - en1)))
            m = jnp.max(jnp.where(win, H, KSW_NEG_INF_I32), axis=1,
                        keepdims=True)
            is_m = win & (H == m)
            r_star = jnp.min(jnp.where(is_m, rank, 0x7FFFFFFF), axis=1,
                             keepdims=True)
            row_t = msum(lane, is_m & (rank == r_star)) + base
            row_t = jnp.where(r == 0, 0, row_t)
            m = jnp.where(r == 0, msum(H, lane == -base), m)
            alive = act & (acc_ref[:, 10:11] == 0)
            mte, mte_q = acc_ref[:, 8:9], acc_ref[:, 9:10]
            h_at_en0 = msum(H, lane == en0)
            upd = alive & (en0a == tlen - 1) & (h_at_en0 > mte)
            acc_ref[:, 8:9] = jnp.where(upd, h_at_en0, mte)
            acc_ref[:, 9:10] = jnp.where(upd, r - (en + base), mte_q)
            mqe, mqe_t = acc_ref[:, 6:7], acc_ref[:, 7:8]
            h_at_st0 = msum(H, lane == st0)
            upd = alive & (r - st0a == qlen - 1) & (h_at_st0 > mqe)
            acc_ref[:, 6:7] = jnp.where(upd, h_at_st0, mqe)
            acc_ref[:, 7:8] = jnp.where(upd, st0a, mqe_t)
            mx, mx_t, mx_q = (acc_ref[:, 3:4], acc_ref[:, 4:5],
                              acc_ref[:, 5:6])
            row_q = r - row_t
            better = alive & (m > mx)
            acc_ref[:, 3:4] = jnp.where(better, m, mx)
            acc_ref[:, 4:5] = jnp.where(better, row_t, mx_t)
            acc_ref[:, 5:6] = jnp.where(better, row_q, mx_q)
            tl_ = row_t - mx_t
            ql_ = row_q - mx_q
            l_ = jnp.abs(tl_ - ql_)
            # splice Z-drop uses gap extension 0 (ksw2_splice.py:256)
            drop = alive & ~better & (row_t >= mx_t) & (row_q >= mx_q) \
                & (zdrop >= 0) & (mx - m > zdrop)
            del l_
            acc_ref[:, 10:11] = jnp.where(drop, 1, acc_ref[:, 10:11])
            fin = alive & ~drop & (r == n_rows - 1) & (en0a == tlen - 1)
            acc_ref[:, 2:3] = jnp.where(
                fin, msum(H, lane == tlen - 1 - base), acc_ref[:, 2:3])
            continue

        lt = acc_ref[:, 1:2]
        h0 = acc_ref[:, 0:1]
        v_lt = jnp.sum(jnp.where(lane == lt - base, v, 0), axis=1,
                       keepdims=True)
        u_lt1 = jnp.sum(jnp.where(lane == lt + 1 - base, u, 0), axis=1,
                        keepdims=True)
        c1 = (st0a <= lt) & (lt <= en0a)
        c2 = (st0a <= lt + 1) & (lt + 1 <= en0a)
        take_d1 = c1 & c2 & (u_lt1 >= v_lt)
        step = jnp.where(c1 & c2,
                         jnp.where(take_d1, u_lt1, v_lt),
                         jnp.where(c1, v_lt, u_lt1))
        new_lt = jnp.where(take_d1 | ~c1, lt + 1, lt)
        is_r0 = r == 0
        h0n = jnp.where(is_r0, v_lt - qe_c, h0 + step)
        ltn = jnp.where(is_r0, 0, new_lt)
        acc_ref[:, 0:1] = jnp.where(act, h0n, h0)
        acc_ref[:, 1:2] = jnp.where(act, ltn, lt)
        acc_ref[:, 2:3] = jnp.where(act & (r == n_rows - 1), h0n,
                                    acc_ref[:, 2:3])

    p_ref[0, 0, :, :] = d_ref[...]
    score_ref[0, :, :] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=(
    "wb", "r_pad", "q", "e", "q2", "mat0", "mat1", "sc_n", "right",
    "long_thres", "long_diff", "track_h",
    "interpret")) if _HAS_JAX else lambda f: f
def exts2_fwd_tpu(meta, qbytes, tband, qblk, dband, aband, *, wb, r_pad,
                  q, e, q2, mat0, mat1, sc_n, right, long_thres,
                  long_diff, track_h=False, interpret=False):
    """Batched splice forward DP in band coordinates; see exts2 kernel."""
    G = meta.shape[0]
    P = PAIRS_PER_GROUP
    rb = r_pad // ROWS_PER_STEP
    kern = functools.partial(
        _exts2_kernel, wb=wb, q=q, e=e, q2=q2,
        mat0=mat0, mat1=mat1, sc_n=sc_n, right=right,
        long_thres=long_thres, long_diff=long_diff, track_h=track_h)
    return pl.pallas_call(
        kern,
        grid=(G, rb),
        in_specs=[
            pl.BlockSpec((1, 8, P), lambda g, r: (g, 0, 0)),
            pl.BlockSpec((1, 1, P, ROWS_PER_STEP), lambda g, r: (g, r, 0, 0)),
            pl.BlockSpec((1, 1, P, wb), lambda g, r: (g, r, 0, 0)),
            pl.BlockSpec((1, 1, P, wb), lambda g, r: (g, r, 0, 0)),
            pl.BlockSpec((1, 1, P, wb), lambda g, r: (g, r, 0, 0)),
            pl.BlockSpec((1, 1, P, wb), lambda g, r: (g, r, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ROWS_PER_STEP * P, wb),
                         lambda g, r: (g, r, 0, 0)),
            pl.BlockSpec((1, P, SCORE_LANES), lambda g, r: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, rb, ROWS_PER_STEP * P, wb), jnp.int8),
            jax.ShapeDtypeStruct((G, P, SCORE_LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, wb), jnp.int32),   # u
            pltpu.VMEM((P, wb), jnp.int32),   # v
            pltpu.VMEM((P, wb), jnp.int32),   # x
            pltpu.VMEM((P, wb), jnp.int32),   # y
            pltpu.VMEM((P, wb), jnp.int32),   # x2
            pltpu.VMEM((P, wb), jnp.int32),   # s
            pltpu.VMEM((P, wb), jnp.int32),   # stq
            pltpu.VMEM((ROWS_PER_STEP * P, wb), jnp.int8),   # d rows
            pltpu.VMEM((P, SCORE_LANES), jnp.int32),         # acc
            pltpu.VMEM((P, wb), jnp.int32),                  # H (track_h)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(meta, qbytes, tband, qblk, dband, aband)


# ------------------------------------------------------------ host assembly
def _assemble_ez(call: FillCall, p_rows_abs: np.ndarray, score: int,
                 flag: int) -> ksw2.Extz:
    """Host backtrack over the device direction matrix -> Extz."""
    qlen, tlen = len(call.qseq), len(call.tseq)
    w = call.w if call.w >= 0 else max(qlen, tlen)
    rows, st, en, st0, en0, drop, r_true = _row_params(qlen, tlen, w)
    assert not drop
    n_rows = qlen + tlen - 1
    p_rows = [None] * n_rows
    off = np.zeros(n_rows, np.int64)
    off_end = np.zeros(n_rows, np.int64)
    r0s = np.arange((r_true + ROWS_PER_STEP - 1) // ROWS_PER_STEP,
                    dtype=np.int64) * ROWS_PER_STEP
    bases = _blk_base(st0[np.minimum(r0s, r_true - 1)])
    for r in range(n_rows):
        base = int(bases[r // ROWS_PER_STEP])
        p_rows[r] = p_rows_abs[r, st[r] - base:en[r] + 1 - base]
        off[r], off_end[r] = st[r], en[r]
    ez = ksw2.Extz()
    ez.score = int(score)
    rev = bool(flag & ksw2.KSW_EZ_REV_CIGAR)
    ez.cigar = ksw2._backtrack(p_rows, off, off_end, tlen - 1, qlen - 1, rev)
    return ez


def extd2_batch_device(calls: list[FillCall], mat: np.ndarray, q: int, e: int,
                       q2: int, e2: int, flag: int,
                       interpret: bool | None = None,
                       backtrack: str = "device") -> list[ksw2.Extz]:
    """Run a batch of gap fills on the device; host fallback per call when
    the band collapses or the call exceeds the largest size class.

    backtrack="device" walks the direction matrix on the TPU and ships only
    unit-op streams (KBs) -- right for link-limited hosts.  backtrack="host"
    fetches the banded p matrix and reuses ksw2._backtrack -- faster when
    the device link is wide (the forward kernel alone is ~6x the host DP).
    """
    if interpret is None:
        # implicit resolution: real kernels on TPU, host oracle on CPU
        # backends (see _size_classes); interpret=True runs the kernels
        # in interpret mode for logic validation
        interpret = "oracle" if _interpret() else False
    assert flag & ksw2.KSW_EZ_APPROX_MAX
    assert not (flag & ksw2.KSW_EZ_SCORE_ONLY)
    mat = np.asarray(mat, np.int8)
    m = 5
    mat0, mat1 = int(mat[0]), int(mat[1])
    qq, ee, qq2, ee2 = (q, e, q2, e2) if q + e <= q2 + e2 else (q2, e2, q, e)
    sc_n = -ee2 if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])
    right = bool(flag & ksw2.KSW_EZ_RIGHT)
    long_thres = (qq2 - qq) // (ee - ee2) - 1 if ee != ee2 else 0
    if qq2 + ee2 + long_thres * ee2 > qq + ee + long_thres * ee:
        long_thres += 1
    long_diff = long_thres * (ee - ee2) - (qq2 - qq) - ee2

    out: list[ksw2.Extz | None] = [None] * len(calls)
    by_class: dict[int, list[int]] = {}
    for idx, c in enumerate(calls):
        mx = max(len(c.qseq), len(c.tseq))
        cls = next((s for s in _size_classes(interpret)
                    if mx <= s), None)
        if cls is None or len(c.qseq) == 0 or len(c.tseq) == 0 \
                or -int(mat.min()) > 2 * (qq + ee):
            out[idx] = ksw2.extd2(c.qseq, c.tseq, mat, q, e, q2, e2,
                                  c.w, -1, 0, flag)
        else:
            wv = c.w if c.w >= 0 else max(len(c.qseq), len(c.tseq))
            by_class.setdefault((cls, band_width(wv, cls)), []).append(idx)

    P = PAIRS_PER_GROUP
    rev = bool(flag & ksw2.KSW_EZ_REV_CIGAR)

    def drain(entry) -> None:
        import time
        chunk, plan, score_dev, bt_dev = entry
        t0 = time.perf_counter()
        score_host = np.asarray(jax.device_get(score_dev))   # (G, P)
        if backtrack == "device":
            ops_host = np.asarray(jax.device_get(bt_dev))
        else:
            rbn = plan.r_pad // ROWS_PER_STEP
            p_host = np.asarray(jax.device_get(bt_dev)).reshape(
                plan.n_groups, rbn, ROWS_PER_STEP, P, plan.w_band)
        _fill_acc(wait_s=time.perf_counter() - t0)
        for bi, idx in enumerate(chunk):
            c = calls[idx]
            if plan.dropped[bi]:
                out[idx] = ksw2.extd2(c.qseq, c.tseq, mat, q, e, q2, e2,
                                      c.w, -1, 0, flag)
                _fill_acc(host_calls=1)
                continue
            g, pp = divmod(bi, P)
            if backtrack == "device":
                ez = ksw2.Extz()
                ez.score = int(score_host[g, pp])
                ez.cigar = _rle_cigar(ops_host[g * P + pp], rev)
                out[idx] = ez
            else:
                rows = p_host[g, :, :, pp, :].reshape(plan.r_pad,
                                                      plan.w_band)
                out[idx] = _assemble_ez(c, rows, int(score_host[g, pp]),
                                        flag)

    for (cls, wbnd), idxs in sorted(by_class.items()):
        # fixed-size micro-chunks: the direction matrix is r_pad*8*wbnd
        # bytes per group (a flowcell's fills would exceed HBM as one
        # launch), and a fixed G means one compiled executable per class
        # instead of one per batch size
        g_mb = _fill_chunk_groups(cls, wbnd, interpret)
        pending: list = []
        for off in range(0, len(idxs), g_mb * P):
            import time
            chunk = idxs[off:off + g_mb * P]
            t0 = time.perf_counter()
            plan = plan_fill_light([calls[i] for i in chunk], cls, wbnd,
                                   g_pad=_chunk_g_pad(len(chunk), g_mb))
            t1 = time.perf_counter()
            if interpret is False and backtrack == "device":
                # fused single-executable path (one load per shape)
                sc2, bt_dev = extd2_chunk_tpu(
                    plan.meta, plan.qpad, plan.tpad, wb=wbnd,
                    r_pad=plan.r_pad, q=qq, e=ee, q2=qq2, e2=ee2,
                    mat0=mat0, mat1=mat1, sc_n=sc_n, right=right,
                    long_thres=long_thres, long_diff=long_diff,
                    kmax=plan.r_pad + 32)
            else:
                meta_d = jnp.asarray(plan.meta)
                qb, tb, qk = prep_fill_operands(
                    meta_d, jnp.asarray(plan.qpad), jnp.asarray(plan.tpad),
                    wb=wbnd, r_pad=plan.r_pad)
                p_dev, score_dev = extd2_fwd_tpu(
                    meta_d, qb, tb, qk,
                    wb=wbnd, r_pad=plan.r_pad, q=qq, e=ee, q2=qq2, e2=ee2,
                    mat0=mat0, mat1=mat1, sc_n=sc_n, right=right,
                    long_thres=long_thres, long_diff=long_diff,
                    interpret=interpret)
                sc2 = score_dev[:, :, 2]
                if backtrack == "device":
                    # only unit-op streams cross the link
                    bt_dev = backtrack_device(p_dev, meta_d, wb=wbnd,
                                              r_pad=plan.r_pad,
                                              kmax=plan.r_pad + 32)
                else:
                    bt_dev = p_dev
            _fill_acc(plan_s=t1 - t0, enqueue_s=time.perf_counter() - t1)
            if interpret is False:
                _record_fill_sig("fill", cls, wbnd, plan.n_groups,
                                 (qq, ee, qq2, ee2, mat0, mat1, sc_n,
                                  right, long_thres, long_diff))
            _fill_acc(chunks=1, calls=len(chunk),
                      walked_cells=plan.n_groups * P * plan.r_pad * wbnd,
                      useful_cells=int(plan.meta[:, 3, :].astype(
                          np.int64).sum()) * wbnd)
            pending.append((chunk, plan, sc2, bt_dev))
            if len(pending) > 2:     # bound in-flight HBM to 3 chunks
                # (<= 1.5 GB at the 512 MB chunk budget; the extra chunk
                # hides one more drain round trip behind device compute
                # on the high-latency tunnel)
                drain(pending.pop(0))
        while pending:
            drain(pending.pop(0))
    return out  # type: ignore[return-value]


def _chunk_g_pad(n_calls: int, g_mb: int) -> int:
    """Group padding for one chunk: quarter-pow2 steps (floor 8) up to
    the micro-batch size, so small workloads don't launch a full-size
    chunk (MT-scale: 56 fills would otherwise run as a 1024-group grid)
    while the shape set stays small and cache-friendly."""
    g = (n_calls + PAIRS_PER_GROUP - 1) // PAIRS_PER_GROUP
    if g >= g_mb:
        return g_mb
    if g <= 8:
        return 8
    k = max((g - 1).bit_length() - 3, 0)
    q = -(-g // (1 << k)) * (1 << k)
    return min(q, g_mb)


def _fill_chunk_groups(nb: int, wbnd: int, interpret=False) -> int:
    """Groups per fill micro-chunk: bounds the in-flight direction
    matrix (2*nb rows x 8 pairs x wbnd bytes per group) to
    MM2TPU_FILL_CHUNK_MB (default 512), power-of-two for executable
    reuse, capped at 1024.  Interpret mode pins the chunk to one group:
    interpret compile time scales with the traced shape and the logic
    tests need minutes-not-hours compiles."""
    if interpret is True:
        return 1
    import os
    budget = int(os.environ.get("MM2TPU_FILL_CHUNK_MB", "512")) << 20
    per_group = 2 * nb * PAIRS_PER_GROUP * wbnd
    g = max(1, min(budget // per_group, 1024))
    return 1 << (g.bit_length() - 1)


# ------------------------------------------------------- device backtrack
@functools.partial(jax.jit, static_argnames=(
    "wb", "r_pad", "kmax", "intron_ops")) if _HAS_JAX else lambda f: f
def backtrack_device(p, meta, starts=None, *, wb, r_pad, kmax,
                     intron_ops=False):
    """Vectorized ksw_backtrack on the device (ksw2.h:126-158, is_rot).

    Walks all pairs' direction matrices in lockstep without ever moving
    the p matrix off the device: each step gathers one byte per pair from
    HBM and emits one unit CIGAR op into an (N, kmax) uint8 array (255 =
    finished).  The host run-length-encodes the op streams.  D2H shrinks
    from O(R*NB) direction bytes to O(R) op bytes per pair.
    """
    G = meta.shape[0]
    P = PAIRS_PER_GROUP
    N = G * P
    qlen = meta[:, 0, :].reshape(N)
    tlen = meta[:, 1, :].reshape(N)
    w = meta[:, 2, :].reshape(N)
    p_flat = p.reshape(-1)
    rbn = r_pad // ROWS_PER_STEP
    nb = wb
    gidx = jnp.arange(N, dtype=jnp.int32) // P
    pidx = jnp.arange(N, dtype=jnp.int32) % P

    def window(r):
        st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1), (r - w + 1) >> 1)
        en0 = jnp.minimum(jnp.minimum(tlen - 1, r), (r + w) >> 1)
        return st0 // 16 * 16, (en0 + 16) // 16 * 16 - 1

    def step(k, carry):
        i, j, state, ops = carry
        alive = (i >= 0) | (j >= 0)
        tail_d = (j < 0) & (i >= 0)
        r = i + j
        st, en = window(r)
        # the band origin of r's 32-row block (same formula the forward
        # kernel and the planner use)
        st0b = jnp.maximum(jnp.maximum(0, (r >> 5 << 5) - qlen + 1),
                           ((r >> 5 << 5) - w + 1) >> 1)
        bbase = jnp.maximum(st0b // 16 * 16 - 16, 0)
        jb = i - bbase
        in_band = (i >= st) & (i <= en) & (j >= 0) & (i >= 0) \
            & (jb >= 0) & (jb < nb)
        # p[g, r//32, (r%32)*P + pp, i - base]
        flat = ((gidx * rbn + (r >> 5)) * (ROWS_PER_STEP * P)
                + (r & 31) * P + pidx) * nb + jb
        tmp = jnp.where(in_band,
                        p_flat[jnp.clip(flat, 0, p_flat.shape[0] - 1)]
                        .astype(jnp.int32), 0)
        s1 = jnp.where(state == 0, tmp & 7,
                       jnp.where((tmp >> (state + 2)) & 1, state, 0))
        s1 = jnp.where(s1 == 0, tmp & 7, s1)
        # force_state overrides (off-band cells)
        both = (i >= 0) & (j >= 0)
        s1 = jnp.where(both & (i < st), 2, s1)
        s1 = jnp.where(both & (i > en), 1, s1)
        # tails: one side exhausted
        s1 = jnp.where((j < 0) & (i >= 0), 1, s1)   # remaining -> D run
        s1 = jnp.where((i < 0) & (j >= 0), 2, s1)   # remaining -> I run
        # op: state 0 -> M(0); 1/3 (E/E2) -> D(2); 2/4 (F/F2) -> I(1)
        is_ins = (s1 == 2) | (s1 == 4)
        if intron_ops:
            # splice: every state-3 unit is an intron N (ksw2.h via
            # ksw2_splice._backtrack min_intron_len>0); tail-D units get
            # a sentinel so the host applies the min-intron rule
            op = jnp.where(s1 == 0, 0,
                           jnp.where(is_ins, 1,
                                     jnp.where(s1 == 3, 3, 2))
                           ).astype(jnp.uint8)
            op = jnp.where(tail_d, jnp.uint8(5), op)
        else:
            op = jnp.where(s1 == 0, 0,
                           jnp.where(is_ins, 1, 2)).astype(jnp.uint8)
        op = jnp.where(alive, op, jnp.uint8(255))
        ops = jax.lax.dynamic_update_slice(ops, op.reshape(N, 1), (0, k))
        di = jnp.where((s1 == 0) | (s1 == 1) | (s1 == 3), 1, 0)
        dj = jnp.where((s1 == 0) | is_ins, 1, 0)
        i = jnp.where(alive, i - di, i)
        j = jnp.where(alive, j - dj, j)
        state = jnp.where(alive & both, s1, state)
        return i, j, state, ops

    if starts is None:
        i0 = tlen - 1
        j0 = qlen - 1
    else:
        i0 = starts[:, 0]
        j0 = starts[:, 1]
    ops0 = jnp.full((N, kmax), 255, jnp.uint8)
    st0 = jnp.zeros(N, jnp.int32)
    _, _, _, ops = jax.lax.fori_loop(0, kmax, step, (i0, j0, st0, ops0))
    return ops



def _record_fill_sig(kind: str, cls: int, wbnd: int, g_pad: int,
                     statics: tuple) -> None:
    """Persist a fill-executable launch signature next to the chain
    shapes; chain_tpu.warm_start replays it via _warm_fill so the first
    fill chunk of a fresh process doesn't pay the executable load on the
    critical path."""
    from mm2_gb_tpu.ops import chain_tpu
    chain_tpu._record_shape((kind, int(cls), int(wbnd), int(g_pad))
                            + tuple(statics))


@functools.partial(jax.jit, static_argnames=(
    "wb", "r_pad", "q", "e", "q2", "e2", "mat0", "mat1", "sc_n", "right",
    "long_thres", "long_diff", "kmax")) if _HAS_JAX else lambda f: f
def extd2_chunk_tpu(meta, qpad, tpad, *, wb, r_pad, q, e, q2, e2, mat0,
                    mat1, sc_n, right, long_thres, long_diff, kmax):
    """One-executable fill chunk: band prep + forward DP + backtrack
    fused into a single jitted program.  The unfused path pays THREE
    per-process executable loads per shape over the tunnel (~1 s each
    even on persistent-cache hits — measured 46 s of blocking enqueue
    across a 300-read flowcell's 22 chunks); fusing cuts the loads 3x.
    Compiled (real-chip) path only — interpret tests keep the unfused
    shapes their cached artifacts were built with."""
    qb, tb, qk = prep_fill_operands(meta, qpad, tpad, wb=wb, r_pad=r_pad)
    p_dev, score = extd2_fwd_tpu(meta, qb, tb, qk, wb=wb, r_pad=r_pad,
                                 q=q, e=e, q2=q2, e2=e2, mat0=mat0,
                                 mat1=mat1, sc_n=sc_n, right=right,
                                 long_thres=long_thres,
                                 long_diff=long_diff, interpret=False)
    ops = backtrack_device(p_dev, meta, wb=wb, r_pad=r_pad, kmax=kmax)
    return score[:, :, 2], ops


@functools.partial(jax.jit, static_argnames=(
    "wb", "r_pad", "q", "e", "q2", "mat0", "mat1", "sc_n", "right",
    "long_thres", "long_diff", "kmax")) if _HAS_JAX else lambda f: f
def exts2_chunk_tpu(meta, qpad, tpad, dpad, apad, *, wb, r_pad, q, e, q2,
                    mat0, mat1, sc_n, right, long_thres, long_diff, kmax):
    """Fused splice-fill chunk (see extd2_chunk_tpu)."""
    qb, tb, qk = prep_fill_operands(meta, qpad, tpad, wb=wb, r_pad=r_pad)
    dband, aband = prep_splice_bands(meta, dpad, apad, wb=wb, r_pad=r_pad)
    p_dev, score = exts2_fwd_tpu(meta, qb, tb, qk, dband, aband, wb=wb,
                                 r_pad=r_pad, q=q, e=e, q2=q2, mat0=mat0,
                                 mat1=mat1, sc_n=sc_n, right=right,
                                 long_thres=long_thres,
                                 long_diff=long_diff, interpret=False)
    ops = backtrack_device(p_dev, meta, wb=wb, r_pad=r_pad, kmax=kmax,
                           intron_ops=True)
    return score[:, :, 2], ops


def _warm_fill(sig: tuple) -> None:
    """Replay a recorded fill signature with zero device operands (jnp
    fills: no host bytes cross the link) — compiles/loads prep + forward
    + backtrack executables for that shape."""
    kind = sig[0]
    cls, wbnd, g_pad = int(sig[1]), int(sig[2]), int(sig[3])
    P = PAIRS_PER_GROUP
    r_pad = 2 * cls
    meta = jnp.zeros((g_pad, 8, P), jnp.int32)
    qpad = jnp.zeros((g_pad, P, cls + 1), jnp.uint8)
    tpad = jnp.zeros((g_pad, P, cls + 1), jnp.uint8)
    if kind == "exts":
        (q, e, q2, mat0, mat1, sc_n, right, long_thres, long_diff) = sig[4:]
        zpad = jnp.zeros((g_pad, P, cls + 16), jnp.int8)
        _sc, ops = exts2_chunk_tpu(
            meta, qpad, tpad, zpad, zpad, wb=wbnd, r_pad=r_pad,
            q=int(q), e=int(e), q2=int(q2), mat0=int(mat0),
            mat1=int(mat1), sc_n=int(sc_n), right=bool(right),
            long_thres=int(long_thres), long_diff=int(long_diff),
            kmax=r_pad + 32)
    elif kind == "fill":
        (q, e, q2, e2, mat0, mat1, sc_n, right,
         long_thres, long_diff) = sig[4:]
        _sc, ops = extd2_chunk_tpu(
            meta, qpad, tpad, wb=wbnd, r_pad=r_pad, q=int(q), e=int(e),
            q2=int(q2), e2=int(e2), mat0=int(mat0), mat1=int(mat1),
            sc_n=int(sc_n), right=bool(right), long_thres=int(long_thres),
            long_diff=int(long_diff), kmax=r_pad + 32)
    else:   # "ext": host epilogue between fwd and backtrack stays split
        (q, e, q2, e2, mat0, mat1, sc_n, right,
         long_thres, long_diff) = sig[4:]
        qb, tb, qk = prep_fill_operands(meta, qpad, tpad, wb=wbnd,
                                        r_pad=r_pad)
        p_dev, _score = extd2_fwd_tpu(
            meta, qb, tb, qk, wb=wbnd, r_pad=r_pad, q=int(q), e=int(e),
            q2=int(q2), e2=int(e2), mat0=int(mat0), mat1=int(mat1),
            sc_n=int(sc_n), right=bool(right), long_thres=int(long_thres),
            long_diff=int(long_diff), track_h=True, interpret=False)
        starts = jnp.full((g_pad * P, 2), -1, jnp.int32)
        ops = backtrack_device(p_dev, meta, starts, wb=wbnd,
                               r_pad=r_pad, kmax=r_pad + 32)
    jax.device_get(ops[:1, :1])   # fence: executables fully loaded


def _rle_cigar(op_row: np.ndarray, rev_cigar: bool) -> np.ndarray:
    """Run-length encode a unit-op stream (emitted back-to-front)."""
    ops = op_row[op_row != 255]
    if ops.size == 0:
        return np.empty(0, np.uint32)
    brk = np.nonzero(np.diff(ops))[0]
    starts = np.concatenate(([0], brk + 1))
    ends = np.concatenate((brk + 1, [ops.size]))
    runs = ((ends - starts).astype(np.uint32) << 4) | ops[starts]
    return runs if rev_cigar else runs[::-1].copy()


def ext_batch_device(calls: list[FillCall], mat: np.ndarray, q: int, e: int,
                     q2: int, e2: int, flag: int, end_bonus: int,
                     interpret: bool | None = None) -> list[ksw2.Extz]:
    """Left/right extension DP (KSW_EZ_EXTZ_ONLY) on the device with full
    H tracking and Z-drop (ksw2_extd2_sse.c non-approx path).  Per-call
    zdrop comes from FillCall.zdrop; KSW_EZ_RIGHT selects the kernel
    variant; KSW_EZ_REV_CIGAR only affects the host RLE direction."""
    if interpret is None:
        # implicit resolution: real kernels on TPU, host oracle on CPU
        # backends (see _size_classes); interpret=True runs the kernels
        # in interpret mode for logic validation
        interpret = "oracle" if _interpret() else False
    assert flag & ksw2.KSW_EZ_EXTZ_ONLY
    assert not (flag & (ksw2.KSW_EZ_APPROX_MAX | ksw2.KSW_EZ_SCORE_ONLY))
    mat = np.asarray(mat, np.int8)
    m = 5
    mat0, mat1 = int(mat[0]), int(mat[1])
    qq, ee, qq2, ee2 = (q, e, q2, e2) if q + e <= q2 + e2 else (q2, e2, q, e)
    sc_n = -ee2 if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])
    right = bool(flag & ksw2.KSW_EZ_RIGHT)
    rev = bool(flag & ksw2.KSW_EZ_REV_CIGAR)
    long_thres = (qq2 - qq) // (ee - ee2) - 1 if ee != ee2 else 0
    if qq2 + ee2 + long_thres * ee2 > qq + ee + long_thres * ee:
        long_thres += 1
    long_diff = long_thres * (ee - ee2) - (qq2 - qq) - ee2

    out: list[ksw2.Extz | None] = [None] * len(calls)

    def host(c):
        return ksw2.extd2(c.qseq, c.tseq, mat, q, e, q2, e2, c.w,
                          c.zdrop, end_bonus, flag)

    by_class: dict[int, list[int]] = {}
    for idx, c in enumerate(calls):
        mx = max(len(c.qseq), len(c.tseq))
        cls = next((sz for sz in _size_classes(interpret)
                    if mx <= sz), None)
        if cls is None or len(c.qseq) == 0 or len(c.tseq) == 0 \
                or -int(mat.min()) > 2 * (qq + ee):
            out[idx] = host(calls[idx])
        else:
            wv = c.w if c.w >= 0 else max(len(c.qseq), len(c.tseq))
            by_class.setdefault((cls, band_width(wv, cls)), []).append(idx)

    P = PAIRS_PER_GROUP
    for (cls, wbnd), idxs in sorted(by_class.items()):
        g_mb = _fill_chunk_groups(cls, wbnd, interpret)
        for off in range(0, len(idxs), g_mb * P):
            chunk = idxs[off:off + g_mb * P]
            plan = plan_fill_light([calls[i] for i in chunk], cls, wbnd,
                                   g_pad=_chunk_g_pad(len(chunk), g_mb))
            meta_d = jnp.asarray(plan.meta)
            qb, tb, qk = prep_fill_operands(
                meta_d, jnp.asarray(plan.qpad), jnp.asarray(plan.tpad),
                wb=wbnd, r_pad=plan.r_pad)
            p_dev, acc_dev = extd2_fwd_tpu(
                meta_d, qb, tb, qk,
                wb=wbnd, r_pad=plan.r_pad, q=qq, e=ee, q2=qq2, e2=ee2,
                mat0=mat0, mat1=mat1, sc_n=sc_n, right=right,
                long_thres=long_thres, long_diff=long_diff, track_h=True,
                interpret=interpret)
            import time
            _fill_acc(chunks=1, calls=len(chunk),
                      walked_cells=plan.n_groups * P * plan.r_pad * wbnd,
                      useful_cells=int(plan.meta[:, 3, :].astype(
                          np.int64).sum()) * wbnd)
            t0 = time.perf_counter()
            acc = np.asarray(jax.device_get(acc_dev))   # (G, P, 128)
            _fill_acc(wait_s=time.perf_counter() - t0)
            # decide per-pair backtrack starts on the host (ksw2 epilogue)
            starts = np.full((plan.n_groups * P, 2), -1, np.int32)
            info = []
            for bi, idx in enumerate(chunk):
                c = calls[idx]
                if plan.dropped[bi]:
                    info.append(None)
                    continue
                g, pp = divmod(bi, P)
                a = acc[g, pp]
                ez = ksw2.Extz()
                ez.score = int(a[2]) if not a[10] else ksw2.KSW_NEG_INF
                ez.max, ez.max_t, ez.max_q = int(a[3]), int(a[4]), int(a[5])
                ez.mqe, ez.mqe_t = int(a[6]), int(a[7])
                ez.mte, ez.mte_q = int(a[8]), int(a[9])
                ez.zdropped = bool(a[10])
                if not ez.zdropped and ez.mqe + end_bonus > ez.max:
                    ez.reach_end = True
                    starts[bi] = (ez.mqe_t, len(c.qseq) - 1)
                elif ez.max_t >= 0 and ez.max_q >= 0:
                    starts[bi] = (ez.max_t, ez.max_q)
                info.append(ez)
            if interpret is False:
                _record_fill_sig("ext", cls, wbnd, plan.n_groups,
                                 (qq, ee, qq2, ee2, mat0, mat1, sc_n,
                                  right, long_thres, long_diff))
            ops_dev = backtrack_device(p_dev, meta_d,
                                       jnp.asarray(starts.reshape(
                                           plan.n_groups * P, 2)),
                                       wb=wbnd, r_pad=plan.r_pad,
                                       kmax=plan.r_pad + 32)
            t0 = time.perf_counter()
            ops_host = np.asarray(jax.device_get(ops_dev))
            _fill_acc(wait_s=time.perf_counter() - t0)
            for bi, idx in enumerate(chunk):
                c = calls[idx]
                ez = info[bi]
                if ez is None:
                    out[idx] = host(c)
                    _fill_acc(host_calls=1)
                    continue
                if starts[bi][0] >= 0:
                    ez.cigar = _rle_cigar(ops_host[bi], rev)
                out[idx] = ez
    return out  # type: ignore[return-value]
