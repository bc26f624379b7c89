"""TPU chaining: segmented forward-DP relaxation kernel (Pallas).

Device analog of the reference's GPU chaining stage (gpu/plrange.cu +
gpu/plscore.cu), redesigned for the TPU:

- **Range selection** (plrange.cu:38-76 analog): per-anchor successor
  count, computed host-side as one vectorized binary search over the
  (group, position) composite key.
- **Segment cutting** (plrange.cu:70-74 analog): the anchor stream is
  severed wherever range == 0; no valid pair crosses such a cut, so
  segments are independent DP problems.  Unlike the reference (which
  probes cuts only at 512-anchor boundaries), we cut at every zero-range
  anchor.
- **Forward score kernel** (plscore.cu:109-187 analog): anchor i relaxes
  successors i+1..i+range[i]:  f[j] = max(f[j], f[i] + sc(j, i)).
  One TPU layout replaces the GPU's short/mid/long warp split: segments
  are bin-packed longest-first into 128 lanes (multiple segments stacked
  per lane, separated only by their zero ranges), so the sequential
  anchor loop vectorizes across segments AND successor offsets.  Rows
  stream through VMEM in chunks with the successor window carried via
  HBM, so segment length is unbounded by VMEM.  Per-chunk window depth
  adapts to the widest range in the chunk — the TPU equivalent of the
  reference's size-classed kernels + longest-processing-time-first
  scheduling (plscore.cu:330-451, plchain.cu:434-453).
- Tie-breaking reproduces the CPU scan order: relax on `sc >= f[j]` but
  never when sc equals the successor's init value (the reference GPU uses
  the same trick with its fixed MM_QSPAN, plscore.cu:140).  Like the
  reference GPU path, the device kernel assumes a uniform minimizer span
  (non-HPC presets; plscore.cuh:11); HPC reads chain on the host.

Scores use float32 penalty math identical to the host oracle (comput_sc,
lchain.c:113-138), including the bit-exact mg_log2 approximation, so the
device output backtracks to byte-identical PAF.
"""

from __future__ import annotations

import functools
import heapq

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT32_MIN = -(2**31)

LANES = 128
# successor-window capacity classes; a segment runs in the narrowest
# class whose W covers its max successor range (size-classed dispatch).
# The per-tile dynamic window start makes the WALKED trip adapt to the
# ranges actually present, so small classes buy no compute — measured on
# the 600-read bench flowcell, a separate 512 class walked 0.51G slots
# at 7% usefulness and its removal cut total VPU work 18%
# (benchmarks/ROOFLINE.md); classes exist for VMEM footprint + window
# DMA width only.
WINDOW_CLASSES = (768, 5120)
MAX_ITER_DEFAULT = 5000


def _fold8_chunk() -> int:
    """Destination rows per blocked fold8 relaxation (see _chain_kernel):
    0 selects the serialized per-source-row fold; C in {8,16,32,64,128}
    relaxes all 8 source rows against C-dst-row chunks as one
    (8, C, LANES) block + reduction.  Read ONCE at import (the jitted
    kernels cache on shapes only) — set MM2TPU_FOLD8_CHUNK before the
    first import to override.  Default from the on-chip sweep
    (tools/kbench.py, 2026-08-19, best-of-6 fenced reps per mode):
    C=8: 11.5, C=0: 10.3-10.8, C=16: 10.5-10.8, C=32: 9.9, C=64: 9.1,
    C=128: 8.4 Gpairs/s — large blocks spill the (8, C, 128)
    intermediates; C=8 keeps the reduction win without the spills."""
    import os
    v = int(os.environ.get("MM2TPU_FOLD8_CHUNK", "8"))
    if v not in (0, 8, 16, 32, 64, 128):
        raise ValueError(f"MM2TPU_FOLD8_CHUNK={v} not in 0/8/16/32/64/128")
    return v


_FOLD8_CHUNK = _fold8_chunk()


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------------
# range selection + segment cutting (host, vectorized)
# --------------------------------------------------------------------------

def compute_ranges(ax: np.ndarray, read_bounds: np.ndarray,
                   max_dist_x: int, max_iter: int) -> np.ndarray:
    """Successor count per anchor (plrange analog).

    `ax` is the concatenated anchor x-column of a batch of reads, each
    read's slice sorted; `read_bounds` are start offsets per read (with a
    trailing total).  range[i] = #succ j>i in the same (read, strand, rid)
    group with rpos_j <= rpos_i + max_dist_x, capped at max_iter.
    """
    n = ax.shape[0]
    if n == 0:
        return np.empty(0, np.int32)
    from mm2_gb_tpu.utils import native
    if native.available():
        return native.compute_ranges(ax, read_bounds, max_dist_x, max_iter)
    hi = (ax >> np.uint64(32)).astype(np.int64)       # rev|rid
    grp_change = np.zeros(n, dtype=bool)
    grp_change[0] = True
    grp_change[1:] = hi[1:] != hi[:-1]
    starts = read_bounds[:-1]
    grp_change[starts[starts < n]] = True  # anchor-less reads share bounds
    g = np.cumsum(grp_change).astype(np.int64)
    rpos = (ax & np.uint64(0xFFFFFFFF)).astype(np.int64)
    comp = (g << 33) | rpos
    hi_idx = np.searchsorted(comp, (g << 33) | (rpos + max_dist_x),
                             side="right")
    rng = hi_idx - np.arange(n, dtype=np.int64) - 1
    return np.minimum(rng, max_iter).astype(np.int32)


def cut_segments(rng: np.ndarray) -> np.ndarray:
    """Segment start offsets (with trailing total).

    A cut after every anchor with range == 0 is provably safe: positions
    are sorted, so if the next anchor is out of the gap window for i it is
    out of the window for every j < i as well.
    """
    n = rng.shape[0]
    if n == 0:
        return np.zeros(1, dtype=np.int64)
    ends = np.nonzero(rng == 0)[0] + 1
    return np.concatenate(([0], ends)).astype(np.int64)


# --------------------------------------------------------------------------
# in-kernel score function
# --------------------------------------------------------------------------

def _nofma(x: jnp.ndarray) -> jnp.ndarray:
    """Pin an intermediate float32 rounding.

    XLA contracts f32 mul+add into a single-rounding fma (the CPU backend
    even through lax.optimization_barrier); the host oracle (and the C
    reference it byte-matches) rounds the product first.  Routing the
    product through a maximum with -FLT_MAX is value-neutral for every
    finite input but cannot be folded away (x could be -inf for all the
    compiler knows), so the add's operand is no longer a multiply and
    fmuladd formation is blocked on every backend.

    FINITE-RANGE ASSUMPTION: a true -inf product would be clamped to
    -FLT_MAX here and diverge from the oracle's -inf.  Not reachable with
    the bounded operands we feed it — dd/dg < 2*max_dist <= 2^31 and
    |cg|,|cs| <= 255*0.99 (mm_mapopt_update caps chn_pen_gap/skip at
    0.99*avg_qspan, avg_qspan <= 255), so |product| < 2^40 << FLT_MAX —
    but any NEW caller must keep its operands finite-bounded.
    """
    return jnp.maximum(x, jnp.float32(-3.4028235e38))


def _mg_log2_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Bit-exact mg_log2 (mmpriv.h:118-126) on float32 tensors."""
    zi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    e = ((zi >> jnp.uint32(23)) & jnp.uint32(255)).astype(jnp.int32) - 128
    zi = (zi & jnp.uint32(0x807FFFFF)) + jnp.uint32(127 << 23)
    zf = jax.lax.bitcast_convert_type(zi, jnp.float32)
    c1 = jnp.float32(-0.34484843)
    c2 = jnp.float32(2.02466578)
    c3 = jnp.float32(-0.67487759)
    r = _nofma(c1 * zf) + c2
    r = _nofma(r * zf)
    r = r + c3
    return e.astype(jnp.float32) + r


def _pair_score(xs, ys, ss, xp, yp, sp, fp,
                max_dist_x, max_dist_y, bw, cg, cs, is_cdna=False):
    """Score of predecessor (xp, yp, span sp, score fp) against successors
    (xs, ys, span ss).  Returns (total, valid) int32/bool tensors.

    Single-segment-read form of comput_sc (lchain.c:113-138) — the same
    scope the reference GPU kernels support (plscore.cu:74-104).
    is_cdna (splice chaining): a deletion-side gap (dr > dq, a candidate
    intron) pays min(lin_pen, log_pen) instead of lin + 0.5*log
    (lchain.c:128-133; GPU majorAdjustment plscore.cu:97-101).
    """
    dq = ys - yp
    dr = xs - xp
    dd = jnp.abs(dr - dq)
    valid = (dq > 0) & (dq <= max_dist_x) & (dr != 0) & (dd <= bw)
    if max_dist_y != max_dist_x:   # statics: folds away when equal
        valid &= dq <= max_dist_y
    dg = jnp.minimum(dr, dq)
    sc = jnp.minimum(sp, dg)
    lin = (_nofma(cg * dd.astype(jnp.float32))
           + _nofma(cs * dg.astype(jnp.float32)))
    log_pen = jnp.where(dd >= 1, _mg_log2_f32((dd + 1).astype(jnp.float32)),
                        jnp.float32(0.0))
    pen = (lin + _nofma(jnp.float32(0.5) * log_pen)).astype(jnp.int32)
    if is_cdna:
        pen_min = jnp.minimum(lin, log_pen).astype(jnp.int32)
        pen = jnp.where(dr > dq, pen_min, pen)
    sc = jnp.where((dd != 0) | (dg > sp), sc - pen, sc)
    return sc + fp, valid


# --------------------------------------------------------------------------
# the destination-tile-stationary blocked kernel (uniform minimizer span)
# --------------------------------------------------------------------------
#
# Each 128-row destination tile accumulates its scores in a VMEM register
# tile while the predecessor window streams past one row at a time; every
# vector op is a full (128, LANES) tile at a static offset, so nothing pays
# the sublane-shift cost of dynamic-offset tile updates.  Per source row the
# kernel evaluates exactly the 128 destination rows of the tile, and the
# window trip count adapts per tile to the widest predecessor range seen in
# its window — the TPU analog of the reference's size-classed dispatch
# (plscore.cu:330-451).

TILE = 128


def _chain_kernel(ntiles_ref, start_ref,      # scalar prefetch
                  x_hbm, y_hbm, r_hbm, f_in, p_in,
                  f_hbm, p_hbm,
                  xw, yw, rw, fw, acc_f, acc_p, sems, *,
                  W, span, max_dist_x, max_dist_y, bw, cg, cs,
                  is_cdna=False):
    """One fori_loop over dst tiles; see module notes above.

    HBM arrays are padded with W leading rows so every window DMA is a
    static-size in-bounds copy.  f continuity: tile i's window reads f rows
    written by earlier tiles (sequential loop, awaited DMAs).
    """
    del f_in, p_in  # aliased outputs arrive pre-initialized to (span, 0)
    cg = jnp.float32(cg)
    cs = jnp.float32(cs)
    span_i = jnp.int32(span)
    n_tiles = ntiles_ref[0]
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (TILE, LANES), 0)
    WIN = W + TILE

    def tile(i, _):
        t0 = i * TILE  # unpadded dst row offset == padded window offset
        copies = [pltpu.make_async_copy(src.at[pl.ds(t0, WIN), :], dst,
                                        sems.at[s])
                  for s, (src, dst) in enumerate(
                      ((x_hbm, xw), (y_hbm, yw), (r_hbm, rw), (f_hbm, fw)))]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

        def run():
            xt = xw[W:W + TILE, :]
            yt = yw[W:W + TILE, :]
            acc_f[:, :] = jnp.full((TILE, LANES), span_i, jnp.int32)
            acc_p[:, :] = jnp.zeros((TILE, LANES), jnp.int32)
            C = _FOLD8_CHUNK
            r8 = (jax.lax.broadcasted_iota(jnp.int32, (8, C, LANES), 0)
                  if C else None)

            def _fold8_chunk_rel(cur_f, cur_p, xtc, ytc, base, xs, ys, rs,
                                 fs, skip_block_rows):
                """One (8, C, LANES) block relaxation + reduction.

                Tie order: the oracle's ascending last-wins >= fold picks,
                per destination, the LARGEST source index achieving the
                block maximum (each step overwrites on tot >= cur_f, so
                the final winner is the last r attaining the running
                max).  That is order-free: reduce tot over the block with
                max, then take the largest r at the max — bit-identical
                selection without the 8-step dependency chain."""
                tot, valid = _pair_score(
                    xtc[None], ytc[None], span_i, xs, ys,
                    span_i, fs, max_dist_x, max_dist_y, bw, cg, cs,
                    is_cdna)
                d_off = base[None] - r8
                okr = (valid & (d_off >= 1) & (d_off <= rs)
                       & (tot != span_i))
                if skip_block_rows:
                    # intra: block rows already resolved; touching them
                    # again would break the last-wins tie order
                    okr &= d_off > (jnp.int32(7) - r8)
                totm = jnp.where(okr, tot, jnp.int32(INT32_MIN))
                blk = jnp.max(totm, axis=0)
                # masked rows hold INT32_MIN != blk whenever a winner
                # exists; a winnerless column has blk = INT32_MIN < cur_f
                # (scores stay >= span >= 1), so `ok` gates it out
                rwin = jnp.max(jnp.where(totm == blk[None], r8,
                                         jnp.int32(-1)), axis=0)
                ok = blk >= cur_f
                return (jnp.where(ok, blk, cur_f),
                        jnp.where(ok, base - rwin, cur_p))

            def fold8(cur_f, cur_p, xb, yb, rb, fb, s0, skip_block_rows):
                """Relax 8 source rows onto the dst tile, ascending, with
                the oracle's last-wins >= tie-break.

                MM2TPU_FOLD8_CHUNK selects the strategy (see
                _fold8_chunk): 0 = the serialized per-row fold (sublane
                extract/broadcast per source row); C > 0 = blocked
                (8, C, LANES) relaxations + max/largest-r reductions over
                dst chunks of C rows (roofline §5.2) — C trades reduction
                amortization against vector-register pressure."""
                if C == 0:
                    for r in range(8):
                        xs = xb[r, :][None, :]
                        ys = yb[r, :][None, :]
                        rs = rb[r, :][None, :]
                        fs = fb[r, :][None, :]
                        tot, valid = _pair_score(
                            xt, yt, span_i, xs, ys, span_i, fs,
                            max_dist_x, max_dist_y, bw, cg, cs, is_cdna)
                        d_off = rows_i + (W - s0 - r)
                        ok = (valid & (d_off >= 1) & (d_off <= rs)
                              & (tot != span_i) & (tot >= cur_f))
                        if skip_block_rows:
                            ok &= d_off > (7 - r)
                        cur_f = jnp.where(ok, tot, cur_f)
                        cur_p = jnp.where(ok, d_off, cur_p)
                    return cur_f, cur_p
                xs = xb[:, None, :]
                ys = yb[:, None, :]
                rs = rb[:, None, :]
                fs = fb[:, None, :]
                base_full = rows_i + (W - s0)      # d_off of r=0, 2D
                nf, np_ = [], []
                for c0 in range(0, TILE, C):
                    sl = slice(c0, c0 + C)
                    cf, cp = _fold8_chunk_rel(
                        cur_f[sl], cur_p[sl], xt[sl], yt[sl],
                        base_full[sl], xs, ys, rs, fs,
                        skip_block_rows)
                    nf.append(cf)
                    np_.append(cp)
                if len(nf) == 1:
                    return nf[0], np_[0]
                return (jnp.concatenate(nf, axis=0),
                        jnp.concatenate(np_, axis=0))

            # phase 1: source blocks strictly before the tile; their f is
            # final in the window, so the 8 sub-relaxations fold as values
            def p1_block(b, _):
                s0 = b * 8
                sl = pl.ds(s0, 8)
                cur_f, cur_p = fold8(acc_f[:, :], acc_p[:, :], xw[sl, :],
                                     yw[sl, :], rw[sl, :], fw[sl, :], s0,
                                     False)
                acc_f[:, :] = cur_f
                acc_p[:, :] = cur_p
                return 0

            jax.lax.fori_loop(start_ref[i] // 8, W // 8, p1_block, 0)

            # phase 2: the tile's own 8-row blocks in order — resolve each
            # block internally (sequential micro-steps on an (8,128) value),
            # then relax the finalized block onto the rest of the tile
            mini_rows = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

            def p2_block(b, _):
                s0 = W + b * 8
                sl = pl.ds(s0, 8)
                bl = pl.ds(b * 8, 8)
                xb = xw[sl, :]
                yb = yw[sl, :]
                rb = rw[sl, :]
                fb = acc_f[bl, :]
                pb = acc_p[bl, :]
                for r in range(8):  # micro-resolve within the block
                    tot, valid = _pair_score(
                        xb, yb, span_i, xb[r, :][None, :], yb[r, :][None, :],
                        span_i, fb[r, :][None, :], max_dist_x, max_dist_y,
                        bw, cg, cs, is_cdna)
                    d_off = mini_rows - r
                    ok = (valid & (d_off >= 1) & (d_off <= rb[r, :][None, :])
                          & (tot != span_i) & (tot >= fb))
                    fb = jnp.where(ok, tot, fb)
                    pb = jnp.where(ok, d_off, pb)
                acc_f[bl, :] = fb
                acc_p[bl, :] = pb
                cur_f, cur_p = fold8(acc_f[:, :], acc_p[:, :], xb, yb, rb,
                                     fb, s0, True)
                acc_f[:, :] = cur_f
                acc_p[:, :] = cur_p
                return 0

            jax.lax.fori_loop(0, TILE // 8, p2_block, 0)

            # stage in VMEM scratch, then DMA to HBM
            fw[W:W + TILE, :] = acc_f[:, :]
            rw[W:W + TILE, :] = acc_p[:, :]
            cp1 = pltpu.make_async_copy(fw.at[pl.ds(W, TILE), :],
                                        f_hbm.at[pl.ds(t0 + W, TILE), :],
                                        sems.at[0])
            cp2 = pltpu.make_async_copy(rw.at[pl.ds(W, TILE), :],
                                        p_hbm.at[pl.ds(t0 + W, TILE), :],
                                        sems.at[1])
            cp1.start()
            cp2.start()
            cp1.wait()
            cp2.wait()

        # tiles with no reachable predecessors keep their init f/p
        jax.lax.cond(start_ref[i] < W + TILE - 1, run, lambda: None)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)


def _chain_packed_core(ntiles, start, x, y, rng, *, W, span,
                       max_dist_x, max_dist_y, bw, cg, cs,
                       is_cdna=False):
    """Run the blocked chain kernel on W-padded [H, 128] int32 arrays.

    `ntiles` ([1] int32) is the dynamic tile trip; `start[i]` the first
    window row (in [0, W+127]) with a predecessor that can reach tile i.
    Returns (f, p) over the same padded layout (p = predecessor distance).
    """
    kern = functools.partial(
        _chain_kernel, W=W, span=span, max_dist_x=max_dist_x,
        max_dist_y=max_dist_y, bw=bw, cg=float(cg), cs=float(cs),
        is_cdna=is_cdna)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        scratch_shapes=[
            pltpu.VMEM((W + TILE, LANES), jnp.int32),
            pltpu.VMEM((W + TILE, LANES), jnp.int32),
            pltpu.VMEM((W + TILE, LANES), jnp.int32),
            pltpu.VMEM((W + TILE, LANES), jnp.int32),
            pltpu.VMEM((TILE, LANES), jnp.int32),
            pltpu.VMEM((TILE, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    f0 = jnp.full(x.shape, span, jnp.int32)
    p0 = jnp.zeros(x.shape, jnp.int32)
    f, p = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(x.shape, jnp.int32),
                   jax.ShapeDtypeStruct(x.shape, jnp.int32)),
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(ntiles, start, x, y, rng, f0, p0)
    return f, p.astype(jnp.int16)


chain_packed_tpu = functools.partial(jax.jit, static_argnames=(
    "W", "span", "max_dist_x", "max_dist_y", "bw", "cg", "cs",
    "is_cdna"))(_chain_packed_core)


@functools.partial(jax.jit, static_argnames=(
    "H", "W", "n_pad", "s_pad", "span", "max_dist_x", "max_dist_y", "bw",
    "cg", "cs", "is_cdna"))
def chain_compact_tpu(nmeta, start, flat, *, H, W, n_pad, s_pad,
                      span, max_dist_x, max_dist_y, bw, cg, cs,
                      is_cdna=False):
    """Compact-transfer variant: ships ONE flat int32 operand laid out
    as [x32 (n_pad) | y32 (n_pad) | rng int16 packed 2/word (n_pad/2) |
    astart (s_pad) | prow (s_pad) | col (s_pad)] — 10 B per anchor plus
    12 B per segment, down from 16 B/anchor (roofline §5.3): in-class
    ranges fit int16 (<= the window class <= 5120) and the padded-layout
    scatter coordinates are DERIVED ON DEVICE from per-segment metadata
    (anchors of a segment are contiguous in pack order), so they never
    cross the host link.  `nmeta` is [dynamic tile trip, n_real].  The
    scatter into the padded [H, 128] layout and the result gather also
    run on device.  plmem's pinned SoA-reorg H2D analog
    (plmem.cu:154-236), re-thought for XLA: the reorg is a device-side
    scatter, not a host memcpy."""
    rw = n_pad // 2
    x32 = flat[:n_pad]
    y32 = flat[n_pad:2 * n_pad]
    words = flat[2 * n_pad:2 * n_pad + rw]
    # little-endian int16 pairs per int32 word (host writes a .view)
    rng = jnp.stack([words & 0xFFFF, (words >> 16) & 0xFFFF],
                    axis=1).reshape(n_pad)
    o = 2 * n_pad + rw
    astart = flat[o:o + s_pad]           # first packed-anchor idx per seg
    prow = flat[o + s_pad:o + 2 * s_pad]          # padded start row
    col = flat[o + 2 * s_pad:o + 3 * s_pad]       # lane
    idx = jnp.arange(n_pad, dtype=jnp.int32)
    sid = jnp.searchsorted(astart, idx, side="right") - 1
    live = idx < nmeta[1]  # pad anchors (and pad segs) park at (0, 0)
    rows = jnp.where(live, prow[sid] + (idx - astart[sid]), 0)
    cols = jnp.where(live, col[sid], 0)
    z = jnp.zeros((H, LANES), jnp.int32)
    X = z.at[rows, cols].set(x32)
    Y = z.at[rows, cols].set(y32)
    R = z.at[rows, cols].set(rng)
    f, p = _chain_packed_core(nmeta[:1], start, X, Y, R, W=W, span=span,
                              max_dist_x=max_dist_x, max_dist_y=max_dist_y,
                              bw=bw, cg=cg, cs=cs, is_cdna=is_cdna)
    # p stays int16 on the wire (predecessor distance < W+128 <= 5248):
    # the downlink ships 6 B/anchor instead of 8 on a ~17-40 MB/s tunnel
    return f[rows, cols], p[rows, cols]


def _flat_len(n_pad: int, s_pad: int) -> int:
    return 2 * n_pad + n_pad // 2 + 3 * s_pad


def _seg_meta_into(flat: np.ndarray, o: int, s_pad: int,
                   lens: np.ndarray, off_of: np.ndarray,
                   lane_of: np.ndarray, W: int, n_real: int) -> None:
    """Fill the [astart | prow | col] tail of the flat uplink buffer.
    Pad segments get astart = n_real so the device's searchsorted sends
    every pad anchor to a pad segment (then masked to (0, 0))."""
    s_real = lens.shape[0]
    flat[o:o + s_real] = np.concatenate(([0], np.cumsum(lens[:-1])))
    flat[o + s_real:o + s_pad] = n_real
    flat[o + s_pad:o + s_pad + s_real] = W + off_of
    flat[o + 2 * s_pad:o + 2 * s_pad + s_real] = lane_of


# --------------------------------------------------------------------------
# host packing + dispatch
# --------------------------------------------------------------------------

def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _quant_size(n: int, floor: int = 2048) -> int:
    """Quantize a compiled operand length to quarter-power-of-two steps
    ({2^k, 1.25*2^k, 1.5*2^k, 1.75*2^k}), min `floor`.

    Pure powers of two waste up to 50% of the host-link bytes as padding
    (a 1.05M-anchor batch would ship as 2M); quarter steps cap the waste
    at 25% (avg ~12%) for at most 4 cached executables per octave —
    shapes persist in the XLA compile cache, so the extra compiles are a
    one-time cost per host."""
    if n <= floor:
        return floor
    k = (n - 1).bit_length() - 3        # step = quarter of the octave base
    return _round_up(n, 1 << k)


class PendingScores:
    """In-flight device chain scores for one macro-batch.

    dispatch_scores() packs and launches the kernels without blocking
    (JAX async dispatch); collect() device_gets the results and scatters
    them back — the host does backtrack/alignment of the *previous*
    batch between the two, the TPU analog of the reference's
    drain-previous-while-next-runs stream design (plchain.cu:292-306).
    """

    def __init__(self, n: int):
        self.f = np.zeros(n, dtype=np.int32)
        self.p = np.full(n, -1, dtype=np.int64)
        self.parts: list = []   # (dev_fp, src, n_real, W, pairs)
        self.collected = n == 0
        self.metrics = None

    def collect(self) -> tuple[np.ndarray, np.ndarray]:
        """Block on the device results and scatter into (f, p).

        Each window class's readback is timed separately into
        TpuMetrics.cls_stats (the per-kernel event-table analog,
        gpu/planalyze.cu:59-86 / plchain.cu:258-281).  The device stream
        executes in launch order, so a part's device_get resolves when
        that class's kernels are done; per-part deltas attribute wall to
        classes (tunnel wait rides on the FIRST part's delta)."""
        if not self.collected:
            import time
            for dev_fp, src, n_real, W, pairs in self.parts:
                t0 = time.perf_counter()
                # device_get, NOT np.asarray: the latter falls into a
                # pathological element-wise path on tunneled TPU platforms
                fd, pd = jax.device_get(dev_fp)
                dt = time.perf_counter() - t0
                if self.metrics is not None:
                    st = self.metrics.cls_stats.setdefault(
                        W, [0.0, 0, 0])
                    st[0] += dt
                    st[1] += pairs
                    st[2] += 1
                self.f[src] = fd[:n_real]
                prel = pd[:n_real].astype(np.int64)
                self.p[src] = np.where(prel > 0, src - prel, -1)
            self.parts = []
            self.collected = True
        return self.f, self.p


def dispatch_scores(ax: np.ndarray, ay: np.ndarray,
                    read_bounds: np.ndarray, max_dist_x: int,
                    max_dist_y: int, bw: int, max_iter: int,
                    cg: float, cs: float, metrics=None,
                    device=None, is_cdna: bool = False) -> PendingScores:
    """Pack and asynchronously launch chain scoring for a whole batch.

    Host-side work (range selection, cutting, lane packing) happens here;
    kernels are dispatched per window class without blocking.  Non-
    uniform-span (HPC) input and oversize segments compute on the host
    immediately, mirroring the reference GPU path's fixed-span
    restriction (plscore.cuh:11) and CPU fallback (map.c:1030-1035).

    `device` pins the launch to a specific jax.Device — the data-parallel
    multichip path dispatches one shard per chip this way (computation
    follows committed operands; zero collectives).
    """
    import time

    from mm2_gb_tpu.ops.chain import _chain_dp_scores

    n = ax.shape[0]
    pend = PendingScores(n)
    if n == 0:
        return pend
    if max_dist_x < bw:
        max_dist_x = bw
    if max_dist_y < bw:
        max_dist_y = bw

    span32 = ((ay >> np.uint64(32)) & np.uint64(0xFF)).astype(np.int32)
    span = int(span32[0])
    if not np.all(span32 == span):
        f, p = _chain_dp_scores(ax, ay, max_dist_x, max_dist_y, bw,
                                2**31 - 1, max_iter, np.float32(cg),
                                np.float32(cs), is_cdna, 1)
        pend.f, pend.p = f, p
        pend.collected = True
        return pend

    t0 = time.perf_counter()
    rng = compute_ranges(ax, read_bounds, max_dist_x, max_iter)
    bounds = cut_segments(rng)
    seg_lens = np.diff(bounds)
    n_segs = seg_lens.shape[0]
    seg_maxrng = (np.maximum.reduceat(rng, bounds[:-1]) if n_segs
                  else np.empty(0, np.int32))

    from mm2_gb_tpu.utils import native
    use_native = native.available()
    x32 = (ax & np.uint64(0xFFFFFFFF)).astype(np.int32)
    y32 = (ay & np.uint64(0xFFFFFFFF)).astype(np.int32)
    if not use_native:
        seg_of = np.repeat(np.arange(n_segs), seg_lens)
        row_of = (np.arange(n, dtype=np.int64)
                  - np.repeat(bounds[:-1], seg_lens))
    if metrics is not None:
        metrics.t_range += time.perf_counter() - t0
        metrics.n_segs += int(n_segs)
        metrics.n_pairs += int(rng.sum(dtype=np.int64))

    for wi, W in enumerate(WINDOW_CLASSES):
        lo = 0 if wi == 0 else WINDOW_CLASSES[wi - 1]
        sel = np.nonzero((seg_maxrng > lo) & (seg_maxrng <= W))[0] if wi \
            else np.nonzero(seg_maxrng <= W)[0]
        if sel.shape[0] == 0:
            continue
        t0 = time.perf_counter()
        # quantize every compiled shape to a power of two so batches of
        # varying size reuse cached executables (XLA recompiles per
        # shape; ntiles stays the dynamic trip count, so padded tiles
        # are allocated but never executed)
        lens = seg_lens[sel]
        s_pad = _quant_size(lens.shape[0], floor=256)
        if use_native:
            # fused one-pass pack (mmt_pack_class_flat): flat operand,
            # src map, per-row range max and pair count in a single sweep
            lane_of, off_of, height = native.lpt_pack(lens, LANES)
            tiles_real = max(_round_up(max(height, 1), TILE) // TILE, 1)
            H = W + tiles_real * TILE
            n_real = int(lens.sum())
            n_pad = _quant_size(n_real)
            flat = np.zeros(_flat_len(n_pad, s_pad), np.int32)
            src, rmax, pairs = native.pack_class_flat(
                bounds, sel, off_of, x32, y32, rng, W, H, n_real, n_pad,
                flat)
            start = native.tile_starts(rmax, H, W, TILE, tiles_real)
        else:
            (ntiles_a, start, H, src, rows, cols,
             lane_of, off_of) = pack_class_meta(
                sel, seg_lens, seg_of, row_of, rng, W)
            n_real = int(src.shape[0])
            n_pad = _quant_size(n_real)
            tiles_real = int(ntiles_a[0])
            flat = np.zeros(_flat_len(n_pad, s_pad), np.int32)
            flat[:n_real] = x32[src]
            flat[n_pad:n_pad + n_real] = y32[src]
            flat[2 * n_pad:2 * n_pad + n_pad // 2].view(
                np.int16)[:n_real] = rng[src].astype(np.int16)
            pairs = int(rng[src].astype(np.int64).sum())
        _seg_meta_into(flat, 2 * n_pad + n_pad // 2, s_pad, lens,
                       off_of, lane_of, W, n_real)
        nmeta = np.array([tiles_real, n_real], np.int32)
        tiles_alloc = 1 << (tiles_real - 1).bit_length()
        H_alloc = W + tiles_alloc * TILE
        start_pad = np.full(tiles_alloc, W + TILE - 1, np.int32)
        start_pad[:tiles_real] = start
        if metrics is not None:
            metrics.t_pack += time.perf_counter() - t0
            metrics.cells_used += n_real
            metrics.cells_alloc += tiles_real * TILE * LANES
            metrics.n_dispatch += 1
            # VPU slot work, mirroring the kernel's trips: per live tile
            # phase 1 walks (W//8 - start//8) 8-row source blocks, phase
            # 2 the tile's own TILE rows, each relaxing a (TILE, LANES)
            # dst tile (see _chain_kernel)
            live = start < W + TILE - 1
            p1_rows = np.maximum((W // 8 - start[live] // 8) * 8, 0)
            slots = int((p1_rows + TILE).sum(dtype=np.int64)) * TILE * LANES
            st = metrics.cls_work.setdefault(W, [0, 0])
            st[0] += slots
            st[1] += pairs
        t0 = time.perf_counter()
        if device is not None:
            nmeta, start_pad, flat = jax.device_put(
                (nmeta, start_pad, flat), device)
        dev_fp = chain_compact_tpu(
            nmeta, start_pad, flat, H=H_alloc, W=W, n_pad=n_pad,
            s_pad=s_pad, span=span,
            max_dist_x=max_dist_x, max_dist_y=max_dist_y, bw=bw,
            cg=cg, cs=cs, is_cdna=is_cdna)
        if not _interpret():
            _record_shape((tiles_alloc, n_pad, s_pad, W, span, max_dist_x,
                           max_dist_y, bw, cg, cs, bool(is_cdna)))
        pend.parts.append((dev_fp, src, n_real, W, pairs))
        if metrics is not None:
            metrics.t_dispatch += time.perf_counter() - t0
    pend.collected = False
    pend.metrics = metrics

    # capacity fallback: segments wider than the largest window class chain
    # on the host, like the reference's CPU fallback for reads that miss
    # the micro-batch (map.c:1030-1035); unreachable at default max_iter
    over = np.nonzero(seg_maxrng > WINDOW_CLASSES[-1])[0]
    if over.shape[0]:
        import sys
        sys.stderr.write(f"[W::chain_tpu] {over.shape[0]} segments exceed "
                         f"the device window ({WINDOW_CLASSES[-1]}); "
                         "chaining them on the host\n")
        for si in over:
            s, e = int(bounds[si]), int(bounds[si + 1])
            fs, ps = _chain_dp_scores(ax[s:e], ay[s:e], max_dist_x,
                                      max_dist_y, bw, 2**31 - 1, max_iter,
                                      np.float32(cg), np.float32(cs),
                                      is_cdna, 1)
            pend.f[s:e] = fs
            pend.p[s:e] = np.where(ps >= 0, ps + s, -1)
    return pend


# --------------------------------------------------------------------------
# executable warm-up
# --------------------------------------------------------------------------
#
# Over a tunneled device every per-process first call of a compiled shape
# pays an executable compile-or-load round trip (0.5 s quiet, minutes under
# tenant load) — the per-process analog of the reference's one-time CUDA
# module load.  Launch signatures are tiny and recur across invocations
# (every compiled dim is already power-of-two quantized), so we persist
# them next to the XLA compilation cache and, at pipeline start, replay
# the most recent ones with zero-filled operands on a daemon thread while
# the host builds the index and seeds the first batches.  ntiles=0 makes
# the kernel a no-op: the call costs one compile/load + one zeros upload,
# all off the critical path.

_WARM_MAX = 24         # most-recent signatures replayed per process
#                        (chain classes + the fused fill-chunk shapes;
#                        each skipped shape costs ~1 s of BLOCKING
#                        executable load at first dispatch instead)
_warm_seen: set = set()
_warm_lock = None      # created lazily (threading import kept off hot path)
_warm_thread = None
_warm_stop = False


def _shapes_path() -> str:
    import os
    loc = os.environ.get("MM2TPU_JAX_CACHE", "")
    if loc == "0":
        return ""
    base = loc or os.path.join(os.path.expanduser("~"), ".cache",
                               "mm2_gb_tpu", "jaxcache")
    # v3: the uplink became the flat [x|y|rng16|segmeta] buffer (sig
    # gained s_pad) — older sigs would warm executables no dispatch can
    # hit
    return base + ".shapes.v3.json"


def _record_shape(sig: tuple) -> None:
    """Persist a launch signature (atomic rewrite, newest-last)."""
    global _warm_lock
    import json
    import os
    import threading
    import time
    if _warm_lock is None:
        _warm_lock = threading.Lock()
    with _warm_lock:
        if sig in _warm_seen:
            return
        _warm_seen.add(sig)
        path = _shapes_path()
        if not path:
            return
        try:
            entries = {}
            if os.path.exists(path):
                with open(path) as f:
                    entries = {tuple(e["sig"]): e["ts"]
                               for e in json.load(f)}
            entries[sig] = time.time()
            keep = sorted(entries.items(), key=lambda kv: kv[1])[-64:]
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump([{"sig": list(s), "ts": t} for s, t in keep], f)
            os.replace(tmp, path)
        except (OSError, ValueError, TypeError, KeyError):
            pass


def _warm_one(sig: tuple) -> None:
    (tiles_alloc, n_pad, s_pad, W, span, max_dist_x, max_dist_y, bw,
     cg, cs, is_cdna) = sig
    # Dummy operands are created ON DEVICE (jnp fills lower to an XLA
    # broadcast): a host np.zeros here would ship 10*n_pad bytes of
    # zeros up a ~30 MB/s tunnel per warmed shape — 20 MB for a 2M
    # class, queued AHEAD of the first real dispatch.  The warm's only
    # link traffic must be the executable load itself.
    nmeta = jnp.zeros(2, jnp.int32)
    start = jnp.full((tiles_alloc,), W + TILE - 1, jnp.int32)
    flat = jnp.zeros(_flat_len(n_pad, s_pad), jnp.int32)
    out = chain_compact_tpu(nmeta, start, flat,
                            H=W + tiles_alloc * TILE, W=W, n_pad=n_pad,
                            s_pad=s_pad, span=span,
                            max_dist_x=max_dist_x, max_dist_y=max_dist_y,
                            bw=bw, cg=cg, cs=cs, is_cdna=bool(is_cdna))
    jax.device_get((out[0][:1], out[1][:1]))  # fence: executable loaded


def warm_start(verbose: int = 1, pre=None) -> None:
    """Compile/load recently-used chain executables on a daemon thread.

    No-op on CPU backends (interpret mode compiles per call anyway).
    Call as early as possible on the TPU path — index build and seeding
    then overlap the tunnel's per-process backend handshake and
    compile/load latency instead of serializing behind the first
    dispatch.  `pre` (e.g. tpucfg.derive_caps) runs first on the same
    thread: it is what forces the backend handshake."""
    global _warm_thread, _warm_stop
    import json
    import os
    import sys
    import threading
    path = _shapes_path()
    have_shapes = bool(path) and os.path.exists(path)
    if pre is None and not have_shapes:
        return

    def run():
        n = 0
        try:
            if _interpret():
                return
            if pre is not None:
                pre()
            if not have_shapes:
                return
            with open(path) as f:
                entries = json.load(f)
            sigs = [tuple(e["sig"]) for e in entries
                    if (isinstance(e["sig"][0], str)       # ksw2 fill sig
                        or e["sig"][3] in WINDOW_CLASSES)][-_WARM_MAX:]
            for sig in reversed(sigs):  # newest first
                if _warm_stop:
                    break
                if isinstance(sig[0], str):
                    from mm2_gb_tpu.ops import ksw2_tpu
                    ksw2_tpu._warm_fill(sig)
                else:
                    _warm_one(sig)
                n += 1
            if verbose >= 3:
                sys.stderr.write(f"[M::tpu] warmed {n}/{len(sigs)} chain "
                                 "executables\n")
        except Exception as e:  # warm-up must never break mapping
            if verbose >= 3:
                sys.stderr.write(f"[W::tpu] warm-up skipped: {e}\n")

    _warm_stop = False
    _warm_thread = threading.Thread(target=run, daemon=True,
                                    name="mm2tpu-warm")
    _warm_thread.start()


def warm_shutdown(timeout: float = 1.0) -> bool:
    """Stop the warm-up thread before interpreter exit.

    A daemon thread mid-PJRT-call aborts the process when the runtime
    tears down under it (SIGABRT on a stalled tunnel).  Returns True
    when the thread is gone (or never ran); on False the caller should
    flush its streams and hard-exit (os._exit) to skip the racy
    teardown."""
    global _warm_stop
    if _warm_thread is None or not _warm_thread.is_alive():
        return True
    _warm_stop = True
    _warm_thread.join(timeout)
    return not _warm_thread.is_alive()


def chain_scores_device(ax: np.ndarray, ay: np.ndarray,
                        read_bounds: np.ndarray, max_dist_x: int,
                        max_dist_y: int, bw: int, max_iter: int,
                        cg: float, cs: float
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Synchronous dispatch + collect (see dispatch_scores)."""
    return dispatch_scores(ax, ay, read_bounds, max_dist_x, max_dist_y,
                           bw, max_iter, cg, cs).collect()


def _pack_lanes(lens: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """First-fit-decreasing bin packing of segments into LANES lanes.

    Returns (lane_of_seg, off_of_seg, height): multiple segments stack in
    one lane back-to-back; heights stay balanced by always extending the
    currently-shortest lane (LPT).  The native path (csrc/hostkit.cpp::
    mmt_lpt_pack) produces bit-identical packings ~40x faster."""
    from mm2_gb_tpu.utils import native
    if native.available():
        return native.lpt_pack(lens, LANES)
    order = np.argsort(-lens, kind="stable")
    lane_of = np.empty(lens.shape[0], dtype=np.int64)
    off_of = np.empty(lens.shape[0], dtype=np.int64)
    heap = [(0, lane) for lane in range(LANES)]
    heapq.heapify(heap)
    for si in order:
        h, lane = heapq.heappop(heap)
        lane_of[si] = lane
        off_of[si] = h
        heapq.heappush(heap, (h + int(lens[si]), lane))
    height = max(h for h, _ in heap)
    return lane_of, off_of, height


def pack_class_meta(sel, seg_lens, seg_of, row_of, rng, W):
    """Packing metadata for the selected segments: the padded layout's
    (ntiles, start, H) plus the (src, rows, cols) coordinates of every
    in-class anchor.  The dense layout itself is built on device
    (chain_compact_tpu); only the per-row range max is materialized here
    to derive each tile's dynamic window start."""
    lens = seg_lens[sel]
    lane_sel, off_sel, height = _pack_lanes(lens)
    n_tiles = max(_round_up(max(height, 1), TILE) // TILE, 1)
    H = W + n_tiles * TILE  # W leading pad rows keep window DMAs in bounds

    lane_of_seg = np.full(seg_lens.shape[0], -1, dtype=np.int64)
    off_of_seg = np.zeros(seg_lens.shape[0], dtype=np.int64)
    lane_of_seg[sel] = lane_sel
    off_of_seg[sel] = off_sel

    in_class = lane_of_seg[seg_of] >= 0
    src = np.nonzero(in_class)[0]
    rows = W + row_of[src] + off_of_seg[seg_of[src]]
    cols = lane_of_seg[seg_of[src]]

    # per-tile dynamic window start: the first padded row whose range can
    # reach into the tile decides how much of the window the kernel walks
    from mm2_gb_tpu.utils import native
    if native.available():
        start = native.pack_meta(rows, rng[src], H, W, TILE, n_tiles)
    else:
        rmax = np.zeros(H, np.int32)
        np.maximum.at(rmax, rows, rng[src])
        start = np.empty(n_tiles, np.int32)
        reach = np.arange(H, dtype=np.int64) + np.minimum(rmax, W)
        for i in range(n_tiles):
            t0 = i * TILE
            w = reach[t0:t0 + W + TILE - 1]
            can = np.nonzero(w >= t0 + W)[0]
            start[i] = int(can[0]) if can.shape[0] else W + TILE - 1
    ntiles = np.array([n_tiles], np.int32)
    return ntiles, start, H, src, rows, cols, lane_sel, off_sel


def pack_class(sel, seg_lens, seg_of, row_of, rng, x32, y32, W):
    """Densely pack the selected segments into the kernel's padded
    [W + tiles*128, 128] layout.  Returns (ntiles, start, X, Y, R) kernel
    inputs plus (src, rows, cols) for scattering results back."""
    ntiles, start, H, src, rows, cols = pack_class_meta(
        sel, seg_lens, seg_of, row_of, rng, W)[:6]
    shape = (H, LANES)
    X = np.zeros(shape, np.int32)
    Y = np.zeros(shape, np.int32)
    R = np.zeros(shape, np.int32)
    X[rows, cols] = x32[src]
    Y[rows, cols] = y32[src]
    R[rows, cols] = rng[src]
    return ntiles, start, X, Y, R, src, rows, cols


