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
# (chunk rows C, successor-window capacity W, window tile WT) classes; a
# segment is placed in the narrowest W >= its max successor range
WINDOW_CLASSES = ((1024, 512, 512), (256, 5120, 256))
MAX_ITER_DEFAULT = 5000


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
    hi = (ax >> np.uint64(32)).astype(np.int64)       # rev|rid
    grp_change = np.zeros(n, dtype=bool)
    grp_change[0] = True
    grp_change[1:] = hi[1:] != hi[:-1]
    grp_change[read_bounds[:-1]] = True
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

def _mg_log2_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Bit-exact mg_log2 (mmpriv.h:118-126) on float32 tensors."""
    zi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    e = ((zi >> jnp.uint32(23)) & jnp.uint32(255)).astype(jnp.int32) - 128
    zi = (zi & jnp.uint32(0x807FFFFF)) + jnp.uint32(127 << 23)
    zf = jax.lax.bitcast_convert_type(zi, jnp.float32)
    c1 = jnp.float32(-0.34484843)
    c2 = jnp.float32(2.02466578)
    c3 = jnp.float32(-0.67487759)
    r = c1 * zf + c2
    r = r * zf
    r = r + c3
    return e.astype(jnp.float32) + r


def _pair_score(xs, ys, ss, xp, yp, sp, fp,
                max_dist_x, max_dist_y, bw, cg, cs):
    """Score of predecessor (xp, yp, span sp, score fp) against successors
    (xs, ys, span ss).  Returns (total, valid) int32/bool tensors.

    Single-segment-read form of comput_sc (lchain.c:113-138) — the same
    scope the reference GPU kernels support (plscore.cu:74-104).
    """
    dq = ys - yp
    dr = xs - xp
    dd = jnp.abs(dr - dq)
    valid = ((dq > 0) & (dq <= max_dist_x) & (dr != 0)
             & (dq <= max_dist_y) & (dd <= bw))
    dg = jnp.minimum(dr, dq)
    sc = jnp.minimum(sp, dg)
    lin = (cg * dd.astype(jnp.float32) + cs * dg.astype(jnp.float32))
    log_pen = jnp.where(dd >= 1, _mg_log2_f32((dd + 1).astype(jnp.float32)),
                        jnp.float32(0.0))
    pen = (lin + jnp.float32(0.5) * log_pen).astype(jnp.int32)
    sc = jnp.where((dd != 0) | (dg > sp), sc - pen, sc)
    return sc + fp, valid


# --------------------------------------------------------------------------
# the chunked lane-packed kernel (uniform minimizer span)
# --------------------------------------------------------------------------

def _chain_kernel(nchunks_ref,  # scalar prefetch [1]
                  chunk_rng_ref,  # scalar prefetch [n_chunks_cap]
                  x_hbm, y_hbm, r_hbm, f_in, p_in,     # ANY (HBM)
                  f_hbm, p_hbm,                        # outputs (aliased)
                  xv, yv, rv, fv, pv, sems, *,
                  C, W, WT, span, max_dist_x, max_dist_y, bw, cg, cs):
    del f_in, p_in  # aliased to f_hbm/p_hbm (arrive pre-initialized)
    cg = jnp.float32(cg)
    cs = jnp.float32(cs)
    span_i = jnp.int32(span)
    n_chunks = nchunks_ref[0]
    d_off0 = jax.lax.broadcasted_iota(jnp.int32, (WT, LANES), 0)
    C_T = pl.cdiv(C, WT)           # chunk body in units of WT rows

    def chunk(c, _):
        row0 = c * C
        # adaptive successor window: widest range in this chunk decides how
        # many WT-row tiles each step relaxes and how many rows stream in
        rng_max = chunk_rng_ref[c]
        n_wt = jnp.minimum(pl.cdiv(rng_max, WT), W // WT)
        n_rows_t = C_T + n_wt      # WT-row tiles resident per chunk

        def dma_tiles(pairs, lim, slot_base=0):
            def one(k, _):
                r = row0 + k * WT
                copies = [
                    pltpu.make_async_copy(
                        src.at[pl.ds(r, WT), :] if not hb else
                        src.at[pl.ds(k * WT, WT), :],
                        dst.at[pl.ds(k * WT, WT), :] if not hb else
                        dst.at[pl.ds(r, WT), :],
                        sems.at[slot_base + s])
                    for s, (src, dst, hb) in enumerate(pairs)]
                for cp in copies:
                    cp.start()
                for cp in copies:
                    cp.wait()
                return 0
            jax.lax.fori_loop(0, lim, one, 0)

        def run():
            # stream in x/y/range; f continuity comes from HBM (written by
            # the previous chunk); the first C rows of f for THIS chunk
            # also come from HBM (they hold carry-in relaxations)
            dma_tiles([(x_hbm, xv, False), (y_hbm, yv, False),
                       (r_hbm, rv, False), (f_hbm, fv, False),
                       (p_hbm, pv, False)], n_rows_t)

            steps = jnp.minimum(C, n_chunks * C - row0)

            def step(t, _):
                xp = xv[t, :][None, :]
                yp = yv[t, :][None, :]
                fp = fv[t, :][None, :]
                rt = rv[t, :][None, :]

                def wtile(w, _):
                    base = t + 1 + w * WT
                    sl = pl.ds(base, WT)
                    xs = xv[sl, :]
                    ys = yv[sl, :]
                    tot, valid = _pair_score(xs, ys, span_i, xp, yp, span_i,
                                             fp, max_dist_x, max_dist_y, bw,
                                             cg, cs)
                    d_off = d_off0 + w * WT
                    fw = fv[sl, :]
                    ok = (valid & (d_off < rt) & (tot >= fw)
                          & (tot != span_i))
                    fv[sl, :] = jnp.where(ok, tot, fw)
                    pv[sl, :] = jnp.where(ok, d_off + 1, pv[sl, :])
                    return 0

                jax.lax.fori_loop(0, n_wt, wtile, 0)
                return 0

            jax.lax.fori_loop(0, steps, step, 0)

            dma_tiles([(fv, f_hbm, True), (pv, p_hbm, True)], n_rows_t)

        # chunks whose widest range is 0 have nothing to relax (their f/p
        # already hold init values in HBM)
        jax.lax.cond(rng_max > 0, run, lambda: None)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


@functools.partial(jax.jit, static_argnames=(
    "C", "W", "WT", "span", "max_dist_x", "max_dist_y", "bw", "cg", "cs"))
def chain_packed_tpu(nchunks, chunk_rng, x, y, rng, *, C, W, WT, span,
                     max_dist_x, max_dist_y, bw, cg, cs):
    """Run the chunked chain kernel on [H, 128] int32 arrays.

    H = chunks*C + W; `nchunks` ([1] int32) is the dynamic chunk trip,
    `chunk_rng` the per-chunk widest successor range (adaptive window
    depth).  Returns (f int32, p int16 relative predecessor).
    """
    kern = functools.partial(
        _chain_kernel, C=C, W=W, WT=WT, span=span, max_dist_x=max_dist_x,
        max_dist_y=max_dist_y, bw=bw, cg=float(cg), cs=float(cs))
    hv = ((C + WT - 1) // WT) * WT + W     # VMEM rows (WT-quantized body)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        scratch_shapes=[
            pltpu.VMEM((hv, LANES), jnp.int32),
            pltpu.VMEM((hv, LANES), jnp.int32),
            pltpu.VMEM((hv, LANES), jnp.int32),
            pltpu.VMEM((hv, LANES), jnp.int32),
            pltpu.VMEM((hv, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )
    # f/p live in HBM; init on device (saves two host→device transfers)
    f0 = jnp.full(x.shape, span, jnp.int32)
    p0 = jnp.zeros(x.shape, jnp.int32)
    f, p = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(x.shape, jnp.int32),
                   jax.ShapeDtypeStruct(x.shape, jnp.int32)),
        input_output_aliases={5: 0, 6: 1},   # f0→f, p0→p (post-prefetch idx)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(nchunks, chunk_rng, x, y, rng, f0, p0)
    # headline D2H saver: relative predecessors fit int16 (max_iter<=32767,
    # same bound the reference exploits with its uint16 p, plmem.cuh:30)
    return f, p.astype(jnp.int16)


# --------------------------------------------------------------------------
# host packing + dispatch
# --------------------------------------------------------------------------

def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _pow2_at_least(v: int, lo: int) -> int:
    r = lo
    while r < v:
        r <<= 1
    return r


def chain_scores_device(ax: np.ndarray, ay: np.ndarray,
                        read_bounds: np.ndarray, max_dist_x: int,
                        max_dist_y: int, bw: int, max_iter: int,
                        cg: float, cs: float
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Chain-score a whole batch of reads' anchors on the TPU.

    Returns (f, p) matching the host oracle's _chain_dp_scores output
    (p as global predecessor index or -1).  Non-uniform-span (HPC) input
    falls back to the host, mirroring the reference GPU path's fixed-span
    restriction (plscore.cuh:11).
    """
    from mm2_gb_tpu.ops.chain import _chain_dp_scores

    n = ax.shape[0]
    f_out = np.zeros(n, dtype=np.int32)
    p_out = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return f_out, p_out
    if max_dist_x < bw:
        max_dist_x = bw
    if max_dist_y < bw:
        max_dist_y = bw

    span32 = ((ay >> np.uint64(32)) & np.uint64(0xFF)).astype(np.int32)
    span = int(span32[0])
    if not np.all(span32 == span):
        f, p = _chain_dp_scores(ax, ay, max_dist_x, max_dist_y, bw,
                                2**31 - 1, max_iter, np.float32(cg),
                                np.float32(cs), False, 1)
        return f, p

    rng = compute_ranges(ax, read_bounds, max_dist_x, max_iter)
    bounds = cut_segments(rng)
    seg_lens = np.diff(bounds)
    n_segs = seg_lens.shape[0]
    seg_maxrng = (np.maximum.reduceat(rng, bounds[:-1]) if n_segs
                  else np.empty(0, np.int32))

    x32 = (ax & np.uint64(0xFFFFFFFF)).astype(np.int32)
    y32 = (ay & np.uint64(0xFFFFFFFF)).astype(np.int32)
    seg_of = np.repeat(np.arange(n_segs), seg_lens)
    row_of = np.arange(n, dtype=np.int64) - np.repeat(bounds[:-1], seg_lens)

    for wi, (C, W, WT) in enumerate(WINDOW_CLASSES):
        lo = 0 if wi == 0 else WINDOW_CLASSES[wi - 1][1]
        sel = np.nonzero((seg_maxrng > lo) & (seg_maxrng <= W))[0] if wi \
            else np.nonzero(seg_maxrng <= W)[0]
        if sel.shape[0] == 0:
            continue
        _run_class(sel, seg_lens, bounds, seg_of, row_of, rng, x32, y32,
                   f_out, p_out, C, W, WT, span, max_dist_x, max_dist_y,
                   bw, cg, cs)
    return f_out, p_out


def _pack_lanes(lens: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """First-fit-decreasing bin packing of segments into LANES lanes.

    Returns (lane_of_seg, off_of_seg, height): multiple segments stack in
    one lane back-to-back; heights stay balanced by always extending the
    currently-shortest lane (LPT).
    """
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


def _run_class(sel, seg_lens, bounds, seg_of, row_of, rng, x32, y32,
               f_out, p_out, C, W, WT, span, max_dist_x, max_dist_y, bw,
               cg, cs):
    """Densely pack the selected segments into 128 lanes, run one kernel."""
    lens = seg_lens[sel]
    lane_sel, off_sel, height = _pack_lanes(lens)
    n_chunks = _pow2_at_least(_round_up(max(height, 1), C) // C, 1)
    # +WT: DMA tiles are WT-row quantized, so coverage of the last chunk
    # can overhang C+W by up to WT-C rows when C < WT
    H = n_chunks * C + W + WT

    lane_of_seg = np.full(seg_lens.shape[0], -1, dtype=np.int64)
    off_of_seg = np.zeros(seg_lens.shape[0], dtype=np.int64)
    lane_of_seg[sel] = lane_sel
    off_of_seg[sel] = off_sel

    in_class = lane_of_seg[seg_of] >= 0
    src = np.nonzero(in_class)[0]
    rows = row_of[src] + off_of_seg[seg_of[src]]
    cols = lane_of_seg[seg_of[src]]

    shape = (H, LANES)
    X = np.zeros(shape, np.int32)
    Y = np.zeros(shape, np.int32)
    R = np.zeros(shape, np.int32)
    X[rows, cols] = x32[src]
    Y[rows, cols] = y32[src]
    R[rows, cols] = rng[src]

    Rb = R[:n_chunks * C].reshape(n_chunks, C * LANES)
    chunk_rng = np.ascontiguousarray(Rb.max(axis=1)).astype(np.int32)
    real_chunks = _round_up(max(height, 1), C) // C
    nchunks = np.array([real_chunks], np.int32)
    chunk_rng[real_chunks:] = 0

    f, p = chain_packed_tpu(nchunks, chunk_rng, X, Y, R, C=C, W=W, WT=WT,
                            span=span, max_dist_x=max_dist_x,
                            max_dist_y=max_dist_y, bw=bw, cg=cg, cs=cs)
    # explicit sync before host readback: np.asarray on a pending array
    # takes a pathological slow path on tunneled TPU platforms
    jax.block_until_ready((f, p))
    f = np.asarray(f)
    p = np.asarray(p)
    f_out[src] = f[rows, cols]
    prel = p[rows, cols].astype(np.int64)
    p_out[src] = np.where(prel > 0, src - prel, -1)
