"""Batched mapping pipeline with on-device chaining.

The TPU analog of the reference's split pipeline (map.c worker_for under
__AMD_SPLIT_KERNELS__, SURVEY.md §3.2): reads are seeded on the host,
their anchors accumulated into a macro-batch, chain-scored on the TPU in
one shot, then backtracked/post-processed on the host and written in
input order.

Differences from the reference's design, by intent:
- no triple-buffer rotation: JAX's async dispatch overlaps host seeding of
  batch N+1 with device scoring of batch N;
- segments are cut at every zero-range anchor and packed into fixed-shape
  buckets (recompile-free), instead of CUDA's dynamic grids;
- capacity fallback: segments longer than the device cap chain on the
  host (the reference falls back to CPU the same way, map.c:1030-1035).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np

from mm2_gb_tpu.models import hit as hitmod
from mm2_gb_tpu.models.index import MinimizerIndex
from mm2_gb_tpu.models.mapper import (_chain_gaps, _dbg_chain_dump,
                                       _dbg_seed_dump, post_process)
from mm2_gb_tpu.ops import chain as chain_ops
from mm2_gb_tpu.ops import chain_rmq as rmq_ops
from mm2_gb_tpu.ops import chain_tpu, seed as seed_ops
from mm2_gb_tpu.ops.sketch import sketch
from mm2_gb_tpu.utils import ksort, native
from mm2_gb_tpu.utils.fastx import SeqRecord, read_batches
from mm2_gb_tpu.utils.hashkit import read_order_hash
from mm2_gb_tpu.utils.opts import (MapOptions, MM_F_CIGAR, MM_F_HEAP_SORT,
                                   MM_F_NO_HASH_NAME,
                                   MM_F_NO_LJOIN, MM_F_NO_PRINT_2ND,
                                   MM_F_PAF_NO_HIT, MM_F_QSTRAND, MM_F_RMQ,
                                   MM_F_SPLICE, MM_F_SR, MM_F_TPU_ALIGN,
                                   MM_I_HPC)
from mm2_gb_tpu.utils.paf import write_paf

INT32_MAX = 2**31 - 1


@dataclass
class SeededRead:
    rec: SeqRecord
    ax: np.ndarray
    ay: np.ndarray
    rep_len: int
    mini_pos: np.ndarray
    mv: np.ndarray | None = None  # retained for the max_occ re-chain


def seed_read(index: MinimizerIndex, opt: MapOptions, rec: SeqRecord
              ) -> SeededRead:
    """Host seeding stage (mm_map_seed analog, map.c:355-391)."""
    mm = sketch(rec.seq, index.w, index.k, 0, bool(index.flag & MM_I_HPC))
    if opt.q_occ_frac > 0.0:
        mm = seed_ops.seed_mz_flt(mm, opt.mid_occ, opt.q_occ_frac)
    collect = (seed_ops.collect_seed_hits_heap
               if opt.flag & MM_F_HEAP_SORT else
               seed_ops.collect_seed_hits)
    ax, ay, rep_len, mini_pos = collect(
        index, opt, opt.mid_occ, mm, rec.length, rec.name)
    return SeededRead(rec, ax, ay, rep_len, mini_pos, mm)


def finish_read(index: MinimizerIndex, opt: MapOptions, sr: SeededRead,
                f: np.ndarray, p: np.ndarray) -> list[hitmod.Region]:
    """Backtrack device scores and run the standard post-chain path."""
    qlen = sr.rec.length
    max_drop = opt.bw if opt.bw < INT32_MAX else INT32_MAX
    u, v = chain_ops.chain_backtrack(f, p, opt.min_cnt, opt.min_chain_score,
                                     max_drop)
    if u.shape[0] == 0:
        u = np.empty(0, np.uint64)
        cx = cy = np.empty(0, np.uint64)
    else:
        u, cx, cy = chain_ops.compact_chains(u, v, sr.ax, sr.ay)

    chn_pen_gap = np.float32(float(np.float32(opt.chain_gap_scale)) * 0.01 * index.k)
    chn_pen_skip = np.float32(float(np.float32(opt.chain_skip_scale)) * 0.01 * index.k)
    # long-join rescue on the host (post_chaining_helper analog,
    # map.c:428-484 — the reference also re-chains on the CPU after GPU).
    # The OUTER condition makes the max_occ re-chain an else-if
    # (map.c:698-709): when it holds, that branch is skipped even if the
    # rescue emptied the chain set.
    ljoin = (opt.bw_long > opt.bw
             and (opt.flag & (MM_F_SPLICE | MM_F_SR | MM_F_NO_LJOIN)) == 0
             and u.shape[0] > 1)
    if ljoin:
        cnt0 = int(u[0] & np.uint64(0xFFFFFFFF))
        st = int(cy[0] & np.uint64(0xFFFFFFFF))
        en = int(cy[cnt0 - 1] & np.uint64(0xFFFFFFFF))
        if (qlen - (en - st) > opt.rmq_rescue_size
                or en - st > qlen * opt.rmq_rescue_ratio):
            perm = (native.radix_perm64(cx) if native.available()
                    else ksort.radix_perm64(cx))
            cx, cy = cx[perm], cy[perm]
            u, cx, cy = rmq_ops.chain_rmq(
                cx, cy, opt.max_gap, opt.rmq_inner_dist, opt.bw_long,
                opt.max_chain_skip, opt.rmq_size_cap, opt.min_cnt,
                opt.min_chain_score, chn_pen_gap, chn_pen_skip)

    # max_occ re-chain (map.c:708-731): for a single-segment read the
    # best-chain segment-count test degenerates, so this fires only when
    # no chain survived at mid_occ.  We replicate the CPU reference (the
    # byte-match target): re-collect from the retained minimizer vector
    # with opt.max_occ and re-chain on the host.  (The reference GPU
    # path's own version, post_chaining_helper map.c:459-483, re-seeds
    # from an empty mv freed by mm_map_seed — a latent reference bug we
    # do not reproduce.)
    if (not ljoin and opt.max_occ > opt.mid_occ and sr.rep_len > 0
            and not (opt.flag & MM_F_RMQ)
            and u.shape[0] == 0 and sr.mv is not None):
        collect = (seed_ops.collect_seed_hits_heap
                   if opt.flag & MM_F_HEAP_SORT else
                   seed_ops.collect_seed_hits)
        ax2, ay2, rep_len2, mini_pos2 = collect(
            index, opt, opt.max_occ, sr.mv, qlen, sr.rec.name)
        max_gap_qry, max_gap_ref = _chain_gaps(opt, qlen)
        u, cx, cy = chain_ops.chain_dp(
            ax2, ay2, max_gap_ref, max_gap_qry, opt.bw, opt.max_chain_skip,
            opt.max_chain_iter, opt.min_cnt, opt.min_chain_score,
            chn_pen_gap, chn_pen_skip, bool(opt.flag & MM_F_SPLICE), 1)
        sr.rep_len, sr.mini_pos = rep_len2, mini_pos2

    hash_ = read_order_hash(sr.rec.name, qlen, opt.seed,
                            bool(opt.flag & MM_F_NO_HASH_NAME))
    regs = hitmod.gen_regs(hash_, qlen, u, cx, cy,
                           bool(opt.flag & MM_F_QSTRAND))
    if index.n_alt:
        hitmod.mark_alt(index, regs)
        regs = hitmod.hit_sort(regs, opt.alt_drop)
    if opt.dbg_print_seed or opt.dbg_print_chain:
        from mm2_gb_tpu.ops import align as align_ops
        if align_ops._fill_collect is None:   # not the collect pass
            if opt.dbg_print_seed:
                _dbg_seed_dump(index, sr.ax, sr.ay, sr.rep_len)
            _dbg_chain_dump(index, regs, cx, cy)
    return post_process(index, opt, qlen, 1, [qlen], regs, cx, cy,
                        sr.mini_pos, sr.rep_len, [sr.rec.seq])


@dataclass
class TpuMetrics:
    """planalyze analog (gpu/planalyze.cu:59-86, plchain.cu:258-281):
    per-stage wall time, device wait, relaxation-pair counts and packing
    efficiency for the device chaining path, printed at -v >= 3."""
    t_seed: float = 0.0      # host sketch+seed (mm_map_seed analog)
    t_range: float = 0.0     # range selection + cutting (plrange analog)
    t_pack: float = 0.0      # lane packing + layout builds
    t_dispatch: float = 0.0  # kernel launch (async) overhead
    t_wait: float = 0.0      # blocked on device results (device_get)
    t_finish: float = 0.0    # backtrack + post + alignment (host)
    n_reads: int = 0
    n_anchors: int = 0
    n_segs: int = 0
    n_pairs: int = 0         # sum of ranges == anchor-pair relaxations
    n_dispatch: int = 0      # kernel launches
    n_batches: int = 0
    n_spills: int = 0        # batches cut by anchor/read caps
    n_scanned: int = 0       # input records seen (incl. other ranks' in
    #                          a sharded run) — multi-host completeness
    cells_used: int = 0      # anchors placed in packed layouts
    cells_alloc: int = 0     # packed layout capacity (excl. window pad)
    # flowcell-scale device-fill accounting (--tpu-align): delta of
    # ksw2_tpu.FILL_STATS across the prefill passes
    fill_stats: dict = None
    # per-window-class readback stats: W -> [wait_s, pairs, n_collects]
    # (the per-kernel runtime/Mpairs table analog, plchain.cu:258-281)
    cls_stats: dict = None
    # per-window-class VPU work: W -> [walked_slots, useful_pairs].
    # walked_slots counts every (dst, src) relaxation slot the kernel's
    # window trips evaluate (masked or not) — useful/walked is the slot
    # efficiency the roofline model needs (benchmarks/ROOFLINE.md); the
    # size-class-tuning analog of plchain.h:20-22's cutoffs
    cls_work: dict = None

    def __post_init__(self):
        import time
        self.wall0 = time.perf_counter()
        self.cls_stats = {}
        self.cls_work = {}
        self.fill_stats = {}

    def report(self, verbose: int = 3) -> None:
        if verbose < 3:
            return
        import sys
        import time
        wall = time.perf_counter() - self.wall0
        host = self.t_seed + self.t_range + self.t_pack + self.t_finish
        eff = (100.0 * self.cells_used / self.cells_alloc
               if self.cells_alloc else 0.0)
        w = sys.stderr.write
        w(f"[M::tpu] {self.n_reads} reads, {self.n_anchors} anchors, "
          f"{self.n_segs} segments in {self.n_batches} batches "
          f"({self.n_spills} cap-split), {self.n_dispatch} kernel "
          f"launches, packing efficiency {eff:.1f}%\n")
        w(f"[M::tpu] pairs: {self.n_pairs} "
          f"({self.n_pairs / wall / 1e6:.1f} Mpairs/s wall)\n")
        w(f"[M::tpu] time: seed {self.t_seed:.3f}s, range {self.t_range:.3f}s, "
          f"pack {self.t_pack:.3f}s, dispatch {self.t_dispatch:.3f}s, "
          f"device-wait {self.t_wait:.3f}s, finish {self.t_finish:.3f}s; "
          f"host {host:.3f}s / wall {wall:.3f}s\n")
        for W in sorted(self.cls_stats):
            wait, pairs, nc = self.cls_stats[W]
            rate = pairs / wait / 1e6 if wait > 0 else 0.0
            slots, useful = self.cls_work.get(W, (0, 0))
            se = 100.0 * useful / slots if slots else 0.0
            w(f"[M::tpu]   class W={W}: {nc} collects, "
              f"{pairs} pairs, wait {wait:.3f}s ({rate:.1f} Mpairs/s "
              f"incl. queue+link), slots {slots} "
              f"(slot efficiency {se:.1f}%)\n")
        fs = self.fill_stats
        if fs and fs.get("chunks"):
            rate = (fs["useful_cells"] / fs["wait_s"] / 1e9
                    if fs["wait_s"] > 0 else 0.0)
            wrate = (fs["walked_cells"] / fs["wait_s"] / 1e9
                     if fs["wait_s"] > 0 else 0.0)
            w(f"[M::tpu] fills: {fs['calls']} device calls "
              f"({fs['host_calls']} host-fallback), {fs['chunks']} chunks, "
              f"plan {fs.get('plan_s', 0.0):.3f}s, "
              f"enqueue {fs.get('enqueue_s', 0.0):.3f}s, "
              f"device-wait {fs['wait_s']:.3f}s, "
              f"fill_gcells_s {rate:.3f} useful "
              f"({wrate:.3f} walked, {fs['useful_cells']} / "
              f"{fs['walked_cells']} cells)\n")


def _acc_batches(index: MinimizerIndex, opt: MapOptions, paths: list[str],
                 metrics: TpuMetrics, shard: tuple[int, int] | None = None,
                 pool=None):
    """Seed reads and yield accumulation batches bounded by the device
    capacity caps (mm_trbuf accumulate + overflow spill, map.c:886-922,
    943-995).  Caps come from TpuConfig (max_total_n/max_read analogs,
    plmem.cu:473-540); mini-batch boundaries flush like the reference's
    end-of-stream kt_for hook (kthread.c:52-55).

    `shard=(rank, nproc)` keeps only reads whose global index is owned
    by this process (round-robin) — the multi-host data-parallel split
    (SURVEY.md §5.8); each SeededRead carries its global index in
    rec.rid for the deterministic cross-host merge.

    `pool` fans seeding out in 64-read chunks with ordered results (the
    kt_for analog for the seed stage; the native sketch/lookup kernels
    release the GIL) — bounded chunks keep peak anchor memory at
    cap-scale rather than mini-batch-scale."""
    import sys
    import time

    from mm2_gb_tpu.utils.tpucfg import current_config
    cfg = current_config()
    acc: list[SeededRead] = []
    n_anch = 0
    gidx = -1
    for batch in read_batches(paths, opt.mini_batch_size):
        mine = []
        for rec in batch:
            gidx += 1
            rec.rid = gidx
            metrics.n_scanned += 1
            if shard is not None and gidx % shard[1] != shard[0]:
                continue
            if opt.dbg_print_qname:  # QR dump (map.c:938-941)
                sys.stderr.write(f"QR\t{rec.name}\t0\t{rec.length}\n")
            mine.append(rec)
        for c0 in range(0, len(mine), 64):
            chunk = mine[c0:c0 + 64]
            t0 = time.perf_counter()
            if pool is not None and len(chunk) > 1:
                seeded = list(pool.map(
                    lambda r: seed_read(index, opt, r), chunk))
            else:
                seeded = [seed_read(index, opt, r) for r in chunk]
            metrics.t_seed += time.perf_counter() - t0
            for sr in seeded:
                metrics.n_reads += 1
                metrics.n_anchors += int(sr.ax.shape[0])
                if acc and (n_anch + sr.ax.shape[0] > cfg.max_anchors_batch
                            or len(acc) >= cfg.max_reads_batch):
                    metrics.n_spills += 1
                    yield acc
                    acc, n_anch = [], 0
                acc.append(sr)
                n_anch += int(sr.ax.shape[0])
        if acc:
            yield acc
            acc, n_anch = [], 0


def _dispatch_batch(index: MinimizerIndex, opt: MapOptions,
                    acc: list[SeededRead], metrics: TpuMetrics):
    """Concatenate a batch's anchors and launch device scoring (async)."""
    metrics.n_batches += 1
    bounds = np.zeros(len(acc) + 1, dtype=np.int64)
    for i, sr in enumerate(acc):
        bounds[i + 1] = bounds[i] + sr.ax.shape[0]
    if bounds[-1] == 0:
        return acc, bounds, chain_tpu.PendingScores(0)
    ax = np.concatenate([sr.ax for sr in acc])
    ay = np.concatenate([sr.ay for sr in acc])
    max_gap_qry, max_gap_ref = _chain_gaps(opt, 0)  # qlen-independent here
    chn_pen_gap = np.float32(float(np.float32(opt.chain_gap_scale)) * 0.01 * index.k)
    chn_pen_skip = np.float32(float(np.float32(opt.chain_skip_scale)) * 0.01 * index.k)
    pend = chain_tpu.dispatch_scores(
        ax, ay, bounds, max_gap_ref, max_gap_qry, opt.bw,
        opt.max_chain_iter, float(chn_pen_gap), float(chn_pen_skip),
        metrics, is_cdna=bool(opt.flag & MM_F_SPLICE))
    return acc, bounds, pend


def finish_slices(index: MinimizerIndex, opt: MapOptions, slices,
                  pool=None) -> list[tuple[SeededRead, list]]:
    """Run finish_read over a batch's (sr, f, p) slices with ordered
    results — on `pool` when given (the kt_for analog, kthread.c:59-82:
    per-read work fans out, output order is the input order).  Debug
    dump modes stay sequential so their stderr interleaving matches the
    reference's -t 1 requirement (main.c:209,213)."""
    from mm2_gb_tpu.ops import align as align_ops
    try:
        if (pool is not None and len(slices) > 1
                and not (opt.dbg_print_seed or opt.dbg_print_chain
                         or opt.dbg_print_qname)):
            futs = [pool.submit(finish_read, index, opt, sr, fp, pp)
                    for sr, fp, pp in slices]
            return [(sl[0], fu.result()) for sl, fu in zip(slices, futs)]
        return [(sr, finish_read(index, opt, sr, fp, pp))
                for sr, fp, pp in slices]
    finally:
        align_ops.set_fill_cache(None)
        from mm2_gb_tpu.utils import native
        if native.available():
            native.fill_mode(0)   # drop any native fill table/session


def _finish_batch(index: MinimizerIndex, opt: MapOptions, batch,
                  metrics: TpuMetrics, pool=None
                  ) -> list[tuple[SeededRead, list]]:
    """Collect device scores, backtrack and post-process one batch."""
    import time

    acc, bounds, pend = batch
    t0 = time.perf_counter()
    f, p = pend.collect()
    metrics.t_wait += time.perf_counter() - t0
    t0 = time.perf_counter()
    slices = []
    for i, sr in enumerate(acc):
        s, e = int(bounds[i]), int(bounds[i + 1])
        fp = f[s:e]
        pp = np.where(p[s:e] >= 0, p[s:e] - s, -1)
        slices.append((sr, fp, pp))
    if _use_device_align(opt):
        from mm2_gb_tpu.ops import ksw2_tpu
        before = ksw2_tpu.fill_stats_snapshot()
        if not _prefill_native(index, opt, slices):
            _prefill_device(index, opt, slices)
        for k, v in ksw2_tpu.fill_stats_snapshot().items():
            metrics.fill_stats[k] = metrics.fill_stats.get(k, 0) \
                + v - before[k]
    out = finish_slices(index, opt, slices, pool)
    metrics.t_finish += time.perf_counter() - t0
    return out


def map_batch_tpu(index: MinimizerIndex, opt: MapOptions,
                  records: list[SeqRecord]) -> list[tuple[SeededRead, list]]:
    """Seed + device-chain + finish one batch of reads (synchronous)."""
    metrics = TpuMetrics()
    acc = [seed_read(index, opt, rec) for rec in records]
    return _finish_batch(index, opt,
                         _dispatch_batch(index, opt, acc, metrics), metrics)


def _use_device_align(opt: MapOptions) -> bool:
    if not (opt.flag & MM_F_TPU_ALIGN) or not (opt.flag & MM_F_CIGAR):
        return False
    if opt.flag & MM_F_SR:
        return False
    if opt.flag & MM_F_SPLICE:  # exts2 device fills (q2 is intron open)
        return opt.q2 > opt.q + opt.e
    return not (opt.q == opt.q2 and opt.e == opt.e2)


def _prefill_native(index: MinimizerIndex, opt: MapOptions,
                    slices: list) -> bool:
    """Native-session variant of _prefill_device for the plain genomic
    path: the C++ align1 driver itself records every APPROX_MAX gap fill
    (collect mode) and answers the real pass from a C-side result table
    (csrc/alignkit.cpp FillSession) — both passes run at C speed instead
    of dropping to the Python oracle, which costs ~70 s per pass on a
    flowcell.  Returns False when this path doesn't apply (splice,
    qstrand, sr, debug dumps, no native kit) — the Python session
    (_prefill_device) handles those."""
    import numpy as np

    from mm2_gb_tpu.ops import ksw2, ksw2_tpu
    from mm2_gb_tpu.utils import native
    if (not native.available() or (opt.flag & MM_F_SPLICE)
            or (opt.flag & MM_F_QSTRAND) or (opt.flag & MM_F_SR)
            or opt.dbg_print_aln_seq
            or (opt.q == opt.q2 and opt.e == opt.e2)):
        return False
    import time

    t0 = time.perf_counter()
    native.fill_mode(1)
    try:
        for sr, fp, pp in slices:
            finish_read(index, opt, sr, fp, pp)
        meta, qblob, tblob = native.fill_fetch()
    except Exception:
        native.fill_mode(0)
        raise
    t_collect = time.perf_counter() - t0
    n = meta.shape[0]
    if n == 0:
        native.fill_mode(2)
        return True
    t0 = time.perf_counter()
    qoff = np.zeros(n + 1, np.int64)
    toff = np.zeros(n + 1, np.int64)
    np.cumsum(meta[:, 0], out=qoff[1:])
    np.cumsum(meta[:, 1], out=toff[1:])
    calls = [ksw2_tpu.FillCall(qblob[qoff[i]:qoff[i + 1]],
                               tblob[toff[i]:toff[i + 1]],
                               int(meta[i, 2]), False, int(meta[i, 3]))
             for i in range(n)]
    mat = ksw2.gen_simple_mat(5, opt.a, opt.b, opt.sc_ambi)
    ezs = ksw2_tpu.extd2_batch_device(calls, mat, opt.q, opt.e, opt.q2,
                                      opt.e2, ksw2.KSW_EZ_APPROX_MAX)
    t_batch = time.perf_counter() - t0
    t0 = time.perf_counter()
    scores = np.fromiter((ez.score for ez in ezs), np.int32, n)
    lens = np.fromiter((len(ez.cigar) for ez in ezs), np.int64, n)
    cig_off = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=cig_off[1:])
    cig_blob = (np.concatenate([ez.cigar for ez in ezs])
                if cig_off[-1] else np.empty(0, np.uint32))
    # duplicate keys dedup C-side (first entry wins; results identical)
    native.fill_table_bulk(meta, qoff, qblob, toff, tblob,
                           scores, cig_off, cig_blob)
    native.fill_mode(2)
    import sys
    sys.stderr.write(
        f"[M::tpu] prefill: {n} fills, collect {t_collect:.3f}s, "
        f"device batch {t_batch:.3f}s, table "
        f"{time.perf_counter() - t0:.3f}s\n")
    return True


def _prefill_device(index: MinimizerIndex, opt: MapOptions,
                    slices: list) -> None:
    """Speculative gap-fill batching: a collect pass with fake DP records
    every extd2 gap subproblem of the batch (boundaries are pure functions
    of the anchors), one Pallas dispatch solves them, the real pass reads
    the cache (host fallback on any miss).  Analog of mm2-gb's
    score-on-device / control-flow-on-host split (plchain.cu:292-464)."""
    import os

    from mm2_gb_tpu.ops import align as align_ops
    from mm2_gb_tpu.ops import ksw2, ksw2_tpu

    # device extensions default-on (hardware-smoked); MM2TPU_DEVICE_EXT=0
    # opts out (e.g. for latency-bound single-read debugging)
    align_ops.collect_ext = \
        os.environ.get("MM2TPU_DEVICE_EXT", "1") != "0"
    align_ops.begin_fill_collect()
    try:
        for sr, fp, pp in slices:
            finish_read(index, opt, sr, fp, pp)
    finally:
        fills = align_ops.end_fill_collect()
    if not fills:
        return
    mat = ksw2.gen_simple_mat(5, opt.a, opt.b, opt.sc_ambi)
    cache: dict = {}
    groups: dict = {}
    for kind, qseq, tseq, w, flag, zdrop, end_bonus, junc in fills:
        key = align_ops._fill_key(qseq, tseq, w, flag, zdrop, end_bonus,
                                  junc)
        groups.setdefault((kind, flag, end_bonus), {}).setdefault(
            key, (qseq, tseq, w, zdrop, junc))
    for (kind, flag, end_bonus), uniq in groups.items():
        right = bool(flag & ksw2.KSW_EZ_RIGHT)
        calls = [ksw2_tpu.FillCall(q, t, w, right, zd)
                 for q, t, w, zd, _j in uniq.values()]
        if kind == "fill":
            ezs = ksw2_tpu.extd2_batch_device(
                calls, mat, opt.q, opt.e, opt.q2, opt.e2, flag)
        elif kind == "splice":
            juncs = [j for _q, _t, _w, _z, j in uniq.values()]
            ezs = ksw2_tpu.exts2_batch_device(
                calls, mat, opt.q, opt.e, opt.q2, opt.noncan,
                opt.junc_bonus, flag, juncs)
        else:
            ezs = ksw2_tpu.ext_batch_device(
                calls, mat, opt.q, opt.e, opt.q2, opt.e2, flag, end_bonus)
        cache.update(zip(uniq.keys(), ezs))
    align_ops.set_fill_cache(cache)


def map_file_tpu_records(index: MinimizerIndex, opt: MapOptions,
                         paths: list[str],
                         metrics: TpuMetrics | None = None,
                         shard: tuple[int, int] | None = None,
                         n_threads: int = 1):
    """Stream (SeededRead, regions) for query files, chaining on the TPU.

    Software-pipelined double buffering (the trbuf/stream analog,
    map.c:1017-1084 + plchain.cu:292-306): batch N is packed and
    dispatched to the device *before* batch N-1's host backtrack/align/
    output runs, so the device computes while the host drains — plus the
    host seeds batch N+1 while batch N is still in flight.  n_threads > 1
    additionally fans the per-read host finish out over a thread pool
    (kt_for analog; ordered emit)."""
    from concurrent.futures import ThreadPoolExecutor
    metrics = metrics or TpuMetrics()
    # a single dispatch worker serializes host->device transfers off the
    # main thread (jax releases the GIL during transfer), so seeding of
    # batch N+1 and finishing of batch N-1 overlap batch N's upload —
    # the pinned-buffer async-H2D analog (plmem.cu:200-236)
    ex = ThreadPoolExecutor(max_workers=1)
    pool = (ThreadPoolExecutor(max_workers=n_threads)
            if n_threads > 1 else None)
    try:
        pending = None
        for acc in _acc_batches(index, opt, paths, metrics, shard, pool):
            fut = ex.submit(_dispatch_batch, index, opt, acc, metrics)
            if pending is not None:
                yield from _finish_batch(index, opt, pending.result(),
                                         metrics, pool)
            pending = fut
        if pending is not None:
            yield from _finish_batch(index, opt, pending.result(), metrics,
                                     pool)
    finally:
        ex.shutdown(wait=True)
        if pool is not None:
            pool.shutdown(wait=True)


def map_file_tpu(index: MinimizerIndex, opt: MapOptions,
                 paths: list[str]) -> Iterator[str]:
    """Stream PAF lines for query files, chaining on the TPU."""
    for sr, regs in map_file_tpu_records(index, opt, paths):
        if regs:
            for r in regs:
                if (opt.flag & MM_F_NO_PRINT_2ND) and r.id != r.parent:
                    continue
                yield write_paf(r, sr.rec.name, sr.rec.length, index,
                                opt.flag, sr.rep_len, sr.rec.comment,
                                sr.rec.seq)
        elif opt.flag & MM_F_PAF_NO_HIT:
            yield write_paf(None, sr.rec.name, sr.rec.length, index,
                            opt.flag, sr.rep_len)
