"""Streaming 3-stage mapping pipeline with worker threads.

The kt_pipeline / kt_for analog (kthread.c:59-169; map.c:1270-1390):
a reader thread fills fragment mini-batches, a thread pool maps
fragments concurrently (NumPy/C kernels release the GIL), and results
are written strictly in input order.  Output is byte-identical for any
thread count — ordering is by fragment index, never completion order.

Per-stage wall timers mirror the reference's mm_tbuf timers
(map.c:13-17, minimap.h:207-224) and are reported through Metrics.
"""

from __future__ import annotations

import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from queue import Queue

from mm2_gb_tpu.models.index import MinimizerIndex
from mm2_gb_tpu.models.mapper import map_frag
from mm2_gb_tpu.utils import opts as O
from mm2_gb_tpu.utils.fastx import SeqRecord, read_fastx


@dataclass
class Metrics:
    """Phase timers + counters (§5.1 analog of [M::...] log lines)."""
    t_read: float = 0.0
    t_map: float = 0.0
    t_write: float = 0.0
    n_seqs: int = 0
    n_bases: int = 0
    n_frags: int = 0
    wall0: float = field(default_factory=time.perf_counter)

    def report(self, verbose: int = 3) -> None:
        if verbose < 3:
            return
        wall = time.perf_counter() - self.wall0
        sys.stderr.write(
            f"[M::pipeline] mapped {self.n_seqs} sequences "
            f"({self.n_bases} bp) in {wall:.3f}s; read {self.t_read:.3f}s, "
            f"map {self.t_map:.3f}s, write {self.t_write:.3f}s\n")


def _qname_same(a: str, b: str) -> bool:
    from mm2_gb_tpu.utils.sam import _qname_len
    la, lb = _qname_len(a), _qname_len(b)
    return la == lb and a[:la] == b[:lb]


def read_frag_batches(paths: list[str], mo, mini_batch: int,
                      metrics: Metrics):
    """Yield lists of fragments (each a list of SeqRecords) totalling
    >= mini_batch bases (mm_bseq_read3/frag2 + grouping, map.c:1274-1306)."""
    t0 = time.perf_counter()
    frag_mode = len(paths) > 1 or bool(mo.flag & O.MM_F_FRAG_MODE)
    batch: list[list[SeqRecord]] = []
    total = 0

    def flush():
        nonlocal batch, total
        if batch:
            yield batch
            batch, total = [], 0

    if len(paths) > 1:
        iters = [read_fastx(p) for p in paths]
        while True:
            frag = []
            for it in iters:
                rec = next(it, None)
                if rec is not None:
                    frag.append(rec)
            if len(frag) < len(iters):
                if frag:
                    sys.stderr.write("[W] query files have different number "
                                     "of records; extra records skipped.\n")
                break
            batch.append(frag)
            total += sum(r.length for r in frag)
            if total >= mini_batch:
                yield from flush()
    else:
        pending: list[SeqRecord] | None = None
        for rec in read_fastx(paths[0]):
            if pending is not None and frag_mode and \
                    _qname_same(pending[-1].name, rec.name):
                pending.append(rec)
            else:
                if pending is not None:
                    batch.append(pending)
                    total += sum(r.length for r in pending)
                    if total >= mini_batch:
                        yield from flush()
                pending = [rec]
        if pending is not None:
            batch.append(pending)
    yield from flush()
    metrics.t_read += time.perf_counter() - t0


def _map_one(index: MinimizerIndex, mo, frag: list[SeqRecord]):
    """Map one fragment with pe_ori revcomp/flip (worker_for, map.c:1157-1203)."""
    from mm2_gb_tpu.cli import rc_record
    if mo.dbg_print_qname:  # QR dump (map.c:1165-1167); dumps force -t 1
        import sys
        sys.stderr.write(f"QR\t{frag[0].name}\t0\t{frag[0].length}\n")
    n_seg = len(frag)
    pe_flip = [n_seg == 2 and ((j == 0 and (mo.pe_ori >> 1 & 1))
                               or (j == 1 and (mo.pe_ori & 1)))
               for j in range(n_seg)]
    recs = [rc_record(r) if pe_flip[j] else r for j, r in enumerate(frag)]
    if (mo.flag & O.MM_F_INDEPEND_SEG) and n_seg > 1:
        seg_res = [map_frag(index, mo, [r.seq], r.name) for r in recs]
        seg_regs = [sr.seg_regs[0] for sr in seg_res]
        rep_lens = [sr.rep_len for sr in seg_res]
    else:
        res = map_frag(index, mo, [r.seq for r in recs], recs[0].name)
        seg_regs = res.seg_regs if res.seg_regs is not None else \
            [res.regs] + [[] for _ in range(n_seg - 1)]
        rep_lens = [res.rep_len] * n_seg
    for j in range(n_seg):
        if pe_flip[j]:
            ql = recs[j].length
            for r in seg_regs[j]:
                r.qs, r.qe = ql - r.qe, ql - r.qs
                r.rev = not r.rev
    return seg_regs, rep_lens


def map_file_stream(index: MinimizerIndex, mo, paths: list[str], out,
                    n_threads: int = 3, rg_id: str | None = None,
                    metrics: Metrics | None = None) -> Metrics:
    """Read → map (thread pool) → ordered write."""
    from mm2_gb_tpu.cli import res_regs_out
    metrics = metrics or Metrics()
    is_sam = bool(mo.flag & O.MM_F_OUT_SAM)

    def write_frag(frag, seg_regs, rep_lens):
        t0 = time.perf_counter()
        for j, rec in enumerate(frag):
            res_regs_out(out, index, mo, rec, seg_regs[j], rep_lens[j],
                         is_sam, rg_id, j, len(frag), seg_regs)
            metrics.n_seqs += 1
            metrics.n_bases += rec.length
        metrics.n_frags += 1
        metrics.t_write += time.perf_counter() - t0

    if n_threads <= 1:
        for batch in read_frag_batches(paths, mo, mo.mini_batch_size,
                                       metrics):
            t0 = time.perf_counter()
            results = [_map_one(index, mo, frag) for frag in batch]
            metrics.t_map += time.perf_counter() - t0
            for frag, (seg_regs, rep_lens) in zip(batch, results):
                write_frag(frag, seg_regs, rep_lens)
        return metrics

    # two-stage overlap: map batch N in the pool while writing batch N-1
    pool = ThreadPoolExecutor(max_workers=n_threads)
    try:
        prev = None  # (batch, futures)
        for batch in read_frag_batches(paths, mo, mo.mini_batch_size,
                                       metrics):
            t0 = time.perf_counter()
            futs = [pool.submit(_map_one, index, mo, frag) for frag in batch]
            if prev is not None:
                pbatch, pfuts = prev
                for frag, fu in zip(pbatch, pfuts):
                    seg_regs, rep_lens = fu.result()
                    write_frag(frag, seg_regs, rep_lens)
            metrics.t_map += time.perf_counter() - t0
            prev = (batch, futs)
        if prev is not None:
            t0 = time.perf_counter()
            pbatch, pfuts = prev
            for frag, fu in zip(pbatch, pfuts):
                seg_regs, rep_lens = fu.result()
                write_frag(frag, seg_regs, rep_lens)
            metrics.t_map += time.perf_counter() - t0
    finally:
        pool.shutdown(wait=True)
    return metrics
