"""RMQ-based chaining (assembly / long-join mode).

Host oracle for the reference's RMQ-tree chaining (mg_lchain_rmq,
lchain.c:250-369): each anchor queries, over a sliding window of active
predecessors, the one maximizing f[j] - 0.5*gap_pen*((int32)x_j + (int32)y_j)
(a linear lower-bound relaxation of the chain score), then refines within
max_dist_inner by explicit iteration.

The reference stores candidates in an augmented balanced tree (krmq.h);
here the active set is kept as a sorted list — same elements, same query
semantics (closed-interval comparisons on (y, i) keys), simpler host code.
On ties of the RMQ priority the tree's answer depends on its internal
topology; we pick the smallest (y, i) element, which matches on all test
corpora (validated against golden PAFs).
"""

from __future__ import annotations

import bisect

import numpy as np

from mm2_gb_tpu.ops.chain import (INT32_MAX, INT32_MIN, chain_backtrack,
                                  compact_chains)
from mm2_gb_tpu.utils.hashkit import mg_log2


def _sc_simple(axi: int, ayi: int, axj: int, ayj: int,
               cg: np.float32, cs: np.float32) -> tuple[int, bool, int]:
    """comput_sc_simple (lchain.c:230-248): (score, exact, width)."""
    dq = (ayi & 0xFFFFFFFF) - (ayj & 0xFFFFFFFF)
    dq = (dq + 2**31) % 2**32 - 2**31  # int32 semantics
    dr = ((axi - axj) & 0xFFFFFFFF)
    dr = (dr + 2**31) % 2**32 - 2**31
    dd = dr - dq if dr > dq else dq - dr
    dg = dr if dr < dq else dq
    q_span = (ayj >> 32) & 0xFF
    sc = q_span if q_span < dg else dg
    exact = (dd == 0 and dg <= q_span)
    if dd or dq > q_span:
        lin = np.float32(cg * np.float32(dd) + cs * np.float32(dg))
        log = mg_log2(np.float32(dd + 1)) if dd >= 1 else np.float32(0.0)
        sc -= int(np.float32(lin + np.float32(0.5) * log))
    return int(sc), exact, int(dd)


class _ActiveSet:
    """Sorted active-candidate set keyed by ((int32)y, i)."""

    def __init__(self) -> None:
        self.keys: list[tuple[int, int]] = []   # (y, i) sorted
        self.pri: dict[int, float] = {}          # i -> priority

    def insert(self, y: int, i: int, pri: float) -> None:
        bisect.insort(self.keys, (y, i))
        self.pri[i] = pri

    def remove(self, y: int, i: int) -> None:
        if i in self.pri:
            del self.pri[i]
            k = bisect.bisect_left(self.keys, (y, i))
            if k < len(self.keys) and self.keys[k] == (y, i):
                del self.keys[k]

    def __len__(self) -> int:
        return len(self.keys)

    def rmq(self, lo_y: int, hi_y: int) -> int | None:
        """Min-priority element with y in (lo_y, hi_y], i.e. the closed
        krmq interval [(lo_y, INT32_MAX), (hi_y, 0)] (lchain.c:318-320)."""
        best_i = None
        best = None
        lo_k = bisect.bisect_right(self.keys, (lo_y, INT32_MAX))
        hi_k = bisect.bisect_right(self.keys, (hi_y, 0))
        for y, i in self.keys[lo_k:hi_k]:
            pr = self.pri[i]
            if best is None or pr < best:
                best, best_i = pr, i
        return best_i

    def iter_desc_from(self, y_max: int):
        """Elements with (y, i) <= (y_max, +inf), descending (lchain.c:330-336)."""
        k = bisect.bisect_right(self.keys, (y_max, INT32_MAX))
        for idx in range(k - 1, -1, -1):
            yield self.keys[idx]


def chain_rmq(ax: np.ndarray, ay: np.ndarray, max_dist: int,
              max_dist_inner: int, bw: int, max_chn_skip: int,
              cap_rmq_size: int, min_cnt: int, min_sc: int,
              chn_pen_gap: float, chn_pen_skip: float
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """mg_lchain_rmq (lchain.c:250-369). Returns (u, ax_out, ay_out)."""
    n = ax.shape[0]
    if n == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.uint64),
                np.empty(0, np.uint64))
    if max_dist < bw:
        max_dist = bw
    if max_dist_inner <= 0 or max_dist_inner >= max_dist:
        max_dist_inner = 0
    max_drop = bw
    cg = np.float32(chn_pen_gap)
    cs = np.float32(chn_pen_skip)

    from mm2_gb_tpu.utils import native
    import os
    if native.available() and not os.environ.get("MM2TPU_NO_NATIVE"):
        f, p = native.chain_rmq_scores(ax, ay, max_dist, max_dist_inner, bw,
                                       max_chn_skip, cap_rmq_size, float(cg),
                                       float(cs))
        u, v = chain_backtrack(f, p, min_cnt, min_sc, max_drop)
        if u.shape[0] == 0:
            return (np.empty(0, np.uint64), np.empty(0, np.uint64),
                    np.empty(0, np.uint64))
        return compact_chains(u, v, ax, ay)

    half_gap = 0.5 * float(cg)  # double, as in lchain.c:297

    axl = [int(v) for v in ax]
    ayl = [int(v) for v in ay]

    def i32(v: int) -> int:
        v &= 0xFFFFFFFF
        return v - 2**32 if v >= 2**31 else v

    f = np.zeros(n, dtype=np.int32)
    p = np.full(n, -1, dtype=np.int64)
    t = np.zeros(n, dtype=np.int64)
    outer = _ActiveSet()
    inner = _ActiveSet() if max_dist_inner > 0 else None

    i0 = 0
    st = 0
    st_inner = 0
    for i in range(n):
        q_span = (ayl[i] >> 32) & 0xFF
        max_f = q_span
        max_j = -1
        # activate finished anchors (strictly smaller x)
        if i0 < i and axl[i0] != axl[i]:
            for j in range(i0, i):
                yj = i32(ayl[j])
                pri = -(int(f[j]) + half_gap * (i32(axl[j]) + yj))
                outer.insert(yj, j, pri)
                if inner is not None:
                    inner.insert(yj, j, pri)
            i0 = i
        # retire out-of-window candidates
        while st < i and (axl[i] >> 32 != axl[st] >> 32
                          or axl[i] > axl[st] + max_dist
                          or len(outer) > cap_rmq_size):
            outer.remove(i32(ayl[st]), st)
            st += 1
        if inner is not None:
            while st_inner < i and (axl[i] >> 32 != axl[st_inner] >> 32
                                    or axl[i] > axl[st_inner] + max_dist_inner
                                    or len(inner) > cap_rmq_size):
                inner.remove(i32(ayl[st_inner]), st_inner)
                st_inner += 1
        # RMQ candidate
        yi = i32(ayl[i])
        cand = outer.rmq(yi - max_dist, yi)
        if cand is not None:
            j = cand
            sc, exact, width = _sc_simple(axl[i], ayl[i], axl[j], ayl[j], cg, cs)
            sc += int(f[j])
            if width <= bw and sc > max_f:
                max_f, max_j = sc, j
            if not exact and inner is not None and len(inner) and yi > 0:
                n_skip = 0
                for (yj, j) in inner.iter_desc_from(yi - 1):
                    if yj < yi - max_dist_inner:
                        break
                    sc, _, width = _sc_simple(axl[i], ayl[i], axl[j], ayl[j],
                                              cg, cs)
                    sc += int(f[j])
                    if width <= bw:
                        if sc > max_f:
                            max_f, max_j = sc, j
                            if n_skip > 0:
                                n_skip -= 1
                        elif t[j] == i:
                            n_skip += 1
                            if n_skip > max_chn_skip:
                                break
                        if p[j] >= 0:
                            t[p[j]] = i
        f[i] = max_f
        p[i] = max_j
    u, v = chain_backtrack(f, p, min_cnt, min_sc, max_drop)
    if u.shape[0] == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.uint64),
                np.empty(0, np.uint64))
    return compact_chains(u, v, ax, ay)
