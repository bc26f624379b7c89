"""Chaining oracle unit tests (score function + DP + backtrack)."""

import numpy as np
import pytest

from mm2_gb_tpu.ops import chain as C
from tests.conftest import golden_path


def _mk_anchors(pairs, span=15):
    """pairs: list of (rpos, qpos) on fwd strand of rid 0."""
    ax = np.array([rp for rp, _ in pairs], dtype=np.uint64)
    ay = np.array([(span << 32) | qp for _, qp in pairs], dtype=np.uint64)
    return ax, ay


def test_comput_sc_basic():
    # colinear anchors spaced exactly span apart → score = span, no penalty
    ax, ay = _mk_anchors([(100, 100), (115, 115)])
    sc = C.comput_sc_vec(ax[1], ay[1], ax[:1], ay[:1],
                         5000, 5000, 500, np.float32(0.12), np.float32(0.0),
                         False, 1)
    assert sc[0] == 15


def test_comput_sc_gap_penalty():
    # 10bp indel between anchors
    ax, ay = _mk_anchors([(100, 100), (145, 135)])
    sc = C.comput_sc_vec(ax[1], ay[1], ax[:1], ay[:1],
                         5000, 5000, 500, np.float32(0.12), np.float32(0.0),
                         False, 1)
    dd = 10
    lin = np.float32(np.float32(0.12) * np.float32(dd))
    from mm2_gb_tpu.utils.hashkit import mg_log2
    log = mg_log2(np.float32(dd + 1))
    expect = 15 - int(np.float32(lin + np.float32(0.5) * log))
    assert sc[0] == expect


def test_comput_sc_invalid():
    ax, ay = _mk_anchors([(100, 100), (100, 115)])  # dr == 0 same sid
    sc = C.comput_sc_vec(ax[1], ay[1], ax[:1], ay[:1],
                         5000, 5000, 500, np.float32(0.12), np.float32(0.0),
                         False, 1)
    assert sc[0] == C.INT32_MIN
    # bandwidth violation
    ax, ay = _mk_anchors([(100, 100), (1200, 140)])
    sc = C.comput_sc_vec(ax[1], ay[1], ax[:1], ay[:1],
                         5000, 5000, 500, np.float32(0.12), np.float32(0.0),
                         False, 1)
    assert sc[0] == C.INT32_MIN


def test_chain_dp_single_chain():
    # a clean diagonal chain of 10 anchors
    pairs = [(100 + 20 * i, 200 + 20 * i) for i in range(10)]
    ax, ay = _mk_anchors(pairs)
    u, cx, cy = C.chain_dp(ax, ay, 5000, 5000, 500, 2**31 - 1, 5000,
                           3, 40, 0.12, 0.0, False, 1)
    assert u.shape[0] == 1
    assert int(u[0] & np.uint64(0xFFFFFFFF)) == 10
    # anchors come out in ascending target order
    assert np.all(np.diff((cx & np.uint64(0xFFFFFFFF)).astype(np.int64)) > 0)


def test_chain_dp_two_strands_two_chains():
    fwd = [(100 + 20 * i, 200 + 20 * i) for i in range(8)]
    ax1, ay1 = _mk_anchors(fwd)
    ax2 = ax1 | np.uint64(1 << 63)          # same positions, reverse strand
    ax = np.concatenate([ax1, ax2])
    ay = np.concatenate([ay1, ay1])
    u, cx, cy = C.chain_dp(ax, ay, 5000, 5000, 500, 2**31 - 1, 5000,
                           3, 40, 0.12, 0.0, False, 1)
    assert u.shape[0] == 2
    counts = (u & np.uint64(0xFFFFFFFF)).astype(int)
    assert list(counts) == [8, 8]


def test_backtrack_max_drop():
    # two diagonal runs joined by a huge-penalty link: backtrack must split
    run1 = [(100 + 20 * i, 200 + 20 * i) for i in range(6)]
    run2 = [(4000 + 20 * i, 500 + 20 * i) for i in range(6)]
    ax, ay = _mk_anchors(run1 + run2)
    u, cx, cy = C.chain_dp(ax, ay, 5000, 5000, 500, 2**31 - 1, 5000,
                           3, 40, 0.12, 0.0, False, 1)
    counts = sorted((u & np.uint64(0xFFFFFFFF)).astype(int))
    assert counts == [6, 6]


def test_min_cnt_filter():
    pairs = [(100, 200), (120, 220)]  # only 2 anchors < min_cnt=3
    ax, ay = _mk_anchors(pairs)
    u, cx, cy = C.chain_dp(ax, ay, 5000, 5000, 500, 2**31 - 1, 5000,
                           3, 10, 0.12, 0.0, False, 1)
    assert u.shape[0] == 0


def test_krmq_avl_matches_reference_tree():
    """KrmqAvl replays op streams recorded from a harness built on the
    reference's own krmq.h — incl. heavy priority ties, where the answer
    depends on tree topology (krmq.h:110-150)."""
    import gzip
    import json

    from mm2_gb_tpu.ops.chain_rmq import KrmqAvl
    INT32_MAX = 2**31 - 1
    with gzip.open(golden_path("krmq_ops.json.gz"), "rt") as f:
        gold = json.load(f)
    for g in gold:
        t = KrmqAvl()
        out = []
        for op in g["ops"]:
            fld = op.split()
            if fld[0] == "I":
                y, i, pri = int(fld[1]), int(fld[2]), float(fld[3])
                t.insert((y << 32) | i, pri)
            elif fld[0] == "E":
                t.erase((int(fld[1]) << 32) | int(fld[2]))
            else:
                lo, hi = int(fld[1]), int(fld[2])
                q = t.rmq((lo << 32) | INT32_MAX, hi << 32)
                out.append(f"{t.key[q] >> 32} {t.key[q] & 0xFFFFFFFF}"
                           if q >= 0 else "NONE")
        assert out == g["answers"]


@pytest.mark.parametrize("use_native", [True, False])
def test_chain_rmq_tie_cases_match_reference(use_native, monkeypatch):
    """Tie-heavy anchor sets (equal RMQ priorities along anti-diagonals)
    against chain dumps recorded from the reference's mg_lchain_rmq —
    the cases a smallest-(y,i) tie heuristic can mis-order."""
    import gzip
    import json

    from mm2_gb_tpu.ops import chain_rmq as R
    from mm2_gb_tpu.utils import native
    if use_native and not native.available():
        pytest.skip("native unavailable")
    if not use_native:
        monkeypatch.setenv("MM2TPU_NO_NATIVE", "1")
    with gzip.open(golden_path("rmq_tie_cases.json.gz"), "rt") as f:
        cases = json.load(f)
    for c in cases:
        ax = np.array(c["ax"], np.uint64)
        ay = np.array(c["ay"], np.uint64)
        md, inner, bw, skip, cap, mc, ms, cg, cs = c["params"]
        u, cx, cy = R.chain_rmq(ax, ay, md, inner, bw, skip, cap,
                                mc, ms, cg, cs)
        out = []
        off = 0
        for k in range(u.shape[0]):
            sc = int(u[k] >> np.uint64(32))
            cnt = int(u[k] & np.uint64(0xFFFFFFFF))
            out.append(f"U {sc} {cnt}")
            for j in range(cnt):
                out.append(f"A {int(cx[off + j])} {int(cy[off + j])}")
            off += cnt
        got = "\n".join(out) + ("\n" if out else "")
        assert got == c["dump"]
