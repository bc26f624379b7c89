"""Chaining oracle unit tests (score function + DP + backtrack)."""

import numpy as np

from mm2_gb_tpu.ops import chain as C


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
