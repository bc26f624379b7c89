"""Executable warm-up bookkeeping (ops/chain_tpu.py warm_start).

Over the tunneled device every per-process first call of a compiled
shape pays a compile-or-load round trip; launch signatures are persisted
and replayed at pipeline start.  These tests cover the bookkeeping on
the CPU backend (where warm_start must be a no-op that never touches
the interpret path).
"""

import json
import os
import time

from mm2_gb_tpu.ops import chain_tpu as CT


def _with_tmp_shapes(tmp_path, fn):
    old = os.environ.get("MM2TPU_JAX_CACHE")
    os.environ["MM2TPU_JAX_CACHE"] = str(tmp_path / "jaxcache")
    seen = CT._warm_seen.copy()
    CT._warm_seen.clear()
    try:
        return fn()
    finally:
        CT._warm_seen.clear()
        CT._warm_seen.update(seen)
        if old is None:
            del os.environ["MM2TPU_JAX_CACHE"]
        else:
            os.environ["MM2TPU_JAX_CACHE"] = old


def test_record_shape_roundtrip(tmp_path):
    def run():
        sig = (8, 2048, 256, 768, 15, 5000, 5000, 500, 0.12, 0.0, False)
        CT._record_shape(sig)
        CT._record_shape(sig)  # dedup: second write is a no-op
        path = CT._shapes_path()
        with open(path) as f:
            entries = json.load(f)
        assert [tuple(e["sig"]) for e in entries] == [sig]
        # newest-last ordering and the 64-entry cap
        for i in range(70):
            CT._record_shape((i, 2048, 256, 768, 15, 5000, 5000, 500, 0.1,
                              0.0, False))
        with open(path) as f:
            entries = json.load(f)
        assert len(entries) == 64
        assert entries[-1]["sig"][0] == 69
    _with_tmp_shapes(tmp_path, run)


def test_record_shape_disabled(tmp_path):
    os.environ["MM2TPU_JAX_CACHE"] = "0"
    try:
        CT._warm_seen.clear()
        assert CT._shapes_path() == ""
        CT._record_shape((1, 2048, 256, 768, 15, 5000, 5000, 500, 0.1,
                          0.0, False))
    finally:
        del os.environ["MM2TPU_JAX_CACHE"]
        CT._warm_seen.clear()


def test_warm_start_cpu_noop(tmp_path):
    """On a CPU backend the daemon thread must exit without compiling
    anything (interpret-mode compiles are minutes per shape)."""
    def run():
        CT._record_shape((4, 2048, 256, 768, 15, 5000, 5000, 500, 0.12,
                          0.0, False))
        calls = []
        orig = CT._warm_one
        CT._warm_one = lambda sig: calls.append(sig)
        try:
            CT.warm_start(verbose=0)
            deadline = time.time() + 10
            import threading
            while time.time() < deadline:
                th = [t for t in threading.enumerate()
                      if t.name == "mm2tpu-warm"]
                if not th:
                    break
                time.sleep(0.05)
            assert not th, "warm thread did not exit"
            assert calls == []  # _interpret() is True on the CPU backend
        finally:
            CT._warm_one = orig
    _with_tmp_shapes(tmp_path, run)


def test_warm_one_signature_matches_dispatch():
    """_warm_one must call chain_compact_tpu with EXACTLY the shapes and
    statics dispatch_scores uses, or the warmed executable is useless.
    Intercept the jitted call on both paths and compare."""
    import numpy as np

    seen = []
    orig = CT.chain_compact_tpu

    def spy(nmeta, start, flat, **kw):
        seen.append(((nmeta.shape, nmeta.dtype), (start.shape, start.dtype),
                     (flat.shape, flat.dtype), tuple(sorted(kw.items()))))
        return (np.zeros(kw["n_pad"], np.int32),
                np.zeros(kw["n_pad"], np.int16))

    CT.chain_compact_tpu = spy
    try:
        rng = np.random.default_rng(0)
        n = 300
        rpos = np.cumsum(rng.integers(1, 10, n))
        ax = rpos.astype(np.uint64)
        qpos = np.maximum.accumulate(
            np.maximum(rpos + rng.integers(-4, 5, n), 1))
        ay = (np.uint64(15) << np.uint64(32)) | qpos.astype(np.uint64)
        bounds = np.array([0, n], np.int64)
        CT.dispatch_scores(ax, ay, bounds, 5000, 5000, 500, 5000,
                           0.12, 0.0)
        assert len(seen) == 1
        disp = seen.pop()
        tiles_alloc = disp[1][0][0]
        kw = dict(disp[3])
        CT._warm_one((tiles_alloc, kw["n_pad"], kw["s_pad"], kw["W"],
                      kw["span"], kw["max_dist_x"], kw["max_dist_y"],
                      kw["bw"], kw["cg"], kw["cs"], kw["is_cdna"]))
        assert len(seen) == 1
        warm = seen.pop()
        assert warm == disp
    finally:
        CT.chain_compact_tpu = orig


def test_warm_one_executes_real_call():
    """_warm_one must run the REAL chain_compact_tpu end to end: the spy
    test above replaces it, so a drift in the return contract (e.g. the
    stacked (2, n) array becoming an (f, p) tuple) would otherwise only
    surface as a silently-skipped warm-up in production logs."""
    from mm2_gb_tpu.ops import chain_tpu as CT
    CT._warm_one((4, 2048, 256, 768, 15, 5000, 5000, 500,
                  0.12000000476837158, 0.0, False))


def test_fill_sig_roundtrip(tmp_path, monkeypatch):
    """Fill signatures persist next to the chain shapes and pass
    warm_start's entry filter (string-kinded sigs route to ksw2 warm)."""
    import json

    from mm2_gb_tpu.ops import chain_tpu as CT
    from mm2_gb_tpu.ops import ksw2_tpu as KT
    monkeypatch.setenv("MM2TPU_JAX_CACHE", str(tmp_path / "jx"))
    monkeypatch.setattr(CT, "_warm_seen", set())
    KT._record_fill_sig("fill", 64, 256, 8,
                        (4, 2, 24, 1, 2, -4, 1, False, 19, -19))
    path = CT._shapes_path()
    entries = json.load(open(path))
    sigs = [tuple(e["sig"]) for e in entries
            if (isinstance(e["sig"][0], str)
                or e["sig"][2] in CT.WINDOW_CLASSES)]
    assert sigs and sigs[-1][0] == "fill" and sigs[-1][1] == 64
