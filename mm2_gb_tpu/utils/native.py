"""Loader for the optional C++ host-kit (csrc/hostkit.cpp → libhostkit.so).

The host-kit provides fast native implementations of the sequential host
components (minimizer sketch, radix permutation, chain backtracking) used
outside the TPU compute path.  Everything here has a pure-NumPy/Python
fallback, so the package works without the native library; tests cross-check
the two.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "csrc", "libhostkit.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        # build on first use when a toolchain is available
        import shutil
        import subprocess
        if shutil.which("make") and shutil.which("g++"):
            try:
                subprocess.run(["make", "-C", os.path.dirname(path)],
                               capture_output=True, timeout=120, check=True)
            except Exception:
                return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.mmt_sketch.restype = ctypes.c_int64
    lib.mmt_sketch.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint32, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
    ]
    lib.mmt_radix_perm64.restype = None
    lib.mmt_radix_perm64.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mmt_chain_dp.restype = ctypes.c_int64
    lib.mmt_chain_dp.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def sketch(seq: bytes, w: int, k: int, rid: int, is_hpc: bool) -> np.ndarray:
    lib = _load()
    n = len(seq)
    cap = 2 * (n + 16)  # xy pairs; generous upper bound (<= 2 per base)
    out = np.empty(cap, dtype=np.uint64)
    m = lib.mmt_sketch(
        seq, n, w, k, rid, 1 if is_hpc else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), cap,
    )
    if m < 0:
        raise RuntimeError("mmt_sketch: output capacity exceeded")
    return out[: 2 * m].reshape(-1, 2).copy()


def radix_perm64(keys: np.ndarray) -> np.ndarray:
    lib = _load()
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    perm = np.empty(keys.shape[0], dtype=np.int64)
    lib.mmt_radix_perm64(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        keys.shape[0],
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return perm


def chain_dp(ax: np.ndarray, ay: np.ndarray, max_dist_x: int, max_dist_y: int,
             bw: int, max_skip: int, max_iter: int,
             chn_pen_gap: float, chn_pen_skip: float,
             is_cdna: int, n_seg: int) -> tuple[np.ndarray, np.ndarray]:
    """Native chain DP: returns (f int32 scores, p int64 predecessors)."""
    lib = _load()
    n = ax.shape[0]
    ax = np.ascontiguousarray(ax, dtype=np.uint64)
    ay = np.ascontiguousarray(ay, dtype=np.uint64)
    f = np.empty(n, dtype=np.int32)
    p = np.empty(n, dtype=np.int64)
    lib.mmt_chain_dp(
        ax.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ay.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n, max_dist_x, max_dist_y, bw, max_skip, max_iter,
        chn_pen_gap, chn_pen_skip, is_cdna, n_seg,
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return f, p
