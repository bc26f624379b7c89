"""Shared end-to-end benchmark stage — the single source of truth for
"full CLI vs the reference binary" measurements (round-4 verdict weak
#6: bench.py and tools/chip_smoke.py used to carry two half-copies with
different rep policies).

Methodology (reference README.md "Performance" + this repo's
tunnel-noise policy): map the materialized flowcell with the given
device flags, best-of-N wall with breathers between reps (the shared
axon tunnel's device-wait for identical work spans 0.6-1000+ s; a
single rep measures weather, not the mapper), byte-compare stdout
against ``minimap2_cpu -t <threads> --max-chain-skip=2147483647`` and
report both the equal-thread ratio and the chip-vs-1-core ratio.

Reference walls are cached per (flags, threads) in a caller-provided
dict so multiple configs in one process time the reference once.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REF_BIN = "/tmp/refbuild/minimap2_cpu"
BASE_FLAGS = ["--max-chain-skip=2147483647"]


def ref_wall(flags: list[str], threads: str, ref_fa: str, reads_fa: str,
             cache: dict) -> tuple[float, str]:
    """Reference binary wall + stdout, memoized on (flags, threads)."""
    key = (tuple(flags), threads)
    if key not in cache:
        t0 = time.perf_counter()
        g = subprocess.run([REF_BIN, "-t", threads, *flags, ref_fa,
                            reads_fa], capture_output=True, text=True)
        cache[key] = (time.perf_counter() - t0, g.stdout)
    return cache[key]


def run_config(tag: str, extra: list[str], ref_fa: str, reads_fa: str,
               n_reads: int, threads: str = "1",
               remaining=lambda: 1e9, best_of: int = 4,
               breather: float = 5.0, ref_cache: dict | None = None,
               env: dict | None = None, cap_factor: float = 5.0) -> dict:
    """Best-of-N e2e run of one CLI config vs the reference binary.

    ``extra`` is the device flag set (e.g. ["--tpu-chain"]); ["-c"] in
    ``extra`` switches the reference to -c too.  Returns a flat dict of
    ``e2e_<tag>_*`` fields; partial results survive a rep timeout.
    """
    out: dict = {}
    if not os.path.exists(REF_BIN):
        out[f"e2e_{tag}_skipped"] = "reference binary unavailable"
        return out
    if ref_cache is None:
        ref_cache = {}
    flags = BASE_FLAGS + (["-c"] if "-c" in extra else [])

    rw1, gold = ref_wall(flags, "1", ref_fa, reads_fa, ref_cache)
    if threads != "1":
        rwt, gold = ref_wall(flags, threads, ref_fa, reads_fa, ref_cache)
    else:
        rwt = rw1
    out[f"e2e_{tag}_ref_wall_s"] = round(rwt, 2)
    out[f"e2e_{tag}_threads"] = int(threads)

    cmd = [sys.executable, "-m", "mm2_gb_tpu", *flags, *extra,
           "-t", threads, "-v", "3", ref_fa, reads_fa]
    run_env = dict(os.environ, **(env or {}))
    best = None
    walls = []
    # Per-rep cap: the shared tunnel's device-wait for identical work
    # spans 0.6-1000+ s; one storm-trapped rep must not eat the whole
    # budget (a 386 s rep once consumed a 540 s driver bench).  Device
    # configs are capped at cap_factor x the reference wall (floor 150 s
    # covers first-rep executable loads; slow configs like --tpu-align
    # pass a larger factor); a killed rep frees budget for a fresh
    # attempt that re-rolls the tunnel queue.  Host-only configs don't
    # queue on the device and need no cap.
    cap = (max(cap_factor * rw1, 150.0) if extra else 1e9)
    attempts = best_of + 2 if extra else best_of
    n_to = 0
    for rep in range(attempts):
        if len(walls) >= best_of:
            break
        if rep and remaining() < 30.0 + breather:
            break
        t0 = time.perf_counter()
        try:
            o = subprocess.run(cmd, capture_output=True, text=True,
                               env=run_env,
                               timeout=min(max(remaining() - 10.0, 15.0),
                                           cap))
        except subprocess.TimeoutExpired:
            n_to += 1
            out[f"e2e_{tag}_rep_timeout"] = n_to
            if remaining() < 45.0:
                break
            continue
        wall = time.perf_counter() - t0
        if o.returncode != 0:
            out[f"e2e_{tag}_error"] = o.stderr[-400:]
            break
        walls.append(round(wall, 2))
        if best is None or wall < best:
            best = wall
            out[f"e2e_{tag}_wall_s"] = round(best, 2)
            out[f"e2e_{tag}_reads_s"] = round(n_reads / best, 2)
            out[f"e2e_{tag}_vs_ref"] = round(rwt / best, 4)
            out[f"e2e_{tag}_vs_ref_1core"] = round(rw1 / best, 4)
            out[f"e2e_{tag}_byte_match"] = o.stdout == gold
            m = re.search(r"device-wait (\d+\.\d+)s", o.stderr)
            if m:  # shared-tunnel stall attribution; quiet-chip bound
                wait = float(m.group(1))
                out[f"e2e_{tag}_device_wait_s"] = wait
                out[f"e2e_{tag}_host_s"] = round(best - wait, 2)
            m = re.search(r"\[M::tpu\] time: (.*)", o.stderr)
            if m:
                out[f"e2e_{tag}_stage_times"] = m.group(1)
            m = re.search(r"fill_gcells_s (\d+\.\d+)", o.stderr)
            if m:
                out[f"e2e_{tag}_fill_gcells_s"] = float(m.group(1))
        out[f"e2e_{tag}_rep_walls"] = walls
        if rep + 1 < best_of and remaining() > 45.0:
            time.sleep(breather)
    return out
