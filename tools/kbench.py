"""Chain-kernel micro-bench for on-chip tuning sweeps (fold8 chunking).

Runs bench.py's kernel stage (device-resident operands, fenced readback,
planalyze methodology) once in THIS process and prints one JSON line.
Mode knobs like MM2TPU_FOLD8_CHUNK are read at import, so a sweep runs
one process per mode:

    for c in 0 8 16 32 64 128; do
        MM2TPU_FOLD8_CHUNK=$c python tools/kbench.py; done

The stage includes the device-vs-oracle bit-equality smoke, so each
mode is also correctness-checked on real silicon before it is timed.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("MM2TPU_BENCH_BUDGET", "1200")


def main() -> int:
    from mm2_gb_tpu.utils.tpucfg import enable_compile_cache
    enable_compile_cache()
    import numpy as np

    import bench

    t0 = time.perf_counter()
    ax, ay, bounds, mo, index = bench.build_workload()
    cg = float(np.float32(float(np.float32(mo.chain_gap_scale)) * 0.01
                          * index.k))
    t_work = time.perf_counter() - t0
    rng = bench.cpu_stage(ax, ay, bounds, mo, cg)
    t0 = time.perf_counter()
    bench.kernel_stage(ax, ay, bounds, mo, cg, rng)
    out = {"fold8_chunk": os.environ.get("MM2TPU_FOLD8_CHUNK", "default"),
           "gpairs_s": bench.RESULT.get("value"),
           "device_smoke": bench.RESULT.get("device_smoke"),
           "kernel_reps": bench.RESULT.get("kernel_reps"),
           "workload_s": round(t_work, 1),
           "stage_s": round(time.perf_counter() - t0, 1)}
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
