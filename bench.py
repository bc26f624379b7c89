"""Benchmark: TPU chaining throughput in anchor-pair relaxations/s.

Workload: synthetic 10–100 kb nanopore-like reads against a random
reference, run through the real seeding path; the device forward-DP
chaining kernels (ops/chain_tpu.py) are timed kernel-only, the same way
the reference measures Mpairs/s with device events around its score
kernels (gpu/planalyze.cu:59-86).

Baseline: the reference publishes no absolute pairs/s number
(BASELINE.md); the target set for this build is >= 2x the MI210's
chaining rate on this workload.  We use 2.0e9 pairs/s as that bar
(2x an estimated ~1 Gpairs/s for mm2-gb on MI210), so vs_baseline >= 1.0
means the target is met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_S = 2.0e9


def main() -> int:
    import jax
    from mm2_gb_tpu.models.index import MinimizerIndex
    from mm2_gb_tpu.models.pipeline import seed_read
    from mm2_gb_tpu.ops import chain_tpu
    from mm2_gb_tpu.utils import opts as O
    from mm2_gb_tpu.utils.fastx import SeqRecord
    from mm2_gb_tpu.utils.simulate import random_reference, simulate_readset

    ref_len = 2_000_000
    n_reads = 48
    ref = random_reference(ref_len, seed=1)
    reads = simulate_readset(ref, n_reads, 10_000, 100_000, seed=2)

    io, mo = O.set_preset(None)
    index = MinimizerIndex.from_strings([ref], io, names=["chr1"])
    O.mapopt_update(mo, index)

    seeded = [seed_read(index, mo, SeqRecord(i, name, seq))
              for i, (name, seq) in enumerate(reads)]
    bounds = np.zeros(len(seeded) + 1, dtype=np.int64)
    for i, sr in enumerate(seeded):
        bounds[i + 1] = bounds[i] + sr.ax.shape[0]
    ax = np.concatenate([sr.ax for sr in seeded])
    ay = np.concatenate([sr.ay for sr in seeded])

    max_dist = mo.max_gap  # 5000 (>= bw)
    rng = chain_tpu.compute_ranges(ax, bounds, max_dist, mo.max_chain_iter)
    total_pairs = int(rng.astype(np.int64).sum())

    cg = float(np.float32(float(np.float32(mo.chain_gap_scale)) * 0.01 * index.k))

    # warm-up (compiles all bucket shapes) + correctness smoke
    f, p = chain_tpu.chain_scores_device(ax, ay, bounds, max_dist, max_dist,
                                         mo.bw, mo.max_chain_iter, cg, 0.0)
    assert int((f > 0).sum()) > 0

    # timed passes (packing + device execution + readback)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        chain_tpu.chain_scores_device(ax, ay, bounds, max_dist, max_dist,
                                      mo.bw, mo.max_chain_iter, cg, 0.0)
    dt = (time.perf_counter() - t0) / reps

    pairs_per_s = total_pairs / dt
    print(json.dumps({
        "metric": "tpu_chaining_throughput",
        "value": round(pairs_per_s / 1e9, 4),
        "unit": "Gpairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
