"""Benchmark: TPU chaining kernel throughput in anchor-pair relaxations/s.

Workload: synthetic 10-100 kb nanopore-like reads against a random
reference, run through the real seeding path.  The forward-DP chaining
kernel (ops/chain_tpu.py) is timed the same way the reference measures
its Mpairs/s — device execution of the score kernels only, excluding
host packing and transfers (gpu/planalyze.cu:59-86 uses device events
around kernel launches).  Completion is forced per repetition with a
small readback because tunneled TPU platforms resolve futures at enqueue.

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

    ref_len = 4_000_000
    n_reads = 160
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

    max_dist = max(mo.max_gap, mo.bw)
    cg = float(np.float32(float(np.float32(mo.chain_gap_scale)) * 0.01 * index.k))

    # correctness smoke through the full device path (packing + kernels +
    # readback), which the e2e tests also validate vs the host oracle
    f, p = chain_tpu.chain_scores_device(ax, ay, bounds, max_dist, max_dist,
                                         mo.bw, mo.max_chain_iter, cg, 0.0)
    assert int((f > 0).sum()) > 0

    # kernel-only measurement (planalyze.cu methodology): pack each window
    # class once, keep inputs device-resident, enqueue per-rep executions
    rng = chain_tpu.compute_ranges(ax, bounds, max_dist, mo.max_chain_iter)
    cuts = chain_tpu.cut_segments(rng)
    seg_lens = np.diff(cuts)
    seg_of = np.repeat(np.arange(seg_lens.shape[0]), seg_lens)
    row_of = np.arange(ax.shape[0], dtype=np.int64) - \
        np.repeat(cuts[:-1], seg_lens)
    seg_maxrng = np.maximum.reduceat(rng, cuts[:-1])
    x32 = (ax & np.uint64(0xFFFFFFFF)).astype(np.int32)
    y32 = (ay & np.uint64(0xFFFFFFFF)).astype(np.int32)
    span = int(((ay[0] >> np.uint64(32)) & np.uint64(0xFF)))

    classes = []
    total_pairs = 0
    for wi, W in enumerate(chain_tpu.WINDOW_CLASSES):
        lo = 0 if wi == 0 else chain_tpu.WINDOW_CLASSES[wi - 1]
        sel = np.nonzero((seg_maxrng > lo) & (seg_maxrng <= W))[0] if wi \
            else np.nonzero(seg_maxrng <= W)[0]
        if sel.shape[0] == 0:
            continue
        ntiles, start, X, Y, R, src, _, _ = chain_tpu.pack_class(
            sel, seg_lens, seg_of, row_of, rng, x32, y32, W)
        dev = [jax.device_put(v) for v in (ntiles, start, X, Y, R)]
        jax.block_until_ready(dev)
        classes.append((W, dev))
        total_pairs += int(rng[src].astype(np.int64).sum())

    kw = dict(span=span, max_dist_x=max_dist, max_dist_y=max_dist,
              bw=mo.bw, cg=cg, cs=0.0)
    for W, dev in classes:  # compile
        f, p = chain_tpu.chain_packed_tpu(*dev, W=W, **kw)
        jax.device_get(f[:1])

    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = [chain_tpu.chain_packed_tpu(*dev, W=W, **kw)
                for W, dev in classes]
        # force completion: the device stream executes in order, so one
        # readback of the last enqueued output fences the whole rep
        jax.device_get(outs[-1][0][:1])
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
