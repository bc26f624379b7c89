"""Device chaining kernels vs the host oracle (interpret mode on CPU).

Mirrors the reference's own GPU-vs-CPU validation strategy
(gpu/debug.h:31-39 check_score/check_range): identical f[] scores and
predecessors are required, which in turn guarantees byte-identical PAF.
"""

import numpy as np
import pytest

from mm2_gb_tpu.ops import chain as chain_ops
from mm2_gb_tpu.ops import chain_tpu
from mm2_gb_tpu.ops.chain_xla import chain_bucket_xla

CG = float(np.float32(float(np.float32(0.8)) * 0.01 * 15))


def _synthetic_anchors(n, seed, step_hi=12, jitter=6, rev_frac=0.0):
    rng = np.random.default_rng(seed)
    rpos = np.cumsum(rng.integers(1, step_hi, n))
    qpos = rpos + rng.integers(-jitter, jitter + 1, n)
    qpos = np.maximum.accumulate(np.maximum(qpos, 1))
    ax = rpos.astype(np.uint64)
    ay = (np.uint64(15) << np.uint64(32)) | qpos.astype(np.uint64)
    return ax, ay


def _device_vs_oracle(ax, ay, max_dist=5000, bw=500, max_iter=5000):
    bounds = np.array([0, ax.shape[0]], dtype=np.int64)
    fd, pd = chain_tpu.chain_scores_device(ax, ay, bounds, max_dist,
                                           max_dist, bw, max_iter, CG, 0.0)
    fo, po = chain_ops._chain_dp_scores(ax, ay, max_dist, max_dist, bw,
                                        2**31 - 1, max_iter, np.float32(CG),
                                        np.float32(0.0), False, 1)
    assert np.array_equal(fo, fd)
    assert np.array_equal(po, pd)


def test_small_segments():
    ax, ay = _synthetic_anchors(50, 0)
    _device_vs_oracle(ax, ay)


def test_medium_dense():
    ax, ay = _synthetic_anchors(500, 1, step_hi=6)
    _device_vs_oracle(ax, ay)


def test_multi_segment_gaps():
    """Anchors with >max_dist gaps produce several independent segments."""
    chunks = []
    base = 0
    for s in range(5):
        ax, ay = _synthetic_anchors(80, s + 2)
        chunks.append((ax + np.uint64(base), ay))
        base += int(ax[-1]) + 50000
    ax = np.concatenate([c[0] for c in chunks])
    ay = np.concatenate([c[1] for c in chunks])
    rng = chain_tpu.compute_ranges(ax, np.array([0, ax.shape[0]], np.int64),
                                   5000, 5000)
    assert chain_tpu.cut_segments(rng).shape[0] > 5
    _device_vs_oracle(ax, ay)


def test_dense_repeat_long_ranges():
    """A repeat cluster: many anchors within one window (flat-kernel path)."""
    rng = np.random.default_rng(7)
    n = 900
    rpos = np.sort(rng.integers(0, 3000, n)).astype(np.uint64)
    # enforce strictly monotone x by adding index (keeps ranges large)
    rpos = rpos + np.arange(n, dtype=np.uint64)
    qpos = (rpos + rng.integers(-200, 200, n).astype(np.int64)).clip(1)
    ay = (np.uint64(15) << np.uint64(32)) | qpos.astype(np.uint64)
    _device_vs_oracle(rpos, ay)


def test_xla_fallback_matches_pallas_packing():
    """chain_bucket_xla produces the same f/p as the oracle on one bucket."""
    ax, ay = _synthetic_anchors(60, 9)
    rngv = chain_tpu.compute_ranges(ax, np.array([0, 60], np.int64), 5000, 5000)
    L = W = 64
    X = np.zeros((L + W, 128), np.int32)
    Y = np.zeros((L + W, 128), np.int32)
    S = np.zeros((L + W, 128), np.int32)
    R = np.zeros((L + W, 128), np.int32)
    X[:60, 0] = (ax & np.uint64(0xFFFFFFFF)).astype(np.int32)
    Y[:60, 0] = (ay & np.uint64(0xFFFFFFFF)).astype(np.int32)
    S[:60, 0] = 15
    R[:60, 0] = rngv
    f, p = chain_bucket_xla(X, Y, S, R, L=L, W=W, max_dist_x=5000,
                            max_dist_y=5000, bw=500, cg=CG, cs=0.0)
    fo, po = chain_ops._chain_dp_scores(ax, ay, 5000, 5000, 500, 2**31 - 1,
                                        5000, np.float32(CG), np.float32(0.0),
                                        False, 1)
    assert np.array_equal(np.asarray(f)[:60, 0], fo)
    prel = np.asarray(p)[:60, 0].astype(np.int64)
    pg = np.where(prel > 0, np.arange(60) - prel, -1)
    assert np.array_equal(pg, po)


def test_mg_log2_kernel_matches_host():
    import jax
    import jax.numpy as jnp
    from mm2_gb_tpu.utils.hashkit import mg_log2
    dd = np.concatenate([np.arange(1, 4096),
                         np.random.default_rng(0).integers(1, 2**24, 5000)])
    host = mg_log2((dd + 1).astype(np.float32))
    dev = np.asarray(jax.jit(chain_tpu._mg_log2_f32)(
        jnp.asarray((dd + 1).astype(np.float32))))
    assert np.array_equal(host, dev)


def test_device_pipeline_matches_host_e2e():
    """map_batch_tpu (seed→device-chain→backtrack→post) equals the host
    mapper on small reads (interpret mode)."""
    from mm2_gb_tpu.models.index import MinimizerIndex
    from mm2_gb_tpu.models.mapper import map_frag
    from mm2_gb_tpu.models.pipeline import map_batch_tpu
    from mm2_gb_tpu.utils import opts as O
    from mm2_gb_tpu.utils.fastx import SeqRecord
    from mm2_gb_tpu.utils.paf import write_paf
    from mm2_gb_tpu.utils.simulate import random_reference, simulate_readset

    ref = random_reference(60_000, seed=7)
    reads = simulate_readset(ref, 6, 1_000, 4_000, seed=8)
    io, mo = O.set_preset(None)
    mo.max_chain_skip = 2**31 - 1
    index = MinimizerIndex.from_strings([ref], io, names=["c"])
    O.mapopt_update(mo, index)
    recs = [SeqRecord(i, n, s) for i, (n, s) in enumerate(reads)]
    dev = map_batch_tpu(index, mo, recs)
    for rec, (sr, regs) in zip(recs, dev):
        host = map_frag(index, mo, [rec.seq], rec.name)
        got = [write_paf(r, rec.name, rec.length, index, mo.flag, sr.rep_len)
               for r in regs]
        want = [write_paf(r, rec.name, rec.length, index, mo.flag,
                          host.rep_len) for r in host.regs]
        assert got == want


def test_oversize_segment_host_fallback(capsys):
    """Segments wider than the largest window class fall back to the host
    (needs range > 5120: dense anchors + max_iter above the class cap)."""
    ax, ay = _synthetic_anchors(6000, 9, step_hi=2)
    bounds = np.array([0, ax.shape[0]], dtype=np.int64)
    rng = chain_tpu.compute_ranges(ax, bounds, 50000, 40000)
    assert int(rng.max()) > chain_tpu.WINDOW_CLASSES[-1]
    fd, pd = chain_tpu.chain_scores_device(ax, ay, bounds, 50000, 50000,
                                           500, 40000, CG, 0.0)
    fo, po = chain_ops._chain_dp_scores(ax, ay, 50000, 50000, 500,
                                        2**31 - 1, 40000, np.float32(CG),
                                        np.float32(0.0), False, 1)
    assert np.array_equal(fo, fd)
    assert np.array_equal(po, pd)


def test_multichip_chain_matches_oracle():
    """Sharded Pallas chain kernel over an 8-device CPU mesh equals the
    host oracle (zero-collective data parallelism, SURVEY.md §5.8).

    Runs in a subprocess: device-count flags must be set before the
    interpreter loads any JAX plugin."""
    import os
    import subprocess
    import sys
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["MM2TPU_FORCE_CPU"] = "1"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    script = """
import numpy as np
from mm2_gb_tpu.parallel.mesh import chain_batch_multichip, make_mesh
from mm2_gb_tpu.ops import chain as chain_ops
CG = float(np.float32(float(np.float32(0.8)) * 0.01 * 15))
rng = np.random.default_rng(3)
bounds = [0]; ax_all = []; ay_all = []
for _ in range(16):
    n = int(rng.integers(40, 200))
    rpos = np.cumsum(rng.integers(1, 10, n))
    qpos = np.maximum.accumulate(np.maximum(rpos + rng.integers(-4, 5, n), 1))
    ax_all.append(rpos.astype(np.uint64))
    ay_all.append((np.uint64(15) << np.uint64(32)) | qpos.astype(np.uint64))
    bounds.append(bounds[-1] + n)
ax = np.concatenate(ax_all); ay = np.concatenate(ay_all)
bounds = np.array(bounds, np.int64)
fd, pd = chain_batch_multichip(make_mesh(8), ax, ay, bounds, 5000, 5000,
                               500, 5000, CG, 0.0)
fo = np.empty_like(fd); po = np.empty_like(pd)
for i in range(16):
    s, e = int(bounds[i]), int(bounds[i + 1])
    f1, p1 = chain_ops._chain_dp_scores(ax[s:e], ay[s:e], 5000, 5000, 500,
                                        2**31 - 1, 5000, np.float32(CG),
                                        np.float32(0.0), False, 1)
    fo[s:e] = f1
    po[s:e] = np.where(p1 >= 0, p1 + s, -1)
assert np.array_equal(fo, fd) and np.array_equal(po, pd)
print("MULTICHIP_OK")
"""
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=900)
    assert "MULTICHIP_OK" in r.stdout, r.stderr[-2000:]


def test_device_align_pipeline_matches_host_e2e():
    """--tpu-align path: speculative gap-fill batching through the device
    extd2 kernel produces byte-identical PAF records (cigar included)."""
    from mm2_gb_tpu.models.index import MinimizerIndex
    from mm2_gb_tpu.models.mapper import map_frag
    from mm2_gb_tpu.models.pipeline import map_batch_tpu
    from mm2_gb_tpu.utils import opts as O
    from mm2_gb_tpu.utils.fastx import SeqRecord
    from mm2_gb_tpu.utils.paf import write_paf
    from mm2_gb_tpu.utils.simulate import random_reference, simulate_readset

    ref = random_reference(60_000, seed=17)
    reads = simulate_readset(ref, 5, 1_000, 4_000, seed=18)
    io, mo = O.set_preset(None)
    mo.max_chain_skip = 2**31 - 1
    mo.flag |= (O.MM_F_CIGAR | O.MM_F_OUT_CG | O.MM_F_OUT_CS
                | O.MM_F_TPU_ALIGN)
    index = MinimizerIndex.from_strings([ref], io, names=["c"])
    O.mapopt_update(mo, index)
    recs = [SeqRecord(i, n, s) for i, (n, s) in enumerate(reads)]
    dev = map_batch_tpu(index, mo, recs)
    host_flag = mo.flag & ~O.MM_F_TPU_ALIGN
    mo_host = O.MapOptions(**{**mo.__dict__, "flag": host_flag})
    for rec, (sr, regs) in zip(recs, dev):
        host = map_frag(index, mo_host, [rec.seq], rec.name)
        got = [write_paf(r, rec.name, rec.length, index, mo.flag, sr.rep_len)
               for r in regs]
        want = [write_paf(r, rec.name, rec.length, index, mo_host.flag,
                          host.rep_len) for r in host.regs]
        assert got == want


def test_native_lpt_pack_matches_python():
    """csrc mmt_lpt_pack must produce bit-identical packings to the
    Python heapq LPT (same (height, lane) tie order)."""
    import heapq

    from mm2_gb_tpu.utils import native
    if not native.available():
        import pytest
        pytest.skip("native hostkit unavailable")
    rng = np.random.default_rng(42)
    for _ in range(10):
        n = int(rng.integers(1, 3000))
        lens = rng.integers(1, 400, size=n).astype(np.int64)
        ln, of, h = native.lpt_pack(lens, chain_tpu.LANES)
        order = np.argsort(-lens, kind="stable")
        lane_of = np.empty(n, np.int64)
        off_of = np.empty(n, np.int64)
        heap = [(0, lane) for lane in range(chain_tpu.LANES)]
        heapq.heapify(heap)
        for si in order:
            hh, lane = heapq.heappop(heap)
            lane_of[si] = lane
            off_of[si] = hh
            heapq.heappush(heap, (hh + int(lens[si]), lane))
        assert np.array_equal(ln, lane_of)
        assert np.array_equal(of, off_of)
        assert h == max(hh for hh, _ in heap)


def test_batch_caps_split_and_match():
    """max_anchors_batch splits the accumulation into multiple device
    batches with overflow spill; output equals the uncapped run."""
    from mm2_gb_tpu.models.index import MinimizerIndex
    from mm2_gb_tpu.models.pipeline import TpuMetrics, map_file_tpu_records
    from mm2_gb_tpu.utils import opts as O
    from mm2_gb_tpu.utils import tpucfg
    from mm2_gb_tpu.utils.paf import write_paf
    from mm2_gb_tpu.utils.simulate import random_reference, simulate_readset
    import tempfile

    ref = random_reference(30_000, seed=11)
    reads = simulate_readset(ref, 4, 600, 1_200, seed=12)
    io, mo = O.set_preset(None)
    mo.max_chain_skip = 2**31 - 1
    index = MinimizerIndex.from_strings([ref], io, names=["c"])
    O.mapopt_update(mo, index)
    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        for n, s in reads:
            f.write(f">{n}\n{s}\n")
        qpath = f.name

    def run():
        out = []
        met = TpuMetrics()
        for sr, regs in map_file_tpu_records(index, mo, [qpath], met):
            for r in regs:
                out.append(write_paf(r, sr.rec.name, sr.rec.length, index,
                                     mo.flag, sr.rep_len))
        return out, met

    base, met0 = run()
    assert met0.n_batches == 1
    old = tpucfg._current
    try:
        tpucfg._current = tpucfg.TpuConfig(max_anchors_batch=200)
        capped, met1 = run()
    finally:
        tpucfg._current = old
    assert met1.n_batches > 1
    assert met1.n_spills > 0
    assert capped == base


def test_multihost_shard_merge(tmp_path):
    """Two-rank --tpu-nproc run: shard outputs + mergeshards equal the
    single-host byte order (SURVEY.md §5.8 deterministic merge)."""
    import os
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["MM2TPU_FORCE_CPU"] = "1"
    T = "/root/reference/test"
    if not os.path.isdir(T):
        import pytest
        pytest.skip("reference test data not available")
    ref = os.path.join(T, "MT-human.fa")
    qry = os.path.join(T, "MT-orang.fa")
    base = ["--max-chain-skip=2147483647", "--tpu-chain", ref, qry]
    single = subprocess.run(
        [_sys.executable, "-m", "mm2_gb_tpu", *base],
        capture_output=True, text=True, env=env, timeout=600)
    assert single.returncode == 0
    pre = str(tmp_path / "mh")
    for rank in ("0", "1"):
        r = subprocess.run(
            [_sys.executable, "-m", "mm2_gb_tpu",
             "--max-chain-skip=2147483647", "--tpu-chain",
             "--tpu-nproc", "2", "--tpu-rank", rank, "-o", pre,
             ref, qry],
            capture_output=True, text=True, env=env, timeout=600)
        assert r.returncode == 0, r.stderr[-400:]
    merged = subprocess.run(
        [_sys.executable, "-m", "mm2_gb_tpu.tools.mergeshards", pre, "2"],
        capture_output=True, text=True, env=env, timeout=120)
    assert merged.returncode == 0
    assert merged.stdout == single.stdout


def test_multihost_sam_and_truncation_guard(tmp_path):
    """--tpu-nproc with -a: rank 0 carries the SAM header as a
    sort-first idx record and the merged SAM equals single-host bytes;
    a truncated shard body makes mergeshards fail loudly."""
    import os
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["MM2TPU_FORCE_CPU"] = "1"
    from tests.conftest import golden_path
    ref = golden_path("splitq_ref.fa.gz")
    qry = golden_path("splitq_q1.fa.gz")  # 12 reads: both ranks get work
    base = ["--max-chain-skip=2147483647", "--tpu-chain", "-a", ref, qry]
    single = subprocess.run(
        [_sys.executable, "-m", "mm2_gb_tpu", *base],
        capture_output=True, text=True, env=env, timeout=600)
    assert single.returncode == 0
    pre = str(tmp_path / "mhs")
    for rank in ("0", "1"):
        r = subprocess.run(
            [_sys.executable, "-m", "mm2_gb_tpu",
             "--max-chain-skip=2147483647", "--tpu-chain", "-a",
             "--tpu-nproc", "2", "--tpu-rank", rank, "-o", pre,
             ref, qry],
            capture_output=True, text=True, env=env, timeout=600)
        assert r.returncode == 0, r.stderr[-400:]
    merged = subprocess.run(
        [_sys.executable, "-m", "mm2_gb_tpu.tools.mergeshards", pre, "2"],
        capture_output=True, text=True, env=env, timeout=120)
    assert merged.returncode == 0, merged.stderr[-400:]

    def _no_pg(s):  # @PG CL: carries the (different) argv
        return [l for l in s.splitlines() if not l.startswith("@PG")]
    assert _no_pg(merged.stdout) == _no_pg(single.stdout)

    # truncate rank 1's body: merge must abort, not silently drop reads
    body = open(pre + ".shard1").read()
    open(pre + ".shard1", "w").write(body[:len(body) // 2])
    bad = subprocess.run(
        [_sys.executable, "-m", "mm2_gb_tpu.tools.mergeshards", pre, "2"],
        capture_output=True, text=True, env=env, timeout=120)
    assert bad.returncode != 0
    assert "truncated" in bad.stderr or "trailing" in bad.stderr

    # missing sentinel (crashed rank): also a loud failure
    open(pre + ".shard1", "w").write(body)
    idx = open(pre + ".shard1.idx").read().splitlines()
    open(pre + ".shard1.idx", "w").write("\n".join(idx[:-1]) + "\n")
    bad2 = subprocess.run(
        [_sys.executable, "-m", "mm2_gb_tpu.tools.mergeshards", pre, "2"],
        capture_output=True, text=True, env=env, timeout=120)
    assert bad2.returncode != 0
    assert "sentinel" in bad2.stderr


def test_multihost_jax_distributed_coordinator(tmp_path):
    """Two CONCURRENT ranks through jax.distributed.initialize (local
    coordinator, CPU backend) via --tpu-coord; shards merge to the
    single-host byte order.  Exercises init_distributed for real
    (SURVEY.md §5.8 pod-slice path)."""
    import os
    import socket
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["MM2TPU_FORCE_CPU"] = "1"
    T = "/root/reference/test"
    if not os.path.isdir(T):
        import pytest
        pytest.skip("reference test data not available")
    ref = os.path.join(T, "MT-human.fa")
    qry = os.path.join(T, "MT-orang.fa")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    single = subprocess.run(
        [_sys.executable, "-m", "mm2_gb_tpu",
         "--max-chain-skip=2147483647", "--tpu-chain", ref, qry],
        capture_output=True, text=True, env=env, timeout=600)
    assert single.returncode == 0
    pre = str(tmp_path / "mhd")
    procs = []
    for rank in ("0", "1"):
        procs.append(subprocess.Popen(
            [_sys.executable, "-m", "mm2_gb_tpu",
             "--max-chain-skip=2147483647", "--tpu-chain",
             "--tpu-nproc", "2", "--tpu-rank", rank,
             "--tpu-coord", coord, "-o", pre, ref, qry],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env))
    for pr in procs:
        out, err = pr.communicate(timeout=600)
        assert pr.returncode == 0, err[-600:]
    merged = subprocess.run(
        [_sys.executable, "-m", "mm2_gb_tpu.tools.mergeshards", pre, "2"],
        capture_output=True, text=True, env=env, timeout=120)
    assert merged.returncode == 0, merged.stderr[-400:]
    assert merged.stdout == single.stdout


def test_auto_capacity_model(monkeypatch):
    """derive_caps scales the batch caps to the device HBM via the
    bytes-per-anchor model (plmem.cu:473-540 analog); explicit JSON caps
    and CPU backends are left alone."""
    from mm2_gb_tpu.utils import tpucfg

    class FakeDev:
        platform = "tpu"

        def memory_stats(self):
            return {"bytes_limit": 16 * 2**30}

    class FakeJax:
        @staticmethod
        def devices():
            return [FakeDev()]

    old = tpucfg._current
    try:
        tpucfg._current = tpucfg.TpuConfig()
        monkeypatch.setitem(__import__("sys").modules, "jax", FakeJax)
        tpucfg.derive_caps(0)
        want = min(int(16 * 2**30 * tpucfg.HBM_FRACTION
                       / tpucfg.BYTES_PER_ANCHOR),
                   tpucfg.MAX_AUTO_ANCHORS)  # pipeline-overlap ceiling
        assert tpucfg._current.max_anchors_batch == want
        assert tpucfg._current.max_reads_batch == max(
            200_000, want // tpucfg.AVG_ANCHORS_PER_READ)

        # tunneled backends report memory_stats() = None: the known
        # per-kind HBM table must engage instead of silently no-opping
        class TunnelDev:
            platform = "tpu"
            device_kind = "TPU v5 lite"

            def memory_stats(self):
                return None

        FakeJax.devices = staticmethod(lambda: [TunnelDev()])
        tpucfg._current = tpucfg.TpuConfig()
        tpucfg.derive_caps(0)
        assert tpucfg._current.max_anchors_batch == want

        # explicit JSON caps win
        tpucfg._current = tpucfg.TpuConfig(max_anchors_batch=123,
                                           caps_explicit=True)
        tpucfg.derive_caps(0)
        assert tpucfg._current.max_anchors_batch == 123
    finally:
        tpucfg._current = old


def test_fused_pack_matches_numpy_path():
    """mmt_pack_class (fused native per-class operand pack) is
    bit-identical to the NumPy pack_class_meta construction."""
    from mm2_gb_tpu.ops import chain_tpu
    from mm2_gb_tpu.utils import native

    if not native.available():
        import pytest
        pytest.skip("native hostkit unavailable")
    TILE, LANES = chain_tpu.TILE, chain_tpu.LANES
    rng_np = np.random.default_rng(5)
    # synthetic segment structure: 300 segments, ragged lengths
    seg_lens = rng_np.integers(1, 700, 300).astype(np.int64)
    cuts = np.zeros(seg_lens.shape[0] + 1, np.int64)
    np.cumsum(seg_lens, out=cuts[1:])
    n = int(cuts[-1])
    x32 = rng_np.integers(0, 2**20, n).astype(np.int32)
    y32 = rng_np.integers(0, 2**20, n).astype(np.int32)
    rng = rng_np.integers(0, 512, n).astype(np.int32)
    seg_of = np.repeat(np.arange(seg_lens.shape[0]), seg_lens)
    row_of = np.arange(n, dtype=np.int64) - np.repeat(cuts[:-1], seg_lens)
    W = 512
    sel = np.arange(seg_lens.shape[0])

    (ntiles, start, H, src, rows, cols, lane_np,
     off_np) = chain_tpu.pack_class_meta(
        sel, seg_lens, seg_of, row_of, rng, W)
    n_real = int(src.shape[0])
    n_pad = max(1 << (n_real - 1).bit_length(), 2048)
    s_pad = chain_tpu._quant_size(sel.shape[0], floor=256)
    flat_np = np.zeros(chain_tpu._flat_len(n_pad, s_pad), np.int32)
    flat_np[:n_real] = x32[src]
    flat_np[n_pad:n_pad + n_real] = y32[src]
    flat_np[2 * n_pad:2 * n_pad + n_pad // 2].view(
        np.int16)[:n_real] = rng[src].astype(np.int16)
    chain_tpu._seg_meta_into(flat_np, 2 * n_pad + n_pad // 2, s_pad,
                             seg_lens[sel], off_np, lane_np, W, n_real)

    lens = seg_lens[sel]
    lane_of, off_of, height = native.lpt_pack(lens, LANES)
    tiles = max(-(-max(height, 1) // TILE), 1)
    Hf = W + tiles * TILE
    flat_f = np.zeros(chain_tpu._flat_len(n_pad, s_pad), np.int32)
    src_f, rmax, pairs = native.pack_class_flat(
        cuts, sel, off_of, x32, y32, rng, W, Hf, n_real, n_pad, flat_f)
    chain_tpu._seg_meta_into(flat_f, 2 * n_pad + n_pad // 2, s_pad,
                             lens, off_of, lane_of, W, n_real)
    start_f = native.tile_starts(rmax, Hf, W, TILE, tiles)

    assert Hf == H and tiles == int(ntiles[0])
    assert np.array_equal(flat_f, flat_np)
    assert np.array_equal(src_f, src)
    assert np.array_equal(start_f, start)
    assert pairs == int(rng[src].astype(np.int64).sum())
    # the device coordinate derivation reproduces the host rows/cols
    o = 2 * n_pad + n_pad // 2
    astart = flat_f[o:o + s_pad].astype(np.int64)
    prow = flat_f[o + s_pad:o + 2 * s_pad]
    lcol = flat_f[o + 2 * s_pad:o + 3 * s_pad]
    idx = np.arange(n_real)
    sid = np.searchsorted(astart, idx, side="right") - 1
    assert np.array_equal(prow[sid] + (idx - astart[sid]), rows)
    assert np.array_equal(lcol[sid], cols)


def test_mergeshards_trailing_loss_and_total_disagreement(tmp_path):
    """Synthetic shards: per-file #file totals let the merge detect
    TRAILING read losses (one rank saw a truncated query file) and
    cross-rank total disagreement — not just interior holes."""
    import subprocess
    import sys as _sys

    def write_rank(rank, recs, total, done=None):
        body, idx = [], []
        for fi, gidx in recs:
            line = f"read{gidx}\tline\n"
            body.append(line)
            idx.append(f"{fi}\t{gidx}\t1")
        idx.append(f"#file\t0\t{total}")
        idx.append(f"#done\t{done if done is not None else len(recs)}")
        open(tmp_path / f"mh.shard{rank}", "w").write("".join(body))
        open(tmp_path / f"mh.shard{rank}.idx", "w").write(
            "\n".join(idx) + "\n")

    # healthy: 4 reads, ranks own evens/odds
    write_rank(0, [(0, 0), (0, 2)], 4)
    write_rank(1, [(0, 1), (0, 3)], 4)
    ok = subprocess.run(
        [_sys.executable, "-m", "mm2_gb_tpu.tools.mergeshards",
         str(tmp_path / "mh"), "2"], capture_output=True, text=True)
    assert ok.returncode == 0
    assert ok.stdout.splitlines() == [f"read{i}\tline" for i in range(4)]

    # trailing loss: rank 1 only saw 2 reads (truncated file copy) but
    # wrote a valid sentinel; union {0,1,2} vs total 4
    write_rank(1, [(0, 1)], 2)
    bad = subprocess.run(
        [_sys.executable, "-m", "mm2_gb_tpu.tools.mergeshards",
         str(tmp_path / "mh"), "2"], capture_output=True, text=True)
    assert bad.returncode != 0
    assert "disagree" in bad.stderr or "missing" in bad.stderr
