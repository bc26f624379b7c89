"""Device batch/kernel configuration (the --gpu-cfg JSON analog).

The reference tunes its GPU path per device with JSON configs
(gpu/*.json, parsed at plmem.cu:373-451): stream counts, batch anchor
caps, grid/block dims and segment-size cutoffs.  The TPU analog tunes
the packed-kernel geometry: successor-window classes, lanes, tile rows
and macro-batch anchor caps.  Fields mirror the reference's tiering
(§5.6): absent fields keep defaults, like cJSON's optional lookups.
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass, field


@dataclass
class TpuConfig:
    # successor-window capacity classes (size-classed dispatch; the
    # short/mid/long cutoff analog of gpu_config.json's seg cutoffs)
    window_classes: tuple = (768, 5120)
    lanes: int = 128            # VPU lane width (fixed by hardware)
    tile: int = 128             # dst tile rows per kernel step
    # macro-batch caps (max_total_n / max_read analogs, plmem.cu:473-540)
    # consumed by models.pipeline._acc_batches; a batch is cut (and the
    # overflow read spilled to the next one, map.c:886-922) when either
    # cap would be exceeded
    max_anchors_batch: int = 1_000_000
    max_reads_batch: int = 200_000
    # True when the JSON set the caps explicitly — the auto capacity
    # model (derive_caps) then leaves them alone, mirroring the
    # reference's config-overrides-model tiering (plmem.cu:473-540)
    caps_explicit: bool = False
    # NOTE: the reference's micro_batch knob (plmem.cuh:7-9) has no TPU
    # analog: XLA reuses HBM buffers across dispatches and JAX's async
    # dispatch queues kernels, so there is nothing to sub-batch.


_current = TpuConfig()


def current_config() -> TpuConfig:
    """The active config (set by apply_tpu_config; defaults otherwise)."""
    return _current


def load_tpu_config(path: str | None) -> TpuConfig:
    cfg = TpuConfig()
    if not path:
        return cfg
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        sys.stderr.write(f"[W::tpucfg] cannot read {path}: {e}; "
                         "using defaults\n")
        return cfg
    if "window_classes" in data:
        cfg.window_classes = tuple(int(v) for v in data["window_classes"])
    for k in ("lanes", "tile", "max_anchors_batch", "max_reads_batch"):
        if k in data:
            setattr(cfg, k, int(data[k]))
    if "max_anchors_batch" in data or "max_reads_batch" in data:
        cfg.caps_explicit = True
    return cfg


# Bytes of device HBM per batched anchor, per in-flight macro-batch:
#   packed operand (4, n) int32 = 16 B  + result (2, n) int32 = 8 B,
#   both power-of-two padded (<= 2x)                      -> 48 B
#   on-device padded layouts x/y/r/f/p: 5 x int32 at the measured ~50%
#   lane-packing efficiency, tile count power-of-two padded -> 80 B
# x2 for the double-buffered pipeline (batch N scores on the device
# while batch N-1 drains on the host).  The reference derives its
# max_total_n/max_read the same way from its SoA footprint
# (plmem.cu:473-540, factors F1..F4).
BYTES_PER_ANCHOR = 2 * (48 + 80)
HBM_FRACTION = 0.5          # leave headroom for XLA scratch + compiles
AVG_ANCHORS_PER_READ = 1000  # reference's max_read = max_total_n / 1000
# Tunneled PJRT backends report memory_stats() = None; fall back to the
# known per-chip HBM of the device kind (cloud.google.com/tpu/docs specs)
HBM_BY_KIND = {
    "TPU v4": 32 << 30,
    "TPU v5 lite": 16 << 30,
    "TPU v5": 96 << 30,       # v5p
    "TPU v6 lite": 32 << 30,  # Trillium
}
# Ceiling on the auto-derived anchor cap: beyond this the double-buffered
# pipeline loses its seed/finish overlap (one giant batch serializes) and
# pow-of-two shape quantization gets coarse; measured on the 600-read
# bench flowcell, 1M-anchor batches walk 3.21G window slots vs 2.12G for
# a single 3M batch (batch fragmentation), so the sweet spot is "a few
# batches per flowcell", not "all of HBM"
MAX_AUTO_ANCHORS = 2_000_000


def derive_caps(verbose: int = 1) -> None:
    """Auto capacity model: scale the macro-batch caps to the attached
    device's HBM when the config didn't pin them (plmem_config_batch
    analog).  No-op on CPU backends or when the device can't report its
    memory; never lowers caps below the shipped defaults."""
    global _current
    cfg = _current
    if cfg.caps_explicit:
        return
    try:
        import jax
        dev = jax.devices()[0]
        if dev.platform == "cpu":
            return
        stats = dev.memory_stats() or {}
        hbm = int(stats.get("bytes_limit", 0))
        if hbm <= 0:
            hbm = HBM_BY_KIND.get(dev.device_kind, 0)
    except Exception:
        return
    if hbm <= 0:
        return
    anchors = min(int(hbm * HBM_FRACTION / BYTES_PER_ANCHOR),
                  MAX_AUTO_ANCHORS)
    if anchors <= cfg.max_anchors_batch:
        return
    cfg.max_anchors_batch = anchors
    cfg.max_reads_batch = max(cfg.max_reads_batch,
                              anchors // AVG_ANCHORS_PER_READ)
    if verbose >= 3:
        sys.stderr.write(
            f"[M::tpucfg] auto capacity: {hbm / 2**30:.1f} GiB HBM x "
            f"{HBM_FRACTION} / {BYTES_PER_ANCHOR} B/anchor -> "
            f"max_anchors_batch {anchors}, max_reads_batch "
            f"{cfg.max_reads_batch}\n")


def apply_tpu_config(cfg: TpuConfig) -> None:
    """Install the config into the kernel dispatch + batcher."""
    global _current
    _current = cfg
    from mm2_gb_tpu.ops import chain_tpu
    chain_tpu.WINDOW_CLASSES = tuple(sorted(cfg.window_classes))


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache: fresh CLI processes reuse compiled
    Pallas kernels (~5x faster cold start over the device tunnel).  Opt out
    with MM2TPU_JAX_CACHE=0; override the directory with MM2TPU_JAX_CACHE."""
    import os
    loc = os.environ.get("MM2TPU_JAX_CACHE", "")
    if loc == "0":
        return
    if not loc:
        loc = os.path.join(os.path.expanduser("~"), ".cache",
                           "mm2_gb_tpu", "jaxcache")
    try:
        import jax
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
