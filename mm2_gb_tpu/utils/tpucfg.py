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
    window_classes: tuple = (512, 768, 5120)
    lanes: int = 128            # VPU lane width (fixed by hardware)
    tile: int = 128             # dst tile rows per kernel step
    # macro-batch caps (max_total_n / max_read analogs, plmem.cu:473-540)
    # consumed by models.pipeline._acc_batches; a batch is cut (and the
    # overflow read spilled to the next one, map.c:886-922) when either
    # cap would be exceeded
    max_anchors_batch: int = 1_000_000
    max_reads_batch: int = 200_000
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
    return cfg


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
