"""mm2-gb-tpu: a TPU-native long-read mapper.

A from-scratch reimplementation of the capabilities of minimap2 v2.24 +
mm2-gb (GPU segmented chaining), designed for TPU hardware:

- host layer (NumPy/C++): sequence I/O, minimizer sketching, sorted-array
  minimizer index, hit post-processing, PAF/SAM output;
- device layer (JAX/XLA/Pallas): segmented anchor chaining (range selection +
  forward DP relaxation) and base-level alignment kernels;
- parallel layer (jax.sharding/pjit): data-parallel read mapping over a
  device mesh with deterministic output merging.

The byte-level accuracy contract is inherited from mm2-gb: PAF output must
be identical to minimap2 v2.24 run with --max-chain-skip=infinity
(reference README.md "Accuracy evaluation").
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("MM2TPU_FORCE_CPU"):
    # Harden CPU-only subprocesses against axon-tunnel stalls: the
    # sitecustomize hook force-sets jax_platforms=axon, so env vars alone
    # don't protect a child process (see utils/tunnel.py).
    from mm2_gb_tpu.utils.tunnel import force_cpu as _force_cpu
    _force_cpu()

from mm2_gb_tpu.utils.opts import IndexOptions, MapOptions, set_preset

__all__ = [
    "IndexOptions",
    "MapOptions",
    "set_preset",
    "__version__",
]
