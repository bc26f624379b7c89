"""Axon-tunnel liveness helpers.

The TPU in this environment is reached through a shared "axon" tunnel
whose PJRT plugin is registered by a sitecustomize hook on PYTHONPATH.
Two observed failure modes (round-2 VERDICT):

(a) the tunnel stalls for hours, and ANY jax backend init in a process
    with the hook active hangs forever — even with ``JAX_PLATFORMS=cpu``
    exported before interpreter start, because the hook force-sets the
    ``jax_platforms`` config programmatically, overriding the env var;
(b) device wall-clock under load is unbounded (other tenants share the
    chip), so anything that must finish needs a bounded probe first.

These helpers make CPU-only runs immune to (a) and give device runs a
bounded liveness probe for (b).  They are the TPU analog of the
reference's ``cudaCheck`` fatal-error discipline (gpu/hipify.cuh:37-45)
— fail fast and visibly instead of hanging.
"""

from __future__ import annotations

import os
import subprocess
import sys


def force_cpu() -> None:
    """Make this process's jax CPU-only and immune to tunnel stalls.

    Unregisters the axon backend factory and resets the ``jax_platforms``
    config (the sitecustomize hook sets it to ``axon`` at interpreter
    start, which beats the env var).  Must run before the first jax
    backend *initialization* (``jax.devices()`` etc.); importing jax
    itself is safe during a stall.  Idempotent; a no-op when the hook
    isn't installed.
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        from jax._src import xla_bridge
        xla_bridge._backend_factories.pop("axon", None)
    except Exception:
        pass
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def cpu_env(base: dict | None = None) -> dict:
    """Environment for a CPU-only jax subprocess.

    Sets ``MM2TPU_FORCE_CPU=1`` (the package __init__ calls
    :func:`force_cpu` when it sees it) plus ``JAX_PLATFORMS=cpu`` for
    scripts that import jax without importing the package.
    """
    env = dict(base if base is not None else os.environ)
    env["MM2TPU_FORCE_CPU"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    return env


_PROBE_SRC = ("import jax\n"
              "d = jax.devices()\n"
              "print(d[0].platform, len(d))\n")


def probe_device(timeout_s: float = 120.0) -> bool:
    """True if the default jax backend (the tunneled TPU) initializes
    within ``timeout_s``.  Probed in a subprocess so a stalled tunnel
    cannot hang the caller; the result is printed only after the backend
    is actually up, so a True here means real device contact."""
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0 and bool(r.stdout.strip())
