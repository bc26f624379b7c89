"""Multi-chip / multi-host parallel mapping (SURVEY.md §5.8).

The reference is strictly single-node/single-GPU; this layer is the
TPU-native scaling design built new:

- mesh axes ('host', 'chip'); the minimizer index is replicated (it is
  small relative to HBM for typical references) while read batches are
  data-parallel sharded across all chips;
- chaining is embarrassingly parallel across reads/segments, so the hot
  loop has NO inter-chip communication; only per-read chain summaries
  return to hosts, and final PAF records merge deterministically by the
  global read id assigned at ingest (the same merge key the reference
  uses for its output ordering, map.c:1284-1285).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_chain_step(mesh: Mesh, x, y, span, rng, *, L, W, max_dist_x,
                       max_dist_y, bw, cg, cs):
    """Data-parallel chaining over packed segment lanes.

    Lanes (segments) are sharded over the mesh's data axis; each chip runs
    the forward-DP relaxation on its shard with zero collectives in the
    hot loop.  Returns (f, p) with the same sharding.
    """
    from mm2_gb_tpu.ops.chain_xla import chain_bucket_xla

    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(None, axis))

    @functools.partial(jax.jit,
                       in_shardings=(sh, sh, sh, sh),
                       out_shardings=(sh, sh))
    def step(x, y, span, rng):
        return chain_bucket_xla(x, y, span, rng, L=L, W=W,
                                max_dist_x=max_dist_x,
                                max_dist_y=max_dist_y, bw=bw, cg=cg, cs=cs)

    return step(x, y, span, rng)


def merge_paf_shards(shards: list[list[tuple[int, str]]]) -> list[str]:
    """Deterministic merge of per-host PAF shards by global read id."""
    allrecs = [rec for shard in shards for rec in shard]
    allrecs.sort(key=lambda t: t[0])
    return [line for _, line in allrecs]
