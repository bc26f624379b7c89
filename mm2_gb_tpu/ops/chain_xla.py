"""Pure-XLA chaining step (no Pallas) — portability/dryrun fallback.

Same forward-DP relaxation as ops/chain_tpu.py's bucket kernel, expressed
as jit-compilable lax ops over value-carried arrays.  Used where Pallas is
unavailable (CPU mesh dry-runs, debugging) and as the shard_map body for
the multi-chip data-parallel chaining step (reads are embarrassingly
parallel across chips — SURVEY.md §5.8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mm2_gb_tpu.ops.chain_tpu import _pair_score


@functools.partial(jax.jit, static_argnames=("L", "W", "max_dist_x",
                                             "max_dist_y", "bw", "cg", "cs"))
def chain_bucket_xla(x, y, span, rng, *, L, W, max_dist_x, max_dist_y,
                     bw, cg, cs):
    """Forward DP over [L+W, S] packed segments; returns (f, p).

    Bit-identical math to the Pallas bucket kernel.
    """
    cg = jnp.float32(cg)
    cs = jnp.float32(cs)
    S = x.shape[1]
    f0 = span.astype(jnp.int32)
    p0 = jnp.zeros_like(x)
    d_off = jax.lax.broadcasted_iota(jnp.int32, (W, S), 0)

    def step(t, carry):
        f, p = carry
        xp = jax.lax.dynamic_slice_in_dim(x, t, 1, 0)
        yp = jax.lax.dynamic_slice_in_dim(y, t, 1, 0)
        sp = jax.lax.dynamic_slice_in_dim(span, t, 1, 0)
        fp = jax.lax.dynamic_slice_in_dim(f, t, 1, 0)
        rt = jax.lax.dynamic_slice_in_dim(rng, t, 1, 0)
        xs = jax.lax.dynamic_slice_in_dim(x, t + 1, W, 0)
        ys = jax.lax.dynamic_slice_in_dim(y, t + 1, W, 0)
        ss = jax.lax.dynamic_slice_in_dim(span, t + 1, W, 0)
        fw = jax.lax.dynamic_slice_in_dim(f, t + 1, W, 0)
        pw = jax.lax.dynamic_slice_in_dim(p, t + 1, W, 0)
        tot, valid = _pair_score(xs, ys, ss, xp, yp, sp, fp,
                                 max_dist_x, max_dist_y, bw, cg, cs)
        ok = valid & (d_off < rt) & (tot >= fw) & (tot != ss)
        f = jax.lax.dynamic_update_slice_in_dim(
            f, jnp.where(ok, tot, fw), t + 1, 0)
        p = jax.lax.dynamic_update_slice_in_dim(
            p, jnp.where(ok, d_off + 1, pw), t + 1, 0)
        return f, p

    f, p = jax.lax.fori_loop(0, L, step, (f0, p0))
    return f, p
