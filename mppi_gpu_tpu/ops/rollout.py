"""Batched stochastic rollouts (JAX reference path).

The reference runs one CUDA thread per rollout with a sequential T-loop
(reference src/point_mass.cu:493-508, src/point_mass_gpu.cu:111-121). Here the
whole batch advances together: one `lax.scan` over T whose body is a batched
dynamics step + cost over all K rollouts — XLA fuses each step into a handful
of VPU ops, and the sequential horizon stays on-chip. Trajectories are *not*
materialized on the cost path (the reference keeps the full (K, T+1, s) state
history resident for debugging; here that is the opt-in
:func:`rollout_trajectories`).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from mppi_gpu_tpu.models.base import Dynamics
from mppi_gpu_tpu.ops.cost import Cost

# Unroll factor for the horizon scan. The scan body is a handful of small
# fused VPU ops over (K, ·) tensors, so at large K the loop's fixed
# per-iteration cost is a visible fraction of the solve; unrolling
# amortizes it (identical numerics — unroll only changes code layout).
# Tunable for measurement via MPPI_SCAN_UNROLL.
_UNROLL = max(1, int(os.environ.get("MPPI_SCAN_UNROLL", "1")))


def rollout_costs(
    dyn: Dynamics,
    cost: Cost,
    x0: jax.Array,     # (s,) or (K, s) initial state (shared across rollouts)
    U: jax.Array,      # (T, a) nominal action sequence
    eps: jax.Array,    # (T, K, a) sampled action noise
) -> jax.Array:
    """Total cost per rollout: (K,)."""
    K = eps.shape[1]
    x0 = jnp.broadcast_to(x0, (K, x0.shape[-1])).astype(jnp.float32)

    def body(x, inp):
        u_t, e_t = inp                        # (a,), (K, a)
        x_next = dyn.step(x, u_t + e_t)       # (K, s)
        c = cost.step(x_next, u_t, e_t)       # (K,)
        return x_next, c

    xT, cs = jax.lax.scan(body, x0, (U, eps), unroll=_UNROLL)
    return jnp.sum(cs, axis=0) + cost.final(xT)


def rollout_trajectories(
    dyn: Dynamics,
    cost: Cost,
    x0: jax.Array,
    U: jax.Array,
    eps: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Debug path: full state history. Returns (costs (K,), xs (T+1, K, s))."""
    K = eps.shape[1]
    x0 = jnp.broadcast_to(x0, (K, x0.shape[-1])).astype(jnp.float32)

    def body(x, inp):
        u_t, e_t = inp
        x_next = dyn.step(x, u_t + e_t)
        c = cost.step(x_next, u_t, e_t)
        return x_next, (c, x_next)

    xT, (cs, xs) = jax.lax.scan(body, x0, (U, eps))
    xs = jnp.concatenate([x0[None], xs], axis=0)
    return jnp.sum(cs, axis=0) + cost.final(xT), xs
