"""Dynamics interface.

The reference couples dynamics, sampling and cost in one device class
(`PointMassModelGpu`, reference include/point_mass_gpu.hpp:19-92). Here the
dynamics model is an independent pytree with a single pure method so that

  * MPPI can roll out *any* model (analytic LTI, neural surrogate, ...) —
    the extension the reference planned but never built (reference
    README TODO + src/controller_base.cpp);
  * the same model object works under jit / scan / shard_map / Pallas-driven
    paths without modification.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import jax


@runtime_checkable
class Dynamics(Protocol):
    """A discrete-time dynamics model ``x_{t+1} = f(x_t, u_t)``.

    ``step`` must be pure, traceable, and broadcast over leading batch dims:
    ``x: (..., state_dim)``, ``u: (..., action_dim)`` → ``(..., state_dim)``.
    """

    state_dim: int
    action_dim: int

    def step(self, x: jax.Array, u: jax.Array) -> jax.Array:
        ...
