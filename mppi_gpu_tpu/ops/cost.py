"""Rollout cost functions.

Semantics of :class:`QuadraticCost` match the reference's `Cost`
(reference src/cost.cu:42-64):

    step(x', u, ε)  = λ · Σ_i u_i · Σ⁻¹_ii · ε_i  +  Σ_j w_j (x'_j − g_j)²
    final(x)        =                              Σ_j w_j (x_j  − g_j)²

where ``x'`` is the state *after* applying ``u + ε`` (the reference evaluates
step cost on x_{t+1}, src/point_mass_gpu.cu:107). The total rollout cost is
``Σ_{t<T} step(x_{t+1}, u_t, ε_t) + final(x_T)`` — note the reference counts
the terminal state cost twice (once in the last step cost, once in final); we
preserve that for parity.

Unlike the reference (which hardcodes Σ⁻¹ = I, src/point_mass_gpu.cu:58-61,
and λ = 1, src/point_mass.cu:53), both are wired parameters here.

Costs are pytree dataclasses: new cost types register via
``@register_cost("name")`` and become selectable from YAML ``cost.type``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Protocol, runtime_checkable

import jax
import jax.numpy as jnp
from jax.tree_util import register_dataclass

from mppi_gpu_tpu.config import MPPIConfig


@runtime_checkable
class Cost(Protocol):
    def step(self, x_next: jax.Array, u: jax.Array, eps: jax.Array) -> jax.Array:
        """(..., s), (a,) or (..., a), (..., a) → (...) per-sample step cost."""

    def final(self, x: jax.Array) -> jax.Array:
        """(..., s) → (...) terminal cost."""


@register_dataclass
@dataclass(frozen=True)
class QuadraticCost:
    w: jax.Array        # (s,) state-cost diagonal
    goal: jax.Array     # (s,)
    lambda_: jax.Array  # scalar temperature
    inv_s: jax.Array    # (a,) diagonal of Σ⁻¹

    def step(self, x_next: jax.Array, u: jax.Array, eps: jax.Array) -> jax.Array:
        ctrl = self.lambda_ * jnp.sum(u * self.inv_s * eps, axis=-1)
        d = x_next - self.goal
        return ctrl + jnp.sum(d * self.w * d, axis=-1)

    def final(self, x: jax.Array) -> jax.Array:
        d = x - self.goal
        return jnp.sum(d * self.w * d, axis=-1)


CostFactory = Callable[[MPPIConfig], Cost]
COST_REGISTRY: dict[str, CostFactory] = {}


def register_cost(name: str) -> Callable[[CostFactory], CostFactory]:
    def deco(fn: CostFactory) -> CostFactory:
        COST_REGISTRY[name] = fn
        return fn

    return deco


@register_cost("quadratic")
def _make_quadratic(cfg: MPPIConfig) -> QuadraticCost:
    if cfg.inv_sigma == "from-noise":
        inv_s = 1.0 / (jnp.asarray(cfg.noise, jnp.float32) ** 2)
    else:  # reference parity: Σ⁻¹ = I
        inv_s = jnp.ones((cfg.action_dim,), jnp.float32)
    return QuadraticCost(
        w=jnp.asarray(cfg.cost_w, jnp.float32),
        goal=jnp.asarray(cfg.goal, jnp.float32),
        lambda_=jnp.float32(cfg.lambda_),
        inv_s=inv_s,
    )


def make_cost(cfg: MPPIConfig) -> Cost:
    try:
        factory = COST_REGISTRY[cfg.cost_type]
    except KeyError:
        raise ValueError(
            f"unknown cost.type '{cfg.cost_type}'; known: {sorted(COST_REGISTRY)}"
        ) from None
    return factory(cfg)
