#!/usr/bin/env python
"""Hybrid physics+learned dynamics for the 3-D quadrotor: keep the analytic
SE(3) model and LEARN the model-plant gap — the integrator coarseness
(RK2 @ control period vs RK4 @ fine timestep) plus the rotor-envelope
clamp the model deliberately ignores. This is the production form of the
reference's NN-dynamics roadmap (reference README TODO +
src/controller_base.cpp): physics where it is known, a residual net for
what is not.

Pipeline:
  1. collect transitions from the ground-truth world at the controller's
     cadence, exciting around hover (same excitation as the `miss` tool);
  2. fit `HybridResidualDynamics` = analytic step + MLP residual, with the
     quaternion slice renormalized (models/neural.py);
  3. compare one-step prediction error on HELD-OUT transitions: analytic
     vs hybrid;
  4. run a short closed-loop hover with the hybrid model in the rollout
     (scan backend) to show it drops into the controller unchanged.

Run:  python examples/learn_quadrotor_residual.py
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mppi_gpu_tpu.config import load_config
from mppi_gpu_tpu.controller import MPPIController
from mppi_gpu_tpu.envs import make_jax_world, params_for_config
from mppi_gpu_tpu.models import dynamics_for_config
from mppi_gpu_tpu.models.neural import (
    HybridResidualDynamics,
    fit_residual_dynamics,
    init_mlp_dynamics,
)
from mppi_gpu_tpu.runner import run_closed_loop

HOVER = 7.848  # m·g for the default 0.8 kg body


def collect_transitions(cfg, n: int, seed: int = 0):
    """(x, u, x') at the controller cadence: random near-hover states and
    wrench commands (the envelope the controller actually explores), each
    stepped through the true world's mix→clamp→RK4 for one control period."""
    params = params_for_config(cfg)
    world = make_jax_world(cfg, params)
    phys_steps = max(1, round(cfg.dt / params.timestep))
    key = jax.random.key(seed)

    @jax.jit
    def rollout(key):
        ks = jax.random.split(key, 6)
        p0 = jax.random.uniform(ks[0], (n, 3), minval=-1.0, maxval=1.0)
        # small random attitude: quaternion ~ (1, small vector), normalized
        qv = 0.15 * jax.random.normal(ks[1], (n, 3))
        q0 = jnp.concatenate([jnp.ones((n, 1)), qv], axis=1)
        q0 = q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)
        v0 = jax.random.uniform(ks[2], (n, 3), minval=-1.0, maxval=1.0)
        om0 = jax.random.uniform(ks[3], (n, 3), minval=-1.0, maxval=1.0)
        xs = jnp.concatenate([p0, q0, v0, om0], axis=1)
        # excitation reaches WELL into the rotor-envelope clamp (low
        # collective + corner torques): the analytic-vs-plant gap lives
        # almost entirely there (the unclamped integrator gap is ~1e-4),
        # so the residual net needs data coverage of the clamped regime
        us = jnp.concatenate(
            [
                HOVER + jax.random.uniform(ks[4], (n, 1), minval=-7.0, maxval=5.0),
                jax.random.uniform(ks[5], (n, 3), minval=-1.0, maxval=1.0)
                * jnp.asarray(cfg.max_a[1:]),
            ],
            axis=1,
        )

        def one(x, u):
            s = world.from_x(x, 0.0)
            for _ in range(phys_steps):
                s = world.physics_step(s, u)
            return s.x

        xn = jax.vmap(one)(xs, us)
        return xs, us, xn

    return rollout(key)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--transitions", type=int, default=16384)
    p.add_argument("--fit-steps", type=int, default=4000)
    p.add_argument("--loop-steps", type=int, default=120)
    args = p.parse_args(argv)

    cfg = load_config("configs/quadrotor3d.yaml")
    base = dynamics_for_config(cfg)

    print(f"collecting {args.transitions} transitions from the true world ...")
    xs, us, xn = collect_transitions(cfg, args.transitions)
    n_tr = args.transitions * 3 // 4
    train = (xs[:n_tr], us[:n_tr], xn[:n_tr])
    held = (xs[n_tr:], us[n_tr:], xn[n_tr:])

    def rmse(pred, target):
        return float(jnp.sqrt(jnp.mean(jnp.sum((pred - target) ** 2, axis=-1))))

    err_analytic = rmse(base.step(held[0], held[1]), held[2])

    print("fitting the residual net (analytic part frozen) ...")
    import dataclasses

    mlp = init_mlp_dynamics(
        jax.random.key(1), cfg.state_dim, cfg.action_dim, hidden=(128, 128)
    )
    # standardize the net's inputs: hover thrust ~8 next to rates ~0.1 would
    # park the tanh layers in saturation from step one
    inputs = jnp.concatenate([train[0], train[1]], axis=1)
    mlp = dataclasses.replace(
        mlp,
        in_shift=jnp.mean(inputs, axis=0),
        in_scale=1.0 / (jnp.std(inputs, axis=0) + 1e-6),
    )
    hybrid = HybridResidualDynamics(
        base=base, mlp=mlp,
        unit_norm_slice=(3, 7),  # keep the quaternion unit
    )
    hybrid, losses = fit_residual_dynamics(
        hybrid, train, lr=3e-3, steps=args.fit_steps, whiten=False
    )
    print(f"  loss {float(losses[0]):.6f} -> {float(losses[-1]):.7f}")

    err_hybrid = rmse(hybrid.step(held[0], held[1]), held[2])
    improve = err_analytic / max(err_hybrid, 1e-12)
    print(f"one-step prediction RMSE on {len(held[0])} held-out transitions:")
    print(f"  analytic model : {err_analytic:.5f}")
    print(f"  hybrid model   : {err_hybrid:.5f}  ({improve:.1f}x better)")

    print("closed-loop hover with the HYBRID model in the rollout ...")
    ctrl = MPPIController(cfg, dynamics=hybrid)  # auto-falls back to scan
    res = run_closed_loop(ctrl, max_steps=args.loop_steps)
    goal = np.asarray(cfg.goal[:3])
    d = float(np.linalg.norm(res.xs[-1][:3] - goal))
    print(f"  distance to goal after {args.loop_steps} cycles: {d:.3f} m")

    ok = err_hybrid < err_analytic and np.isfinite(d)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
