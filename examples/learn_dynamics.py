#!/usr/bin/env python
"""End-to-end learned-dynamics MPPI: the extension the reference planned but
never built (its vestigial TensorFlow controller sketch,
reference src/controller_base.cpp + README TODO).

Pipeline:
  1. collect transitions from the ground-truth world by driving it with
     random actions (the same excitation the reference's `miss` harness uses);
  2. fit the residual-MLP surrogate on (x, u, x') pairs;
  3. run closed-loop MPPI with the LEARNED model in the rollout (scan
     backend — the fused kernels are for the analytic LTI model);
  4. compare against MPPI with the analytic model on the same episode.

Run:  python examples/learn_dynamics.py [-c configs/point_mass2d.yaml]
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
from mppi_gpu_tpu.envs.params import world_params_for_config
from mppi_gpu_tpu.envs.point_mass_world import PointMassWorld
from mppi_gpu_tpu.models.neural import fit_mlp_dynamics, init_mlp_dynamics
from mppi_gpu_tpu.runner import run_closed_loop


def collect_transitions(cfg, n: int, seed: int = 0):
    """Random-excitation transitions at the CONTROLLER's horizon cadence:
    each sample is (x_t, u, x_{t+cfg.dt}) from the true world, with u held
    for the full model step dt — so the surrogate learns exactly the map
    MPPI applies per horizon step (unlike the analytic LTI model, whose
    dt-vs-world mismatch is deliberate)."""
    params = world_params_for_config(cfg)
    world = PointMassWorld(params)
    key = jax.random.key(seed)
    # raw physics steps per model step (bypasses simulate()'s episode clock,
    # which would freeze the world after sim_end during long excitation runs)
    phys_steps = max(1, round(cfg.dt / params.timestep))

    @jax.jit
    def rollout(key):
        # IID coverage of the reachable state-action box (a random WALK would
        # drift to the joint limits and oversample the clamped regime)
        kq, kqd, ku = jax.random.split(key, 3)
        a = cfg.action_dim
        q0 = jax.random.uniform(kq, (n, a), minval=-1.2, maxval=1.2)
        qd0 = jax.random.uniform(kqd, (n, a), minval=-1.5, maxval=1.5)
        us = jax.random.uniform(ku, (n, a), minval=-1.0, maxval=1.0)

        def one(q, qd, u):
            ws = world.reset()._replace(q=q, qd=qd)
            for _ in range(phys_steps):  # hold u for one model step of sim time
                ws = world.physics_step(ws, u)
            return ws.x

        xns = jax.vmap(one)(q0, qd0, us)
        xs = jnp.concatenate([q0, qd0], axis=-1)
        return xs, us, xns

    return rollout(key)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", default="configs/point_mass2d.yaml")
    p.add_argument("--transitions", type=int, default=2000)
    p.add_argument("--fit-steps", type=int, default=800)
    p.add_argument("--episode-steps", type=int, default=120)
    args = p.parse_args(argv)

    cfg = load_config(args.config)

    print(f"collecting {args.transitions} transitions from the true world ...")
    xs, us, xns = collect_transitions(cfg, args.transitions)

    print("fitting residual MLP surrogate ...")
    mlp0 = init_mlp_dynamics(
        jax.random.key(1), cfg.state_dim, cfg.action_dim, hidden=(128, 128)
    )
    mlp, losses = fit_mlp_dynamics(
        mlp0, (xs, us, xns), lr=3e-3, steps=args.fit_steps
    )
    print(f"  loss {float(losses[0]):.5f} -> {float(losses[-1]):.6f}")

    def final_err(res):
        goal = np.asarray(cfg.goal)[: cfg.action_dim]
        return float(np.linalg.norm(res.final_state[: cfg.action_dim] - goal))

    print("closed loop with the ANALYTIC model ...")
    res_lti = run_closed_loop(MPPIController(cfg), max_steps=args.episode_steps)
    print(f"  final distance to goal: {final_err(res_lti):.4f} m")

    print("closed loop with the LEARNED model ...")
    ctrl_mlp = MPPIController(cfg, dynamics=mlp, rollout_backend="scan")
    res_mlp = run_closed_loop(ctrl_mlp, max_steps=args.episode_steps)
    print(f"  final distance to goal: {final_err(res_mlp):.4f} m")

    # the learned model was trained on the true world, so it should be at
    # least competitive with the deliberately-mismatched analytic model
    print(
        "learned-model controller is "
        + ("BETTER" if final_err(res_mlp) <= final_err(res_lti) else "worse")
        + " than the analytic-model controller on this episode"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
