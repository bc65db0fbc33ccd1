"""Learned-dynamics MPPI: the NN surrogate drops into the same rollout/solve
(the extension the reference planned: README TODO + controller_base.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_gpu_tpu.config import MPPIConfig
from mppi_gpu_tpu.controller import MPPIController
from mppi_gpu_tpu.models.neural import MLPDynamics, fit_mlp_dynamics, init_mlp_dynamics
from mppi_gpu_tpu.models.point_mass import PointMassLTI


def make_cfg(K=128, T=15, a=1):
    return MPPIConfig(
        env="t", samples=K, state_dim=2 * a, action_dim=a, horizon=T, dt=0.1,
        lambda_=1.0, noise=tuple([0.25] * a), init_act=tuple([0.0] * a),
        max_a=tuple([1.0] * a), goal=tuple([1.0] * a + [0.0] * a),
        cost_type="quadratic", cost_w=tuple([1.0] * a + [0.5] * a),
    )


def test_fresh_mlp_is_identity():
    m = init_mlp_dynamics(jax.random.key(0), 2, 1)
    x = jnp.asarray([[0.3, -0.2]])
    u = jnp.asarray([[0.5]])
    np.testing.assert_allclose(np.asarray(m.step(x, u)), np.asarray(x), atol=1e-7)


@pytest.mark.slow
def test_mlp_learns_lti_dynamics():
    """Fit the surrogate on LTI transitions, then verify one-step prediction
    error is small — the 'learned model inside the rollout' workflow."""
    dyn = PointMassLTI.create(0.1, 1)
    key = jax.random.key(1)
    xs = jax.random.normal(key, (4096, 2))
    us = jax.random.normal(jax.random.fold_in(key, 1), (4096, 1))
    xn = dyn.step(xs, us)

    m0 = init_mlp_dynamics(jax.random.key(2), 2, 1, hidden=(64, 64))
    m, losses = fit_mlp_dynamics(m0, (xs, us, xn), lr=3e-3, steps=800)
    assert float(losses[-1]) < float(losses[0]) * 0.05
    pred = m.step(xs[:100], us[:100])
    err = float(jnp.abs(pred - xn[:100]).max())
    assert err < 0.05, f"max one-step error {err}"


@pytest.mark.slow
def test_mppi_with_mlp_dynamics_runs_and_steers():
    """MPPI over the learned model must still solve the control problem
    against the true LTI plant."""
    cfg = make_cfg()
    lti = PointMassLTI.create(cfg.dt, 1)
    key = jax.random.key(3)
    xs = 2 * jax.random.normal(key, (8192, 2))
    us = 2 * jax.random.normal(jax.random.fold_in(key, 1), (8192, 1))
    m0 = init_mlp_dynamics(jax.random.key(4), 2, 1, hidden=(64, 64))
    m, _ = fit_mlp_dynamics(m0, (xs, us, lti.step(xs, us)), lr=3e-3, steps=800)

    ctrl = MPPIController(cfg, dynamics=m)
    x = jnp.zeros(2)
    U = ctrl.init_action_seq()
    for step in range(60):
        res = ctrl.solve_auto(x, U, key, step)
        x = lti.step(x, res.action)   # plant = true dynamics
        U = res.u_next
    assert abs(float(x[0]) - 1.0) < 0.25, f"final state {x}"


def test_hybrid_residual_untrained_equals_analytic():
    """Zero-init residual net: the hybrid IS the analytic model (and the
    quaternion renorm slice is a no-op on an already-unit quaternion)."""
    import dataclasses

    from mppi_gpu_tpu.models.neural import HybridResidualDynamics
    from mppi_gpu_tpu.models.quadrotor3d import Quadrotor3DDynamics

    base = Quadrotor3DDynamics.create(1 / 60)
    mlp = init_mlp_dynamics(jax.random.key(0), 13, 4, hidden=(32,))
    mlp = dataclasses.replace(
        mlp, in_shift=jnp.zeros(17), in_scale=jnp.ones(17)
    )
    h = HybridResidualDynamics(base=base, mlp=mlp, unit_norm_slice=(3, 7))
    x = jnp.zeros(13).at[3].set(1.0).at[7].set(0.4).at[11].set(0.3)
    u = jnp.asarray([7.0, 0.05, -0.03, 0.01])
    np.testing.assert_allclose(
        np.asarray(h.step(x, u)), np.asarray(base.step(x, u)), atol=1e-6
    )


@pytest.mark.slow
def test_hybrid_residual_learns_rotor_clamp():
    """The hybrid fit must close the quadrotor model-plant gap (which is
    almost entirely the rotor-envelope clamp) on held-out transitions, and
    keep the quaternion unit."""
    import dataclasses

    from mppi_gpu_tpu.config import load_config
    from mppi_gpu_tpu.models import dynamics_for_config
    from mppi_gpu_tpu.models.neural import (
        HybridResidualDynamics,
        fit_residual_dynamics,
    )

    sys_path_root = __import__("os").path.join(
        __import__("os").path.dirname(__file__), ".."
    )
    import sys

    sys.path.insert(0, sys_path_root)
    from examples.learn_quadrotor_residual import collect_transitions

    cfg = load_config("configs/quadrotor3d.yaml")
    base = dynamics_for_config(cfg)
    xs, us, xn = collect_transitions(cfg, 2048)
    train = (xs[:1536], us[:1536], xn[:1536])
    held = (xs[1536:], us[1536:], xn[1536:])

    inputs = jnp.concatenate([train[0], train[1]], axis=1)
    mlp = init_mlp_dynamics(jax.random.key(1), 13, 4, hidden=(64, 64))
    mlp = dataclasses.replace(
        mlp,
        in_shift=jnp.mean(inputs, axis=0),
        in_scale=1.0 / (jnp.std(inputs, axis=0) + 1e-6),
    )
    h0 = HybridResidualDynamics(base=base, mlp=mlp, unit_norm_slice=(3, 7))
    h, losses = fit_residual_dynamics(h0, train, lr=3e-3, steps=1500, whiten=False)
    assert float(losses[-1]) < float(losses[0])

    def rmse(m):
        d = m.step(held[0], held[1]) - held[2]
        return float(jnp.sqrt(jnp.mean(jnp.sum(d**2, axis=-1))))

    e_base, e_hyb = rmse(base), rmse(h)
    assert e_hyb < 0.6 * e_base, (e_base, e_hyb)
    # quaternion stays unit through the learned correction
    qn = jnp.sum(h.step(held[0], held[1])[:, 3:7] ** 2, axis=1)
    np.testing.assert_allclose(np.asarray(qn), 1.0, atol=1e-5)
