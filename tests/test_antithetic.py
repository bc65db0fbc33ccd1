"""Antithetic sampling: mirrored (ε, −ε) rollout pairs — same marginal
distribution, lower-variance update, half the PRNG work."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_gpu_tpu.config import ConfigError, MPPIConfig, load_config
from mppi_gpu_tpu.controller import MPPIController, sample_noise

CFG = "configs/mppi-config-test.yaml"


def test_sample_noise_mirrored_pairs():
    eps = sample_noise(
        jax.random.key(0), T=7, K=10, action_dim=2,
        sigma=jnp.asarray([0.3, 0.5]), antithetic=True,
    )
    assert eps.shape == (7, 10, 2)
    np.testing.assert_array_equal(np.asarray(eps[:, 5:]), -np.asarray(eps[:, :5]))
    # marginal std still matches sigma — checked at a sample size where the
    # estimator noise (σ/√2n) is far inside the tolerance
    big = sample_noise(
        jax.random.key(0), T=50, K=2000, action_dim=2,
        sigma=jnp.asarray([0.3, 0.5]), antithetic=True,
    )
    np.testing.assert_allclose(
        np.asarray(big).std(axis=(0, 1)), [0.3, 0.5], rtol=0.03
    )


def test_antithetic_solve_runs_and_mean_eps_cancels():
    cfg = load_config(CFG).replace(samples=64, antithetic=True)
    ctrl = MPPIController(cfg, rollout_backend="scan")
    x = jnp.zeros((cfg.state_dim,))
    res = ctrl.solve(x, ctrl.init_action_seq(), ctrl.init_key())
    assert np.all(np.isfinite(np.asarray(res.action)))
    assert abs(float(jnp.sum(res.info.weights)) - 1.0) < 1e-4


def test_antithetic_requires_even_K():
    with pytest.raises(ConfigError):
        load_config(CFG).replace(samples=7, antithetic=True)
