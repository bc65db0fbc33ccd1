"""Time-correlated (OU) control noise: e_t = β e_{t−1} + √(1−β²) ν_t.
Marginals must stay N(0, σ²); lag-1 autocorrelation must be ≈ β."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_gpu_tpu.config import ConfigError, load_config
from mppi_gpu_tpu.controller import MPPIController, sample_noise

CFG = "configs/mppi-config-test.yaml"


def _autocorr1(eps: np.ndarray) -> float:
    a, b = eps[:-1].ravel(), eps[1:].ravel()
    return float(np.corrcoef(a, b)[0, 1])


def test_ou_statistics():
    eps = np.asarray(
        sample_noise(jax.random.key(0), 200, 256, 2, jnp.float32(0.5), ou_beta=0.7)
    )
    assert abs(eps.std() - 0.5) < 0.02          # stationary marginal σ
    assert abs(_autocorr1(eps) - 0.7) < 0.05    # lag-1 autocorrelation = β
    # iid control case
    eps0 = np.asarray(
        sample_noise(jax.random.key(0), 200, 256, 2, jnp.float32(0.5), ou_beta=0.0)
    )
    assert abs(_autocorr1(eps0)) < 0.05


def test_ou_with_antithetic_keeps_mirror():
    eps = np.asarray(
        sample_noise(
            jax.random.key(1), 50, 64, 1, jnp.float32(1.0),
            antithetic=True, ou_beta=0.5,
        )
    )
    np.testing.assert_array_equal(eps[:, 32:], -eps[:, :32])
    assert abs(_autocorr1(eps) - 0.5) < 0.1


def test_ou_solve_runs():
    cfg = load_config(CFG).replace(samples=64, noise_beta=0.6)
    ctrl = MPPIController(cfg, rollout_backend="scan")
    res = ctrl.solve(jnp.zeros((cfg.state_dim,)), ctrl.init_action_seq(), ctrl.init_key())
    assert np.all(np.isfinite(np.asarray(res.action)))


def test_noise_beta_validation():
    with pytest.raises(ConfigError, match="noise-beta"):
        load_config(CFG).replace(noise_beta=1.0)
    with pytest.raises(ConfigError, match="noise-beta"):
        load_config(CFG).replace(noise_beta=-0.1)
