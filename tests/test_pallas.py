"""Tests for the fused Pallas rollout kernels (ops/pallas_rollout.py).

Two tiers, mirroring the reference's kernel-vs-CPU-oracle pattern
(reference src/test.cu:11-59, 97-229):

  * CPU tier (always runs): the Mosaic interpreter stubs the on-chip PRNG to
    zero bits, which Box-Muller maps to ε=0 exactly — so the interpreted
    kernel must reproduce the *deterministic* part bit-for-bit: S_k equals
    the scan-path cost of the noise-free nominal trajectory for every k, and
    ΔU is exactly 0.
  * TPU tier (skips without a chip): subprocess runs
    tests/_pallas_tpu_check.py on the real TPU — kernel A/B cross-check via
    one-hot weights against the scan oracle, noise statistics, and the full
    fused controller solve.
"""

from __future__ import annotations

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_gpu_tpu.models.point_mass import PointMassLTI
from mppi_gpu_tpu.ops import pallas_rollout as pr
from mppi_gpu_tpu.ops.cost import QuadraticCost
from mppi_gpu_tpu.ops.rollout import rollout_costs


def _setup(A=2, T=12, K=300):
    dyn = PointMassLTI.create(0.1, A)
    cost = QuadraticCost(
        w=jnp.arange(1.0, 2 * A + 1.0),
        goal=jnp.linspace(-1.0, 1.0, 2 * A),
        lambda_=jnp.float32(1.2),
        inv_s=jnp.full((A,), 0.8),
    )
    x0 = jnp.linspace(0.1, -0.1, 2 * A)
    U = 0.1 * jnp.cos(jnp.arange(T * A, dtype=jnp.float32)).reshape(T, A)
    sigma = jnp.full((A,), 0.25)
    return dyn, cost, x0, U, sigma


@pytest.mark.parametrize("A,K", [(1, 64), (2, 300), (3, 513)])
def test_interpret_zero_noise_matches_nominal_cost(A, K):
    """Interpreter PRNG gives ε=0 ⇒ every rollout IS the nominal trajectory;
    kernel A must match the scan path's zero-noise cost exactly."""
    T = 12
    dyn, cost, x0, U, sigma = _setup(A, T, K)
    key = jax.random.key(0)
    S = pr.pallas_rollout_costs(
        dyn, cost, x0, U, key, sigma, K=K, interpret=True
    )
    plan = pr.make_plan(K, T, A)
    S_nominal = float(rollout_costs(dyn, cost, x0, U, jnp.zeros((T, 1, A)))[0])
    np.testing.assert_allclose(np.asarray(S[:K]), S_nominal, rtol=2e-5)
    assert np.all(np.asarray(S[K:]) > 1e37)  # padding slots carry BIG
    assert S.shape == (plan.Kpad,)


def test_interpret_weighted_update_zero_noise_is_zero():
    dyn, cost, x0, U, sigma = _setup()
    plan = pr.make_plan(300, U.shape[0], U.shape[1])
    w = jnp.zeros((plan.Kpad,), jnp.float32).at[:300].set(1.0 / 300)
    dU = pr.pallas_weighted_update(
        dyn, cost, x0, U, jax.random.key(0), sigma, w, K=300, interpret=True
    )
    assert dU.shape == U.shape
    np.testing.assert_array_equal(np.asarray(dU), 0.0)


def test_check_supported_rejects_custom_models():
    from mppi_gpu_tpu.models.neural import init_mlp_dynamics

    dyn, cost, *_ = _setup()
    mlp = init_mlp_dynamics(jax.random.key(0), 4, 2)
    with pytest.raises(TypeError):
        pr.check_supported(mlp, cost)
    pr.check_supported(dyn, cost)  # LTI + quadratic OK


def test_plan_geometry():
    plan = pr.make_plan(K=10_000, T=200, action_dim=3)
    assert plan.G == 2 and plan.Kpad >= 10_000 and plan.Kpad % (plan.G * plan.KB) == 0
    assert plan.Tpad % 128 == 0 and plan.Tpad >= 200
    plan1 = pr.make_plan(K=8, T=4, action_dim=1)
    assert plan1.G == 8 and plan1.Kpad >= 8


def test_pallas_on_real_tpu():
    """Full kernel semantics on hardware; skips cleanly when no TPU."""
    script = os.path.join(os.path.dirname(__file__), "_pallas_tpu_check.py")
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    try:
        out = subprocess.run(
            [sys.executable, script],
            capture_output=True, text=True, timeout=900, env=env,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("TPU check timed out (tunnel unavailable?)")
    if "SKIP_NO_TPU" in out.stdout:
        pytest.skip("no TPU attached")
    assert "PALLAS_TPU_OK" in out.stdout, (
        f"stdout:\n{out.stdout[-2000:]}\nstderr:\n{out.stderr[-2000:]}"
    )


@pytest.mark.parametrize("A,K,T,ou", [(2, 300, 12, 0.0), (3, 513, 7, 0.6), (1, 64, 20, 0.0)])
def test_interpret_testmode_full_kernel_math(A, K, T, ou):
    """Deterministic pseudo-noise mode: the interpreter's stubbed PRNG is
    replaced by a host-replicable pattern, so the ENTIRE kernel math —
    group packing, one-hot U extraction, dynamics, cost accumulation,
    masking, OU recursion, the weighted update — is verified on CPU against
    the scan-path oracle with the exact same noise."""
    dyn, cost, x0, U, sigma = _setup(A, T, K)
    key = jax.random.key(0)
    plan = pr.make_plan(K, T, A, ou_beta=ou, testmode=True)
    eps_ref = pr.fake_noise_tensor(plan, sigma, ou_beta=ou)  # (T, Kpad, A)

    S = pr.pallas_rollout_costs(
        dyn, cost, x0, U, key, sigma, K=K, ou_beta=ou, interpret=True, testmode=True
    )
    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(S[:K]), np.asarray(S_oracle), rtol=3e-5)
    assert np.all(np.asarray(S[K:]) > 1e37)

    w = jax.random.dirichlet(key, jnp.ones((K,)))
    w_pad = jnp.zeros((plan.Kpad,)).at[:K].set(w)
    dU = pr.pallas_weighted_update(
        dyn, cost, x0, U, key, sigma, w_pad, K=K, ou_beta=ou,
        interpret=True, testmode=True,
    )
    dU_oracle = jnp.einsum("tka,k->ta", eps_ref[:, :K, :], w)
    np.testing.assert_allclose(np.asarray(dU), np.asarray(dU_oracle), rtol=2e-4, atol=1e-6)


def test_interpret_testmode_fused_solve():
    dyn, cost, x0, U, sigma = _setup(2, 10, 300)
    key, lam = jax.random.key(0), jnp.float32(1.1)
    plan = pr.make_plan(300, 10, 2, testmode=True)
    eps_ref = pr.fake_noise_tensor(plan, sigma)
    Sf, dUf = pr.pallas_fused_solve_core(
        dyn, cost, x0, U, key, sigma, lam, K=300, testmode=True, interpret=True
    )
    from mppi_gpu_tpu.ops.softmin import softmin_weights

    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :300, :])
    np.testing.assert_allclose(np.asarray(Sf[:300]), np.asarray(S_oracle), rtol=3e-5)
    sm = softmin_weights(Sf, lam)
    dU_oracle = jnp.einsum("tka,k->ta", eps_ref[:, :300, :], sm.weights[:300])
    np.testing.assert_allclose(np.asarray(dUf), np.asarray(dU_oracle), rtol=2e-4, atol=1e-6)
