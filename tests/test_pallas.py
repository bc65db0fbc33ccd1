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


def test_onepass_longT_eligibility_and_u3():
    """ADVICE round 3: (a) the antithetic halved-stage eligibility must be
    computed from the raw byte quotient BEFORE gran-flooring (T=1400 anti
    used to silently fall back to two-pass); (b) one-pass plans near the
    VMEM ceiling must account for the lane-replicated U table — at long T
    the plan drops it (u3=False) and the kernel one-hot-extracts U[t]."""
    p = pr.make_plan(100_000, 1400, 2, antithetic=True)
    assert p.onepass and not p.planar
    assert not p.u3  # stage (~11 MB) + U table (~5.8 MB) would exceed VMEM
    assert p.KB * (p.Tc * 8 * 4 // 2) <= 15 * 2**20  # halved stage fits ceil
    # iid at the same horizon: stage fits only without the U table
    p2 = pr.make_plan(100_000, 1400, 2)
    assert p2.onepass and not p2.u3
    # far beyond VMEM even with the halved stage: two-pass fallback
    assert not pr.make_plan(100_000, 4000, 2, antithetic=True).onepass
    # headline plans are untouched: U table kept, swept tile widths
    assert pr.make_plan(100_000, 200, 2).u3
    p3 = pr.make_plan(100_000, 200, 3)
    assert p3.planar and p3.u3 and p3.KB == 1792


def test_onepass_no_u3_kernel_matches_oracle(monkeypatch):
    """End-to-end one-pass solve on a u3-less plan (the long-T form), at
    test scale by shrinking the budget knobs: the one-hot U[t] extraction
    must give the identical solve as the oracle fed the host-twin noise."""
    from mppi_gpu_tpu.ops.softmin import softmin_weights

    monkeypatch.setenv("MPPI_PALLAS_EPS_VMEM_MB", "0.5")
    monkeypatch.setenv("MPPI_PALLAS_VMEM_CEIL_MB", "0.75")
    A, T, K = 2, 64, 300
    dyn, cost, x0, U, sigma = _setup(A, T, K)
    key, lam = jax.random.key(3), jnp.float32(1.1)
    plan = pr.make_plan(K, T, A, testmode=True)
    assert plan.onepass and not plan.u3 and plan.KB == 256
    eps_ref = pr.fake_noise_tensor(plan, sigma, key=key)
    Sf, dUf = pr.pallas_fused_solve_core(
        dyn, cost, x0, U, key, sigma, lam, K=K, testmode=True, interpret=True
    )
    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(Sf[:K]), np.asarray(S_oracle), rtol=3e-5)
    sm = softmin_weights(Sf, lam)
    dU_oracle = jnp.einsum("tka,k->ta", eps_ref[:, :K, :], sm.weights[:K])
    np.testing.assert_allclose(
        np.asarray(dUf), np.asarray(dU_oracle), rtol=2e-4, atol=1e-6
    )


@pytest.mark.hardware
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


@pytest.mark.parametrize("A,K,T,ou", [(2, 300, 12, 0.0), (3, 514, 9, 0.5)])
def test_interpret_testmode_antithetic(A, K, T, ou):
    """Antithetic testmode: the anti-mirror/padding interaction — the
    subtlest indexing in the kernel (_lane_rank pairing, anti_rank_perm) —
    verified on CPU, not just on hardware. The host twin mirrors lanes
    [KB/2, KB) exactly like the kernel, so S and ΔU must match the scan
    oracle fed the rank-ordered (ε, −ε) stream."""
    dyn, cost, x0, U, sigma = _setup(A, T, K)
    key = jax.random.key(3)
    plan = pr.make_plan(K, T, A, antithetic=True, ou_beta=ou, testmode=True)
    eps_ref = pr.fake_noise_tensor(plan, sigma, ou_beta=ou, key=key)

    S = pr.pallas_rollout_costs(
        dyn, cost, x0, U, key, sigma, K=K, antithetic=True, ou_beta=ou,
        interpret=True, testmode=True,
    )
    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(S[:K]), np.asarray(S_oracle), rtol=3e-5)
    assert np.all(np.asarray(S[K:]) > 1e37)
    # rank-adjacent rollouts (2m, 2m+1) must be exact (ε, −ε) mirror pairs
    np.testing.assert_allclose(
        np.asarray(eps_ref[:, 0:K:2, :]), -np.asarray(eps_ref[:, 1:K:2, :]),
        atol=1e-7,
    )

    w = jax.random.dirichlet(key, jnp.ones((K,)))
    w_pad = jnp.zeros((plan.Kpad,)).at[:K].set(w)
    dU = pr.pallas_weighted_update(
        dyn, cost, x0, U, key, sigma, w_pad, K=K, antithetic=True, ou_beta=ou,
        interpret=True, testmode=True,
    )
    dU_oracle = jnp.einsum("tka,k->ta", eps_ref[:, :K, :], w)
    np.testing.assert_allclose(np.asarray(dU), np.asarray(dU_oracle), rtol=2e-4, atol=1e-6)


def _setup_pendulum(T=15, K=300):
    from mppi_gpu_tpu.models.pendulum import PendulumDynamics
    from mppi_gpu_tpu.ops.cost import PendulumSwingupCost

    dyn = PendulumDynamics.create(0.05, mass=1.2, length=0.9, damping=0.15)
    cost = PendulumSwingupCost(
        w_angle=jnp.float32(4.0), w_vel=jnp.float32(0.2),
        lambda_=jnp.float32(0.8), inv_s=jnp.full((1,), 1.3),
    )
    x0 = jnp.asarray([jnp.pi - 0.3, 0.4])  # hanging-ish, slight spin
    U = 0.3 * jnp.sin(0.2 * jnp.arange(T, dtype=jnp.float32)).reshape(T, 1)
    sigma = jnp.full((1,), 0.8)
    return dyn, cost, x0, U, sigma


def test_family_dispatch():
    dyn_l, cost_l, *_ = _setup()
    dyn_p, cost_p, *_ = _setup_pendulum()
    assert pr.family_for(dyn_l, cost_l) == "lti"
    assert pr.family_for(dyn_p, cost_p) == "pendulum"
    with pytest.raises(TypeError):
        pr.family_for(dyn_p, cost_l)  # mismatched pair is not fusable
    with pytest.raises(TypeError):
        pr.family_for(dyn_l, cost_p)


@pytest.mark.parametrize("ou,anti", [(0.0, False), (0.55, False), (0.0, True)])
def test_interpret_testmode_pendulum_full_kernel_math(ou, anti):
    """Second fused family: the nonlinear pendulum (RK2 + trig cost) through
    the SAME generic kernels — group packing at A=1 (8 groups/tile), the
    one-hot U extraction, OU recursion, antithetic mirroring, masking and
    the weighted update, all verified against the scan oracle on CPU."""
    K, T = 300, 15
    dyn, cost, x0, U, sigma = _setup_pendulum(T, K)
    key = jax.random.key(4)
    plan = pr.make_plan(K, T, 1, antithetic=anti, ou_beta=ou, testmode=True,
                        family="pendulum")
    assert plan.G == 8
    eps_ref = pr.fake_noise_tensor(plan, sigma, ou_beta=ou, key=key)

    S = pr.pallas_rollout_costs(
        dyn, cost, x0, U, key, sigma, K=K, antithetic=anti, ou_beta=ou,
        interpret=True, testmode=True,
    )
    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(S[:K]), np.asarray(S_oracle), rtol=3e-5)
    assert np.all(np.asarray(S[K:]) > 1e37)

    w = jax.random.dirichlet(key, jnp.ones((K,)))
    w_pad = jnp.zeros((plan.Kpad,)).at[:K].set(w)
    dU = pr.pallas_weighted_update(
        dyn, cost, x0, U, key, sigma, w_pad, K=K, antithetic=anti, ou_beta=ou,
        interpret=True, testmode=True,
    )
    dU_oracle = jnp.einsum("tka,k->ta", eps_ref[:, :K, :], w)
    np.testing.assert_allclose(np.asarray(dU), np.asarray(dU_oracle), rtol=2e-4, atol=1e-6)


def test_interpret_testmode_pendulum_fused_solve():
    """The single-launch fused solve core on the pendulum family."""
    from mppi_gpu_tpu.ops.softmin import softmin_weights

    K, T = 300, 12
    dyn, cost, x0, U, sigma = _setup_pendulum(T, K)
    key, lam = jax.random.key(9), jnp.float32(0.8)
    plan = pr.make_plan(K, T, 1, testmode=True, family="pendulum")
    eps_ref = pr.fake_noise_tensor(plan, sigma, key=key)
    Sf, dUf = pr.pallas_fused_solve_core(
        dyn, cost, x0, U, key, sigma, lam, K=K, testmode=True, interpret=True
    )
    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(Sf[:K]), np.asarray(S_oracle), rtol=3e-5)
    sm = softmin_weights(Sf, lam)
    dU_oracle = jnp.einsum("tka,k->ta", eps_ref[:, :K, :], sm.weights[:K])
    np.testing.assert_allclose(np.asarray(dUf), np.asarray(dU_oracle), rtol=2e-4, atol=1e-6)


def _setup_cartpole(T=12, K=300):
    from mppi_gpu_tpu.models.cartpole import CartPoleDynamics
    from mppi_gpu_tpu.ops.cost import CartPoleBalanceCost

    dyn = CartPoleDynamics.create(0.04, cart_mass=1.1, pole_mass=0.12,
                                  pole_length=0.45, gravity=9.81)
    cost = CartPoleBalanceCost(
        w=jnp.asarray([0.5, 8.0, 0.1, 0.4]),
        lambda_=jnp.float32(0.9), inv_s=jnp.full((1,), 1.1),
    )
    x0 = jnp.asarray([0.1, 0.25, -0.05, 0.3])  # off-center, pole leaning
    U = 0.4 * jnp.sin(0.3 * jnp.arange(T, dtype=jnp.float32)).reshape(T, 1)
    sigma = jnp.full((1,), 1.5)
    return dyn, cost, x0, U, sigma


@pytest.mark.parametrize("ou,anti", [(0.0, False), (0.45, False), (0.0, True)])
def test_interpret_testmode_cartpole_full_kernel_math(ou, anti):
    """Third fused family: coupled nonlinear cart-pole (RK2, two divides per
    step) through the same generic kernels, verified on CPU against the scan
    oracle with identical pseudo-noise."""
    K, T = 300, 12
    dyn, cost, x0, U, sigma = _setup_cartpole(T, K)
    key = jax.random.key(8)
    plan = pr.make_plan(K, T, 1, antithetic=anti, ou_beta=ou, testmode=True,
                        family="cartpole")
    eps_ref = pr.fake_noise_tensor(plan, sigma, ou_beta=ou, key=key)

    S = pr.pallas_rollout_costs(
        dyn, cost, x0, U, key, sigma, K=K, antithetic=anti, ou_beta=ou,
        interpret=True, testmode=True,
    )
    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(S[:K]), np.asarray(S_oracle), rtol=5e-5)
    assert np.all(np.asarray(S[K:]) > 1e37)

    w = jax.random.dirichlet(key, jnp.ones((K,)))
    w_pad = jnp.zeros((plan.Kpad,)).at[:K].set(w)
    dU = pr.pallas_weighted_update(
        dyn, cost, x0, U, key, sigma, w_pad, K=K, antithetic=anti, ou_beta=ou,
        interpret=True, testmode=True,
    )
    dU_oracle = jnp.einsum("tka,k->ta", eps_ref[:, :K, :], w)
    np.testing.assert_allclose(np.asarray(dU), np.asarray(dU_oracle), rtol=2e-4, atol=1e-6)


def test_interpret_testmode_cartpole_fused_solve():
    from mppi_gpu_tpu.ops.softmin import softmin_weights

    K, T = 300, 10
    dyn, cost, x0, U, sigma = _setup_cartpole(T, K)
    key, lam = jax.random.key(2), jnp.float32(0.9)
    plan = pr.make_plan(K, T, 1, testmode=True, family="cartpole")
    eps_ref = pr.fake_noise_tensor(plan, sigma, key=key)
    Sf, dUf = pr.pallas_fused_solve_core(
        dyn, cost, x0, U, key, sigma, lam, K=K, testmode=True, interpret=True
    )
    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(Sf[:K]), np.asarray(S_oracle), rtol=5e-5)
    sm = softmin_weights(Sf, lam)
    dU_oracle = jnp.einsum("tka,k->ta", eps_ref[:, :K, :], sm.weights[:K])
    np.testing.assert_allclose(np.asarray(dUf), np.asarray(dU_oracle), rtol=2e-4, atol=1e-6)


def _setup_obstacle(T=12, K=300, A=2, M=3):
    from mppi_gpu_tpu.ops.cost import ObstacleCost

    dyn, base, x0, U, sigma = _setup(A, T, K)
    centers = jnp.linspace(-0.5, 0.8, M * A).reshape(M, A)
    # first obstacle sits just ahead of the start position so rollouts
    # actually cross it (keeps the penalty term non-vacuous for every A)
    centers = centers.at[0].set(x0[:A] + 0.05)
    cost = ObstacleCost(
        base=base,
        centers=centers,
        radii=jnp.linspace(0.15, 0.4, M),
        penalty=jnp.float32(50.0),
    )
    # wide noise so rollouts actually cross obstacles
    return dyn, cost, x0, U, jnp.full((A,), 0.6)


@pytest.mark.parametrize("A,M", [(2, 3), (3, 1), (1, 5)])
def test_interpret_testmode_obstacle_full_kernel_math(A, M):
    """Fourth fused family: LTI + spherical-obstacle penalty. The indicator
    needs per-group squared distances at step time — the only family math
    that cannot ride the deferred group reduction — verified against the
    scan-path ObstacleCost with identical pseudo-noise."""
    K, T = 300, 12
    dyn, cost, x0, U, sigma = _setup_obstacle(T, K, A, M)
    key = jax.random.key(13)
    assert pr.family_for(dyn, cost) == "lti-obstacle"
    plan = pr.make_plan(K, T, A, testmode=True, family="lti-obstacle", extra=M)
    eps_ref = pr.fake_noise_tensor(plan, sigma, key=key)

    S = pr.pallas_rollout_costs(
        dyn, cost, x0, U, key, sigma, K=K, interpret=True, testmode=True
    )
    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(S[:K]), np.asarray(S_oracle), rtol=3e-5)
    assert np.all(np.asarray(S[K:]) > 1e37)
    # the penalty must actually fire for this setup (else the test is vacuous)
    S_plain = rollout_costs(dyn, cost.base, x0, U, eps_ref[:, :K, :])
    assert float(jnp.max(S_oracle - S_plain)) >= 50.0

    w = jax.random.dirichlet(key, jnp.ones((K,)))
    w_pad = jnp.zeros((plan.Kpad,)).at[:K].set(w)
    dU = pr.pallas_weighted_update(
        dyn, cost, x0, U, key, sigma, w_pad, K=K, interpret=True, testmode=True
    )
    dU_oracle = jnp.einsum("tka,k->ta", eps_ref[:, :K, :], w)
    np.testing.assert_allclose(np.asarray(dU), np.asarray(dU_oracle), rtol=2e-4, atol=1e-6)


def test_interpret_testmode_obstacle_fused_solve():
    """Obstacle single-launch fused core — the path `auto` runs on a TPU
    single chip for lti-obstacle. Closes the one family that had A/B
    coverage but no fused-solve-core test (the other five have theirs:
    lti/pendulum/cartpole/quadrotor/quadrotor3d)."""
    from mppi_gpu_tpu.ops.softmin import softmin_weights

    K, T, A, M = 300, 12, 2, 3
    dyn, cost, x0, U, sigma = _setup_obstacle(T, K, A, M)
    key, lam = jax.random.key(13), jnp.float32(0.9)
    plan = pr.make_plan(K, T, A, testmode=True, family="lti-obstacle", extra=M)
    eps_ref = pr.fake_noise_tensor(plan, sigma, key=key)
    Sf, dUf = pr.pallas_fused_solve_core(
        dyn, cost, x0, U, key, sigma, lam, K=K, testmode=True, interpret=True
    )
    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(Sf[:K]), np.asarray(S_oracle), rtol=3e-5)
    # the penalty must actually fire (else this fused-core check is vacuous)
    S_plain = rollout_costs(dyn, cost.base, x0, U, eps_ref[:, :K, :])
    assert float(jnp.max(S_oracle - S_plain)) >= 50.0
    sm = softmin_weights(Sf, lam)
    dU_oracle = jnp.einsum("tka,k->ta", eps_ref[:, :K, :], sm.weights[:K])
    np.testing.assert_allclose(np.asarray(dUf), np.asarray(dU_oracle), rtol=2e-4, atol=1e-6)


def _setup_quadrotor(T=12, K=300):
    from mppi_gpu_tpu.models.quadrotor import QuadrotorDynamics
    from mppi_gpu_tpu.ops.cost import QuadrotorHoverCost

    dyn = QuadrotorDynamics.create(0.02, mass=0.75, inertia=0.006,
                                   arm=0.16, gravity=9.81)
    cost = QuadrotorHoverCost(
        w=jnp.asarray([3.0, 3.0, 8.0, 0.4, 0.4, 0.6]),
        goal=jnp.asarray([0.8, 0.4, 0.0, 0.0, 0.0, 0.0]),
        lambda_=jnp.float32(0.3), inv_s=jnp.asarray([1.0, 4.0]),
    )
    x0 = jnp.asarray([-0.5, 0.1, 0.08, 0.2, -0.1, 0.3])  # tilted, drifting
    hover = 0.75 * 9.81
    U = jnp.stack(
        [
            hover + 0.5 * jnp.sin(0.3 * jnp.arange(T, dtype=jnp.float32)),
            0.2 * jnp.cos(0.4 * jnp.arange(T, dtype=jnp.float32)),
        ],
        axis=1,
    )
    sigma = jnp.asarray([1.0, 0.2])
    return dyn, cost, x0, U, sigma


@pytest.mark.parametrize("ou,anti", [(0.0, False), (0.5, False), (0.0, True)])
def test_interpret_testmode_quadrotor_full_kernel_math(ou, anti):
    """Fifth fused family: the planar quadrotor — the first with A=2
    COUPLED action dims (collective + differential consumed together), so
    the family gathers per-group action rows onto (G, KB) state tiles and
    emits its cost on one row per group. Verified on CPU against the scan
    oracle with identical pseudo-noise, across OU and antithetic modes
    (whose per-dim row indexing is exactly what A=2 stresses)."""
    K, T = 300, 12
    dyn, cost, x0, U, sigma = _setup_quadrotor(T, K)
    key = jax.random.key(11)
    assert pr.family_for(dyn, cost) == "quadrotor"
    plan = pr.make_plan(K, T, 2, antithetic=anti, ou_beta=ou, testmode=True,
                        family="quadrotor")
    assert plan.G == 4
    eps_ref = pr.fake_noise_tensor(plan, sigma, ou_beta=ou, key=key)

    S = pr.pallas_rollout_costs(
        dyn, cost, x0, U, key, sigma, K=K, antithetic=anti, ou_beta=ou,
        interpret=True, testmode=True,
    )
    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(S[:K]), np.asarray(S_oracle), rtol=5e-5)
    assert np.all(np.asarray(S[K:]) > 1e37)

    w = jax.random.dirichlet(key, jnp.ones((K,)))
    w_pad = jnp.zeros((plan.Kpad,)).at[:K].set(w)
    dU = pr.pallas_weighted_update(
        dyn, cost, x0, U, key, sigma, w_pad, K=K, antithetic=anti, ou_beta=ou,
        interpret=True, testmode=True,
    )
    dU_oracle = jnp.einsum("tka,k->ta", eps_ref[:, :K, :], w)
    np.testing.assert_allclose(np.asarray(dU), np.asarray(dU_oracle), rtol=2e-4, atol=1e-6)


def test_interpret_testmode_quadrotor_fused_solve():
    from mppi_gpu_tpu.ops.softmin import softmin_weights

    K, T = 300, 10
    dyn, cost, x0, U, sigma = _setup_quadrotor(T, K)
    key, lam = jax.random.key(5), jnp.float32(0.3)
    plan = pr.make_plan(K, T, 2, testmode=True, family="quadrotor")
    # the fused core rides the round-5 STATE-PLANAR plan for this coupled
    # family — the oracle consumes the planar host-twin stream
    assert plan.planar
    eps_ref = pr.planar_fake_noise_tensor(plan, sigma, key=key)
    Sf, dUf = pr.pallas_fused_solve_core(
        dyn, cost, x0, U, key, sigma, lam, K=K, testmode=True, interpret=True
    )
    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(Sf[:K]), np.asarray(S_oracle), rtol=5e-5)
    sm = softmin_weights(Sf, lam)
    dU_oracle = jnp.einsum("tka,k->ta", eps_ref[:, :K, :], sm.weights[:K])
    np.testing.assert_allclose(np.asarray(dUf), np.asarray(dU_oracle), rtol=2e-4, atol=1e-6)


def _setup_quadrotor3d(T=10):
    from mppi_gpu_tpu.models.quadrotor3d import Quadrotor3DDynamics
    from mppi_gpu_tpu.ops.cost import Quadrotor3DHoverCost

    dyn = Quadrotor3DDynamics.create(
        0.02, mass=0.75, inertia=(0.004, 0.005, 0.008), gravity=9.81
    )
    goal = jnp.zeros(13).at[0].set(0.8).at[1].set(-0.3).at[2].set(0.5)
    cost = Quadrotor3DHoverCost(
        w=jnp.asarray([3.0, 3.0, 5.0, 8.0, 0.4, 0.4, 0.6, 0.2]),
        goal=goal,
        lambda_=jnp.float32(0.3), inv_s=jnp.asarray([1.0, 4.0, 4.0, 9.0]),
    )
    # tilted, yawed, drifting, rotating initial state (unit quaternion)
    q0 = jnp.asarray([0.97, 0.12, -0.08, 0.18])
    q0 = q0 / jnp.linalg.norm(q0)
    x0 = jnp.concatenate(
        [jnp.asarray([-0.5, 0.2, 0.1]), q0,
         jnp.asarray([0.2, -0.1, 0.3]), jnp.asarray([0.4, -0.2, 0.1])]
    )
    hover = 0.75 * 9.81
    t = jnp.arange(T, dtype=jnp.float32)
    U = jnp.stack(
        [
            hover + 0.5 * jnp.sin(0.3 * t),
            0.05 * jnp.cos(0.4 * t),
            0.05 * jnp.sin(0.5 * t),
            0.01 * jnp.cos(0.7 * t),
        ],
        axis=1,
    )
    sigma = jnp.asarray([1.0, 0.05, 0.05, 0.01])
    return dyn, cost, x0, U, sigma


@pytest.mark.parametrize("ou,anti", [(0.0, False), (0.5, False), (0.0, True)])
def test_interpret_testmode_quadrotor3d_full_kernel_math(ou, anti):
    """Sixth fused family: the full 3-D quadrotor — A=4 coupled action dims
    (G=2 groups/tile) and a 13-tile quaternion state with an rsqrt renorm
    per step. Verified on CPU against the scan oracle with identical
    pseudo-noise, across OU and antithetic modes."""
    K, T = 300, 10
    dyn, cost, x0, U, sigma = _setup_quadrotor3d(T)
    key = jax.random.key(13)
    assert pr.family_for(dyn, cost) == "quadrotor3d"
    plan = pr.make_plan(K, T, 4, antithetic=anti, ou_beta=ou, testmode=True,
                        family="quadrotor3d")
    assert plan.G == 2
    eps_ref = pr.fake_noise_tensor(plan, sigma, ou_beta=ou, key=key)

    S = pr.pallas_rollout_costs(
        dyn, cost, x0, U, key, sigma, K=K, antithetic=anti, ou_beta=ou,
        interpret=True, testmode=True,
    )
    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(S[:K]), np.asarray(S_oracle), rtol=5e-5)
    assert np.all(np.asarray(S[K:]) > 1e37)

    w = jax.random.dirichlet(key, jnp.ones((K,)))
    w_pad = jnp.zeros((plan.Kpad,)).at[:K].set(w)
    dU = pr.pallas_weighted_update(
        dyn, cost, x0, U, key, sigma, w_pad, K=K, antithetic=anti, ou_beta=ou,
        interpret=True, testmode=True,
    )
    dU_oracle = jnp.einsum("tka,k->ta", eps_ref[:, :K, :], w)
    np.testing.assert_allclose(np.asarray(dU), np.asarray(dU_oracle), rtol=2e-4, atol=1e-6)


def test_interpret_testmode_quadrotor3d_fused_solve():
    from mppi_gpu_tpu.ops.softmin import softmin_weights

    K, T = 300, 8
    dyn, cost, x0, U, sigma = _setup_quadrotor3d(T)
    key, lam = jax.random.key(7), jnp.float32(0.3)
    plan = pr.make_plan(K, T, 4, testmode=True, family="quadrotor3d")
    # round-5 state-planar plan — the oracle consumes the planar twin stream
    assert plan.planar
    eps_ref = pr.planar_fake_noise_tensor(plan, sigma, key=key)
    Sf, dUf = pr.pallas_fused_solve_core(
        dyn, cost, x0, U, key, sigma, lam, K=K, testmode=True, interpret=True
    )
    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(Sf[:K]), np.asarray(S_oracle), rtol=5e-5)
    sm = softmin_weights(Sf, lam)
    dU_oracle = jnp.einsum("tka,k->ta", eps_ref[:, :K, :], sm.weights[:K])
    np.testing.assert_allclose(np.asarray(dUf), np.asarray(dU_oracle), rtol=2e-4, atol=1e-6)


def test_quadrotor3d_auto_backend_resolution():
    from mppi_gpu_tpu.controller import resolve_backend

    dyn, cost, *_ = _setup_quadrotor3d()
    assert resolve_backend("auto", dyn, cost, platform="tpu") == "pallas"
    assert resolve_backend("auto", dyn, cost, platform="cpu") == "scan"


def test_quadrotor_auto_backend_resolution():
    from mppi_gpu_tpu.controller import resolve_backend

    dyn, cost, *_ = _setup_quadrotor()
    assert resolve_backend("auto", dyn, cost, platform="tpu") == "pallas"
    assert resolve_backend("auto", dyn, cost, platform="cpu") == "scan"


def test_obstacle_auto_backend_resolution():
    from mppi_gpu_tpu.controller import resolve_backend

    dyn, cost, *_ = _setup_obstacle()
    assert resolve_backend("auto", dyn, cost, platform="tpu") == "pallas"
    assert resolve_backend("auto", dyn, cost, platform="cpu") == "scan"


def test_pendulum_auto_backend_resolution():
    """'auto' resolves pendulum+swing-up to the fused kernels on TPU and to
    scan elsewhere; the controller path accepts the pallas backend."""
    from mppi_gpu_tpu.controller import resolve_backend

    dyn, cost, *_ = _setup_pendulum()
    assert resolve_backend("auto", dyn, cost, platform="tpu") == "pallas"
    assert resolve_backend("auto", dyn, cost, platform="cpu") == "scan"


@pytest.mark.parametrize("anti,ou", [(False, 0.0), (False, 0.6), (True, 0.0)])
def test_noise_dump_replays_kernel_stream(anti, ou):
    """Kernel D (debug noise dump) must emit BIT-identical noise to the
    stream kernels A/B consumed — verified in testmode against the host twin
    and against kernel B's one-hot extraction."""
    A, T, K = 2, 13, 300
    dyn, cost, x0, U, sigma = _setup(A, T, K)
    key = jax.random.key(6)
    plan = pr.make_plan(K, T, A, antithetic=anti, ou_beta=ou, testmode=True)
    ref = pr.fake_noise_tensor(plan, sigma, ou_beta=ou, key=key)[:, :K, :]
    eps = pr.pallas_noise_dump(
        dyn, cost, x0, U, key, sigma, K=K, antithetic=anti, ou_beta=ou,
        interpret=True, testmode=True,
    )
    np.testing.assert_array_equal(np.asarray(eps), np.asarray(ref))
    # cross-check vs kernel B: one-hot weight on rollout k extracts eps_k
    for k in (0, K - 1):
        w = jnp.zeros((plan.Kpad,), jnp.float32).at[k].set(1.0)
        eps_k = pr.pallas_weighted_update(
            dyn, cost, x0, U, key, sigma, w, K=K, antithetic=anti, ou_beta=ou,
            interpret=True, testmode=True,
        )
        np.testing.assert_allclose(
            np.asarray(eps[:, k, :]), np.asarray(eps_k), rtol=1e-6, atol=1e-7
        )


def test_solve_debug_is_faithful_on_pallas_backend():
    """VERDICT round-1 weak #3 closed: the debug dump documents the solve
    that actually ran. Under the pallas backend, solve_debug's u_seq must
    BIT-equal the hot-path solve's u_seq for the same inputs, its eps must
    be the kernels' own stream, and the NumPy re-derivation from (eps,
    weights) must reproduce u_seq within float tolerance."""
    from mppi_gpu_tpu.config import MPPIConfig
    from mppi_gpu_tpu.controller import MPPIController

    K, T, a = 300, 10, 2
    cfg = MPPIConfig(
        env="t", samples=K, state_dim=2 * a, action_dim=a, horizon=T, dt=0.1,
        lambda_=1.0, noise=(0.25,) * a, init_act=(0.0,) * a, max_a=(1.0,) * a,
        goal=(1.0,) * a + (0.0,) * a, cost_type="quadratic",
        cost_w=(1.0,) * a + (0.5,) * a,
    )
    ctrl = MPPIController(cfg, rollout_backend="pallas-interpret", testmode=True)
    x = jnp.asarray([0.2, -0.1, 0.0, 0.0])
    U = ctrl.init_action_seq()
    key = jax.random.key(3)

    executed = ctrl.solve(x, U, key)
    dbg, eps, traj = ctrl.solve_debug(x, U, key)
    # bit-faithful: the dump IS the executed solve
    np.testing.assert_array_equal(
        np.asarray(dbg.info.u_seq), np.asarray(executed.info.u_seq)
    )
    np.testing.assert_array_equal(np.asarray(dbg.action), np.asarray(executed.action))
    np.testing.assert_array_equal(
        np.asarray(dbg.info.costs), np.asarray(executed.info.costs)
    )
    # eps is the kernels' own stream (host twin of the testmode PRNG)
    plan = pr.make_plan(K, T, a, testmode=True)
    np.testing.assert_array_equal(
        np.asarray(eps),
        np.asarray(pr.fake_noise_tensor(plan, ctrl.sigma, key=key)[:, :K, :]),
    )
    assert traj.shape == (T + 1, K, 2 * a)
    # NumPy re-derivation (the plot_csv oracle's job): U + sum_k w_k eps_k,
    # clamped, must reproduce the executed u_seq
    u_new = np.asarray(U, np.float64) + (
        np.asarray(dbg.info.weights, np.float64)[None, :, None]
        * np.asarray(eps, np.float64)
    ).sum(axis=1)
    u_new = np.clip(u_new, -1.0, 1.0)
    np.testing.assert_allclose(
        np.asarray(dbg.info.u_seq, np.float64), u_new, rtol=2e-4, atol=2e-6
    )


def test_testmode_distinct_keys_give_distinct_noise():
    """The testmode stream folds in the seed words: per-shard folded keys
    under a mesh must decorrelate, not replay identical pseudo-noise."""
    plan = pr.make_plan(64, 6, 2, testmode=True)
    sigma = jnp.ones((2,))
    k0 = jax.random.key(0)
    n0 = pr.fake_noise_tensor(plan, sigma, key=k0)
    n1 = pr.fake_noise_tensor(plan, sigma, key=jax.random.fold_in(k0, 1))
    assert float(jnp.max(jnp.abs(n0 - n1))) > 1e-3


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


# ---------------------------------------------------------------------------
# Geometry invariants: the plan/rank machinery underlies every kernel's
# K-masking and antithetic pairing — sweep it over many shapes.


@pytest.mark.parametrize("A", [1, 2, 3, 4, 6, 8])
@pytest.mark.parametrize("K", [2, 8, 100, 256, 1000, 4096, 10_000])
def test_plan_geometry_invariants(A, K):
    for anti in (False, True):
        if anti and K % 2:
            continue
        plan = pr.make_plan(K, 7, A, antithetic=anti)
        assert plan.G == 8 // A
        assert plan.Kpad >= K
        gran = 512 if anti else 256
        assert plan.KB % gran == 0
        assert plan.Kpg % plan.KB == 0
        assert plan.Kpad == plan.G * plan.Kpg
        assert plan.grid == plan.Kpg // plan.KB


@pytest.mark.parametrize("A", [1, 3, 4])
@pytest.mark.parametrize("K", [512, 1000, 4096])
def test_lane_rank_is_a_bijection_and_perm_inverts_it(A, K):
    """Across all tiles, _lane_rank must assign every rank 0..Kpad-1 exactly
    once, and anti_rank_perm must be the lane-order -> rank-order gather
    that inverts it (pairs (2m, 2m+1) adjacent)."""
    for anti in (False, True):
        plan = pr.make_plan(K, 5, A, antithetic=anti)
        ranks = np.concatenate(
            [
                np.asarray(pr._lane_rank(plan, i)).reshape(plan.G, plan.KB)
                for i in range(plan.grid)
            ],
            axis=1,
        ).reshape(-1)  # flat-lane order: group-major, then tile, then lane
        assert sorted(ranks.tolist()) == list(range(plan.Kpad))
        if anti:
            perm = np.asarray(pr.anti_rank_perm(plan))
            # value at rank r in rank-ordered vectors comes from lane perm[r]
            assert sorted(perm.tolist()) == list(range(plan.Kpad))
            lane_flat = np.empty(plan.Kpad, dtype=np.int64)
            # invert: lane_flat[lane] = rank
            for g in range(plan.G):
                for i in range(plan.grid):
                    tile = np.asarray(pr._lane_rank(plan, i))[g]
                    base = g * plan.Kpg + i * plan.KB
                    lane_flat[base:base + plan.KB] = tile
            np.testing.assert_array_equal(lane_flat[perm], np.arange(plan.Kpad))
            # mirror lanes (m, m+KB/2) of the same tile hold adjacent ranks
            half = plan.KB // 2
            for g in range(min(plan.G, 2)):
                t0 = np.asarray(pr._lane_rank(plan, 0))[g]
                np.testing.assert_array_equal(t0[half:] - t0[:half], 1)


# ---------------------------------------------------------------------------
# Planar layout (dims-on-tiles) — the zero-sublane-waste one-pass core that
# `auto` runs on a TPU single chip for the LTI families at A ∈ {3, 5, 6, 7}
# (SUB % A != 0; see docs/kernels.md). Verified against the scan oracle fed
# the planar host-twin noise, plus dump-replay identity.


def _planar_case(A=3, T=11, K=530, anti=False, ou=0.0, obstacle=False, M=0):
    from mppi_gpu_tpu.ops.softmin import softmin_weights

    if obstacle:
        dyn, cost, x0, U, sigma = _setup_obstacle(T, K, A, M)
        fam, extra = "lti-obstacle", M
    else:
        dyn, cost, x0, U, sigma = _setup(A, T, K)
        fam, extra = "lti", 0
    key, lam = jax.random.key(21), jnp.float32(0.9)
    plan = pr.make_plan(K, T, A, antithetic=anti, ou_beta=ou, testmode=True,
                        family=fam, extra=extra)
    assert plan.planar, "case must exercise the planar layout"
    eps_ref = pr.planar_fake_noise_tensor(plan, sigma, ou_beta=ou, key=key)
    Sf, dUf = pr.pallas_fused_solve_core(
        dyn, cost, x0, U, key, sigma, lam, K=K, antithetic=anti, ou_beta=ou,
        testmode=True, interpret=True,
    )
    assert Sf.shape == (plan.Kpad_p,)
    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(Sf[:K]), np.asarray(S_oracle), rtol=3e-5)
    assert np.all(np.asarray(Sf[K:]) > 1e37)  # planar padding carries BIG
    sm = softmin_weights(Sf, lam)
    dU_oracle = jnp.einsum("tka,k->ta", eps_ref[:, :K, :], sm.weights[:K])
    np.testing.assert_allclose(np.asarray(dUf), np.asarray(dU_oracle),
                               rtol=2e-4, atol=1e-6)
    return dyn, cost, x0, U, sigma, key, plan, eps_ref


def test_planar_fused_solve_matches_oracle():
    _planar_case()


def test_planar_fused_solve_antithetic():
    """Mirror pairs and rank-based K-masking on the planar layout."""
    _planar_case(K=514, anti=True)


def test_planar_fused_solve_ou_noise():
    _planar_case(ou=0.55)


def test_planar_fused_solve_obstacle():
    """lti-obstacle planar core: the penalty indicator over per-dim q tiles
    must fire and match the scan oracle."""
    dyn, cost, x0, U, sigma, key, plan, eps_ref = _planar_case(
        A=3, K=420, obstacle=True, M=2
    )
    S_pen = rollout_costs(dyn, cost, x0, U, eps_ref[:, :420, :])
    S_plain = rollout_costs(dyn, cost.base, x0, U, eps_ref[:, :420, :])
    assert float(jnp.max(S_pen - S_plain)) >= 50.0  # not vacuous


@pytest.mark.parametrize("anti,ou", [(False, 0.0), (True, 0.0), (False, 0.6)])
def test_planar_noise_dump_matches_host_twin(anti, ou):
    """The planar dump kernel replays the planar stream exactly (testmode:
    the host twin IS the stream)."""
    A, T, K = 3, 9, 260
    dyn, cost, x0, U, sigma = _setup(A, T, K)
    key = jax.random.key(5)
    plan = pr.make_plan(K, T, A, antithetic=anti, ou_beta=ou, testmode=True)
    assert plan.planar
    eps = pr.pallas_noise_dump(
        dyn, cost, x0, U, key, sigma, K=K, antithetic=anti, ou_beta=ou,
        interpret=True, testmode=True, planar=True,
    )
    eps_ref = pr.planar_fake_noise_tensor(plan, sigma, ou_beta=ou, key=key)
    np.testing.assert_allclose(
        np.asarray(eps), np.asarray(eps_ref[:, :K, :]), rtol=1e-6, atol=1e-7
    )


def test_planar_plan_eligibility():
    """planar only for LTI families at SUB % A != 0, shrinking KB to fit the
    A-fold stage buffer; row-packed otherwise."""
    assert pr.make_plan(1000, 20, 3).planar
    assert pr.make_plan(1000, 20, 5).planar
    assert not pr.make_plan(1000, 20, 2).planar           # no waste at A=2
    assert not pr.make_plan(1000, 20, 4).planar
    assert not pr.make_plan(1000, 20, 1, family="pendulum").planar  # not a planar family
    p = pr.make_plan(100_000, 200, 3)
    assert p.planar and p.Kpad_p >= 100_000 and p.Kpg_p % p.KBp == 0
    # planar stage buffer fits the budget: A * Tc * SUB * KBp * 4 <= 11 MB
    assert p.A * p.Tc * 8 * p.KBp * 4 <= 11.5 * 2**20
    # the row-packed lane count is NOT shrunk by the planar budget (the
    # sharded A/B path keeps its swept-optimal KB)
    assert p.KB > p.KBp


def test_planar_unnormalized_form_matches_normalized():
    """The sharded per-device form (normalize=False): local (β, η) out and
    ΔŨ unnormalized — dividing by η must reproduce the normalized planar
    solve exactly, and (β, η) must equal the softmin over S."""
    from mppi_gpu_tpu.ops.softmin import softmin_weights

    A, T, K = 3, 11, 530
    dyn, cost, x0, U, sigma = _setup(A, T, K)
    key, lam = jax.random.key(21), jnp.float32(0.9)
    plan = pr.make_plan(K, T, A, testmode=True)
    assert plan.planar
    S1, dU1 = pr.pallas_fused_solve_core(
        dyn, cost, x0, U, key, sigma, lam, K=K, testmode=True, interpret=True
    )
    S2, dUr, beta, eta = pr.pallas_fused_solve_core(
        dyn, cost, x0, U, key, sigma, lam, K=K, testmode=True, interpret=True,
        normalize=False,
    )
    np.testing.assert_array_equal(np.asarray(S1), np.asarray(S2))
    sm = softmin_weights(S1, lam)
    np.testing.assert_allclose(float(beta), float(sm.beta), rtol=1e-6)
    np.testing.assert_allclose(float(eta), float(sm.eta), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dUr) / float(eta), np.asarray(dU1), rtol=1e-5, atol=1e-7
    )


def test_rowpacked_unnormalized_form_matches_normalized():
    """Same contract for the row-packed one-pass kernel (A=2, not planar)."""
    from mppi_gpu_tpu.ops.softmin import softmin_weights

    A, T, K = 2, 10, 300
    dyn, cost, x0, U, sigma = _setup(A, T, K)
    key, lam = jax.random.key(4), jnp.float32(1.1)
    plan = pr.make_plan(K, T, A, testmode=True)
    assert plan.onepass and not plan.planar
    S1, dU1 = pr.pallas_fused_solve_core(
        dyn, cost, x0, U, key, sigma, lam, K=K, testmode=True, interpret=True
    )
    S2, dUr, beta, eta = pr.pallas_fused_solve_core(
        dyn, cost, x0, U, key, sigma, lam, K=K, testmode=True, interpret=True,
        normalize=False,
    )
    np.testing.assert_array_equal(np.asarray(S1), np.asarray(S2))
    sm = softmin_weights(S1, lam)
    np.testing.assert_allclose(float(beta), float(sm.beta), rtol=1e-6)
    np.testing.assert_allclose(float(eta), float(sm.eta), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dUr) / float(eta), np.asarray(dU1), rtol=1e-5, atol=1e-7
    )


def test_planar_costs_only_floor_program():
    """The planar rows' measured-floor program (bench.bench_floor): the
    costs-only planar sweep must reproduce the planar host-twin oracle
    exactly and mask padded ranks with BIG — it IS the solve's rollout
    phase, minus softmin/update."""
    from mppi_gpu_tpu.models.unicycle import UnicycleDynamics
    from mppi_gpu_tpu.ops.cost import UnicycleWaypointCost

    K, T = 280, 9
    dyn = UnicycleDynamics.create(0.05)
    cost = UnicycleWaypointCost(
        w=jnp.asarray([4.0, 1.0]), goal=jnp.asarray([2.0, 1.0, 0.0]),
        lambda_=jnp.float32(0.3), inv_s=jnp.asarray([1.0, 0.7]),
    )
    x0 = jnp.asarray([0.1, -0.2, 0.4])
    t = jnp.arange(T, dtype=jnp.float32)
    U = jnp.stack([0.5 + 0.2 * jnp.sin(0.3 * t), 0.3 * jnp.cos(0.5 * t)], axis=1)
    sigma = jnp.asarray([0.6, 1.0])
    key = jax.random.key(11)
    plan = pr.make_plan(K, T, 2, testmode=True, family="unicycle")
    assert plan.planar
    eps_ref = pr.planar_fake_noise_tensor(plan, sigma, key=key)
    S = pr.pallas_planar_rollout_costs(
        dyn, cost, x0, U, key, sigma, K=K, testmode=True, interpret=True
    )
    S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(S[:K]), np.asarray(S_oracle), rtol=5e-5)
    assert np.all(np.asarray(S[K:]) > 1e37)
    # non-planar family -> clean error
    from mppi_gpu_tpu.models.pendulum import PendulumDynamics
    from mppi_gpu_tpu.ops.cost import PendulumSwingupCost

    dyn_p = PendulumDynamics.create(0.05)
    cost_p = PendulumSwingupCost(
        w_angle=jnp.float32(8.0), w_vel=jnp.float32(0.08),
        lambda_=jnp.float32(0.2), inv_s=jnp.asarray([1.0]),
    )
    with pytest.raises(ValueError, match="no planar plan"):
        pr.pallas_planar_rollout_costs(
            dyn_p, cost_p, jnp.asarray([2.5, 0.0]),
            jnp.zeros((T, 1), jnp.float32), key, jnp.asarray([1.0]), K=K,
            testmode=True, interpret=True,
        )


def test_taylor_delta_extreme_state_stays_finite():
    """_sincos_small out-of-range semantics: from an extreme state whose
    rollouts explode (cart-pole with absurd rates), the fused solve must
    behave like the true-trig path — finite softmin output with weights
    summing to 1 (diverged rollouts' weights underflow to 0), or NaN that
    the divergence guard catches — never a silently-wrong finite action
    from a healthy-looking state."""
    from mppi_gpu_tpu.models.cartpole import CartPoleDynamics
    from mppi_gpu_tpu.ops.cost import CartPoleBalanceCost
    from mppi_gpu_tpu.ops.softmin import softmin_weights

    dyn = CartPoleDynamics.create(0.03)
    cost = CartPoleBalanceCost(
        w=jnp.asarray([0.5, 20.0, 0.05, 0.1]), lambda_=jnp.float32(0.3),
        inv_s=jnp.asarray([1.0]),
    )
    K, T = 256, 30
    U = jnp.zeros((T, 1), jnp.float32)
    sigma = jnp.asarray([3.0])
    # |thd| = 40 rad/s: delta = 0.6+ — outside the Taylor bound, and the
    # true dynamics blow up from here too (thd^2 feedback)
    x_ext = jnp.asarray([0.0, 3.0, 0.0, 40.0])
    S, dU = pr.pallas_fused_solve_core(
        dyn, cost, x_ext, U, jax.random.key(2), sigma, jnp.float32(0.3),
        K=K, testmode=True, interpret=True,
    )
    S = np.asarray(S)
    finite = np.isfinite(S[:K])
    if finite.any():
        w = softmin_weights(jnp.asarray(S), jnp.float32(0.3)).weights
        np.testing.assert_allclose(float(jnp.sum(w)), 1.0, rtol=1e-4)
        assert np.all(np.isfinite(np.asarray(dU)))
    # sanity: a HEALTHY state from the same setup must still match the
    # scan oracle exactly (the approximation only degrades where the
    # dynamics already diverge)
    plan = pr.make_plan(K, T, 1, testmode=True, family="cartpole")
    eps_ref = pr.fake_noise_tensor(plan, sigma, key=jax.random.key(2))
    x_ok = jnp.asarray([0.1, 0.2, 0.0, 0.0])
    S2, _ = pr.pallas_fused_solve_core(
        dyn, cost, x_ok, U, jax.random.key(2), sigma, jnp.float32(0.3),
        K=K, testmode=True, interpret=True,
    )
    S2_oracle = rollout_costs(dyn, cost, x_ok, U, eps_ref[:, :K, :])
    np.testing.assert_allclose(np.asarray(S2[:K]), np.asarray(S2_oracle), rtol=5e-5)


@pytest.mark.parametrize("K,T", [(1, 1), (7, 2), (513, 3)])
def test_coupled_planar_geometry_edges(K, T):
    """Tiny/odd K and T for the coupled state-planar kernels (the
    reference's test.cu sweeps n=1..59 x t=1..99 for the same reason:
    padding and tile-boundary bugs live at the edges). Unicycle (A=2)
    and quadrotor3d (A=4, 13 state tiles) vs the planar host-twin
    oracle; padded ranks must carry BIG."""
    from mppi_gpu_tpu.models.quadrotor3d import Quadrotor3DDynamics
    from mppi_gpu_tpu.models.unicycle import UnicycleDynamics
    from mppi_gpu_tpu.ops.cost import Quadrotor3DHoverCost, UnicycleWaypointCost

    cases = []
    dyn_u = UnicycleDynamics.create(0.05)
    cost_u = UnicycleWaypointCost(
        w=jnp.asarray([4.0, 1.0]), goal=jnp.asarray([2.0, 1.0, 0.0]),
        lambda_=jnp.float32(0.3), inv_s=jnp.asarray([1.0, 0.7]),
    )
    cases.append((dyn_u, cost_u, jnp.asarray([0.1, -0.2, 0.4]), 2,
                  jnp.asarray([0.6, 1.0])))
    dyn_q = Quadrotor3DDynamics.create(
        1 / 60, mass=0.75, inertia=(0.004, 0.005, 0.008), gravity=9.81
    )
    cost_q = Quadrotor3DHoverCost(
        w=jnp.asarray([4.0, 4.0, 4.0, 10.0, 3.0, 3.0, 3.0, 0.5]),
        goal=jnp.asarray([1.0, 0.5, 1.0, 1.0] + [0.0] * 9),
        lambda_=jnp.float32(0.3), inv_s=jnp.asarray([1.0, 0.7, 0.7, 0.7]),
    )
    x0_q = jnp.concatenate([
        jnp.asarray([-1.0, 0.0, 0.5]), jnp.asarray([1.0, 0.0, 0.0, 0.0]),
        jnp.asarray([0.2, 0.0, 0.1]), jnp.asarray([0.0, 0.1, 0.0]),
    ])
    cases.append((dyn_q, cost_q, x0_q, 4,
                  jnp.asarray([1.2, 0.04, 0.04, 0.008])))

    for dyn, cost, x0, A, sigma in cases:
        fam = pr.family_for(dyn, cost)
        t = jnp.arange(T, dtype=jnp.float32)
        U = jnp.stack([0.3 * jnp.sin(0.3 * t + i) for i in range(A)], axis=1)
        key = jax.random.key(K + T)
        plan = pr.make_plan(K, T, A, testmode=True, family=fam)
        assert plan.planar, (fam, plan)
        eps_ref = pr.planar_fake_noise_tensor(plan, sigma, key=key)
        S, dU = pr.pallas_fused_solve_core(
            dyn, cost, x0, U, key, sigma, jnp.float32(0.4), K=K,
            testmode=True, interpret=True,
        )
        S_oracle = rollout_costs(dyn, cost, x0, U, eps_ref[:, :K, :])
        np.testing.assert_allclose(
            np.asarray(S[:K]), np.asarray(S_oracle), rtol=2e-4, atol=1e-5
        )
        assert np.all(np.asarray(S[K:]) > 1e37), fam
        assert np.all(np.isfinite(np.asarray(dU))), fam
