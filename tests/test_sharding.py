"""Multi-chip execution tests on a virtual 8-device CPU mesh.

The sharded solve must (a) run with K sharded over the mesh, (b) produce
identical results to an equivalent single-device computation when fed the
same per-shard noise, and (c) agree with the single-device solve in
distribution when sampling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_gpu_tpu.config import MPPIConfig
from mppi_gpu_tpu.controller import (
    MPPIController,
    mppi_solve_deterministic,
    sample_noise,
)
from mppi_gpu_tpu.parallel import ShardedMPPIController, make_mesh, sharded_mppi_solve


def make_cfg(K=64, T=10, a=2):
    return MPPIConfig(
        env="t", samples=K, state_dim=2 * a, action_dim=a, horizon=T, dt=0.1,
        lambda_=1.0, noise=tuple([0.25] * a), init_act=tuple([0.0] * a),
        max_a=tuple([1.0] * a), goal=tuple([1.0] * a + [0.0] * a),
        cost_type="quadratic", cost_w=tuple([1.0] * a + [0.5] * a),
    )


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_solve_runs_and_is_deterministic(mesh8):
    cfg = make_cfg()
    ctrl = ShardedMPPIController(cfg, mesh=mesh8)
    x = jnp.zeros(4)
    U = ctrl.init_action_seq()
    r1 = ctrl.solve(x, U, ctrl.init_key())
    r2 = ctrl.solve(x, U, ctrl.init_key())
    np.testing.assert_array_equal(np.asarray(r1.action), np.asarray(r2.action))
    assert r1.info.costs.shape == (cfg.samples,)
    np.testing.assert_allclose(float(r1.info.weights.sum()), 1.0, rtol=1e-5)


def test_sharded_matches_replayed_single_device(mesh8, rng):
    """Replay the sharded run's exact noise through the single-device
    deterministic solve: results must match to reduction-order tolerance."""
    cfg = make_cfg(K=64, T=8, a=2)
    ctrl = ShardedMPPIController(cfg, mesh=mesh8)
    x = jnp.asarray(rng.normal(size=4), dtype=jnp.float32)
    U = jnp.asarray(rng.normal(size=(8, 2)) * 0.1, dtype=jnp.float32)
    key = jax.random.key(7)
    res = ctrl.solve(x, U, key)

    # reconstruct the per-device noise exactly as sharded_mppi_solve does:
    # per-shard fold_in keys, each shard's stream read back through the
    # public flat view of the tiled sampler
    n = 8
    k_loc = cfg.samples // n
    sigma = jnp.asarray(cfg.noise, jnp.float32)
    eps_parts = [
        sample_noise(
            jax.random.fold_in(key, d), cfg.horizon, k_loc, cfg.action_dim, sigma
        )
        for d in range(n)
    ]
    eps = jnp.concatenate(eps_parts, axis=1)  # (T, K, a)

    ref = mppi_solve_deterministic(
        ctrl.dynamics, ctrl.cost, x, U, eps,
        ctrl.lambda_, ctrl.max_a, clamp=cfg.clamp_action,
    )
    np.testing.assert_allclose(
        np.asarray(res.action), np.asarray(ref.action), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res.u_next), np.asarray(ref.u_next), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res.info.costs), np.asarray(ref.info.costs), rtol=1e-5
    )
    np.testing.assert_allclose(float(res.info.beta), float(ref.info.beta), rtol=1e-6)


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_sharded_any_mesh_size(n_dev):
    cfg = make_cfg(K=32, T=5, a=1)
    mesh = make_mesh(n_dev)
    ctrl = ShardedMPPIController(cfg, mesh=mesh)
    res = ctrl.solve(jnp.zeros(2), ctrl.init_action_seq(), ctrl.init_key())
    assert res.u_next.shape == (5, 1)
    np.testing.assert_allclose(float(res.info.weights.sum()), 1.0, rtol=1e-5)


def test_sharded_rejects_uneven_K(mesh8):
    cfg = make_cfg(K=13)
    with pytest.raises(ValueError, match="divide evenly"):
        sharded_mppi_solve(
            mesh8,
            None, None, jnp.zeros(4), jnp.zeros((10, 2)), jax.random.key(0),
            jnp.ones(2), jnp.float32(1.0), jnp.ones(2), K=13,
        )


@pytest.mark.parametrize(
    "scenario",
    [
        "iid", "anti", "pendulum", "quadrotor", "fleet",
        # the DEFAULT multi-chip dispatch: one-pass fused core per device +
        # associative softmin combine, composed under shard_map on a
        # 2-device mesh (2 because ≥4 interpreter device threads starve the
        # io_callback pool — see _sharded_pallas_check.py docstring); the
        # row-packed, antithetic, and planar kernel forms
        "onepass-iid", "onepass-anti", "onepass-planar", "onepass-unicycle",
    ],
)
@pytest.mark.mesh_subprocess
def test_sharded_pallas_testmode_matches_oracle(scenario):
    """The multi-chip Pallas configurations under `shard_map` with real
    pmin/psum collectives, executed on a virtual mesh via the interpreter in
    testmode and verified against the single-device deterministic solve fed
    the exact per-shard pseudo-noise (per-shard key folding → distinct
    kernel noise streams, K-padding masking per shard).

    Plain scenarios run the two-kernel fallback on 8 shards (β=pmin /
    η=psum between kernels A and B, ΔU psum); `onepass-*` scenarios run the
    DEFAULT sharded dispatch — the single-launch one-pass core per device
    with the associative softmin combine (controller.pallas_solve) — on a
    2-device mesh.

    Each scenario runs in its own SUBPROCESS with retries
    (tests/_sharded_pallas_check.py): jax 0.9.0's Mosaic interpreter can
    deadlock when 8 shard_map device threads interpret concurrently (its
    output-store io_callbacks dispatch nested JAX computations — iterating
    `grid_loop_idx` — which can exhaust the callback pool). The numerics
    are deterministic; only the scheduling is flaky, so a fresh process
    retry is sound."""
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), "_sharded_pallas_check.py")
    last = None
    for _ in range(3):
        try:
            out = subprocess.run(
                [sys.executable, script, scenario],
                capture_output=True, text=True, timeout=240,
            )
        except subprocess.TimeoutExpired:
            last = "interpreter deadlock (timeout); retried in a fresh process"
            continue
        if "SHARDED_PALLAS_OK" in out.stdout:
            return
        if out.returncode >= 0:
            # a Python-level failure (AssertionError, ImportError, shape
            # errors...) is deterministic — fail immediately with full output
            raise AssertionError(
                f"stdout:\n{out.stdout[-2000:]}\nstderr:\n{out.stderr[-2000:]}"
            )
        # negative rc = killed by a signal: a hard crash in the CPU thunk
        # executor while 8 device threads drive the Mosaic interpreter (the
        # crash variant of the known io_callback instability). Like the
        # deadlock, a scheduling flake over deterministic numerics — retry
        last = (
            f"interpreter crash (signal {-out.returncode}); retried in a "
            f"fresh process; stderr tail: {out.stderr[-300:]}"
        )
    pytest.fail(f"all attempts: {last}")


def test_sharded_nonlinear_family_matches_replay(mesh8):
    """The sharded (scan) solve composes with a nonlinear model family —
    the per-shard noise reconstruction is family-independent, so the exact
    replay through the single-device deterministic solve must agree for the
    quadrotor (A=2 coupled actions, nonzero nominal) just as for the LTI."""
    cfg = MPPIConfig(
        env="quadrotor", samples=64, state_dim=6, action_dim=2, horizon=8,
        dt=1.0 / 60.0, lambda_=0.1, noise=(1.0, 0.15), init_act=(7.848, 0.0),
        max_a=(16.0, 3.0), goal=(1.0, 0.5, 0.0, 0.0, 0.0, 0.0),
        cost_type="quadrotor", cost_w=(4.0, 4.0, 10.0, 1.5, 1.5, 2.0),
    )
    ctrl = ShardedMPPIController(cfg, mesh=mesh8, rollout_backend="scan")
    x = jnp.asarray([-1.0, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32)
    U = ctrl.init_action_seq()
    key = jax.random.key(21)
    res = ctrl.solve(x, U, key)

    n, k_loc = 8, cfg.samples // 8
    sigma = jnp.asarray(cfg.noise, jnp.float32)
    eps = jnp.concatenate(
        [
            sample_noise(
                jax.random.fold_in(key, d), cfg.horizon, k_loc,
                cfg.action_dim, sigma,
            )
            for d in range(n)
        ],
        axis=1,
    )
    ref = mppi_solve_deterministic(
        ctrl.dynamics, ctrl.cost, x, U, eps,
        ctrl.lambda_, ctrl.max_a, clamp=cfg.clamp_action,
    )
    np.testing.assert_allclose(
        np.asarray(res.action), np.asarray(ref.action), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res.info.costs), np.asarray(ref.info.costs), rtol=1e-5
    )


def test_sharded_vs_single_distribution():
    """Statistical agreement: sharded and single-device solves from the same
    state should produce close actions when K is large (law of large
    numbers; different RNG streams)."""
    cfg = make_cfg(K=4096, T=10, a=1)
    x = jnp.asarray([0.5, 0.1], jnp.float32)
    single = MPPIController(cfg)
    sharded = ShardedMPPIController(cfg, mesh=make_mesh(8))
    U = single.init_action_seq()
    a1 = np.asarray(single.solve(x, U, jax.random.key(0)).action)
    a2 = np.asarray(sharded.solve(x, U, jax.random.key(1)).action)
    np.testing.assert_allclose(a1, a2, atol=0.05)


def test_sharded_onepass_combine_math_matches_global_softmin():
    """The sharded ONE-PASS path's cross-device combine (controller.py:
    β = pmin(β_d), η = psum(f_d·η_d), ΔU = psum(f_d·ΔŨ_d)/η with
    f_d = exp((β−β_d)/λ)) must equal the global softmin over the union of
    shards — the associativity that lets each device run the single-launch
    fused core. Verified here device-free: per-'shard' local quantities
    from the normalized fused core's own outputs (interpret+testmode),
    combined in NumPy, against the gathered global softmin + einsum."""
    from mppi_gpu_tpu.ops import pallas_rollout as pr
    from mppi_gpu_tpu.ops.softmin import softmin_weights
    from mppi_gpu_tpu.config import MPPIConfig
    from mppi_gpu_tpu.controller import MPPIController

    n, k_loc, T, a = 4, 64, 7, 2
    lam = jnp.float32(0.8)
    cfg = make_cfg(K=k_loc, T=T, a=a)
    ctrl = MPPIController(cfg, rollout_backend="scan")
    dyn, cost = ctrl.dynamics, ctrl.cost
    x = jnp.asarray([0.2, -0.1, 0.05, 0.0], jnp.float32)
    U = 0.05 * jnp.ones((T, a), jnp.float32)
    key = jax.random.key(17)
    sigma = ctrl.sigma

    plan = pr.make_plan(k_loc, T, a, testmode=True)
    assert plan.onepass
    betas, etas, dUs, S_all, eps_all = [], [], [], [], []
    for d in range(n):
        kd = jax.random.fold_in(key, d)
        S, dU, b_l, e_l = pr.pallas_fused_solve_core(
            dyn, cost, x, U, kd, sigma, lam, K=k_loc,
            testmode=True, interpret=True, normalize=False,
        )
        betas.append(float(b_l)); etas.append(float(e_l)); dUs.append(dU)
        S_all.append(S[:k_loc])
        eps_all.append(pr.fake_noise_tensor(plan, sigma, key=kd)[:, :k_loc, :])

    # the combine (what the sharded branch computes with pmin/psum)
    beta = min(betas)
    fs = [np.exp((beta - b) / float(lam)) for b in betas]
    eta = sum(f * e for f, e in zip(fs, etas))
    dU = sum(f * np.asarray(d) for f, d in zip(fs, dUs)) / eta

    # the global softmin over the union of shards
    S_glob = jnp.concatenate(S_all)
    eps_glob = jnp.concatenate(eps_all, axis=1)
    sm = softmin_weights(S_glob, lam)
    dU_ref = jnp.einsum("tka,k->ta", eps_glob, sm.weights)

    np.testing.assert_allclose(beta, float(sm.beta), rtol=1e-6)
    np.testing.assert_allclose(eta, float(sm.eta), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dU), np.asarray(dU_ref), rtol=1e-4, atol=1e-6)
