"""Standalone real-TPU check for the fused Pallas kernels. Run as a
subprocess by tests/test_pallas.py (the pytest process forces a CPU platform,
and the Mosaic interpreter stubs `prng_random_bits` to zeros, so meaningful
noise-path checks need the actual chip).

Prints PALLAS_TPU_OK on success, SKIP_NO_TPU when no TPU is attached.
"""

import sys

import jax
import jax.numpy as jnp

if jax.default_backend() != "tpu":
    print("SKIP_NO_TPU")
    sys.exit(0)

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mppi_gpu_tpu.config import MPPIConfig
from mppi_gpu_tpu.controller import MPPIController
from mppi_gpu_tpu.models.point_mass import PointMassLTI
from mppi_gpu_tpu.ops import pallas_rollout as pr
from mppi_gpu_tpu.ops.cost import QuadraticCost
from mppi_gpu_tpu.ops.rollout import rollout_costs

A, T, K = 3, 16, 700
dyn = PointMassLTI.create(0.1, A)
cost = QuadraticCost(
    w=jnp.array([1.0, 1.0, 1.0, 5.0, 5.0, 5.0]),
    goal=jnp.array([1.0, 0.5, 0.75, 0.0, 0.0, 0.0]),
    lambda_=jnp.float32(1.3),
    inv_s=jnp.ones((A,)),
)
x0 = jnp.array([0.1, -0.2, 0.05, 0.0, 0.0, 0.0])
U = 0.1 * jnp.sin(jnp.arange(T * A, dtype=jnp.float32)).reshape(T, A)
key = jax.random.key(11)
sigma = jnp.array([0.25, 0.2, 0.3])

# --- kernel A vs kernel B consistency through the scan-path oracle:
# with a one-hot weight on rollout k, kernel B returns exactly ε_k; feeding
# that ε through the independent scan rollout must reproduce kernel A's S_k.
S = jax.jit(lambda *a: pr.pallas_rollout_costs(*a, K=K))(dyn, cost, x0, U, key, sigma)
plan = pr.make_plan(K, T, A)
assert S.shape == (plan.Kpad,)
assert float(S[-1]) > 1e37, "padding must carry BIG cost"
for k in (0, 3, K - 1):
    w = jnp.zeros((plan.Kpad,), jnp.float32).at[k].set(1.0)
    eps_k = jax.jit(lambda *a: pr.pallas_weighted_update(*a, K=K))(
        dyn, cost, x0, U, key, sigma, w
    )
    S_ref = float(rollout_costs(dyn, cost, x0, U, eps_k[:, None, :])[0])
    rel = abs(float(S[k]) - S_ref) / max(1.0, abs(S_ref))
    assert rel < 1e-4, f"k={k}: kernel S={float(S[k])} scan S={S_ref} rel={rel}"

# --- noise statistics: uniform weights give dU ~ N(0, σ²/K) per element
w = jnp.zeros((plan.Kpad,), jnp.float32).at[:K].set(1.0 / K)
dU = pr.pallas_weighted_update(dyn, cost, x0, U, key, sigma, w, K=K)
scale = float(jnp.std(dU / sigma)) * (K ** 0.5)
assert 0.7 < scale < 1.3, f"dU scale off: {scale}"

# --- full fused solve through the controller: finite, clamped, weights sum 1
cfg = MPPIConfig(
    env="point_mass3d", samples=K, state_dim=6, action_dim=3, horizon=T,
    dt=0.1, lambda_=1.3, noise=(0.25, 0.2, 0.3),
    init_act=(0.0, 0.0, 0.0), max_a=(1.0, 1.0, 1.0),
    goal=(1.0, 0.5, 0.75, 0.0, 0.0, 0.0),
    cost_type="quadratic", cost_w=(1.0, 1.0, 1.0, 5.0, 5.0, 5.0),
)
ctrl = MPPIController(cfg, rollout_backend="auto")
assert ctrl.rollout_backend == "pallas", ctrl.rollout_backend
res = ctrl.solve(x0, ctrl.init_action_seq(), ctrl.init_key())
action = jax.block_until_ready(res.action)
assert jnp.all(jnp.isfinite(action))
assert jnp.all(jnp.abs(res.info.u_seq) <= 1.0 + 1e-6)
assert abs(float(jnp.sum(res.info.weights)) - 1.0) < 1e-3
assert res.info.costs.shape == (K,)
# receding-horizon shift: u_next[:-1] == u_seq[1:], last repeated
assert jnp.allclose(res.u_next[:-1], res.info.u_seq[1:])
assert jnp.allclose(res.u_next[-1], res.info.u_seq[-1])

# --- fused vs scan agreement in expectation: with identical key the noise
# streams differ (threefry vs on-chip PRNG), but the solved action must agree
# in distribution; check against the scan solve within statistical tolerance.
ctrl_scan = MPPIController(cfg, rollout_backend="scan")
res_scan = ctrl_scan.solve(x0, ctrl.init_action_seq(), ctrl.init_key())
assert jnp.all(jnp.abs(res.action - res_scan.action) < 0.5), (
    res.action, res_scan.action,
)

# --- antithetic mode: mirror lanes carry exactly −ε of their pair, and the
# kernel A/B cross-check still holds
KA = K - K % 2  # antithetic requires even K
plan_a = pr.make_plan(KA, T, A, antithetic=True)
S_a = jax.jit(lambda *a: pr.pallas_rollout_costs(*a, K=KA, antithetic=True))(
    dyn, cost, x0, U, key, sigma
)
# mirror pairs are rank-adjacent: (2m, 2m+1)
for k, k_mirror in ((0, 1), (6, 7), (KA - 2, KA - 1)):
    w1 = jnp.zeros((plan_a.Kpad,), jnp.float32).at[k].set(1.0)
    w2 = jnp.zeros((plan_a.Kpad,), jnp.float32).at[k_mirror].set(1.0)
    e1 = pr.pallas_weighted_update(dyn, cost, x0, U, key, sigma, w1, K=KA, antithetic=True)
    e2 = pr.pallas_weighted_update(dyn, cost, x0, U, key, sigma, w2, K=KA, antithetic=True)
    assert jnp.allclose(e1, -e2), "mirror ranks must carry negated noise"
    S_ref = float(rollout_costs(dyn, cost, x0, U, e1[:, None, :])[0])
    assert abs(float(S_a[k]) - S_ref) < 1e-4 * max(1.0, abs(S_ref))
# padding never splits a pair: every real rank has a real mirror
assert float(S_a[KA - 1]) < 1e37 and float(S_a[KA]) > 1e37

# --- OU (time-correlated) noise: kernel A/B consistency via one-hot weight,
# and the regenerated per-rollout noise must show lag-1 autocorrelation ≈ β
import numpy as _np

OU = 0.6
S_ou = pr.pallas_rollout_costs(dyn, cost, x0, U, key, sigma, K=K, ou_beta=OU)
plan_ou = pr.make_plan(K, T, A, ou_beta=OU)
w_oh = jnp.zeros((plan_ou.Kpad,), jnp.float32).at[2].set(1.0)
eps2 = pr.pallas_weighted_update(
    dyn, cost, x0, U, key, sigma, w_oh, K=K, ou_beta=OU,
)
S_ref = float(rollout_costs(dyn, cost, x0, U, eps2[:, None, :])[0])
assert abs(float(S_ou[2]) - S_ref) < 1e-4 * max(1.0, abs(S_ref)), "OU kernel mismatch"
e = _np.asarray(eps2)
r = _np.corrcoef(e[:-1].ravel(), e[1:].ravel())[0, 1]
assert abs(r - OU) < 0.25, f"OU autocorrelation {r} != {OU}"

# --- noise-dump kernel (debug path) must replay the REAL on-chip PRNG
# stream bit-for-bit: kernel D's grid-(tiles,T) decomposition with seed-at-
# t=0 carries hardware PRNG state across grid steps exactly like kernels
# A/B's internal fori_loop; cross-check against kernel B's one-hot
# extraction, iid + OU + antithetic. planar=False: this verifies the
# ROW-PACKED stream (kernel B's); the planar dump has its own replay
# section below.
for anti_d, ou_d in ((False, 0.0), (False, 0.6), (True, 0.0)):
    K_d = K - (K % 2 if anti_d else 0)
    plan_d = pr.make_plan(K_d, T, A, antithetic=anti_d, ou_beta=ou_d)
    eps_all = pr.pallas_noise_dump(
        dyn, cost, x0, U, key, sigma, K=K_d, antithetic=anti_d, ou_beta=ou_d,
        planar=False,
    )
    assert eps_all.shape == (T, K_d, A)
    for k in (0, 1, K_d - 1):
        w_oh = jnp.zeros((plan_d.Kpad,), jnp.float32).at[k].set(1.0)
        eps_k = pr.pallas_weighted_update(
            dyn, cost, x0, U, key, sigma, w_oh, K=K_d,
            antithetic=anti_d, ou_beta=ou_d,
        )
        assert jnp.array_equal(eps_all[:, k, :], eps_k), (
            f"noise dump != kernel stream (anti={anti_d} ou={ou_d} k={k})"
        )

# --- solve_debug faithfulness on hardware: the dump's u_seq IS the executed
# fused solve's u_seq for the same inputs
_dbg, _eps_dbg, _traj = ctrl.solve_debug(x0, ctrl.init_action_seq(), ctrl.init_key())
_exe = ctrl.solve(x0, ctrl.init_action_seq(), ctrl.init_key())
assert jnp.array_equal(_dbg.info.u_seq, _exe.info.u_seq), "debug u_seq != executed"
assert jnp.array_equal(_dbg.action, _exe.action)
assert _eps_dbg.shape == (T, K, A) and _traj.shape == (T + 1, K, 6)

# --- fused single-kernel solve must equal the two-kernel path exactly
# (row-packed one-pass vs kernels A/B share one PRNG stream by design; the
# PLANAR core is a different stream and is verified by its own dump-replay
# oracle below, so pin the row-packed layout here)
import os as _os

_os.environ["MPPI_PALLAS_PLANAR"] = "0"
for anti in (False, True):
    S2 = pr.pallas_rollout_costs(dyn, cost, x0, U, key, sigma, K=K, antithetic=anti)
    from mppi_gpu_tpu.ops.softmin import softmin_weights

    sm = softmin_weights(S2, jnp.float32(1.3))
    dU2 = pr.pallas_weighted_update(
        dyn, cost, x0, U, key, sigma, sm.weights, K=K, antithetic=anti
    )
    Sf, dUf = pr.pallas_fused_solve_core(
        dyn, cost, x0, U, key, sigma, jnp.float32(1.3), K=K, antithetic=anti
    )
    assert jnp.allclose(Sf, S2, rtol=1e-6), "fused S mismatch"
    assert jnp.allclose(dUf, dU2, rtol=2e-4, atol=2e-6), "fused dU mismatch"
del _os.environ["MPPI_PALLAS_PLANAR"]

# --- geometry edge cases: tiny/odd K, T=1, G=1 (a=5), one-hot cross-check
# (the reference's test.cu sweeps n=1..59 x t=1..99 for the same reason:
# block-boundary and padding bugs live at the edges)
for (Ae, Ke, Te) in ((1, 1, 1), (2, 3, 5), (3, 255, 2), (3, 257, 1), (5, 100, 4)):
    dyn_e = PointMassLTI.create(0.07, Ae)
    cost_e = QuadraticCost(
        w=jnp.arange(1.0, 2 * Ae + 1.0),
        goal=jnp.linspace(-0.5, 0.5, 2 * Ae),
        lambda_=jnp.float32(0.9),
        inv_s=jnp.full((Ae,), 1.1),
    )
    x0_e = jnp.linspace(0.2, -0.2, 2 * Ae)
    U_e = 0.05 * jnp.cos(jnp.arange(Te * Ae, dtype=jnp.float32)).reshape(Te, Ae)
    sig_e = jnp.linspace(0.1, 0.3, Ae)
    S_e = pr.pallas_rollout_costs(dyn_e, cost_e, x0_e, U_e, key, sig_e, K=Ke)
    plan_e = pr.make_plan(Ke, Te, Ae)
    for k in {0, Ke - 1}:
        w_e = jnp.zeros((plan_e.Kpad,), jnp.float32).at[k].set(1.0)
        eps_k = pr.pallas_weighted_update(dyn_e, cost_e, x0_e, U_e, key, sig_e, w_e, K=Ke)
        S_ref = float(rollout_costs(dyn_e, cost_e, x0_e, U_e, eps_k[:, None, :])[0])
        rel = abs(float(S_e[k]) - S_ref) / max(1.0, abs(S_ref))
        assert rel < 1e-4, f"A={Ae} K={Ke} T={Te} k={k}: rel={rel}"

# --- sharded solve with the pallas backend (two-kernel path + pmin/psum
# collectives) on a 1-device mesh: action must agree with the single-chip
# fused solve for the same key (identical noise stream, same reductions)
from mppi_gpu_tpu.config import MPPIConfig as _Cfg
from mppi_gpu_tpu.parallel import ShardedMPPIController

_cfg = _Cfg(
    env="point_mass3d", samples=512, state_dim=6, action_dim=3, horizon=16,
    dt=0.1, lambda_=1.0, noise=(0.25,) * 3, init_act=(0.0,) * 3,
    max_a=(1.0,) * 3, goal=(1.0, 0.5, 0.75, 0.0, 0.0, 0.0),
    cost_type="quadratic", cost_w=(1.0, 1.0, 1.0, 5.0, 5.0, 5.0),
)
_sc = ShardedMPPIController(_cfg, mesh=jax.make_mesh((1,), ("k",)))
assert _sc.rollout_backend == "pallas", _sc.rollout_backend
_res = _sc.solve(x0, _sc.init_action_seq(), _sc.init_key())
assert jnp.all(jnp.isfinite(_res.action))
assert abs(float(jnp.sum(_res.info.weights)) - 1.0) < 1e-3

# --- pendulum fused family on hardware: one-hot kernel A/B cross-check via
# the scan oracle, fused == two-kernel, and 'auto' resolution
from mppi_gpu_tpu.models.pendulum import PendulumDynamics
from mppi_gpu_tpu.ops.cost import PendulumSwingupCost

dyn_p = PendulumDynamics.create(0.05, mass=1.2, length=0.9, damping=0.15)
cost_p = PendulumSwingupCost(
    w_angle=jnp.float32(4.0), w_vel=jnp.float32(0.2),
    lambda_=jnp.float32(0.8), inv_s=jnp.full((1,), 1.3),
)
x0_p = jnp.array([3.0, 0.1])
T_p = 20
U_p = 0.3 * jnp.sin(0.2 * jnp.arange(T_p, dtype=jnp.float32)).reshape(T_p, 1)
sig_p = jnp.full((1,), 0.8)
K_p = 900
S_p = pr.pallas_rollout_costs(dyn_p, cost_p, x0_p, U_p, key, sig_p, K=K_p)
plan_p = pr.make_plan(K_p, T_p, 1, family="pendulum")
assert float(S_p[-1]) > 1e37
for k in (0, 5, K_p - 1):
    w_p = jnp.zeros((plan_p.Kpad,), jnp.float32).at[k].set(1.0)
    eps_k = pr.pallas_weighted_update(dyn_p, cost_p, x0_p, U_p, key, sig_p, w_p, K=K_p)
    S_ref = float(rollout_costs(dyn_p, cost_p, x0_p, U_p, eps_k[:, None, :])[0])
    rel = abs(float(S_p[k]) - S_ref) / max(1.0, abs(S_ref))
    assert rel < 1e-4, f"pendulum k={k}: kernel S={float(S_p[k])} scan S={S_ref} rel={rel}"

from mppi_gpu_tpu.ops.softmin import softmin_weights as _smw


def _check_planar_fused(tag, dyn_f, cost_f, x0_f, U_f, sig_f, lam_f, K_f, ks):
    """Fused-core check for the round-5 STATE-PLANAR coupled families: the
    planar stream differs from kernels A/B's (and Kpad_p != Kpad), so the
    fused core is verified by its own exact dump-replay oracle — the planar
    dump kernel replays the EXECUTED on-chip stream; scan-rollout of dumped
    ε columns must reproduce the kernel's S, and the oracle einsum must
    reproduce ΔU (the same pattern as the lti planar flagship check)."""
    fam_f = pr.family_for(dyn_f, cost_f)
    plan_f = pr.make_plan(
        K_f, U_f.shape[0], U_f.shape[1], family=fam_f,
        extra=pr._plan_extra(pr.FAMILIES[fam_f], cost_f),
    )
    assert plan_f.planar, (tag, plan_f)
    Sf, dUf = pr.pallas_fused_solve_core(
        dyn_f, cost_f, x0_f, U_f, key, sig_f, lam_f, K=K_f
    )
    eps_f = pr.pallas_noise_dump(dyn_f, cost_f, x0_f, U_f, key, sig_f, K=K_f)
    for k in ks:
        S_ref = float(rollout_costs(dyn_f, cost_f, x0_f, U_f, eps_f[:, k:k + 1, :])[0])
        rel = abs(float(Sf[k]) - S_ref) / max(1.0, abs(S_ref))
        assert rel < 2e-4, f"{tag} planar replay k={k}: {float(Sf[k])} vs {S_ref}"
    sm_f = _smw(Sf, lam_f)
    dU_or = jnp.einsum("tka,k->ta", eps_f, sm_f.weights[:K_f])
    rel = float(
        jnp.max(jnp.abs(dUf - dU_or)) / (jnp.max(jnp.abs(dU_or)) + 1e-30)
    )
    assert rel < 1e-3, f"{tag} planar dU vs oracle einsum: rel={rel}"
    return Sf, dUf


sm_p = _smw(S_p, jnp.float32(0.8))
dU_p = pr.pallas_weighted_update(dyn_p, cost_p, x0_p, U_p, key, sig_p, sm_p.weights, K=K_p)
Sf_p, dUf_p = pr.pallas_fused_solve_core(
    dyn_p, cost_p, x0_p, U_p, key, sig_p, jnp.float32(0.8), K=K_p
)
assert jnp.allclose(Sf_p, S_p, rtol=1e-6), "pendulum fused S mismatch"
assert jnp.allclose(dUf_p, dU_p, rtol=2e-4, atol=2e-6), "pendulum fused dU mismatch"

cfg_p = MPPIConfig(
    env="pendulum", samples=K_p, state_dim=2, action_dim=1, horizon=T_p,
    dt=0.05, lambda_=0.8, noise=(0.8,), init_act=(0.0,), max_a=(2.0,),
    goal=(0.0, 0.0), cost_type="pendulum", cost_w=(4.0, 0.2),
)
ctrl_p = MPPIController(cfg_p, rollout_backend="auto")
assert ctrl_p.rollout_backend == "pallas", ctrl_p.rollout_backend
res_p = ctrl_p.solve(x0_p, ctrl_p.init_action_seq(), ctrl_p.init_key())
assert jnp.all(jnp.isfinite(jax.block_until_ready(res_p.action)))

# --- cart-pole fused family on hardware: one-hot kernel A/B cross-check
from mppi_gpu_tpu.models.cartpole import CartPoleDynamics
from mppi_gpu_tpu.ops.cost import CartPoleBalanceCost

dyn_c = CartPoleDynamics.create(0.04, cart_mass=1.1, pole_mass=0.12, pole_length=0.45)
cost_c = CartPoleBalanceCost(
    w=jnp.array([0.5, 8.0, 0.1, 0.4]), lambda_=jnp.float32(0.9),
    inv_s=jnp.full((1,), 1.1),
)
x0_c = jnp.array([0.1, 0.25, -0.05, 0.3])
T_c = 16
U_c = 0.4 * jnp.sin(0.3 * jnp.arange(T_c, dtype=jnp.float32)).reshape(T_c, 1)
sig_c = jnp.full((1,), 1.5)
K_c = 800
S_c = pr.pallas_rollout_costs(dyn_c, cost_c, x0_c, U_c, key, sig_c, K=K_c)
plan_c = pr.make_plan(K_c, T_c, 1, family="cartpole")
for k in (0, K_c - 1):
    w_c = jnp.zeros((plan_c.Kpad,), jnp.float32).at[k].set(1.0)
    eps_k = pr.pallas_weighted_update(dyn_c, cost_c, x0_c, U_c, key, sig_c, w_c, K=K_c)
    S_ref = float(rollout_costs(dyn_c, cost_c, x0_c, U_c, eps_k[:, None, :])[0])
    rel = abs(float(S_c[k]) - S_ref) / max(1.0, abs(S_ref))
    assert rel < 2e-4, f"cartpole k={k}: kernel {float(S_c[k])} scan {S_ref} rel={rel}"

# --- quadrotor fused family on hardware: the A=2 coupled-action family
# (collective + differential consumed together, state on per-group rows);
# one-hot kernel A/B cross-check via the scan oracle + 'auto' resolution
from mppi_gpu_tpu.models.quadrotor import QuadrotorDynamics
from mppi_gpu_tpu.ops.cost import QuadrotorHoverCost

dyn_q = QuadrotorDynamics.create(1 / 60)
cost_q = QuadrotorHoverCost(
    w=jnp.array([4.0, 4.0, 10.0, 1.5, 1.5, 2.0]),
    goal=jnp.array([1.0, 0.5, 0.0, 0.0, 0.0, 0.0]),
    lambda_=jnp.float32(0.1), inv_s=jnp.array([1.0, 1.0 / 0.15**2]),
)
x0_q = jnp.array([-1.0, 0.0, 0.05, 0.2, 0.0, 0.1])
T_q = 16
U_q = jnp.stack(
    [
        7.848 + 0.4 * jnp.sin(0.3 * jnp.arange(T_q, dtype=jnp.float32)),
        0.1 * jnp.cos(0.4 * jnp.arange(T_q, dtype=jnp.float32)),
    ],
    axis=1,
)
sig_q = jnp.array([1.0, 0.15])
K_q = 800
assert pr.family_for(dyn_q, cost_q) == "quadrotor"
S_q = pr.pallas_rollout_costs(dyn_q, cost_q, x0_q, U_q, key, sig_q, K=K_q)
plan_q = pr.make_plan(K_q, T_q, 2, family="quadrotor")
assert plan_q.G == 4
for k in (0, 5, K_q - 1):
    w_q = jnp.zeros((plan_q.Kpad,), jnp.float32).at[k].set(1.0)
    eps_k = pr.pallas_weighted_update(dyn_q, cost_q, x0_q, U_q, key, sig_q, w_q, K=K_q)
    S_ref = float(rollout_costs(dyn_q, cost_q, x0_q, U_q, eps_k[:, None, :])[0])
    rel = abs(float(S_q[k]) - S_ref) / max(1.0, abs(S_ref))
    assert rel < 2e-4, f"quadrotor k={k}: kernel {float(S_q[k])} scan {S_ref} rel={rel}"

Sf_q, dUf_q = _check_planar_fused(
    "quadrotor", dyn_q, cost_q, x0_q, U_q, sig_q, jnp.float32(0.1), K_q,
    (0, 5, K_q - 1),
)

cfg_q = MPPIConfig(
    env="quadrotor", samples=K_q, state_dim=6, action_dim=2, horizon=T_q,
    dt=1 / 60, lambda_=0.1, noise=(1.0, 0.15), init_act=(7.848, 0.0),
    max_a=(16.0, 3.0), goal=(1.0, 0.5, 0.0, 0.0, 0.0, 0.0),
    cost_type="quadrotor", cost_w=(4.0, 4.0, 10.0, 1.5, 1.5, 2.0),
)
ctrl_q = MPPIController(cfg_q, rollout_backend="auto")
assert ctrl_q.rollout_backend == "pallas", ctrl_q.rollout_backend
res_q = ctrl_q.solve(x0_q, ctrl_q.init_action_seq(), ctrl_q.init_key())
assert jnp.all(jnp.isfinite(jax.block_until_ready(res_q.action)))

# --- 3-D quadrotor fused family on hardware: A=4 (G=2), 13-tile quaternion
# state with an rsqrt renorm per step; one-hot kernel A/B cross-check via
# the scan oracle + 'auto' resolution
from mppi_gpu_tpu.models.quadrotor3d import Quadrotor3DDynamics
from mppi_gpu_tpu.ops.cost import Quadrotor3DHoverCost

dyn_q3 = Quadrotor3DDynamics.create(1 / 60)
cost_q3 = Quadrotor3DHoverCost(
    w=jnp.array([4.0, 4.0, 4.0, 10.0, 3.0, 3.0, 3.0, 0.5]),
    goal=jnp.zeros(13).at[0].set(1.0).at[1].set(0.5).at[2].set(1.0),
    lambda_=jnp.float32(0.3),
    inv_s=jnp.array([1.0, 1.0 / 0.04**2, 1.0 / 0.04**2, 1.0 / 0.008**2]),
)
x0_q3 = jnp.concatenate(
    [jnp.array([-1.0, 0.0, 0.5]), jnp.array([0.99, 0.08, -0.05, 0.08]),
     jnp.array([0.2, -0.1, 0.1]), jnp.array([0.3, -0.2, 0.1])]
)
x0_q3 = x0_q3.at[3:7].set(x0_q3[3:7] / jnp.linalg.norm(x0_q3[3:7]))
T_q3 = 16
t_ = jnp.arange(T_q3, dtype=jnp.float32)
U_q3 = jnp.stack(
    [7.848 + 0.4 * jnp.sin(0.3 * t_), 0.02 * jnp.cos(0.4 * t_),
     0.02 * jnp.sin(0.5 * t_), 0.004 * jnp.cos(0.7 * t_)],
    axis=1,
)
sig_q3 = jnp.array([1.2, 0.04, 0.04, 0.008])
K_q3 = 800
assert pr.family_for(dyn_q3, cost_q3) == "quadrotor3d"
S_q3 = pr.pallas_rollout_costs(dyn_q3, cost_q3, x0_q3, U_q3, key, sig_q3, K=K_q3)
plan_q3 = pr.make_plan(K_q3, T_q3, 4, family="quadrotor3d")
assert plan_q3.G == 2
for k in (0, 5, K_q3 - 1):
    w_q3 = jnp.zeros((plan_q3.Kpad,), jnp.float32).at[k].set(1.0)
    eps_k = pr.pallas_weighted_update(
        dyn_q3, cost_q3, x0_q3, U_q3, key, sig_q3, w_q3, K=K_q3
    )
    S_ref = float(rollout_costs(dyn_q3, cost_q3, x0_q3, U_q3, eps_k[:, None, :])[0])
    rel = abs(float(S_q3[k]) - S_ref) / max(1.0, abs(S_ref))
    assert rel < 2e-4, f"quadrotor3d k={k}: kernel {float(S_q3[k])} scan {S_ref} rel={rel}"

Sf_q3, dUf_q3 = _check_planar_fused(
    "quadrotor3d", dyn_q3, cost_q3, x0_q3, U_q3, sig_q3, jnp.float32(0.3),
    K_q3, (0, K_q3 - 1),
)

cfg_q3 = MPPIConfig(
    env="quadrotor3d", samples=K_q3, state_dim=13, action_dim=4, horizon=T_q3,
    dt=1 / 60, lambda_=0.3, noise=(1.2, 0.04, 0.04, 0.008),
    init_act=(7.848, 0.0, 0.0, 0.0), max_a=(32.0, 0.4, 0.4, 0.04),
    goal=(1.0, 0.5, 1.0, 1.0) + (0.0,) * 9,
    cost_type="quadrotor3d", cost_w=(4.0, 4.0, 4.0, 10.0, 3.0, 3.0, 3.0, 0.5),
)
ctrl_q3 = MPPIController(cfg_q3, rollout_backend="auto")
assert ctrl_q3.rollout_backend == "pallas", ctrl_q3.rollout_backend
res_q3 = ctrl_q3.solve(x0_q3, ctrl_q3.init_action_seq(), ctrl_q3.init_key())
assert jnp.all(jnp.isfinite(jax.block_until_ready(res_q3.action)))

# --- obstacle fused family on hardware: penalty must fire and match scan
from mppi_gpu_tpu.ops.cost import ObstacleCost

cost_o = ObstacleCost(
    base=cost,  # the 3-axis quadratic from the top of this script
    centers=jnp.array([[0.15, -0.15, 0.1], [0.6, 0.3, 0.4]]),
    radii=jnp.array([0.25, 0.3]),
    penalty=jnp.float32(50.0),
)
assert pr.family_for(dyn, cost_o) == "lti-obstacle"
S_o = pr.pallas_rollout_costs(dyn, cost_o, x0, U, key, sigma, K=K)
plan_o = pr.make_plan(K, T, A, family="lti-obstacle", extra=2)
hit_any = False
for k in (0, 7, K - 1):
    w_o = jnp.zeros((plan_o.Kpad,), jnp.float32).at[k].set(1.0)
    eps_k = pr.pallas_weighted_update(dyn, cost_o, x0, U, key, sigma, w_o, K=K)
    S_ref = float(rollout_costs(dyn, cost_o, x0, U, eps_k[:, None, :])[0])
    S_plain = float(rollout_costs(dyn, cost, x0, U, eps_k[:, None, :])[0])
    rel = abs(float(S_o[k]) - S_ref) / max(1.0, abs(S_ref))
    assert rel < 1e-4, f"obstacle k={k}: kernel {float(S_o[k])} scan {S_ref} rel={rel}"
    hit_any = hit_any or (S_ref - S_plain) >= 50.0
assert hit_any, "obstacle penalty never fired on the probed rollouts"

# --- whole-episode jit x pallas backend: the two headline modes compose —
# a short closed-loop episode (solve + world physics per cycle, one XLA
# program) with the FUSED kernel inside the episode scan
from mppi_gpu_tpu.runner import run_closed_loop, run_episode_jit

ep = run_episode_jit(ctrl, num_steps=25)  # point_mass3d, pallas fused
assert ep.xs.shape[0] == 26 and _np.all(_np.isfinite(ep.xs))
d0 = _np.linalg.norm(ep.xs[0][:3] - _np.array([1.0, 0.5, 0.75]))
d1 = _np.linalg.norm(ep.xs[-1][:3] - _np.array([1.0, 0.5, 0.75]))
assert d1 < d0, f"episode-jit(pallas) made no goal progress: {d0} -> {d1}"

# ...and it must MATCH the interactive host loop on the chip (the headline
# whole-episode bench number stands on this equivalence, BASELINE.md):
# same controller, same key folding, same jax world — the only difference
# is one fused XLA program vs per-step dispatch, so the on-chip PRNG
# streams are identical and the trajectories must agree to f32
# recompilation tolerance (the solve and the episode scan are separate
# XLA compilations; reassociation only).
ep_host = run_closed_loop(ctrl, max_steps=25)
assert len(ep_host.us) == 25, f"host loop ran {len(ep_host.us)} steps"
_np.testing.assert_allclose(ep_host.us, ep.us, rtol=1e-4, atol=1e-5)
_np.testing.assert_allclose(ep_host.xs[-1], ep.xs[-1], rtol=1e-4, atol=1e-5)
print("episode-jit x pallas matches the interactive loop on hardware")

# --- fleet fused kernel on hardware: grid axis = robot axis. Per-robot
# results must match independent single-robot fused solves with the same
# keys (identical seeding -> identical on-chip PRNG streams).
from mppi_gpu_tpu.batched import BatchedMPPIController

ctrl_fleet = BatchedMPPIController(cfg_q3, 2, rollout_backend="pallas")
xs_f = jnp.stack([x0_q3, x0_q3.at[0].add(0.5)])
Us_f = ctrl_fleet.init_action_seqs()
keys_f = ctrl_fleet.init_keys()
res_f = ctrl_fleet.solve_batch(xs_f, Us_f, keys_f)
ctrl_single = MPPIController(cfg_q3, rollout_backend="pallas")
for r in range(2):
    res_r = ctrl_single.solve(xs_f[r], Us_f[r], keys_f[r])
    assert jnp.allclose(res_f.action[r], res_r.action, rtol=1e-4, atol=1e-6), (
        f"fleet robot {r} action diverges from the single-robot fused solve: "
        f"{res_f.action[r]} vs {res_r.action}"
    )
    assert jnp.allclose(res_f.info.costs[r], res_r.info.costs, rtol=1e-4), (
        f"fleet robot {r} costs diverge"
    )

# --- K=10^6 gate: the LARGEST published bench row (BASELINE.md) gets the
# same correctness proof as K=10^4. At this scale the one-hot A/B
# cross-check guards the PRNG stream identity and tile geometry across a
# ~61-tile grid, and the softmin-conditioning asserts guard against
# catastrophic exp underflow/overflow at million-way reductions.
K6, T6 = 1_000_000, 200
U6 = jnp.zeros((T6, A), jnp.float32)
plan6 = pr.make_plan(K6, T6, A)
S6 = jax.jit(lambda *a: pr.pallas_rollout_costs(*a, K=K6))(dyn, cost, x0, U6, key, sigma)
assert S6.shape == (plan6.Kpad,)
S6_real = S6[:K6]
assert bool(jnp.isfinite(S6_real).all()), "non-finite rollout cost at K=1e6"
assert float(S6[-1]) > 1e37, "padded rollouts must carry BIG cost at K=1e6"
for k6 in (0, 424242, K6 - 1):
    w6 = jnp.zeros((plan6.Kpad,), jnp.float32).at[k6].set(1.0)
    eps_k6 = jax.jit(lambda *a: pr.pallas_weighted_update(*a, K=K6))(
        dyn, cost, x0, U6, key, sigma, w6
    )
    S_ref6 = float(rollout_costs(dyn, cost, x0, U6, eps_k6[:, None, :])[0])
    rel6 = abs(float(S6[k6]) - S_ref6) / max(1.0, abs(S_ref6))
    assert rel6 < 1e-4, f"K=1e6 k={k6}: kernel S={float(S6[k6])} scan S={S_ref6} rel={rel6}"

from mppi_gpu_tpu.ops.softmin import softmin_weights as _smw

sm6 = _smw(S6, cost.lambda_)
assert bool(jnp.isfinite(sm6.eta)) and float(sm6.eta) >= 1.0, (
    f"softmin conditioning at K=1e6: eta={float(sm6.eta)} (the min rollout "
    f"contributes exp(0)=1, so eta >= 1 always)"
)
assert abs(float(sm6.weights.sum()) - 1.0) < 1e-4, "weights must normalize at K=1e6"
assert float(sm6.beta) == float(jnp.min(S6_real)), "beta must be the true min"

# the fused core at 1e6 (PLANAR layout for lti A=3 — its own stream, so no
# elementwise tie to kernels A/B): conditioning + distributional agreement.
plan6f = pr.make_plan(K6, T6, A)
assert plan6f.planar, "lti A=3 must take the planar one-pass core"
fused6 = jax.jit(
    lambda k: pr.pallas_fused_solve_core(dyn, cost, x0, U6, k, sigma, cost.lambda_, K=K6)
)
S6f, dU6f = fused6(key)
assert S6f.shape == (plan6f.Kpad_p,)
assert bool(jnp.isfinite(S6f[:K6]).all()) and bool(jnp.isfinite(dU6f).all())
assert float(S6f[-1]) > 1e37, "planar padding must carry BIG at K=1e6"
sm6f = _smw(S6f, cost.lambda_)
assert bool(jnp.isfinite(sm6f.eta)) and float(sm6f.eta) >= 1.0
assert abs(float(sm6f.weights.sum()) - 1.0) < 1e-4
# cross-path delta vs the two-kernel dU must sit inside ordinary sampling
# variance (yardstick: the planar path's own inter-key delta — softmin mass
# concentrates, so dU varies O(sigma) across streams, NOT sigma/sqrt(K))
dU6 = pr.pallas_weighted_update(dyn, cost, x0, U6, key, sigma, sm6.weights, K=K6)
_, dU6f_b = fused6(jax.random.fold_in(key, 1))
yard = float(jnp.max(jnp.abs(dU6f - dU6f_b)))
cross = float(jnp.max(jnp.abs(dU6f - dU6)))
assert cross < 3.0 * yard + 1e-3, f"planar vs two-kernel at K=1e6: {cross} vs yard {yard}"

# --- planar one-pass core (lti A=3, the single-chip flagship path): exact
# dump-replay oracle — the planar dump kernel replays the EXECUTED stream;
# feeding dumped eps columns through the independent scan rollout must
# reproduce the kernel's S, and the oracle einsum must reproduce dU.
K_pl = 100_000
U_pl = jnp.zeros((T6, A), jnp.float32)
plan_pl = pr.make_plan(K_pl, T6, A)
assert plan_pl.planar
S_pl, dU_pl = jax.jit(
    lambda: pr.pallas_fused_solve_core(dyn, cost, x0, U_pl, key, sigma, cost.lambda_, K=K_pl)
)()
eps_pl = pr.pallas_noise_dump(dyn, cost, x0, U_pl, key, sigma, K=K_pl)
for k in (0, 51234, K_pl - 1):
    S_ref = float(rollout_costs(dyn, cost, x0, U_pl, eps_pl[:, k:k + 1, :])[0])
    rel = abs(float(S_pl[k]) - S_ref) / max(1.0, abs(S_ref))
    assert rel < 1e-4, f"planar replay k={k}: {float(S_pl[k])} vs {S_ref}"
S_ref_slice = rollout_costs(dyn, cost, x0, U_pl, eps_pl[:, :2048, :])
_np.testing.assert_allclose(_np.asarray(S_pl[:2048]), _np.asarray(S_ref_slice), rtol=1e-4)
sm_pl = _smw(S_pl, cost.lambda_)
dU_oracle = jnp.einsum("tka,k->ta", eps_pl, sm_pl.weights[:K_pl])
rel_pl = float(jnp.max(jnp.abs(dU_pl - dU_oracle)) / (jnp.max(jnp.abs(dU_oracle)) + 1e-30))
assert rel_pl < 1e-3, f"planar dU vs oracle einsum: rel={rel_pl}"

# --- unicycle fused family on hardware: the seventh family (A=2 coupled
# v/omega, trig + rsqrt bearing cost); one-hot kernel A/B cross-check via
# the scan oracle + fused core + 'auto' resolution
from mppi_gpu_tpu.models.unicycle import UnicycleDynamics
from mppi_gpu_tpu.ops.cost import UnicycleWaypointCost

dyn_u = UnicycleDynamics.create(0.05)
cost_u = UnicycleWaypointCost(
    w=jnp.asarray([4.0, 1.0]), goal=jnp.asarray([2.0, 1.0, 0.0]),
    lambda_=jnp.float32(0.3), inv_s=jnp.asarray([1.0, 0.6]),
)
x0_u = jnp.asarray([0.0, 0.0, 0.4])
T_u, K_u = 18, 700
t_u = jnp.arange(T_u, dtype=jnp.float32)
U_u = jnp.stack([0.8 + 0.2 * jnp.sin(0.3 * t_u), 0.3 * jnp.cos(0.4 * t_u)], axis=1)
sig_u = jnp.asarray([0.6, 1.0])
assert pr.family_for(dyn_u, cost_u) == "unicycle"
S_u = pr.pallas_rollout_costs(dyn_u, cost_u, x0_u, U_u, key, sig_u, K=K_u)
plan_u = pr.make_plan(K_u, T_u, 2, family="unicycle")
assert float(S_u[-1]) > 1e37
for k in (0, K_u - 1):
    w_u = jnp.zeros((plan_u.Kpad,), jnp.float32).at[k].set(1.0)
    eps_k = pr.pallas_weighted_update(dyn_u, cost_u, x0_u, U_u, key, sig_u, w_u, K=K_u)
    S_ref = float(rollout_costs(dyn_u, cost_u, x0_u, U_u, eps_k[:, None, :])[0])
    rel = abs(float(S_u[k]) - S_ref) / max(1.0, abs(S_ref))
    assert rel < 1e-4, f"unicycle k={k}: rel={rel}"
Sf_u, dUf_u = _check_planar_fused(
    "unicycle", dyn_u, cost_u, x0_u, U_u, sig_u, jnp.float32(0.7), K_u,
    (0, K_u - 1),
)
from mppi_gpu_tpu.controller import resolve_backend as _rb
assert _rb("auto", dyn_u, cost_u, platform="tpu") == "pallas"

# --- two-link arm fused family on hardware: the eighth family — the
# first with a configuration-dependent mass matrix (closed-form 2x2
# inverse, 8 trig/step via the carried-trig + angle-addition form);
# one-hot kernel A/B cross-check vs the scan oracle + fused core
from mppi_gpu_tpu.models.arm import TwoLinkArmDynamics
from mppi_gpu_tpu.ops.cost import ArmReachCost

dyn_m = TwoLinkArmDynamics.create(1.0 / 60.0)
cost_m = ArmReachCost(
    w=jnp.asarray([20.0, 0.05]), goal=jnp.asarray([0.55, 0.35, 0.0, 0.0]),
    lambda_=jnp.float32(0.1), inv_s=jnp.asarray([1.0, 0.7]),
)
x0_m = jnp.asarray([-1.2, 0.4, 0.5, -0.3])
T_m, K_m = 16, 700
t_m = jnp.arange(T_m, dtype=jnp.float32)
U_m = jnp.stack([4.0 + 2.0 * jnp.sin(0.3 * t_m), 1.5 * jnp.cos(0.5 * t_m)], axis=1)
sig_m = jnp.asarray([2.0, 1.0])
assert pr.family_for(dyn_m, cost_m) == "arm"
S_m = pr.pallas_rollout_costs(dyn_m, cost_m, x0_m, U_m, key, sig_m, K=K_m)
plan_m = pr.make_plan(K_m, T_m, 2, family="arm")
assert float(S_m[-1]) > 1e37
for k in (0, K_m - 1):
    w_m = jnp.zeros((plan_m.Kpad,), jnp.float32).at[k].set(1.0)
    eps_k = pr.pallas_weighted_update(dyn_m, cost_m, x0_m, U_m, key, sig_m, w_m, K=K_m)
    S_ref = float(rollout_costs(dyn_m, cost_m, x0_m, U_m, eps_k[:, None, :])[0])
    rel = abs(float(S_m[k]) - S_ref) / max(1.0, abs(S_ref))
    assert rel < 1e-4, f"arm k={k}: rel={rel}"
Sf_m, dUf_m = _check_planar_fused(
    "arm", dyn_m, cost_m, x0_m, U_m, sig_m, jnp.float32(0.4), K_m,
    (0, K_m - 1),
)
assert _rb("auto", dyn_m, cost_m, platform="tpu") == "pallas"

print("PALLAS_TPU_OK")
