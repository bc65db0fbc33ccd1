"""Standalone check: the two-kernel Pallas path under `shard_map` on an
8-device virtual CPU mesh (testmode + interpreter), verified against the
single-device deterministic solve fed the exact per-shard pseudo-noise.

Run as a SUBPROCESS by tests/test_sharding.py: the Mosaic interpreter keeps
process-global simulated-TPU state (shared memory + a threading.Barrier
sized to the device count), and mixing many single-device interpret calls
with an 8-device shard_map interpret run in one long pytest process can
livelock inside the interpreter's store callbacks (observed; resetting
`reset_tpu_interpret_mode_state` between tests does not clear it). A fresh
process interprets the sharded kernels reliably — same pattern as the
real-TPU subprocess check.

One scenario per process (argv[1] = "iid" | "anti" | ...): a SECOND 8-device
shard_map interpret program in the same process hangs the interpreter with
high probability (jax 0.9.0), so the pytest wrapper launches one subprocess
per scenario.

The `onepass-*` scenarios run THE DEFAULT multi-chip code path — the
single-launch one-pass fused core per device + the associative softmin
combine (controller.pallas_solve, β = pmin, η/ΔU = psum) — composed under
shard_map on a 2-device mesh. Two devices because the interpreter's device
threads block inside io_callbacks whose arguments are produced on the same
thread pool; at n≥4 the pool starves and the program livelocks (observed:
one thread in `_barrier`, the rest in `_allocate_buffer`'s np.array(val)).
n=2 leaves slack and is reliable (the numerics are device-count-invariant —
the combine is associative — so n=2 composition plus the n-free unit test
of the combine algebra covers the path).

Prints SHARDED_PALLAS_OK on success.
"""

import faulthandler
import os
import re
import sys

# self-diagnosing watchdog: when the interpreter livelocks (see module
# docstring), dump every thread's stack to stderr and exit so the pytest
# wrapper's retry starts immediately instead of waiting out its timeout
faulthandler.dump_traceback_later(120, exit=True)

scenario = sys.argv[1] if len(sys.argv) > 1 else "iid"
N_DEV = 2 if scenario.startswith("onepass") else 8
if scenario.startswith("onepass"):
    # opt the controller's sharded dispatch into the one-pass branch under
    # the interpreter (safe at n=2; see module docstring)
    os.environ["MPPI_SHARDED_ONEPASS_INTERPRET"] = "1"

_flags = re.sub(
    r"--xla_force_host_platform_device_count=\d+", "",
    os.environ.get("XLA_FLAGS", ""),
).strip()
os.environ["XLA_FLAGS"] = (
    _flags + f" --xla_force_host_platform_device_count={N_DEV}"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mppi_gpu_tpu.config import MPPIConfig
from mppi_gpu_tpu.controller import mppi_solve_deterministic
from mppi_gpu_tpu.ops import pallas_rollout as pr
from mppi_gpu_tpu.parallel import ShardedMPPIController, make_mesh


def make_cfg(K, T, a, antithetic=False):
    return MPPIConfig(
        env="t", samples=K, state_dim=2 * a, action_dim=a, horizon=T, dt=0.1,
        lambda_=1.0, noise=tuple([0.25] * a), init_act=tuple([0.0] * a),
        max_a=tuple([1.0] * a), goal=tuple([1.0] * a + [0.0] * a),
        cost_type="quadratic", cost_w=tuple([1.0] * a + [0.5] * a),
        antithetic=antithetic,
    )


def check(K, T, a, antithetic, key_seed, x, U, cfg=None, onepass=False):
    """Sharded pallas-interpret solve vs single-device oracle on the
    concatenated per-shard pseudo-noise. With `onepass`, the solve runs the
    DEFAULT one-pass sharded branch (asserted below) instead of the
    two-kernel fallback."""
    n = N_DEV
    mesh = make_mesh(n)
    if cfg is None:
        cfg = make_cfg(K, T, a, antithetic)
    ctrl = ShardedMPPIController(
        cfg, mesh=mesh, rollout_backend="pallas-interpret", testmode=True
    )
    assert ctrl.rollout_backend == "pallas-interpret"
    key = jax.random.key(key_seed)
    res = ctrl.solve(x, U, key)
    # serialize the async interpret program before touching the host oracle:
    # overlapping the interpreter's io_callback store threads with a stream
    # of small host-side CPU dispatches (the fake_noise_tensor build) starves
    # the shared callback/execution pool — observed as a consistent ~20x
    # slowdown (7 s -> >120 s) with the main thread alive inside
    # fake_noise_tensor and two store callbacks parked (faulthandler dump)
    jax.block_until_ready(res)

    k_loc = K // n
    sigma = jnp.asarray(cfg.noise, jnp.float32)
    fam = pr.family_for(ctrl.dynamics, ctrl.cost)
    plan = pr.make_plan(
        k_loc, T, a, antithetic=antithetic, testmode=True, family=fam,
        extra=pr._plan_extra(pr.FAMILIES[fam], ctrl.cost),
    )
    if onepass:
        # the dispatch preconditions of the one-pass sharded branch
        # (controller.pallas_solve): with these true and the opt-in env var
        # set, the solve above RAN the composed one-pass program
        assert plan.onepass or plan.planar, plan
        assert os.environ.get("MPPI_SHARDED_ONEPASS_INTERPRET") == "1"
    # host twin of the stream the executed kernels consumed: the planar
    # one-pass core reads the planar stream; everything else is row-packed
    twin = (
        pr.planar_fake_noise_tensor if (onepass and plan.planar)
        else pr.fake_noise_tensor
    )
    eps = jnp.concatenate(
        [
            twin(plan, sigma, key=jax.random.fold_in(key, d))[:, :k_loc, :]
            for d in range(n)
        ],
        axis=1,
    )  # (T, K, a)
    ref = mppi_solve_deterministic(
        ctrl.dynamics, ctrl.cost, x, U, eps, ctrl.lambda_, ctrl.max_a,
        clamp=cfg.clamp_action,
    )
    np.testing.assert_allclose(
        np.asarray(res.info.costs), np.asarray(ref.info.costs), rtol=3e-5
    )
    np.testing.assert_allclose(float(res.info.beta), float(ref.info.beta), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res.action), np.asarray(ref.action), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res.u_next), np.asarray(ref.u_next), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(float(res.info.weights.sum()), 1.0, rtol=1e-5)


if scenario == "iid":
    # plain iid noise: per-shard key folding, K-padding masking, the three
    # collectives between kernels A and B
    check(
        8 * 24, 9, 2, False, 11,
        jnp.asarray([0.3, -0.2, 0.1, 0.0], jnp.float32),
        0.05 * jnp.ones((9, 2), jnp.float32),
    )
elif scenario == "anti":
    # antithetic: mirror pairs live within each shard; collectives must
    # still reduce them correctly
    check(
        8 * 16, 6, 2, True, 5,
        jnp.zeros(4, jnp.float32),
        0.1 * jnp.ones((6, 2), jnp.float32),
    )
elif scenario == "pendulum":
    # a nonlinear fused family under the sharded path: same collectives,
    # different kernel family (trig dynamics, A=1 packing)
    check(
        8 * 16, 6, 1, False, 3,
        jnp.asarray([2.5, 0.0], jnp.float32),
        0.1 * jnp.ones((6, 1), jnp.float32),
        cfg=MPPIConfig(
            env="pendulum", samples=8 * 16, state_dim=2, action_dim=1,
            horizon=6, dt=0.05, lambda_=0.2, noise=(1.0,), init_act=(0.0,),
            max_a=(2.0,), goal=(0.0, 0.0), cost_type="pendulum",
            cost_w=(8.0, 0.08),
        ),
    )
elif scenario == "quadrotor":
    # the A=2 coupled-action family (mixer space, nonzero nominal) sharded
    check(
        8 * 16, 5, 2, False, 9,
        jnp.asarray([-1.0, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32),
        jnp.broadcast_to(
            jnp.asarray([7.848, 0.0], jnp.float32), (5, 2)
        ),
        cfg=MPPIConfig(
            env="quadrotor", samples=8 * 16, state_dim=6, action_dim=2,
            horizon=5, dt=1.0 / 60.0, lambda_=0.1, noise=(1.0, 0.15),
            init_act=(7.848, 0.0), max_a=(16.0, 3.0),
            goal=(1.0, 0.5, 0.0, 0.0, 0.0, 0.0), cost_type="quadrotor",
            cost_w=(4.0, 4.0, 10.0, 1.5, 1.5, 2.0),
        ),
    )
elif scenario == "onepass-iid":
    # THE default multi-chip path: one-pass fused core per device +
    # associative softmin combine (β pmin, η/ΔU psum), composed under
    # shard_map on the 2-device mesh — the row-packed one-pass kernel
    # (A=2 keeps SUB % A == 0, so plan.planar is False)
    check(
        2 * 96, 9, 2, False, 11,
        jnp.asarray([0.3, -0.2, 0.1, 0.0], jnp.float32),
        0.05 * jnp.ones((9, 2), jnp.float32),
        onepass=True,
    )
elif scenario == "onepass-anti":
    # antithetic one-pass sharded: the halved ε stage + (w⁺ − w⁻)·ε⁺ fold
    # under the cross-device combine
    check(
        2 * 64, 6, 2, True, 5,
        jnp.zeros(4, jnp.float32),
        0.1 * jnp.ones((6, 2), jnp.float32),
        onepass=True,
    )
elif scenario == "onepass-planar":
    # A=3 → the PLANAR one-pass core per device (what a real 3-D point-mass
    # mesh deployment runs), still three all-reduces across the mesh
    a = 3
    check(
        2 * 96, 7, a, False, 13,
        jnp.asarray([0.3, -0.2, 0.1, 0.0, 0.05, -0.05], jnp.float32),
        0.05 * jnp.ones((7, a), jnp.float32),
        onepass=True,
        cfg=make_cfg(2 * 96, 7, a),
    )
elif scenario == "onepass-unicycle":
    # a COUPLED family through the round-5 STATE-planar one-pass core,
    # composed under the mesh: same associative combine, rows = whole
    # rollouts, no group duplication (docs/kernels.md "State-planar")
    check(
        2 * 96, 6, 2, False, 3,
        jnp.asarray([0.1, -0.2, 0.4], jnp.float32),
        jnp.broadcast_to(jnp.asarray([0.6, 0.1], jnp.float32), (6, 2)),
        onepass=True,
        cfg=MPPIConfig(
            env="unicycle", samples=2 * 96, state_dim=3, action_dim=2,
            horizon=6, dt=0.05, lambda_=0.3, noise=(0.6, 1.0),
            init_act=(0.0, 0.0), max_a=(1.5, 2.5), goal=(2.0, 1.0, 0.0),
            cost_type="unicycle", cost_w=(4.0, 1.0),
        ),
    )
elif scenario == "fleet":
    # fleet × mesh × fused fleet kernel: R robots sharded as whole robots
    # per chip (parallel/fleet.py), each shard running the fleet kernel for
    # its robot, vs the single-device fleet with the same keys — exact
    # per-robot local computation, so agreement is to interpreter-float
    # tolerance
    from mppi_gpu_tpu.batched import BatchedMPPIController
    from mppi_gpu_tpu.parallel import ShardedFleetController

    R, K, T, a = 8, 96, 6, 2
    cfg = make_cfg(K, T, a)
    mesh = make_mesh(8)
    fleet = BatchedMPPIController(
        cfg, R, rollout_backend="pallas-interpret", testmode=True
    )
    sharded = ShardedFleetController(
        cfg, R, mesh=mesh, rollout_backend="pallas-interpret", testmode=True
    )
    xs = jnp.zeros((R, 2 * a), jnp.float32).at[:, 0].set(
        0.1 * jnp.arange(R, dtype=jnp.float32)
    )
    Us = fleet.init_action_seqs()
    keys = fleet.init_keys()
    ref = fleet.solve_batch(xs, Us, keys)
    got = sharded.solve_batch(xs, Us, keys)
    np.testing.assert_allclose(
        np.asarray(got.u_next), np.asarray(ref.u_next), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(got.info.costs), np.asarray(ref.info.costs), rtol=1e-5
    )
else:
    raise SystemExit(f"unknown scenario {scenario!r}")

print("SHARDED_PALLAS_OK")
