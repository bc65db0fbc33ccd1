"""Benchmark: MPPI solve latency on the reference's headline workload.

Reference baseline: ~300 ms per solve at K=10^4 rollouts × T=200 steps on an
NVIDIA GPU (reference README.md:35; /root/repo/BASELINE.md). This script times
the same workload (point_mass3d dims) on the current JAX default device and
prints ONE JSON line:

    {"metric": "ms_per_solve_K1e4_T200", "value": <ms>, "unit": "ms",
     "vs_baseline": <300/ms speedup factor>}

Extra context lines (larger K, solves/s, backend) go to stderr.

Run: python bench.py            [--k 10000 --t 200 --backend auto|scan|pallas]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

BASELINE_MS = 300.0  # reference GPU, K=1e4, T=200 (README.md:35)


def build(K: int, T: int, backend: str, antithetic: bool = False):
    from mppi_gpu_tpu.config import MPPIConfig
    from mppi_gpu_tpu.controller import MPPIController

    cfg = MPPIConfig(
        env="point_mass3d", samples=K, state_dim=6, action_dim=3, horizon=T,
        dt=0.1, lambda_=1.0, noise=(0.25, 0.25, 0.25),
        init_act=(0.0, 0.0, 0.0), max_a=(1.0, 1.0, 1.0),
        goal=(1.0, 0.5, 0.75, 0.0, 0.0, 0.0),
        cost_type="quadratic", cost_w=(1.0, 1.0, 1.0, 5.0, 5.0, 5.0),
        antithetic=antithetic,
    )
    return MPPIController(cfg, rollout_backend=backend)


def bench_solve(K: int, T: int, backend: str, iters: int, warmup: int,
                antithetic: bool = False) -> dict:
    """Times one MPPI solve by differencing two chained-scan lengths.

    Host wall-clock around a single dispatch is unusable on a tunneled TPU
    (result fetch costs ~27 ms RTT and block_until_ready returns early), so:
    jit a `lax.scan` of n receding-horizon solves (each consumes the previous
    U — a real data dependency XLA cannot elide), fetch one scalar, and take
    (t(n_big) − t(n_small)) / (n_big − n_small). Constant dispatch/fetch
    overhead cancels exactly.
    """
    import time

    import numpy as np

    ctrl = build(K, T, backend, antithetic)
    x = jnp.asarray([0.1, -0.2, 0.05, 0.0, 0.0, 0.0], jnp.float32)
    U0 = ctrl.init_action_seq()
    key0 = jax.random.key(0)

    def make_chain(n: int):
        @jax.jit
        def chain(x, U):
            def body(U, i):
                res = ctrl._solve(
                    ctrl.dynamics, ctrl.cost, x, U,
                    jax.random.fold_in(key0, i),
                    ctrl.sigma, ctrl.lambda_, ctrl.max_a,
                )
                return res.u_next, res.action[0]
            Uf, acts = jax.lax.scan(body, U, jnp.arange(n))
            return jnp.sum(Uf) + jnp.sum(acts)

        return chain

    n_small, n_big = max(warmup, 4), max(warmup, 4) + iters
    small, big = make_chain(n_small), make_chain(n_big)

    def timed(f) -> float:
        t0 = time.perf_counter()
        v = float(f(x, U0))  # float() forces a real device round-trip
        assert np.isfinite(v)
        return time.perf_counter() - t0

    timed(small), timed(big)  # compile + warm
    reps = 5
    ts = sorted(timed(small) for _ in range(reps))
    tb = sorted(timed(big) for _ in range(reps))
    per_solve_ms = (tb[reps // 2] - ts[reps // 2]) * 1e3 / (n_big - n_small)
    best_ms = (tb[0] - ts[-1]) * 1e3 / (n_big - n_small)
    return {
        "mean_ms": per_solve_ms,
        "p50_ms": per_solve_ms,
        "p95_ms": (tb[-1] - ts[0]) * 1e3 / (n_big - n_small),
        "min_ms": max(best_ms, 0.0),
    }


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=10_000)
    p.add_argument("--t", type=int, default=200)
    p.add_argument("--backend", default="auto", choices=("auto", "scan", "pallas"))
    p.add_argument("--iters", type=int, default=60)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--extra", action="store_true", help="also bench K=1e5")
    p.add_argument("--antithetic", action="store_true", help="mirrored noise pairs")
    p.add_argument(
        "--inner", action="store_true",
        help="run the measurement in THIS process (no watchdog). By default the "
        "benchmark re-execs itself under a timeout and retries in a fresh "
        "process on a hang: the TPU runtime occasionally wedges a program's "
        "first execution (observed through tunneled devices), and a fresh "
        "process reliably clears it.",
    )
    p.add_argument("--attempts", type=int, default=3)
    p.add_argument("--attempt-timeout", type=float, default=420.0, help="seconds")
    return p


def main() -> int:
    args = _build_parser().parse_args()
    if not args.inner:
        return _supervise(args)

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev})", file=sys.stderr)

    s = bench_solve(args.k, args.t, args.backend, args.iters, args.warmup, args.antithetic)
    ms = s["p50_ms"]
    print(
        f"K={args.k} T={args.t} backend={args.backend}: "
        f"mean={s['mean_ms']:.3f} ms p50={s['p50_ms']:.3f} ms "
        f"p95={s['p95_ms']:.3f} ms min={s['min_ms']:.3f} ms "
        f"({1e3 / ms:.1f} solves/s)",
        file=sys.stderr,
    )

    if args.extra:
        s5 = bench_solve(100_000, args.t, args.backend, max(args.iters // 3, 5), 3, args.antithetic)
        print(
            f"K=100000 T={args.t}: p50={s5['p50_ms']:.3f} ms "
            f"({1e3 / s5['p50_ms']:.1f} solves/s)",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": f"ms_per_solve_K{args.k}_T{args.t}",
                "value": round(ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 2),
            }
        )
    )
    return 0


def _supervise(args) -> int:
    """Watchdog wrapper: run the measurement as a child process with a
    timeout, retrying in a fresh process on hang/crash (tunnel-wedge
    mitigation — see --inner help)."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), "--inner"]
    for flag in ("k", "t", "iters", "warmup"):
        cmd += [f"--{flag}", str(getattr(args, flag))]
    cmd += ["--backend", args.backend]
    if args.extra:
        cmd.append("--extra")
    if args.antithetic:
        cmd.append("--antithetic")

    for attempt in range(1, args.attempts + 1):
        try:
            out = subprocess.run(
                cmd, timeout=args.attempt_timeout, capture_output=True, text=True
            )
        except subprocess.TimeoutExpired:
            print(
                f"bench attempt {attempt}/{args.attempts} timed out after "
                f"{args.attempt_timeout:.0f}s (wedged runtime?); retrying in a "
                "fresh process",
                file=sys.stderr,
            )
            continue
        sys.stderr.write(out.stderr)
        if out.returncode == 0 and '"metric"' in out.stdout:
            sys.stdout.write(out.stdout)
            return 0
        print(
            f"bench attempt {attempt}/{args.attempts} failed "
            f"(rc={out.returncode}); retrying",
            file=sys.stderr,
        )
    print("all bench attempts failed", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
