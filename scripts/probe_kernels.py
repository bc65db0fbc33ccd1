"""Phase-split kernel probe: where do a fused family's milliseconds go?

Times, via the same chained-scan differencing as bench.py:

  * kernel A alone  — `pallas_rollout_costs`: on-chip noise + dynamics +
    cost, NO ε staging and NO update phase (the two-kernel form's first
    half);
  * the one-pass fused solve — `pallas_fused_solve_core`: the production
    single-launch kernel (staging + online softmin + update).

If the one-pass solve is not meaningfully slower than kernel A alone, the
solve time IS the noise+dynamics stream and there is no kernel-machinery
headroom left for that family (measured round 4: pendulum A=2.0 ms,
one-pass=1.94 ms — see docs/kernels.md "The bench roofline column").

Usage:  python scripts/probe_kernels.py [--families pendulum,lti]
                                        [--k 100000] [--t 200]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import bench
from mppi_gpu_tpu.ops import pallas_rollout as pr


def _time(label: str, fn, args, K: int, iters: int) -> None:
    key0 = jax.random.key(0)

    def make_chain(n):
        @jax.jit
        def chain(z):
            def body(c, i):
                out = fn(*args, jax.random.fold_in(key0, i))
                v = out[0] if isinstance(out, tuple) else out
                # padded rollouts carry cost=BIG; sum only the real ones
                return c + jnp.sum(v.reshape(-1)[:K]), 0.0

            c, _ = jax.lax.scan(body, z, jnp.arange(n))
            return c

        return chain

    s = bench._chained_stats(make_chain, (jnp.float32(0.0),), iters, 3, 3)
    print(
        f"{label:<44} p50={s['p50_ms']:.3f} ms "
        f"({s['min_ms']:.3f}..{s['max_ms']:.3f})"
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--families", default="pendulum,lti")
    p.add_argument("--k", type=int, default=100_000)
    p.add_argument("--t", type=int, default=200)
    p.add_argument("--iters", type=int, default=15)
    args = p.parse_args(argv)

    K, T = args.k, args.t
    for fam in args.families.split(","):
        ctrl = bench.build(K, T, "pallas", False, family=fam)
        x = bench.bench_x0(fam)
        U = ctrl.init_action_seq()
        dyn, cost, sigma, lam = ctrl.dynamics, ctrl.cost, ctrl.sigma, ctrl.lambda_

        plan = pr.make_plan(
            K, T, U.shape[1], family=pr.family_for(dyn, cost),
            extra=pr._plan_extra(pr.FAMILIES[pr.family_for(dyn, cost)], cost),
        )
        if plan.planar:
            # the shipped path is planar: probe ITS costs-only floor (same
            # stream + staging); kernel A (row-packed) is a different
            # program and reads as 'beats two-kernel A' in the bench table
            _time(
                f"[{fam}] planar costs-only (floor)",
                lambda dyn, cost, x, U, sigma, key: pr.pallas_planar_rollout_costs(
                    dyn, cost, x, U, key, sigma, K=K
                ),
                (dyn, cost, x, U, sigma),
                K, args.iters,
            )
        _time(
            f"[{fam}] kernel A (row-packed, noise+dyn+cost)",
            lambda dyn, cost, x, U, sigma, key: pr.pallas_rollout_costs(
                dyn, cost, x, U, key, sigma, K=K
            ),
            (dyn, cost, x, U, sigma),
            K, args.iters,
        )
        _time(
            f"[{fam}] one-pass fused solve",
            lambda dyn, cost, x, U, sigma, lam, key: pr.pallas_fused_solve_core(
                dyn, cost, x, U, key, sigma, lam, K=K
            ),
            (dyn, cost, x, U, sigma, lam),
            K, args.iters,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
