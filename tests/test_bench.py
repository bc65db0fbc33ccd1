"""bench.py's config surface: every benchmark case must build a valid
controller, and the per-family initial states must match the configs —
a table row that cannot build is a silent hole in BASELINE.md."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")  # bench.py lives at the repo root

import jax.numpy as jnp
import pytest

import bench


@pytest.mark.parametrize("family", sorted({c[4] for c in bench.ALL_CASES}))
def test_every_all_cases_family_builds_and_solves(family):
    cfg = bench.make_cfg(64, 6, family)
    assert cfg.samples == 64 and cfg.horizon == 6
    ctrl = bench.build(64, 6, "scan", family=family)
    x = bench.bench_x0(family)
    assert x.shape == (cfg.state_dim,)
    res = ctrl.solve(x, ctrl.init_action_seq(), ctrl.init_key())
    assert res.action.shape == (cfg.action_dim,)
    assert bool(jnp.all(jnp.isfinite(res.action)))


def test_mlp_case_builds():
    ctrl = bench.build(64, 6, "scan", mlp=True)
    x = bench.bench_x0("lti")
    res = ctrl.solve(x, ctrl.init_action_seq(), ctrl.init_key())
    assert bool(jnp.all(jnp.isfinite(res.action)))


def test_chained_stats_reports_honest_spread():
    """The harness must report genuine paired estimates (n reps, sorted,
    min<=p50<=max) — no fabricated statistics (round-1 verdict item)."""
    import jax

    def make_chain(n):
        @jax.jit
        def chain(x):
            def body(c, _):
                # enough per-iteration work that t(n_big) > t(n_small)
                # reliably on any host (negative paired estimates would be
                # discarded, shrinking `reps`)
                v = c + jnp.sum(jnp.sin(x + c * jnp.arange(20_000.0)))
                return v * 1e-6, v
            cf, _ = jax.lax.scan(body, x, None, length=n * 40)
            return cf
        return chain

    s = bench._chained_stats(make_chain, (jnp.float32(1.0),), iters=6,
                             warmup=2, reps=3)
    assert s["reps"] == 3 and len(s["estimates_ms"]) == 3
    assert s["min_ms"] <= s["p50_ms"] <= s["max_ms"]
    assert s["min_ms"] > 0.0
