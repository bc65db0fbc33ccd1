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


@pytest.mark.parametrize(
    "family,backend,anti",
    [(c[4], c[1], c[2]) for c in bench.ALL_CASES],
)
def test_roofline_model_covers_every_case(family, backend, anti):
    """The roofline column must compute for every ALL_CASES row (a KeyError
    here would crash the --all regen mid-run) and return a sane reading:
    a known roof, a positive floor, a bounded percentage."""
    r = bench._roofline(family, 100_000, 200, anti, backend, p50_ms=5.0)
    assert r["roof"] in ("VPU", "HBM", "MXU")
    assert r["floor_ms"] > 0
    assert 0 < r["pct"] < 1000
    assert bench._fmt_roofline(r)


def test_roofline_mlp_reports_mxu():
    r = bench._roofline("lti", 10_000, 200, False, "scan", 2.0, mlp=True)
    assert r["roof"] == "MXU" and "TFLOP/s" in r["achieved"]


def test_autogen_markers_present():
    """Both autogen targets must carry their marker pairs — if a marker is
    dropped in an edit, --update-baseline silently degrades to print-only
    and the 'one source of truth' guarantee is gone."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for fname, marker in (
        ("BASELINE.md", "bench-table"),
        ("README.md", "headline-table"),
    ):
        text = open(os.path.join(root, fname)).read()
        assert f"<!-- AUTOGEN:{marker} -->" in text, (fname, marker)
        assert f"<!-- /AUTOGEN:{marker} -->" in text, (fname, marker)


def test_readme_table_renders_from_results():
    """_readme_table must render the headline rows from a minimal results
    list without crashing on missing optional rows."""
    results = [
        {"K": 10_000, "backend": "scan", "family": "lti", "antithetic": False,
         "p50_ms": 1.0},
        {"K": 10_000, "backend": "pallas", "family": "lti", "antithetic": False,
         "p50_ms": 0.2},
        {"K": 100_000, "backend": "scan", "family": "lti", "antithetic": False,
         "p50_ms": 5.0},
        {"K": 100_000, "backend": "pallas", "family": "lti", "antithetic": False,
         "p50_ms": 1.5},
        {"K": 100_000, "backend": "scan", "family": "pendulum",
         "antithetic": False, "p50_ms": 3.4},
        {"K": 100_000, "backend": "pallas", "family": "pendulum",
         "antithetic": False, "p50_ms": 2.0},
    ]
    table = bench._readme_table(results, 200)
    assert "| K=10⁴, T=200, 3-D point mass | ~300 ms/solve" in table
    assert "pendulum" in table
    # K=1e6 row absent from results -> em-dash cell, not a crash
    assert "| K=10⁶, T=200 | — | — | — |" in table
