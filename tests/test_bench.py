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
    # under xdist host load some paired reps get discarded (that IS the
    # honesty mechanism working) — require at least one accepted rep and
    # consistent bookkeeping, not an exact count
    assert 1 <= s["reps"] <= 3 and len(s["estimates_ms"]) == s["reps"]
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


def test_quality_markers_present():
    """BASELINE.md must carry the quality-table autogen markers AND a
    populated table (one row per quality family + the two iterated-MPPI
    budget rows), each row ending in a success cell."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(root, "BASELINE.md")).read()
    m = re.search(
        r"<!-- AUTOGEN:quality-table -->\n(.*?)\n<!-- /AUTOGEN:quality-table -->",
        text, re.S,
    )
    assert m, "quality-table autogen markers missing from BASELINE.md"
    rows = [ln for ln in m.group(1).splitlines() if ln.startswith("| ")]
    # header + family rows + 2 iterated rows (the |---| separator doesn't
    # match the "| " prefix)
    assert len(rows) >= 1 + len(bench.QUALITY_FAMILIES) + 2, rows
    for ln in rows[1:]:
        assert ln.rstrip().endswith(("| yes |", "| **REGRESSED** |")), ln


def test_quality_row_machinery_cpu():
    """quality_row end-to-end on CPU at toy scale: metrics finite, keyed,
    and the success flag is a real threshold comparison (regeneration
    guard for the BASELINE quality table)."""
    r = bench.quality_row("pendulum", backend="scan", num_steps=25, samples=64)
    for k in ("steady", "best", "mean_state_cost", "steps", "success"):
        assert k in r, r
    assert r["steps"] == 25 and r["backend"] == "scan"
    assert 0.0 <= r["best"] <= r["steady"] + 5.0
    assert r["success"] == (r["steady"] < bench.QUALITY_THRESHOLDS["pendulum"])
    # the obstacle row must score clearance against the TRUE radii while
    # the planner saw margin-inflated ones
    r2 = bench.quality_row("obstacle", backend="scan", num_steps=10, samples=64)
    assert "min_clearance" in r2
    cfg = bench._quality_cfg("obstacle")
    base = bench.make_cfg(2048, 50, "obstacle")
    for ob_inflated, ob_true in zip(cfg.obstacles, base.obstacles):
        assert abs(
            ob_inflated[-1] - ob_true[-1] - bench.QUALITY_OBSTACLE_MARGIN
        ) < 1e-9


def test_quality_metric_definitions():
    """Every quality family has a metric fn + threshold, and the metric
    maps a goal-state trajectory to ~zero distance."""
    import numpy as np

    for fam in bench.QUALITY_FAMILIES:
        cfg = bench._quality_cfg(fam)
        assert fam in bench.QUALITY_THRESHOLDS
        metric, unit = bench._goal_metric(fam, cfg)
        if fam in ("lti", "obstacle", "quadrotor", "quadrotor3d", "unicycle"):
            # trajectory sitting exactly at the goal-position -> 0
            x = np.zeros((3, cfg.state_dim))
            x[:, : len(cfg.goal)] = np.asarray(cfg.goal)
            if fam == "quadrotor3d":
                x[:, : 3] = np.asarray(cfg.goal)[:3]
            np.testing.assert_allclose(metric(x), 0.0, atol=1e-6)
        elif fam in ("pendulum", "cartpole"):
            x = np.zeros((3, cfg.state_dim))
            np.testing.assert_allclose(metric(x), 0.0, atol=1e-6)
