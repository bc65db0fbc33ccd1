"""Smoke tests for examples/: run each demo end-to-end at miniature scale so
the example scripts cannot silently rot. Success criteria are relaxed — at
this scale the point is 'the pipeline runs and its checks fire', not task
performance (the real-scale behavior is verified manually on hardware)."""

from __future__ import annotations

import importlib.util
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _load(name):
    path = os.path.join(ROOT, "examples", name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_learn_dynamics_smoke(capsys):
    mod = _load("learn_dynamics.py")
    rc = mod.main(
        ["-c", "configs/point_mass1d.yaml", "--transitions", "200",
         "--fit-steps", "60", "--episode-steps", "8"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "closed loop with the LEARNED model" in out


def test_fleet_smoke(capsys):
    mod = _load("fleet.py")
    rc = mod.main(["-n", "2", "--steps", "3"])
    out = capsys.readouterr().out
    assert "mean distance to goal" in out
    assert rc in (0, 1)  # 3 steps can't make meaningful progress; both valid


def test_fleet_jit_smoke(capsys):
    mod = _load("fleet.py")
    rc = mod.main(["-n", "2", "--steps", "3", "--jit"])
    out = capsys.readouterr().out
    assert "ONE XLA program" in out
    assert rc in (0, 1)


def test_obstacle_nav_smoke(tmp_path, capsys):
    mod = _load("obstacle_nav.py")
    rc = mod.main(["-o", str(tmp_path / "nav.png"), "--steps", "30"])
    out = capsys.readouterr().out
    assert "min clearance" in out
    assert (tmp_path / "nav.png").exists()
    assert rc in (0, 1)  # 30 steps won't reach the goal; clearance still checked


def test_quadrotor_waypoints_smoke(tmp_path, capsys):
    mod = _load("quadrotor_waypoints.py")
    rc = mod.main(["-o", str(tmp_path / "wp.png"), "--steps", "40"])
    out = capsys.readouterr().out
    assert "waypoints visited" in out
    assert (tmp_path / "wp.png").exists()
    assert rc in (0, 1)  # 40 steps can't finish the tour; pipeline still runs


@pytest.mark.slow
def test_learn_quadrotor_residual_smoke(capsys):
    mod = _load("learn_quadrotor_residual.py")
    rc = mod.main(["--transitions", "512", "--fit-steps", "120", "--loop-steps", "4"])
    out = capsys.readouterr().out
    assert "hybrid model" in out
    assert rc in (0, 1)  # 120 fit steps may not beat analytic; pipeline ran


def test_quadrotor3d_flight_smoke(tmp_path, capsys):
    mod = _load("quadrotor3d_flight.py")
    rc = mod.main(["-o", str(tmp_path / "wp3d.png"), "--steps", "30"])
    out = capsys.readouterr().out
    assert "waypoints visited" in out
    assert (tmp_path / "wp3d.png").exists()
    assert rc in (0, 1)  # 30 steps can't finish the tour; pipeline still runs
