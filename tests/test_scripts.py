"""Smoke + oracle tests for the analysis scripts (scripts/plot_*.py) — the
layer matching the reference's scripts/ (plot_csv.py, plot_traj.py,
plot_miss.py). plot_csv's oracle check is live: it must PASS on a dump our
own controller produced, and FAIL on a corrupted one."""

from __future__ import annotations

import importlib.util
import os
import sys

import jax
import numpy as np
import pytest

from mppi_gpu_tpu.config import load_config
from mppi_gpu_tpu.controller import MPPIController
from mppi_gpu_tpu.io.csvio import write_step_dump_csv, write_traj_csv
from mppi_gpu_tpu.miss import run_mismatch, save_mismatch_csv

ROOT = os.path.join(os.path.dirname(__file__), "..")
CFG = os.path.join(ROOT, "configs", "mppi-config-test.yaml")


def _load_script(name):
    path = os.path.join(ROOT, "scripts", name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def dump_csv(tmp_path_factory):
    cfg = load_config(CFG)
    ctrl = MPPIController(cfg)
    x = np.zeros(cfg.state_dim, np.float32)
    U = ctrl.init_action_seq()
    res, eps, traj = ctrl.solve_debug(x, U, ctrl.init_key())
    path = tmp_path_factory.mktemp("dumps") / "step_00000.csv"
    write_step_dump_csv(
        path, np.asarray(traj), np.asarray(eps),
        np.asarray(res.info.u_seq), np.asarray(U),
        np.asarray(res.info.weights), np.asarray(res.info.costs),
    )
    return str(path)


def test_plot_csv_oracle_passes_on_real_dump(dump_csv, tmp_path):
    mod = _load_script("plot_csv.py")
    rc = mod.main([dump_csv, "-c", CFG, "-o", str(tmp_path / "o.png")])
    assert rc == 0
    assert (tmp_path / "o.png").exists()


def test_plot_csv_oracle_fails_on_corrupted_dump(dump_csv, tmp_path):
    corrupted = tmp_path / "bad.csv"
    lines = open(dump_csv).read().splitlines()
    # corrupt the last data row's weight (load_dump keeps the last row's
    # value per sample, so corrupting an interior row would be masked)
    hdr = lines[0].split(",")
    wi = hdr.index("w")
    parts = lines[-1].split(",")
    parts[wi] = str(float(parts[wi]) + 0.5)
    lines[-1] = ",".join(parts)
    corrupted.write_text("\n".join(lines) + "\n")
    mod = _load_script("plot_csv.py")
    rc = mod.main([str(corrupted), "-c", CFG, "-o", str(tmp_path / "o.png")])
    assert rc == 1


def test_plot_traj(tmp_path):
    path = tmp_path / "traj.csv"
    n = 20
    write_traj_csv(
        path, np.linspace(0, 1, n),
        np.random.default_rng(0).normal(size=(n, 4)),
        np.random.default_rng(1).normal(size=(n, 2)),
    )
    mod = _load_script("plot_traj.py")
    cfg2d = os.path.join(ROOT, "configs", "point_mass2d.yaml")
    rc = mod.main([str(path), "-c", cfg2d, "-o", str(tmp_path / "t.png")])
    assert rc == 0 and (tmp_path / "t.png").exists()


def test_plot_miss(tmp_path):
    res = run_mismatch(2, n_steps=10)
    path = tmp_path / "miss.csv"
    save_mismatch_csv(str(path), res)
    mod = _load_script("plot_miss.py")
    rc = mod.main([str(path), "-o", str(tmp_path / "m.png")])
    assert rc == 0 and (tmp_path / "m.png").exists()


@pytest.mark.parametrize(
    "env,s,a",
    [("point_mass1d", 2, 1), ("point_mass2d", 4, 2), ("point_mass3d", 6, 3),
     ("pendulum", 2, 1), ("cartpole", 4, 1), ("quadrotor", 6, 2),
     ("quadrotor3d", 13, 4), ("unicycle", 3, 2), ("arm", 4, 2)],
)
def test_animate_all_scene_families(tmp_path, env, s, a):
    """The offline viewer (scripts/animate.py — substitute for the
    reference's GLFW render loop, PointMassEnv.cpp:141-169) writes a
    playable GIF for every env family."""
    path = tmp_path / "traj.csv"
    n = 8
    write_traj_csv(
        path, np.linspace(0, 1, n),
        0.3 * np.random.default_rng(2).normal(size=(n, s)),
        0.3 * np.random.default_rng(3).normal(size=(n, a)),
    )
    mod = _load_script("animate.py")
    out = tmp_path / "ep.gif"
    rc = mod.main([str(path), "--env", env, "-o", str(out), "--stride", "2",
                   "--fps", "10"])
    assert rc == 0 and out.exists() and out.stat().st_size > 500


_EGL_PROBE = """
import os
os.environ.setdefault("MUJOCO_GL", "egl")
import mujoco
m = mujoco.MjModel.from_xml_string(
    "<mujoco><worldbody><geom type='sphere' size='.1'/></worldbody></mujoco>"
)
r = mujoco.Renderer(m, 16, 16)
r.close()
print("EGL_OK")
"""


def _egl_rendering_available() -> bool:
    # probe in a SUBPROCESS: when EGL is broken, mujoco.Renderer can abort()
    # at the C level (uncatchable — it would kill the whole pytest run)
    import subprocess as _sp
    import sys as _sys

    try:
        out = _sp.run(
            [_sys.executable, "-c", _EGL_PROBE],
            capture_output=True, text=True, timeout=120,
        )
    except Exception:
        return False
    return "EGL_OK" in out.stdout


@pytest.mark.parametrize(
    "env,s,a",
    [("point_mass2d", 4, 2), ("pendulum", 2, 1), ("cartpole", 4, 1),
     ("quadrotor", 6, 2), ("quadrotor3d", 13, 4), ("arm", 4, 2)],
)
@pytest.mark.slow
def test_animate_mujoco_renderer(tmp_path, env, s, a):
    """`--renderer mujoco`: the recorded episode replayed through the real
    MuJoCo renderer (offscreen EGL — the headless analog of the reference's
    mjv_updateScene/mjr_render loop, PointMassEnv.cpp:141-169)."""
    if not _egl_rendering_available():
        pytest.skip("mujoco offscreen rendering unavailable")
    path = tmp_path / "traj.csv"
    n = 6
    write_traj_csv(
        path, np.linspace(0, 1, n),
        0.3 * np.random.default_rng(2).normal(size=(n, s)),
        0.3 * np.random.default_rng(3).normal(size=(n, a)),
    )
    cfg = os.path.join(ROOT, "configs", f"{env}.yaml")
    out = tmp_path / "mj.gif"
    # subprocess: a broken EGL stack aborts at the C level inside
    # mujoco.Renderer, which would take the whole pytest run down with it
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "animate.py"),
         str(path), "-c", cfg, "-o", str(out), "--renderer", "mujoco",
         "--fps", "10"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, f"stdout:{r.stdout}\nstderr:{r.stderr[-1500:]}"
    assert out.exists() and out.stat().st_size > 500


def test_animate_with_config_obstacles(tmp_path):
    """Config-driven path: goal star + obstacle circles from the YAML."""
    path = tmp_path / "traj.csv"
    n = 6
    write_traj_csv(
        path, np.linspace(0, 1, n),
        0.3 * np.random.default_rng(4).normal(size=(n, 4)),
        0.3 * np.random.default_rng(5).normal(size=(n, 2)),
    )
    mod = _load_script("animate.py")
    cfg2d = os.path.join(ROOT, "configs", "point_mass2d.yaml")
    out = tmp_path / "ep2.gif"
    rc = mod.main([str(path), "-c", cfg2d, "-o", str(out)])
    assert rc == 0 and out.exists()
