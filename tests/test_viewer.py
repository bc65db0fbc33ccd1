"""Live-viewer wiring (the reference's GLFW window analog,
reference src/PointMassEnv.cpp:141-169). A real window needs a display the
CI host does not have, so these tests drive the host-loop integration with
a stub viewer handle and check the headless/gating error paths."""

from __future__ import annotations

import numpy as np
import pytest

from mppi_gpu_tpu import runner as runner_mod
from mppi_gpu_tpu.config import ConfigError, load_config
from mppi_gpu_tpu.controller import MPPIController
from mppi_gpu_tpu.envs.mujoco_world import mujoco_available

CFG = "configs/mppi-config-test.yaml"


class _StubViewer:
    def __init__(self, run_for: int = 10**9):
        self.syncs = 0
        self.closed = False
        self._run_for = run_for

    def is_running(self) -> bool:
        return self.syncs < self._run_for

    def sync(self) -> None:
        self.syncs += 1

    def close(self) -> None:
        self.closed = True


@pytest.mark.skipif(not mujoco_available(), reason="needs mujoco")
def test_view_syncs_every_step_and_closes(monkeypatch):
    stub = _StubViewer()
    monkeypatch.setattr(runner_mod, "_launch_viewer", lambda world: stub)
    cfg = load_config("configs/point_mass2d.yaml").replace(samples=64, horizon=10)
    ctrl = MPPIController(cfg, rollout_backend="scan")
    res = runner_mod.run_closed_loop(
        ctrl, world_backend="mujoco", max_steps=5, view=True
    )
    assert stub.syncs == 5  # one sync per executed control cycle
    assert stub.closed    # ExitStack closed the window on the way out
    assert res.xs.shape[0] == 6


@pytest.mark.skipif(not mujoco_available(), reason="needs mujoco")
def test_view_window_close_ends_episode(monkeypatch):
    stub = _StubViewer(run_for=3)
    monkeypatch.setattr(runner_mod, "_launch_viewer", lambda world: stub)
    cfg = load_config("configs/point_mass2d.yaml").replace(samples=64, horizon=10)
    ctrl = MPPIController(cfg, rollout_backend="scan")
    res = runner_mod.run_closed_loop(
        ctrl, world_backend="mujoco", max_steps=50, view=True
    )
    # closing the window stops the loop early (reference
    # glfwWindowShouldClose semantics, PointMassEnv.cpp:118)
    assert len(res.us) < 50
    assert stub.closed


def test_view_requires_mujoco_world():
    cfg = load_config(CFG)
    ctrl = MPPIController(cfg, rollout_backend="scan")
    with pytest.raises(ConfigError, match="--world mujoco"):
        runner_mod.run_closed_loop(ctrl, world_backend="jax", max_steps=2, view=True)


def test_cli_rejects_view_with_jit_episode(tmp_path, capsys):
    from mppi_gpu_tpu.cli import main

    rc = main(["-c", CFG, "--view", "--jit-episode", "--max-steps", "2"])
    assert rc == 2
    assert "--jit-episode" in capsys.readouterr().err


def test_headless_launch_raises_config_error(monkeypatch):
    """Without a display the launch path must degrade to a clean, actionable
    ConfigError (CLI exit code 2) BEFORE touching GLFW — glfwInit aborts the
    whole process on a headless host, so the display pre-check is
    load-bearing."""
    if not mujoco_available():
        pytest.skip("needs mujoco")
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    from mppi_gpu_tpu.envs import params_for_config
    from mppi_gpu_tpu.envs.mujoco_world import MujocoPointMassWorld

    cfg = load_config("configs/point_mass2d.yaml")
    world = MujocoPointMassWorld(params_for_config(cfg))
    with pytest.raises(ConfigError, match="display"):
        runner_mod._launch_viewer(world)
