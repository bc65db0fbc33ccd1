"""Checkpoint/resume: a resumed run must continue bit-identically to an
uninterrupted one (per-step keys fold the absolute step index, so the only
state is (step, U, base key, world state) — all captured in the .npz)."""

from __future__ import annotations

import numpy as np
import pytest

from mppi_gpu_tpu.config import load_config
from mppi_gpu_tpu.controller import MPPIController
from mppi_gpu_tpu.envs.native import native_available
from mppi_gpu_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from mppi_gpu_tpu.runner import run_closed_loop

CFG = "configs/mppi-config-test.yaml"


def test_checkpoint_roundtrip(tmp_path):
    import jax

    cfg = load_config(CFG)
    path = tmp_path / "ck.npz"
    U = np.arange(cfg.horizon * cfg.action_dim, dtype=np.float32).reshape(
        cfg.horizon, cfg.action_dim
    )
    key = jax.random.key(123)
    save_checkpoint(
        path, step=7, U=U, key=key, x=np.ones(cfg.state_dim), time=1.25, cfg=cfg
    )
    ck = load_checkpoint(path)
    assert ck.step == 7 and ck.time == 1.25
    np.testing.assert_array_equal(ck.U, U)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(ck.key())), np.asarray(jax.random.key_data(key))
    )
    assert ck.cfg == cfg


def test_checkpoint_nested_config_stays_hashable(tmp_path):
    """Obstacle configs carry nested tuples; the json round-trip must restore
    them as tuples all the way down (MPPIConfig promises hashability)."""
    import jax

    cfg = load_config(CFG).replace(
        cost_type="obstacle", obstacles=((0.1, 0.2, 0.05), (0.3, 0.4, 0.1))
    )
    path = tmp_path / "ck.npz"
    save_checkpoint(
        path, step=1, U=np.zeros((cfg.horizon, cfg.action_dim)),
        key=jax.random.key(0), x=np.zeros(cfg.state_dim), time=0.1, cfg=cfg,
    )
    ck = load_checkpoint(path)
    assert ck.cfg == cfg
    hash(ck.cfg)  # must not raise


@pytest.mark.parametrize(
    "backend",
    ["jax"] + (["native"] if native_available() else []),
)
def test_resume_matches_uninterrupted_run(tmp_path, backend):
    cfg = load_config(CFG)
    ck = tmp_path / "ck.npz"

    full = run_closed_loop(
        MPPIController(cfg), world_backend=backend, max_steps=10,
        checkpoint_path=ck, checkpoint_every=6,
    )
    # the checkpoint on disk is from step 6 (the last multiple written)
    resumed = run_closed_loop(
        MPPIController(cfg), world_backend=backend, max_steps=10, resume_from=ck
    )
    assert len(resumed.us) == 4  # steps 6..9
    np.testing.assert_allclose(resumed.us, full.us[6:], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(resumed.xs[-1], full.xs[-1], rtol=1e-6, atol=1e-7)
