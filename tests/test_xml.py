"""MuJoCo-XML env ingestion (envs/xml.py): the shipped XML assets must parse
to exactly the built-in physics constants, the YAML `env:` key must accept an
XML path like the reference's schema, and malformed XMLs must be rejected
with specific errors."""

from __future__ import annotations

import math

import numpy as np
import pytest

from mppi_gpu_tpu.config import load_config
from mppi_gpu_tpu.envs.params import WorldParams, world_params_for_config
from mppi_gpu_tpu.envs.xml import XMLWorldError, load_world_xml


@pytest.mark.parametrize("n", [1, 2, 3])
def test_shipped_xml_matches_builtin_params(n):
    w = load_world_xml(f"envs_xml/point_mass{n}d.xml")
    ref = WorldParams(n_axes=n)
    assert w.params.n_axes == n
    assert math.isclose(w.params.mass, ref.mass, rel_tol=1e-9)
    for f in ("armature", "damping", "gear", "ctrl_range", "joint_range", "timestep"):
        assert getattr(w.params, f) == getattr(ref, f), f
    assert len(w.target) == n


def test_config_env_accepts_xml_path():
    cfg = load_config("configs/point_mass2d.yaml").replace(env="envs_xml/point_mass2d.xml")
    params = world_params_for_config(cfg)
    assert params == WorldParams(n_axes=2)


def test_config_env_xml_dim_mismatch():
    cfg = load_config("configs/point_mass2d.yaml").replace(env="envs_xml/point_mass3d.xml")
    with pytest.raises(ValueError, match="3 axes"):
        world_params_for_config(cfg)


def test_config_env_xml_missing():
    cfg = load_config("configs/point_mass2d.yaml").replace(env="/nope/missing.xml")
    with pytest.raises(FileNotFoundError):
        world_params_for_config(cfg)


@pytest.mark.parametrize(
    "mutation,match",
    [
        ('integrator="RK4"', "integrator"),        # removed → Euler default
        ('type="slide"', "not a slide joint"),     # hinge joints
        ('<motor gear="10.0" joint="agent_x"/>', "motors"),  # missing motor
    ],
)
def test_bad_xml_rejected(tmp_path, mutation, match):
    src = open("envs_xml/point_mass1d.xml").read()
    if mutation.startswith("type="):
        bad = src.replace('type="slide"', 'type="hinge"')
    elif mutation.startswith("<motor"):
        bad = src.replace(mutation, "")
    else:
        bad = src.replace(mutation, "")
    p = tmp_path / "bad.xml"
    p.write_text(bad)
    with pytest.raises(XMLWorldError, match=match):
        load_world_xml(p)


REF_XML = "/root/reference/envs/point_mass2d.xml"


@pytest.mark.skipif(not __import__("os").path.exists(REF_XML),
                    reason="reference checkout not present")
def test_reference_own_xml_end_to_end():
    """Ingest the reference's ACTUAL env asset (not a reference-style copy):
    point `env:` at /root/reference/envs/point_mass2d.xml, build the world +
    controller from it, and run 5 closed-loop control steps — the 'switching
    from the reference' path (PARITY.md) demonstrated on the reference's own
    file (reference envs/point_mass2d.xml:28-43: two slide joints, gear=10,
    ctrlrange ±1, RK4 @ 0.01 s, target site at (1.0, 0))."""
    from mppi_gpu_tpu.controller import MPPIController
    from mppi_gpu_tpu.runner import run_closed_loop

    w = load_world_xml(REF_XML)
    assert w.params.n_axes == 2
    assert w.params == WorldParams(n_axes=2)  # same physics as the built-in
    assert w.target == (1.0, 0.0)             # the XML's target site (goal hint)

    cfg = load_config("configs/point_mass2d.yaml").replace(
        env=REF_XML, samples=128, horizon=15
    )
    assert world_params_for_config(cfg) == WorldParams(n_axes=2)
    ctrl = MPPIController(cfg)
    res = run_closed_loop(ctrl, world_backend="jax", max_steps=5)
    assert res.xs.shape[0] == 6 and res.us.shape == (5, 2)
    assert np.all(np.isfinite(res.xs)) and np.all(np.abs(res.us) <= 1.0)
