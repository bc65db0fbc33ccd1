"""MuJoCo-XML env ingestion (envs/xml.py): the shipped XML assets must parse
to exactly the built-in physics constants, the YAML `env:` key must accept an
XML path like the reference's schema, and malformed XMLs must be rejected
with specific errors."""

from __future__ import annotations

import math

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
