"""Real-MuJoCo ground-truth world (optional backend).

The reference's plant IS MuJoCo (reference src/PointMassEnv.cpp:53-61:
mj_loadXML + mj_makeData, stepped at timestep 0.01 with ~2 steps per 1/60 s
control cycle). This module makes the actual MuJoCo engine available as a
third interchangeable world backend (`--world mujoco`) next to the pure-JAX
and native-C++ twins — same host-loop API, same episode semantics — so the
closed loop and the mismatch harness can run against the very physics the
reference used. Needs the `mujoco` package (optional dependency; the other
two backends carry no such requirement).

The MJCF is generated from :class:`WorldParams` (or taken from a
reference-schema XML via the config's `env:` key), so the physics constants
are identical by construction to the analytic worlds — which real-MuJoCo
cross-validation shows track mj_step to ~2e-7 in the interior
(tests/test_mujoco_xval.py).
"""

from __future__ import annotations

import numpy as np

from mppi_gpu_tpu.envs.params import WorldParams


def mujoco_available() -> bool:
    try:
        import mujoco  # noqa: F401

        return True
    except Exception:
        return False


def _point_mass_mjcf(p: WorldParams) -> str:
    """Minimal MJCF with `p.n_axes` slide joints matching the reference's
    point-mass envs (reference envs/point_mass{1,2,3}d.xml: armature 0.01,
    damping 0.1, limited ±1.4, gear 10, ctrlrange ±1, RK4 @ 0.01)."""
    axes = ["1 0 0", "0 1 0", "0 0 1"]
    joints = "\n".join(
        f'            <joint axis="{axes[i]}" name="agent_{i}" '
        f'range="-{p.joint_range} {p.joint_range}" type="slide"/>'
        for i in range(p.n_axes)
    )
    motors = "\n".join(
        f'        <motor gear="{p.gear}" joint="agent_{i}"/>'
        for i in range(p.n_axes)
    )
    return f"""
<mujoco model="tpu-mppi point mass {p.n_axes}d (generated)">
    <compiler inertiafromgeom="true" angle="radian"/>
    <default>
        <joint armature="{p.armature}" damping="{p.damping}" limited="true"/>
        <motor ctrllimited="true" ctrlrange="-{p.ctrl_range} {p.ctrl_range}"/>
    </default>
    <option gravity="0 0 0" integrator="RK4" timestep="{p.timestep}"/>
    <worldbody>
        <body name="agent" pos="0 0 .05">
{joints}
            <geom contype="1" conaffinity="1" name="agent" size=".05" type="sphere"/>
        </body>
    </worldbody>
    <actuator>
{motors}
    </actuator>
</mujoco>
"""


class MujocoPointMassWorld:
    """Host-loop world with the reference-env API (`simulate(u) -> done`,
    `get_x()`), backed by `mujoco.mj_step`. Episode semantics mirror the
    reference env: one warm-up step at reset (PointMassEnv.cpp:94), done
    once sim time passes `sim_end`, checked BEFORE stepping."""

    def __init__(self, params: WorldParams, xml_path: str | None = None) -> None:
        import mujoco

        self._mujoco = mujoco
        self.params = params
        if xml_path is not None:
            self.m = mujoco.MjModel.from_xml_path(str(xml_path))
        else:
            self.m = mujoco.MjModel.from_xml_string(_point_mass_mjcf(params))
        if self.m.nu != params.n_axes or self.m.nq != params.n_axes:
            raise ValueError(
                f"MuJoCo model has nq={self.m.nq}, nu={self.m.nu}; expected "
                f"{params.n_axes} slide joints with one motor each"
            )
        self.d = mujoco.MjData(self.m)
        self.reset()

    # -- reference-env API --------------------------------------------------
    def reset(self) -> None:
        self._mujoco.mj_resetData(self.m, self.d)
        self._mujoco.mj_step(self.m, self.d)  # warm-up (PointMassEnv.cpp:94)

    def simulate(self, u: np.ndarray) -> bool:
        """One control cycle: hold `u`, advance 1/60 s of sim time
        (PointMassEnv.cpp:115-139)."""
        if self.d.time >= self.params.sim_end:
            return True
        self.d.ctrl[:] = np.asarray(u, np.float64).reshape(-1)
        start = self.d.time
        while self.d.time - start < self.params.control_period - 1e-9:
            self._mujoco.mj_step(self.m, self.d)
        return False

    def step(self, u: np.ndarray) -> None:
        """Single physics step (the reference's `step(x, u)`,
        PointMassEnv.cpp:175-188) — used by the mismatch harness."""
        self.d.ctrl[:] = np.asarray(u, np.float64).reshape(-1)
        self._mujoco.mj_step(self.m, self.d)

    def get_x(self) -> np.ndarray:
        return np.concatenate([self.d.qpos, self.d.qvel]).astype(np.float32)

    @property
    def time(self) -> float:
        return float(self.d.time)

    def set_state(self, x: np.ndarray, time: float) -> None:
        """Restore from a checkpoint: x = [qpos, qvel], sim time."""
        n = self.params.n_axes
        x = np.asarray(x, np.float64)
        self.d.qpos[:] = x[:n]
        self.d.qvel[:] = x[n:]
        self.d.time = float(time)
        self._mujoco.mj_forward(self.m, self.d)
