"""ctypes bindings for the native C++ world simulator (csrc/world.cpp).

Host-side like the reference's MuJoCo env; builds the shared library on first
use if the `.so` is missing (one `g++` invocation, <1 s). Falls back cleanly:
``native_available()`` returns False when no toolchain exists, and callers use
the pure-JAX world instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

from mppi_gpu_tpu.envs.params import WorldParams

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_SO = _CSRC / "libmppiworld.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-Wall", "-shared", "-fPIC", "-o", str(_SO), "world.cpp"],
            cwd=_CSRC,
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        src = _CSRC / "world.cpp"
        stale = _SO.exists() and src.exists() and src.stat().st_mtime > _SO.stat().st_mtime
        if (not _SO.exists() or stale) and not _build() and not _SO.exists():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
            _bind(lib)
        except (OSError, AttributeError):
            # AttributeError: a stale pre-built .so that predates a newer
            # symbol (and g++ was unavailable to rebuild) — treat exactly
            # like a load failure so callers fall back to the JAX world.
            _load_failed = True
            return None
        _lib = lib
        return _lib


def _bind(lib: ctypes.CDLL) -> None:
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.mppi_world_create.restype = ctypes.c_void_p
    lib.mppi_world_create.argtypes = [ctypes.c_int] + [ctypes.c_float] * 9
    lib.mppi_world_destroy.argtypes = [ctypes.c_void_p]
    lib.mppi_world_reset.argtypes = [ctypes.c_void_p]
    lib.mppi_world_simulate.restype = ctypes.c_int
    lib.mppi_world_simulate.argtypes = [ctypes.c_void_p, f32p]
    lib.mppi_world_step.argtypes = [ctypes.c_void_p, f32p]
    lib.mppi_world_get_x.argtypes = [ctypes.c_void_p, f32p]
    lib.mppi_world_time.restype = ctypes.c_float
    lib.mppi_world_time.argtypes = [ctypes.c_void_p]
    lib.mppi_world_set_state.argtypes = [ctypes.c_void_p, f32p, ctypes.c_float]
    lib.mppi_pendulum_create.restype = ctypes.c_void_p
    lib.mppi_pendulum_create.argtypes = [ctypes.c_float] * 9
    lib.mppi_pendulum_destroy.argtypes = [ctypes.c_void_p]
    lib.mppi_pendulum_reset.argtypes = [ctypes.c_void_p]
    lib.mppi_pendulum_simulate.restype = ctypes.c_int
    lib.mppi_pendulum_simulate.argtypes = [ctypes.c_void_p, f32p]
    lib.mppi_pendulum_step.argtypes = [ctypes.c_void_p, f32p]
    lib.mppi_pendulum_get_x.argtypes = [ctypes.c_void_p, f32p]
    lib.mppi_pendulum_time.restype = ctypes.c_float
    lib.mppi_pendulum_time.argtypes = [ctypes.c_void_p]
    lib.mppi_pendulum_set_state.argtypes = [ctypes.c_void_p, f32p, ctypes.c_float]
    lib.mppi_cartpole_create.restype = ctypes.c_void_p
    lib.mppi_cartpole_create.argtypes = [ctypes.c_float] * 10
    lib.mppi_cartpole_destroy.argtypes = [ctypes.c_void_p]
    lib.mppi_cartpole_reset.argtypes = [ctypes.c_void_p]
    lib.mppi_cartpole_simulate.restype = ctypes.c_int
    lib.mppi_cartpole_simulate.argtypes = [ctypes.c_void_p, f32p]
    lib.mppi_cartpole_step.argtypes = [ctypes.c_void_p, f32p]
    lib.mppi_cartpole_get_x.argtypes = [ctypes.c_void_p, f32p]
    lib.mppi_cartpole_time.restype = ctypes.c_float
    lib.mppi_cartpole_time.argtypes = [ctypes.c_void_p]
    lib.mppi_cartpole_set_state.argtypes = [ctypes.c_void_p, f32p, ctypes.c_float]
    lib.mppi_quadrotor_create.restype = ctypes.c_void_p
    lib.mppi_quadrotor_create.argtypes = [ctypes.c_float] * 10
    lib.mppi_quadrotor_destroy.argtypes = [ctypes.c_void_p]
    lib.mppi_quadrotor_reset.argtypes = [ctypes.c_void_p]
    lib.mppi_quadrotor_simulate.restype = ctypes.c_int
    lib.mppi_quadrotor_simulate.argtypes = [ctypes.c_void_p, f32p]
    lib.mppi_quadrotor_step.argtypes = [ctypes.c_void_p, f32p]
    lib.mppi_quadrotor_get_x.argtypes = [ctypes.c_void_p, f32p]
    lib.mppi_quadrotor_time.restype = ctypes.c_float
    lib.mppi_quadrotor_time.argtypes = [ctypes.c_void_p]
    lib.mppi_quadrotor_set_state.argtypes = [ctypes.c_void_p, f32p, ctypes.c_float]
    lib.mppi_quadrotor3d_create.restype = ctypes.c_void_p
    lib.mppi_quadrotor3d_create.argtypes = [ctypes.c_float] * 14
    lib.mppi_quadrotor3d_destroy.argtypes = [ctypes.c_void_p]
    lib.mppi_quadrotor3d_reset.argtypes = [ctypes.c_void_p]
    lib.mppi_quadrotor3d_simulate.restype = ctypes.c_int
    lib.mppi_quadrotor3d_simulate.argtypes = [ctypes.c_void_p, f32p]
    lib.mppi_quadrotor3d_step.argtypes = [ctypes.c_void_p, f32p]
    lib.mppi_quadrotor3d_get_x.argtypes = [ctypes.c_void_p, f32p]
    lib.mppi_quadrotor3d_time.restype = ctypes.c_float
    lib.mppi_quadrotor3d_time.argtypes = [ctypes.c_void_p]
    lib.mppi_quadrotor3d_set_state.argtypes = [ctypes.c_void_p, f32p, ctypes.c_float]
    lib.mppi_world_steps_per_control.restype = ctypes.c_int
    lib.mppi_world_steps_per_control.argtypes = [ctypes.c_void_p]
    lib.mppi_world_rollout.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int, f32p]


def native_available() -> bool:
    return _load() is not None


class NativePointMassWorld:
    """Reference-env-shaped API over the native simulator:
    ``simulate(u) -> done``, ``get_x() -> x``, ``step(u)``, ``reset()``."""

    def __init__(self, params: WorldParams) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native world library unavailable (no prebuilt csrc/libmppiworld.so "
                "and building with g++ failed); use envs.PointMassWorld instead"
            )
        self._lib = lib
        self.params = params
        self._handle = lib.mppi_world_create(
            params.n_axes,
            ctypes.c_float(params.mass),
            ctypes.c_float(params.armature),
            ctypes.c_float(params.damping),
            ctypes.c_float(params.gear),
            ctypes.c_float(params.ctrl_range),
            ctypes.c_float(params.joint_range),
            ctypes.c_float(params.timestep),
            ctypes.c_float(params.control_period),
            ctypes.c_float(params.sim_end),
        )
        if not self._handle:
            raise RuntimeError("mppi_world_create failed")

    def __del__(self) -> None:  # pragma: no cover
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.mppi_world_destroy(handle)
            self._handle = None

    def _uptr(self, u: np.ndarray) -> np.ndarray:
        u = np.ascontiguousarray(u, dtype=np.float32)
        if u.shape != (self.params.n_axes,):
            raise ValueError(f"u must have shape ({self.params.n_axes},), got {u.shape}")
        return u

    def reset(self) -> None:
        self._lib.mppi_world_reset(self._handle)

    def simulate(self, u: np.ndarray) -> bool:
        u = self._uptr(u)
        return bool(
            self._lib.mppi_world_simulate(
                self._handle, u.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
        )

    def step(self, u: np.ndarray) -> None:
        u = self._uptr(u)
        self._lib.mppi_world_step(
            self._handle, u.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )

    def get_x(self) -> np.ndarray:
        x = np.empty((2 * self.params.n_axes,), np.float32)
        self._lib.mppi_world_get_x(
            self._handle, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return x

    @property
    def time(self) -> float:
        return float(self._lib.mppi_world_time(self._handle))

    def set_state(self, x: np.ndarray, time: float) -> None:
        """Restore from a checkpoint: x = [q, qd], sim time."""
        x = np.ascontiguousarray(x, dtype=np.float32)
        if x.shape != (2 * self.params.n_axes,):
            raise ValueError(f"x must have shape ({2 * self.params.n_axes},)")
        self._lib.mppi_world_set_state(
            self._handle, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_float(time),
        )

    def rollout(self, u_seq: np.ndarray) -> np.ndarray:
        """Open-loop rollout (mismatch harness): (n, a) controls →
        (n+1, 2a) trajectory including the initial state."""
        u_seq = np.ascontiguousarray(u_seq, dtype=np.float32)
        n, a = u_seq.shape
        if a != self.params.n_axes:
            raise ValueError(f"u_seq must be (n, {self.params.n_axes})")
        traj = np.empty((n + 1, 2 * a), np.float32)
        self._lib.mppi_world_rollout(
            self._handle,
            u_seq.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            traj.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return traj


class NativePendulumWorld:
    """Reference-env-shaped API over the native pendulum simulator (the
    second family's analog of :class:`NativePointMassWorld`)."""

    def __init__(self, params) -> None:  # params: envs.pendulum_world.PendulumParams
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native world library unavailable (no prebuilt csrc/libmppiworld.so "
                "and building with g++ failed); use envs.PendulumWorld instead"
            )
        self._lib = lib
        self.params = params
        self._handle = lib.mppi_pendulum_create(
            ctypes.c_float(params.mass),
            ctypes.c_float(params.length),
            ctypes.c_float(params.gravity),
            ctypes.c_float(params.damping),
            ctypes.c_float(params.max_torque),
            ctypes.c_float(params.timestep),
            ctypes.c_float(params.control_period),
            ctypes.c_float(params.sim_end),
            ctypes.c_float(params.init_theta),
        )
        if not self._handle:
            raise RuntimeError("mppi_pendulum_create failed")

    def __del__(self) -> None:  # pragma: no cover
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.mppi_pendulum_destroy(handle)
            self._handle = None

    def _uptr(self, u: np.ndarray) -> np.ndarray:
        u = np.ascontiguousarray(u, dtype=np.float32)
        if u.shape != (1,):
            raise ValueError(f"u must have shape (1,), got {u.shape}")
        return u

    def reset(self) -> None:
        self._lib.mppi_pendulum_reset(self._handle)

    def simulate(self, u: np.ndarray) -> bool:
        u = self._uptr(u)
        return bool(
            self._lib.mppi_pendulum_simulate(
                self._handle, u.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
        )

    def step(self, u: np.ndarray) -> None:
        u = self._uptr(u)
        self._lib.mppi_pendulum_step(
            self._handle, u.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )

    def get_x(self) -> np.ndarray:
        x = np.empty((2,), np.float32)
        self._lib.mppi_pendulum_get_x(
            self._handle, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return x

    @property
    def time(self) -> float:
        return float(self._lib.mppi_pendulum_time(self._handle))

    def set_state(self, x: np.ndarray, time: float) -> None:
        x = np.ascontiguousarray(x, dtype=np.float32)
        if x.shape != (2,):
            raise ValueError("x must have shape (2,)")
        self._lib.mppi_pendulum_set_state(
            self._handle, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_float(time),
        )


class NativeCartPoleWorld:
    """Reference-env-shaped API over the native cart-pole simulator."""

    def __init__(self, params) -> None:  # params: envs.cartpole_world.CartPoleParams
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native world library unavailable; use envs.CartPoleWorld instead"
            )
        self._lib = lib
        self.params = params
        self._handle = lib.mppi_cartpole_create(
            ctypes.c_float(params.cart_mass),
            ctypes.c_float(params.pole_mass),
            ctypes.c_float(params.pole_length),
            ctypes.c_float(params.gravity),
            ctypes.c_float(params.max_force),
            ctypes.c_float(params.track_limit),
            ctypes.c_float(params.timestep),
            ctypes.c_float(params.control_period),
            ctypes.c_float(params.sim_end),
            ctypes.c_float(params.init_theta),
        )
        if not self._handle:
            raise RuntimeError("mppi_cartpole_create failed")

    def __del__(self) -> None:  # pragma: no cover
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.mppi_cartpole_destroy(handle)
            self._handle = None

    def _uptr(self, u: np.ndarray) -> np.ndarray:
        u = np.ascontiguousarray(u, dtype=np.float32)
        if u.shape != (1,):
            raise ValueError(f"u must have shape (1,), got {u.shape}")
        return u

    def reset(self) -> None:
        self._lib.mppi_cartpole_reset(self._handle)

    def simulate(self, u: np.ndarray) -> bool:
        u = self._uptr(u)
        return bool(
            self._lib.mppi_cartpole_simulate(
                self._handle, u.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
        )

    def step(self, u: np.ndarray) -> None:
        u = self._uptr(u)
        self._lib.mppi_cartpole_step(
            self._handle, u.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )

    def get_x(self) -> np.ndarray:
        x = np.empty((4,), np.float32)
        self._lib.mppi_cartpole_get_x(
            self._handle, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return x

    @property
    def time(self) -> float:
        return float(self._lib.mppi_cartpole_time(self._handle))

    def set_state(self, x: np.ndarray, time: float) -> None:
        x = np.ascontiguousarray(x, dtype=np.float32)
        if x.shape != (4,):
            raise ValueError("x must have shape (4,)")
        self._lib.mppi_cartpole_set_state(
            self._handle, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_float(time),
        )


class NativeQuadrotorWorld:
    """Reference-env-shaped API over the native planar-quadrotor simulator
    (fourth model family; csrc/world.cpp quadrotor section)."""

    def __init__(self, params) -> None:  # params: envs.quadrotor_world.QuadrotorParams
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native world library unavailable; use envs.QuadrotorWorld instead"
            )
        self._lib = lib
        self.params = params
        self._handle = lib.mppi_quadrotor_create(
            ctypes.c_float(params.mass),
            ctypes.c_float(params.inertia),
            ctypes.c_float(params.arm),
            ctypes.c_float(params.gravity),
            ctypes.c_float(params.max_thrust),
            ctypes.c_float(params.timestep),
            ctypes.c_float(params.control_period),
            ctypes.c_float(params.sim_end),
            ctypes.c_float(params.init_x),
            ctypes.c_float(params.init_z),
        )
        if not self._handle:
            raise RuntimeError("mppi_quadrotor_create failed")

    def __del__(self) -> None:  # pragma: no cover
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.mppi_quadrotor_destroy(handle)
            self._handle = None

    def _uptr(self, u: np.ndarray) -> np.ndarray:
        u = np.ascontiguousarray(u, dtype=np.float32)
        if u.shape != (2,):
            raise ValueError(f"u must have shape (2,), got {u.shape}")
        return u

    def reset(self) -> None:
        self._lib.mppi_quadrotor_reset(self._handle)

    def simulate(self, u: np.ndarray) -> bool:
        u = self._uptr(u)
        return bool(
            self._lib.mppi_quadrotor_simulate(
                self._handle, u.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
        )

    def step(self, u: np.ndarray) -> None:
        u = self._uptr(u)
        self._lib.mppi_quadrotor_step(
            self._handle, u.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )

    def get_x(self) -> np.ndarray:
        x = np.empty((6,), np.float32)
        self._lib.mppi_quadrotor_get_x(
            self._handle, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return x

    @property
    def time(self) -> float:
        return float(self._lib.mppi_quadrotor_time(self._handle))

    def set_state(self, x: np.ndarray, time: float) -> None:
        x = np.ascontiguousarray(x, dtype=np.float32)
        if x.shape != (6,):
            raise ValueError("x must have shape (6,)")
        self._lib.mppi_quadrotor_set_state(
            self._handle, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_float(time),
        )


class NativeQuadrotor3DWorld:
    """Reference-env-shaped API over the native 3-D quadrotor simulator
    (fifth model family; csrc/world.cpp quadrotor3d section)."""

    def __init__(self, params) -> None:  # params: envs.quadrotor3d_world.Quadrotor3DParams
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native world library unavailable; use envs.Quadrotor3DWorld instead"
            )
        self._lib = lib
        self.params = params
        self._handle = lib.mppi_quadrotor3d_create(
            ctypes.c_float(params.mass),
            ctypes.c_float(params.inertia[0]),
            ctypes.c_float(params.inertia[1]),
            ctypes.c_float(params.inertia[2]),
            ctypes.c_float(params.arm),
            ctypes.c_float(params.kappa),
            ctypes.c_float(params.gravity),
            ctypes.c_float(params.max_thrust),
            ctypes.c_float(params.timestep),
            ctypes.c_float(params.control_period),
            ctypes.c_float(params.sim_end),
            ctypes.c_float(params.init_pos[0]),
            ctypes.c_float(params.init_pos[1]),
            ctypes.c_float(params.init_pos[2]),
        )
        if not self._handle:
            raise RuntimeError("mppi_quadrotor3d_create failed")

    def __del__(self) -> None:  # pragma: no cover
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.mppi_quadrotor3d_destroy(handle)
            self._handle = None

    def _uptr(self, u: np.ndarray) -> np.ndarray:
        u = np.ascontiguousarray(u, dtype=np.float32)
        if u.shape != (4,):
            raise ValueError(f"u must have shape (4,), got {u.shape}")
        return u

    def reset(self) -> None:
        self._lib.mppi_quadrotor3d_reset(self._handle)

    def simulate(self, u: np.ndarray) -> bool:
        u = self._uptr(u)
        return bool(
            self._lib.mppi_quadrotor3d_simulate(
                self._handle, u.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
        )

    def step(self, u: np.ndarray) -> None:
        u = self._uptr(u)
        self._lib.mppi_quadrotor3d_step(
            self._handle, u.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )

    def get_x(self) -> np.ndarray:
        x = np.empty((13,), np.float32)
        self._lib.mppi_quadrotor3d_get_x(
            self._handle, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return x

    @property
    def time(self) -> float:
        return float(self._lib.mppi_quadrotor3d_time(self._handle))

    def set_state(self, x: np.ndarray, time: float) -> None:
        x = np.ascontiguousarray(x, dtype=np.float32)
        if x.shape != (13,):
            raise ValueError("x must have shape (13,)")
        self._lib.mppi_quadrotor3d_set_state(
            self._handle, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_float(time),
        )
