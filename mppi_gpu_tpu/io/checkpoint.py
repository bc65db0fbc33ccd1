"""Checkpoint / resume for the closed control loop.

The reference has no checkpointing at all — its closest analog is the
per-step full-state CSV dump (reference src/main.cu:256, 355-367) from which
a solve could only be inspected, not resumed. Here the loop state is small
and explicit — (step index, nominal sequence U, PRNG key, world state) — so
a checkpoint is a single `.npz` with the config embedded, and resuming
reproduces the exact future of an uninterrupted run: the per-step key is
derived by folding the step counter into the base key, so no RNG stream
state beyond the base key needs saving.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import jax
import numpy as np

from mppi_gpu_tpu.config import MPPIConfig


@dataclass(frozen=True)
class Checkpoint:
    step: int               # next control step to execute
    U: np.ndarray           # (T, a) nominal action sequence
    key_data: np.ndarray    # raw PRNG key data (uint32)
    x: np.ndarray           # (s,) world state at `step`
    time: float             # world sim time at `step`
    cfg: MPPIConfig

    def key(self) -> jax.Array:
        return jax.random.wrap_key_data(jax.numpy.asarray(self.key_data))


def save_checkpoint(
    path: str | os.PathLike,
    *,
    step: int,
    U,
    key: jax.Array,
    x,
    time: float,
    cfg: MPPIConfig,
) -> None:
    tmp = f"{path}.tmp"
    np.savez(
        tmp,
        step=np.int64(step),
        U=np.asarray(U, np.float32),
        key_data=np.asarray(jax.random.key_data(key)),
        x=np.asarray(x, np.float32),
        time=np.float64(time),
        cfg_json=np.bytes_(json.dumps(asdict(cfg)).encode()),
    )
    # np.savez appends .npz to paths without it; normalize then atomic-rename
    written = tmp if str(tmp).endswith(".npz") else f"{tmp}.npz"
    os.replace(written, path)


def load_checkpoint(path: str | os.PathLike) -> Checkpoint:
    with np.load(path, allow_pickle=False) as z:
        cfg_raw = json.loads(bytes(z["cfg_json"]).decode())

        def detuple(v):
            # json round-trips tuples as lists, recursively (e.g. the nested
            # obstacles tuples); MPPIConfig must stay fully hashable
            return tuple(detuple(x) for x in v) if isinstance(v, list) else v

        cfg = MPPIConfig(**{k: detuple(v) for k, v in cfg_raw.items()})
        return Checkpoint(
            step=int(z["step"]),
            U=z["U"],
            key_data=z["key_data"],
            x=z["x"],
            time=float(z["time"]),
            cfg=cfg,
        )
