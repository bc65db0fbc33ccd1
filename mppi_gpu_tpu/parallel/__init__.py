"""Multi-chip execution: device meshes, the sharded MPPI solve, and the
multi-host bootstrap."""

from mppi_gpu_tpu.parallel.fleet import ShardedFleetController
from mppi_gpu_tpu.parallel.mesh import make_mesh
from mppi_gpu_tpu.parallel.multihost import (
    global_mesh,
    init_multihost,
    is_coordinator,
)
from mppi_gpu_tpu.parallel.sharded import ShardedMPPIController, sharded_mppi_solve

__all__ = [
    "make_mesh",
    "ShardedFleetController",
    "ShardedMPPIController",
    "sharded_mppi_solve",
    "init_multihost",
    "global_mesh",
    "is_coordinator",
]
