"""Multi-chip execution: device meshes and the sharded MPPI solve."""

from mppi_gpu_tpu.parallel.mesh import make_mesh
from mppi_gpu_tpu.parallel.sharded import ShardedMPPIController, sharded_mppi_solve

__all__ = ["make_mesh", "ShardedMPPIController", "sharded_mppi_solve"]
