"""CSV/trajectory IO matching the reference's outputs (src/main.cu:32-156)."""

from mppi_gpu_tpu.io.csvio import write_traj_csv, write_step_dump_csv

__all__ = ["write_traj_csv", "write_step_dump_csv"]
