"""Timing, profiling, and debug utilities."""

from mppi_gpu_tpu.utils.timing import SolveTimer, time_fn

__all__ = ["SolveTimer", "time_fn"]
