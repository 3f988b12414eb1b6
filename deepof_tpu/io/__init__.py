"""Pose-table IO: DLC (csv/h5) and SLEAP (analysis.h5/npy/slp) readers."""

from deepof_tpu.io.readers import RawTable, load_table

__all__ = ["RawTable", "load_table"]
