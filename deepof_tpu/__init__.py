"""deepof_tpu — a TPU-native behavioral-phenotyping framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of mlfpm/deepof:
pose-trajectory preprocessing, kinematic feature extraction, rule-based
supervised behavior annotation, graph-aware deep clustering (VaDE, VQ-VAE,
contrastive), post-hoc statistics, and visualization — designed for batched
tensor execution on TPU device meshes rather than per-DataFrame host loops.
"""

__version__ = "0.1.0"

from deepof_tpu import config, ops
from deepof_tpu.core.graph import BodyGraph, build_body_graph, connect_mouse

__all__ = [
    "config",
    "ops",
    "BodyGraph",
    "build_body_graph",
    "connect_mouse",
    "__version__",
]
