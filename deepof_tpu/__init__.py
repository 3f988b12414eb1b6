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
from deepof_tpu.core.table_dict import TableDict


def __getattr__(name):
    """Lazy submodule access (data, models, train, posthoc, visuals, ...)
    without importing jax-heavy modules at package import."""
    import importlib

    lazy = {
        "data", "models", "train", "annotate", "posthoc", "visuals",
        "visuals_utils", "evaluation", "msm", "arena", "export_video",
        "sanitycheck", "database_explorer", "legacy_compat", "profiling",
        "parallel", "cli", "gating", "graph_dataset", "utils", "io",
    }
    if name in lazy:
        return importlib.import_module(f"deepof_tpu.{name}")
    raise AttributeError(f"module 'deepof_tpu' has no attribute {name!r}")


__all__ = [
    "config",
    "ops",
    "BodyGraph",
    "build_body_graph",
    "connect_mouse",
    "TableDict",
    "__version__",
]
