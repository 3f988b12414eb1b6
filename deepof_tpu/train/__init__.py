"""Training harness: configs, losses, schedules, data pipeline, fit loops."""

from deepof_tpu.train.config import (
    CommonFitCfg,
    ContrastiveCfg,
    TurtleTeacherCfg,
    VaDECfg,
)
from deepof_tpu.train.harness import deep_unsupervised_embedding, train_deepof_model
from deepof_tpu.train.tuning import tune_deepof_model

__all__ = [
    "CommonFitCfg",
    "ContrastiveCfg",
    "TurtleTeacherCfg",
    "VaDECfg",
    "train_deepof_model",
    "deep_unsupervised_embedding",
    "tune_deepof_model",
]
