"""Legacy model compatibility: pickle shims and SMOTE reimplementation.

Behavioral spec: deepof/legacy_smote_handling.py — unpickling shims mapping
old imblearn pipeline classes onto local equivalents (:74-94), a minimal
SMOTE reimplementation (:97), and a resampled-classifier wrapper (:147),
so pre-trained immobility estimators pickled against old library versions
still load.
"""

from __future__ import annotations

import io
import pickle
from typing import Any, Optional

import numpy as np
from sklearn.base import BaseEstimator, ClassifierMixin


class SimpleSMOTE:
    """Minimal SMOTE: oversample the minority class by interpolating
    between nearest same-class neighbors."""

    def __init__(self, k_neighbors: int = 5, random_state: Optional[int] = None):
        self.k_neighbors = k_neighbors
        self.random_state = random_state

    # sklearn clone() support (used by ResampledClassifier.fit and
    # cross_validate; the reference inherits these from BaseEstimator)
    def get_params(self, deep: bool = True):
        return {"k_neighbors": self.k_neighbors, "random_state": self.random_state}

    def set_params(self, **params):
        for k, v in params.items():
            setattr(self, k, v)
        return self

    def fit_resample(self, x: np.ndarray, y: np.ndarray):
        from sklearn.neighbors import NearestNeighbors

        x = np.asarray(x, float)
        y = np.asarray(y)
        rng = np.random.default_rng(self.random_state)
        classes, counts = np.unique(y, return_counts=True)
        if len(classes) < 2:
            return x, y
        majority = counts.max()
        xs, ys = [x], [y]
        for cls, count in zip(classes, counts):
            need = majority - count
            if need <= 0:
                continue
            x_cls = x[y == cls]
            k = min(self.k_neighbors + 1, len(x_cls))
            if k < 2:
                idx = rng.integers(0, len(x_cls), size=need)
                xs.append(x_cls[idx])
                ys.append(np.full(need, cls, dtype=y.dtype))
                continue
            nn = NearestNeighbors(n_neighbors=k).fit(x_cls)
            neigh = nn.kneighbors(x_cls, return_distance=False)[:, 1:]
            base = rng.integers(0, len(x_cls), size=need)
            pick = neigh[base, rng.integers(0, neigh.shape[1], size=need)]
            gap = rng.random((need, 1))
            synth = x_cls[base] + gap * (x_cls[pick] - x_cls[base])
            xs.append(synth)
            ys.append(np.full(need, cls, dtype=y.dtype))
        return np.concatenate(xs), np.concatenate(ys)



class ResampledClassifier(BaseEstimator, ClassifierMixin):
    """Classifier wrapper that resamples (X, y) inside fit before training
    (legacy_smote_handling.py:147-186).

    A proper sklearn estimator: clonable, usable inside Pipeline and
    cross_validate, exposing fitted ``estimator_``/``resampler_``/
    ``classes_`` attributes and delegating prediction to the fitted
    estimator.
    """

    def __init__(self, estimator=None, resampler: Optional[Any] = None):
        self.estimator = estimator
        self.resampler = resampler

    def fit(self, x, y, **fit_params):
        from sklearn.base import clone

        x, y = np.asarray(x), np.asarray(y)
        self.estimator_ = clone(self.estimator)
        if self.resampler is None:
            xr, yr = x, y
        else:
            self.resampler_ = clone(self.resampler)
            xr, yr = self.resampler_.fit_resample(x, y)
        self.estimator_.fit(xr, yr, **fit_params)
        self.classes_ = getattr(self.estimator_, "classes_", np.unique(yr))
        return self

    def predict(self, x):
        return self.estimator_.predict(np.asarray(x))

    def predict_proba(self, x):
        return self.estimator_.predict_proba(np.asarray(x))

    def score(self, x, y):  # pragma: no cover - convenience
        return self.estimator_.score(np.asarray(x), np.asarray(y))


_SHIMS = {
    ("imblearn.pipeline", "Pipeline"): ("sklearn.pipeline", "Pipeline"),
    ("imblearn.over_sampling._smote.base", "SMOTE"): (__name__, "SimpleSMOTE"),
    ("imblearn.over_sampling", "SMOTE"): (__name__, "SimpleSMOTE"),
    ("deepof.legacy_smote_handling", "SimpleSMOTE"): (__name__, "SimpleSMOTE"),
    ("deepof.legacy_smote_handling", "ResampledClassifier"): (
        __name__, "ResampledClassifier",
    ),
}


class _CompatUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        target = _SHIMS.get((module, name))
        if target is not None:
            module, name = target
        return super().find_class(module, name)


def load_pickle_compat(path: str) -> Any:
    """Unpickle with legacy-class shims (legacy_smote_handling.py:74-94)."""
    with open(path, "rb") as f:
        return _CompatUnpickler(f).load()


def loads_pickle_compat(data: bytes) -> Any:
    return _CompatUnpickler(io.BytesIO(data)).load()
