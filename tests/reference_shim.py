"""Import shim for the upstream reference package at /root/reference.

The reference (mlfpm/deepof v0.9.0) depends on ~17 packages that are not
installed here (duckdb, umap, numba, shapely, shap, ...). None of them are
needed for the A/B parity surface we test (pure-numpy/pandas kernels, torch
model forwards, Project.create on the bundled fixtures), so this module
installs auto-attribute stub modules for the missing names before importing
``deepof``. numba gets a real shim (``njit`` -> identity decorator,
``prange`` -> ``range``) so the reference's numba kernels run as plain
Python.

Usage::

    from reference_shim import load_reference
    deepof = load_reference()          # the real reference package
    ref_utils = deepof.utils

This module never touches /root/reference on disk; it only imports it.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.machinery
import sys
import types

REFERENCE_ROOT = "/root/reference"

#: top-level module names absent from this environment (checked 2026-08-16)
STUB_MODULES = (
    "catboost",
    "deeptime",
    "duckdb",
    "natsort",
    "optuna",
    "ot",
    "pomegranate",
    "seglearn",
    "segment_anything",
    "shap",
    "shapely",
    "sleap_io",
    "spektral",
    "statannotations",
    "umap",
    "xgboost",
)


class _AutoStub:
    """Placeholder object: any attribute access returns another _AutoStub.

    Calling it returns another stub, so decorator-style and constructor-style
    uses at import time don't explode. Actually *executing* a stubbed code
    path raises via ``__iter__``/``__bool__`` being unusual rather than
    silently producing garbage data.
    """

    def __init__(self, name: str):
        self._name = name

    def __getattr__(self, item: str) -> "_AutoStub":
        if item.startswith("__") and item.endswith("__"):
            raise AttributeError(item)
        return _AutoStub(f"{self._name}.{item}")

    def __call__(self, *args, **kwargs) -> "_AutoStub":
        return _AutoStub(f"{self._name}()")

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<reference_shim stub {self._name}>"

    def __mro_entries__(self, bases):
        # Allow ``class X(stub.Base):`` at import time.
        return (object,)


class _StubModule(types.ModuleType):
    def __getattr__(self, item: str):
        if item.startswith("__") and item.endswith("__"):
            raise AttributeError(item)
        stub = _AutoStub(f"{self.__name__}.{item}")
        setattr(self, item, stub)
        return stub


class _StubFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    """Meta-path finder serving stub modules for STUB_MODULES subtrees."""

    def find_spec(self, fullname, path=None, target=None):
        top = fullname.split(".", 1)[0]
        if top in STUB_MODULES:
            return importlib.machinery.ModuleSpec(fullname, self)
        return None

    def create_module(self, spec):
        mod = _StubModule(spec.name)
        mod.__path__ = []  # mark as package so submodule imports resolve here
        return mod

    def exec_module(self, module):
        pass


def _make_numba_shim() -> types.ModuleType:
    nb = types.ModuleType("numba")

    def njit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def deco(fn):
            return fn

        return deco

    nb.njit = njit
    nb.jit = njit
    nb.prange = range
    nb.__path__ = []
    return nb


_installed = False


def install() -> None:
    """Install the stub finder + numba shim and put the reference on sys.path."""
    global _installed
    if _installed:
        return
    if "numba" not in sys.modules:
        sys.modules["numba"] = _make_numba_shim()
    if not any(isinstance(f, _StubFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _StubFinder())
    # torch is installed but tensorboard may not be importable under it.
    try:
        importlib.import_module("torch.utils.tensorboard")
    except Exception:
        tb = _StubModule("torch.utils.tensorboard")
        tb.SummaryWriter = _AutoStub("SummaryWriter")
        sys.modules["torch.utils.tensorboard"] = tb
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    _installed = True


def load_reference():
    """Import and return the reference ``deepof`` package (cached)."""
    install()
    # deepof.utils and deepof.data import each other; importing data first
    # resolves the cycle the same way the package's own __init__ does.
    importlib.import_module("deepof.data")
    return importlib.import_module("deepof")


if __name__ == "__main__":
    pkg = load_reference()
    print("reference deepof loaded:", pkg.__file__)
    from deepof.clustering import models_new

    print("models_new loaded:", models_new.__file__)
