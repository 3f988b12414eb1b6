"""Hyperparameter search over train_deepof_model.

Behavioral spec: the reference's optuna integration — pruning hooks inside
the fit loops (deepof/clustering/training.py:1224-1228) and the tuning
path of the training CLI. optuna is not available in this environment, so
the default engine is a self-contained random search with successive
halving (ASHA-style rungs, resumed through the orbax checkpointer rather
than retrained); when optuna IS importable it is used transparently with
a TPE sampler.

Search-space grammar (values in the `search_space` dict):
- list/tuple of discrete choices            -> categorical
- {"low": a, "high": b}                     -> uniform float
- {"low": a, "high": b, "log": True}        -> log-uniform float
- {"low": a, "high": b, "int": True}        -> uniform integer
"""

from __future__ import annotations

import math
import os
import shutil
from typing import Any, Dict, List, Optional

import numpy as np


def _sample(space: Dict[str, Any], rng: np.random.Generator) -> Dict[str, Any]:
    out = {}
    for name, spec in space.items():
        if isinstance(spec, (list, tuple)):
            out[name] = spec[int(rng.integers(len(spec)))]
        elif isinstance(spec, dict):
            lo, hi = spec["low"], spec["high"]
            if spec.get("log"):
                val = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
            else:
                val = float(rng.uniform(lo, hi))
            out[name] = int(round(val)) if spec.get("int") else val
        else:
            raise ValueError(f"Bad search-space entry for {name!r}: {spec!r}")
    return out


def _metric_from_summary(summary: Dict[str, Any], metric: str) -> float:
    if metric in summary and summary[metric] is not None:
        return float(summary[metric])
    # Fall back to the un-validated loss (e.g. contrastive has no val set).
    alt = metric.replace("val_", "")
    if alt in summary and summary[alt] is not None:
        return float(summary[alt])
    raise KeyError(
        f"Metric {metric!r} not in training summary (keys: {sorted(summary)})"
    )


def tune_deepof_model(
    preprocessed_object,
    adjacency_matrix,
    search_space: Dict[str, Any],
    n_trials: int = 10,
    epochs_per_trial: int = 10,
    metric: str = "val_total_loss",
    mode: str = "min",
    halving: bool = False,
    halving_eta: int = 2,
    seed: int = 0,
    trial_dir: Optional[str] = None,
    use_optuna: Optional[bool] = None,
    verbose: bool = True,
    **fixed_kwargs,
) -> Dict[str, Any]:
    """Search `search_space` and return the best configuration.

    Returns {"best_params", "best_value", "trials": [{params, value,
    epochs}, ...]}. With `halving=True`, trials start at
    epochs_per_trial // eta^rungs epochs and only the top 1/eta advance to
    the next rung, resuming from their checkpoints (requires `trial_dir`).
    """
    from deepof_tpu.train.harness import train_deepof_model

    sign = 1.0 if mode == "min" else -1.0

    if use_optuna is None:
        try:
            # stub-rejecting import: a test harness may have installed an
            # auto-stub "optuna" into sys.modules (see utils.import_optional)
            from deepof_tpu.utils import import_optional

            import_optional("optuna")
            use_optuna = True
        except ImportError:
            use_optuna = False

    fixed = dict(fixed_kwargs)
    fixed.setdefault("save_weights", False)
    fixed.setdefault("verbose", False)

    def run_trial(params: Dict[str, Any], epochs: int, ckpt: Optional[str],
                  epoch_callback=None):
        kw = dict(fixed)
        kw.update(params)
        if ckpt:
            kw["checkpoint_dir"] = ckpt
        _, _, _, summary = train_deepof_model(
            preprocessed_object, adjacency_matrix=adjacency_matrix,
            epochs=epochs, epoch_callback=epoch_callback, **kw,
        )
        return _metric_from_summary(summary, metric)

    if use_optuna:
        import optuna

        def objective(trial):
            params = {}
            for name, spec in search_space.items():
                if isinstance(spec, (list, tuple)):
                    params[name] = trial.suggest_categorical(name, list(spec))
                elif spec.get("int"):
                    params[name] = trial.suggest_int(name, spec["low"], spec["high"])
                else:
                    params[name] = trial.suggest_float(
                        name, spec["low"], spec["high"], log=bool(spec.get("log"))
                    )

            def report_and_prune(epoch, train_logs, val_logs):
                v = val_logs.get("total_loss", train_logs.get("total_loss"))
                if v is not None:
                    trial.report(sign * float(v), epoch)
                    if trial.should_prune():
                        raise optuna.TrialPruned()

            return sign * run_trial(
                params, epochs_per_trial, None, epoch_callback=report_and_prune
            )

        study = optuna.create_study(
            direction="minimize",
            sampler=optuna.samplers.TPESampler(seed=seed),
            pruner=optuna.pruners.MedianPruner(),
        )
        study.optimize(objective, n_trials=n_trials)
        trials = [
            {"params": t.params, "value": sign * t.value, "epochs": epochs_per_trial}
            for t in study.trials
            if t.value is not None
        ]
        return {
            "best_params": study.best_params,
            "best_value": sign * study.best_value,
            "trials": trials,
        }

    # ---------------- self-contained engine ---------------- #
    rng = np.random.default_rng(seed)
    candidates: List[Dict[str, Any]] = [_sample(search_space, rng) for _ in range(n_trials)]

    if not halving:
        trials = []
        for i, params in enumerate(candidates):
            value = run_trial(params, epochs_per_trial, None)
            trials.append({"params": params, "value": value, "epochs": epochs_per_trial})
            if verbose:
                print(f"[tune] trial {i + 1}/{n_trials}: {metric}={value:.5f} {params}")
        best = min(trials, key=lambda t: sign * t["value"])
        return {"best_params": best["params"], "best_value": best["value"], "trials": trials}

    if trial_dir is None:
        raise ValueError("halving=True requires trial_dir for resume checkpoints")
    n_rungs = max(1, int(math.floor(math.log(max(len(candidates), 1), halving_eta))))
    epochs_now = max(1, epochs_per_trial // (halving_eta ** n_rungs))
    alive = list(range(len(candidates)))
    trials = [
        {"params": p, "value": math.inf * sign, "epochs": 0} for p in candidates
    ]
    while alive:
        for idx in alive:
            ckpt = os.path.join(trial_dir, f"trial_{idx}")
            value = run_trial(candidates[idx], epochs_now, ckpt)
            trials[idx]["value"] = value
            trials[idx]["epochs"] = epochs_now
            if verbose:
                print(
                    f"[tune] rung epochs={epochs_now} trial {idx}: "
                    f"{metric}={value:.5f}"
                )
        if epochs_now >= epochs_per_trial or len(alive) == 1:
            break
        alive = sorted(alive, key=lambda i: sign * trials[i]["value"])
        alive = alive[: max(1, len(alive) // halving_eta)]
        epochs_now = min(epochs_per_trial, epochs_now * halving_eta)
    # Drop losers' checkpoints.
    for idx in range(len(candidates)):
        if idx not in alive:
            shutil.rmtree(os.path.join(trial_dir, f"trial_{idx}"), ignore_errors=True)
    best_idx = min(alive, key=lambda i: sign * trials[i]["value"])
    return {
        "best_params": candidates[best_idx],
        "best_value": trials[best_idx]["value"],
        "trials": trials,
    }
