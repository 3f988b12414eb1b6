"""Training harness: jitted SPMD train steps + fit loops + dispatcher.

Behavioral spec: deepof/clustering/training.py — epoch loops with gradient
clipping (:104-229), step functions step_vade / step_vqvae_distill /
step_contrastive_distill (:231-591), dispatcher train_deepof_model
(:592-885), fit_VQVAE (:1036), fit_contrastive (:1266), fit_VADE with
pretrain -> (teacher) -> GMM-init -> main phases (:1522-1717), best-val
checkpointing (:1196-1248).

TPU-first redesign: each model has ONE jitted train step (loss + grad +
optax update fused); schedule weights enter as scalar args so annealing
never recompiles; the batch is sharded over a 1-D device mesh and params
are replicated, letting XLA insert the gradient psums (replacing DDP).
VaDE's phase switching stays host-side across separately-jitted steps.
"""

from __future__ import annotations

import json
import os
import pickle
import time
import warnings
from dataclasses import asdict, dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepof_tpu.models import build_model, init_variables
from deepof_tpu.models.decoders import MaskedNormal
from deepof_tpu.parallel.mesh import (
    create_mesh,
    distributed_init_if_needed,
    is_main_process,
    ragged_eval,
    shard_batch,
)
from deepof_tpu.train.augment import (
    RotationPrecomp,
    build_rotation_precomp,
    make_augmented_view,
    recompute_edges,
    slice_time_per_sample,
)
from deepof_tpu.train.config import (
    CommonFitCfg,
    ContrastiveCfg,
    TurtleTeacherCfg,
    VaDECfg,
)
from deepof_tpu.train.checkpoint import (
    TrainCheckpointer,
    make_epoch_checkpoint_hook,
    maybe_resume,
)
from deepof_tpu.train.dataset import WindowDataset, prefetch
from deepof_tpu.train.losses import (
    select_contrastive_loss,
    soft_ce_logits,
    vade_loss,
    vade_params_from_cfg,
)
from deepof_tpu.train.schedules import WeightSchedule


# --------------------------------------------------------------------------- #
# Model bundle (the "rebuild_spec" checkpoint contract)
# --------------------------------------------------------------------------- #


@dataclass
class ModelBundle:
    """A trained model: flax module + variables + reconstruction spec.

    Mirrors the reference's checkpoints carrying a rebuild_spec with full
    constructor args (model_utils_new.py:263-330), so architecture is
    reconstructed from file.
    """

    model: Any
    variables: Dict
    rebuild_spec: Dict
    history: Dict[str, List[float]] = field(default_factory=dict)
    best_variables: Optional[Dict] = None
    best_val: Optional[float] = None
    # Best balance-and-certainty score snapshot (reference tracks best-val
    # and best-score checkpoints separately, training.py:1196-1248).
    best_score_variables: Optional[Dict] = None
    best_score: Optional[float] = None

    def apply(self, *args, **kwargs):
        return self.model.apply(self.variables, *args, **kwargs)

    def _ang(self, angles):
        return None if angles is None else jnp.asarray(angles)

    def encode(self, x, a, angles=None):
        method = "encode" if hasattr(self.model, "encode") else None
        if method:
            return self.model.apply(
                self.variables, jnp.asarray(x), jnp.asarray(a),
                self._ang(angles), method=method,
            )
        return self.model.apply(
            self.variables, jnp.asarray(x), jnp.asarray(a), self._ang(angles)
        )

    def embed(self, x, a, angles=None):
        if hasattr(self.model, "embed"):
            return self.model.apply(
                self.variables, jnp.asarray(x), jnp.asarray(a),
                self._ang(angles), method="embed",
            )
        return self.encode(x, a, angles)

    def group(self, x, a, angles=None):
        return self.model.apply(
            self.variables, jnp.asarray(x), jnp.asarray(a),
            self._ang(angles), method="group",
        )

    def save(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        payload = {
            "rebuild_spec": self.rebuild_spec,
            "variables": flax.serialization.to_bytes(self.variables),
            "history": self.history,
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    @classmethod
    def load(cls, path: str) -> "ModelBundle":
        with open(path, "rb") as f:
            payload = pickle.load(f)
        spec = payload["rebuild_spec"]
        skip = {"adjacency", "use_angles", "angle_feature_shape"}
        model = build_model(**{k: v for k, v in spec.items() if k not in skip},
                            adjacency=np.asarray(spec["adjacency"]))
        x = jnp.zeros((1,) + tuple(spec["input_shape"]), jnp.float32)
        a = jnp.zeros((1,) + tuple(spec["edge_feature_shape"]), jnp.float32)
        ang = None
        if spec.get("use_angles") and spec.get("angle_feature_shape"):
            ang = jnp.zeros(
                (1,) + tuple(spec["angle_feature_shape"]), jnp.float32
            )
        if spec["model"] in ("Contrastive", "contrastive"):
            half = spec["input_shape"][0] // 2
            x = x[:, :half]
            a = a[:, :half]
            ang = None if ang is None else ang[:, :half]
        variables = init_variables(
            model, {"params": jax.random.PRNGKey(0)}, x, a, ang, train=False
        )
        variables = flax.serialization.from_bytes(variables, payload["variables"])
        # from_bytes restores leaves as NUMPY arrays; inference jits close
        # over the variables, and a numpy constant fancy-indexed by a
        # tracer (e.g. the VQ codebook lookup) raises
        # TracerArrayConversionError. Coerce every leaf to a device array.
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        return cls(model=model, variables=variables, rebuild_spec=spec,
                   history=payload.get("history", {}))


def _compute_dtype(common: "CommonFitCfg"):
    """bf16 compute policy when use_amp is set (params stay float32 via
    param_dtype; the matmul/conv/GRU compute runs in bfloat16 — the TPU
    equivalent of the reference's AMP autocast, training.py:143-157)."""
    return jnp.bfloat16 if getattr(common, "use_amp", False) else jnp.float32


def _split_variables(variables):
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    return params, rest


def _merge_variables(params, rest):
    return {"params": params, **rest}


def _make_optimizer(learning_rate: float, clip: float = 0.75, gmm_lr: Optional[float] = None):
    """Adam + value clipping (reference: clip_grad_value_(0.75),
    training.py:115-165); optional separate lr for the GMM prior params
    (losses.py:805-832)."""
    def adam(lr):
        return optax.chain(optax.clip(clip), optax.adam(lr))

    if gmm_lr is None:
        return adam(learning_rate)

    def label_fn(params):
        def label(path, _):
            names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            if any("gmm" in str(n) for n in names):
                return "gmm"
            return "base"
        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform(
        {"base": adam(learning_rate), "gmm": adam(gmm_lr)}, label_fn
    )


def _make_vade_main_optimizer(
    learning_rate: float,
    gmm_lr: Optional[float],
    n_batches: int,
    freeze_gmm_epochs: int = 0,
    freeze_decoder_epochs: int = 0,
    clip: float = 0.75,
):
    """Main-phase VaDE optimizer with epoch-scheduled freezing.

    Mirrors the reference requires_grad freezing + lr switch at unfreeze
    (training.py:1746-1768): gmm/decoder lrs are 0 during their freeze
    windows; after the GMM unfreezes the lrs drop to 5e-4 (base) / 2e-4
    (gmm). Implemented as piecewise lr schedules so one optimizer state
    spans the whole phase (checkpoint/resume friendly); Adam moments tick
    during the freeze, unlike torch requires_grad.
    """
    fg = max(0, int(freeze_gmm_epochs)) * n_batches
    fd = max(0, int(freeze_decoder_epochs)) * n_batches
    g_lr = gmm_lr if gmm_lr is not None else learning_rate

    def piecewise(segments):
        # segments: list of (start_step, lr)
        def sched(step):
            lr = segments[0][1]
            for s, v in segments[1:]:
                lr = jnp.where(step >= s, v, lr)
            return lr
        return sched

    base_sched = piecewise([(0, learning_rate)] + ([(fg, 5e-4)] if fg else []))
    gmm_sched = piecewise(
        [(0, 0.0 if fg else g_lr)] + ([(fg, 2e-4)] if fg else [])
    )
    dec_sched = piecewise(
        [(0, 0.0 if fd else learning_rate)]
        + ([(fd, learning_rate)] if fd else [])
        + ([(fg, 5e-4)] if fg else [])
    )

    def adam(sched):
        return optax.chain(optax.clip(clip), optax.adam(sched))

    def label_fn(params):
        def label(path, _):
            names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
            if any("gmm" in n for n in names):
                return "gmm"
            if names and names[0] == "decoder":
                return "decoder"
            return "base"
        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform(
        {"base": adam(base_sched), "gmm": adam(gmm_sched),
         "decoder": adam(dec_sched)},
        label_fn,
    )


# --------------------------------------------------------------------------- #
# Step factories
# --------------------------------------------------------------------------- #


def make_vqvae_step(model, optimizer):
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rest_vars, x, a, rng, ang=None):
        def loss_fn(p):
            variables = _merge_variables(p, rest_vars)
            out, new_rest = model.apply(
                variables, x, a, ang, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            b, t = x.shape[:2]
            x_flat = x.reshape(b, t, -1)
            enc_rec = -jnp.mean(out["encoding_reconstruction"].log_prob(x_flat))
            rec = -jnp.mean(out["quantized_reconstruction"].log_prob(x_flat))
            vq = out["vq_losses"].get("vq_loss", 0.0)
            km = out["vq_losses"].get("kmeans_loss", 0.0)
            total = enc_rec + rec + vq + km
            logs = {
                "total_loss": total,
                "enc_rec_loss": enc_rec,
                "reconstruct_loss": rec,
                "vq_loss": vq,
                "kmeans_loss": km,
            }
            return total, (logs, new_rest)

        (loss, (logs, new_rest)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_rest, logs

    return step


def make_vqvae_eval_step(model):
    @jax.jit
    def step(variables, x, a, ang=None):
        out = model.apply(variables, x, a, ang, train=False)
        b, t = x.shape[:2]
        x_flat = x.reshape(b, t, -1)
        enc_rec = -jnp.mean(out["encoding_reconstruction"].log_prob(x_flat))
        rec = -jnp.mean(out["quantized_reconstruction"].log_prob(x_flat))
        vq = out["vq_losses"].get("vq_loss", 0.0)
        return {"total_loss": enc_rec + rec + vq, "reconstruct_loss": rec}

    return step


def make_vade_step(model, optimizer, loss_params):
    @partial(jax.jit, donate_argnums=(0, 1), static_argnames=())
    def step(params, opt_state, rest_vars, x, a, rng, kl_weight, lambda_distill,
             tau_star_batch, class_weight=None, ang=None):
        rng_model, rng_loss = jax.random.split(rng)

        def loss_fn(p):
            variables = _merge_variables(p, rest_vars)
            out, new_rest = model.apply(
                variables, x, a, ang, train=True, rng=rng_model,
                mutable=["batch_stats"], rngs={"dropout": rng_model},
            )
            losses = vade_loss(
                out, x, loss_params, kl_weight, rng_loss,
                tau_star_batch=tau_star_batch,
                lambda_distill=lambda_distill,
                class_weight=class_weight,
            )
            return losses["total_loss"], (losses, new_rest)

        (loss, (logs, new_rest)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_rest, logs

    return step


def make_vade_eval_step(model, loss_params):
    @jax.jit
    def step(variables, x, a, rng, kl_weight, ang=None):
        out = model.apply(variables, x, a, ang, train=False)
        losses = vade_loss(out, x, loss_params, kl_weight, rng)
        return losses

    return step


def make_contrastive_step(model, optimizer, cfg: ContrastiveCfg, edge_index, precomp):
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rest_vars, x_full, rng):
        rng_aug, rng_drop = jax.random.split(rng)
        a_full = recompute_edges(x_full, edge_index)
        x_aug, a_aug = make_augmented_view(rng_aug, x_full, edge_index, precomp, cfg)

        half = x_full.shape[1] // 2
        starts = jnp.full((x_full.shape[0],), half // 2, dtype=jnp.int32)
        x = slice_time_per_sample(x_full, starts, half)
        a = slice_time_per_sample(a_full, starts, half)

        def loss_fn(p):
            variables = _merge_variables(p, rest_vars)
            z, new_rest = model.apply(
                variables, x, a, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng_drop},
            )
            z_aug, new_rest = model.apply(
                _merge_variables(p, new_rest), x_aug, a_aug, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng_drop},
            )
            zn = z / jnp.maximum(jnp.linalg.norm(z, axis=1, keepdims=True), 1e-8)
            zan = z_aug / jnp.maximum(
                jnp.linalg.norm(z_aug, axis=1, keepdims=True), 1e-8
            )
            loss, pos, neg = select_contrastive_loss(
                zn, zan,
                similarity=cfg.contrastive_similarity_function,
                loss_fn=cfg.contrastive_loss_function,
                temperature=cfg.temperature,
                tau=cfg.tau,
                beta=cfg.beta,
            )
            logs = {"total_loss": loss, "pos_similarity": pos, "neg_similarity": neg}
            return loss, (logs, new_rest)

        (loss, (logs, new_rest)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_rest, logs

    return step


# --------------------------------------------------------------------------- #
# Fit loops
# --------------------------------------------------------------------------- #


def _epoch_mean(logs_list: List[Dict], weights: List[int] = None) -> Dict[str, float]:
    """Per-key average over batch logs, weighted by true (pre-padding)
    batch sizes so ragged final batches don't bias epoch metrics
    (shard_batch pads by repeating rows to fill the device mesh)."""
    if not logs_list:
        return {}
    keys = logs_list[0].keys()
    w = np.asarray(weights if weights is not None else [1] * len(logs_list), float)
    w = w / w.sum()
    return {
        k: float(np.sum([float(l[k]) * wi for l, wi in zip(logs_list, w)]))
        for k in keys
    }


def _chain_hooks(*hooks):
    """Compose epoch-end hooks; any hook returning True stops training
    (reference: optuna pruning callbacks, training.py:1224-1228)."""
    hooks = [h for h in hooks if h is not None]
    if not hooks:
        return None

    def combined(epoch, train_logs, val_logs):
        stop = False
        for h in hooks:
            if h(epoch, train_logs, val_logs) is True:
                stop = True
        return stop

    return combined


def _run_epochs(
    *,
    n_epochs: int,
    train_ds: WindowDataset,
    val_ds: Optional[WindowDataset],
    batch_size: int,
    mesh,
    rng_seed: int,
    train_fn,
    eval_fn,
    history: Dict[str, List[float]],
    on_epoch_end=None,
    bootstrap: bool = False,
    bootstrap_block_len: int = 250,
    limit_train_batches: Optional[int] = None,
    limit_val_batches: Optional[int] = None,
    verbose: bool = True,
    phase: str = "",
    start_epoch: int = 0,
    on_best=None,
    score_fn=None,
    on_best_score=None,
):
    """Generic epoch loop with best-val tracking; returns best val loss.

    `on_best(epoch, val_loss)` fires whenever the validation loss improves.
    When `score_fn(epoch) -> float` is given, a separate best-*score*
    checkpoint is tracked with the reference's rule (training.py:1196-1248):
    the score must improve, or tie within 0.01 with a lower validation
    loss, and only after max(3, ceil(0.1 * n_epochs)) epochs have passed.
    """
    best_val = np.inf
    best_score, best_score_val = -np.inf, np.inf
    score_start_epoch = max(3, int(np.ceil(0.1 * n_epochs)))
    score_tol = 0.01
    np_rng = np.random.default_rng(rng_seed)
    for epoch in range(start_epoch, n_epochs):
        t0 = time.time()
        logs_list = []
        for bi, (x, a, ang, idx) in enumerate(
            prefetch(
                train_ds.batches(
                    batch_size, rng=np_rng, shuffle=True,
                    bootstrap=bootstrap, block_size=bootstrap_block_len,
                )
            )
        ):
            if limit_train_batches and bi >= limit_train_batches:
                break
            logs = train_fn(x, a, ang, idx, epoch)
            if logs:  # drop-last policies may skip sub-mesh-size batches
                logs_list.append((logs, len(idx)))
        train_logs = _epoch_mean(
            [jax.device_get(l) for l, _ in logs_list],
            [n for _, n in logs_list],
        )

        val_logs = {}
        if val_ds is not None and len(val_ds) > 0 and eval_fn is not None:
            vlist = []
            for bi, (x, a, ang, idx) in enumerate(
                val_ds.batches(batch_size, rng=np_rng, shuffle=False)
            ):
                if limit_val_batches and bi >= limit_val_batches:
                    break
                vlist.append((eval_fn(x, a, ang, idx, epoch), len(idx)))
            val_logs = _epoch_mean(
                [jax.device_get(v) for v, _ in vlist],
                [n for _, n in vlist],
            )
            epoch_val = val_logs.get("total_loss", np.inf)
            if epoch_val < best_val:
                best_val = epoch_val
                if on_best is not None:
                    on_best(epoch, float(epoch_val))
            if score_fn is not None:
                score_value = float(score_fn(epoch))
                val_logs["alignment_score"] = score_value
                improved = np.isfinite(score_value) and (
                    score_value > best_score
                    or (
                        abs(score_value - best_score) <= score_tol
                        and epoch_val < best_score_val
                    )
                )
                if improved and epoch > score_start_epoch:
                    best_score, best_score_val = score_value, epoch_val
                    if on_best_score is not None:
                        on_best_score(epoch, score_value, float(epoch_val))

        for k, v in train_logs.items():
            history.setdefault(f"{phase}{k}", []).append(v)
        for k, v in val_logs.items():
            history.setdefault(f"{phase}val_{k}", []).append(v)
        if verbose and is_main_process():
            msg = ", ".join(f"{k}={v:.4f}" for k, v in list(train_logs.items())[:4])
            vmsg = (
                f" | val={val_logs.get('total_loss', float('nan')):.4f}"
                if val_logs
                else ""
            )
            print(
                f"[{phase or 'train'}] epoch {epoch + 1}/{n_epochs} "
                f"({time.time() - t0:.1f}s): {msg}{vmsg}"
            )
        if on_epoch_end is not None:
            if on_epoch_end(epoch, train_logs, val_logs) is True:
                break
    return best_val


def _init_model(model, sample_x, sample_a, seed: int, sample_ang=None):
    rngs = {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed + 1)}
    ang = None if sample_ang is None else jnp.asarray(sample_ang)
    return init_variables(
        model, rngs, jnp.asarray(sample_x), jnp.asarray(sample_a), ang,
        train=False,
    )


# --------------------------------------------------------------------------- #
# fit_VQVAE
# --------------------------------------------------------------------------- #


def fit_vqvae(
    train_ds: WindowDataset,
    val_ds: Optional[WindowDataset],
    adjacency: np.ndarray,
    common: CommonFitCfg,
    use_gnn: bool = True,
    kmeans_loss: float = 0.0,
    use_angles: bool = False,
    bootstrap: bool = False,
    bootstrap_block_len: int = 250,
    verbose: bool = True,
    checkpointer=None,
    epoch_callback=None,
) -> ModelBundle:
    x0, a0, ang0, _ = next(train_ds.batches(min(common.batch_size, max(len(train_ds), 1)), shuffle=False))
    input_shape = x0.shape[1:-1] + (x0.shape[-1],)
    # reorder: stored as (B, W, 3N); model wants (B, W, N, 3)
    raise_if_flat(x0)
    use_angles = bool(use_angles) and ang0.size > 0
    ang0 = ang0 if use_angles else None

    model = build_model(
        "VQVAE", x0.shape[1:], a0.shape[1:], adjacency,
        latent_dim=common.latent_dim, n_components=common.n_components,
        encoder_type=common.encoder_type, use_gnn=use_gnn,
        kmeans_loss=kmeans_loss, dtype=_compute_dtype(common),
    )
    variables = _init_model(model, x0, a0, common.seed or 0, sample_ang=ang0)
    params, rest = _split_variables(variables)
    optimizer = _make_optimizer(common.learning_rate)
    opt_state = optimizer.init(params)
    step = make_vqvae_step(model, optimizer)
    eval_step = make_vqvae_eval_step(model)

    mesh = create_mesh()
    state = {"params": params, "opt_state": opt_state, "rest": rest}
    rng = jax.random.PRNGKey(common.seed or 0)

    history: Dict[str, List[float]] = {}

    def train_fn(x, a, ang, idx, epoch):
        nonlocal state, rng
        rng, sub = jax.random.split(rng)
        ang = ang if use_angles else None
        x, a, ang = shard_batch((x, a, ang), mesh)
        p, o, r, logs = step(
            state["params"], state["opt_state"], state["rest"], x, a, sub,
            ang=ang,
        )
        state = {"params": p, "opt_state": o, "rest": r}
        return logs

    def eval_fn(x, a, ang, idx, epoch):
        ang = ang if use_angles else None
        variables = _merge_variables(state["params"], state["rest"])
        return ragged_eval(
            lambda b: eval_step(variables, b[0], b[1], ang=b[2]),
            (x, a, ang), mesh,
        )

    start_epoch, restored = maybe_resume(checkpointer, state)
    if restored is not None:
        state = restored

    best = {}

    def on_best(epoch, val_loss):
        best["variables"] = jax.device_get(
            _merge_variables(state["params"], state["rest"])
        )
        best["val"] = val_loss

    _run_epochs(
        n_epochs=common.epochs, train_ds=train_ds, val_ds=val_ds,
        batch_size=common.batch_size, mesh=mesh, rng_seed=common.seed or 0,
        train_fn=train_fn, eval_fn=eval_fn, history=history,
        bootstrap=bootstrap, bootstrap_block_len=bootstrap_block_len,
        limit_train_batches=common.limit_train_batches,
        limit_val_batches=common.limit_val_batches,
        verbose=verbose, start_epoch=start_epoch,
        on_epoch_end=_chain_hooks(
            make_epoch_checkpoint_hook(checkpointer, lambda: state),
            epoch_callback,
        ),
        on_best=on_best,
    )

    rebuild_spec = {
        "model": "VQVAE",
        "input_shape": list(x0.shape[1:]),
        "edge_feature_shape": list(a0.shape[1:]),
        "adjacency": np.asarray(adjacency).tolist(),
        "latent_dim": common.latent_dim,
        "n_components": common.n_components,
        "encoder_type": common.encoder_type,
        "use_gnn": use_gnn,
        "use_angles": use_angles,
        "angle_feature_shape": (
            list(ang0.shape[1:]) if use_angles else None
        ),
    }
    return ModelBundle(
        model=model,
        variables=_merge_variables(state["params"], state["rest"]),
        rebuild_spec=rebuild_spec,
        history=history,
        best_variables=best.get("variables"),
        best_val=best.get("val"),
    )


def raise_if_flat(x0):
    if x0.ndim != 4:
        raise ValueError(
            "Expected (B, W, N, F) node tensors; got flat features. Use "
            "deepof_tpu.graph_dataset.reorder_and_reshape on (B, W, 3N) stacks."
        )


# --------------------------------------------------------------------------- #
# fit_VADE (pretrain -> GMM init -> main)
# --------------------------------------------------------------------------- #


def fit_vade(
    train_ds: WindowDataset,
    val_ds: Optional[WindowDataset],
    adjacency: np.ndarray,
    common: CommonFitCfg,
    vade_cfg: VaDECfg,
    teacher_cfg: TurtleTeacherCfg,
    use_gnn: bool = True,
    use_angles: bool = False,
    bootstrap: bool = False,
    bootstrap_block_len: int = 250,
    verbose: bool = True,
    checkpointer=None,
    epoch_callback=None,
) -> ModelBundle:
    x0, a0, ang0, _ = next(train_ds.batches(min(common.batch_size, max(len(train_ds), 1)), shuffle=False))
    raise_if_flat(x0)
    use_angles = bool(use_angles) and ang0.size > 0
    ang0 = ang0 if use_angles else None

    model = build_model(
        "VaDE", x0.shape[1:], a0.shape[1:], adjacency,
        latent_dim=common.latent_dim, n_components=common.n_components,
        encoder_type=common.encoder_type, use_gnn=use_gnn,
        kmeans_loss=common.kmeans_loss, dtype=_compute_dtype(common),
    )
    variables = _init_model(model, x0, a0, common.seed or 0, sample_ang=ang0)
    params, rest = _split_variables(variables)

    mesh = create_mesh()
    rng = jax.random.PRNGKey(common.seed or 0)
    history: Dict[str, List[float]] = {}
    n_batches = max(1, train_ds.n_batches(common.batch_size))

    state = {"params": params, "rest": rest}

    tau_star = None
    class_weight = None

    best = {}

    def run_phase(phase_name, n_epochs, lr, pretrain, kl_schedule, lambda_schedule=None,
                  ckpt=None, track_best=False, optimizer=None):
        nonlocal state, rng
        loss_params = vade_params_from_cfg(common, vade_cfg, teacher_cfg, pretrain)
        if optimizer is None:
            optimizer = _make_optimizer(lr, gmm_lr=vade_cfg.gmm_learning_rate)
        opt_state = optimizer.init(state["params"])
        step = make_vade_step(model, optimizer, loss_params)
        eval_step = make_vade_eval_step(model, loss_params)
        opt = {"opt_state": opt_state}
        iteration = {"t": 0}
        n_comp = common.n_components

        def ckpt_state():
            return {
                "params": state["params"], "rest": state["rest"],
                "opt_state": opt["opt_state"],
            }

        start_epoch = 0
        if ckpt is not None:
            start_epoch, restored = maybe_resume(ckpt, ckpt_state())
            if restored is not None:
                state.update(params=restored["params"], rest=restored["rest"])
                opt["opt_state"] = restored["opt_state"]
            iteration["t"] = start_epoch * n_batches

        def train_fn(x, a, ang, idx, epoch):
            nonlocal rng
            rng, sub = jax.random.split(rng)
            klw = kl_schedule.weight_at(iteration["t"]) if kl_schedule else 0.0
            lam = lambda_schedule.weight_at(iteration["t"]) if lambda_schedule else 0.0
            iteration["t"] += 1
            if tau_star is not None and lam > 0.0:
                tau_b = tau_star[np.asarray(idx)]
            else:
                tau_b = np.zeros((x.shape[0], n_comp), np.float32)
                lam = 0.0
            ang = ang if use_angles else None
            x, a, ang, tau_b = shard_batch((x, a, ang, tau_b), mesh)
            cw = (
                jnp.asarray(class_weight)
                if (class_weight is not None and tau_star is not None)
                else None
            )
            p, o, r, logs = step(
                state["params"], opt["opt_state"], state["rest"], x, a, sub,
                jnp.float32(klw), jnp.float32(lam), tau_b, cw, ang=ang,
            )
            state.update(params=p, rest=r)
            opt["opt_state"] = o
            return logs

        def eval_fn(x, a, ang, idx, epoch):
            nonlocal rng
            rng, sub = jax.random.split(rng)
            klw = kl_schedule.weight_at(iteration["t"]) if kl_schedule else 0.0
            ang = ang if use_angles else None
            variables = _merge_variables(state["params"], state["rest"])
            return ragged_eval(
                lambda b: eval_step(
                    variables, b[0], b[1], sub, jnp.float32(klw), ang=b[2]
                ),
                (x, a, ang), mesh,
            )

        def on_best(epoch, val_loss):
            best["variables"] = jax.device_get(
                _merge_variables(state["params"], state["rest"])
            )
            best["val"] = val_loss

        def score_fn(epoch):
            # Balance-and-certainty score on up to 4 validation batches
            # (reference: compute_diagnostics max_batches=4, logging.py:149).
            from deepof_tpu.train.diagnostics import alignment_score

            variables = _merge_variables(state["params"], state["rest"])
            qs = []
            for bi, (x, a, ang, _) in enumerate(
                val_ds.batches(common.batch_size, shuffle=False)
            ):
                if bi >= 4:
                    break
                ang_b = jnp.asarray(ang) if use_angles else None
                qs.append(np.asarray(model.apply(
                    variables, jnp.asarray(x), jnp.asarray(a), ang_b,
                    method="group",
                )))
            if not qs:
                return float("nan")
            return alignment_score(np.concatenate(qs), tau_star)["alignment_score"]

        def on_best_score(epoch, score, val_loss):
            best["score_variables"] = jax.device_get(
                _merge_variables(state["params"], state["rest"])
            )
            best["score"] = score

        # Score checkpointing mirrors the reference's apply_distill gate
        # (training.py:1217): only when a teacher drives distillation.
        track_score = (
            track_best and tau_star is not None
            and val_ds is not None and len(val_ds) > 0
        )
        return _run_epochs(
            n_epochs=n_epochs, train_ds=train_ds, val_ds=val_ds,
            batch_size=common.batch_size, mesh=mesh, rng_seed=common.seed or 0,
            train_fn=train_fn, eval_fn=eval_fn, history=history,
            bootstrap=bootstrap, bootstrap_block_len=bootstrap_block_len,
            limit_train_batches=common.limit_train_batches,
            limit_val_batches=common.limit_val_batches,
            verbose=verbose, phase=phase_name, start_epoch=start_epoch,
            on_epoch_end=_chain_hooks(
                make_epoch_checkpoint_hook(ckpt, ckpt_state),
                teacher_refresh_hook if track_best else None,
                epoch_callback if track_best else None,
            ),
            on_best=on_best if track_best else None,
            score_fn=score_fn if track_score else None,
            on_best_score=on_best_score if track_score else None,
        )

    # Phase 1: pretrain (VAE mode, KL -> N(0, I)).
    if vade_cfg.pretrain_epochs > 0:
        kl_sched = WeightSchedule(
            n_batches_per_epoch=n_batches,
            mode=vade_cfg.kl_annealing_mode_pretrain,
            warmup_epochs=vade_cfg.kl_warmup_pretrain,
            max_weight=vade_cfg.kl_max_weight_pretrain,
            cooldown_epochs=vade_cfg.kl_cooldown_pretrain,
            end_weight=vade_cfg.kl_end_weight_pretrain,
        )
        run_phase("pretrain/", vade_cfg.pretrain_epochs,
                  vade_cfg.learning_rate_pretrain, True, kl_sched)

    # Phase 2 (optional): TURTLE teacher on pretrain latents.
    if teacher_cfg.use_turtle_teacher:
        from deepof_tpu.train.teacher import fit_turtle_teacher

        latents = extract_latents(
            model, state, train_ds, common.batch_size, use_angles=use_angles
        )
        tau_star, class_weight = fit_turtle_teacher(
            latents, train_ds, common, teacher_cfg
        )

    # Phase 3: GMM init of the mixture prior — from teacher assignments when
    # available (teacher_model.py:394), else from a data GMM fit
    # (models_new.py:1907-1944).
    latents = extract_latents(
        model, state, train_ds, common.batch_size, use_angles=use_angles
    )
    gmm_init = None
    if tau_star is not None and latents.shape[0] == tau_star.shape[0]:
        from deepof_tpu.train.teacher import initialize_gmm_from_teacher

        means, log_vars, _prior = initialize_gmm_from_teacher(latents, tau_star)
        gmm_init = (means, log_vars)
    elif latents.shape[0] >= common.n_components:
        from sklearn.mixture import GaussianMixture

        n_fit = min(len(latents), 100_000)
        gmm = GaussianMixture(
            n_components=common.n_components, covariance_type="diag",
            reg_covar=1e-4, random_state=common.seed or 0,
        ).fit(np.asarray(latents[:n_fit], np.float64))
        gmm_init = (gmm.means_, np.log(gmm.covariances_))
    if gmm_init is not None:
        params_mut = dict(state["params"])
        ls = dict(params_mut["latent_space"])
        ls["gmm_means"] = jnp.asarray(gmm_init[0], jnp.float32)
        ls["gmm_log_vars"] = jnp.asarray(gmm_init[1], jnp.float32)
        params_mut["latent_space"] = ls
        state["params"] = params_mut

    # Post GMM-init snapshot (reference "teacher_init" checkpoint,
    # training.py:1701-1717) so the main phase can be re-run from here.
    if checkpointer is not None and is_main_process():
        with open(
            os.path.join(checkpointer.directory, "teacher_init.pkl"), "wb"
        ) as f:
            pickle.dump(jax.device_get(state), f)

    # Phase 4: main training against the GMM prior.
    kl_sched = WeightSchedule(
        n_batches_per_epoch=n_batches,
        mode=vade_cfg.kl_annealing_mode,
        warmup_epochs=vade_cfg.kl_warmup,
        max_weight=vade_cfg.kl_max_weight,
        cooldown_epochs=vade_cfg.kl_cooldown,
        end_weight=vade_cfg.kl_end_weight,
    )
    lambda_sched = None
    if tau_star is not None:
        lambda_sched = WeightSchedule(
            n_batches_per_epoch=n_batches,
            mode="linear",
            warmup_epochs=0,
            max_weight=teacher_cfg.lambda_distill,
            at_max_epochs=teacher_cfg.lambda_decay_start,
            cooldown_epochs=teacher_cfg.lambda_cooldown,
            end_weight=teacher_cfg.lambda_end_weight,
        )
    def teacher_refresh_hook(epoch, train_logs, val_logs):
        # Periodic TURTLE refresh mid-training (training.py:1770-1810):
        # refit the teacher on current latents, optionally reinit the GMM.
        nonlocal tau_star, class_weight
        if not (
            teacher_cfg.use_turtle_teacher
            and teacher_cfg.teacher_refresh_every
            and epoch > 0
            and (epoch + 1) % teacher_cfg.teacher_refresh_every == 0
            and (
                teacher_cfg.teacher_freeze_at is None
                or (epoch + 1) <= teacher_cfg.teacher_freeze_at
            )
        ):
            return
        from deepof_tpu.train.teacher import (
            fit_turtle_teacher,
            initialize_gmm_from_teacher,
        )

        if verbose and is_main_process():
            print(f"--- Refreshing TURTLE teacher at epoch {epoch + 1} ---")
        z = extract_latents(
            model, state, train_ds, common.batch_size, use_angles=use_angles
        )
        tau_star, class_weight = fit_turtle_teacher(
            z, train_ds, common, teacher_cfg, verbose=verbose
        )
        if teacher_cfg.reinit_gmm_on_refresh:
            means, log_vars, _ = initialize_gmm_from_teacher(z, tau_star)
            params_mut = dict(state["params"])
            ls = dict(params_mut["latent_space"])
            ls["gmm_means"] = jnp.asarray(means, jnp.float32)
            ls["gmm_log_vars"] = jnp.asarray(log_vars, jnp.float32)
            params_mut["latent_space"] = ls
            state["params"] = params_mut

    main_optimizer = None
    if vade_cfg.freeze_gmm_epochs or vade_cfg.freeze_decoder_epochs:
        main_optimizer = _make_vade_main_optimizer(
            common.learning_rate, vade_cfg.gmm_learning_rate, n_batches,
            vade_cfg.freeze_gmm_epochs, vade_cfg.freeze_decoder_epochs,
        )

    run_phase("", common.epochs, common.learning_rate, False, kl_sched, lambda_sched,
              ckpt=checkpointer, track_best=True, optimizer=main_optimizer)

    rebuild_spec = {
        "model": "VaDE",
        "input_shape": list(x0.shape[1:]),
        "edge_feature_shape": list(a0.shape[1:]),
        "adjacency": np.asarray(adjacency).tolist(),
        "latent_dim": common.latent_dim,
        "n_components": common.n_components,
        "encoder_type": common.encoder_type,
        "use_gnn": use_gnn,
        "use_angles": use_angles,
        "angle_feature_shape": (
            list(ang0.shape[1:]) if use_angles else None
        ),
    }
    return ModelBundle(
        model=model,
        variables=_merge_variables(state["params"], state["rest"]),
        rebuild_spec=rebuild_spec,
        history=history,
        best_variables=best.get("variables"),
        best_val=best.get("val"),
        best_score_variables=best.get("score_variables"),
        best_score=best.get("score"),
    )


def extract_latents(
    model, state, ds: WindowDataset, batch_size: int, use_angles: bool = False
) -> np.ndarray:
    """Encoder-mean latents for the full dataset (training.py:1665-1694)."""
    variables = _merge_variables(state["params"], state["rest"])

    @jax.jit
    def embed(x, a, ang=None):
        return model.apply(variables, x, a, ang, method="embed")

    outs = []
    for x, a, ang, _ in ds.batches(batch_size, shuffle=False):
        ang_in = jnp.asarray(ang) if use_angles else None
        outs.append(np.asarray(embed(jnp.asarray(x), jnp.asarray(a), ang_in)))
    return np.concatenate(outs, axis=0) if outs else np.zeros((0, 1))


# --------------------------------------------------------------------------- #
# fit_contrastive
# --------------------------------------------------------------------------- #


def fit_contrastive(
    train_ds: WindowDataset,
    val_ds: Optional[WindowDataset],
    adjacency: np.ndarray,
    common: CommonFitCfg,
    contrastive_cfg: ContrastiveCfg,
    use_gnn: bool = True,
    bootstrap: bool = False,
    bootstrap_block_len: int = 250,
    verbose: bool = True,
    checkpointer=None,
    epoch_callback=None,
) -> ModelBundle:
    x0, a0, _ang0, _ = next(train_ds.batches(min(common.batch_size, max(len(train_ds), 1)), shuffle=False))
    raise_if_flat(x0)

    model = build_model(
        "Contrastive", x0.shape[1:], a0.shape[1:], adjacency,
        latent_dim=common.latent_dim, encoder_type=common.encoder_type,
        use_gnn=use_gnn, dtype=_compute_dtype(common),
    )
    half = x0.shape[1] // 2
    variables = _init_model(model, x0[:, :half], a0[:, :half], common.seed or 0)
    params, rest = _split_variables(variables)
    optimizer = _make_optimizer(common.learning_rate)
    opt_state = optimizer.init(params)

    # Static graph structure for augmentations.
    adjacency = np.asarray(adjacency)
    rows, cols = np.nonzero(np.triu(adjacency))
    edge_index = np.stack([rows, cols], axis=1).astype(np.int32)
    precomp = build_rotation_precomp(edge_index, adjacency.shape[0])

    step = make_contrastive_step(model, optimizer, contrastive_cfg, edge_index, precomp)

    mesh = create_mesh()
    state = {"params": params, "opt_state": opt_state, "rest": rest}
    rng = jax.random.PRNGKey(common.seed or 0)
    history: Dict[str, List[float]] = {}

    def train_fn(x, a, ang, idx, epoch):
        nonlocal state, rng
        rng, sub = jax.random.split(rng)
        # Drop (not pad) the ragged remainder: a repeated row would act as
        # a false hard negative of its twin in the contrastive similarity
        # matrix.
        (x,) = shard_batch((x,), mesh, pad_policy="drop")
        if x.shape[0] == 0:
            return {}
        p, o, r, logs = step(state["params"], state["opt_state"], state["rest"], x, sub)
        state = {"params": p, "opt_state": o, "rest": r}
        return logs

    start_epoch, restored = maybe_resume(checkpointer, state)
    if restored is not None:
        state = restored

    _run_epochs(
        n_epochs=common.epochs, train_ds=train_ds, val_ds=None,
        batch_size=common.batch_size, mesh=mesh, rng_seed=common.seed or 0,
        train_fn=train_fn, eval_fn=None, history=history,
        bootstrap=bootstrap, bootstrap_block_len=bootstrap_block_len,
        limit_train_batches=common.limit_train_batches,
        limit_val_batches=common.limit_val_batches,
        start_epoch=start_epoch,
        on_epoch_end=_chain_hooks(
            make_epoch_checkpoint_hook(checkpointer, lambda: state),
            epoch_callback,
        ),
        verbose=verbose,
    )

    rebuild_spec = {
        "model": "Contrastive",
        "input_shape": list(x0.shape[1:]),
        "edge_feature_shape": list(a0.shape[1:]),
        "adjacency": adjacency.tolist(),
        "latent_dim": common.latent_dim,
        "encoder_type": common.encoder_type,
        "use_gnn": use_gnn,
    }
    return ModelBundle(
        model=model,
        variables=_merge_variables(state["params"], state["rest"]),
        rebuild_spec=rebuild_spec,
        history=history,
    )


# --------------------------------------------------------------------------- #
# Dispatcher
# --------------------------------------------------------------------------- #


def _dataset_from_preprocessed(part, reorder: bool = True) -> WindowDataset:
    """Build a WindowDataset from a preprocessed TableDict part whose values
    are (nodes (B, W, 3N), edges (B, W, E), angles (B, W, A)) tuples."""
    from deepof_tpu.core.storage import get_dt as _get
    from deepof_tpu.graph_dataset import reorder_and_reshape

    shaped = {}
    for key in part.keys():
        nodes, edges, angles = _get(part, key)
        nodes = np.asarray(nodes, np.float32)
        edges = np.asarray(edges, np.float32)
        angles = np.asarray(angles, np.float32)
        if reorder and nodes.ndim == 3:
            nodes = reorder_and_reshape(nodes)
        if edges.ndim == 3:
            edges = edges[..., None]
        if angles.ndim == 3:
            angles = angles[..., None]
        shaped[key] = (nodes, edges, angles)
    return WindowDataset(shaped)


def train_deepof_model(
    preprocessed_object,
    adjacency_matrix: np.ndarray = None,
    model_name: str = "VaDE",
    encoder_type: str = "recurrent",
    batch_size: int = 64,
    latent_dim: int = 4,
    epochs: int = 10,
    log_history: bool = True,
    n_clusters: int = 10,
    kmeans_loss: float = 0.0,
    temperature: float = 0.1,
    contrastive_similarity_function: str = "cosine",
    contrastive_loss_function: str = "nce",
    beta: float = 0.1,
    tau: float = 0.1,
    output_path: str = ".",
    data_path: str = ".",
    pretrained: Optional[str] = None,
    save_weights: bool = True,
    run: int = 0,
    kl_annealing_mode: str = "linear",
    kl_warmup: int = 15,
    reg_cat_clusters: float = 0.0,
    recluster: bool = False,
    interaction_regularization: float = 0.0,
    bootstrap_training: bool = False,
    bootstrap_block_len: int = 250,
    random_seed: int = 0,
    use_gnn: bool = True,
    use_angles: bool = False,
    use_amp: bool = False,
    pretrain_epochs: Optional[int] = None,
    use_turtle_teacher: bool = False,
    verbose: bool = True,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1,
    epoch_callback=None,
    **kwargs,
):
    """Train one of the three model families on a preprocessed dataset.

    Returns (model_bundle, model_score, model_part, log_summary) matching
    the reference contract (training.py:592-885).
    """
    distributed_init_if_needed()

    (train_part, test_part) = preprocessed_object[0], preprocessed_object[1]
    if isinstance(preprocessed_object, tuple) and len(preprocessed_object) >= 2 and \
            isinstance(preprocessed_object[0], tuple):
        train_part, test_part = preprocessed_object[0]

    if pretrained:
        bundle = ModelBundle.load(pretrained)
        return bundle, None, None, {}

    train_ds = _dataset_from_preprocessed(train_part)
    val_ds = (
        _dataset_from_preprocessed(test_part)
        if test_part is not None and len(test_part) else None
    )

    checkpointer = (
        TrainCheckpointer(checkpoint_dir, save_interval_epochs=checkpoint_every)
        if checkpoint_dir
        else None
    )

    common = CommonFitCfg(
        model_name=model_name,
        encoder_type=encoder_type,
        batch_size=batch_size,
        latent_dim=latent_dim,
        epochs=epochs,
        n_components=n_clusters,
        kmeans_loss=kmeans_loss,
        use_amp=use_amp,
        output_path=output_path,
        data_path=data_path,
        log_history=log_history,
        save_weights=save_weights,
        run=run,
        seed=random_seed,
        interaction_regularization=interaction_regularization,
    )

    if model_name in ("VaDE", "vade"):
        vade_cfg = VaDECfg(
            reg_cat_clusters=reg_cat_clusters,
            recluster=recluster,
            kl_annealing_mode=(
                kl_annealing_mode if kl_annealing_mode != "linear" else "linear"
            ),
            kl_warmup=kl_warmup,
        )
        if pretrain_epochs is not None:
            vade_cfg.pretrain_epochs = pretrain_epochs
        for k, v in kwargs.items():
            if hasattr(vade_cfg, k):
                setattr(vade_cfg, k, v)
        teacher_cfg = TurtleTeacherCfg(use_turtle_teacher=use_turtle_teacher)
        for k, v in kwargs.items():
            if hasattr(teacher_cfg, k):
                setattr(teacher_cfg, k, v)
        bundle = fit_vade(
            train_ds, val_ds, adjacency_matrix, common, vade_cfg, teacher_cfg,
            use_gnn=use_gnn, use_angles=use_angles, bootstrap=bootstrap_training,
            bootstrap_block_len=bootstrap_block_len, verbose=verbose,
            checkpointer=checkpointer,
            epoch_callback=epoch_callback,
        )
    elif model_name in ("VQVAE", "vqvae"):
        bundle = fit_vqvae(
            train_ds, val_ds, adjacency_matrix, common,
            use_gnn=use_gnn, kmeans_loss=kmeans_loss, use_angles=use_angles,
            bootstrap=bootstrap_training,
            bootstrap_block_len=bootstrap_block_len, verbose=verbose,
            checkpointer=checkpointer,
            epoch_callback=epoch_callback,
        )
    elif model_name.lower() == "contrastive":
        ccfg = ContrastiveCfg(
            temperature=temperature,
            contrastive_similarity_function=contrastive_similarity_function,
            contrastive_loss_function=contrastive_loss_function,
            beta=beta,
            tau=tau,
        )
        for k, v in kwargs.items():
            if hasattr(ccfg, k):
                setattr(ccfg, k, v)
        bundle = fit_contrastive(
            train_ds, val_ds, adjacency_matrix, common, ccfg,
            use_gnn=use_gnn, bootstrap=bootstrap_training,
            bootstrap_block_len=bootstrap_block_len, verbose=verbose,
            checkpointer=checkpointer,
            epoch_callback=epoch_callback,
        )
    else:
        raise ValueError(f"Unknown model_name: {model_name}")

    if checkpointer is not None:
        checkpointer.close()

    log_summary = {k: v[-1] if v else None for k, v in bundle.history.items()}

    # Best balance-and-certainty score model — the reference's second return
    # value (model_score; training.py:592-885, 1252-1255).
    bundle_score = None
    if bundle.best_score_variables is not None:
        bundle_score = ModelBundle(
            model=bundle.model,
            variables=bundle.best_score_variables,
            rebuild_spec=bundle.rebuild_spec,
            history=bundle.history,
            best_score=bundle.best_score,
        )

    if save_weights and is_main_process():
        model_dir = os.path.join(output_path, "models")
        name = (
            f"{model_name}_{encoder_type}_latent{latent_dim}_"
            f"k{n_clusters}_run{run}.ckpt"
        )
        bundle.save(os.path.join(model_dir, name))
        if bundle.best_variables is not None:
            ModelBundle(
                model=bundle.model,
                variables=bundle.best_variables,
                rebuild_spec=bundle.rebuild_spec,
                history=bundle.history,
            ).save(os.path.join(model_dir, name.replace(".ckpt", "_best.ckpt")))
        if bundle_score is not None:
            bundle_score.save(
                os.path.join(model_dir, name.replace(".ckpt", "_best_score.ckpt"))
            )

    return bundle, bundle_score, None, log_summary


def deep_unsupervised_embedding(
    coordinates,
    preprocessed_object,
    adjacency_matrix: np.ndarray = None,
    embedding_model: str = "VaDE",
    encoder_type: str = "recurrent",
    batch_size: int = 64,
    latent_dim: int = 4,
    epochs: int = 150,
    n_clusters: int = 10,
    output_path: str = "",
    pretrained=False,
    save_checkpoints: bool = False,
    **kwargs,
):
    """Coordinates-level entry point (deepof/data.py:3247-3404)."""
    if pretrained:
        pretrained = os.path.join(
            coordinates._project_path, coordinates._project_name,
            "Trained_models", "models", pretrained,
        )
    return train_deepof_model(
        preprocessed_object=preprocessed_object,
        adjacency_matrix=adjacency_matrix,
        model_name=embedding_model,
        encoder_type=encoder_type,
        batch_size=batch_size,
        latent_dim=latent_dim,
        epochs=epochs,
        n_clusters=n_clusters,
        output_path=os.path.join(
            coordinates._project_path, coordinates._project_name,
            output_path, "Trained_models",
        ),
        data_path=os.path.join(
            coordinates._project_path, coordinates._project_name, "Tables"
        ),
        pretrained=pretrained,
        save_weights=save_checkpoints,
        **kwargs,
    )
