"""TURTLE teacher: unsupervised multi-view task discovery for distillation.

Behavioral spec: deepof/clustering/teacher_model.py ("Let Go of Your
Labels", arXiv 2406.07236) — a task encoder producing soft assignments tau
over multiple data views (PCA of positions, speeds, optionally edges and
angles, plus the model latents), bi-level optimized so that per-view linear
heads can linearly recover tau; regularized toward confident, balanced,
non-degenerate clusterings; tau* then initializes the VaDE GMM prior and
drives distillation.

TPU-first redesign: the ENTIRE bi-level outer step — M inner SGD updates of
every per-view head (lax.scan), the refit-CE objective, entropy/balance
penalties, and the Adam update of the task encoder — is ONE jitted program;
the reference runs ~500 outer x 100 inner torch optimizer steps in Python.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def soft_ce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    targets = jnp.clip(targets, 1e-8, 1.0)
    return -(targets * log_probs).sum(-1).mean()


def _entropy(p: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    p = jnp.clip(p, eps)
    return -(p * jnp.log(p)).sum(-1)


def _normalize(f: jnp.ndarray) -> jnp.ndarray:
    return f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-8)


@dataclass
class TurtleResult:
    tau_star: np.ndarray            # (N, K)
    task_params: Dict               # trained task-encoder params
    history: List[float]


def make_turtle_step(
    feature_dims: Sequence[int],
    n_components: int,
    outer_steps: int,
    inner_steps: int = 100,
    inner_lr: float = 0.1,
    head_wd: float = 1e-4,
    head_temp: float = 0.5,
    task_temp: float = 0.5,
    gamma: float = 10.0,
    alpha_sample_entropy: float = 0.1,
    delta_death_barrier: float = 40.0,
    lr_theta: float = 5e-3,
    rho: float = 0.04,
    normalize_feats: bool = True,
):
    """Build (init_fn, step_fn) for the jitted bi-level outer step."""
    opt = optax.adam(lr_theta)
    n_views = len(feature_dims)
    log_k = float(np.log(n_components))
    dead_floor = max(1e-4, 0.1 / n_components)

    def init_fn(rng):
        keys = jax.random.split(rng, n_views)
        task_params = [
            {
                "w": jax.nn.initializers.lecun_normal()(k, (d, n_components)),
                "b": jnp.zeros(n_components),
            }
            for k, d in zip(keys, feature_dims)
        ]
        return task_params, opt.init(task_params)

    def task_forward(task_params, feats_list):
        logits = None
        for p, f in zip(task_params, feats_list):
            out = (f @ p["w"] + p["b"]) / task_temp
            logits = out if logits is None else logits + out
        return jax.nn.softmax(logits / max(n_views, 1), axis=-1)

    def fit_heads(feats_list, tau, rng):
        """M SGD steps fitting per-view linear heads to tau (lax.scan)."""
        feats_list = [
            _normalize(jax.lax.stop_gradient(f)) if normalize_feats
            else jax.lax.stop_gradient(f)
            for f in feats_list
        ]
        tau = jax.lax.stop_gradient(tau)
        keys = jax.random.split(rng, n_views)
        heads = [
            {
                "w": jax.nn.initializers.lecun_normal()(k, (f.shape[1], n_components)),
                "b": jnp.zeros(n_components),
            }
            for k, f in zip(keys, feats_list)
        ]

        def one_head(head, feats):
            def head_loss(h):
                logits = (feats @ h["w"] + h["b"]) / head_temp
                return soft_ce(logits, tau)

            def sgd_step(h, _):
                g = jax.grad(head_loss)(h)
                h = jax.tree_util.tree_map(
                    lambda p, gr: p - inner_lr * (gr + head_wd * p), h, g
                )
                return h, None

            head, _ = jax.lax.scan(sgd_step, head, None, length=inner_steps)
            return head

        return [one_head(h, f) for h, f in zip(heads, feats_list)]

    @partial(jax.jit, static_argnames=("step_is_odd",))
    def step_fn(task_params, opt_state, feats_list, rng, step_frac, step_is_odd):
        rng_heads, _ = jax.random.split(rng)

        def outer_loss(tp):
            tau = task_forward(tp, feats_list)
            heads = fit_heads(feats_list, tau, rng_heads)
            norm_feats = [
                _normalize(f) if normalize_feats else f for f in feats_list
            ]
            ce = 0.0
            for h, f in zip(heads, norm_feats):
                logits = jax.lax.stop_gradient(f @ h["w"] + h["b"]) / head_temp
                ce = ce + soft_ce(logits, tau)
            ce = ce / max(n_views, 1)

            sample_entropy = _entropy(tau).mean()
            marginal = tau.mean(0)
            h_marg = _entropy(marginal[None]).mean()
            marg_gap = jax.nn.relu(log_k - h_marg)
            gamma_t = gamma * (1.0 - step_frac)

            usage = (jnp.clip(tau, 1e-8) ** 2.0).mean(0)
            dead_pen = jax.nn.relu(dead_floor - usage).sum() / (
                dead_floor * n_components
            )
            delta_t = delta_death_barrier * jnp.maximum(
                0.5, 0.6 + 0.4 * (1.0 - step_frac)
            )

            loss = (
                ce
                + alpha_sample_entropy * sample_entropy
                + gamma_t * marg_gap
                + delta_t * dead_pen
            )
            if step_is_odd and rho > 0.0:
                smooth = jnp.abs(tau[1:] - tau[:-1]).sum(-1).mean()
                loss = loss + rho * smooth
            return loss

        loss, grads = jax.value_and_grad(outer_loss)(task_params)
        updates, opt_state = opt.update(grads, opt_state, task_params)
        task_params = optax.apply_updates(task_params, updates)
        return task_params, opt_state, loss

    return init_fn, step_fn, task_forward


def build_views(
    x_all: np.ndarray,
    latents: Optional[np.ndarray],
    edges_all: Optional[np.ndarray] = None,
    angles_all: Optional[np.ndarray] = None,
    pca_nodes_dim: int = 32,
    pca_edges_dim: int = 32,
    pca_angles_dim: int = 32,
    include_nodes: bool = True,
    include_latent: bool = True,
    include_edges: bool = False,
    include_angles: bool = False,
) -> List[np.ndarray]:
    """Multi-view features: PCA of positions / speeds (/edges /angles) +
    latents (teacher_model.py:464-709)."""
    from sklearn.decomposition import PCA

    views: List[np.ndarray] = []
    n = x_all.shape[0]

    def pca_view(flat, dim):
        dim = min(dim, flat.shape[1], max(2, n - 1))
        return PCA(n_components=dim).fit_transform(flat).astype(np.float32)

    if include_nodes:
        pos = x_all[..., :2].reshape(n, -1)
        views.append(pca_view(pos, pca_nodes_dim))
        if x_all.shape[-1] > 2:
            spd = x_all[..., 2:3].reshape(n, -1)
            views.append(pca_view(spd, pca_nodes_dim))
    if include_edges and edges_all is not None and edges_all.size:
        views.append(pca_view(edges_all.reshape(n, -1), pca_edges_dim))
    if include_angles and angles_all is not None and angles_all.size:
        views.append(pca_view(angles_all.reshape(n, -1), pca_angles_dim))
    if include_latent and latents is not None:
        views.append(np.asarray(latents, np.float32))
    return views


def fit_turtle_teacher(
    latents: np.ndarray,
    train_ds,
    common,
    teacher_cfg,
    verbose: bool = True,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Fit the teacher and return (tau_star (N, K), class_weight (K,))."""
    n = len(train_ds)
    x_all = train_ds.x if hasattr(train_ds, "x") else None
    if x_all is None:  # pragma: no cover - h5-spilled datasets
        xs = [x for x, _, _, _ in train_ds.batches(4096, shuffle=False)]
        x_all = np.concatenate(xs)
    views = build_views(
        np.asarray(x_all),
        latents,
        edges_all=getattr(train_ds, "a", None),
        angles_all=getattr(train_ds, "angles", None),
        pca_nodes_dim=teacher_cfg.pca_nodes_dim,
        pca_edges_dim=teacher_cfg.pca_edges_dim,
        pca_angles_dim=teacher_cfg.pca_angles_dim,
        include_nodes=bool(teacher_cfg.include_nodes_view),
        include_latent=bool(teacher_cfg.include_latent_view),
        include_edges=bool(teacher_cfg.include_edges_view),
        include_angles=bool(teacher_cfg.include_angles_view),
    )
    feature_dims = [v.shape[1] for v in views]

    init_fn, step_fn, task_forward = make_turtle_step(
        feature_dims,
        common.n_components,
        outer_steps=teacher_cfg.teacher_outer_steps,
        inner_steps=teacher_cfg.teacher_inner_steps,
        head_temp=teacher_cfg.teacher_head_temp,
        task_temp=teacher_cfg.teacher_task_temp,
        gamma=teacher_cfg.teacher_gamma,
        alpha_sample_entropy=teacher_cfg.teacher_alpha_sample_entropy,
        normalize_feats=bool(teacher_cfg.teacher_normalize_feats),
    )
    rng = jax.random.PRNGKey(common.seed or 0)
    task_params, opt_state = init_fn(rng)

    batch_size = min(teacher_cfg.teacher_batch_size, n)
    outer_steps = teacher_cfg.teacher_outer_steps
    np_rng = np.random.default_rng(common.seed or 0)
    history = []
    for step in range(outer_steps):
        idx = np_rng.choice(n, size=batch_size, replace=False)
        feats = [jnp.asarray(v[idx]) for v in views]
        rng, sub = jax.random.split(rng)
        task_params, opt_state, loss = step_fn(
            task_params, opt_state, feats, sub,
            jnp.float32(step / max(1, outer_steps)), bool(step % 2),
        )
        history.append(float(loss))
        if verbose and (step % 50 == 0 or step == outer_steps - 1):
            print(f"[Teacher] step {step:03d} | loss {float(loss):.4f}")

    # Full-dataset tau*.
    taus = []
    for s in range(0, n, 8192):
        feats = [jnp.asarray(v[s : s + 8192]) for v in views]
        taus.append(np.asarray(task_forward(task_params, feats)))
    tau_star = np.concatenate(taus)

    # Inverse-marginal class reweighting (losses.py:344-360).
    class_weight = None
    beta = teacher_cfg.distill_class_reweight_beta
    if beta:
        pi = np.clip(tau_star.mean(0), 1e-8, None)
        w = pi ** (-beta)
        w = w / w.mean()
        if teacher_cfg.distill_class_reweight_cap is not None:
            w = np.clip(w, None, teacher_cfg.distill_class_reweight_cap)
        class_weight = w.astype(np.float32)

    return tau_star.astype(np.float32), class_weight


def initialize_gmm_from_teacher(
    z_all: np.ndarray, tau_star: np.ndarray, min_var: float = 1e-4,
    min_mass: float = 1e-6,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Weighted-moment GMM parameters from teacher assignments
    (teacher_model.py:394-460). Returns (means, log_vars, prior)."""
    z = np.asarray(z_all, np.float64)
    tau = np.asarray(tau_star, np.float64)
    mass = tau.sum(0) + min_mass
    prior = np.clip(mass / mass.sum(), 1e-8, 1.0)
    means = (tau.T @ z) / mass[:, None]
    diffs = z[:, None, :] - means[None]
    variances = (tau[..., None] * diffs**2).sum(0) / mass[:, None]
    variances = np.clip(variances, min_var, None)
    log_vars = np.log(variances)
    tiny = mass <= 1e-4
    if tiny.any():
        gm = z.mean(0)
        gv = np.clip(z.var(0), min_var, None)
        means[tiny] = gm
        log_vars[tiny] = np.log(gv)
    return (
        means.astype(np.float32),
        log_vars.astype(np.float32),
        prior.astype(np.float32),
    )
