"""Inference: per-experiment embeddings and soft cluster assignments.

Behavioral spec: deepof/clustering/model_utils_new.py:452-750
(embedding_per_video): per experiment, re-run the preprocessing with the
stored global scaler and the model's window size at stride 1, run the
encoder in batches, and extract soft counts from the model head (or a GMM /
MSM fit on the embeddings for contrastive models).

The device loop is a single jitted batched forward; experiments stream
through it host-side.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from deepof_tpu.core.storage import get_dt
from deepof_tpu.core.table_dict import TableDict
from deepof_tpu.graph_dataset import reorder_and_reshape


def _batched_forward(bundle, x_all, a_all, model_name, batch_size: int = 256):
    emb_list, sc_list = [], []

    if model_name == "VaDE":
        @jax.jit
        def fwd(x, a):
            out = bundle.model.apply(bundle.variables, x, a, train=False)
            return out["latent"], out["categorical"]
    elif model_name == "VQVAE":
        @jax.jit
        def fwd(x, a):
            out = bundle.model.apply(bundle.variables, x, a, train=False)
            return out["encoder_output"], out["soft_counts"]
    else:  # Contrastive
        @jax.jit
        def fwd(x, a):
            z = bundle.model.apply(bundle.variables, x, a, train=False)
            return z, None

    n = x_all.shape[0]
    for s in range(0, n, batch_size):
        xb = jnp.asarray(x_all[s : s + batch_size])
        ab = jnp.asarray(a_all[s : s + batch_size])
        emb, sc = fwd(xb, ab)
        emb_list.append(np.asarray(emb))
        if sc is not None:
            sc_list.append(np.asarray(sc))
    emb = np.concatenate(emb_list) if emb_list else np.zeros((0, 1))
    sc = np.concatenate(sc_list) if sc_list else None
    return emb, sc


def embedding_per_video(
    coordinates,
    to_preprocess: TableDict,
    model,
    meta_info: Dict,
    supervised_annotations=None,
    scale: str = "standard",
    animal_id: Optional[str] = None,
    global_scaler: Any = None,
    softcounts_extraction_method: Optional[str] = None,
    n_components: Optional[int] = None,
    samples_max: int = 227272,
    batch_size: int = 256,
):
    """Produce embeddings and soft_counts TableDicts for every experiment.

    Args:
        coordinates: the project Coordinates.
        to_preprocess: merged feature TableDict (as produced inside
            get_graph_dataset).
        model: a trained ModelBundle.
        meta_info: preprocessing metainfo (standardize modes).
        global_scaler: the scaler fitted at training time.
        softcounts_extraction_method: None (model head) | "gmm".
    """
    model_name = model.rebuild_spec["model"]
    window_size = model.rebuild_spec["input_shape"][0]
    if model_name == "Contrastive":
        window_size = model.rebuild_spec["input_shape"][0]

    embeddings, soft_counts = {}, {}
    for key in to_preprocess.keys():
        single = to_preprocess.filter_videos([key])
        single[key] = get_dt(single, key)
        if hasattr(single[key], "isna") and single[key].isna().all().all():
            continue

        processed, _, _ = single.preprocess(
            coordinates=coordinates,
            scale=scale,
            window_size=window_size,
            window_step=1,
            shuffle=False,
            pretrained_scaler=global_scaler,
            dist_standardize=meta_info.get("dist_standardize", "per_column"),
            speed_standardize=meta_info.get("speed_standardize", "per_column"),
            coord_standardize=meta_info.get("coord_standardize", "per_column"),
        )
        windows = np.asarray(get_dt(processed[0], key), np.float32)

        node_cols = meta_info.get("node_columns")
        edge_cols = meta_info.get("edge_columns")
        if node_cols is not None:
            # Column layout from the training-time graph dataset build.
            all_cols = list(get_dt(single, key).columns)
            node_idx = [all_cols.index(c) for c in node_cols]
            edge_idx = [all_cols.index(c) for c in edge_cols]
            x_flat = windows[:, :, node_idx]
            a_flat = windows[:, :, edge_idx]
        else:
            n_nodes = model.rebuild_spec["input_shape"][1]
            x_flat = windows[:, :, : 3 * n_nodes]
            a_flat = windows[:, :, 3 * n_nodes :]

        x_all = reorder_and_reshape(x_flat)
        a_all = a_flat[..., None]
        if model_name == "Contrastive":
            half = x_all.shape[1] // 2
            base = (x_all.shape[1] - half) // 2
            x_in = x_all[:, base : base + half]
            a_in = a_all[:, base : base + half]
        else:
            x_in, a_in = x_all, a_all

        emb, sc = _batched_forward(model, x_in, a_in, model_name, batch_size)
        embeddings[key] = pd.DataFrame(emb)
        if sc is not None:
            soft_counts[key] = pd.DataFrame(sc)

    # Contrastive (or explicit request): extract soft counts from the
    # embeddings via GMM, MSM+PCCA+, or an HMM
    # (model_utils_new.py:620-750 extraction paths).
    k = n_components or (model.rebuild_spec.get("n_components") or 10)
    if model_name == "Contrastive" and softcounts_extraction_method is None:
        softcounts_extraction_method = "msm"
    if (not soft_counts) or softcounts_extraction_method in (
        "gmm", "msm", "hmm", "combined",
    ):
        method = softcounts_extraction_method or "gmm"
        emb_arrays = {key: np.asarray(e) for key, e in embeddings.items()}
        if method in ("msm", "combined"):
            from deepof_tpu.msm import get_soft_counts_msm

            counts = get_soft_counts_msm(emb_arrays, n_components=k)
        elif method == "hmm":
            from deepof_tpu.msm import get_soft_counts_hmm

            counts = get_soft_counts_hmm(emb_arrays, n_states=k)
        else:
            from sklearn.mixture import GaussianMixture

            pooled = np.concatenate(list(emb_arrays.values()))
            gmm = GaussianMixture(
                n_components=k, covariance_type="diag", reg_covar=1e-4
            ).fit(pooled)
            counts = {
                key: gmm.predict_proba(e) for key, e in emb_arrays.items()
            }
        if method == "combined":
            # MSM first; frames whose MSM assignment is uncertain get
            # re-assigned by a GMM fit on those frames
            # (model_utils_new.py "combined" path).
            from sklearn.mixture import GaussianMixture

            uncertain = {
                key: counts[key].max(1) < 0.6 for key in counts
            }
            pooled_unc = np.concatenate(
                [emb_arrays[key][m] for key, m in uncertain.items() if m.any()]
            ) if any(m.any() for m in uncertain.values()) else None
            if pooled_unc is not None and len(pooled_unc) >= k:
                gmm = GaussianMixture(
                    n_components=k, covariance_type="diag", reg_covar=1e-4
                ).fit(pooled_unc)
                for key, m in uncertain.items():
                    if m.any():
                        counts[key][m] = gmm.predict_proba(emb_arrays[key][m])
        for key, c in counts.items():
            soft_counts[key] = pd.DataFrame(c)

    table_path = coordinates._table_path
    emb_td = TableDict(
        embeddings, typ="unsupervised_embedding", table_path=table_path,
        animal_ids=coordinates._animal_ids, exp_conditions=coordinates._exp_conditions,
    )
    sc_td = TableDict(
        soft_counts, typ="unsupervised_counts", table_path=table_path,
        animal_ids=coordinates._animal_ids, exp_conditions=coordinates._exp_conditions,
    )
    return emb_td, sc_td
