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


def _extract_pair_to_gate_key(coordinates, extract_pair: Optional[list]):
    """Gate key for the soft-counts dict (model_utils_new.py:494-526)."""
    animal_ids = list(coordinates._animal_ids or [""])
    if extract_pair is None:
        if len(animal_ids) <= 1:
            return ""
        return tuple(sorted(animal_ids[:2]))
    if extract_pair == [""]:
        return ""
    if not isinstance(extract_pair, (list, tuple)) or len(extract_pair) != 2:
        raise AssertionError(
            'extract_pair must be a two-id list, or [""] for single-animal'
        )
    a, b = extract_pair
    if a not in animal_ids or b not in animal_ids:
        raise AssertionError(f"Animal IDs {a}, {b} not in {animal_ids}")
    return tuple(sorted([a, b]))


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
    extract_pair: Optional[list] = None,
    embedding_gates: Any = "Center",
    states_per_gate: Optional[int] = None,
    M_gates: int = 3,
    quality_threshold: float = 0.75,
    frac_bps_below: float = 0.5,
    n_micro: int = 200,
    lagtime: int = 3,
):
    """Produce embeddings and soft_counts TableDicts for every experiment.

    Args:
        coordinates: the project Coordinates.
        to_preprocess: merged feature TableDict (as produced inside
            get_graph_dataset).
        model: a trained ModelBundle.
        meta_info: preprocessing metainfo (standardize modes).
        global_scaler: the scaler fitted at training time.
        softcounts_extraction_method: None (model head) | "gmm" | "msm" |
            "hmm" | "combined". For multi-animal projects, "gmm" / "msm" /
            "combined" run the gate-aware decoders (distance-gated per
            animal pair; "combined" additionally overlays chaos gates from
            tracking quality — model_utils_new.py:452-750).
        extract_pair: which animal pair's gate to return (default: the
            first two animal ids, or the ungated "" gate single-animal).
        embedding_gates / states_per_gate / M_gates: gate configuration
            forwarded to deepof_tpu.gating.
    """
    model_name = model.rebuild_spec["model"]
    window_size = model.rebuild_spec["input_shape"][0]
    if model_name == "Contrastive":
        window_size = model.rebuild_spec["input_shape"][0]

    embeddings, soft_counts = {}, {}
    from deepof_tpu.utils import progress

    for key in progress(
        list(to_preprocess.keys()), desc="Computing embeddings", verbose=True
    ):
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
    # embeddings via the gated GMM / MSM+PCCA+ decoders or an HMM
    # (model_utils_new.py:620-750 extraction paths).
    k = n_components or (model.rebuild_spec.get("n_components") or 10)
    k_gate = states_per_gate or k
    if model_name == "Contrastive" and softcounts_extraction_method is None:
        softcounts_extraction_method = "msm"
    if (not soft_counts) or softcounts_extraction_method in (
        "gmm", "msm", "hmm", "combined",
    ):
        method = softcounts_extraction_method or "gmm"
        emb_arrays = {key: np.asarray(e) for key, e in embeddings.items()}
        if method == "hmm":
            from deepof_tpu.msm import get_soft_counts_hmm

            counts = get_soft_counts_hmm(emb_arrays, n_states=k)
        else:
            from deepof_tpu import gating

            gate_key = _extract_pair_to_gate_key(coordinates, extract_pair)
            common = dict(
                coordinates=coordinates, embeddings=emb_arrays,
                animal_ids=None, window_size=window_size,
                supervised_annotations=supervised_annotations,
                embedding_gates=embedding_gates,
                N_clusters_per_gate=k_gate, M_gates=M_gates,
            )
            if method == "gmm":
                counts_dict = gating.get_contrastive_soft_counts_gmm(**common)
            else:  # "msm" / "combined"
                counts_dict = gating.get_contrastive_soft_counts_msm_pcca(
                    n_micro=n_micro, lagtime=lagtime,
                    temporal_smooth_win=1, **common,
                )
                if method == "combined":
                    chaos = gating.get_supervised_chaos(
                        coordinates, quality_threshold, frac_bps_below
                    )
                    chaos_common = dict(common)
                    chaos_common.update(
                        supervised_annotations=chaos,
                        embedding_gates=["anychaos"],
                        temporal_smooth_win=1,
                    )
                    chaos_dict = gating.get_contrastive_soft_counts_gmm(
                        **chaos_common
                    )
                    counts_dict = gating.add_chaos_gates(
                        coordinates, counts_dict, chaos_dict, chaos,
                        window_size,
                    )
            if gate_key not in counts_dict:
                # Behavior-gated runs key on behavior names, and sorted
                # pair keys may not match the project's id order.
                gate_key = list(counts_dict.keys())[0]
            counts = counts_dict[gate_key]
        for key, c in counts.items():
            soft_counts[key] = pd.DataFrame(np.asarray(c))

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
