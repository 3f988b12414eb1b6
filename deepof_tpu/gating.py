"""Gated soft-count extraction: distance/behavior gates, chaos labels, and
per-gate GMM / MSM decoders for contrastive embeddings.

Behavioral spec: deepof/post_hoc.py — quality-based chaos labels
(`get_supervised_chaos`, :375-444), chaos gate composition
(`add_chaos_gates`, :446-553), per-window gating series from pairwise
body-part distances or behavior combinations (`get_pairwise_distances`,
:784-961), quantile gate edges (`compute_gate_edges`, :646-706), gate
masks (`_build_gate_masks`, :707-756), and the gated GMM decoder
(`get_contrastive_soft_counts_gmm`, :1028-1174) plus the gated MSM/PCCA+
decoder (`get_contrastive_soft_counts_msm_pcca`, :1474-1595).

Host-side orchestration is numpy (per-gate model fitting is sklearn); the
moving-window reductions use cumulative sums instead of convolution loops.
Gating-series distances derive from the mm-scaled coordinate getters
rather than raw pixel tables — quantile edges adapt, so bin membership is
equivalent.
"""

from __future__ import annotations

from itertools import combinations
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from deepof_tpu.core.storage import get_dt
from deepof_tpu.core.table_dict import TableDict
from deepof_tpu.msm import (
    _temporal_smooth,
    estimate_transition_matrix,
    pcca_plus,
)


# --------------------------------------------------------------------------- #
# Windowed reductions (cumsum-based "valid" moving windows)
# --------------------------------------------------------------------------- #


def _moving_mean_valid(x: np.ndarray, w: int) -> np.ndarray:
    x = np.asarray(x, np.float64)
    if w <= 1:
        return x.astype(np.float32)
    c = np.concatenate([[0.0], np.cumsum(x)])
    return ((c[w:] - c[:-w]) / w).astype(np.float32)


def _moving_any_valid(x: np.ndarray, w: int) -> np.ndarray:
    """1 where any of the w frames in the window is truthy."""
    x = np.nan_to_num(np.asarray(x, np.float64), nan=0.0)
    if w <= 1:
        return (x > 0).astype(np.int32)
    c = np.concatenate([[0.0], np.cumsum(x)])
    return ((c[w:] - c[:-w]) > 0).astype(np.int32)


# --------------------------------------------------------------------------- #
# Chaos labels (post_hoc.py:375-444)
# --------------------------------------------------------------------------- #


def get_supervised_chaos(
    coordinates,
    quality_threshold: float = 0.75,
    frac_bps_below: float = 0.5,
    chaos_suffix: str = "chaos",
) -> TableDict:
    """Per-animal tracking-chaos flags from likelihood tables.

    A frame is chaotic for an animal when at least `frac_bps_below` of its
    body parts have likelihood below `quality_threshold` (or are missing).
    Adds an `anychaos` column OR-ing all animals.
    """
    quality = coordinates.get_quality()
    animal_ids = coordinates._animal_ids or [""]
    prefixes = (
        [aid + "_" for aid in animal_ids] if len(animal_ids) > 1 else [""]
    )

    out = {}
    for key in quality.keys():
        q_df = get_dt(quality, key)
        chaos_df = pd.DataFrame(index=q_df.index.copy())
        per_animal = []
        for mid in prefixes:
            cols = [c for c in q_df.columns if str(c).startswith(mid)]
            if not cols:
                raise ValueError(
                    f"Animal prefix {mid!r} not found in quality table {key!r}"
                )
            arr = np.array(q_df.loc[:, cols].to_numpy(), dtype=np.float32)
            bad = (~np.isfinite(arr)) | (arr < float(quality_threshold))
            chaos = (bad.mean(axis=1) >= float(frac_bps_below)).astype(np.float32)
            chaos_df[f"{mid}{chaos_suffix}"] = chaos
            per_animal.append(chaos.astype(bool))
        chaos_df["anychaos"] = np.logical_or.reduce(per_animal).astype(np.float32)
        out[key] = chaos_df

    return TableDict(
        out, typ="supervised_annotation",
        exp_conditions=coordinates.get_exp_conditions,
    )


# --------------------------------------------------------------------------- #
# Gating series (post_hoc.py:784-961)
# --------------------------------------------------------------------------- #


def get_pairwise_distances(
    coordinates,
    window_len: int,
    supervised_annotations=None,
    embedding_gates: Any = "Nose",
    behavior_combinations: bool = True,
) -> Dict[str, Dict]:
    """Per-window gating series, keyed experiment -> gate -> (T', ) array.

    Modes (matching post_hoc.py:871-961):
    - distances: 2-4 animals, no supervised annotations, a body-part name
      string -> moving-average pairwise distance per animal pair.
    - behaviors: supervised annotations given -> windowed-any per behavior,
      or binary combination codes when `behavior_combinations`.
    - fallback: a single "" gate of ones.
    """
    animal_ids = list(coordinates._animal_ids or [""])
    coords = coordinates.get_coords(center=False)
    keys = list(coords.keys())

    if (
        animal_ids != [""]
        and 2 <= len(animal_ids) <= 4
        and supervised_annotations is None
        and isinstance(embedding_gates, str)
    ):
        out: Dict[str, Dict] = {}
        for key in keys:
            tab = get_dt(coords, key)
            out[key] = {}
            for a_id, b_id in combinations(animal_ids, 2):
                cx = (f"{a_id}_{embedding_gates}", "x")
                if cx not in tab.columns:
                    raise KeyError(
                        f"Bodypart column {cx} not found in table {key!r}"
                    )
                d = np.sqrt(
                    (tab[(f"{a_id}_{embedding_gates}", "x")].to_numpy(np.float64)
                     - tab[(f"{b_id}_{embedding_gates}", "x")].to_numpy(np.float64)) ** 2
                    + (tab[(f"{a_id}_{embedding_gates}", "y")].to_numpy(np.float64)
                       - tab[(f"{b_id}_{embedding_gates}", "y")].to_numpy(np.float64)) ** 2
                )
                mask = np.isfinite(d)
                if mask.any():
                    idx = np.arange(d.size)
                    d = np.interp(idx, idx[mask], d[mask])
                else:
                    d = np.zeros_like(d)
                out[key][(a_id, b_id)] = _moving_mean_valid(d, window_len)
        return out

    if supervised_annotations is not None:
        if isinstance(embedding_gates, str):
            embedding_gates = [embedding_gates]
        requested = sorted(set(embedding_gates))
        first_key = list(supervised_annotations.keys())[0]
        available = set(get_dt(supervised_annotations, first_key).columns)
        valid = [b for b in requested if b in available]
        dropped = [b for b in requested if b not in available]
        if dropped:
            print(f"[gating] Dropped unavailable behaviors: {dropped}")
        if valid:
            out = {}
            for key in keys:
                sup = get_dt(supervised_annotations, key)
                out[key] = {}
                cols = []
                for beh in valid:
                    win = _moving_any_valid(sup[beh].to_numpy(), window_len)
                    if behavior_combinations:
                        cols.append(win)
                    else:
                        out[key][beh] = win
                if behavior_combinations and cols:
                    powers = 2 ** np.arange(len(cols), dtype=np.int64)
                    out[key]["behavior_combinations"] = (
                        powers @ np.array(cols, dtype=np.int64)
                    ).astype(np.int32)
            return out
        print("[gating] No valid behaviors remain; falling back to no gating.")

    out = {}
    for key in keys:
        t = get_dt(coords, key).shape[0]
        out[key] = {"": np.ones(max(t - window_len + 1, 0), np.float32)}
    return out


def _get_gating_series_and_gates(
    coordinates,
    animal_ids,
    window_size: int,
    supervised_annotations=None,
    embedding_gates: Any = "Center",
) -> Tuple[Dict[str, Dict], list]:
    series = get_pairwise_distances(
        coordinates, window_size,
        supervised_annotations=supervised_annotations,
        embedding_gates=embedding_gates,
        behavior_combinations=True,
    )
    first_key = list(series.keys())[0]
    gates = list(series[first_key].keys())
    if len(animal_ids) == 1 or len(animal_ids) > 4:
        gates = gates[:1] if gates else [""]
    return series, gates


def compute_gate_edges(
    coordinates,
    animal_ids: Optional[list] = None,
    *,
    keys: Optional[list] = None,
    window_size: int = 12,
    supervised_annotations=None,
    M_gates: int = 3,
    embedding_gates: Any = "Center",
    fixed_edges: Optional[list] = None,
) -> Optional[Dict[Any, np.ndarray]]:
    """Quantile bin edges of the gating series (post_hoc.py:646-706).

    Supervised (behavior) gating returns None — the series values are
    already integer bin codes.
    """
    if animal_ids is None:
        animal_ids = list(coordinates._animal_ids or [""])
    if not isinstance(embedding_gates, str):
        M_gates = 2 ** len(set(embedding_gates))

    series, gates = _get_gating_series_and_gates(
        coordinates, animal_ids, window_size,
        supervised_annotations=supervised_annotations,
        embedding_gates=embedding_gates,
    )
    if keys is None:
        keys = list(series.keys())
    if len(animal_ids) == 1 or len(animal_ids) > 4:
        M_gates = 1
    if supervised_annotations is not None:
        return None
    if fixed_edges is not None:
        if len(fixed_edges) != M_gates + 1:
            raise ValueError('fixed_edges must have length "M_gates"+1')
        edges = np.asarray(fixed_edges, np.float64).copy()
        edges[0], edges[-1] = -np.inf, np.inf
        return {gate: edges.copy() for gate in gates}

    qs = np.linspace(0, 1, M_gates + 1)
    gate_edges = {}
    for gate in gates:
        full_g = np.concatenate([series[key][gate] for key in keys])
        edges = np.nanquantile(full_g, qs).astype(np.float64)
        edges[0], edges[-1] = -np.inf, np.inf
        gate_edges[gate] = edges
    return gate_edges


def _build_gate_masks(
    keys: list,
    emb_len: Dict[str, int],
    series: Dict[str, Dict],
    gates: list,
    M_gates: int,
    supervised_annotations=None,
    gate_edges: Optional[Dict[Any, np.ndarray]] = None,
) -> Dict[Any, Dict[int, Dict[str, np.ndarray]]]:
    """Boolean masks per (gate, bin, experiment) over embedding rows."""
    gate_masks: Dict[Any, Dict[int, Dict[str, np.ndarray]]] = {}
    for gate in gates:
        full_g = np.concatenate([series[key][gate][: emb_len[key]] for key in keys])
        gate_masks[gate] = {}
        for b in range(M_gates):
            if supervised_annotations is not None:
                in_bin = full_g == b
            else:
                edges = np.asarray(gate_edges[gate], np.float64)
                if len(edges) != M_gates + 1:
                    raise ValueError(
                        f"gate_edges[{gate!r}] must have length {M_gates + 1}"
                    )
                in_bin = (full_g > edges[b]) & (full_g <= edges[b + 1])
            gate_masks[gate][b] = {}
            cum = 0
            for key in keys:
                t = emb_len[key]
                gate_masks[gate][b][key] = in_bin[cum:cum + t]
                cum += t
    return gate_masks


def _gate_to_tag(gate: Any) -> str:
    if isinstance(gate, tuple):
        return "_".join(map(str, gate))
    if gate in ("", None):
        return "all"
    return str(gate).replace("/", "-").replace(" ", "_")


def _reservoir_sample(segments: List[np.ndarray], n: int, seed: int = 0) -> np.ndarray:
    """Uniform sample of up to n rows from a list of 2-D arrays."""
    rng = np.random.default_rng(seed)
    total = sum(s.shape[0] for s in segments)
    if total <= n:
        return np.concatenate(segments, axis=0)
    pick = np.sort(rng.choice(total, size=n, replace=False))
    out, cum, j = [], 0, 0
    for s in segments:
        hi = cum + s.shape[0]
        lo_j = j
        while j < len(pick) and pick[j] < hi:
            j += 1
        if j > lo_j:
            out.append(s[pick[lo_j:j] - cum])
        cum = hi
    return np.concatenate(out, axis=0)


def _mask_to_runs(mask: np.ndarray, min_len: int = 2) -> List[Tuple[int, int]]:
    """Contiguous [start, end) runs of True at least min_len long."""
    m = np.asarray(mask, bool)
    if not m.any():
        return []
    d = np.diff(m.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if m[0]:
        starts = np.concatenate([[0], starts])
    if m[-1]:
        ends = np.concatenate([ends, [m.size]])
    return [(int(s), int(e)) for s, e in zip(starts, ends) if e - s >= min_len]


def _preprocess_gates(
    coordinates,
    embeddings: Dict[str, np.ndarray],
    animal_ids: Optional[List[str]],
    window_size: int,
    supervised_annotations,
    M_gates: int,
    embedding_gates: Any,
    gate_edges: Optional[Dict[Any, np.ndarray]],
):
    keys = list(embeddings.keys())
    if not keys:
        raise ValueError("Embeddings are empty.")
    if animal_ids is None:
        animal_ids = list(coordinates._animal_ids or [""])

    z_by_key = {k: np.asarray(get_dt(embeddings, k), np.float32) for k in keys}
    emb_len = {k: z.shape[0] for k, z in z_by_key.items()}

    m_eff = int(M_gates)
    if not isinstance(embedding_gates, str):
        m_eff = 2 ** len(set(embedding_gates))
    if (
        supervised_annotations is None
        and (len(animal_ids) == 1 or len(animal_ids) > 4)
    ):
        # Distance gating needs an animal pair; behavior gating keeps its
        # combination bins regardless of animal count (the reference
        # collapses both, which breaks single-animal chaos gating).
        m_eff = 1

    series, gates = _get_gating_series_and_gates(
        coordinates, animal_ids, window_size,
        supervised_annotations=supervised_annotations,
        embedding_gates=embedding_gates,
    )
    if supervised_annotations is None and gate_edges is None:
        # Quantile edges from the gating series (the reference requires a
        # prior compute_gate_edges() call; deriving the same edges here
        # avoids recomputing the series).
        qs = np.linspace(0, 1, m_eff + 1)
        gate_edges = {}
        for gate in gates:
            full_g = np.concatenate([series[key][gate] for key in keys])
            edges = np.nanquantile(full_g, qs).astype(np.float64)
            edges[0], edges[-1] = -np.inf, np.inf
            gate_edges[gate] = edges
    gate_masks = _build_gate_masks(
        keys, emb_len, series, gates, m_eff,
        supervised_annotations=supervised_annotations,
        gate_edges=gate_edges,
    )
    return keys, gates, gate_masks, z_by_key, m_eff


# --------------------------------------------------------------------------- #
# Gated GMM decoder (post_hoc.py:1028-1174)
# --------------------------------------------------------------------------- #


def get_contrastive_soft_counts_gmm(
    coordinates,
    embeddings: Dict[str, np.ndarray],
    animal_ids: Optional[list] = None,
    window_size: int = 12,
    supervised_annotations=None,
    N_clusters_per_gate: int = 8,
    M_gates: int = 3,
    gate_edges: Optional[Dict[Any, np.ndarray]] = None,
    reg_covar: float = 1e-5,
    sample_size: int = 200_000,
    random_state: int = 0,
    embedding_gates: Any = "Center",
    temporal_smooth_win: Optional[int] = 3,
) -> Dict[Any, TableDict]:
    """Distance/behavior-gated GMM decoder: one soft-count TableDict per
    gate, each with M_gates * N_clusters_per_gate columns (block per bin)."""
    from sklearn.mixture import GaussianMixture

    keys, gates, gate_masks, z_by_key, m_eff = _preprocess_gates(
        coordinates, embeddings, animal_ids, window_size,
        supervised_annotations, M_gates, embedding_gates, gate_edges,
    )

    models: Dict[Any, List] = {}
    for gate_idx, gate in enumerate(gates):
        models[gate] = []
        for b in range(m_eff):
            seed_b = int(random_state + 17 * b + 3 * gate_idx)
            segs = [
                z_by_key[key][np.flatnonzero(gate_masks[gate][b][key])]
                for key in keys
            ]
            segs = [s for s in segs if s.shape[0] > 0]
            n_rows = sum(s.shape[0] for s in segs)
            if n_rows < max(10, N_clusters_per_gate):
                models[gate].append(None)
                continue
            x_fit = _reservoir_sample(segs, int(sample_size), seed=seed_b)
            gmm = GaussianMixture(
                n_components=int(N_clusters_per_gate),
                covariance_type="full", reg_covar=float(reg_covar),
                random_state=seed_b, init_params="kmeans",
                max_iter=200, tol=1e-3,
            ).fit(x_fit)
            models[gate].append(gmm)

    k_total = m_eff * N_clusters_per_gate
    out = {gate: {} for gate in gates}
    for key in keys:
        z0 = z_by_key[key]
        for gate in gates:
            p = np.full((z0.shape[0], k_total), 1e-4, np.float32)
            for b in range(m_eff):
                gmm = models[gate][b]
                mask = gate_masks[gate][b][key]
                block = slice(b * N_clusters_per_gate, (b + 1) * N_clusters_per_gate)
                if gmm is None:
                    if np.any(mask):
                        p[mask, block] = 1.0 / N_clusters_per_gate
                    continue
                idx = np.flatnonzero(mask)
                if idx.size:
                    p[idx, block] = gmm.predict_proba(z0[idx]).astype(np.float32)
            if temporal_smooth_win and temporal_smooth_win > 1:
                p = _temporal_smooth(p, temporal_smooth_win)
            p = p / np.maximum(p.sum(1, keepdims=True), 1e-12)
            out[gate][key] = p

    return {
        gate: TableDict(
            out[gate], typ="unsupervised_counts",
            exp_conditions=coordinates.get_exp_conditions,
        )
        for gate in gates
    }


# --------------------------------------------------------------------------- #
# Gated MSM/PCCA+ decoder (post_hoc.py:1474-1595)
# --------------------------------------------------------------------------- #


def get_contrastive_soft_counts_msm_pcca(
    coordinates,
    embeddings: Dict[str, np.ndarray],
    animal_ids: Optional[list] = None,
    window_size: int = 12,
    supervised_annotations=None,
    N_clusters_per_gate: int = 8,
    M_gates: int = 3,
    gate_edges: Optional[Dict[Any, np.ndarray]] = None,
    n_micro: int = 200,
    lagtime: int = 3,
    sample_size: int = 200_000,
    random_state: int = 0,
    embedding_gates: Any = "Center",
    temporal_smooth_win: Optional[int] = 3,
) -> Dict[Any, TableDict]:
    """Gated MSM decoder: per (gate, bin), k-means microstates over the
    bin's embedding rows, a lagged transition matrix over contiguous runs,
    PCCA+ coarse-graining to N_clusters_per_gate macrostates, then
    membership decoding per experiment."""
    from sklearn.cluster import MiniBatchKMeans
    from sklearn.preprocessing import StandardScaler

    keys, gates, gate_masks, z_by_key, m_eff = _preprocess_gates(
        coordinates, embeddings, animal_ids, window_size,
        supervised_annotations, M_gates, embedding_gates, gate_edges,
    )

    models: Dict[Any, List] = {}
    for gate_idx, gate in enumerate(gates):
        models[gate] = []
        for b in range(m_eff):
            seed_b = int(random_state + 17 * b + 3 * gate_idx)
            run_segs = []
            for key in keys:
                z = z_by_key[key]
                for s, e in _mask_to_runs(gate_masks[gate][b][key], min_len=lagtime + 1):
                    run_segs.append(z[s:e])
            n_rows = sum(s.shape[0] for s in run_segs)
            if n_rows < max(10 * N_clusters_per_gate, n_micro):
                models[gate].append(None)
                continue
            x_fit = _reservoir_sample(run_segs, int(sample_size), seed=seed_b)
            scaler = StandardScaler().fit(x_fit)
            k_micro = int(min(n_micro, max(N_clusters_per_gate, n_rows // 10)))
            kmeans = MiniBatchKMeans(
                n_clusters=k_micro, random_state=seed_b, n_init=3,
            ).fit(scaler.transform(x_fit))
            dtrajs = [
                kmeans.predict(scaler.transform(seg)) for seg in run_segs
            ]
            trans = estimate_transition_matrix(dtrajs, k_micro, lagtime=lagtime)
            chi = pcca_plus(trans, int(N_clusters_per_gate))
            models[gate].append({"scaler": scaler, "kmeans": kmeans, "chi": chi})

    k_total = m_eff * N_clusters_per_gate
    out = {gate: {} for gate in gates}
    for key in keys:
        z0 = z_by_key[key]
        for gate in gates:
            p = np.full((z0.shape[0], k_total), 1e-4, np.float32)
            for b in range(m_eff):
                model = models[gate][b]
                mask = gate_masks[gate][b][key]
                block = slice(b * N_clusters_per_gate, (b + 1) * N_clusters_per_gate)
                if model is None:
                    if np.any(mask):
                        p[mask, block] = 1.0 / N_clusters_per_gate
                    continue
                idx = np.flatnonzero(mask)
                if idx.size:
                    d = model["kmeans"].predict(model["scaler"].transform(z0[idx]))
                    p[idx, block] = model["chi"][d].astype(np.float32)
            if temporal_smooth_win and temporal_smooth_win > 1:
                p = _temporal_smooth(p, temporal_smooth_win)
            p = p / np.maximum(p.sum(1, keepdims=True), 1e-12)
            out[gate][key] = p

    return {
        gate: TableDict(
            out[gate], typ="unsupervised_counts",
            exp_conditions=coordinates.get_exp_conditions,
        )
        for gate in gates
    }


# --------------------------------------------------------------------------- #
# Chaos gate composition (post_hoc.py:446-553)
# --------------------------------------------------------------------------- #


def add_chaos_gates(
    coordinates,
    soft_counts_dict: Dict[Any, TableDict],
    soft_counts_chaos_dict: Dict[Any, TableDict],
    supervised_chaos: TableDict,
    window_size: int,
) -> Dict[Any, TableDict]:
    """Combine regular and chaos-specific soft counts per gate.

    Windows overlapping a chaotic frame get their regular states zeroed
    and the chaotic half of the chaos extractor's states appended; clean
    windows keep regular states with zeroed chaos states.
    """
    out = {}
    chaos_cols = ["anychaos"]

    for gate, soft_counts_gate in soft_counts_dict.items():
        chaos_gate = soft_counts_chaos_dict["behavior_combinations"]
        result_gate = {}
        for key in soft_counts_gate.keys():
            ann = get_dt(supervised_chaos, key)
            sc1 = np.array(np.asarray(get_dt(soft_counts_gate, key)), np.float32)
            sc2 = np.array(np.asarray(get_dt(chaos_gate, key)), np.float32)
            n_windows = sc1.shape[0]
            ann_used = ann.iloc[: n_windows + window_size - 1]

            if sc2.shape[0] != n_windows or ann_used.shape[0] < n_windows:
                raise ValueError(
                    f"Length mismatch at key {key!r}: "
                    f"{sc1.shape[0]} vs {sc2.shape[0]} vs {ann.shape[0]}"
                )

            per_signal = []
            for col in chaos_cols:
                win = _moving_any_valid(
                    ann_used[col].to_numpy(np.float32), window_size
                ).astype(bool)
                if win.shape[0] != n_windows:
                    raise ValueError(
                        f"Convolved length mismatch for {key!r}/{col!r}: "
                        f"{win.shape[0]} vs {n_windows}"
                    )
                per_signal.append(win)
            chaos_mask = np.logical_or.reduce(per_signal)

            sc1[chaos_mask, :] = 0
            sc2[~chaos_mask, :] = 0
            n_cols_chaos = sc2.shape[1]
            if n_cols_chaos % 2 != 0:
                raise ValueError(
                    f"Chaos soft counts for {key!r} have an odd number of "
                    f"columns ({n_cols_chaos})"
                )
            result_gate[key] = np.concatenate(
                [sc1, sc2[:, n_cols_chaos // 2:]], axis=1
            )

        out[gate] = TableDict(
            result_gate, typ="unsupervised_counts",
            exp_conditions=coordinates.get_exp_conditions,
        )
    return out
