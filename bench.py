"""North-star benchmark: preprocess -> embed throughput on one chip.

Measures frames/sec through the full tensor path on a synthetic 1-hour
25 fps multi-animal (2x deepof_14) recording:
  raw pixel keypoints
  -> fused preprocess (Savitzky-Golay, outlier masking, presence-masked
     interpolation, missing-animal NaN) [deepof_tpu.ops]
  -> mm scaling + arena centering + egocentric alignment
  -> kinematics (speeds, skeleton-edge distances)
  -> sliding windows (stride 1, window 25) + standardization
  -> VQVAE recurrent+GNN encoder embeddings + soft counts

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio against the BASELINE.json target of 50x real time
(value / (25 fps * 50)); >= 1.0 means the target is met.
"""

import json
import os
import sys
import time

import numpy as np


def _synthesize(t: int, nodes, frame_rate: float, seed: int = 0):
    """Smooth random-walk multi-animal trajectories in pixel space."""
    rng = np.random.default_rng(seed)
    n = len(nodes)
    base = rng.normal(size=(t, 2)).cumsum(axis=0) * 0.5 + 300.0
    offsets = rng.normal(scale=15.0, size=(1, n, 2))
    jitter = rng.normal(scale=1.0, size=(t, n, 2))
    pos = base[:, None, :] + offsets + jitter
    lik = np.clip(rng.beta(20, 1, size=(t, n)), 0, 1)
    return pos.astype(np.float32), lik.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from deepof_tpu.core.graph import build_body_graph, connect_mouse
    from deepof_tpu.data import _preprocess_positions
    from deepof_tpu.models import build_model
    from deepof_tpu.ops import align_trajectories, pairwise_distances, rolling_speed

    # Persistent compilation cache: repeat runs (e.g. the driver's) skip
    # the slow remote compile.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
    except Exception:
        pass

    frame_rate = 25.0
    # Default 10 simulated minutes: throughput is T-independent once the
    # batch pipeline is saturated, and per-dispatch latency through the
    # remote TPU tunnel stays bounded.
    duration_s = int(os.environ.get("DEEPOF_TPU_BENCH_SECONDS", 600))
    t = int(frame_rate * duration_s)
    window = 25
    batch = int(os.environ.get("DEEPOF_TPU_BENCH_BATCH", 4096))

    animal_ids = ["B", "W"]
    graph = build_body_graph(
        sorted(
            f"{aid}_{bp}"
            for aid in animal_ids
            for bp in connect_mouse(graph_preset="deepof_14").nodes
        ),
        animal_ids=animal_ids,
        graph_preset="deepof_14",
    )
    nodes = list(graph.nodes)
    n = len(nodes)
    pos_np, lik_np = _synthesize(t, nodes, frame_rate)

    slices = []
    for aid in animal_ids:
        cols = [i for i, bp in enumerate(nodes) if bp.startswith(f"{aid}_")]
        slices.append((min(cols), max(cols) + 1))
    animal_slices = tuple(slices)

    edges = np.asarray(graph.edges, np.int32)
    mm_ratio = np.float32(380.0 / 420.0)
    center = jnp.asarray([300.0, 300.0], jnp.float32) * mm_ratio
    align_idx = nodes.index("B_Spine_1") if "B_Spine_1" in nodes else 0

    e = len(edges)
    feat_dim = 3 * n + e

    model = build_model(
        "VQVAE", (window, n, 3), (window, e, 1), graph.adjacency,
        latent_dim=8, n_components=10, encoder_type="recurrent", use_gnn=True,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, window, n, 3), jnp.float32),
        jnp.zeros((1, window, e, 1), jnp.float32),
        train=False,
    )

    n_windows = t - window + 1
    n_batches = (n_windows + batch - 1) // batch

    def preprocess_and_features(pos, lik):
        """Raw pixels -> standardized per-frame features (T, 3N + E)."""
        clean, presence = _preprocess_positions(
            pos, lik,
            True, 15, 14,          # savgol w=15, alpha=1
            True, 0.75, 3.0, 3,    # outliers + interp
            animal_slices,
        )
        mm = clean * mm_ratio
        centered = mm - center[None, None, :]
        # Egocentric alignment on the first animal's spine.
        order = jnp.concatenate(
            [jnp.array([align_idx]), jnp.array([i for i in range(n) if i != align_idx])]
        )
        aligned = align_trajectories(jnp.take(centered, order, axis=1), mode="all")
        inv = jnp.argsort(order)
        aligned = jnp.take(aligned, inv, axis=1)
        speeds = rolling_speed(mm, frame_rate=frame_rate)
        dists = pairwise_distances(mm, edges)
        feats = jnp.concatenate(
            [aligned.reshape(t, 2 * n), speeds, dists], axis=1
        )
        feats = jnp.nan_to_num(feats)
        # Global standardization (fused affine).
        mu = jnp.mean(feats, axis=0, keepdims=True)
        sd = jnp.maximum(jnp.std(feats, axis=0, keepdims=True), 1e-6)
        return (feats - mu) / sd

    # Two compiled programs: the fused preprocess+feature pass, and ONE
    # scanned embed program covering all window batches (a single device
    # dispatch per repetition — per-call latency through the remote TPU
    # tunnel dominates if batches dispatch individually).
    preprocess_jit = jax.jit(preprocess_and_features)

    all_starts = np.arange(n_batches * batch).clip(0, n_windows - 1)
    all_starts_j = jnp.asarray(all_starts.reshape(n_batches, batch))

    @jax.jit
    def embed_all(feats):
        def one_batch(carry, batch_starts):
            idx = batch_starts[:, None] + jnp.arange(window)[None, :]
            w = feats[idx]                                   # (B, W, F)
            x = w[:, :, : 2 * n].reshape(batch, window, 2, n)
            x = jnp.moveaxis(x, 2, 3)                        # (B, W, N, 2)
            s = w[:, :, 2 * n : 3 * n][..., None]            # (B, W, N, 1)
            xw = jnp.concatenate([x, s], axis=-1)
            aw = w[:, :, 3 * n :][..., None]                 # (B, W, E, 1)
            out = model.apply(variables, xw, aw, train=False)
            return carry, (out["encoder_output"], out["soft_counts"])

        _, (embs, counts) = jax.lax.scan(one_batch, 0, all_starts_j)
        return (
            embs.reshape(-1, embs.shape[-1])[:n_windows],
            counts.reshape(-1, counts.shape[-1])[:n_windows],
        )

    def full_pipeline(pos, lik):
        return embed_all(preprocess_jit(pos, lik))

    pos = jnp.asarray(pos_np)
    lik = jnp.asarray(lik_np)

    # Warmup (compile).
    embs, counts = full_pipeline(pos, lik)
    jax.block_until_ready(embs)

    n_reps = 3
    t0 = time.time()
    for _ in range(n_reps):
        embs, counts = full_pipeline(pos, lik)
        jax.block_until_ready(embs)
    elapsed = (time.time() - t0) / n_reps

    frames_per_sec = t / elapsed
    target = frame_rate * 50.0  # 50x real time
    result = {
        "metric": f"frames/sec/chip preprocess->embed ({duration_s}s 25fps 2-animal synthetic)",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / target, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
