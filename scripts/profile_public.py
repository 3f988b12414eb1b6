"""Profile the public API path: Project.create -> get_graph_dataset ->
embedding_per_video (VERDICT r2 item 2: find where the host wall-clock
goes).

Runs the same synthetic DLC project as bench._bench_public_path, warms up
every compiled program and host cache, then cProfiles ONE steady-state
pass (the quantity bench.py reports).

Usage:
    DEEPOF_TPU_BENCH_PUBLIC_SECONDS=120 python scripts/profile_public.py \
        [--sort cumtime] [--lines 50]
"""

import argparse
import cProfile
import io
import os
import pstats
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sort", default="cumtime")
    ap.add_argument("--lines", type=int, default=50)
    args = ap.parse_args()

    import numpy as np

    import bench
    from bench import _enable_compile_cache, _write_dlc_fixed_h5

    _enable_compile_cache()

    from deepof_tpu.core.graph import connect_mouse
    from deepof_tpu.data import Project
    from deepof_tpu.models import build_model
    from deepof_tpu.train.harness import ModelBundle
    from deepof_tpu.train.inference import embedding_per_video

    import jax
    import jax.numpy as jnp

    frame_rate = 25.0
    duration_s = int(os.environ.get("DEEPOF_TPU_BENCH_PUBLIC_SECONDS", 120))
    t = int(frame_rate * duration_s)
    window = 25
    animal_ids = ["B", "W"]
    bodyparts = sorted(connect_mouse(graph_preset="deepof_14").nodes)

    tmp = tempfile.mkdtemp(prefix="deepof_tpu_prof_")
    try:
        os.makedirs(f"{tmp}/Tables")
        os.makedirs(f"{tmp}/Videos")
        rng = np.random.default_rng(0)
        t_half = t // 2
        for key in ("test", "test2"):
            cols, data = [], []
            for aid in animal_ids:
                base = rng.normal(size=(t_half, 2)).cumsum(axis=0) * 0.5 + 300.0
                for bp in bodyparts:
                    off = rng.normal(scale=15.0, size=(1, 2))
                    xy = base + off + rng.normal(scale=1.0, size=(t_half, 2))
                    for ci, coord in enumerate(("x", "y")):
                        cols.append(("bench", aid, bp, coord))
                        data.append(xy[:, ci])
                    cols.append(("bench", aid, bp, "likelihood"))
                    data.append(np.clip(rng.beta(20, 1, size=t_half), 0, 1))
            _write_dlc_fixed_h5(
                f"{tmp}/Tables/{key}DLC_bench.h5",
                np.stack(data, axis=1).astype(np.float64), cols,
            )
            with open(f"{tmp}/Videos/{key}DLC_video.mp4", "wb") as f:
                f.write(b"\x00" * 64)

        def run_public():
            proj = Project(
                project_path=tmp, project_name="bench",
                video_path=f"{tmp}/Videos", table_path=f"{tmp}/Tables",
                arena="circular-autodetect", video_scale="380 mm",
                table_format="h5", frame_rate=frame_rate,
                animal_ids=animal_ids,
            )
            coords = proj.create(force=True, test=True, verbose=False)
            return coords, coords.get_graph_dataset(window_size=window)

        coords, (dataset, meta, adjacency, tab_dict, scaler) = run_public()
        n = len(meta["node_columns"]) // 3
        e = len(meta["edge_columns"])
        model = build_model(
            "VQVAE", (window, n, 3), (window, e, 1), adjacency,
            latent_dim=8, n_components=10, encoder_type="recurrent",
            use_gnn=True,
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, window, n, 3), jnp.float32),
            jnp.zeros((1, window, e, 1), jnp.float32),
            train=False,
        )
        bundle = ModelBundle(
            model=model, variables=variables,
            rebuild_spec={
                "model": "VQVAE", "input_shape": [window, n, 3],
                "edge_feature_shape": [window, e, 1],
                "n_components": 10, "use_angles": False,
            },
        )

        def full_pass():
            coords, (dataset, meta, adjacency, tab_dict, scaler) = run_public()
            embeddings, _ = embedding_per_video(
                coords, tab_dict, bundle, meta, global_scaler=scaler,
                batch_size=4096,
            )
            return embeddings

        # Warm up twice (compiles + host caches), like bench.py.
        full_pass()
        full_pass()

        t0 = time.time()
        prof = cProfile.Profile()
        prof.enable()
        full_pass()
        prof.disable()
        elapsed = time.time() - t0
        print(f"\npublic path: {t / elapsed:.1f} frames/s ({elapsed:.2f}s for {t} frames)")

        s = io.StringIO()
        pstats.Stats(prof, stream=s).strip_dirs().sort_stats(args.sort).print_stats(
            args.lines
        )
        print(s.getvalue())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
