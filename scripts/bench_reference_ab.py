"""A/B data-pipeline throughput: deepof_tpu vs the reference, same host.

Builds one synthetic 2-animal DLC project and times the public data path
(Project.create -> get_graph_dataset) through BOTH implementations on the
same CPU host, printing one JSON line with frames/s each and the ratio.

Caveats (documented, so read the numbers accordingly):
- numba is not installed here, so the reference's @njit kernels run as
  pure Python under the import shim — the reference's kernel tier is
  slower than in its own published environment. Its pandas/sklearn
  stages (imputation, scaling, windowing), which dominate its runtime,
  are unaffected.
- deepof_tpu runs on CPU here too (JAX CPU backend), i.e. WITHOUT the
  TPU that its fused preprocess was designed for; on a chip the device
  stages shrink further (see bench.py's public_api metric).

Usage:
    DEEPOF_TPU_TEST_REEXEC=1 JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python scripts/bench_reference_ab.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FRAME_RATE = 25.0
DURATION_S = int(os.environ.get("DEEPOF_TPU_BENCH_AB_SECONDS", 120))
WINDOW = 25


def _build_project(tmp: str, t_half: int) -> None:
    from bench import _write_dlc_fixed_h5
    from deepof_tpu.core.graph import connect_mouse

    animal_ids = ["B", "W"]
    bodyparts = sorted(connect_mouse(graph_preset="deepof_14").nodes)
    os.makedirs(f"{tmp}/Tables")
    os.makedirs(f"{tmp}/Videos")
    rng = np.random.default_rng(0)
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


def _time_pipeline(project_cls, tmp: str, label: str, graph_dataset) -> float:
    t0 = time.time()
    proj = project_cls(
        project_path=tmp, project_name=f"ab_{label}",
        video_path=f"{tmp}/Videos", table_path=f"{tmp}/Tables",
        arena="circular-autodetect", video_scale="380 mm",
        table_format="h5", frame_rate=FRAME_RATE, animal_ids=["B", "W"],
    )
    coords = proj.create(force=True, test=True, verbose=False)
    graph_dataset(coords)
    return time.time() - t0


def main():
    t = int(FRAME_RATE * DURATION_S)
    tmp = tempfile.mkdtemp(prefix="deepof_ab_")
    try:
        _build_project(tmp, t // 2)

        # --- deepof_tpu (run first; warm pandas/imports for both) -----
        from deepof_tpu.data import Project as TpuProject

        def tpu_gd(coords):
            coords.get_graph_dataset(window_size=WINDOW)

        _time_pipeline(TpuProject, tmp, "tpu_warm", tpu_gd)  # warmup
        tpu_s = _time_pipeline(TpuProject, tmp, "tpu", tpu_gd)

        # --- reference under the shim ---------------------------------
        from reference_shim import load_reference

        load_reference()
        import deepof.data as ref_data

        def ref_gd(coords):
            coords.get_graph_dataset(window_size=WINDOW)

        ref_s = _time_pipeline(ref_data.Project, tmp, "ref", ref_gd)

        print(json.dumps({
            "metric": "public data path create+graph_dataset"
                      f" ({DURATION_S}s 25fps 2-animal synthetic, CPU host)",
            "deepof_tpu_frames_per_sec": round(t / tpu_s, 1),
            "reference_frames_per_sec": round(t / ref_s, 1),
            "speedup": round(ref_s / tpu_s, 2),
            "caveat": "reference numba kernels run as pure python (numba "
                      "not installed); deepof_tpu on CPU backend (no TPU)",
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
