"""Profile the public API path: Project.create -> get_graph_dataset ->
embedding_per_video (VERDICT r2 item 2: find where the host wall-clock
goes).

Usage:
    DEEPOF_TPU_BENCH_PUBLIC_SECONDS=120 python scripts/profile_public.py
        [--cprofile] [--sort cumtime] [--lines 40]
"""

import argparse
import cProfile
import io
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cprofile", action="store_true")
    ap.add_argument("--sort", default="cumtime")
    ap.add_argument("--lines", type=int, default=45)
    args = ap.parse_args()

    import bench

    frame_rate = 25.0
    if args.cprofile:
        prof = cProfile.Profile()
        prof.enable()
        fps = bench._bench_public_path(frame_rate)
        prof.disable()
        s = io.StringIO()
        pstats.Stats(prof, stream=s).strip_dirs().sort_stats(args.sort).print_stats(
            args.lines
        )
        print(s.getvalue())
    else:
        fps = bench._bench_public_path(frame_rate)
    print(f"public path: {fps:.1f} frames/s")

    from deepof_tpu.profiling import GLOBAL_TIMER

    rep = GLOBAL_TIMER.report()
    if rep:
        print("--- stage breakdown ---")
        print(rep)


if __name__ == "__main__":
    main()
