#!/usr/bin/env bash
# HPC launcher for the Snakemake experiment grid (mirrors the reference's
# run_deepof_experiments.sh against the deepof_tpu CLI).
#
# Usage:
#   ./run_deepof_experiments.sh <project_path> [output_path] [jobs]

set -euo pipefail

PROJECT_PATH="${1:?usage: run_deepof_experiments.sh <project_path> [output_path] [jobs]}"
OUTPUT_PATH="${2:-./deepof_tpu_runs}"
JOBS="${3:-8}"

mkdir -p "${OUTPUT_PATH}"

snakemake \
    -s deepof_experiments.smk \
    --config project_path="${PROJECT_PATH}" output_path="${OUTPUT_PATH}" \
    --jobs "${JOBS}" \
    --keep-going \
    --rerun-incomplete \
    ${SLURM_CLUSTER:+--cluster "sbatch --mem={resources.mem_mb} --time={resources.runtime}"}
