# Snakemake grid over embedding models x encoders, mirroring the reference
# HPC orchestration (reference: deepof_experiments.smk:26-43) against the
# deepof_tpu CLI. Launch with:
#   snakemake -s deepof_experiments.smk --cluster "sbatch ..." -j 16

import os

PROJECT_PATH = config.get("project_path", "./deepof_project")
OUTPUT_PATH = config.get("output_path", "./deepof_tpu_runs")

EMBEDDING_MODELS = config.get("embedding_models", ["VaDE", "VQVAE", "Contrastive"])
ENCODERS = config.get("encoders", ["recurrent", "TCN", "transformer"])
LATENT_DIMS = config.get("latent_dims", [8])
N_CLUSTERS = config.get("n_clusters", [10])
RUNS = config.get("runs", [0])


rule all:
    input:
        expand(
            os.path.join(
                OUTPUT_PATH,
                "{model}_{encoder}_latent{latent}_k{k}_run{run}.done",
            ),
            model=EMBEDDING_MODELS,
            encoder=ENCODERS,
            latent=LATENT_DIMS,
            k=N_CLUSTERS,
            run=RUNS,
        )


rule train_embeddings:
    output:
        os.path.join(
            OUTPUT_PATH, "{model}_{encoder}_latent{latent}_k{k}_run{run}.done"
        )
    resources:
        mem_mb=32000,
        runtime=720,
    shell:
        (
            "python -m deepof_tpu.cli "
            "--project-path {PROJECT_PATH} "
            "--embedding-model {wildcards.model} "
            "--encoder-type {wildcards.encoder} "
            "--latent-dim {wildcards.latent} "
            "--n-clusters {wildcards.k} "
            "--run {wildcards.run} "
            "--output-path {OUTPUT_PATH} "
            "&& touch {output}"
        )
