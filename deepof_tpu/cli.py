"""CLI: train unsupervised embeddings from a saved project.

Behavioral spec: deepof/deepof_train_embeddings.py:26-224 (argparse train
tool; the reference copy is stale against its own v0.9 API — SURVEY.md §2 —
so this is built against the current deepof_tpu API instead).

Usage:
    python -m deepof_tpu.cli --project-path /path/to/project \
        --embedding-model VaDE --encoder-type recurrent --epochs 50
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from deepof_tpu.utils import str2bool


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="deepof_tpu.cli",
        description="Train deepof_tpu unsupervised embedding models.",
    )
    parser.add_argument("--project-path", required=True,
                        help="Path to a created project directory "
                             "(containing Coordinates/).")
    parser.add_argument("--embedding-model", default="VaDE",
                        choices=["VaDE", "VQVAE", "Contrastive"])
    parser.add_argument("--encoder-type", default="recurrent",
                        choices=["recurrent", "TCN", "transformer"])
    parser.add_argument("--animal-id", default=None)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--latent-dim", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--n-clusters", type=int, default=10)
    parser.add_argument("--window-size", type=int, default=None)
    parser.add_argument("--kmeans-loss", type=float, default=0.0)
    parser.add_argument("--temperature", type=float, default=0.1)
    parser.add_argument("--contrastive-similarity-function", default="cosine")
    parser.add_argument("--contrastive-loss-function", default="nce")
    parser.add_argument("--use-gnn", type=str2bool, default=True)
    parser.add_argument("--use-angles", type=str2bool, default=False,
                        help="Feed bridge angles as an extra encoder stream.")
    parser.add_argument("--use-amp", type=str2bool, default=False,
                        help="bfloat16 compute policy (float32 params).")
    parser.add_argument("--use-turtle-teacher", type=str2bool, default=False)
    parser.add_argument("--pretrain-epochs", type=int, default=None)
    parser.add_argument("--bootstrap-training", type=str2bool, default=False)
    parser.add_argument("--random-seed", type=int, default=0)
    parser.add_argument("--output-path", default="")
    parser.add_argument("--run", type=int, default=0)
    parser.add_argument("--save-checkpoints", type=str2bool, default=True)
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from deepof_tpu.data import load_project

    coordinates = load_project(args.project_path)
    graph_dataset, metainfo, adjacency, tab_dict, scaler = (
        coordinates.get_graph_dataset(
            animal_id=args.animal_id,
            window_size=args.window_size,
        )
    )

    kwargs = {}
    if args.pretrain_epochs is not None:
        kwargs["pretrain_epochs"] = args.pretrain_epochs

    bundle, _, _, log_summary = coordinates.deep_unsupervised_embedding(
        (graph_dataset, metainfo, adjacency),
        adjacency_matrix=adjacency,
        embedding_model=args.embedding_model,
        encoder_type=args.encoder_type,
        batch_size=args.batch_size,
        latent_dim=args.latent_dim,
        epochs=args.epochs,
        n_clusters=args.n_clusters,
        kmeans_loss=args.kmeans_loss,
        temperature=args.temperature,
        contrastive_similarity_function=args.contrastive_similarity_function,
        contrastive_loss_function=args.contrastive_loss_function,
        use_gnn=args.use_gnn,
        use_angles=args.use_angles,
        use_amp=args.use_amp,
        use_turtle_teacher=args.use_turtle_teacher,
        bootstrap_training=args.bootstrap_training,
        random_seed=args.random_seed,
        output_path=args.output_path,
        run=args.run,
        save_checkpoints=args.save_checkpoints,
        **kwargs,
    )
    print(json.dumps({k: v for k, v in log_summary.items()}, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
