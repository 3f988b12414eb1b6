"""CLI and Snakemake orchestration layer (SURVEY.md L9).

Reference spec: deepof/deepof_train_embeddings.py:26-224 (stale upstream;
built against the live deepof_tpu API) and deepof_experiments.smk.

The CLI test drives the FULL chain end to end: build a real project from
the reference fixtures -> save -> ``deepof_tpu.cli.main([...])`` for one
epoch -> checkpoint + embeddings land on disk. The smk layer is validated
structurally (every shell flag resolves on the CLI parser; the target grid
expands as declared) plus a real ``snakemake -n`` dry-run wherever
snakemake is installed.
"""

import json
import os
import re
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMK_PATH = os.path.join(REPO_ROOT, "deepof_experiments.smk")
FIXTURES = "/root/reference/tests/test_examples"


@pytest.fixture(scope="module")
def saved_project(tmp_path_factory):
    from deepof_tpu.data import Project

    tmp = tmp_path_factory.mktemp("cli_project")
    src = os.path.join(FIXTURES, "test_single_topview")
    (tmp / "Tables").mkdir()
    (tmp / "Videos").mkdir()
    for f in os.listdir(os.path.join(src, "Tables")):
        if f.endswith("h5"):
            shutil.copy(os.path.join(src, "Tables", f), tmp / "Tables" / f)
    for f in os.listdir(os.path.join(src, "Videos")):
        shutil.copy(os.path.join(src, "Videos", f), tmp / "Videos" / f)
    proj = Project(
        project_path=str(tmp),
        project_name="cli_proj",
        video_path=str(tmp / "Videos"),
        table_path=str(tmp / "Tables"),
        arena="circular-autodetect",
        video_scale="380 mm",
        table_format="h5",
        frame_rate=25,
    )
    proj.create(force=True, test=True, verbose=False)
    return tmp


def test_cli_trains_end_to_end(saved_project, capsys):
    """deepof_tpu.cli.main on a saved project: one VQVAE epoch trains,
    checkpoints land under Trained_models/models, the embedding inference
    path runs off the saved bundle, and the log summary prints as JSON."""
    from deepof_tpu import cli

    # load_project expects the project directory itself (the dir holding
    # Coordinates/), matching the reference convention (deepof/data.py:171).
    rc = cli.main(
        [
            "--project-path", str(saved_project / "cli_proj"),
            "--embedding-model", "VQVAE",
            "--encoder-type", "recurrent",
            "--epochs", "1",
            "--batch-size", "16",
            "--latent-dim", "4",
            "--n-clusters", "5",
            "--window-size", "11",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary, "log summary must be non-empty JSON"

    model_dir = os.path.join(
        str(saved_project), "cli_proj", "Trained_models", "models"
    )
    ckpts = os.listdir(model_dir)
    assert "VQVAE_recurrent_latent4_k5_run0.ckpt" in ckpts

    # The saved checkpoint rebuilds and embeds the project's videos.
    from deepof_tpu.data import load_project
    from deepof_tpu.train.harness import ModelBundle
    from deepof_tpu.train.inference import embedding_per_video

    coords = load_project(str(saved_project / "cli_proj"))
    _, meta, _, tab_dict, scaler = coords.get_graph_dataset(window_size=11)
    bundle = ModelBundle.load(
        os.path.join(model_dir, "VQVAE_recurrent_latent4_k5_run0.ckpt")
    )
    emb, sc = embedding_per_video(
        coords, tab_dict, bundle, meta, global_scaler=scaler, batch_size=64
    )
    assert set(emb.keys()) == {"test", "test2"}
    for v in emb.values():
        arr = np.asarray(v)
        assert arr.shape[1] == 4 and np.isfinite(arr).all()


def test_cli_parser_rejects_unknown_model():
    from deepof_tpu import cli

    with pytest.raises(SystemExit):
        cli.build_parser().parse_args(
            ["--project-path", "x", "--embedding-model", "bogus"]
        )


def _smk_source() -> str:
    with open(SMK_PATH) as f:
        return f.read()


def test_smk_shell_flags_match_cli_surface():
    """Every --flag the smk shell template passes must resolve on the CLI
    parser (this is exactly how the reference's own smk went stale against
    its CLI, SURVEY.md L9)."""
    from deepof_tpu import cli

    src = _smk_source()
    # Scope to the shell template (the header comment mentions snakemake's
    # own --cluster flag).
    shell_src = src[src.index("rule train_embeddings"):]
    shell_flags = set(re.findall(r"(--[a-z-]+)", shell_src))
    parser_flags = {
        opt for action in cli.build_parser()._actions for opt in action.option_strings
    }
    unknown = sorted(shell_flags - parser_flags)
    assert unknown == [], f"smk passes flags the CLI does not accept: {unknown}"

    # The wildcards in the output pattern and the shell template must agree.
    wildcards = set(re.findall(r"\{wildcards\.(\w+)\}", src))
    assert wildcards == {"model", "encoder", "latent", "k", "run"}


def test_smk_grid_expands_as_declared(tmp_path):
    """Simulate the smk's expand() over its default config: the target grid
    is the full models x encoders cross product."""
    src = _smk_source()
    models = re.search(r'embedding_models", (\[[^\]]+\])', src).group(1)
    encoders = re.search(r'encoders", (\[[^\]]+\])', src).group(1)
    models, encoders = eval(models), eval(encoders)
    targets = {
        f"{m}_{e}_latent8_k10_run0.done" for m in models for e in encoders
    }
    assert len(targets) == 9
    assert "VaDE_recurrent_latent8_k10_run0.done" in targets
    assert "Contrastive_transformer_latent8_k10_run0.done" in targets


def test_smk_dry_run(tmp_path):
    """Real `snakemake -n` plan whenever snakemake is installed."""
    pytest.importorskip("snakemake")
    out = subprocess.run(
        [
            sys.executable, "-m", "snakemake",
            "-s", SMK_PATH, "-n",
            "--config", f"project_path={tmp_path}", f"output_path={tmp_path}",
        ],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "train_embeddings" in out.stdout
