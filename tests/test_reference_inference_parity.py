"""The composed north-star acceptance test: end-to-end inference A/B.

BASELINE.md's criterion is *embeddings within 1e-5 of the reference* —
end-to-end, not piecewise. These tests run the reference's actual
`embedding_per_video` (deepof/clustering/model_utils_new.py:452-750) and
deepof_tpu's (deepof_tpu/train/inference.py) side by side: both projects are
built from the same fixture, a reference torch model is weight-transplanted
into the flax counterpart, and the produced embeddings + soft counts are
diffed per experiment — including the gated GMM soft-count extraction
(post_hoc.py:1028-1174) for both the single-animal ungated path and the
multi-animal distance-gated path.

Coverage notes:
- Both GNN modes are composed end to end. The reference's GNN stream split
  contains a fixed input bijection that scrambles features across nodes,
  channels AND time (see test_reference_model_parity.ref_stream_scramble) —
  it cannot be absorbed into transplanted weights of a clean-layout
  encoder, so the GNN rows compose through _ScrambleAdapter, which applies
  exactly that bijection to each window batch before the clean forward
  (test_embedding_per_video_gnn_parity covers the reference's DEFAULT
  model family). The reference's embedding_per_video also unconditionally
  reads `model.encoder.spatial_gnn_block`, an attribute its own non-GNN
  encoders never define (models_new.py:110-118) — the non-GNN fixture
  fills it so the upstream function can run at all.
- The MSM+PCCA+ extraction path (post_hoc.py:1474-1595) requires deeptime,
  which is not installed in this environment; the reference implementation
  cannot execute here. The deepof_tpu msm path is instead checked for
  gate-key/shape consistency against the A/B-verified gmm path, and its
  own unit coverage lives in test_gating.py/test_msm.py.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir("/root/reference/deepof"),
        reason="upstream reference tree not available",
    ),
    pytest.mark.slow,  # composed A/B: two full project builds per param
]

TOL = 1e-5
WINDOW = 10
LATENT = 4
K = 4
FIXROOT = "/root/reference/tests/test_examples"


def _copy_fixture(src: str, dst: str) -> None:
    os.makedirs(f"{dst}/Tables")
    os.makedirs(f"{dst}/Videos")
    for f in os.listdir(f"{src}/Tables"):
        if f.endswith(".h5") and not f.endswith("analysis.h5"):
            shutil.copy(f"{src}/Tables/{f}", f"{dst}/Tables/{f}")
    for f in os.listdir(f"{src}/Videos"):
        shutil.copy(f"{src}/Videos/{f}", f"{dst}/Videos/{f}")


def _project_kwargs(root: str) -> dict:
    return dict(
        project_name="p",
        video_path=f"{root}/Videos",
        table_path=f"{root}/Tables",
        arena="circular-autodetect",
        video_scale="380 mm",
        table_format="h5",
        frame_rate=25,
    )


@pytest.fixture(scope="module", params=["single", "multi"])
def ab_inference(request, tmp_path_factory):
    """Both projects + graph datasets, ready for model inference A/B."""
    from reference_shim import load_reference

    deepof_ref = load_reference()

    from deepof_tpu.data import Project as TpuProject

    name = request.param
    src = f"{FIXROOT}/test_{name}_topview"
    animal_ids = ["B", "W"] if name == "multi" else None

    ref_root = str(tmp_path_factory.mktemp(f"refinf_{name}"))
    tpu_root = str(tmp_path_factory.mktemp(f"tpuinf_{name}"))
    _copy_fixture(src, ref_root)
    _copy_fixture(src, tpu_root)

    ref_coords = deepof_ref.data.Project(
        project_path=ref_root, animal_ids=animal_ids, **_project_kwargs(ref_root)
    ).create(force=True, test=True, verbose=False)
    tpu_coords = TpuProject(
        project_path=tpu_root, animal_ids=animal_ids, **_project_kwargs(tpu_root)
    ).create(force=True, test=True, verbose=False)

    (_, _), meta_r, adj_r, tab_r, scaler_r = ref_coords.get_graph_dataset(
        window_size=WINDOW
    )
    (_, _), meta_t, adj_t, tab_t, scaler_t = tpu_coords.get_graph_dataset(
        window_size=WINDOW, include_angles=False
    )
    assert np.array_equal(np.asarray(adj_r), np.asarray(adj_t))
    return {
        "name": name,
        "ref": (ref_coords, meta_r, adj_r, tab_r, scaler_r),
        "tpu": (tpu_coords, meta_t, adj_t, tab_t, scaler_t),
    }


def _graph_dims(adj, tab, get_dt_ref):
    """(n_nodes, n_edges) from the adjacency and merged feature table."""
    n = int(np.asarray(adj).shape[0])
    e = int(np.triu(np.asarray(adj)).sum())
    return n, e


def _make_transplanted_pair(
    model_name: str, n: int, e: int, seed: int = 0,
    use_gnn: bool = False, adjacency=None,
):
    """(reference torch model, flax ModelBundle) with identical weights."""
    import torch

    import jax
    import jax.numpy as jnp

    from reference_shim import load_reference

    load_reference()
    import deepof.clustering.models_new as ref_models

    from deepof_tpu.models import build_model
    from deepof_tpu.train.harness import ModelBundle
    from torch_to_flax import (
        assign_tree,
        recurrent_encoder_params,
        vade_model_params,
        vqvae_model_params,
    )

    if adjacency is not None:
        adj = np.asarray(adjacency, np.float32)
    else:
        adj = np.ones((n, n), np.float32) - np.eye(n, dtype=np.float32)
    torch.manual_seed(seed)
    common_ref = dict(
        input_shape=(WINDOW, n, 3), edge_feature_shape=(WINDOW, e, 1),
        adjacency_matrix=adj, latent_dim=LATENT, use_gnn=use_gnn,
        encoder_type="recurrent",
    )
    if model_name == "VaDE":
        tm = ref_models.VaDEPT(n_components=K, **common_ref).eval()
    elif model_name == "VQVAE":
        tm = ref_models.VQVAEPT(n_components=K, **common_ref).eval()
    else:
        tm = ref_models.ContrastivePT(**common_ref).eval()
    if not use_gnn:
        # The reference's embedding_per_video unconditionally str()s this
        # attribute, which non-GNN encoders never define (an upstream gap),
        # and its graph=False branch feeds unwindowed 2D tables into
        # reorder_and_reshape (model_utils_new.py:585-592) — dead, broken
        # code upstream. Route the reference through its REAL (graph=True)
        # preprocessing path: the flag only selects how windows are built,
        # not how the model is called, so the non-GNN forward stays
        # untouched.
        tm.encoder.spatial_gnn_block = "CensNetConvPT()"

    fm = build_model(
        model_name, (WINDOW, n, 3), (WINDOW, e, 1), adj,
        latent_dim=LATENT, n_components=K, encoder_type="recurrent",
        use_gnn=use_gnn,
    )
    half = WINDOW // 2
    x0 = jnp.zeros(
        (1, half if model_name == "Contrastive" else WINDOW, n, 3), jnp.float32
    )
    a0 = jnp.zeros(
        (1, half if model_name == "Contrastive" else WINDOW, e, 1), jnp.float32
    )
    variables = fm.init({"params": jax.random.PRNGKey(0)}, x0, a0, train=False)
    if model_name == "VaDE":
        src = vade_model_params(tm)
    elif model_name == "VQVAE":
        src = vqvae_model_params(tm)
    else:
        src = {"encoder": recurrent_encoder_params(tm.encoder)}
    params = assign_tree(variables["params"], src)

    bundle = ModelBundle(
        model=fm,
        variables={"params": params},
        rebuild_spec={
            "model": model_name,
            "input_shape": [WINDOW, n, 3],
            "edge_feature_shape": [WINDOW, e, 1],
            "adjacency": adj.tolist(),
            "latent_dim": LATENT,
            "n_components": K,
            "encoder_type": "recurrent",
            "use_gnn": use_gnn,
            "use_angles": False,
            "angle_feature_shape": None,
        },
    )
    return tm, bundle


class _ScrambleAdapter:
    """Stand-in for ``bundle.model`` that applies the reference's
    stream-scramble bijection (test_reference_model_parity.
    ref_stream_scramble — the fixed input permutation hidden in the
    reference's tf_style_group_reshape, models_new.py:121-141) to each
    window batch before the clean-layout flax forward. Composing it under
    embedding_per_video closes the GNN-mode north-star A/B (VERDICT r3
    item 4): the reference's GNN models consume this layout internally,
    so transplanted clean-layout weights reproduce them bit-for-bit only
    on scrambled inputs."""

    def __init__(self, model):
        self._model = model
        self._perms = {}

    def _perm(self, shape):
        import jax.numpy as jnp

        t_len, n, f = int(shape[0]), int(shape[1]), int(shape[2])
        key = (t_len, n, f)
        if key not in self._perms:
            fp, tp, gp = np.meshgrid(
                np.arange(f), np.arange(t_len), np.arange(n), indexing="ij"
            )
            m = fp * t_len * n + tp * n + gp
            i, t_src = np.divmod(m, t_len)
            n_src, c_src = np.divmod(i, f)
            perm = np.empty(t_len * n * f, np.int32)
            perm[tp * (n * f) + gp * f + fp] = t_src * (n * f) + n_src * f + c_src
            self._perms[key] = jnp.asarray(perm)
        return self._perms[key]

    def _scramble(self, x):
        b = x.shape[0]
        flat = x.reshape(b, -1)
        return flat[:, self._perm(x.shape[1:])].reshape(x.shape)

    def apply(self, variables, x, a, *args, **kwargs):
        return self._model.apply(
            variables, self._scramble(x), self._scramble(a), *args, **kwargs
        )


def _run_ref_epv(ab, tm, **kwargs):
    import deepof.clustering.model_utils_new as ref_mu

    # np.stack in the reference's reorder_and_reshape yields a
    # non-contiguous array; its non-GNN forward then calls .view() on the
    # zero-copy torch tensor and crashes (models_new.py:176) — another
    # upstream bug only reachable from the never-tested non-GNN inference
    # path. Make the array contiguous (identical values) so the reference
    # can run.
    orig = ref_mu.reorder_and_reshape
    ref_mu.reorder_and_reshape = lambda d: np.ascontiguousarray(orig(d))
    try:
        ref_coords, meta_r, _, tab_r, scaler_r = ab["ref"]
        return ref_mu.embedding_per_video(
            coordinates=ref_coords, to_preprocess=tab_r, model=tm,
            meta_info=meta_r, global_scaler=scaler_r, **kwargs,
        )
    finally:
        ref_mu.reorder_and_reshape = orig


def _run_tpu_epv(ab, bundle, **kwargs):
    from deepof_tpu.train.inference import embedding_per_video

    tpu_coords, meta_t, _, tab_t, scaler_t = ab["tpu"]
    return embedding_per_video(
        tpu_coords, tab_t, bundle, meta_t, global_scaler=scaler_t, **kwargs,
    )


def _diff_tabledicts(ref_td, tpu_td, get_dt_ref, tol):
    keys = sorted(ref_td.keys())
    assert sorted(tpu_td.keys()) == keys
    worst = 0.0
    for k in keys:
        r = np.asarray(get_dt_ref(ref_td, k), float)
        t = np.asarray(tpu_td[k], float)
        assert r.shape == t.shape, f"{k}: {r.shape} vs {t.shape}"
        d = float(np.abs(r - t).max())
        worst = max(worst, d)
        assert d < tol, f"{k}: max|delta| = {d:.3e} >= {tol}"
    return worst


@pytest.fixture(scope="module")
def ref_get_dt():
    from reference_shim import load_reference

    load_reference()
    from deepof.data_loading import get_dt

    return get_dt


@pytest.mark.parametrize("model_name", ["VaDE", "VQVAE"])
def test_embedding_per_video_head_parity(ab_inference, ref_get_dt, model_name):
    """Full composition: preprocess -> window -> encoder -> head soft counts
    matches the reference end-to-end at 1e-5."""
    _, _, adj, tab_r, _ = ab_inference["ref"]
    n, e = _graph_dims(adj, tab_r, ref_get_dt)
    tm, bundle = _make_transplanted_pair(model_name, n, e)

    ref_emb, ref_sc = _run_ref_epv(ab_inference, tm)
    tpu_emb, tpu_sc = _run_tpu_epv(ab_inference, bundle)

    _diff_tabledicts(ref_emb, tpu_emb, ref_get_dt, TOL)
    _diff_tabledicts(ref_sc, tpu_sc, ref_get_dt, TOL)


@pytest.mark.parametrize("model_name", ["VaDE", "VQVAE"])
def test_embedding_per_video_gnn_parity(ab_inference, ref_get_dt, model_name):
    """The composed north-star A/B for the reference's DEFAULT model family
    (use_gnn=True, model_utils_new.py:452-750): reference embedding_per_video
    with a GNN model vs deepof_tpu's inference with the scramble-bijection
    input adapter, end to end at 1e-5 (VERDICT r3 item 4)."""
    _, _, adj, tab_r, _ = ab_inference["ref"]
    n, e = _graph_dims(adj, tab_r, ref_get_dt)
    tm, bundle = _make_transplanted_pair(
        model_name, n, e, use_gnn=True, adjacency=np.asarray(adj),
    )
    from deepof_tpu.train.harness import ModelBundle

    adapted = ModelBundle(
        model=_ScrambleAdapter(bundle.model),
        variables=bundle.variables,
        rebuild_spec=bundle.rebuild_spec,
    )

    ref_emb, ref_sc = _run_ref_epv(ab_inference, tm)
    tpu_emb, tpu_sc = _run_tpu_epv(ab_inference, adapted)

    _diff_tabledicts(ref_emb, tpu_emb, ref_get_dt, TOL)
    _diff_tabledicts(ref_sc, tpu_sc, ref_get_dt, TOL)


def test_embedding_per_video_device_scale_parity(
    ab_inference, ref_get_dt, monkeypatch
):
    """The composed north-star A/B with the ACCELERATOR scaling fast path
    forced on (DEEPOF_TPU_DEVICE_SCALE=1) — the code path the TPU
    public-path bench number actually exercises (VERDICT r3 item 3). The
    graph dataset is rebuilt under the flag so the stashed scaled-table
    cache comes from the device path too, then embedding_per_video composes
    against the reference at the same 1e-5 budget as the host path."""
    monkeypatch.setenv("DEEPOF_TPU_DEVICE_SCALE", "1")
    _, _, adj, tab_r, _ = ab_inference["ref"]
    n, e = _graph_dims(adj, tab_r, ref_get_dt)
    tm, bundle = _make_transplanted_pair("VQVAE", n, e)

    tpu_coords = ab_inference["tpu"][0]
    (_, _), meta_t, _, tab_t, scaler_t = tpu_coords.get_graph_dataset(
        window_size=WINDOW, include_angles=False
    )
    ab_dev = dict(ab_inference)
    ab_dev["tpu"] = (tpu_coords, meta_t, adj, tab_t, scaler_t)

    ref_emb, ref_sc = _run_ref_epv(ab_inference, tm)
    tpu_emb, tpu_sc = _run_tpu_epv(ab_dev, bundle)

    _diff_tabledicts(ref_emb, tpu_emb, ref_get_dt, TOL)
    _diff_tabledicts(ref_sc, tpu_sc, ref_get_dt, TOL)


def test_embedding_per_video_contrastive_gmm_parity(ab_inference, ref_get_dt):
    """Contrastive embeddings at 1e-5 AND the gated GMM soft-count
    extraction (the default contrastive path is msm, which needs deeptime;
    gmm exercises the same gating machinery with a runnable decoder).

    Multi-animal projects go through the distance-gated path (M_gates bins
    from nose-nose distance quantiles, one GMM per bin); single-animal
    projects the ungated "" path.
    """
    _, _, adj, tab_r, _ = ab_inference["ref"]
    n, e = _graph_dims(adj, tab_r, ref_get_dt)
    tm, bundle = _make_transplanted_pair("Contrastive", n, e)

    kwargs = dict(
        softcounts_extraction_method="gmm", states_per_gate=3, M_gates=2,
    )
    ref_emb, ref_sc = _run_ref_epv(ab_inference, tm, **kwargs)
    tpu_emb, tpu_sc = _run_tpu_epv(ab_inference, bundle, **kwargs)

    _diff_tabledicts(ref_emb, tpu_emb, ref_get_dt, TOL)

    # GMM EM on float32 inputs that differ at 1e-5 can flip borderline
    # window assignments; require near-exact posteriors and matching
    # hard assignments.
    keys = sorted(ref_sc.keys())
    assert sorted(tpu_sc.keys()) == keys
    for k in keys:
        r = np.asarray(ref_get_dt(ref_sc, k), float)
        t = np.asarray(tpu_sc[k], float)
        assert r.shape == t.shape, f"{k}: {r.shape} vs {t.shape}"
        np.testing.assert_allclose(r.sum(1), 1.0, atol=1e-4)
        np.testing.assert_allclose(t.sum(1), 1.0, atol=1e-4)
        agree = (r.argmax(1) == t.argmax(1)).mean()
        assert agree >= 0.99, f"{k}: hard agreement {agree:.3f}"
        d = float(np.abs(r - t).max())
        assert d < 1e-3, f"{k}: max|delta posterior| = {d:.3e}"


def test_msm_path_consistent_with_gmm_gates(ab_inference, ref_get_dt):
    """The deeptime-dependent reference MSM path cannot run here; assert
    the deepof_tpu msm extraction at least produces the same gate keys,
    shapes, and valid distributions as the A/B-verified gmm path."""
    _, _, adj, tab_r, _ = ab_inference["ref"]
    n, e = _graph_dims(adj, tab_r, ref_get_dt)
    _, bundle = _make_transplanted_pair("Contrastive", n, e)

    _, sc_gmm = _run_tpu_epv(
        ab_inference, bundle,
        softcounts_extraction_method="gmm", states_per_gate=3, M_gates=2,
    )
    _, sc_msm = _run_tpu_epv(
        ab_inference, bundle,
        softcounts_extraction_method="msm", states_per_gate=3, M_gates=2,
        n_micro=12, lagtime=1,
    )
    assert sorted(sc_msm.keys()) == sorted(sc_gmm.keys())
    for k in sc_msm.keys():
        p = np.asarray(sc_msm[k], float)
        assert p.shape[0] == np.asarray(sc_gmm[k]).shape[0]
        np.testing.assert_allclose(p.sum(1), 1.0, atol=1e-4)
