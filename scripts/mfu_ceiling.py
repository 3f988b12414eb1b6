"""Quantify the embed program's MFU ceiling (VERDICT r3 item 7).

Three measurements on the north-star VQVAE recurrent+GNN encoder at
reference scale (latent 8, window 25, batch 4096):

1. Arithmetic intensity: XLA-estimated FLOPs vs bytes accessed for ONE
   batch forward with the GRU time scans unrolled (so the scan body is
   counted per step, not once), compared against the v5e ridge point
   (peak FLOP/s / HBM bandwidth). If AI << ridge, the program is
   HBM-bound and max achievable MFU ~= AI / ridge.
2. bf16-compute embed variant: throughput and max |delta| of the
   embeddings vs the f32 default (the 1e-5 parity budget arbiter).
3. (optional, --pallas) the Pallas fused-GRU experiment lives in
   deepof_tpu/ops/pallas_gru.py; bench via DEEPOF_TPU_GRU_PALLAS=1.

Usage:  python scripts/mfu_ceiling.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16 = 197e12   # FLOP/s
V5E_HBM_BW = 819e9       # B/s
RIDGE = V5E_PEAK_BF16 / V5E_HBM_BW  # ~240 FLOP/B


def main():
    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache
    from deepof_tpu.core.graph import build_body_graph, connect_mouse
    from deepof_tpu.models import build_model, init_variables

    _enable_compile_cache()

    window, batch, latent = 25, 4096, 8
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
    n, e = len(graph.nodes), len(graph.edges)
    out = {"nodes": n, "edges": e, "window": window, "batch": batch}

    def build(dtype):
        model = build_model(
            "VQVAE", (window, n, 3), (window, e, 1), graph.adjacency,
            latent_dim=latent, n_components=10, encoder_type="recurrent",
            use_gnn=True, dtype=dtype,
        )
        variables = init_variables(
            model, {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, window, n, 3), jnp.float32),
            jnp.zeros((1, window, e, 1), jnp.float32),
            train=False,
        )
        return model, variables

    model32, vars32 = build(jnp.float32)

    # ---- 1. Arithmetic intensity of one unrolled batch forward ---- #
    def fwd(m, v):
        def f(x, a):
            o = m.apply(v, x, a, train=False)
            return o["encoder_output"], o["soft_counts"]
        return f

    os.environ["DEEPOF_TPU_GRU_UNROLL"] = str(window)
    try:
        compiled = jax.jit(fwd(model32, vars32)).lower(
            jax.ShapeDtypeStruct((batch, window, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((batch, window, e, 1), jnp.float32),
        ).compile()
    finally:
        os.environ["DEEPOF_TPU_GRU_UNROLL"] = "1"
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    ai = flops / max(byts, 1.0)
    out.update(
        flops_per_batch=flops,
        bytes_per_batch=byts,
        flops_per_window=flops / batch,
        bytes_per_window=byts / batch,
        arithmetic_intensity=round(ai, 3),
        v5e_ridge_flop_per_byte=round(RIDGE, 1),
        mfu_ceiling_from_ai=round(ai / RIDGE, 5),
        hbm_bound_time_per_batch_s=byts / V5E_HBM_BW,
        compute_bound_time_per_batch_s=flops / V5E_PEAK_BF16,
    )

    # ---- 2. bf16-compute embed variant ---- #
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, window, n, 3)), jnp.float32)
    a = jnp.asarray(
        np.abs(rng.normal(size=(batch, window, e, 1))), jnp.float32
    )

    def timed(m, v, reps=10):
        f = jax.jit(fwd(m, v))
        emb, _ = f(x, a)
        jax.block_until_ready(emb)
        t0 = time.time()
        for _ in range(reps):
            emb, sc = f(x, a)
        jax.block_until_ready(emb)
        return (time.time() - t0) / reps, np.asarray(emb)

    t32, emb32 = timed(model32, vars32)
    model16, _ = build(jnp.bfloat16)
    t16, emb16 = timed(model16, vars32)  # same f32 params, bf16 compute
    out.update(
        embed_f32_s_per_batch=round(t32, 5),
        embed_bf16_s_per_batch=round(t16, 5),
        bf16_embed_speedup=round(t32 / t16, 3),
        bf16_embed_max_abs_delta=float(np.max(np.abs(emb32 - emb16))),
        mfu_f32_measured=round(flops / t32 / V5E_PEAK_BF16, 5),
        mfu_bf16_measured=round(flops / t16 / V5E_PEAK_BF16, 5),
    )

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
