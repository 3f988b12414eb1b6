"""torch -> flax weight transplant for reference A/B model parity.

Converts the reference's torch module parameters (loaded via
reference_shim) into this repo's flax param trees, module by module. Used
by test_reference_model_parity.py to assert the flax forward passes match
the reference's within 1e-5 — the reference's own translation-test
methodology (deepof/clustering/*_translation_tests.ipynb).
"""

from __future__ import annotations

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def conv1d_params(tc) -> dict:
    """torch Conv1d (out, in, k) -> flax Conv kernel (k, in, out)."""
    out = {"kernel": _np(tc.weight).transpose(2, 1, 0)}
    if tc.bias is not None:
        out["bias"] = _np(tc.bias)
    return out


def linear_params(tl) -> dict:
    return {"kernel": _np(tl.weight).T, "bias": _np(tl.bias)}


def layernorm_params(tn) -> dict:
    return {"scale": _np(tn.weight), "bias": _np(tn.bias)}


def grucell_params(tg, reverse: bool = False) -> dict:
    """One direction of a torch nn.GRU layer -> flax GRUCell params.

    torch packs gates row-wise as [r; z; n] in weight_ih/weight_hh with two
    bias vectors; flax keeps separate r/z/n dense layers where the
    input-side bias absorbs both torch biases for r and z (they add), and
    the n gate keeps them split (b_in on 'in', b_hn on 'hn', because the
    reset gate multiplies the hidden-side term in both frameworks).
    """
    sfx = "_reverse" if reverse else ""
    w_ih = _np(getattr(tg, f"weight_ih_l0{sfx}"))
    w_hh = _np(getattr(tg, f"weight_hh_l0{sfx}"))
    b_ih = _np(getattr(tg, f"bias_ih_l0{sfx}"))
    b_hh = _np(getattr(tg, f"bias_hh_l0{sfx}"))
    h = w_hh.shape[1]

    def chunk(a, i):
        return a[i * h : (i + 1) * h]

    return {
        "ir": {"kernel": chunk(w_ih, 0).T, "bias": chunk(b_ih, 0) + chunk(b_hh, 0)},
        "iz": {"kernel": chunk(w_ih, 1).T, "bias": chunk(b_ih, 1) + chunk(b_hh, 1)},
        "in": {"kernel": chunk(w_ih, 2).T, "bias": chunk(b_ih, 2)},
        "hr": {"kernel": chunk(w_hh, 0).T},
        "hz": {"kernel": chunk(w_hh, 1).T},
        "hn": {"kernel": chunk(w_hh, 2).T, "bias": chunk(b_hh, 2)},
    }


def bigru_params(tg) -> dict:
    """torch bidirectional nn.GRU -> flax BiGRU (fwd MaskedGRU_0, bwd _1)."""
    return {
        "MaskedGRU_0": {"GRUCell_0": grucell_params(tg, reverse=False)},
        "MaskedGRU_1": {"GRUCell_0": grucell_params(tg, reverse=True)},
    }


def recurrent_block_params(tb) -> dict:
    """reference RecurrentBlockPT -> flax RecurrentBlock param tree."""
    params = {
        "Conv_0": conv1d_params(tb.conv1d),
        "BiGRU_0": bigru_params(tb.gru1),
        "LayerNorm_0": layernorm_params(tb.norm1),
        "BiGRU_1": bigru_params(tb.gru2),
        "LayerNorm_1": layernorm_params(tb.norm2),
    }
    if tb.internal_dim != tb.latent_dim:
        params["Dense_0"] = linear_params(tb.projection)
    return params


def censnet_params(tc) -> dict:
    return {
        "node_kernel": _np(tc.node_kernel),
        "edge_kernel": _np(tc.edge_kernel),
        "node_weights": _np(tc.node_weights),
        "edge_weights": _np(tc.edge_weights),
        "node_bias": _np(tc.node_bias),
        "edge_bias": _np(tc.edge_bias),
    }


def recurrent_encoder_params(te) -> dict:
    """reference RecurrentEncoderPT -> flax RecurrentEncoder param tree."""
    if te.use_gnn:
        return {
            "RecurrentBlock_0": recurrent_block_params(te.node_recurrent_block),
            "RecurrentBlock_1": recurrent_block_params(te.edge_recurrent_block),
            "CensNetConv_0": censnet_params(te.spatial_gnn_block),
            "Dense_0": linear_params(te.final_dense),
        }
    return {
        "RecurrentBlock_0": recurrent_block_params(te.recurrent_block),
        "Dense_0": linear_params(te.final_dense),
    }


def assign_tree(template: dict, source: dict, path: str = "") -> dict:
    """Shape-checked deep replacement of `template` leaves with `source`."""
    import jax.numpy as jnp

    out = {}
    t_keys = set(template.keys())
    s_keys = set(source.keys())
    assert t_keys == s_keys, (
        f"param tree mismatch at {path or '<root>'}: template-only "
        f"{sorted(t_keys - s_keys)}, source-only {sorted(s_keys - t_keys)}"
    )
    for k, tv in template.items():
        sv = source[k]
        if isinstance(tv, dict):
            out[k] = assign_tree(tv, sv, f"{path}/{k}")
        else:
            sv = np.asarray(sv, np.float32)
            assert tuple(tv.shape) == tuple(sv.shape), (
                f"shape mismatch at {path}/{k}: {tv.shape} vs {sv.shape}"
            )
            out[k] = jnp.asarray(sv)
    return out


# --------------------------------------------------------------------------- #
# TCN
# --------------------------------------------------------------------------- #


def batchnorm_params(tb):
    """torch BatchNorm1d -> (flax params, flax batch_stats)."""
    return (
        {"scale": _np(tb.weight), "bias": _np(tb.bias)},
        {"mean": _np(tb.running_mean), "var": _np(tb.running_var)},
    )


def temporal_block_params(tb):
    """reference TemporalBlockPT -> (params, batch_stats)."""
    bn1_p, bn1_s = batchnorm_params(tb.bn1)
    bn2_p, bn2_s = batchnorm_params(tb.bn2)
    params = {
        "conv1": conv1d_params(tb.conv1),
        "bn1": bn1_p,
        "conv2": conv1d_params(tb.conv2),
        "bn2": bn2_p,
    }
    if tb.downsample is not None:
        params["downsample"] = conv1d_params(tb.downsample)
    return params, {"bn1": bn1_s, "bn2": bn2_s}


def tcn_params(ttcn):
    """reference TCN1DPT -> (params, batch_stats) with TemporalBlock_i."""
    params, stats = {}, {}
    for i, blk in enumerate(ttcn.blocks):
        p, s = temporal_block_params(blk)
        params[f"TemporalBlock_{i}"] = p
        stats[f"TemporalBlock_{i}"] = s
    return params, stats


def _head_params(thead, dense_offset: int):
    """reference MLP head (Linear, ReLU, BN, Linear, ReLU, BN, Linear) ->
    (params, batch_stats) with Dense_{i}/BatchNorm_{j} naming."""
    params = {
        f"Dense_{dense_offset}": linear_params(thead[0]),
        f"Dense_{dense_offset + 1}": linear_params(thead[3]),
        f"Dense_{dense_offset + 2}": linear_params(thead[6]),
    }
    bn0_p, bn0_s = batchnorm_params(thead[2])
    bn1_p, bn1_s = batchnorm_params(thead[5])
    params["BatchNorm_0"] = bn0_p
    params["BatchNorm_1"] = bn1_p
    return params, {"BatchNorm_0": bn0_s, "BatchNorm_1": bn1_s}


def tcn_encoder_params(te):
    """reference TCNEncoderPT -> (params, batch_stats)."""
    if te.use_gnn:
        node_p, node_s = tcn_params(te.node_tcn)
        edge_p, edge_s = tcn_params(te.edge_tcn)
        params = {"TCN_0": node_p, "TCN_1": edge_p,
                  "CensNetConv_0": censnet_params(te.spatial_gnn_block)}
        stats = {"TCN_0": node_s, "TCN_1": edge_s}
    else:
        flat_p, flat_s = tcn_params(te.flat_tcn)
        params = {"TCN_0": flat_p}
        stats = {"TCN_0": flat_s}
    head_p, head_s = _head_params(te.head, dense_offset=0)
    params.update(head_p)
    stats.update(head_s)
    return params, stats


# --------------------------------------------------------------------------- #
# Transformer
# --------------------------------------------------------------------------- #


def mha_params(tm):
    """reference MultiHeadAttentionPT -> flax MultiHeadDotProductAttention."""
    h, k = tm.num_heads, tm.key_dim
    in_dim = tm.in_dim

    def qkv(lin):
        return {"kernel": _np(lin.weight).T.reshape(in_dim, h, k)}

    return {
        "query": qkv(tm.q_proj),
        "key": qkv(tm.k_proj),
        "value": qkv(tm.v_proj),
        "out": {"kernel": _np(tm.out_proj.weight).T.reshape(h, k, in_dim)},
    }


def transformer_layer_params(tl):
    """reference TransformerEncoderLayerPT -> flax TransformerEncoderLayer."""
    return {
        "MultiHeadDotProductAttention_0": mha_params(tl.mha),
        "LayerNorm_0": layernorm_params(tl.norm1),
        "Dense_0": linear_params(tl.ffn[0]),
        "Dense_1": linear_params(tl.ffn[2]),
        "LayerNorm_1": layernorm_params(tl.norm2),
    }


def tfm_encoder_params(te):
    """reference TFMEncoderPT -> (params, batch_stats).

    flax name counters run across both stream cores: Dense_0 + layers
    0..L-1 belong to the node core, Dense_1 + layers L..2L-1 to the edge
    core, then the head takes Dense_2..4.
    """
    params, stats = {}, {}
    if te.use_gnn:
        cores = [("node", te.node_tf), ("edge", te.edge_tf)]
    else:
        cores = [("flat", te.flat_tf)]
    layer_i = 0
    for dense_i, (_, core) in enumerate(cores):
        params[f"Dense_{dense_i}"] = linear_params(core.embed)
        for tl in core.layers:
            params[f"TransformerEncoderLayer_{layer_i}"] = (
                transformer_layer_params(tl)
            )
            layer_i += 1
    if te.use_gnn:
        params["CensNetConv_0"] = censnet_params(te.spatial_gnn_block)
    head_p, head_s = _head_params(te.head, dense_offset=len(cores))
    params.update(head_p)
    stats.update(head_s)
    return params, stats


# --------------------------------------------------------------------------- #
# Decoders / heads / full models
# --------------------------------------------------------------------------- #


def recurrent_decoder_params(td) -> dict:
    """reference RecurrentDecoderPT -> flax RecurrentDecoder."""
    return {
        "BiGRU_0": bigru_params(td.gru1),
        "LayerNorm_0": layernorm_params(td.norm1),
        "BiGRU_1": bigru_params(td.gru2),
        "LayerNorm_1": layernorm_params(td.norm2),
        "Conv_0": conv1d_params(td.conv1d),
        "LayerNorm_2": layernorm_params(td.norm3),
        "ProbabilisticHead_0": {
            "Dense_0": linear_params(td.prob_decoder.loc_projection)
        },
    }


def vqvae_model_params(tm) -> dict:
    """reference VQVAEPT (recurrent encoder) -> flax VQVAE."""
    return {
        "encoder": recurrent_encoder_params(tm.encoder),
        "decoder": recurrent_decoder_params(tm.decoder),
        "vq_layer": {"codebook": _np(tm.vq_layer.codebook)},
    }


def vade_model_params(tm) -> dict:
    """reference VaDEPT (recurrent encoder) -> flax VaDE."""
    ls = tm.latent_space
    return {
        "encoder": recurrent_encoder_params(tm.encoder),
        "decoder": recurrent_decoder_params(tm.decoder),
        "latent_space": {
            "gmm_means": _np(ls.gmm_means),
            "gmm_log_vars": _np(ls.gmm_log_vars),
            "encoder_mean": linear_params(ls.encoder_mean),
            "encoder_log_var": linear_params(ls.encoder_log_var),
        },
    }


def tcn_decoder_params(td):
    """reference TCNDecoderPT -> (params, batch_stats)."""
    tcn_p, tcn_s = tcn_params(td.tcn)
    params = {
        "Dense_0": linear_params(td.fc0),
        "Dense_1": linear_params(td.fc1),
        "Dense_2": linear_params(td.fc2),
        "TCN_0": tcn_p,
        "ProbabilisticHead_0": {
            "Dense_0": linear_params(td.prob_decoder.loc_projection)
        },
    }
    stats = {"TCN_0": tcn_s}
    for i, bn in enumerate((td.bn0, td.bn1, td.bn2)):
        bn_p, bn_s = batchnorm_params(bn)
        params[f"BatchNorm_{i}"] = bn_p
        stats[f"BatchNorm_{i}"] = bn_s
    return params, stats


def causal_layer_params(tl):
    """reference CausalSelfAttentionLayer -> flax CausalSelfAttentionLayer."""
    h = tl.num_heads
    k = tl.head_dim
    d = tl.d_model

    def qkv(lin):
        return {"kernel": _np(lin.weight).T.reshape(d, h, k)}

    return {
        "LayerNorm_0": layernorm_params(tl.norm1),
        "MultiHeadDotProductAttention_0": {
            "query": qkv(tl.q_proj),
            "key": qkv(tl.k_proj),
            "value": qkv(tl.v_proj),
            "out": {"kernel": _np(tl.out_proj.weight).T.reshape(h, k, d)},
        },
        "LayerNorm_1": layernorm_params(tl.norm2),
        "Dense_0": linear_params(tl.ffn[0]),
        "Dense_1": linear_params(tl.ffn[3]),
    }


def tfm_decoder_params(td):
    """reference TFMDecoderPT -> flax TransformerDecoder params."""
    params = {
        "Dense_0": linear_params(td.latent_expand[0]),
        "Dense_1": linear_params(td.latent_expand[2]),
        "Dense_2": linear_params(td.latent_expand[4]),
        "Dense_3": linear_params(td.output_proj),
        "ProbabilisticHead_0": {
            "Dense_0": linear_params(td.prob_decoder.loc_projection)
        },
    }
    for i, tl in enumerate(td.layers):
        params[f"CausalSelfAttentionLayer_{i}"] = causal_layer_params(tl)
    return params


def vqvae_model_params_typed(tm, encoder_type: str):
    """reference VQVAEPT for any encoder family -> (params, batch_stats)."""
    stats = {}
    if encoder_type == "recurrent":
        enc_p = recurrent_encoder_params(tm.encoder)
        dec_p = recurrent_decoder_params(tm.decoder)
    elif encoder_type == "TCN":
        enc_p, enc_s = tcn_encoder_params(tm.encoder)
        dec_p, dec_s = tcn_decoder_params(tm.decoder)
        stats = {"encoder": enc_s, "decoder": dec_s}
    else:  # transformer
        enc_p, enc_s = tfm_encoder_params(tm.encoder)
        dec_p = tfm_decoder_params(tm.decoder)
        stats = {"encoder": enc_s}
    params = {
        "encoder": enc_p,
        "decoder": dec_p,
        "vq_layer": {"codebook": _np(tm.vq_layer.codebook)},
    }
    return params, stats
