"""Torch <-> flax weight conversion for the reference Poser checkpoints.

Maps the reference's ``state_dict`` names (`cs_vit/net/ti_poser.py`,
`transformer_module.py`, `latent_transformers.py`) to this repo's flax
parameter/batch-stats trees so released ``checkpoint.pt["merged"]`` weights
load directly. torch is only needed to *read* .pt files (see
``tools/convert_torch_ckpt.py``); this module is numpy-only.

Name scheme (reference -> flax):
  backbone.*                        -> backbone/* (HF Swinv2, see swinv2.py)
  query_token                       -> query_token
  perspective_mlp.proj              -> perspective_mlp/proj
  perspective_mlp.layer.{0,3,6}     -> perspective_mlp/bn{0,1,2} (+ stats)
  perspective_mlp.layer.{1,4,7}     -> perspective_mlp/fc{0,1,2}
  perspective_mlp.layer.9           -> perspective_mlp/out
  spatial_encoder.pe_spatial.pe     -> spatial_encoder/pe_spatial/pe
  spatial_encoder.layers.N.*        -> spatial_encoder/layerN/*
  *_temporal_encoder.*              -> same structure + zero_conv
  {pose,shape,root}_decoder.0       -> {pose,shape,root}_decoder
  latent_trans.*                    -> latent_trans/*
MHA: query/key/value/output; FFN: net.0 -> fc1, net.2 -> fc2;
BatchNorm1d: weight/bias -> params scale/bias, running_* -> batch_stats.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..models.poser import PoserConfig
from ..models.swinv2 import convert_hf_swinv2_state_dict


class _TreeBuilder:
    def __init__(self):
        self.params: Dict = {}
        self.stats: Dict = {}

    def _set(self, tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def param(self, path, value):
        self._set(self.params, path, value)

    def stat(self, path, value):
        self._set(self.stats, path, value)


def _lin(b: _TreeBuilder, sd, tname, fpath, bias=True):
    b.param(fpath + ("kernel",), np.asarray(sd[tname + ".weight"]).T)
    if bias:
        b.param(fpath + ("bias",), sd[tname + ".bias"])


def _bn(b: _TreeBuilder, sd, tname, fpath):
    b.param(fpath + ("scale",), sd[tname + ".weight"])
    b.param(fpath + ("bias",), sd[tname + ".bias"])
    b.stat(fpath + ("mean",), sd[tname + ".running_mean"])
    b.stat(fpath + ("var",), sd[tname + ".running_var"])


def _mha(b, sd, tname, fpath):
    for n in ("query", "key", "value", "output"):
        _lin(b, sd, f"{tname}.{n}", fpath + (n,))


def _ffn(b, sd, tname, fpath):
    _lin(b, sd, f"{tname}.net.0", fpath + ("fc1",))
    _lin(b, sd, f"{tname}.net.2", fpath + ("fc2",))


def _encoder_block(b, sd, tname, fpath):
    _mha(b, sd, f"{tname}.attn", fpath + ("attn",))
    _ffn(b, sd, f"{tname}.ffn", fpath + ("ffn",))
    _bn(b, sd, f"{tname}.norm1", fpath + ("norm1",))
    _bn(b, sd, f"{tname}.norm2", fpath + ("norm2",))


def _decoder_block(b, sd, tname, fpath):
    _mha(b, sd, f"{tname}.self_atten", fpath + ("self_atten",))
    _mha(b, sd, f"{tname}.cross_atten", fpath + ("cross_atten",))
    _ffn(b, sd, f"{tname}.ffn", fpath + ("ffn",))
    for n in ("norm1", "norm2", "norm3"):
        _bn(b, sd, f"{tname}.{n}", fpath + (n,))


def _cross_attn_decoder(b, sd, tname, fpath):
    _mha(b, sd, f"{tname}.cross_atten", fpath + ("cross_atten",))
    _ffn(b, sd, f"{tname}.ffn", fpath + ("ffn",))
    _bn(b, sd, f"{tname}.norm1", fpath + ("norm1",))
    _bn(b, sd, f"{tname}.norm2", fpath + ("norm2",))


def _angle_embedder(b, sd, tname, fpath):
    b.param(fpath + ("freq_base",), sd[tname + ".freq_base"])
    _lin(b, sd, f"{tname}.proj.0", fpath + ("proj",))
    b.param(fpath + ("norm", "scale"), sd[tname + ".proj.2.weight"])
    b.param(fpath + ("norm", "bias"), sd[tname + ".proj.2.bias"])


def _mlp3(b, sd, tname, fpath):
    for i, n in ((0, "fc1"), (2, "fc2"), (4, "fc3")):
        _lin(b, sd, f"{tname}.{i}", fpath + (n,))


def convert_poser_state_dict(
    state_dict: Dict[str, np.ndarray], config: PoserConfig
) -> Tuple[Dict, Dict]:
    """Reference Poser state_dict (numpy values) -> (params, batch_stats)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    b = _TreeBuilder()

    # backbone (strip prefix, delegate to the Swinv2 converter)
    backbone_sd = {
        k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")
    }
    b.params["backbone"] = convert_hf_swinv2_state_dict(backbone_sd, config.swin_config())

    b.param(("query_token",), sd["query_token"])

    # perspective encoder
    _lin(b, sd, "perspective_mlp.proj", ("perspective_mlp", "proj"))
    for i, idx in enumerate((0, 3, 6)):
        _bn(b, sd, f"perspective_mlp.layer.{idx}", ("perspective_mlp", f"bn{i}"))
    for i, idx in enumerate((1, 4, 7)):
        _lin(b, sd, f"perspective_mlp.layer.{idx}", ("perspective_mlp", f"fc{i}"))
    _lin(b, sd, "perspective_mlp.layer.9", ("perspective_mlp", "out"))

    # spatial encoder
    b.param(
        ("spatial_encoder", "pe_spatial", "pe"),
        sd["spatial_encoder.pe_spatial.pe.weight"],
    )
    for i in range(config.num_spatial_layer):
        t = f"spatial_encoder.layers.{i}"
        f = ("spatial_encoder", f"layer{i}")
        if config.spatial_layer_type == "decoder":
            _decoder_block(b, sd, t, f)
        else:
            _encoder_block(b, sd, t, f)

    # temporal encoders
    for name in ("pose_temporal_encoder", "shape_temporal_encoder", "root_temporal_encoder"):
        if config.temporal_supervision == "full":
            b.param((name, "pe_temporal", "pe"), sd[f"{name}.pe_temporal.pe.weight"])
            for i in range(config.num_temporal_layer):
                _encoder_block(b, sd, f"{name}.layers.{i}", (name, f"layer{i}"))
        else:
            # trope PE has no learned params (inv_freq is a fixed buffer)
            for i in range(config.num_temporal_layer):
                _cross_attn_decoder(b, sd, f"{name}.layers.{i}", (name, f"layer{i}"))
        b.param((name, "zero_conv", "kernel"), np.asarray(sd[f"{name}.zero_conv.weight"]).T)

    # heads (Sequential of one Linear in the reference)
    for name in ("pose_decoder", "shape_decoder", "root_decoder"):
        _lin(b, sd, f"{name}.0", (name,))

    # latent transformation group
    if config.num_latent_layer is not None and any(
        k.startswith("latent_trans.") for k in sd
    ):
        lt = ("latent_trans",)
        b.param(lt + ("rope2d", "embedding"), sd["latent_trans.rope2d.embedding"])
        _angle_embedder(b, sd, "latent_trans.scale_embedder", lt + ("scale_embedder",))
        _angle_embedder(b, sd, "latent_trans.angle_embedder", lt + ("angle_embedder",))
        _mlp3(b, sd, "latent_trans.scale_linear", lt + ("scale_linear",))
        _mlp3(b, sd, "latent_trans.angle_linear", lt + ("angle_linear",))
        for i in range(config.num_latent_layer):
            _encoder_block(b, sd, f"latent_trans.sr.{i}", lt + (f"sr{i}",))

    return b.params, b.stats


def export_poser_state_dict(
    params: Dict, batch_stats: Dict, config: PoserConfig
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_poser_state_dict`: flax trees -> reference-
    style torch state_dict names (numpy values), for interchange back to the
    reference ecosystem (e.g. wrapping into a ``checkpoint.pt["merged"]``).

    Backbone params are exported under HF Swinv2 names with the ``backbone.``
    prefix. num_batches_tracked counters are synthesized as zeros.
    """
    from flax.traverse_util import flatten_dict

    out: Dict[str, np.ndarray] = {}
    p_flat = flatten_dict(params)
    s_flat = flatten_dict(batch_stats)

    def lin_out(fpath, tname, bias=True):
        out[tname + ".weight"] = np.asarray(p_flat[fpath + ("kernel",)]).T
        if bias:
            out[tname + ".bias"] = np.asarray(p_flat[fpath + ("bias",)])

    def bn_out(fpath, tname):
        out[tname + ".weight"] = np.asarray(p_flat[fpath + ("scale",)])
        out[tname + ".bias"] = np.asarray(p_flat[fpath + ("bias",)])
        out[tname + ".running_mean"] = np.asarray(s_flat[fpath + ("mean",)])
        out[tname + ".running_var"] = np.asarray(s_flat[fpath + ("var",)])
        out[tname + ".num_batches_tracked"] = np.zeros((), np.int64)

    def mha_out(fpath, tname):
        for n in ("query", "key", "value", "output"):
            lin_out(fpath + (n,), f"{tname}.{n}")

    def ffn_out(fpath, tname):
        lin_out(fpath + ("fc1",), f"{tname}.net.0")
        lin_out(fpath + ("fc2",), f"{tname}.net.2")

    def encoder_block_out(fpath, tname):
        mha_out(fpath + ("attn",), f"{tname}.attn")
        ffn_out(fpath + ("ffn",), f"{tname}.ffn")
        bn_out(fpath + ("norm1",), f"{tname}.norm1")
        bn_out(fpath + ("norm2",), f"{tname}.norm2")

    def decoder_block_out(fpath, tname):
        mha_out(fpath + ("self_atten",), f"{tname}.self_atten")
        mha_out(fpath + ("cross_atten",), f"{tname}.cross_atten")
        ffn_out(fpath + ("ffn",), f"{tname}.ffn")
        for n in ("norm1", "norm2", "norm3"):
            bn_out(fpath + (n,), f"{tname}.{n}")

    def cross_attn_out(fpath, tname):
        mha_out(fpath + ("cross_atten",), f"{tname}.cross_atten")
        ffn_out(fpath + ("ffn",), f"{tname}.ffn")
        bn_out(fpath + ("norm1",), f"{tname}.norm1")
        bn_out(fpath + ("norm2",), f"{tname}.norm2")

    def angle_emb_out(fpath, tname):
        out[tname + ".freq_base"] = np.asarray(p_flat[fpath + ("freq_base",)])
        lin_out(fpath + ("proj",), f"{tname}.proj.0")
        out[tname + ".proj.2.weight"] = np.asarray(p_flat[fpath + ("norm", "scale")])
        out[tname + ".proj.2.bias"] = np.asarray(p_flat[fpath + ("norm", "bias")])

    def mlp3_out(fpath, tname):
        for i, n in ((0, "fc1"), (2, "fc2"), (4, "fc3")):
            lin_out(fpath + (n,), f"{tname}.{i}")

    # backbone -> HF Swinv2 names
    sw = config.swin_config()
    bb = params["backbone"]
    out["backbone.embeddings.patch_embeddings.projection.weight"] = np.asarray(
        bb["patch_embed"]["kernel"]
    ).transpose(3, 2, 0, 1)
    out["backbone.embeddings.patch_embeddings.projection.bias"] = np.asarray(
        bb["patch_embed"]["bias"]
    )
    out["backbone.embeddings.norm.weight"] = np.asarray(bb["patch_norm"]["scale"])
    out["backbone.embeddings.norm.bias"] = np.asarray(bb["patch_norm"]["bias"])
    for s in range(sw.num_layers):
        for bix in range(sw.depths[s]):
            blk = bb[f"stage{s}_block{bix}"]
            base = f"backbone.encoder.layers.{s}.blocks.{bix}"
            a = blk["attn"]
            out[base + ".attention.self.logit_scale"] = np.asarray(a["logit_scale"])
            out[base + ".attention.self.continuous_position_bias_mlp.0.weight"] = (
                np.asarray(a["cpb1"]["kernel"]).T
            )
            out[base + ".attention.self.continuous_position_bias_mlp.0.bias"] = (
                np.asarray(a["cpb1"]["bias"])
            )
            out[base + ".attention.self.continuous_position_bias_mlp.2.weight"] = (
                np.asarray(a["cpb2"]["kernel"]).T
            )
            for n in ("query", "value"):
                out[base + f".attention.self.{n}.weight"] = np.asarray(a[n]["kernel"]).T
                out[base + f".attention.self.{n}.bias"] = np.asarray(a[n]["bias"])
            out[base + ".attention.self.key.weight"] = np.asarray(a["key"]["kernel"]).T
            out[base + ".attention.output.dense.weight"] = np.asarray(a["proj"]["kernel"]).T
            out[base + ".attention.output.dense.bias"] = np.asarray(a["proj"]["bias"])
            for ln_name in ("layernorm_before", "layernorm_after"):
                out[base + f".{ln_name}.weight"] = np.asarray(blk[ln_name]["scale"])
                out[base + f".{ln_name}.bias"] = np.asarray(blk[ln_name]["bias"])
            out[base + ".intermediate.dense.weight"] = np.asarray(
                blk["intermediate"]["kernel"]
            ).T
            out[base + ".intermediate.dense.bias"] = np.asarray(blk["intermediate"]["bias"])
            out[base + ".output.dense.weight"] = np.asarray(blk["output"]["kernel"]).T
            out[base + ".output.dense.bias"] = np.asarray(blk["output"]["bias"])
        if s < sw.num_layers - 1:
            ds = bb[f"stage{s}_downsample"]
            out[f"backbone.encoder.layers.{s}.downsample.reduction.weight"] = np.asarray(
                ds["reduction"]["kernel"]
            ).T
            out[f"backbone.encoder.layers.{s}.downsample.norm.weight"] = np.asarray(
                ds["norm"]["scale"]
            )
            out[f"backbone.encoder.layers.{s}.downsample.norm.bias"] = np.asarray(
                ds["norm"]["bias"]
            )
    out["backbone.layernorm.weight"] = np.asarray(bb["layernorm"]["scale"])
    out["backbone.layernorm.bias"] = np.asarray(bb["layernorm"]["bias"])

    out["query_token"] = np.asarray(params["query_token"])

    lin_out(("perspective_mlp", "proj"), "perspective_mlp.proj")
    for i, idx in enumerate((0, 3, 6)):
        bn_out(("perspective_mlp", f"bn{i}"), f"perspective_mlp.layer.{idx}")
    for i, idx in enumerate((1, 4, 7)):
        lin_out(("perspective_mlp", f"fc{i}"), f"perspective_mlp.layer.{idx}")
    lin_out(("perspective_mlp", "out"), "perspective_mlp.layer.9")

    out["spatial_encoder.pe_spatial.pe.weight"] = np.asarray(
        p_flat[("spatial_encoder", "pe_spatial", "pe")]
    )
    for i in range(config.num_spatial_layer):
        f = ("spatial_encoder", f"layer{i}")
        t = f"spatial_encoder.layers.{i}"
        if config.spatial_layer_type == "decoder":
            decoder_block_out(f, t)
        else:
            encoder_block_out(f, t)

    for name in ("pose_temporal_encoder", "shape_temporal_encoder", "root_temporal_encoder"):
        if config.temporal_supervision == "full":
            out[f"{name}.pe_temporal.pe.weight"] = np.asarray(
                p_flat[(name, "pe_temporal", "pe")]
            )
            for i in range(config.num_temporal_layer):
                encoder_block_out((name, f"layer{i}"), f"{name}.layers.{i}")
        else:
            for i in range(config.num_temporal_layer):
                cross_attn_out((name, f"layer{i}"), f"{name}.layers.{i}")
        out[f"{name}.zero_conv.weight"] = np.asarray(
            p_flat[(name, "zero_conv", "kernel")]
        ).T

    for name in ("pose_decoder", "shape_decoder", "root_decoder"):
        lin_out((name,), f"{name}.0")

    if config.num_latent_layer is not None and "latent_trans" in params:
        lt = ("latent_trans",)
        out["latent_trans.rope2d.embedding"] = np.asarray(
            p_flat[lt + ("rope2d", "embedding")]
        )
        angle_emb_out(lt + ("scale_embedder",), "latent_trans.scale_embedder")
        angle_emb_out(lt + ("angle_embedder",), "latent_trans.angle_embedder")
        mlp3_out(lt + ("scale_linear",), "latent_trans.scale_linear")
        mlp3_out(lt + ("angle_linear",), "latent_trans.angle_linear")
        for i in range(config.num_latent_layer):
            encoder_block_out(lt + (f"sr{i}",), f"latent_trans.sr.{i}")

    return out


def convert_submodule_state_dict(
    state_dict: Dict[str, np.ndarray], kind: str
) -> Tuple[Dict, Dict]:
    """Convert a single reference submodule's root-level state_dict.

    Used by the unit-level parity tests that load weights straight out of a
    reference torch module. kind: 'mha' | 'encoder_block' | 'decoder_block' |
    'cross_attn_decoder' | 'angle_embedder' | 'sr_complex:<num_layers>'
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    b = _TreeBuilder()
    if kind == "mha":
        for n in ("query", "key", "value", "output"):
            _lin(b, sd, n, (n,))
    elif kind == "lora_mha":
        # deprecated LoraCompatibleMHA: q/k/v Linears + torch
        # nn.MultiheadAttention (fused in_proj split into thirds + out_proj)
        for n in ("q_proj", "k_proj", "v_proj"):
            _lin(b, sd, n, (n,))
        w = np.asarray(sd["mha.in_proj_weight"])
        bias = np.asarray(sd["mha.in_proj_bias"])
        E = w.shape[1]
        for i, n in enumerate(("in_q", "in_k", "in_v")):
            b.param((n, "kernel"), w[i * E:(i + 1) * E].T)
            b.param((n, "bias"), bias[i * E:(i + 1) * E])
        _lin(b, sd, "mha.out_proj", ("out",))
    elif kind == "encoder_block":
        _mha(b, sd, "attn", ("attn",))
        _ffn(b, sd, "ffn", ("ffn",))
        _bn(b, sd, "norm1", ("norm1",))
        _bn(b, sd, "norm2", ("norm2",))
    elif kind == "decoder_block":
        _mha(b, sd, "self_atten", ("self_atten",))
        _mha(b, sd, "cross_atten", ("cross_atten",))
        _ffn(b, sd, "ffn", ("ffn",))
        for n in ("norm1", "norm2", "norm3"):
            _bn(b, sd, n, (n,))
    elif kind == "cross_attn_decoder":
        _mha(b, sd, "cross_atten", ("cross_atten",))
        _ffn(b, sd, "ffn", ("ffn",))
        _bn(b, sd, "norm1", ("norm1",))
        _bn(b, sd, "norm2", ("norm2",))
    elif kind == "angle_embedder":
        b.param(("freq_base",), sd["freq_base"])
        _lin(b, sd, "proj.0", ("proj",))
        b.param(("norm", "scale"), sd["proj.2.weight"])
        b.param(("norm", "bias"), sd["proj.2.bias"])
    elif kind.startswith("sr_complex"):
        n_layers = int(kind.split(":")[1])
        b.param(("rope2d", "embedding"), sd["rope2d.embedding"])
        _angle_embedder(b, sd, "scale_embedder", ("scale_embedder",))
        _angle_embedder(b, sd, "angle_embedder", ("angle_embedder",))
        _mlp3(b, sd, "scale_linear", ("scale_linear",))
        _mlp3(b, sd, "angle_linear", ("angle_linear",))
        for i in range(n_layers):
            _encoder_block(b, sd, f"sr.{i}", (f"sr{i}",))
    else:
        raise ValueError(kind)
    return b.params, b.stats
