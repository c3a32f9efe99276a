# -*- coding: utf-8 -*-
"""Import reference (PyTorch) checkpoints into drin_tpu parameter pytrees.

Maps the reference models' ``state_dict`` layouts (drin/model.py,
baselines/ghmfc.py, baselines/melhi.py) onto our flax parameter trees so
users can migrate trained weights, and so the golden-parity test suite can
drive both implementations with identical parameters.

Conventions: torch ``Linear.weight`` is [out, in] -> flax ``kernel`` [in, out]
(transposed); torch MultiheadAttention packs q/k/v into ``in_proj_weight``
when dims match, else ``q_proj_weight``/``k_proj_weight``/``v_proj_weight``.
All arrays are returned as numpy (framework-agnostic leaves).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w).T.copy()


def _a(w) -> np.ndarray:
    return np.asarray(w).copy()


def _linear(sd: Mapping, prefix: str) -> Dict:
    return {"kernel": _t(sd[prefix + ".weight"]), "bias": _a(sd[prefix + ".bias"])}


def _wrapped_linear(sd: Mapping, prefix: str) -> Dict:
    """Our ``Linear`` module wraps an anonymous Dense ('Dense_0')."""
    return {"Dense_0": _linear(sd, prefix)}


def _layernorm(sd: Mapping, prefix: str) -> Dict:
    return {"scale": _a(sd[prefix + ".weight"]), "bias": _a(sd[prefix + ".bias"])}


def _mha(sd: Mapping, prefix: str) -> Dict:
    """torch nn.MultiheadAttention -> our MultiheadAttention params."""
    out = {"out_proj": _linear(sd, prefix + ".out_proj")}
    if prefix + ".in_proj_weight" in sd:
        w = np.asarray(sd[prefix + ".in_proj_weight"])  # [3E, E]
        b = np.asarray(sd[prefix + ".in_proj_bias"])
        qw, kw, vw = np.split(w, 3, axis=0)
        qb, kb, vb = np.split(b, 3, axis=0)
    else:  # distinct kdim/vdim
        qw, kw, vw = (np.asarray(sd[prefix + f".{n}_proj_weight"]) for n in "qkv")
        b = np.asarray(sd[prefix + ".in_proj_bias"])
        qb, kb, vb = np.split(b, 3, axis=0)
    out["q_proj"] = {"kernel": qw.T.copy(), "bias": qb.copy()}
    out["k_proj"] = {"kernel": kw.T.copy(), "bias": kb.copy()}
    out["v_proj"] = {"kernel": vw.T.copy(), "bias": vb.copy()}
    return out


def _cross_attention(sd: Mapping, prefix: str) -> Dict:
    """Reference CrossAttention (ghmfc.py:93-128) -> our CrossAttention."""
    return {
        "a2b_attention": _mha(sd, prefix + ".a2b_attention"),
        "b2a_attention": _mha(sd, prefix + ".b2a_attention"),
        "a2b_ffn": _wrapped_linear(sd, prefix + ".a2b_ffn"),
        "b2a_ffn": _wrapped_linear(sd, prefix + ".b2a_ffn"),
        "ln0": _layernorm(sd, prefix + ".layernorms.0"),
        "ln1": _layernorm(sd, prefix + ".layernorms.1"),
        "ln2": _layernorm(sd, prefix + ".layernorms.2"),
        "ln3": _layernorm(sd, prefix + ".layernorms.3"),
    }


def _multimodal_fusion(sd: Mapping, prefix: str) -> Dict:
    """Reference MultimodalFusion (ghmfc.py:131-149)."""
    return {
        "t2v_attention": _cross_attention(sd, prefix + ".t2v_attention"),
        "v2t_attention": _cross_attention(sd, prefix + ".v2t_attention"),
        "text_linear": _wrapped_linear(sd, prefix + ".text_linear"),
        "image_linear": _wrapped_linear(sd, prefix + ".image_linear"),
        "score_linear": _wrapped_linear(sd, prefix + ".score_linear"),
    }


def _transformer_encoder(sd: Mapping, prefix: str, num_layers: int) -> Dict:
    """torch nn.TransformerEncoder -> our MultilayerTransformer."""
    out = {}
    for i in range(num_layers):
        p = f"{prefix}.layers.{i}"
        out[f"layer_{i}"] = {
            "self_attn": _mha(sd, p + ".self_attn"),
            "linear1": _linear(sd, p + ".linear1"),
            "linear2": _linear(sd, p + ".linear2"),
            "norm1": _layernorm(sd, p + ".norm1"),
            "norm2": _layernorm(sd, p + ".norm2"),
        }
    return out


# ---------------------------------------------------------------------------


def drin_params_from_torch(sd: Mapping, num_gcn_layers: int = 2, edge_vector: bool = False,
                           transformer_num_layers: int = 8) -> Dict:
    """Reference DRIN state_dict -> our DRIN flax params (model.py:156-209).

    The text-vertex encoders are GHMFC's Mention/EntityEncoder (reference
    model.py:21-22); their sub-structure is detected from the state_dict
    (linear / transformer / none)."""
    ve: Dict = {
        "mention_image_linear": _wrapped_linear(sd, "vertex_encoder.mention_image_linear"),
        "entity_image_linear": _wrapped_linear(sd, "vertex_encoder.entity_image_linear"),
    }
    if "vertex_encoder.mention_text_encoder.final_layer.linear.weight" in sd:
        ve["mention_text_encoder"] = {
            "final_layer": {
                "linear": _wrapped_linear(sd, "vertex_encoder.mention_text_encoder.final_layer.linear")
            }
        }
    elif "vertex_encoder.mention_text_encoder.intermediate_layer.transformer.layers.0.linear1.weight" in sd:
        ve["mention_text_encoder"] = {
            "intermediate_layer": _transformer_encoder(
                sd, "vertex_encoder.mention_text_encoder.intermediate_layer.transformer",
                transformer_num_layers)
        }
    if "vertex_encoder.entity_text_encoder.final_layer.weight" in sd:
        ve["entity_text_encoder"] = {
            "final_layer": _wrapped_linear(sd, "vertex_encoder.entity_text_encoder.final_layer")
        }
    params: Dict = {"vertex_encoder": ve}
    for i in range(num_gcn_layers):
        p = f"gcn_layers.{i}"
        layer = {
            "w_h": _wrapped_linear(sd, p + ".w_h"),
            "layer_norm": _layernorm(sd, p + ".layer_norm"),
        }
        if edge_vector:
            layer["w_u"] = _wrapped_linear(sd, p + ".w_u")
            layer["w_v"] = _wrapped_linear(sd, p + ".w_v")
            layer["w_m"] = _wrapped_linear(sd, p + ".w_m")
        else:
            # scalar mode uses flat params (the folded edge update,
            # drin.py GCNLayer)
            layer["w_u_kernel"] = _t(sd[p + ".w_u.weight"])
            layer["w_u_bias"] = _a(sd[p + ".w_u.bias"])
            layer["w_v_kernel"] = _t(sd[p + ".w_v.weight"])
            layer["w_v_bias"] = _a(sd[p + ".w_v.bias"])
        params[f"gcn_{i}"] = layer
    return params


def ghmfc_params_from_torch(sd: Mapping, cfg) -> Dict:
    """Reference GHMFC state_dict -> our GHMFC flax params.

    Covers the offline configuration (ghmfc defaults, args.py:8-19:
    mention multimodal-bi fusion + entity linear)."""
    params: Dict = {}
    me: Dict = {}
    if cfg.mention_final_layer_name == "multimodal" and cfg.mention_multimodal_attention == "bi":
        me["intermediate_layer"] = _multimodal_fusion(
            sd, "mention_encoder.intermediate_layer")
    elif cfg.mention_final_layer_name == "multimodal":
        me["intermediate_layer"] = _cross_attention(
            sd, "mention_encoder.intermediate_layer")
    elif cfg.mention_final_layer_name == "transformer":
        me["intermediate_layer"] = _transformer_encoder(
            sd, "mention_encoder.intermediate_layer.transformer", cfg.transformer_num_layers
        )
    elif cfg.mention_final_layer_name == "linear":
        me["final_layer"] = {"linear": _wrapped_linear(sd, "mention_encoder.final_layer.linear")}
    if me:
        params["mention_encoder"] = me
    if cfg.entity_final_layer_name == "linear":
        params["entity_encoder"] = {"final_layer": _wrapped_linear(sd, "entity_encoder.final_layer")}
    return params


def melhi_params_from_torch(sd: Mapping) -> Dict:
    """Reference MELHI state_dict -> our MELHI flax params (melhi.py)."""

    def lstm(prefix: str) -> Dict:
        return {
            "w_ih": _t(sd[prefix + ".weight_ih_l0"]),
            "w_hh": _t(sd[prefix + ".weight_hh_l0"]),
            "b_ih": _a(sd[prefix + ".bias_ih_l0"]),
            "b_hh": _a(sd[prefix + ".bias_hh_l0"]),
        }

    return {
        "image_map_text": _wrapped_linear(sd, "image_map_text"),
        "entity_final_map": _wrapped_linear(sd, "entity_final_map"),
        "mention_encoder": {
            "mention_lstm": lstm("mention_encoder.mention_lstm"),
            "mention_final_map": _wrapped_linear(sd, "mention_encoder.mention_final_map"),
        },
    }
