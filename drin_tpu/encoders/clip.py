# -*- coding: utf-8 -*-
"""CLIP dual encoder in flax, numerics-compatible with HF ``CLIPModel``
(``openai/clip-vit-base-patch32``).

The reference uses frozen CLIP to precompute the two cross-modal edge
matrices (``preprocess/clip.py:158-172``: logits_per_image for mention-image
x entity-texts, logits_per_text for entity-images x mention-text) with batch
size pinned to 1 (``clip.py:18``).  This version is one jitted program over
real batches.

Numerics: pre-LN ViT with quick_gelu, LayerNorm eps from config (1e-5),
causal text attention, eot pooling by argmax(input_ids) (the reference's
pinned transformers 4.25.1 behavior; the installed HF keeps it for
eos_token_id == 2), L2-normalized projections, exp(logit_scale) scaling.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPTextConfig:
    def __init__(self, vocab_size=49408, hidden_size=512, num_layers=12, num_heads=8,
                 intermediate_size=2048, max_position_embeddings=77, layer_norm_eps=1e-5):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.intermediate_size = intermediate_size
        self.max_position_embeddings = max_position_embeddings
        self.layer_norm_eps = layer_norm_eps


class CLIPVisionConfig:
    def __init__(self, hidden_size=768, num_layers=12, num_heads=12, intermediate_size=3072,
                 image_size=224, patch_size=32, layer_norm_eps=1e-5):
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.intermediate_size = intermediate_size
        self.image_size = image_size
        self.patch_size = patch_size
        self.layer_norm_eps = layer_norm_eps


class CLIPConfig:
    def __init__(self, text=None, vision=None, projection_dim=512):
        self.text = text or CLIPTextConfig()
        self.vision = vision or CLIPVisionConfig()
        self.projection_dim = projection_dim


class CLIPAttention(nn.Module):
    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, causal_mask=None):
        E, H = self.embed_dim, self.num_heads
        hd = E // H
        B, L, _ = x.shape
        q = nn.Dense(E, name="q_proj")(x) * (hd**-0.5)
        k = nn.Dense(E, name="k_proj")(x)
        v = nn.Dense(E, name="v_proj")(x)
        q = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        if causal_mask is not None:
            logits = logits + causal_mask
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(B, L, E)
        return nn.Dense(E, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int
    intermediate_size: int
    eps: float

    @nn.compact
    def __call__(self, x, causal_mask=None):
        h = nn.LayerNorm(epsilon=self.eps, name="layer_norm1")(x)
        x = x + CLIPAttention(self.embed_dim, self.num_heads, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=self.eps, name="layer_norm2")(x)
        h = nn.Dense(self.intermediate_size, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.embed_dim, name="fc2")(h)
        return x + h


class CLIPTextTransformer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids):
        c = self.cfg
        B, L = input_ids.shape
        tok = self.param("token_embedding", nn.initializers.normal(0.02), (c.vocab_size, c.hidden_size))
        pos = self.param("position_embedding", nn.initializers.normal(0.02), (c.max_position_embeddings, c.hidden_size))
        x = tok[input_ids] + pos[None, :L]
        causal = jnp.triu(jnp.full((L, L), jnp.finfo(x.dtype).min), k=1)[None, None]
        for i in range(c.num_layers):
            x = CLIPEncoderLayer(c.hidden_size, c.num_heads, c.intermediate_size, c.layer_norm_eps,
                                 name=f"layer_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)
        # eot pooling: argmax(input_ids) (HF pre-#24773 behavior, kept for
        # eos_token_id == 2 which openai/clip-vit-base-patch32 uses)
        eot = jnp.argmax(input_ids, axis=-1)
        return x[jnp.arange(B), eot]


class CLIPVisionTransformer(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: [B, H, W, 3] NHWC, CLIP-normalized."""
        c = self.cfg
        B = pixel_values.shape[0]
        p = c.patch_size
        x = nn.Conv(c.hidden_size, (p, p), strides=(p, p), use_bias=False, padding="VALID",
                    name="patch_embedding")(pixel_values)
        x = x.reshape(B, -1, c.hidden_size)  # [B, (H/p)*(W/p), D]
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (c.hidden_size,))
        x = jnp.concatenate([jnp.broadcast_to(cls[None, None], (B, 1, c.hidden_size)), x], axis=1)
        n_pos = (c.image_size // p) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02), (n_pos, c.hidden_size))
        x = x + pos[None, : x.shape[1]]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="pre_layrnorm")(x)
        for i in range(c.num_layers):
            x = CLIPEncoderLayer(c.hidden_size, c.num_heads, c.intermediate_size, c.layer_norm_eps,
                                 name=f"layer_{i}")(x)
        pooled = x[:, 0]
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="post_layernorm")(pooled)


class CLIPModel(nn.Module):
    cfg: CLIPConfig

    def setup(self):
        self.text_model = CLIPTextTransformer(self.cfg.text)
        self.vision_model = CLIPVisionTransformer(self.cfg.vision)
        self.visual_projection = nn.Dense(self.cfg.projection_dim, use_bias=False)
        self.text_projection = nn.Dense(self.cfg.projection_dim, use_bias=False)
        self.logit_scale = self.param("logit_scale", nn.initializers.constant(np.log(1 / 0.07)), ())

    def get_text_features(self, input_ids):
        return self.text_projection(self.text_model(input_ids))

    def get_image_features(self, pixel_values):
        return self.visual_projection(self.vision_model(pixel_values))

    def __call__(self, input_ids, pixel_values):
        """Returns (logits_per_image [B_img, B_txt], logits_per_text)."""
        t = self.get_text_features(input_ids)
        v = self.get_image_features(pixel_values)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_text = scale * (t @ v.T)
        return logits_per_text.T, logits_per_text


# ---------------------------------------------------------------------------


def _t(w) -> np.ndarray:
    return np.asarray(w).T.copy()


def _lin(sd, p) -> dict:
    return {"kernel": _t(sd[p + ".weight"]), "bias": np.asarray(sd[p + ".bias"])}


def _ln(sd, p) -> dict:
    return {"scale": np.asarray(sd[p + ".weight"]), "bias": np.asarray(sd[p + ".bias"])}


def _encoder_layers(sd, prefix: str, n: int) -> dict:
    out = {}
    for i in range(n):
        p = f"{prefix}.layers.{i}"
        out[f"layer_{i}"] = {
            "self_attn": {k: _lin(sd, f"{p}.self_attn.{k}") for k in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "layer_norm1": _ln(sd, p + ".layer_norm1"),
            "layer_norm2": _ln(sd, p + ".layer_norm2"),
            "fc1": _lin(sd, p + ".mlp.fc1"),
            "fc2": _lin(sd, p + ".mlp.fc2"),
        }
    return out


def clip_params_from_torch(sd: Mapping, cfg: CLIPConfig) -> dict:
    """HF ``CLIPModel.state_dict()`` -> flax params."""
    text = {
        "token_embedding": np.asarray(sd["text_model.embeddings.token_embedding.weight"]),
        "position_embedding": np.asarray(sd["text_model.embeddings.position_embedding.weight"]),
        "final_layer_norm": _ln(sd, "text_model.final_layer_norm"),
        **_encoder_layers(sd, "text_model.encoder", cfg.text.num_layers),
    }
    vision = {
        "class_embedding": np.asarray(sd["vision_model.embeddings.class_embedding"]),
        "position_embedding": np.asarray(sd["vision_model.embeddings.position_embedding.weight"]),
        "patch_embedding": {
            "kernel": np.asarray(sd["vision_model.embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0).copy()
        },
        "pre_layrnorm": _ln(sd, "vision_model.pre_layrnorm"),
        "post_layernorm": _ln(sd, "vision_model.post_layernorm"),
        **_encoder_layers(sd, "vision_model.encoder", cfg.vision.num_layers),
    }
    return {
        "text_model": text,
        "vision_model": vision,
        "visual_projection": {"kernel": _t(sd["visual_projection.weight"])},
        "text_projection": {"kernel": _t(sd["text_projection.weight"])},
        "logit_scale": np.asarray(sd["logit_scale"]),
    }


def config_from_torch(torch_cfg) -> CLIPConfig:
    t, v = torch_cfg.text_config, torch_cfg.vision_config
    return CLIPConfig(
        text=CLIPTextConfig(t.vocab_size, t.hidden_size, t.num_hidden_layers, t.num_attention_heads,
                            t.intermediate_size, t.max_position_embeddings, t.layer_norm_eps),
        vision=CLIPVisionConfig(v.hidden_size, v.num_hidden_layers, v.num_attention_heads,
                                v.intermediate_size, v.image_size, v.patch_size, v.layer_norm_eps),
        projection_dim=torch_cfg.projection_dim,
    )
