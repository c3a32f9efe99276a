# -*- coding: utf-8 -*-
"""BERT encoder in flax, numerics-compatible with HF ``BertModel``.

The reference runs a frozen HF ``bert-base-cased`` for offline text-feature
extraction (``preprocess/bert.py:66-83``) and optionally online inside GHMFC
(``baselines/ghmfc.py:13-18``).  This is the TPU-native equivalent: same
architecture, weights imported from any torch ``state_dict`` via
:func:`bert_params_from_torch`, jit/vmap-able, batched (the reference pins
preprocessing batches to 64 on one GPU; here the whole array pipeline is one
XLA program).

Numerics: LayerNorm eps 1e-12, exact-erf gelu, additive attention mask with
finfo-min fill — matching HF BertModel in eval mode (dropout off).
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import jax


class BertConfig:
    def __init__(
        self,
        vocab_size: int = 28996,  # bert-base-cased
        hidden_size: int = 768,
        num_hidden_layers: int = 12,
        num_attention_heads: int = 12,
        intermediate_size: int = 3072,
        max_position_embeddings: int = 512,
        type_vocab_size: int = 2,
        layer_norm_eps: float = 1e-12,
    ):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.max_position_embeddings = max_position_embeddings
        self.type_vocab_size = type_vocab_size
        self.layer_norm_eps = layer_norm_eps


class BertEmbeddings(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids):
        c = self.cfg
        B, L = input_ids.shape
        word = self.param("word_embeddings", nn.initializers.normal(0.02), (c.vocab_size, c.hidden_size))
        pos = self.param("position_embeddings", nn.initializers.normal(0.02), (c.max_position_embeddings, c.hidden_size))
        tok = self.param("token_type_embeddings", nn.initializers.normal(0.02), (c.type_vocab_size, c.hidden_size))
        x = word[input_ids] + pos[None, :L] + tok[token_type_ids]
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="LayerNorm")(x)


# below this sequence length the einsum attention wins (measured, BASELINE.md)
FUSED_ATTENTION_MIN_LEN = 256


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    fused: bool = False

    @nn.compact
    def __call__(self, x, additive_mask):
        c = self.cfg
        H = c.num_attention_heads
        D = c.hidden_size
        hd = D // H
        B, L, _ = x.shape
        q = nn.Dense(D, name="query")(x).reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        k = nn.Dense(D, name="key")(x).reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        v = nn.Dense(D, name="value")(x).reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        # short sequences: XLA wins (measured — direct-mode 64-token entity
        # towers ran 25% slower fused, BASELINE.md); the kernel pays off once
        # the [L, L] logits dominate
        if self.fused and L % 8 == 0 and L >= FUSED_ATTENTION_MIN_LEN:
            # flash-style Pallas kernel: the [L, L] logits never reach HBM
            # (ops/pallas/attention.py; same numerics as the einsum path)
            from drin_tpu.ops.pallas.attention import fused_attention

            flat = None if additive_mask is None else additive_mask[:, 0, 0, :]
            out = fused_attention(q, k, v, flat)
        else:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (hd**0.5)
            if additive_mask is not None:
                logits = logits + additive_mask
            attn = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return out.transpose(0, 2, 1, 3).reshape(B, L, D)


class BertLayer(nn.Module):
    cfg: BertConfig
    fused_attention: bool = False

    @nn.compact
    def __call__(self, x, additive_mask):
        c = self.cfg
        attn = BertSelfAttention(c, fused=self.fused_attention, name="self")(x, additive_mask)
        attn = nn.Dense(c.hidden_size, name="attention_output_dense")(attn)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attention_output_norm")(x + attn)
        h = nn.Dense(c.intermediate_size, name="intermediate_dense")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="output_dense")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_norm")(x + h)


def resolve_fused_attention(flag, finetune: bool = False) -> bool:
    """Config.bert_fused_attention tri-state: None = auto — fused on a
    single-device TPU backend (frozen AND fine-tuning: the Pallas flash
    backward kernel measured 839 vs 909 ms/step for zipped finetune+remat,
    BASELINE.md); einsum on CPU and on meshes (pallas_call partitioning
    isn't wired).  Short sequences are additionally gated per-call in
    BertSelfAttention."""
    del finetune  # the backward kernel wins there too (round 3)
    if flag is None:
        return jax.default_backend() == "tpu" and jax.device_count() == 1
    return bool(flag)


class BertModel(nn.Module):
    """Returns (last_hidden_state [B, L, D], pooler_output [B, D]).

    ``remat=True`` wraps each layer in ``jax.checkpoint`` (same numerics,
    same param tree) so a fine-tuning backward pass stores one layer's
    activations instead of all of them — see ``Config.bert_remat``.
    ``fused_attention=True`` routes self-attention through the flash-style
    Pallas kernel (ops/pallas/attention.py) — see
    ``Config.bert_fused_attention``."""

    cfg: BertConfig
    remat: bool = False
    fused_attention: bool = False

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        c = self.cfg
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = BertEmbeddings(c, name="embeddings")(input_ids, token_type_ids)
        additive = None
        if attention_mask is not None:
            neg = jnp.finfo(x.dtype).min
            additive = jnp.where(attention_mask[:, None, None, :] == 0, neg, 0.0).astype(x.dtype)
        layer_cls = nn.remat(BertLayer) if self.remat else BertLayer
        for i in range(c.num_hidden_layers):
            x = layer_cls(c, fused_attention=self.fused_attention,
                          name=f"layer_{i}")(x, additive)
        pooled = jnp.tanh(nn.Dense(c.hidden_size, name="pooler")(x[:, 0]))
        return x, pooled


# ---------------------------------------------------------------------------


def _t(w) -> np.ndarray:
    return np.asarray(w).T.copy()


def bert_params_from_torch(sd: Mapping, cfg: BertConfig, prefix: str = "") -> dict:
    """HF ``BertModel.state_dict()`` -> flax params for :class:`BertModel`.

    ``prefix`` handles nested state dicts (e.g. ``"bert."``)."""
    g = lambda k: np.asarray(sd[prefix + k])
    params = {
        "embeddings": {
            "word_embeddings": g("embeddings.word_embeddings.weight"),
            "position_embeddings": g("embeddings.position_embeddings.weight"),
            "token_type_embeddings": g("embeddings.token_type_embeddings.weight"),
            "LayerNorm": {"scale": g("embeddings.LayerNorm.weight"), "bias": g("embeddings.LayerNorm.bias")},
        },
        "pooler": {"kernel": _t(g("pooler.dense.weight")), "bias": g("pooler.dense.bias")},
    }
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "self": {
                "query": {"kernel": _t(g(p + "attention.self.query.weight")), "bias": g(p + "attention.self.query.bias")},
                "key": {"kernel": _t(g(p + "attention.self.key.weight")), "bias": g(p + "attention.self.key.bias")},
                "value": {"kernel": _t(g(p + "attention.self.value.weight")), "bias": g(p + "attention.self.value.bias")},
            },
            "attention_output_dense": {
                "kernel": _t(g(p + "attention.output.dense.weight")),
                "bias": g(p + "attention.output.dense.bias"),
            },
            "attention_output_norm": {
                "scale": g(p + "attention.output.LayerNorm.weight"),
                "bias": g(p + "attention.output.LayerNorm.bias"),
            },
            "intermediate_dense": {
                "kernel": _t(g(p + "intermediate.dense.weight")),
                "bias": g(p + "intermediate.dense.bias"),
            },
            "output_dense": {"kernel": _t(g(p + "output.dense.weight")), "bias": g(p + "output.dense.bias")},
            "output_norm": {"scale": g(p + "output.LayerNorm.weight"), "bias": g(p + "output.LayerNorm.bias")},
        }
    return params


def config_from_torch(torch_cfg) -> BertConfig:
    return BertConfig(
        vocab_size=torch_cfg.vocab_size,
        hidden_size=torch_cfg.hidden_size,
        num_hidden_layers=torch_cfg.num_hidden_layers,
        num_attention_heads=torch_cfg.num_attention_heads,
        intermediate_size=torch_cfg.intermediate_size,
        max_position_embeddings=torch_cfg.max_position_embeddings,
        type_vocab_size=torch_cfg.type_vocab_size,
        layer_norm_eps=torch_cfg.layer_norm_eps,
    )
