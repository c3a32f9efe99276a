# -*- coding: utf-8 -*-
"""GHMFC baseline, TPU-native.

Re-design of the reference re-implementation (``/root/reference/baselines/
ghmfc.py:280-298``): gated hierarchical multimodal fusion between the mention
sentence and its image regions, scored by cosine against pooled candidate
entity text.

The per-(sample x candidate) entity pooling loops (ghmfc.py:245-249) are one
masked einsum; the configuration space (intermediate layer x final
representation, ghmfc.py:163-175) is preserved.  The online-BERT path plugs
in a flax BERT through ``drin_tpu.encoders`` when ``cfg.online_bert`` is set.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from drin_tpu.common.config import Config
from drin_tpu.nn.layers import (
    Avg,
    AvgLinear,
    CrossAttention,
    Identity,
    Linear,
    MaxPool,
    MultilayerTransformer,
    MultimodalFusion,
)
from drin_tpu.ops.core import cosine_similarity, token_span_mean


class MentionEncoder(nn.Module):
    """Mention-side encoder (reference ghmfc.py:152-199).

    Offline path: takes precomputed BERT features.  The intermediate layer
    (identity / transformer / cross-attention / multimodal fusion) and the
    final representation (max-pool / span-avg(+linear)) are chosen by
    config exactly as the reference does at ghmfc.py:163-175, 192-199.
    """

    cfg: Config

    @nn.compact
    def __call__(self, sentence_feature, attention_mask, begin, end, image_feature,
                 deterministic: bool = True):
        cfg = self.cfg
        name = cfg.mention_final_layer_name

        if name == "linear":
            return AvgLinear(cfg.mention_final_output_dim, name="final_layer")(
                sentence_feature, begin, end
            )
        if name == "multimodal" and cfg.mention_multimodal_attention == "bi":
            return MultimodalFusion(
                cfg.bert_embed_dim,
                cfg.resnet_embed_dim,
                cfg.mention_final_output_dim,
                cfg.transformer_num_heads,
                cfg.transformer_dropout,
                cfg.multimodal_subspace_activation,
                name="intermediate_layer",
            )(sentence_feature, attention_mask, image_feature, deterministic=deterministic)

        if name == "multimodal":  # text-only cross attention
            feature = CrossAttention(
                cfg.bert_embed_dim, cfg.resnet_embed_dim, cfg.transformer_num_heads,
                cfg.transformer_dropout, name="intermediate_layer",
            )(sentence_feature, attention_mask, image_feature, None, deterministic)
        elif name == "transformer":
            feature = MultilayerTransformer(
                cfg.bert_embed_dim, cfg.transformer_num_layers, cfg.transformer_num_heads,
                cfg.transformer_ffn_hidden_size, cfg.transformer_dropout,
                cfg.transformer_ffn_activation, name="intermediate_layer",
            )(sentence_feature, attention_mask, deterministic=deterministic)
        else:  # "none"
            feature = sentence_feature

        if cfg.mention_final_representation == "max pool":
            return MaxPool(axis=1, name="final_repr")(feature)
        return Avg(name="final_repr")(feature, begin, end)


class EntityEncoder(nn.Module):
    """Entity-side encoder, offline path (reference ghmfc.py:202-251):
    wikidiverse features are already pooled; wikimel features are pooled over
    tokens ``1 : num_tokens - 1`` per candidate (avg/max), then projected."""

    cfg: Config

    @nn.compact
    def __call__(self, entity_feature, entity_mask, entity_image):
        cfg = self.cfg
        if entity_feature.ndim == 4:  # wikimel [B, C, Le, D]
            if cfg.entity_final_pooling == "bert default":
                encoded = entity_feature[:, :, 0, :]
            elif cfg.entity_final_pooling == "avg":
                num_tokens = jnp.sum(entity_mask, axis=-1)
                encoded = token_span_mean(entity_feature, num_tokens)
            else:  # max over valid tokens 1..n-1
                Le = entity_feature.shape[-2]
                pos = jnp.arange(Le).reshape(1, 1, Le)
                num_tokens = jnp.sum(entity_mask, axis=-1)[..., None]
                m = ((pos >= 1) & (pos < num_tokens - 1))[..., None]
                neg = jnp.finfo(entity_feature.dtype).min
                encoded = jnp.max(jnp.where(m, entity_feature, neg), axis=-2)
        else:  # wikidiverse [B, C, D] passes through (ghmfc.py:239-240)
            encoded = entity_feature
        if cfg.entity_final_layer_name == "linear":
            encoded = Linear(cfg.entity_final_output_dim, name="final_layer")(encoded)
        return encoded


class GHMFC(nn.Module):
    """Full GHMFC forward (reference Model, ghmfc.py:280-298).

    Offline batch (answer already stripped): mention fields [0:5], entity
    fields [5:8] (the reference's ``mention_entity_sep`` split at
    ghmfc.py:294-296).  Output: cosine scores [B, C]."""

    cfg: Config

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        cfg = self.cfg
        (sentence_feature, attention_mask, begin, end, mention_image,
         entity_feature, entity_mask, entity_image) = batch
        mention = MentionEncoder(cfg, name="mention_encoder")(
            sentence_feature, attention_mask, begin, end, mention_image, deterministic
        )
        entity = EntityEncoder(cfg, name="entity_encoder")(
            entity_feature, entity_mask, entity_image
        )
        mention = jnp.broadcast_to(mention[:, None, :], entity.shape)
        return cosine_similarity(mention, entity)
