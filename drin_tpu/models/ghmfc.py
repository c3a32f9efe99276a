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

import jax
import jax.numpy as jnp
from flax import linen as nn

from drin_tpu.common.config import Config
from drin_tpu.nn.layers import (
    Avg,
    AvgLinear,
    CrossAttention,
    Linear,
    MaxPool,
    MultilayerTransformer,
    MultimodalFusion,
)
from drin_tpu.ops.core import (cosine_similarity, token_span_max,
                               token_span_mean, unzip_entities)


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
        if cfg.entity_projected and entity_feature.ndim == 4:
            # slot 0 already went through pooling AND the final linear
            # (project_drin_tables); nothing left to do here
            return entity_feature[:, :, 0]
        if cfg.entity_pooling_cached and entity_feature.ndim == 4:
            # precomputed (pooled, CLS) cache — [B, C, 2, D]
            encoded = entity_feature[:, :, 1 if cfg.entity_final_pooling == "bert default" else 0]
        elif entity_feature.ndim == 4:  # wikimel [B, C, Le, D]
            if cfg.entity_final_pooling == "bert default":
                encoded = entity_feature[:, :, 0, :]
            elif cfg.entity_final_pooling == "avg":
                num_tokens = jnp.sum(entity_mask, axis=-1)
                encoded = token_span_mean(entity_feature, num_tokens)
            else:  # max over valid tokens 1..n-1; empty spans (zero-padded
                # fake candidates from mesh.pad_candidates_to) pool to 0
                # instead of finfo.min, which would NaN-poison the real
                # candidates' scores through the GCN's cross-candidate means
                num_tokens = jnp.sum(entity_mask, axis=-1)
                encoded = token_span_max(entity_feature, num_tokens)
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
        # slice away padded fake candidates (parallel/mesh.pad_candidates_to)
        return cosine_similarity(mention, entity)[:, : cfg.num_candidates_model]


class GHMFCOnline(nn.Module):
    """GHMFC with BERT inside the forward pass (reference online path,
    ghmfc.py:177-190, :216-236) — the only configuration that trains through
    an encoder.

    Batch (answer stripped), zipped mode (``cfg.num_entity_sentence > 0``):
      (mention_ids [B, Lm], mention_mask, begin, end, mention_image,
       entity_ids [B, S, Le], entity_mask [B, S, Le], sep_idx [B, S, E],
       entity_image)
    direct mode (num_entity_sentence == 0): entity_ids/mask are [B, C, Le]
    and sep_idx is an (ignored) placeholder.

    Differences from the reference (documented TPU re-design):
      * ONE shared BERT serves mention and entity towers (the reference
        instantiates two copies of the same pretrained weights,
        ghmfc.py:159, :209 — identical numerics while frozen);
      * the 12-sequential-BERT-calls loop (ghmfc.py:221-224) is one batched
        [B*S, L] BERT call; ``unzip_entities``'s triple loop is one einsum;
      * ``finetune_bert=False`` freezes BERT via stop_gradient (the
        reference sets requires_grad=False, ghmfc.py:16-17).
    """

    cfg: Config
    bert_cfg: object = None

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        from drin_tpu.encoders.bert import (BertConfig, BertModel,
                                            resolve_fused_attention)

        cfg = self.cfg
        (mention_ids, mention_mask, begin, end, mention_image,
         entity_ids, entity_mask, sep_idx, entity_image) = batch
        bert = BertModel(self.bert_cfg or BertConfig(), remat=cfg.bert_remat,
                         fused_attention=resolve_fused_attention(
                             cfg.bert_fused_attention, cfg.finetune_bert),
                         name="bert")

        def encode(ids, mask):
            h, pooled = bert(ids, mask)
            if not cfg.finetune_bert:
                h, pooled = jax.lax.stop_gradient(h), jax.lax.stop_gradient(pooled)
            return h, pooled

        # mention tower: BERT, clip to max_mention_sentence_len
        # (ghmfc.py:181-185)
        h, _ = encode(mention_ids, mention_mask)
        Lm = cfg.max_mention_sentence_len
        sent = h[:, :Lm]
        sent_mask = mention_mask[:, :Lm]
        mention = MentionEncoder(cfg, name="mention_encoder")(
            sent, sent_mask, begin, end, mention_image, deterministic
        )

        # entity tower
        B = entity_ids.shape[0]
        C = cfg.num_candidates_model
        flat_ids = entity_ids.reshape((-1,) + entity_ids.shape[2:])
        flat_mask = entity_mask.reshape(flat_ids.shape)
        eh, epooled = encode(flat_ids, flat_mask)
        if cfg.num_entity_sentence:  # zipped (ghmfc.py:220-225)
            if cfg.entity_final_pooling == "bert default":
                raise ValueError(
                    "entity_final_pooling='bert default' has no per-candidate "
                    "pooler output in zipped mode (the reference's pooling "
                    "factory rejects it too, ghmfc.py:254-261); use 'avg' or "
                    "'max', or set num_entity_sentence=0")
            zipped = eh.reshape(B, cfg.num_entity_sentence, *eh.shape[1:])
            encoded = unzip_entities(zipped, sep_idx, C, cfg.entity_final_pooling)
        else:  # per-candidate (ghmfc.py:227-236); Ci may exceed C under
            # candidate padding (mesh.pad_candidates_to) — per-candidate math,
            # fake rows sliced away below
            Ci = entity_ids.shape[1]
            if cfg.entity_final_pooling == "bert default":
                encoded = epooled.reshape(B, Ci, -1)
            else:
                num_tokens = jnp.sum(flat_mask, axis=-1)
                pool = (token_span_max if cfg.entity_final_pooling == "max"
                        else token_span_mean)  # span 1..n-2 (ghmfc.py:230-235)
                encoded = pool(eh, num_tokens).reshape(B, Ci, -1)
        if cfg.entity_final_layer_name == "linear":
            encoded = Linear(cfg.entity_final_output_dim, name="entity_final_layer")(encoded)
        mention = jnp.broadcast_to(mention[:, None, :], encoded.shape)
        return cosine_similarity(mention, encoded)[:, :C]
