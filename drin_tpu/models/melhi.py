# -*- coding: utf-8 -*-
"""MELHI baseline, TPU-native (WikiDiverse only, like the reference:
``/root/reference/baselines/melhi.py:12-15``).

Image-gating + LSTM model: maps images into text space, gates them by
text–image / image–image cosine thresholds, concatenates
[token features ‖ tiled mention-word avg ‖ tiled image feature], runs the
mention's left and right context through a shared LSTM, and scores by cosine
(melhi.py:52-84).

TPU re-design notes:
  * the reference builds packed sequences in a per-sample Python loop
    (melhi.py:34-39); here both context windows are static-shape tensors fed
    to one ``lax.scan`` LSTM with per-row valid lengths,
  * empty contexts reproduce the reference's convention of running the LSTM
    over a single all-zero step (melhi.py:34, :38),
  * the reference's ``lstm_extract_last`` (melhi.py:18-23) indexes the packed
    output by ``unsorted_indices[i] - 1``, which is NOT the last timestep of
    sequence i (it reads another sequence's first-step output).  We implement
    what the paper and the surrounding code intend — the hidden state at each
    row's last valid step — rather than emulating that indexing accident.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from drin_tpu.common.config import Config
from drin_tpu.nn.layers import LSTM, Linear
from drin_tpu.ops.core import cosine_similarity, span_mean


class MentionEncoder(nn.Module):
    """Left/right context LSTM encoder (reference melhi.py:26-41): one LSTM
    (weights shared between directions' calls) over tokens ``1:start`` and
    ``end:len``, final states concatenated then projected."""

    cfg: Config

    @nn.compact
    def __call__(self, mention_feature, mention_mask, start, end):
        D3 = mention_feature.shape[-1]  # bert_embed_dim * 3
        B, L = mention_feature.shape[:2]
        lstm = LSTM(D3, name="mention_lstm")

        # left context: tokens 1 .. start-1, left-aligned by construction
        left_len = start - 1
        left_empty = left_len <= 0
        left = mention_feature[:, 1:]
        left = jnp.where(left_empty[:, None, None], 0.0, left)
        left_feature = lstm(left, jnp.maximum(left_len, 1))

        # right context: tokens end .. mention_len-1, gathered left-aligned
        mention_len = jnp.sum(mention_mask, axis=-1)
        right_len = mention_len - end
        right_empty = right_len <= 0
        idx = jnp.clip(end[:, None] + jnp.arange(L)[None, :], 0, L - 1)
        right = jnp.take_along_axis(mention_feature, idx[..., None], axis=1)
        right = jnp.where(right_empty[:, None, None], 0.0, right)
        right_feature = lstm(right, jnp.maximum(right_len, 1))

        return Linear(self.cfg.bert_embed_dim, name="mention_final_map")(
            jnp.concatenate([left_feature, right_feature], axis=-1)
        )


class MELHI(nn.Module):
    """Full MELHI forward (reference Model, melhi.py:44-84).

    Offline baseline batch (answer stripped): 8 tensors, the same contract
    as GHMFC.  Output: cosine scores [B, C]."""

    cfg: Config

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        cfg = self.cfg
        C = cfg.num_candidates_model
        (mention_feature, mention_mask, start, end, mention_image,
         entity_feature, _, entity_image) = batch

        image_map_text = Linear(cfg.bert_embed_dim, name="image_map_text")
        mention_image = jnp.mean(mention_image, axis=-2)  # [B, Dr]
        mention_image_mapped = image_map_text(mention_image)  # [B, D]
        entity_image_mapped = image_map_text(entity_image)  # [B, C, D]

        # gates (melhi.py:66-68): text-vs-mention-image and
        # mention-image-vs-entity-image cosine thresholds
        sim_tmim = cosine_similarity(mention_feature[:, 0], mention_image_mapped)  # [B]
        sim_imie = cosine_similarity(
            jnp.broadcast_to(mention_image[:, None, :], entity_image.shape), entity_image
        )  # [B, C]
        # candidate padding (mesh.pad_candidates_to): fake candidates' zero
        # image vectors give cosine 0, below any positive threshold, so the
        # any-candidate gate reduction is unaffected; mask anyway so
        # non-positive thresholds stay correct too
        Cp = entity_feature.shape[1]
        if Cp > cfg.num_candidates_model:
            cmask = jnp.arange(Cp) < cfg.num_candidates_model
            sim_imie = jnp.where(cmask[None, :], sim_imie, -jnp.inf)
        gate = (sim_tmim > cfg.thres_tmim) & (jnp.sum(sim_imie > cfg.thres_imie, axis=-1) > 0)
        gate = gate.astype(mention_feature.dtype)
        mention_image_mapped = mention_image_mapped * gate[:, None]
        entity_image_mapped = entity_image_mapped * gate[:, None, None]

        # [token features ‖ tiled mention-word avg ‖ tiled image] (melhi.py:73-80)
        L = mention_feature.shape[1]
        mention_word = span_mean(mention_feature, start, end)  # [B, D]
        mention_cat = jnp.concatenate(
            [
                mention_feature,
                jnp.broadcast_to(mention_word[:, None, :], mention_feature.shape),
                jnp.broadcast_to(mention_image_mapped[:, None, :], mention_feature.shape),
            ],
            axis=-1,
        )  # [B, L, 3D]
        entity_cat = jnp.concatenate([entity_feature, entity_image_mapped], axis=-1)

        mention = MentionEncoder(cfg, name="mention_encoder")(mention_cat, mention_mask, start, end)
        entity = Linear(cfg.bert_embed_dim, name="entity_final_map")(entity_cat)
        mention = jnp.broadcast_to(mention[:, None, :], entity.shape)
        # slice away padded fake candidates (parallel/mesh.pad_candidates_to)
        return cosine_similarity(mention, entity)[:, : cfg.num_candidates_model]
