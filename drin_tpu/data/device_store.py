# -*- coding: utf-8 -*-
"""Device-resident entity tables: HBM embedding store + in-step gather.

The reference gathers candidate rows from the 100GB-class host feature store
inside DataLoader workers and ships ~90MB of entity features to the device
per batch (drin/data.py:85-126, SURVEY §3.3 — its input bottleneck).  With
the pooled entity cache the global WikiMEL tables shrink to ~350MB (bf16),
which fits TPU HBM; this module uploads them once and rewrites the step's
feature tuple so batches carry only a [B, C] int32 row-index matrix — the
gather runs on-device as part of the jitted step.

On a mesh the tables are replicated (they are small post-pooling); XLA turns
the per-batch gathers into local lookups.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from drin_tpu.common.config import Config


class DrinRowsBatch(NamedTuple):
    """DRIN batch with the entity side replaced by table row indices."""

    mention_text_feature: np.ndarray
    mention_text_mask: np.ndarray
    mention_start_pos: np.ndarray
    mention_end_pos: np.ndarray
    mention_image_feature: np.ndarray
    mention_object_feature: np.ndarray
    mention_object_score: np.ndarray
    entity_rows: np.ndarray  # [B, C] int32
    miet_similarity: np.ndarray
    mtei_similarity: np.ndarray
    answer: np.ndarray


class BaselineRowsBatch(NamedTuple):
    mention_text_feature: np.ndarray
    mention_text_mask: np.ndarray
    mention_start_pos: np.ndarray
    mention_end_pos: np.ndarray
    mention_image_feature: np.ndarray
    entity_rows: np.ndarray  # [B, C] int32
    answer: np.ndarray


class DeviceEntityStore:
    """Upload the global (pooled) entity tables once; build a ``feats_fn``
    that reconstructs the model's full feature tuple inside jit."""

    def __init__(self, cfg: Config, tables: dict, dtype=None, sharding=None):
        assert cfg.entity_pooling_cached, "device tables require the pooled entity cache"
        dt = jnp.dtype(dtype or cfg.compute_dtype)
        put = lambda x: jax.device_put(
            jnp.asarray(x, dt if np.issubdtype(np.asarray(x).dtype, np.floating) else None),
            sharding,
        )
        self.text = put(tables["entity_text_feature"])  # [N, 2, D]
        self.image = put(tables["entity_image_feature"])  # [N, 1, Dr]
        self.obj = put(tables["entity_object_feature"])  # [N, Te, 1, Dr]
        self.obj_score = put(tables["entity_object_score"])  # [N, Te]
        self.nbytes = sum(int(np.prod(t.shape)) * t.dtype.itemsize
                          for t in (self.text, self.image, self.obj, self.obj_score))

    def drin_feats_fn(self):
        text, image, obj, obj_score = self.text, self.image, self.obj, self.obj_score

        def feats_fn(feats):
            (mtf, mtm, sp, ep, mif, mof, mos, rows, miet, mtei) = feats
            etm = jnp.zeros((rows.shape[0],), jnp.int32)  # mask consumed at pooling
            return (mtf, mtm, sp, ep, mif, mof, mos,
                    text[rows], etm, image[rows], obj[rows], obj_score[rows],
                    miet, mtei)

        return feats_fn

    def baseline_feats_fn(self):
        text, image = self.text, self.image

        def feats_fn(feats):
            (mtf, mtm, sp, ep, mif, rows) = feats
            etm = jnp.zeros((rows.shape[0],), jnp.int32)
            eif = image[rows]
            if eif.ndim == 4:  # [B, C, 1, Dr] pooler rows -> [B, C, Dr]
                eif = eif.reshape(eif.shape[0], eif.shape[1], -1)
            return (mtf, mtm, sp, ep, mif, text[rows], etm, eif)

        return feats_fn
