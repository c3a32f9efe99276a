# -*- coding: utf-8 -*-
"""Object detectors for the ResNet stage.

The reference uses torchvision's pretrained ``fasterrcnn_resnet50_fpn``
(``preprocess/resnet.py:134-141``) downloaded from the hub.  In this
zero-download framework the detector is a pluggable callable
``(images [B, H, W, 3] normalized, topk) -> (boxes [B, topk, 4],
scores [B, topk])`` with the reference's padding convention
(default_box / score 0 beyond the found objects, resnet.py:117-120).

Two implementations:

  * :class:`WholeImageDetector` — the working default: one "object" covering
    the full image with score 1.  Object features then equal whole-image crop
    features; downstream weighting (score products, drin/model.py:86-92)
    degrades gracefully.  This is also exactly what the reference produces
    for images where the RCNN finds nothing.
  * :class:`JaxDetector` — wraps any jittable proposal-scoring function with
    the TPU-native NMS/top-k postprocessing from ``drin_tpu.ops.detection``;
    use it to serve a converted detection checkpoint.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

from drin_tpu.common.config import Config


class WholeImageDetector:
    def __init__(self, cfg: Config):
        self.cfg = cfg

    def __call__(self, images: np.ndarray, topk: int) -> Tuple[np.ndarray, np.ndarray]:
        B, H, W = images.shape[0], images.shape[1], images.shape[2]
        boxes = np.tile(np.asarray(self.cfg.default_box, np.float32), (B, topk, 1))
        scores = np.zeros((B, topk), np.float32)
        boxes[:, 0] = [0, 0, W, H]
        scores[:, 0] = 1.0
        return boxes, scores


class JaxDetector:
    """Proposal-based detector head on TPU.

    ``propose_fn(images) -> (boxes [B, N, 4], scores [B, N])`` supplies raw
    proposals (e.g. a converted RPN+head); this class runs per-image NMS and
    pads to the reference's top-k contract."""

    def __init__(self, cfg: Config, propose_fn: Callable, iou_threshold: float = 0.5,
                 score_threshold: float = 0.05):
        import jax
        import jax.numpy as jnp

        from drin_tpu.ops.detection import nms

        self.cfg = cfg
        default_box = jnp.asarray(cfg.default_box, jnp.float32)

        def post(boxes, scores, topk):
            keep = nms(boxes, jnp.where(scores >= score_threshold, scores, -jnp.inf),
                       iou_threshold, topk)  # [topk], -1 padded
            valid = keep >= 0
            safe = jnp.maximum(keep, 0)
            b = jnp.where(valid[:, None], boxes[safe], default_box[None])
            s = jnp.where(valid, scores[safe], 0.0)
            return b, s

        self._fn = jax.jit(
            lambda imgs, topk: jax.vmap(lambda b, s: post(b, s, topk))(*propose_fn(imgs)),
            static_argnums=1,
        )

    def __call__(self, images, topk: int):
        b, s = self._fn(images, topk)
        return np.asarray(b), np.asarray(s)
