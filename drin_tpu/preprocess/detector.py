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
    the full image with score 1 (emitted as the degenerate box [0,0,0,0],
    which the crop stage treats as "no crop" — the pipeline's boxes are in
    resized coordinates while crops apply to the original image, a
    reference quirk preserved for the real-detector path).  Padding slots
    follow the reference's convention (default_box / score 0,
    resnet.py:117-120), so downstream score-product weighting
    (drin/model.py:86-92) degrades gracefully.
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
        B = images.shape[0]
        boxes = np.tile(np.asarray(self.cfg.default_box, np.float32), (B, topk, 1))
        scores = np.zeros((B, topk), np.float32)
        # degenerate box = "whole ORIGINAL image, no crop" (the detector only
        # sees the resized array, so real coordinates can't be emitted here;
        # preprocess.images.ImageBatcher skips cropping for degenerate boxes)
        boxes[:, 0] = [0, 0, 0, 0]
        scores[:, 0] = 1.0
        return boxes, scores


def make_detector(cfg: Config, frcnn_cfg=None):
    """Build the detector the ``drin_object_detector`` knob names (reference
    resnet.py:134-141 selects fasterrcnn/maskrcnn there).

    With ``cfg.detector_checkpoint`` set, loads + converts the torch
    state_dict (mask_rcnn checkpoints share the box branch; their mask head
    is unused since the pipeline consumes boxes+scores only).  Without a
    checkpoint, falls back to :class:`WholeImageDetector` — LOUDLY: the
    reference always runs a real pretrained Faster R-CNN
    (resnet.py:134-141), so a store built with the stub has degraded
    object features and the miei edge degenerates to whole-image cosines."""
    if not cfg.detector_checkpoint:
        import sys
        import warnings

        msg = ("detector_checkpoint is unset: using WholeImageDetector — one "
               "degenerate whole-image 'object' per image instead of the "
               "reference's pretrained Faster R-CNN "
               f"({cfg.drin_object_detector}, resnet.py:134-141). Object "
               "features in the store will be whole-image features; set "
               "Config.detector_checkpoint to a converted torchvision "
               "state_dict for production preprocessing.")
        warnings.warn(msg)
        print(f"WARNING: {msg}", file=sys.stderr, flush=True)
        return WholeImageDetector(cfg)
    from drin_tpu.encoders.checkpoints import load_torch_state_dict
    from drin_tpu.encoders.frcnn import FRCNNConfig, detector_params_from_torch

    fc = frcnn_cfg or FRCNNConfig()
    sd, _ = load_torch_state_dict(cfg.detector_checkpoint)
    params = detector_params_from_torch(sd, fc, cfg.drin_object_detector)
    return FRCNNDetector(cfg, params, fc)


class FRCNNDetector:
    """TPU Faster R-CNN (``drin_tpu.encoders.frcnn``) behind the detector
    interface.  Input images are [B, H, W, 3] in [0, 1] (the reference's
    ObjectProcessor convention, resnet.py:79-84); they are resized to the
    model's ``min_size`` square internally and boxes are returned in input
    coordinates, top-k padded with default_box/0 like torchvision's consumer
    (resnet.py:117-120)."""

    def __init__(self, cfg: Config, params, frcnn_cfg=None):
        import jax
        import jax.numpy as jnp

        from drin_tpu.encoders.frcnn import FasterRCNN, FRCNNConfig

        self.cfg = cfg
        self.frcnn_cfg = frcnn_cfg or FRCNNConfig()
        model = FasterRCNN(self.frcnn_cfg)
        size = self.frcnn_cfg.min_size
        default_box = jnp.asarray(cfg.default_box, jnp.float32)

        def detect_one(image, topk):
            H, W = image.shape[:2]
            resized = jax.image.resize(image, (size, size, 3), "bilinear")
            boxes, scores, _ = model.apply({"params": params}, resized)
            k = min(topk, boxes.shape[0])
            top_s, top_i = jax.lax.top_k(scores, k)
            boxes = boxes[top_i] * jnp.asarray([W / size, H / size, W / size, H / size])
            valid = top_s > 0
            b = jnp.where(valid[:, None], boxes, default_box[None])
            s = jnp.where(valid, top_s, 0.0)
            if k < topk:
                b = jnp.concatenate([b, jnp.tile(default_box[None], (topk - k, 1))])
                s = jnp.concatenate([s, jnp.zeros((topk - k,))])
            return b, s

        self._fn = jax.jit(lambda imgs, topk: jax.vmap(lambda im: detect_one(im, topk))(imgs),
                           static_argnums=1)

    def __call__(self, images, topk: int):
        b, s = self._fn(images, topk)
        return np.asarray(b), np.asarray(s)


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
