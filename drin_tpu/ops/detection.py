# -*- coding: utf-8 -*-
"""Detection primitives on TPU: IoU, NMS and RoIAlign as XLA-friendly ops.

The reference gets these from torchvision's C++/CUDA kernels inside
``fasterrcnn_resnet50_fpn`` (``preprocess/resnet.py:134-141``).  On TPU the
native substrate is XLA: NMS is an iterative suppression loop over a
precomputed IoU matrix (static box count, ``lax.fori_loop``), RoIAlign is
gather + bilinear interpolation (vmapped over boxes).  Both are jit/grad-safe
with static shapes."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU matrix [N, M] for boxes (x1, y1, x2, y2)."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms(boxes: jax.Array, scores: jax.Array, iou_threshold: float, top_k: int) -> jax.Array:
    """Greedy NMS returning the indices of up to ``top_k`` kept boxes
    (padded with -1), matching torchvision.ops.nms ordering semantics.

    boxes [N, 4], scores [N].  O(N^2) IoU + top_k sequential picks — N is the
    static proposal count (a few hundred post-filter), all VPU-friendly."""
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)

    def body(i, carry):
        alive, out = carry
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        valid = masked[best] > -jnp.inf
        out = out.at[i].set(jnp.where(valid, best, -1))
        # suppress the pick and everything overlapping it
        suppress = (iou[best] > iou_threshold) | (jnp.arange(n) == best)
        alive = alive & jnp.where(valid, ~suppress, alive)
        return alive, out

    alive0 = jnp.ones((n,), bool)
    out0 = jnp.full((top_k,), -1, jnp.int32)
    _, out = jax.lax.fori_loop(0, top_k, body, (alive0, out0))
    return out


def generate_anchors(feature_size: tuple, stride: int, sizes=(32, 64, 128),
                     aspect_ratios=(0.5, 1.0, 2.0)) -> jax.Array:
    """Anchor grid for one feature level, torchvision AnchorGenerator
    semantics: centered zero-area-preserving (x1, y1, x2, y2) boxes at every
    feature cell.  Returns [H*W*A, 4] with A = len(sizes)*len(aspect_ratios).
    """
    H, W = feature_size
    sizes = jnp.asarray(sizes, jnp.float32)
    ratios = jnp.asarray(aspect_ratios, jnp.float32)
    h_r = jnp.sqrt(ratios)
    w_r = 1.0 / h_r
    ws = (w_r[:, None] * sizes[None, :]).reshape(-1)  # [A]
    hs = (h_r[:, None] * sizes[None, :]).reshape(-1)
    base = jnp.stack([-ws, -hs, ws, hs], axis=1) / 2.0  # [A, 4]
    base = jnp.round(base)  # torchvision rounds base anchors
    shift_x = jnp.arange(W, dtype=jnp.float32) * stride
    shift_y = jnp.arange(H, dtype=jnp.float32) * stride
    sx, sy = jnp.meshgrid(shift_x, shift_y, indexing="xy")
    shifts = jnp.stack([sx.reshape(-1), sy.reshape(-1)] * 2, axis=1)  # [H*W, 4]
    return (shifts[:, None, :] + base[None, :, :]).reshape(-1, 4)


def decode_boxes(deltas: jax.Array, anchors: jax.Array,
                 weights=(1.0, 1.0, 1.0, 1.0), clip: float = 4.135) -> jax.Array:
    """Apply (dx, dy, dw, dh) regression deltas to anchors — torchvision
    BoxCoder.decode semantics (clip = log(1000/16) bounds the exp)."""
    wx, wy, ww, wh = weights
    widths = anchors[:, 2] - anchors[:, 0]
    heights = anchors[:, 3] - anchors[:, 1]
    cx = anchors[:, 0] + 0.5 * widths
    cy = anchors[:, 1] + 0.5 * heights
    dx, dy, dw, dh = (deltas[:, 0] / wx, deltas[:, 1] / wy,
                      jnp.minimum(deltas[:, 2] / ww, clip),
                      jnp.minimum(deltas[:, 3] / wh, clip))
    pcx = dx * widths + cx
    pcy = dy * heights + cy
    pw = jnp.exp(dw) * widths
    ph = jnp.exp(dh) * heights
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=1)


def encode_boxes(boxes: jax.Array, anchors: jax.Array,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jax.Array:
    """Inverse of :func:`decode_boxes` (BoxCoder.encode)."""
    wx, wy, ww, wh = weights
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah
    bw = boxes[:, 2] - boxes[:, 0]
    bh = boxes[:, 3] - boxes[:, 1]
    bcx = boxes[:, 0] + 0.5 * bw
    bcy = boxes[:, 1] + 0.5 * bh
    return jnp.stack([
        wx * (bcx - acx) / aw,
        wy * (bcy - acy) / ah,
        ww * jnp.log(bw / aw),
        wh * jnp.log(bh / ah),
    ], axis=1)


def clip_boxes(boxes: jax.Array, height: float, width: float) -> jax.Array:
    return jnp.stack([
        jnp.clip(boxes[:, 0], 0, width),
        jnp.clip(boxes[:, 1], 0, height),
        jnp.clip(boxes[:, 2], 0, width),
        jnp.clip(boxes[:, 3], 0, height),
    ], axis=1)


def roi_align(features: jax.Array, boxes: jax.Array, output_size: tuple,
              spatial_scale: float = 1.0, sampling_ratio: int = 2,
              aligned: bool = True) -> jax.Array:
    """RoIAlign: features [H, W, C] (NHWC single image), boxes [K, 4]
    (x1, y1, x2, y2 in image coords) -> [K, out_h, out_w, C].

    Bilinear sampling on a regular grid per output bin, averaged over
    ``sampling_ratio``^2 samples — torchvision.ops.roi_align semantics
    (``aligned=True`` applies the half-pixel offset)."""
    features = jnp.asarray(features)
    boxes = jnp.asarray(boxes)
    H, W, C = features.shape
    out_h, out_w = output_size
    offset = 0.5 if aligned else 0.0

    def one_box(box):
        x1, y1, x2, y2 = box * spatial_scale
        x1, y1 = x1 - offset, y1 - offset
        x2, y2 = x2 - offset, y2 - offset
        roi_w = jnp.maximum(x2 - x1, 1.0 if not aligned else 0.0)
        roi_h = jnp.maximum(y2 - y1, 1.0 if not aligned else 0.0)
        bin_w = roi_w / out_w
        bin_h = roi_h / out_h
        s = sampling_ratio
        # sample grid: [out, s] positions per axis
        iy = jnp.arange(out_h)[:, None] * bin_h + (jnp.arange(s)[None, :] + 0.5) * bin_h / s + y1
        ix = jnp.arange(out_w)[:, None] * bin_w + (jnp.arange(s)[None, :] + 0.5) * bin_w / s + x1
        iy = iy.reshape(-1)  # [out_h * s]
        ix = ix.reshape(-1)  # [out_w * s]

        def bilinear(y, x):
            # torchvision zero-pads samples outside [-1, H] / [-1, W]
            # (bilinear_interpolate's early-out) instead of clamping to the
            # border pixel; boxes extending past the feature map must not
            # replicate edge features
            in_bounds = (y >= -1.0) & (y <= H) & (x >= -1.0) & (x <= W)
            y = jnp.clip(y, 0.0, H - 1.0)
            x = jnp.clip(x, 0.0, W - 1.0)
            y0 = jnp.floor(y).astype(jnp.int32)
            x0 = jnp.floor(x).astype(jnp.int32)
            y1_ = jnp.minimum(y0 + 1, H - 1)
            x1_ = jnp.minimum(x0 + 1, W - 1)
            wy = y - y0
            wx = x - x0
            v00 = features[y0, x0]
            v01 = features[y0, x1_]
            v10 = features[y1_, x0]
            v11 = features[y1_, x1_]
            val = (
                v00 * (1 - wy)[..., None] * (1 - wx)[..., None]
                + v01 * (1 - wy)[..., None] * wx[..., None]
                + v10 * wy[..., None] * (1 - wx)[..., None]
                + v11 * wy[..., None] * wx[..., None]
            )
            return jnp.where(in_bounds[..., None], val, 0.0)

        grid = jax.vmap(lambda y: jax.vmap(lambda x: bilinear(y, x))(ix))(iy)
        # [out_h*s, out_w*s, C] -> average each s x s sample block
        grid = grid.reshape(out_h, s, out_w, s, C)
        return jnp.mean(grid, axis=(1, 3))

    return jax.vmap(one_box)(boxes)
