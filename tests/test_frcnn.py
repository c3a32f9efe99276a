# -*- coding: utf-8 -*-
"""Faster R-CNN on TPU: component oracles + randomly initialized smoke
forward + torchvision state_dict conversion (fabricated key layout; real
torchvision is unavailable offline, so end-to-end output parity is out of
scope — documented in encoders/frcnn.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drin_tpu.encoders.frcnn import (
    FRCNNConfig,
    FasterRCNN,
    assign_levels,
    frcnn_params_from_torch,
)

TINY = FRCNNConfig(
    depths=(1, 1, 1, 1), stem_width=8, fpn_channels=16,
    anchor_sizes=((16,), (32,), (64,), (128,), (256,)),
    pre_nms_topk=50, post_nms_topk=20, detections_per_img=5,
    num_classes=7, representation_size=32, min_size=64,
)


def test_assign_levels_formula():
    # canonical FPN paper mapping: 224^2 box -> level 4 (P4 == index 2)
    boxes = np.array([
        [0, 0, 224, 224],   # k = 4
        [0, 0, 112, 112],   # k = 3
        [0, 0, 448, 448],   # k = 5
        [0, 0, 900, 900],   # clipped to 5
        [0, 0, 10, 10],     # clipped to 2
    ], np.float32)
    lv = np.asarray(assign_levels(boxes))
    np.testing.assert_array_equal(lv, [2, 1, 3, 3, 0])


def test_fpn_shapes_and_topdown():
    """Output levels halve spatially; the top-down sum actually mixes levels."""
    from drin_tpu.encoders.frcnn import FPN, ResNet50Body

    cfg = TINY
    model = ResNet50Body(cfg)
    x = np.zeros((1, 64, 64, 3), np.float32)
    params = model.init(jax.random.key(0), x)["params"]
    feats = model.apply({"params": params}, x)
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]  # strides 4..32

    fpn = FPN(cfg.fpn_channels)
    fparams = fpn.init(jax.random.key(1), feats)["params"]
    outs = fpn.apply({"params": fparams}, feats)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]
    assert all(o.shape[-1] == cfg.fpn_channels for o in outs)


def test_frcnn_smoke_forward():
    """Random-weight end-to-end detection on a static image: valid,
    clipped, finite boxes; padded slots zeroed; jit-compatible."""
    model = FasterRCNN(TINY)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), img)["params"]
    boxes, scores, labels = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, img)
    boxes, scores, labels = np.asarray(boxes), np.asarray(scores), np.asarray(labels)
    assert boxes.shape == (TINY.detections_per_img, 4)
    assert np.all(np.isfinite(boxes)) and np.all(boxes >= 0) and np.all(boxes[:, [0, 2]] <= 64)
    found = scores > 0
    # found boxes have positive extent; padding is zeroed
    if found.any():
        f = boxes[found]
        assert np.all(f[:, 2] >= f[:, 0]) and np.all(f[:, 3] >= f[:, 1])
    assert np.all(boxes[~found] == 0) and np.all(labels[~found] == 0)


def _fabricate_torchvision_sd(cfg: FRCNNConfig, new_style: bool, mask_rcnn: bool = False):
    """torchvision fasterrcnn_resnet50_fpn state_dict key layout with random
    values at TINY dims (both pre/post-0.13 FPN/RPN spellings); mask_rcnn
    adds the maskrcnn_resnet50_fpn mask-branch keys."""
    rng = np.random.default_rng(3)
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.uniform(0.5, 2.0, c).astype(np.float32)

    def dense(name, o, i):
        sd[name + ".weight"] = rng.standard_normal((o, i)).astype(np.float32) * 0.05
        sd[name + ".bias"] = np.zeros(o, np.float32)

    w = cfg.stem_width
    conv("backbone.body.conv1", w, 3, 7)
    bn("backbone.body.bn1", w)
    in_ch = w
    for li, depth in enumerate(cfg.depths):
        width = w * (2**li)
        out = w * 4 * (2**li)
        for bi in range(depth):
            p = f"backbone.body.layer{li + 1}.{bi}"
            conv(p + ".conv1", width, in_ch if bi == 0 else out, 1)
            bn(p + ".bn1", width)
            conv(p + ".conv2", width, width, 3)
            bn(p + ".bn2", width)
            conv(p + ".conv3", out, width, 1)
            bn(p + ".bn3", out)
            if bi == 0:
                conv(p + ".downsample.0", out, in_ch, 1)
                bn(p + ".downsample.1", out)
        in_ch = out
    F = cfg.fpn_channels
    for i, c_in in enumerate([w * 4, w * 8, w * 16, w * 32]):
        suffix = ".0" if new_style else ""
        conv(f"backbone.fpn.inner_blocks.{i}{suffix}", F, c_in, 1)
        sd[f"backbone.fpn.inner_blocks.{i}{suffix}.bias"] = np.zeros(F, np.float32)
        conv(f"backbone.fpn.layer_blocks.{i}{suffix}", F, F, 3)
        sd[f"backbone.fpn.layer_blocks.{i}{suffix}.bias"] = np.zeros(F, np.float32)
    A = len(cfg.aspect_ratios)
    rpn_conv = "rpn.head.conv.0.0" if new_style else "rpn.head.conv"
    conv(rpn_conv, F, F, 3)
    sd[rpn_conv + ".bias"] = np.zeros(F, np.float32)
    conv("rpn.head.cls_logits", A, F, 1)
    sd["rpn.head.cls_logits.bias"] = np.zeros(A, np.float32)
    conv("rpn.head.bbox_pred", A * 4, F, 1)
    sd["rpn.head.bbox_pred.bias"] = np.zeros(A * 4, np.float32)
    R = cfg.representation_size
    dense("roi_heads.box_head.fc6", R, F * 49)
    dense("roi_heads.box_head.fc7", R, R)
    dense("roi_heads.box_predictor.cls_score", cfg.num_classes, R)
    dense("roi_heads.box_predictor.bbox_pred", cfg.num_classes * 4, R)
    if mask_rcnn:
        # maskrcnn_resnet50_fpn extras: 4-conv mask head + deconv predictor
        for i in range(1, 5):
            conv(f"roi_heads.mask_head.mask_fcn{i}", F, F, 3)
            sd[f"roi_heads.mask_head.mask_fcn{i}.bias"] = np.zeros(F, np.float32)
        conv("roi_heads.mask_predictor.conv5_mask", F, F, 2)
        sd["roi_heads.mask_predictor.conv5_mask.bias"] = np.zeros(F, np.float32)
        conv("roi_heads.mask_predictor.mask_fcn_logits", cfg.num_classes, F, 1)
        sd["roi_heads.mask_predictor.mask_fcn_logits.bias"] = np.zeros(cfg.num_classes, np.float32)
    return sd


def test_mask_rcnn_conversion():
    """A maskrcnn-shaped state_dict converts cleanly (box branch used, mask
    branch dropped) and arch/state-dict mismatches are rejected (reference
    selects the detector at resnet.py:134-141)."""
    from drin_tpu.encoders.frcnn import detector_params_from_torch

    sd = _fabricate_torchvision_sd(TINY, new_style=True, mask_rcnn=True)
    params = detector_params_from_torch(sd, TINY, "mask_rcnn")
    model = FasterRCNN(TINY)
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    ref_shapes = jax.tree.map(lambda x: x.shape, model.init(jax.random.key(0), img)["params"])
    assert jax.tree.map(lambda x: np.asarray(x).shape, params) == ref_shapes
    boxes, _, _ = model.apply({"params": params}, img)
    assert np.all(np.isfinite(np.asarray(boxes)))
    with pytest.raises(ValueError, match="no roi_heads.mask"):
        detector_params_from_torch(_fabricate_torchvision_sd(TINY, True), TINY, "mask_rcnn")
    with pytest.raises(ValueError, match="has roi_heads.mask"):
        detector_params_from_torch(sd, TINY, "faster_rcnn")
    with pytest.raises(ValueError, match="unknown"):
        detector_params_from_torch(sd, TINY, "yolo")


@pytest.mark.parametrize("new_style", [False, True])
def test_torchvision_conversion_and_forward(new_style):
    """Converted params load into the flax model and run; both torchvision
    key spellings accepted; old/new spellings of the SAME values agree."""
    sd = _fabricate_torchvision_sd(TINY, new_style)
    params = frcnn_params_from_torch(sd, TINY)
    model = FasterRCNN(TINY)
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    # structural check: converted tree matches the model's init tree exactly
    ref_params = model.init(jax.random.key(0), img)["params"]
    ref_shapes = jax.tree.map(lambda x: x.shape, ref_params)
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, params)
    assert ref_shapes == got_shapes
    boxes, scores, labels = model.apply({"params": params}, img)
    assert np.all(np.isfinite(np.asarray(boxes)))


# ---------------------------------------------------------------------------
# Composed RPN -> RoI numpy oracle: everything downstream of the conv towers
# (anchors, decode/clip, NMS, top-k, multiscale RoIAlign, box head, per-class
# batched-NMS postprocess) replicated in numpy with TORCH semantics — the
# box-head weights are consumed in torch's channel-major flatten order, so
# this also proves the converter's fc6 CPP->PPC permutation.


def _np_anchors(feature_size, stride, sizes, ratios):
    H, W = feature_size
    sizes = np.asarray(sizes, np.float32)
    ratios = np.asarray(ratios, np.float32)
    h_r = np.sqrt(ratios)
    w_r = 1.0 / h_r
    ws = (w_r[:, None] * sizes[None, :]).reshape(-1)
    hs = (h_r[:, None] * sizes[None, :]).reshape(-1)
    base = np.round(np.stack([-ws, -hs, ws, hs], 1) / 2.0)
    sx, sy = np.meshgrid(np.arange(W) * stride, np.arange(H) * stride, indexing="xy")
    shifts = np.stack([sx.ravel(), sy.ravel()] * 2, 1).astype(np.float32)
    return (shifts[:, None, :] + base[None]).reshape(-1, 4)


def _np_decode(deltas, anchors, weights=(1, 1, 1, 1), clip=4.135):
    wx, wy, ww, wh = weights
    w = anchors[:, 2] - anchors[:, 0]
    h = anchors[:, 3] - anchors[:, 1]
    cx = anchors[:, 0] + 0.5 * w
    cy = anchors[:, 1] + 0.5 * h
    dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
    dw = np.minimum(deltas[:, 2] / ww, clip)
    dh = np.minimum(deltas[:, 3] / wh, clip)
    pcx, pcy = dx * w + cx, dy * h + cy
    pw, ph = np.exp(dw) * w, np.exp(dh) * h
    return np.stack([pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2], 1)


def _np_clip(b, H, W):
    return np.stack([np.clip(b[:, 0], 0, W), np.clip(b[:, 1], 0, H),
                     np.clip(b[:, 2], 0, W), np.clip(b[:, 3], 0, H)], 1)


def _np_iou(a, b):
    aa = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    ab = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(aa[:, None] + ab[None] - inter, 1e-9)


def _np_nms(boxes, scores, thr, top_k):
    iou = _np_iou(boxes, boxes)
    alive = np.ones(len(boxes), bool)
    out = np.full(top_k, -1, np.int64)
    for i in range(top_k):
        masked = np.where(alive, scores, -np.inf)
        best = int(np.argmax(masked))
        if masked[best] == -np.inf:
            break
        out[i] = best
        alive &= ~((iou[best] > thr) | (np.arange(len(boxes)) == best))
    return out


def _np_roi_align(feat, boxes, out_size, scale, s=2):
    H, W, C = feat.shape
    oh, ow = out_size
    outs = []
    for box in boxes:
        x1, y1, x2, y2 = box * scale - 0.5
        bw, bh = (x2 - x1) / ow, (y2 - y1) / oh
        iy = (np.arange(oh)[:, None] * bh + (np.arange(s)[None] + 0.5) * bh / s + y1).ravel()
        ix = (np.arange(ow)[:, None] * bw + (np.arange(s)[None] + 0.5) * bw / s + x1).ravel()
        yy = np.clip(iy, 0, H - 1)
        xx = np.clip(ix, 0, W - 1)
        y0 = np.floor(yy).astype(int); x0 = np.floor(xx).astype(int)
        y1i = np.minimum(y0 + 1, H - 1); x1i = np.minimum(x0 + 1, W - 1)
        wy = (yy - y0)[:, None, None]; wx = (xx - x0)[None, :, None]
        v = (feat[y0][:, x0] * (1 - wy) * (1 - wx) + feat[y0][:, x1i] * (1 - wy) * wx
             + feat[y1i][:, x0] * wy * (1 - wx) + feat[y1i][:, x1i] * wy * wx)
        v = v.reshape(oh, s, ow, s, C).mean((1, 3))
        outs.append(v)
    return np.stack(outs)


def test_composed_rpn_roi_numpy_oracle():
    """End-to-end detection logic vs a numpy replica running in torch's data
    layout.  Conv towers (body/FPN/RPN head) run once in flax and their
    outputs feed both paths; everything after is independent code."""
    cfg = TINY
    sd = _fabricate_torchvision_sd(cfg, new_style=True)
    params = frcnn_params_from_torch(sd, cfg)
    model = FasterRCNN(cfg)
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    got_boxes, got_scores, got_labels = (np.asarray(x) for x in
                                         model.apply({"params": params}, img))

    # shared conv-tower outputs
    bound = model.bind({"params": params})
    H = W = 64
    x = (img - np.asarray(cfg.image_mean)) / np.asarray(cfg.image_std)
    feats = [np.asarray(f) for f in bound.fpn(bound.body(jnp.asarray(x)[None]))]
    logits, deltas = bound.rpn_head([jnp.asarray(f) for f in feats])
    logits = [np.asarray(l) for l in logits]
    deltas = [np.asarray(d) for d in deltas]

    # ---- numpy RPN ----
    all_b, all_s = [], []
    for lvl in range(5):
        stride = 2 ** (lvl + 2)
        anchors = _np_anchors(feats[lvl].shape[1:3], stride,
                              cfg.anchor_sizes[lvl], cfg.aspect_ratios)
        score = logits[lvl][0].reshape(-1)
        delta = deltas[lvl][0].reshape(-1, 4)
        k = min(cfg.pre_nms_topk, len(score))
        top = np.argsort(-score, kind="stable")[:k]
        boxes = _np_clip(_np_decode(delta[top], anchors[top]), H, W)
        s = score[top].copy()
        bad = ((boxes[:, 2] - boxes[:, 0]) <= 1e-3) | ((boxes[:, 3] - boxes[:, 1]) <= 1e-3)
        s[bad] = -np.inf
        keep = _np_nms(boxes, s, cfg.rpn_nms_thresh, min(cfg.post_nms_topk, k))
        kv = keep >= 0
        all_b.append(np.where(kv[:, None], boxes[np.maximum(keep, 0)], 0.0))
        all_s.append(np.where(kv, s[np.maximum(keep, 0)], -np.inf))
    props = np.concatenate(all_b)
    pscores = np.concatenate(all_s)
    k = min(cfg.post_nms_topk, len(props))
    props = props[np.argsort(-pscores, kind="stable")[:k]]

    # ---- numpy RoI heads in TORCH layout ----
    area = np.maximum(props[:, 2] - props[:, 0], 0) * np.maximum(props[:, 3] - props[:, 1], 0)
    lvl = np.clip(np.floor(4 + np.log2(np.sqrt(area) / 224.0 + 1e-6)), 2, 5).astype(int) - 2
    pooled = np.stack([
        _np_roi_align(feats[l][0], props[i:i + 1], (7, 7), 1.0 / 2 ** (l + 2))[0]
        for i, l in enumerate(lvl)
    ])  # [K, 7, 7, C] NHWC
    flat_t = pooled.transpose(0, 3, 1, 2).reshape(len(props), -1)  # torch CPP order
    fc6 = np.maximum(flat_t @ sd["roi_heads.box_head.fc6.weight"].T
                     + sd["roi_heads.box_head.fc6.bias"], 0)
    fc7 = np.maximum(fc6 @ sd["roi_heads.box_head.fc7.weight"].T
                     + sd["roi_heads.box_head.fc7.bias"], 0)
    cls = fc7 @ sd["roi_heads.box_predictor.cls_score.weight"].T \
        + sd["roi_heads.box_predictor.cls_score.bias"]
    reg = fc7 @ sd["roi_heads.box_predictor.bbox_pred.weight"].T \
        + sd["roi_heads.box_predictor.bbox_pred.bias"]
    probs = np.exp(cls - cls.max(-1, keepdims=True))
    probs = (probs / probs.sum(-1, keepdims=True))[:, 1:]
    reg = reg.reshape(len(props), cfg.num_classes, 4)[:, 1:]

    # ---- numpy torchvision postprocess (per-class batched NMS) ----
    K_ = probs.shape[1]
    flat_d = reg.reshape(-1, 4)
    flat_p = np.repeat(props, K_, axis=0)
    boxes = _np_clip(_np_decode(flat_d, flat_p, weights=(10, 10, 5, 5)), H, W)
    scores = probs.reshape(-1)
    labels = np.tile(np.arange(1, K_ + 1), len(props))
    ok = (scores >= cfg.box_score_thresh)
    ok &= (boxes[:, 2] - boxes[:, 0]) >= cfg.box_min_size
    ok &= (boxes[:, 3] - boxes[:, 1]) >= cfg.box_min_size
    scores = np.where(ok, scores, -np.inf)
    m = min(cfg.pre_class_nms_topk, len(scores))
    top = np.argsort(-scores, kind="stable")[:m]
    boxes, labels, scores = boxes[top], labels[top], scores[top]
    off = labels[:, None] * (max(H, W) + 2.0)
    keep = _np_nms(boxes + off, scores, cfg.box_nms_thresh, cfg.detections_per_img)
    kv = keep >= 0
    safe = np.maximum(keep, 0)
    want_boxes = np.where(kv[:, None], boxes[safe], 0.0)
    want_scores = np.where(kv, scores[safe], 0.0)
    want_labels = np.where(kv, labels[safe], 0)

    assert (got_scores > 0).sum() == (want_scores > 0).sum()
    np.testing.assert_array_equal(got_labels, want_labels)
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-3, atol=1e-3)
