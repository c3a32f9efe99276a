# -*- coding: utf-8 -*-
"""Encoder parity: our flax BERT/ResNet/CLIP vs HF torch models with
identical (randomly initialized) weights.

No pretrained downloads happen here (zero-egress environment): HF models are
instantiated at reduced dims with random weights, their state_dicts are
converted, and outputs must agree to float32 tolerance.  The converters are
dimension-agnostic, so the same path loads real bert-base-cased /
resnet-152 / clip-vit-base-patch32 checkpoints when available."""

import numpy as np
import pytest


def test_bert_parity():
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel as HFBertModel

    from drin_tpu.encoders.bert import BertModel, bert_params_from_torch, config_from_torch

    hf_cfg = HFBertConfig(
        vocab_size=211, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = HFBertModel(hf_cfg).eval()

    rng = np.random.default_rng(0)
    B, L = 3, 17
    ids = rng.integers(0, 211, (B, L))
    lens = np.array([17, 9, 4])
    mask = (np.arange(L)[None] < lens[:, None]).astype(np.int64)
    with torch.no_grad():
        out = hf(input_ids=torch.as_tensor(ids), attention_mask=torch.as_tensor(mask))
        ref_h = out.last_hidden_state.numpy()
        ref_p = out.pooler_output.numpy()

    cfg = config_from_torch(hf_cfg)
    model = BertModel(cfg)
    params = bert_params_from_torch(hf.state_dict(), cfg)
    h, p = model.apply({"params": params}, ids, mask)
    # masked positions attend garbage by design; compare valid positions
    np.testing.assert_allclose(np.asarray(h) * mask[..., None], ref_h * mask[..., None],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p), ref_p, rtol=1e-4, atol=1e-5)


def test_resnet_parity():
    import torch
    from transformers import ResNetConfig as HFResNetConfig, ResNetModel as HFResNetModel

    from drin_tpu.encoders.resnet import ResNetModel, config_from_torch, resnet_params_from_torch

    hf_cfg = HFResNetConfig(
        embedding_size=8, hidden_sizes=[16, 32, 64, 128], depths=[2, 2, 2, 2],
        layer_type="bottleneck", num_channels=3,
    )
    torch.manual_seed(1)
    hf = HFResNetModel(hf_cfg).eval()
    # randomize BN running stats so the test actually covers them
    with torch.no_grad():
        for m in hf.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.as_tensor(x))
        ref_h = out.last_hidden_state.numpy()  # [B, C, H, W]
        ref_p = out.pooler_output.numpy()  # [B, C, 1, 1]

    cfg = config_from_torch(hf_cfg)
    model = ResNetModel(cfg)
    params = resnet_params_from_torch(hf.state_dict(), cfg)
    h, p = model.apply({"params": params}, x.transpose(0, 2, 3, 1))  # NHWC
    np.testing.assert_allclose(np.asarray(h).transpose(0, 3, 1, 2), ref_h, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p), ref_p.reshape(ref_p.shape[:2]), rtol=1e-3, atol=1e-4)


def test_clip_parity():
    import torch
    from transformers import CLIPConfig as HFCLIPConfig, CLIPModel as HFCLIPModel
    from transformers import CLIPTextConfig as HFTextCfg, CLIPVisionConfig as HFVisionCfg

    from drin_tpu.encoders.clip import CLIPModel, clip_params_from_torch, config_from_torch

    hf_cfg = HFCLIPConfig.from_text_vision_configs(
        HFTextCfg(vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                  intermediate_size=64, max_position_embeddings=24,
                  attention_dropout=0.0, eos_token_id=2),
        HFVisionCfg(hidden_size=40, num_hidden_layers=2, num_attention_heads=4,
                    intermediate_size=80, image_size=32, patch_size=8, attention_dropout=0.0),
        projection_dim=48,
    )
    torch.manual_seed(2)
    hf = HFCLIPModel(hf_cfg).eval()

    rng = np.random.default_rng(2)
    B_t, B_i, L = 4, 3, 12
    # ids where argmax marks the eot position (ids strictly below vocab-1,
    # one max token per row) — matches CLIP's argmax pooling contract
    ids = rng.integers(1, 90, (B_t, L))
    eot_pos = rng.integers(3, L, B_t)
    ids[np.arange(B_t), eot_pos] = 98
    pix = rng.standard_normal((B_i, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out = hf(input_ids=torch.as_tensor(ids), pixel_values=torch.as_tensor(pix))
        ref_lpi = out.logits_per_image.numpy()
        ref_lpt = out.logits_per_text.numpy()

    cfg = config_from_torch(hf_cfg)
    model = CLIPModel(cfg)
    params = clip_params_from_torch(hf.state_dict(), cfg)
    lpi, lpt = model.apply({"params": params}, ids, pix.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(lpi), ref_lpi, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lpt), ref_lpt, rtol=1e-3, atol=1e-4)
