# -*- coding: utf-8 -*-
"""DRIN configuration-space parity: vector edges, static edges, edge
ablation masks — each vs the reference run in place with identical weights."""

import numpy as np
import pytest

from drin_tpu.common.config import make_config
from drin_tpu.models.drin import DRIN
from drin_tpu.models.torch_import import drin_params_from_torch
from tests.reference_oracle import load_reference, ref_import
from tests.test_parity_drin import _make_batch


def _run_pair(dataset="wikidiverse", **cfg_overrides):
    """Build (reference_out, ours_out) with the reference's args mutated to
    the same configuration."""
    import torch

    args = load_reference(dataset, "drin")
    for k, v in cfg_overrides.items():
        setattr(args, k, list(v) if isinstance(v, tuple) else v)
    ref_mod = ref_import("drin.model")
    torch.manual_seed(0)
    ref = ref_mod.Model().eval()

    rng = np.random.default_rng(31)
    batch_np = _make_batch(rng, dataset)
    with torch.no_grad():
        ref_out = ref([torch.as_tensor(x) for x in batch_np]).numpy()

    cfg = make_config("drin", dataset, dataset_root="/tmp/unused",
                      cache_entity_pooling=False, **cfg_overrides)
    model = DRIN(cfg)
    params = drin_params_from_torch(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        cfg.num_gcn_layers,
        edge_vector=cfg.gcn_edge_feature == "vector",
        transformer_num_layers=cfg.transformer_num_layers,
    )
    ours = np.asarray(model.apply({"params": params}, batch_np))
    return ref_out, ours


def test_vector_edge_parity():
    ref_out, ours = _run_pair(gcn_edge_feature="vector")
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)


def test_static_edge_parity():
    ref_out, ours = _run_pair(gcn_edge_type="static")
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)


def test_edge_ablation_mask_parity():
    """gcn_edge_enabled zeroes individual relation types (model.py:122)."""
    ref_out, ours = _run_pair(gcn_edge_enabled=(1, 0, 1, 0))
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)


def test_ablation_actually_ablates():
    """Disabling all edges must change scores vs all-enabled (guards against
    the mask silently not being applied)."""
    ref_all, ours_all = _run_pair()
    ref_none, ours_none = _run_pair(gcn_edge_enabled=(0, 0, 0, 0))
    assert not np.allclose(ours_all, ours_none)
    np.testing.assert_allclose(ours_none, ref_none, rtol=2e-4, atol=2e-5)


def test_transformer_mention_encoder_parity():
    """mention_final_layer_name='transformer' routes the mention sentence
    through the 8-layer transformer before span pooling (ghmfc.py:166-167)."""
    ref_out, ours = _run_pair(mention_final_layer_name="transformer",
                              mention_final_representation="avg extract",
                              transformer_num_layers=2)
    np.testing.assert_allclose(ours, ref_out, rtol=2e-3, atol=2e-4)


def test_max_pool_edge_repr_parity():
    """mention_final_representation='max pool' changes the EdgeEncoder's
    mention representation (ghmfc.py:192-199 via drin model.py:58)."""
    ref_out, ours = _run_pair(mention_final_representation="max pool",
                              mention_final_layer_name="none")
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)
