# -*- coding: utf-8 -*-
"""Golden parity: our DRIN vs the reference DRIN run in place (CPU torch).

Both models get identical weights (via the torch_import converter) and an
identical random batch at the TRUE reference dims; outputs must agree to
float32 tolerance.  This pins every reference quirk: span-average mention
encoding, CLS-vs-pooled entity text, 1/100 CLIP edge scaling, the GCN
message-passing wiring, and torch cosine/LayerNorm numerics."""

import numpy as np
import pytest
import jax

from drin_tpu.common.config import make_config
from drin_tpu.models.drin import DRIN
from drin_tpu.models.torch_import import drin_params_from_torch

from tests.reference_oracle import load_reference, ref_import


def _make_batch(rng, dataset: str, B: int = 2):
    """Random 14-tensor DRIN batch at reference dims (SURVEY §6 shape table)."""
    C = 101 if dataset == "wikimel" else 11
    L, D, R, Dr = 128, 768, 49, 2048
    Tm, Te = 3, 1
    lens = rng.integers(6, L, size=B)
    mask = (np.arange(L)[None] < lens[:, None]).astype(np.int64)
    start = rng.integers(1, 4, size=B)
    end = start + rng.integers(1, 3, size=B)
    batch = dict(
        mention_text_feature=rng.standard_normal((B, L, D), dtype=np.float32),
        mention_text_mask=mask,
        mention_start_pos=start.astype(np.int64),
        mention_end_pos=end.astype(np.int64),
        mention_image_feature=rng.standard_normal((B, R, Dr), dtype=np.float32),
        mention_object_feature=rng.standard_normal((B, Tm, Dr), dtype=np.float32),
        mention_object_score=rng.uniform(0, 1, (B, Tm)).astype(np.float32),
    )
    if dataset == "wikimel":
        Le = 64
        elens = rng.integers(4, Le, size=(B, C))
        emask = (np.arange(Le)[None, None] < elens[..., None]).astype(np.int64)
        batch.update(
            entity_text_feature=rng.standard_normal((B, C, Le, D), dtype=np.float32),
            entity_text_mask=emask,
            entity_image_feature=rng.standard_normal((B, C, 1, Dr), dtype=np.float32),
            entity_object_feature=rng.standard_normal((B, C, Te, 1, Dr), dtype=np.float32),
            entity_object_score=rng.uniform(0, 1, (B, C, Te)).astype(np.float32),
        )
    else:
        batch.update(
            entity_text_feature=rng.standard_normal((B, C, D), dtype=np.float32),
            entity_text_mask=np.zeros((B,), np.int64),
            entity_image_feature=rng.standard_normal((B, C, Dr), dtype=np.float32),
            entity_object_feature=rng.standard_normal((B, C, Te, Dr), dtype=np.float32),
            entity_object_score=rng.uniform(0, 1, (B, C, Te)).astype(np.float32),
        )
    batch.update(
        miet_similarity=rng.uniform(0, 40, (B, C)).astype(np.float32),
        mtei_similarity=rng.uniform(0, 40, (B, C)).astype(np.float32),
    )
    order = [
        "mention_text_feature",
        "mention_text_mask",
        "mention_start_pos",
        "mention_end_pos",
        "mention_image_feature",
        "mention_object_feature",
        "mention_object_score",
        "entity_text_feature",
        "entity_text_mask",
        "entity_image_feature",
        "entity_object_feature",
        "entity_object_score",
        "miet_similarity",
        "mtei_similarity",
    ]
    return [batch[k] for k in order]


@pytest.mark.parametrize("dataset", ["wikidiverse", "wikimel"])
def test_drin_forward_parity(dataset):
    import torch

    load_reference(dataset, "drin")
    ref_model_mod = ref_import("drin.model")
    torch.manual_seed(0)
    ref = ref_model_mod.Model()
    ref.eval()

    rng = np.random.default_rng(42)
    batch_np = _make_batch(rng, dataset)
    with torch.no_grad():
        ref_out = ref([torch.as_tensor(x) for x in batch_np]).numpy()

    # raw token-level entity batch: the reference contract (the pooled
    # cache is covered by test_entity_cache.py)
    cfg = make_config("drin", dataset, dataset_root="/tmp/unused", cache_entity_pooling=False)
    model = DRIN(cfg)
    params = drin_params_from_torch(
        {k: v.numpy() for k, v in ref.state_dict().items()}, cfg.num_gcn_layers
    )
    ours = np.asarray(model.apply({"params": params}, batch_np))

    assert ours.shape == ref_out.shape == (2, cfg.num_candidates_model)
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)


def test_drin_init_and_grad(wd_cfg):
    """Our model initializes from scratch and is differentiable end-to-end."""
    import jax.numpy as jnp

    from drin_tpu.data.dataset import MELFeatureDataset
    from drin_tpu.train.loss import triplet_loss

    ds = MELFeatureDataset(wd_cfg, "train")
    batch = next(ds.batches(wd_cfg.batch_size, kind="drin"))
    model = DRIN(wd_cfg)
    params = model.init(jax.random.key(0), batch[:-1])["params"]

    def loss_fn(p):
        scores = model.apply({"params": p}, batch[:-1])
        return triplet_loss(jnp.asarray(batch.answer), scores, wd_cfg.triplet_margin)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.abs(g).sum()) > 0 for g in leaves)
