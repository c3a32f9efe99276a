# -*- coding: utf-8 -*-
"""Training-dynamics parity: several full optimization steps of the
reference (torch Adam + its TripletLoss, run in place) vs ours (optax Adam +
vectorized triplet loss) from identical weights on identical batches.

This pins the whole training contract at once: loss semantics (in-batch
negatives over the whole candidate matrix, answer column stripping),
gradient flow through every module, and optimizer update math
(torch.optim.Adam and optax.adam share step rule and defaults)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from drin_tpu.common.config import make_config
from drin_tpu.models.drin import DRIN
from drin_tpu.models.torch_import import drin_params_from_torch
from drin_tpu.train.loss import triplet_loss
from tests.reference_oracle import load_reference, ref_import
from tests.test_parity_drin import _make_batch


def test_drin_five_step_training_parity():
    import torch

    load_reference("wikidiverse", "drin")
    ref_model_mod = ref_import("drin.model")
    ref_utils = ref_import("common.utils")
    torch.manual_seed(0)
    ref = ref_model_mod.Model().train()
    ref_loss = ref_utils.TripletLoss(0.25)
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)

    cfg = make_config("drin", "wikidiverse", dataset_root="/tmp/unused",
                      cache_entity_pooling=False)
    model = DRIN(cfg)
    params = drin_params_from_torch(
        {k: v.numpy() for k, v in ref.state_dict().items()}, cfg.num_gcn_layers)
    params = jax.tree.map(jnp.asarray, params)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, feats, answer):
        def lf(p):
            scores = model.apply({"params": p}, feats)
            return triplet_loss(answer, scores, 0.25)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(99)
    C = cfg.num_candidates_model
    ref_losses, our_losses = [], []
    for i in range(5):
        batch_np = _make_batch(rng, "wikidiverse", B=4)
        answer = np.eye(C - 1, dtype=np.float32)[rng.integers(0, C - 1, 4)]

        tb = [torch.as_tensor(x) for x in batch_np]
        opt.zero_grad()
        out = ref(tb)
        tl = ref_loss(torch.as_tensor(answer), out)
        tl.backward()
        opt.step()
        ref_losses.append(float(tl))

        params, opt_state, jl = step(params, opt_state,
                                     tuple(jnp.asarray(x) for x in batch_np),
                                     jnp.asarray(answer))
        our_losses.append(float(jl))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-4)
    # and the final weights still agree (optimizer trajectories matched)
    final_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    final_ref_params = drin_params_from_torch(final_sd, cfg.num_gcn_layers)
    ours_flat = {jax.tree_util.keystr(k): v for k, v in
                 jax.tree_util.tree_leaves_with_path(jax.device_get(params))}
    ref_flat = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(final_ref_params)}
    assert ours_flat.keys() == ref_flat.keys()
    for k in ours_flat:
        np.testing.assert_allclose(ours_flat[k], ref_flat[k], rtol=5e-2, atol=5e-4,
                                   err_msg=k)
