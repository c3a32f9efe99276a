# -*- coding: utf-8 -*-
"""Golden parity for the baselines: our GHMFC/MELHI vs the reference run in
place (CPU torch) with identical weights and batches."""

import numpy as np
import pytest

from drin_tpu.common.config import make_config
from tests.reference_oracle import load_reference, ref_import


def _make_baseline_batch(rng, dataset: str, B: int = 2):
    """Random 8-tensor offline baseline batch at reference dims
    (baselines/data.py:182-192 minus the answer)."""
    C = 101 if dataset == "wikimel" else 11
    L, D, R, Dr = 128, 768, 49, 2048
    lens = rng.integers(6, L, size=B)
    mask = (np.arange(L)[None] < lens[:, None]).astype(np.int64)
    start = rng.integers(1, 4, size=B)
    end = start + rng.integers(1, 3, size=B)
    batch = [
        rng.standard_normal((B, L, D), dtype=np.float32),
        mask,
        start.astype(np.int64),
        end.astype(np.int64),
        rng.standard_normal((B, R, Dr), dtype=np.float32),
    ]
    if dataset == "wikimel":
        Le = 64
        elens = rng.integers(4, Le, size=(B, C))
        emask = (np.arange(Le)[None, None] < elens[..., None]).astype(np.int64)
        batch += [
            rng.standard_normal((B, C, Le, D), dtype=np.float32),
            emask,
            rng.standard_normal((B, C, Dr), dtype=np.float32),
        ]
    else:
        batch += [
            rng.standard_normal((B, C, D), dtype=np.float32),
            np.zeros((B,), np.int64),
            rng.standard_normal((B, C, Dr), dtype=np.float32),
        ]
    return batch


@pytest.mark.parametrize("dataset", ["wikidiverse", "wikimel"])
def test_ghmfc_forward_parity(dataset):
    import torch

    from drin_tpu.models.ghmfc import GHMFC
    from drin_tpu.models.torch_import import ghmfc_params_from_torch

    load_reference(dataset, "ghmfc")
    ref_mod = ref_import("baselines.ghmfc")
    torch.manual_seed(0)
    ref = ref_mod.Model().eval()

    rng = np.random.default_rng(7)
    batch_np = _make_baseline_batch(rng, dataset)
    with torch.no_grad():
        ref_out = ref([torch.as_tensor(x) for x in batch_np]).numpy()

    cfg = make_config("ghmfc", dataset, dataset_root="/tmp/unused", cache_entity_pooling=False)
    model = GHMFC(cfg)
    params = ghmfc_params_from_torch({k: v.numpy() for k, v in ref.state_dict().items()}, cfg)
    ours = np.asarray(model.apply({"params": params}, batch_np))
    assert ours.shape == ref_out.shape == (2, cfg.num_candidates_model)
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=3e-5)


def test_melhi_forward_parity():
    """MELHI parity vs the reference with its ``lstm_extract_last`` corrected.

    The reference's extractor (melhi.py:18-23) indexes the packed LSTM output
    by ``unsorted_indices[i] - 1``, which reads another sequence's first-step
    output instead of sequence i's last step; we implement the intended
    semantics (see drin_tpu/models/melhi.py docstring), so the oracle here is
    the reference model with that one function replaced by a correct
    packed-output last-step extraction.  Everything else (gating thresholds,
    concatenation, LSTM numerics, projections, cosine) is compared exactly.
    """
    import torch

    from drin_tpu.models.melhi import MELHI
    from drin_tpu.models.torch_import import melhi_params_from_torch

    load_reference("wikidiverse", "melhi")
    ref_mod = ref_import("baselines.melhi")

    def correct_extract_last(packed):
        padded, lengths = torch.nn.utils.rnn.pad_packed_sequence(packed, batch_first=True)
        idx = (lengths - 1).clamp(min=0)
        return padded[torch.arange(padded.shape[0]), idx]

    ref_mod.lstm_extract_last = correct_extract_last
    torch.manual_seed(0)
    ref = ref_mod.Model().eval()

    rng = np.random.default_rng(11)
    batch_np = _make_baseline_batch(rng, "wikidiverse", B=3)
    with torch.no_grad():
        ref_out = ref([torch.as_tensor(x) for x in batch_np]).numpy()

    cfg = make_config("melhi", "wikidiverse", dataset_root="/tmp/unused")
    model = MELHI(cfg)
    params = melhi_params_from_torch({k: v.numpy() for k, v in ref.state_dict().items()})
    ours = np.asarray(model.apply({"params": params}, batch_np))
    assert ours.shape == ref_out.shape == (3, cfg.num_candidates_model)
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=3e-5)


def test_melhi_empty_contexts():
    """Left context empty (start<=1) and right context empty (end>=len):
    the reference feeds a single all-zero LSTM step (melhi.py:34, :38); our
    vectorized form must reproduce that for those rows."""
    import torch

    from drin_tpu.models.melhi import MELHI
    from drin_tpu.models.torch_import import melhi_params_from_torch

    load_reference("wikidiverse", "melhi")
    ref_mod = ref_import("baselines.melhi")

    def correct_extract_last(packed):
        padded, lengths = torch.nn.utils.rnn.pad_packed_sequence(packed, batch_first=True)
        idx = (lengths - 1).clamp(min=0)
        return padded[torch.arange(padded.shape[0]), idx]

    ref_mod.lstm_extract_last = correct_extract_last
    torch.manual_seed(1)
    ref = ref_mod.Model().eval()

    rng = np.random.default_rng(13)
    batch_np = _make_baseline_batch(rng, "wikidiverse", B=3)
    # row 0: empty left (start=1); row 1: empty right (end = len);
    # row 2: both contexts present
    mask = batch_np[1]
    lens = mask.sum(-1)
    batch_np[2] = np.array([1, 2, 2], dtype=np.int64)
    batch_np[3] = np.array([3, lens[1], 4], dtype=np.int64)
    with torch.no_grad():
        ref_out = ref([torch.as_tensor(x) for x in batch_np]).numpy()

    cfg = make_config("melhi", "wikidiverse", dataset_root="/tmp/unused")
    model = MELHI(cfg)
    params = melhi_params_from_torch({k: v.numpy() for k, v in ref.state_dict().items()})
    ours = np.asarray(model.apply({"params": params}, batch_np))
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=3e-5)
