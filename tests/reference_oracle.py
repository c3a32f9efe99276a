# -*- coding: utf-8 -*-
"""Load the reference implementation (read-only, /root/reference) as a test
oracle.

The reference depends on ``torchmetrics`` and ``lightning`` which are not
installed; tiny stubs satisfy the imports.  The config module is imported
first, retargeted to CPU / the requested dataset, and only then are the
model modules imported (they star-import config values at import time).

The reference code is never copied — it is executed in place to produce
golden outputs that our TPU-native implementation must reproduce.
"""

from __future__ import annotations

import importlib
import sys
import types

REFERENCE_PATH = "/root/reference"

_REF_MODULES = [
    "common",
    "common.args",
    "common.utils",
    "baselines",
    "baselines.ghmfc",
    "baselines.melhi",
    "baselines.data",
    "drin",
    "drin.model",
    "drin.data",
]


def _install_stubs():
    if "torchmetrics" not in sys.modules:
        import torch

        tm = types.ModuleType("torchmetrics")

        class Metric(torch.nn.Module):
            def __init__(self):
                super().__init__()

            def add_state(self, name, default=None, dist_reduce_fx=None):
                setattr(self, name, default)

        tm.Metric = Metric
        sys.modules["torchmetrics"] = tm
    if "lightning" not in sys.modules:
        import torch

        pl = types.ModuleType("lightning")
        # a real nn.Module base so the reference's MELModel harness class
        # (train.py:20-56) is fully functional: ModuleList registration,
        # .parameters() for configure_optimizers, __call__ -> forward.  The
        # Lightning *loop* itself is driven by the tests
        # (test_training_parity.test_full_harness_trajectory reproduces the
        # fit/test chunk schedule of train.py:141-144).
        pl.LightningModule = torch.nn.Module
        pl.Callback = type("Callback", (), {})
        pl.Trainer = type("Trainer", (), {})
        pl.seed_everything = lambda *a, **k: None
        sys.modules["lightning"] = pl


def load_reference(dataset_name: str = "wikidiverse", model_type: str = "drin"):
    """(Re)import the reference package configured for dataset/model on CPU.

    Returns the ``common.args`` module; model modules are then importable via
    :func:`ref_import`."""
    _install_stubs()
    # APPEND, never prepend: the reference tree also has a top-level
    # ``train.py`` (and ``preprocess``), which would shadow this repo's
    # entry modules for every later ``import train`` in the test process.
    # Only the reference's package names (common/baselines/drin) are
    # resolved through this path entry; none collide with repo modules.
    if REFERENCE_PATH not in sys.path:
        sys.path.append(REFERENCE_PATH)
    # evict by PREFIX, not exact name: a cached reference SUBMODULE (e.g.
    # ``preprocess.prepare``) keeps the previous dataset's star-imported
    # args values baked in, and a later import_module would return it and
    # silently produce wrong-dataset golden outputs
    prefixes = tuple({m.split(".")[0] for m in _REF_MODULES})
    for name in list(sys.modules):
        if name in _REF_MODULES or name.startswith(tuple(p + "." for p in prefixes)):
            sys.modules.pop(name, None)
    # drop any reference modules cached under repo-owned names (incl. their
    # submodules — same staleness hazard)
    for name in list(sys.modules):
        root = name.split(".")[0]
        if root not in ("train", "preprocess"):
            continue
        mod = sys.modules.get(name)
        origin = getattr(mod, "__file__", None) or ""  # namespace pkgs: None
        paths = list(getattr(mod, "__path__", []) or [])
        if mod is not None and (origin.startswith(REFERENCE_PATH)
                                or any(p.startswith(REFERENCE_PATH) for p in paths)):
            sys.modules.pop(name, None)
    args = importlib.import_module("common.args")
    args.use_device = "cpu"
    args.model_type = model_type
    args.dataset_name = dataset_name
    # re-apply the dataset conditional block (args.py:82-101) for the numeric
    # fields the models read; paths are never touched in forward passes
    if dataset_name == "wikimel":
        args.num_candidates_data = 100
        args.max_entity_attr_char_len = 128
        args.max_entity_attr_token_len = 64
        args.metrics_topk = [1, 5, 10, 20, 50]
        args.acc_correction = [0, 0, 0]
    else:
        args.num_candidates_data = 10
        args.max_entity_attr_char_len = 512
        args.max_entity_attr_token_len = 128
        args.metrics_topk = [1, 3, 5]
    args.num_candidates_model = args.num_candidates_data + 1
    # re-apply the model conditional block (args.py:7-40)
    if model_type == "drin":
        args.mention_final_layer_name = "linear"
        args.mention_final_representation = "avg extract"
        args.entity_final_layer_name = "linear"
        args.entity_final_pooling = "avg"
        args.mention_final_output_dim = args.gcn_embed_dim
        args.entity_final_output_dim = args.gcn_embed_dim
    elif model_type == "ghmfc":
        args.pre_extract_mention = False
        args.mention_final_layer_name = "multimodal"
        args.mention_final_representation = "max pool"
        args.mention_final_output_dim = 768
        args.entity_final_layer_name = "linear"
        args.entity_final_pooling = "avg"
        args.entity_final_output_dim = 768
        args.multimodal_subspace_activation = "gelu"
        args.mention_multimodal_attention = "bi"
    elif model_type == "melhi":
        args.thres_tmim = 0.3
        args.thres_imie = 0.3
        args.mention_final_layer_name = args.entity_final_layer_name = "multimodal"
    return args


def ref_import(name: str):
    return importlib.import_module(name)
