# -*- coding: utf-8 -*-
"""Test config: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes (SURVEY §4: the JAX-idiomatic
fake-backend equivalent of a fake multi-chip cluster)."""

import os

# XLA_FLAGS must be in the env before the CPU PJRT client initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The environment may register a TPU backend from a sitecustomize hook that
# imports jax before this file runs (making the env var above a no-op); the
# config update is authoritative either way.
jax.config.update("jax_platforms", "cpu")

# parity tests compare against torch f32; disable XLA's relaxed matmul
# precision (oneDNN bf16-style accumulation gives ~1e-2 relative error).
# NOTE this means the suite never runs at production default precision
# (TPU: bf16 matmul passes).  The exact-math rewrites (folded GCN edges,
# pooled entity cache) are proven ALGEBRAICALLY equivalent here; at bf16
# both the rewritten and naive paths carry the same-order rounding vs f32,
# so the equivalence claim is about the math, not bit-level bf16 identity.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest

from drin_tpu.data.synthetic import make_synthetic_store, tiny_config


@pytest.fixture(scope="session")
def wd_cfg(tmp_path_factory):
    """Tiny wikidiverse config + synthetic feature store."""
    d = str(tmp_path_factory.mktemp("wd-store"))
    cfg = tiny_config("wikidiverse", "drin", preprocess_dir=d)
    make_synthetic_store(cfg, n_mentions=12, seed=0)
    return cfg


@pytest.fixture(scope="session")
def wm_cfg(tmp_path_factory):
    """Tiny wikimel config + synthetic feature store."""
    d = str(tmp_path_factory.mktemp("wm-store"))
    cfg = tiny_config("wikimel", "drin", preprocess_dir=d)
    make_synthetic_store(cfg, n_mentions=12, n_entities=40, seed=1)
    return cfg


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
