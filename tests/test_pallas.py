# -*- coding: utf-8 -*-
"""Pallas kernel equality tests (interpret mode on the CPU mesh) + the
DRIN-with-pallas path end to end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _args(B=4, C=11, D=256, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: rng.standard_normal(s).astype(np.float32)
    return (mk(B, C, D), mk(B, C), mk(B, D), mk(B, C), mk(B, D),
            (mk(D, D) / D**0.5), mk(D), mk(D), mk(D))


@pytest.mark.parametrize("act", ["gelu", "relu", "sigmoid"])
def test_fused_vertex_update_matches_reference(act):
    from drin_tpu.ops.pallas.gcn import fused_vertex_update, vertex_update_reference

    args = _args()
    ref = np.asarray(vertex_update_reference(*args, act=act))
    got = np.asarray(fused_vertex_update(*args, act=act, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_fused_vertex_update_odd_candidate_count():
    """C=101 (prime, unaligned) exercises the full-dim block path."""
    from drin_tpu.ops.pallas.gcn import fused_vertex_update, vertex_update_reference

    args = _args(B=2, C=101, D=128, seed=3)
    ref = np.asarray(vertex_update_reference(*args))
    got = np.asarray(fused_vertex_update(*args, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_erf_approximation_accuracy():
    from drin_tpu.ops.pallas.gcn import _erf

    x = np.linspace(-5, 5, 2001).astype(np.float32)
    got = np.asarray(_erf(jnp.asarray(x)))
    want = np.asarray(jax.scipy.special.erf(jnp.asarray(x)))
    # A&S 7.1.26 bound is 1.5e-7 in f64; f32 rounding brings it to ~4e-7
    assert np.abs(got - want).max() < 1e-6


def test_drin_pallas_flag_end_to_end(wd_cfg):
    """DRIN with use_pallas=True must score identically (to float tolerance)
    to the XLA path given the same params.  On the CPU test backend the flag
    is a no-op (kernel requires TPU), so this guards the flag wiring."""
    from drin_tpu.data.dataset import MELFeatureDataset
    from drin_tpu.models.drin import DRIN

    ds = MELFeatureDataset(wd_cfg, "train")
    batch = next(ds.batches(4, kind="drin"))
    m1 = DRIN(wd_cfg.replace(use_pallas=False))
    m2 = DRIN(wd_cfg.replace(use_pallas=True))
    params = m1.init(jax.random.key(0), batch[:-1])["params"]
    s1 = np.asarray(m1.apply({"params": params}, batch[:-1]))
    s2 = np.asarray(m2.apply({"params": params}, batch[:-1]))
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
