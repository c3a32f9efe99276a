# -*- coding: utf-8 -*-
"""Pallas TPU kernel: fused DRIN GCN entity-vertex update.

One kernel computes  y = act(LayerNorm((v + e1⊙m1 + e2⊙m2) @ W + b))
for the [B, C, D] entity vertices (reference GCNLayer vertex update,
drin/model.py:121-129 + :139-146): the scalar-edge broadcasts, the residual
aggregation, the W_h matmul, LayerNorm and the activation all happen in one
pass through VMEM instead of separate HBM-roundtripping ops.

Keeps an einsum fallback (``use_pallas=False`` / non-TPU backends); equality
is covered by tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drin_tpu.nn.layers import get_activation


def _kernel(v_ref, e1_ref, e2_ref, m1_ref, m2_ref, w_ref, b_ref, s_ref, lb_ref,
            out_ref, *, act: str, eps: float):
    v = v_ref[0]  # [C, D]
    e1 = e1_ref[0]  # [C, 1] — column layout avoids a lane->sublane reshape
    e2 = e2_ref[0]
    m1 = m1_ref[0]  # [1, D]
    m2 = m2_ref[0]
    x = v + e1 * m1 + e2 * m2
    h = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32) + b_ref[0][None, :]
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    ln = (h - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * s_ref[0][None, :] + lb_ref[0][None, :]
    if act == "gelu":
        # erf-form gelu; Mosaic lowers neither erf nor erfc, so use the
        # Abramowitz-Stegun 7.1.26 rational approximation (|err| < 1.5e-7,
        # well inside the reference-parity tolerance)
        y = 0.5 * ln * (1.0 + _erf(ln * (2.0**-0.5)))
    else:
        y = get_activation(act)(ln)
    out_ref[0] = y.astype(out_ref.dtype)


def _erf(x):
    """Abramowitz & Stegun 7.1.26 erf approximation (max abs err 1.5e-7)."""
    sign = jnp.sign(x)
    x = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-x * x))


def fused_vertex_update(v, e1, m1, e2, m2, w, b, scale, bias, act: str = "gelu",
                        eps: float = 1e-5, interpret: bool = False):
    """y = act(LN((v + e1*m1 + e2*m2) @ w + b)) fused on TPU.

    v [B, C, D]; e1/e2 [B, C]; m1/m2 [B, D]; w [D, D]; b/scale/bias [D].
    Grid over B; each program owns one sample's full [C, D] block (TPU block
    rules want full-dim or 8/128-aligned trailing dims; C is full-dim)."""
    B, C, D = v.shape
    grid = (B,)
    kern = functools.partial(_kernel, act=act, eps=eps)
    e1r, e2r = e1[:, :, None], e2[:, :, None]  # [B, C, 1]
    m1r, m2r = m1[:, None, :], m2[:, None, :]  # [B, 1, D]
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, C, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, D), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * C * D * D + 8 * B * C * D,
            bytes_accessed=(2 * B * C * D + D * D) * v.dtype.itemsize,
            transcendentals=B * C * D,
        ),
        interpret=interpret,
    )(v, e1r, e2r, m1r, m2r, w, b[None, :], scale[None, :], bias[None, :])


def vertex_update_reference(v, e1, m1, e2, m2, w, b, scale, bias, act: str = "gelu",
                            eps: float = 1e-5):
    """XLA fallback with identical semantics."""
    x = v + e1[..., None] * m1[:, None, :] + e2[..., None] * m2[:, None, :]
    h = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    ln = (h - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    return get_activation(act)(ln).astype(v.dtype)
