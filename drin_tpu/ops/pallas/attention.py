# -*- coding: utf-8 -*-
"""Pallas TPU kernel: fused softmax attention (flash-style, no [L, L] in HBM).

XLA compiles ``softmax(QK^T/sqrt(d) + mask) V`` as three HBM-materialized
stages; at the online-BERT shapes (reference ``baselines/ghmfc.py:221-224``
runs BERT over B*(1+12) sequences of 512 tokens) the logits tensor alone is
``[B*13, 12, 512, 512]`` — multiple GB per layer of pure HBM traffic, and the
allocation that out-of-memories a single chip at batch 64.  This kernel keeps
one query tile plus the full K/V of a (batch, head) pair resident in VMEM
(~0.5 MB/instance) and emits the attention output in a single pass: the
[Lq, L] logits tile never leaves VMEM.

No online-softmax running rescale is needed: K/V for one head fit in VMEM
whole (L=512, Dh=64 -> 64 KB each in bf16), so the kernel computes the exact
row softmax directly — same numerics as the XLA path, cheaper than the
streaming form.

Backward: ``pallas_call`` has no automatic reverse-mode AD; gradients
re-derive through the XLA reference implementation (custom_vjp, same pattern
as ops/pallas/gcn_layer.py) — the fused forward still shrinks fine-tuning
peak memory when combined with per-layer remat (Config.bert_remat).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def attention_reference(q, k, v, additive_mask=None):
    """XLA reference: q/k/v [B, H, L, Dh], mask [B, L] additive (0 keep /
    finfo-min drop).  Returns [B, H, L, Dh]."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if additive_mask is not None:
        logits = logits + additive_mask[:, None, None, :].astype(logits.dtype)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _attn_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale: float):
    q = q_ref[0]  # [Lq, Dh]
    k = k_ref[0]  # [L, Dh]
    v = v_ref[0]
    m = m_ref[0]  # [1, L]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + m.astype(jnp.float32)  # [Lq, L], mask broadcasts over rows
    mx = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - mx)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _fused_forward(q, k, v, additive_mask, block_q: int, interpret: bool):
    B, H, L, Dh = q.shape
    if additive_mask is None:
        additive_mask = jnp.zeros((B, L), q.dtype)
    bq = min(block_q, L)
    while L % bq:  # L not tile-divisible: shrink to a divisor
        bq //= 2
    bq = max(bq, 1)
    qf = q.reshape(B * H, L, Dh)
    kf = k.reshape(B * H, L, Dh)
    vf = v.reshape(B * H, L, Dh)
    mf = additive_mask.reshape(B, 1, L)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=Dh ** -0.5),
        grid=(B * H, L // bq),
        in_specs=[
            pl.BlockSpec((1, bq, Dh), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, L, Dh), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, L, Dh), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda bh, i, H=H: (bh // H, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, Dh), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, L, Dh), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, mf)
    return out.reshape(B, H, L, Dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q, k, v, additive_mask, block_q: int = 512,
                    interpret: bool = False):
    """Fused attention: q/k/v [B, H, L, Dh], optional additive mask [B, L].

    Forward runs the Pallas kernel; backward re-derives via the XLA
    reference (recomputing the logits — the flash-style memory saving
    applies to the forward/frozen path; pair with Config.bert_remat for
    fine-tuning)."""
    return _fused_forward(q, k, v, additive_mask, block_q, interpret)


def _fwd(q, k, v, additive_mask, block_q, interpret):
    out = _fused_forward(q, k, v, additive_mask, block_q, interpret)
    return out, (q, k, v, additive_mask)


def _bwd(block_q, interpret, res, g):
    q, k, v, additive_mask = res
    if additive_mask is None:
        _, vjp = jax.vjp(lambda q, k, v: attention_reference(q, k, v, None), q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    _, vjp = jax.vjp(attention_reference, q, k, v, additive_mask)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)
