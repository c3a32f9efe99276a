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

Backward: a second Pallas kernel implements the standard flash backward —
recompute the softmax tile in VMEM from q/k/v (nothing but q/k/v/mask is
saved as residuals), then dV = PᵀdO, dS = P ⊙ (dO Vᵀ − rowsum(P ⊙ dO Vᵀ)),
dQ = s·dS K, dK = s·dSᵀQ — so the [L, L] logits never reach HBM in either
direction and fine-tuning keeps the forward's memory/bandwidth win.  Each
(batch, head) pair is one kernel instance owning its dq/dk/dv outputs
(no cross-instance accumulation); the [L, L] f32 tiles cost ~3 MB of VMEM
at L=512, well under the 16 MB scoped limit.
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


def _attn_bwd_math(q, k, v, m, do, scale: float):
    """Flash backward core for one (batch, head) tile: recompute the exact
    softmax from q/k/v (the [L, L] probabilities never touched HBM), then
    dV = Pᵀ dO ; dS = P ⊙ (dO Vᵀ − rowsum(P ⊙ dO Vᵀ)) ; dQ = s·dS K ;
    dK = s·dSᵀ Q.  ``m`` is the [1, L] additive mask (or None)."""
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if m is not None:
        logits = logits + m.astype(jnp.float32)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - mx)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # [Lq, Lk] f32
    dv = jax.lax.dot_general(
        p, do.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [Lk, Dh]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)  # [Lq, 1]
    ds = p * (dp - delta)  # [Lq, Lk] f32 (grad wrt pre-scale+mask logits)
    dq = jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    return dq, dk, dv, ds


def _attn_bwd_kernel(q_ref, k_ref, v_ref, m_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, dm_ref, *, scale: float):
    dq, dk, dv, ds = _attn_bwd_math(q_ref[0], k_ref[0], v_ref[0], m_ref[0],
                                    do_ref[0], scale)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    # mask broadcasts over heads and query rows, so its per-instance grad is
    # the row-sum of dS; the caller sums over heads
    dm_ref[0] = jnp.sum(ds, axis=0, keepdims=True).astype(dm_ref.dtype)


def _attn_bwd_kernel_nomask(q_ref, k_ref, v_ref, do_ref,
                            dq_ref, dk_ref, dv_ref, *, scale: float):
    # unmasked variant: no dm output, no zeros-mask input — the common
    # frozen/fine-tune path skips the cotangent entirely
    dq, dk, dv, _ = _attn_bwd_math(q_ref[0], k_ref[0], v_ref[0], None,
                                   do_ref[0], scale)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _fused_backward(q, k, v, additive_mask, g, interpret: bool):
    B, H, L, Dh = q.shape
    qf, kf, vf = (x.reshape(B * H, L, Dh) for x in (q, k, v))
    gf = g.reshape(B * H, L, Dh)
    full = lambda: pl.BlockSpec((1, L, Dh), lambda bh: (bh, 0, 0))
    if additive_mask is None:
        dq, dk, dv = pl.pallas_call(
            functools.partial(_attn_bwd_kernel_nomask, scale=Dh ** -0.5),
            grid=(B * H,),
            in_specs=[full(), full(), full(), full()],
            out_specs=[full(), full(), full()],
            out_shape=[jax.ShapeDtypeStruct((B * H, L, Dh), q.dtype)] * 3,
            interpret=interpret,
        )(qf, kf, vf, gf)
        dmask = None
    else:
        mf = additive_mask.reshape(B, 1, L)
        dq, dk, dv, dm = pl.pallas_call(
            functools.partial(_attn_bwd_kernel, scale=Dh ** -0.5),
            grid=(B * H,),
            in_specs=[full(), full(), full(),
                      pl.BlockSpec((1, 1, L), lambda bh, H=H: (bh // H, 0, 0)),
                      full()],
            out_specs=[full(), full(), full(),
                       pl.BlockSpec((1, 1, L), lambda bh: (bh, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct((B * H, L, Dh), q.dtype)] * 3
            + [jax.ShapeDtypeStruct((B * H, 1, L), jnp.float32)],
            interpret=interpret,
        )(qf, kf, vf, mf, gf)
        dmask = dm.reshape(B, H, L).sum(axis=1).astype(additive_mask.dtype)
    dq, dk, dv = (x.reshape(B, H, L, Dh) for x in (dq, dk, dv))
    return dq, dk, dv, dmask


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q, k, v, additive_mask, block_q: int = 512,
                    interpret: bool = False):
    """Fused attention: q/k/v [B, H, L, Dh], optional additive mask [B, L].

    Both directions run Pallas kernels: the forward emits the attention
    output in one VMEM pass; the backward recomputes the softmax tile from
    the saved q/k/v and produces dq/dk/dv (and the mask cotangent) without
    ever materializing the [L, L] logits in HBM."""
    return _fused_forward(q, k, v, additive_mask, block_q, interpret)


def _fwd(q, k, v, additive_mask, block_q, interpret):
    out = _fused_forward(q, k, v, additive_mask, block_q, interpret)
    return out, (q, k, v, additive_mask)


def _bwd(block_q, interpret, res, g):
    q, k, v, additive_mask = res
    return _fused_backward(q, k, v, additive_mask, g, interpret)


fused_attention.defvjp(_fwd, _bwd)
