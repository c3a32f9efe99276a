# -*- coding: utf-8 -*-
"""Pallas TPU kernel: fused DRIN GCN layer (entity side + edges + messages).

Reference hot loop: ``drin/model.py:121-153`` — per layer, 4 vertex updates
sharing one W_h/LayerNorm plus 4 dynamic scalar-edge updates.  XLA runs this
as a chain of ops that each round-trip the [B, C, D] entity vertices through
HBM; this kernel keeps a batch tile of et/ei resident in VMEM and emits in
ONE pass everything that touches them:

  * entity updates    et' = act(LN(W_h(et + tt*mt + it*mi)))
                      ei' = act(LN(W_h(ei + ti*mt + ii*mi)))
  * the mention-side messages (candidate means) the two [B, D] vertex
    updates need:  msg_mt = mean_C(tt*et) + mean_C(ti*ei),
                   msg_mi = mean_C(it*et) + mean_C(ii*ei)
  * the 4 dynamic edge updates in the folded form (bit-compatible with
    models/drin.py's algebraic fold of mean_D(w_u(u) * w_v(v))):
        a_u = u @ Ku + bu ;  p_u = a_u @ Kv^T ;  s_u = a_u . bv
        e'  = eact((p_u . v + s_u) / D + e)

so et/ei are read from HBM once and written once per layer.  The cheap
[B, D] mention transforms act(LN(W_h(mt + msg_mt))) stay in XLA.  Mosaic
block rules shape the layout: every operand keeps >= 3 dims with the last
two full-size ([.., C, D], [.., C, 1], [.., 1, D]) — 2D (tile, D) blocks
and lane->sublane reshapes don't lower (CLAUDE.md Pallas notes).

Equivalence vs the XLA path: tests/test_pallas.py.  Grads via custom VJP
(backward re-derives through :func:`gcn_layer_reference` — Pallas has no
automatic reverse-mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drin_tpu.nn.layers import get_activation
from drin_tpu.ops.pallas.gcn import _erf


def _act(name: str, x):
    if name == "gelu":
        # Mosaic lowers neither erf nor erfc: A&S 7.1.26 polynomial
        return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))
    return get_activation(name)(x)


def _layer_kernel(mt_ref, mi_ref, et_ref, ei_ref,
                  tt_ref, ti_ref, it_ref, ii_ref,
                  wh_ref, bh_ref, s_ref, lb_ref,
                  ku_ref, bu_ref, kvt_ref, bv_ref,
                  et_o, ei_o, tt_o, ti_o, it_o, ii_o, mtm_o, mim_o,
                  *, vact: str, eact: str, eps: float, dynamic: bool, bb: int):
    f32 = jnp.float32
    mt, mi = mt_ref[:], mi_ref[:]  # [BB, 1, D]
    et, ei = et_ref[:], ei_ref[:]  # [BB, C, D]
    tt, ti = tt_ref[:], ti_ref[:]  # [BB, C, 1]
    it, ii = it_ref[:], ii_ref[:]
    C, D = et.shape[1], mt.shape[-1]
    dt = et.dtype

    # Every cross-candidate/cross-channel reduction below runs on the MXU as
    # a dot_general — VPU reductions over [C, D] blocks were the kernel's
    # bottleneck (BASELINE.md round-2 notes):
    #   messages  sum_c e_c * V_c  ==  [2, C] @ [C, D]
    #   edge conv sum_d p_d * V_cd ==  [C, D] @ [D, 2]
    contract_c = (((0,), (0,)), ((), ()))  # [C, 2] x [C, D] -> [2, D]
    contract_d = (((1,), (1,)), ((), ()))  # [C, D] x [2, D] -> [C, 2]

    if dynamic:
        a_mt = (jax.lax.dot_general(mt, ku_ref[:], (((2,), (0,)), ((), ())),
                                    preferred_element_type=f32) + bu_ref[0])  # [BB,1,D]
        a_mi = (jax.lax.dot_general(mi, ku_ref[:], (((2,), (0,)), ((), ())),
                                    preferred_element_type=f32) + bu_ref[0])
        p_mt = jax.lax.dot_general(a_mt, kvt_ref[:], (((2,), (0,)), ((), ())),
                                   preferred_element_type=f32)  # [BB,1,D]
        p_mi = jax.lax.dot_general(a_mi, kvt_ref[:], (((2,), (0,)), ((), ())),
                                   preferred_element_type=f32)
        s_mt = jnp.sum(a_mt * bv_ref[0], axis=-1, keepdims=True)  # [BB,1,1]
        s_mi = jnp.sum(a_mi * bv_ref[0], axis=-1, keepdims=True)

    for j in range(bb):  # static unroll: 2D MXU ops per batch row
        E, F = et[j], ei[j]  # [C, D]
        eE = jnp.concatenate([tt[j], it[j]], axis=1).astype(dt)  # [C, 2]
        eF = jnp.concatenate([ti[j], ii[j]], axis=1).astype(dt)
        # mention messages: rows are sum_c (edge * vertex) for (mt, mi)
        msg = (jax.lax.dot_general(eE, E, contract_c, preferred_element_type=f32)
               + jax.lax.dot_general(eF, F, contract_c, preferred_element_type=f32)) / C
        mtm_o[j] = msg[0:1]
        mim_o[j] = msg[1:2]

        # entity vertex updates (per-row 2D matmuls: Mosaic schedules these
        # better than one rank-3 contraction — measured, BASELINE.md)
        x_E = (E + tt[j] * mt[j] + it[j] * mi[j]).astype(dt)
        x_F = (F + ti[j] * mt[j] + ii[j] * mi[j]).astype(dt)
        for x, out in ((x_E, et_o), (x_F, ei_o)):
            h = jnp.dot(x, wh_ref[:], preferred_element_type=f32) + bh_ref[0][None, :]
            mu = jnp.mean(h, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
            ln = (h - mu) * jax.lax.rsqrt(var + eps)
            ln = ln * s_ref[0][None, :] + lb_ref[0][None, :]
            out[j] = _act(vact, ln).astype(out.dtype)

        # dynamic edge updates (OLD vertices): conv columns are (p_mt, p_mi)
        if dynamic:
            P = jnp.concatenate([p_mt[j], p_mi[j]], axis=0).astype(dt)  # [2, D]
            cE = jax.lax.dot_general(E, P, contract_d, preferred_element_type=f32)  # [C, 2]
            cF = jax.lax.dot_general(F, P, contract_d, preferred_element_type=f32)
            tt_o[j] = _act(eact, (cE[:, 0:1] + s_mt[j]) / D + tt[j]).astype(tt_o.dtype)
            it_o[j] = _act(eact, (cE[:, 1:2] + s_mi[j]) / D + it[j]).astype(it_o.dtype)
            ti_o[j] = _act(eact, (cF[:, 0:1] + s_mt[j]) / D + ti[j]).astype(ti_o.dtype)
            ii_o[j] = _act(eact, (cF[:, 1:2] + s_mi[j]) / D + ii[j]).astype(ii_o.dtype)
    if not dynamic:
        tt_o[:], ti_o[:], it_o[:], ii_o[:] = tt, ti, it, ii


def fused_gcn_layer(vertexes, edges, wh, bh, ln_scale, ln_bias,
                    ku=None, bu=None, kv=None, bv=None,
                    vact: str = "gelu", eact: str = "sigmoid", eps: float = 1e-5,
                    dynamic: bool = True, block_b: int = 4, interpret: bool = False):
    """One GCN layer on TPU: (vertexes [mt, mi, et, ei], edges [tt, ti, it,
    ii] as [B, C]) -> (new vertexes, new edges).

    Scalar-edge, shared-W_h semantics of models/drin.GCNLayer (the default
    DRIN config).  The kernel produces et'/ei', the new edges and the
    mention messages; the two [B, D] mention transforms are finished here in
    XLA (cheap, and 2D blocks don't lower)."""
    mt, mi, et, ei = vertexes
    B, C, D = et.shape
    while B % block_b and block_b > 1:
        block_b //= 2
    grid = (B // block_b,)
    dt = et.dtype
    edt = edges[0].dtype
    ecol = [e[..., None] for e in edges]  # [B, C, 1]
    f32 = jnp.float32
    kvt = kv.T if kv is not None else jnp.zeros((D, D), dt)
    ku = ku if ku is not None else jnp.zeros((D, D), dt)
    bu = bu if bu is not None else jnp.zeros((D,), dt)
    bv = bv if bv is not None else jnp.zeros((D,), dt)

    bd = lambda *shape: pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                                     memory_space=pltpu.VMEM)
    w2 = lambda: pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w1 = lambda: pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bb = block_b

    kern = functools.partial(_layer_kernel, vact=vact, eact=eact, eps=eps,
                             dynamic=dynamic, bb=bb)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            bd(bb, 1, D), bd(bb, 1, D),            # mt, mi (as [B, 1, D])
            bd(bb, C, D), bd(bb, C, D),            # et, ei
            bd(bb, C, 1), bd(bb, C, 1),            # tt, ti
            bd(bb, C, 1), bd(bb, C, 1),            # it, ii
            w2(), w1(), w1(), w1(),                # wh, bh, ln scale/bias
            w2(), w1(), w2(), w1(),                # ku, bu, kv^T, bv
        ],
        out_specs=[
            bd(bb, C, D), bd(bb, C, D),
            bd(bb, C, 1), bd(bb, C, 1), bd(bb, C, 1), bd(bb, C, 1),
            bd(bb, 1, D), bd(bb, 1, D),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C, D), dt), jax.ShapeDtypeStruct((B, C, D), dt),
            jax.ShapeDtypeStruct((B, C, 1), edt), jax.ShapeDtypeStruct((B, C, 1), edt),
            jax.ShapeDtypeStruct((B, C, 1), edt), jax.ShapeDtypeStruct((B, C, 1), edt),
            jax.ShapeDtypeStruct((B, 1, D), f32), jax.ShapeDtypeStruct((B, 1, D), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * D * (2 * C + 4) + 16 * B * C * D,
            bytes_accessed=(4 * B * C * D + 3 * D * D) * dt.itemsize,
            transcendentals=2 * B * C * D,
        ),
        interpret=interpret,
    )(mt[:, None, :], mi[:, None, :], et, ei, *ecol,
      wh, bh[None, :], ln_scale[None, :], ln_bias[None, :],
      ku, bu[None, :], kvt, bv[None, :])
    et2, ei2, tt2, ti2, it2, ii2, mtm, mim = outs

    # finish the two mention vertices in XLA (shared W_h / LayerNorm)
    def norm_act(h):
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
        ln = (h - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
        return _act_xla(vact, ln)

    def whf(x):
        return jnp.dot(x, wh.astype(x.dtype), preferred_element_type=f32) + bh

    mt2 = norm_act(whf((mt.astype(f32) + mtm[:, 0]).astype(dt))).astype(dt)
    mi2 = norm_act(whf((mi.astype(f32) + mim[:, 0]).astype(dt))).astype(dt)
    return [mt2, mi2, et2, ei2], [e[..., 0] for e in (tt2, ti2, it2, ii2)]


def _act_xla(name: str, x):
    return get_activation(name)(x)


def gcn_layer_reference(vertexes, edges, wh, bh, ln_scale, ln_bias,
                        ku=None, bu=None, kv=None, bv=None,
                        vact: str = "gelu", eact: str = "sigmoid",
                        eps: float = 1e-5, dynamic: bool = True):
    """Pure-XLA ground truth with the kernel's exact semantics (also the
    backward pass of :func:`fused_gcn_layer_ad`)."""
    mt, mi, et, ei = vertexes
    tt, ti, it, ii = edges
    D = mt.shape[-1]
    va, ea = get_activation(vact), get_activation(eact)
    f32 = jnp.float32
    dt = et.dtype

    def norm_act(h):
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
        ln = (h - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
        return va(ln)

    def whf(x):
        return jnp.dot(x, wh.astype(x.dtype), preferred_element_type=f32) + bh

    col = lambda e: e[..., None]
    x_mt = (mt.astype(f32) + jnp.mean(col(tt) * et, 1) + jnp.mean(col(ti) * ei, 1)).astype(dt)
    x_mi = (mi.astype(f32) + jnp.mean(col(it) * et, 1) + jnp.mean(col(ii) * ei, 1)).astype(dt)
    x_et = (et + col(tt) * mt[:, None, :] + col(it) * mi[:, None, :]).astype(dt)
    x_ei = (ei + col(ti) * mt[:, None, :] + col(ii) * mi[:, None, :]).astype(dt)
    nv = [norm_act(whf(x)).astype(dt) for x in (x_mt, x_mi, x_et, x_ei)]
    if not dynamic:
        return nv, [tt, ti, it, ii]
    ne = []
    for u, pairs in ((mt, (tt, ti)), (mi, (it, ii))):
        a = jnp.dot(u, ku.astype(u.dtype), preferred_element_type=f32) + bu
        p = jnp.dot(a.astype(dt), kv.T.astype(dt), preferred_element_type=f32)
        s = jnp.sum(a * bv, axis=-1)
        for e, v in zip(pairs, (et, ei)):
            conv = (jnp.einsum("bd,bcd->bc", p.astype(dt), v,
                               preferred_element_type=f32) + s[:, None]) / D
            ne.append(ea(conv + e).astype(e.dtype))
    return nv, [ne[0], ne[1], ne[2], ne[3]]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_ad(meta, mt, mi, et, ei, tt, ti, it, ii, wh, bh, sc, lb, ku, bu, kv, bv):
    vact, eact, eps, dynamic, block_b = meta
    return fused_gcn_layer([mt, mi, et, ei], [tt, ti, it, ii], wh, bh, sc, lb,
                           ku, bu, kv, bv, vact=vact, eact=eact, eps=eps,
                           dynamic=dynamic, block_b=block_b)


def _fused_ad_fwd(meta, *args):
    return _fused_ad(meta, *args), args


def _fused_ad_bwd(meta, res, g):
    vact, eact, eps, dynamic, _ = meta

    def ref(mt, mi, et, ei, tt, ti, it, ii, wh, bh, sc, lb, ku, bu, kv, bv):
        return gcn_layer_reference([mt, mi, et, ei], [tt, ti, it, ii], wh, bh,
                                   sc, lb, ku, bu, kv, bv, vact=vact,
                                   eact=eact, eps=eps, dynamic=dynamic)

    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


_fused_ad.defvjp(_fused_ad_fwd, _fused_ad_bwd)


def fused_gcn_layer_ad(vertexes, edges, wh, bh, ln_scale, ln_bias,
                       ku=None, bu=None, kv=None, bv=None,
                       vact: str = "gelu", eact: str = "sigmoid",
                       eps: float = 1e-5, dynamic: bool = True, block_b: int = 4):
    """Differentiable entry: Pallas kernel forward, XLA-derived backward."""
    D = vertexes[0].shape[-1]
    dt = vertexes[2].dtype
    z2 = jnp.zeros((D, D), dt)
    z1 = jnp.zeros((D,), dt)
    meta = (vact, eact, eps, dynamic, block_b)
    return _fused_ad(meta, *vertexes, *edges, wh, bh, ln_scale, ln_bias,
                     ku if ku is not None else z2, bu if bu is not None else z1,
                     kv if kv is not None else z2, bv if bv is not None else z1)
