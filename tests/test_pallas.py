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


def test_drin_pallas_model_dispatch_executes(wd_cfg, monkeypatch):
    """Drive the MODEL's own fused-kernel dispatch (drin.py use_layer_fused:
    param wiring of w_h/layer_norm/w_u/w_v into fused_gcn_layer_ad) — not
    just the standalone kernel: force the backend gate open and run the
    kernel in interpret mode on CPU.  A swapped scale/bias or wrong kernel
    ordering in the dispatch would pass every other test (the CPU suite
    never reaches this branch) and only break on real TPUs."""
    import functools

    from drin_tpu.data.dataset import MELFeatureDataset
    from drin_tpu.models.drin import DRIN
    from drin_tpu.ops.pallas import gcn_layer as gl

    ds = MELFeatureDataset(wd_cfg, "train")
    batch = next(ds.batches(4, kind="drin"))
    cfg = wd_cfg.replace(use_pallas=False)
    m1 = DRIN(cfg)
    params = m1.init(jax.random.key(0), batch[:-1])["params"]
    want = np.asarray(m1.apply({"params": params}, batch[:-1]))

    calls = []
    orig = gl.fused_gcn_layer

    def interp(*a, **kw):
        calls.append(1)
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(gl, "fused_gcn_layer", interp)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    m2 = DRIN(cfg.replace(use_pallas=True))
    got = np.asarray(m2.apply({"params": params}, batch[:-1]))
    assert len(calls) >= 1, "the model's fused dispatch never fired"
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def _gcn_layer_setup(seed=0, B=4, C=11, D=32, **cfg_kw):
    from drin_tpu.data.synthetic import tiny_config
    from drin_tpu.models.drin import GCNLayer

    cfg = tiny_config("wikidiverse", "drin").replace(
        num_candidates_data=C - 1, gcn_embed_dim=D, **cfg_kw)
    rng = np.random.default_rng(seed)
    mk = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.5
    vertexes = [mk(B, D), mk(B, D), mk(B, C, D), mk(B, C, D)]
    edges = [mk(B, C) for _ in range(4)]
    layer = GCNLayer(cfg)
    params = layer.init(jax.random.key(1), vertexes, edges)["params"]
    return cfg, layer, params, vertexes, edges


def _fused_from_params(cfg, params, vertexes, edges, dynamic):
    import functools
    from drin_tpu.ops.pallas import gcn_layer as G

    wh = params["w_h"]["Dense_0"]
    ln = params["layer_norm"]
    extra = ((params["w_u_kernel"], params["w_u_bias"],
              params["w_v_kernel"], params["w_v_bias"]) if dynamic
             else (None, None, None, None))
    return functools.partial(
        G.fused_gcn_layer, vertexes, edges, wh["kernel"], wh["bias"],
        ln["scale"], ln["bias"], *extra,
        vact=cfg.gcn_vertex_activation, eact=cfg.gcn_edge_activation,
        dynamic=dynamic)


@pytest.mark.parametrize("edge_type", ["dynamic", "static"])
def test_fused_gcn_layer_matches_gcnlayer(edge_type):
    """The full-layer Pallas kernel (interpret mode) must reproduce the real
    GCNLayer module's vertex AND edge outputs with the same params."""
    cfg, layer, params, vertexes, edges = _gcn_layer_setup(gcn_edge_type=edge_type)
    nv_ref, ne_ref = layer.apply({"params": params}, vertexes, edges)
    nv, ne = _fused_from_params(cfg, params, vertexes, edges,
                                dynamic=(edge_type == "dynamic"))(interpret=True)
    for a, b in zip(nv_ref, nv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
    for a, b in zip(ne_ref, ne):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


def test_fused_gcn_layer_respects_ablation_mask():
    """gcn_edge_enabled zeroes edges BEFORE the kernel (done by the caller);
    a masked fused layer equals the masked XLA layer."""
    cfg, layer, params, vertexes, edges = _gcn_layer_setup(
        seed=2, gcn_edge_enabled=(1, 0, 1, 0))
    nv_ref, ne_ref = layer.apply({"params": params}, vertexes, edges)
    masked = [e * m for e, m in zip(edges, cfg.gcn_edge_enabled)]
    nv, ne = _fused_from_params(cfg, params, vertexes, masked, dynamic=True)(interpret=True)
    for a, b in zip(nv_ref, nv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
    for a, b in zip(ne_ref, ne):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


def test_fused_gcn_layer_grads_match_reference():
    """Grads flow through the custom VJP (XLA-derived backward) and match
    differentiating the pure-XLA reference directly."""
    import functools
    from drin_tpu.ops.pallas import gcn_layer as G

    cfg, layer, params, vertexes, edges = _gcn_layer_setup(seed=3)
    wh = params["w_h"]["Dense_0"]
    ln = params["layer_norm"]
    extra = (params["w_u_kernel"], params["w_u_bias"],
             params["w_v_kernel"], params["w_v_bias"])
    orig = G.fused_gcn_layer
    G.fused_gcn_layer = functools.partial(orig, interpret=True)
    try:
        def loss_fused(k, et):
            nv, ne = G.fused_gcn_layer_ad(
                [vertexes[0], vertexes[1], et, vertexes[3]], edges,
                k, wh["bias"], ln["scale"], ln["bias"], *extra)
            return sum(jnp.sum(x * x) for x in nv) + sum(jnp.sum(e) for e in ne)

        def loss_ref(k, et):
            nv, ne = G.gcn_layer_reference(
                [vertexes[0], vertexes[1], et, vertexes[3]], edges,
                k, wh["bias"], ln["scale"], ln["bias"], *extra)
            return sum(jnp.sum(x * x) for x in nv) + sum(jnp.sum(e) for e in ne)

        g1 = jax.grad(loss_fused, argnums=(0, 1))(wh["kernel"], vertexes[2])
        g2 = jax.grad(loss_ref, argnums=(0, 1))(wh["kernel"], vertexes[2])
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    finally:
        G.fused_gcn_layer = orig


# ---------------------------------------------------------------------------
# fused attention (ops/pallas/attention.py)


@pytest.mark.parametrize("masked", [True, False])
@pytest.mark.parametrize("shape", [(2, 3, 64, 16), (1, 2, 128, 64), (2, 2, 40, 8)])
def test_fused_attention_matches_reference(masked, shape):
    """Kernel (interpret mode) == XLA softmax attention, with and without
    padding masks, incl. an L that needs block-size shrinking (40)."""
    from drin_tpu.ops.pallas.attention import attention_reference, fused_attention

    B, H, L, Dh = shape
    rng = np.random.default_rng(0)
    q, k, v = (rng.standard_normal((B, H, L, Dh)).astype(np.float32) for _ in range(3))
    mask = None
    if masked:
        lens = rng.integers(L // 2, L + 1, B)
        mask = np.where(np.arange(L)[None] < lens[:, None], 0.0,
                        np.finfo(np.float32).min).astype(np.float32)
    got = np.asarray(fused_attention(q, k, v, mask, 128, True))
    want = np.asarray(attention_reference(q, k, v, mask))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_attention_bf16():
    from drin_tpu.ops.pallas.attention import attention_reference, fused_attention

    rng = np.random.default_rng(1)
    q, k, v = (rng.standard_normal((2, 2, 64, 32)).astype(jnp.bfloat16) for _ in range(3))
    got = np.asarray(fused_attention(q, k, v, None, 128, True), np.float32)
    want = np.asarray(attention_reference(q, k, v, None), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fused_attention_grads_match_reference():
    """custom_vjp backward (XLA re-derivation) == grads of the reference."""
    from drin_tpu.ops.pallas.attention import attention_reference, fused_attention

    rng = np.random.default_rng(2)
    q, k, v = (rng.standard_normal((2, 2, 32, 16)).astype(np.float32) for _ in range(3))
    mask = np.where(np.arange(32)[None] < np.array([[20], [32]]), 0.0,
                    np.finfo(np.float32).min).astype(np.float32)

    loss_f = lambda q, k, v: jnp.sum(fused_attention(q, k, v, mask, 128, True) ** 2)
    loss_r = lambda q, k, v: jnp.sum(attention_reference(q, k, v, mask) ** 2)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_attention_backward_kernel_unmasked_and_mask_cotangent():
    """The Pallas backward kernel (no XLA re-derivation): unmasked grads and
    the additive-mask cotangent both match the reference VJP."""
    from drin_tpu.ops.pallas.attention import attention_reference, fused_attention

    rng = np.random.default_rng(3)
    q, k, v = (rng.standard_normal((2, 2, 32, 16)).astype(np.float32) for _ in range(3))
    # unmasked: the backward must return None for the absent mask
    loss_f = lambda q, k, v: jnp.sum(fused_attention(q, k, v, None, 128, True) ** 2)
    loss_r = lambda q, k, v: jnp.sum(attention_reference(q, k, v, None) ** 2)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    # differentiable mask: cotangent flows through the kernel's dS row-sums
    mask = (rng.standard_normal((2, 32)) * 0.1).astype(np.float32)
    gm_f = jax.grad(lambda m: jnp.sum(fused_attention(q, k, v, m, 128, True) ** 2))(mask)
    gm_r = jax.grad(lambda m: jnp.sum(attention_reference(q, k, v, m) ** 2))(mask)
    np.testing.assert_allclose(np.asarray(gm_f), np.asarray(gm_r), rtol=1e-4, atol=1e-5)


def test_fused_attention_backward_bf16():
    """bf16 inputs: backward kernel grads track the reference within bf16
    tolerance (intermediates are f32 in both paths)."""
    from drin_tpu.ops.pallas.attention import attention_reference, fused_attention

    rng = np.random.default_rng(4)
    q, k, v = (rng.standard_normal((1, 2, 64, 32)).astype(jnp.bfloat16) for _ in range(3))
    loss_f = lambda q, k, v: jnp.sum(fused_attention(q, k, v, None, 128, True).astype(jnp.float32) ** 2)
    loss_r = lambda q, k, v: jnp.sum(attention_reference(q, k, v, None).astype(jnp.float32) ** 2)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=5e-2, atol=5e-2)


def test_bert_fused_attention_end_to_end():
    """BertModel(fused_attention=True) == the einsum path (interpret mode),
    through the full GHMFCOnline forward."""
    from unittest import mock

    import drin_tpu.encoders.bert as EB
    import drin_tpu.ops.pallas.attention as A
    from drin_tpu.data.synthetic import tiny_config
    from drin_tpu.encoders.bert import BertConfig
    from drin_tpu.models.ghmfc import GHMFCOnline

    B, C, Le, Lm = 2, 3, 8, 16
    base = tiny_config("wikimel", "ghmfc").replace(
        num_candidates_data=C - 1, online_bert=True, num_entity_sentence=0,
        finetune_bert=False, mention_final_layer_name="linear",
        max_mention_sentence_len=8)
    bert_cfg = BertConfig(vocab_size=32, hidden_size=16, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=32,
                          max_position_embeddings=32)
    rng = np.random.default_rng(5)
    feats = (rng.integers(1, 32, (B, Lm)).astype(np.int64), np.ones((B, Lm), np.int64),
             np.ones((B,), np.int64), np.full((B,), 3, np.int64),
             np.zeros((B,), np.float32), rng.integers(1, 32, (B, C, Le)).astype(np.int64),
             np.ones((B, C, Le), np.int64), np.zeros((B,), np.int64),
             np.zeros((B,), np.float32))
    plain = GHMFCOnline(base, bert_cfg)
    params = plain.init(jax.random.key(0), feats)["params"]
    want = np.asarray(plain.apply({"params": params}, feats))

    fused_model = GHMFCOnline(base.replace(bert_fused_attention=True), bert_cfg)
    orig = A.fused_attention
    calls = []

    def interp(q, k, v, m, bq=128, _i=False):
        calls.append(q.shape)
        return orig(q, k, v, m, bq, True)

    with mock.patch.object(A, "fused_attention", interp), \
         mock.patch.object(EB, "FUSED_ATTENTION_MIN_LEN", 8):
        got = np.asarray(fused_model.apply({"params": params}, feats))
    assert calls, "fused kernel was never invoked"
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
