# -*- coding: utf-8 -*-
"""DRIN: Dynamic Relation Interactive Network, TPU-native.

Re-design of the reference model (``/root/reference/drin/model.py``): a
4-vertex / 4-edge-type relation graph per mention-candidate pair, refined by
L dynamic GCN layers, scored by cosine matching of the text vertices.

Differences from the reference implementation (same numerics, TPU shape):
  * the EdgeEncoder's Tm x Te object-pair Python loop (model.py:84-92) is one
    einsum (``ops.object_pair_similarity``),
  * the per-sample span-average loops (ghmfc.py:54-60) and per-candidate
    entity pooling loops (ghmfc.py:245-249) are masked einsums,
  * all four vertex updates and four edge updates of a GCN layer are batched
    dense ops over the padded [B, C, D] tensor — XLA fuses them; a Pallas
    fused kernel is available behind ``cfg.use_pallas``.

Vertex order: [mt, mi, et, ei]; edge order: [tt, ti, it, ii]
(reference model.py:105-107).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from drin_tpu.common.config import Config
from drin_tpu.nn.layers import (
    LayerNorm,
    Linear,
    get_activation,
    torch_linear_bias_init,
    torch_linear_kernel_init,
)
from drin_tpu.ops.core import cosine_similarity, object_pair_similarity, span_mean

# one stacked matmul+LN for the GCN's 4 vertex updates vs 4 separate calls —
# numerically identical (row-wise ops) but measured 20% SLOWER on-chip (the
# concat materializes a [B, 2C+2, D] copy that outweighs the matmul batching;
# BASELINE.md), so it stays off; kept as documentation of the explored space
_STACK_VERTEX_UPDATES = False


class VertexEncoder(nn.Module):
    """Produce the four vertex sets (reference model.py:13-46):
    mt [B,D], mi [B,D], et [B,C,D], ei [B,C,D]."""

    cfg: Config

    @nn.compact
    def __call__(
        self,
        mention_text_feature,  # [B, L, Dt]
        mention_text_mask,  # [B, L]
        mention_start_pos,  # [B]
        mention_end_pos,  # [B]
        mention_image_feature,  # [B, R, Dr]
        entity_text_feature,  # [B, C, Le, Dt] (wikimel) | [B, C, Dt] (wikidiverse)
        entity_text_mask,  # [B, C, Le] | unused
        entity_image_feature,  # [B, C, 1, Dr] | [B, C, Dr]
        deterministic: bool = True,
    ):
        cfg = self.cfg
        # text vertices reuse GHMFC's mention/entity encoders exactly like
        # the reference (model.py:21-22): the full configuration space
        # (linear / transformer / none x avg-extract / max-pool) applies
        from drin_tpu.models.ghmfc import EntityEncoder, MentionEncoder

        mt = MentionEncoder(cfg, name="mention_text_encoder")(
            mention_text_feature, mention_text_mask, mention_start_pos,
            mention_end_pos, None, deterministic,
        )
        et = EntityEncoder(cfg, name="entity_text_encoder")(
            entity_text_feature, entity_text_mask, None
        )
        # image vertices: mean-pool regions then project (model.py:41-45)
        mi = Linear(cfg.gcn_embed_dim, name="mention_image_linear")(
            jnp.mean(mention_image_feature, axis=-2)
        )
        if cfg.entity_projected:
            # [B, C, Dg]: pooled+projected once at table build
            # (data/device_store.project_drin_tables)
            ei = entity_image_feature
        else:
            if entity_image_feature.ndim == 4:
                entity_image_feature = jnp.mean(entity_image_feature, axis=-2)
            ei = Linear(cfg.gcn_embed_dim, name="entity_image_linear")(entity_image_feature)
        return [mt, mi, et, ei]


class EdgeEncoder(nn.Module):
    """Same-modality edge weights (reference model.py:49-94): mtet from text
    cosine, miei from score-weighted object-pair cosine."""

    cfg: Config

    def __call__(
        self,
        mention_text_feature,
        mention_start_pos,
        mention_end_pos,
        mention_object_feature,  # [B, Tm, Dr] (or [B, Tm, k, Dr] -> meaned)
        mention_object_score,  # [B, Tm]
        entity_text_feature,
        entity_object_feature,  # [B, C, Te, Dr] (or [B, C, Te, k, Dr])
        entity_object_score,  # [B, C, Te]
    ):
        cfg = self.cfg
        # mtet: cosine(raw mention repr, entity CLS/pooled text)
        # (model.py:71-76; the final-repr fn follows
        # mention_final_representation: span-avg for drin's default
        # "avg extract", max-pool otherwise — ghmfc.py:192-199)
        if cfg.mention_final_representation == "max pool":
            m = jnp.max(mention_text_feature, axis=1)  # [B, Dt]
        else:
            m = span_mean(mention_text_feature, mention_start_pos, mention_end_pos)  # [B, Dt]
        if cfg.entity_pooling_cached:
            e = entity_text_feature[:, :, 1]  # precomputed CLS slot
        elif entity_text_feature.ndim == 4:
            e = entity_text_feature[:, :, 0]
        else:
            e = entity_text_feature
        mtet = cosine_similarity(jnp.broadcast_to(m[:, None, :], e.shape), e)  # [B, C]

        if mention_object_feature.ndim == 4:
            mention_object_feature = jnp.mean(mention_object_feature, axis=-2)
        if entity_object_feature.ndim == 5:
            entity_object_feature = jnp.mean(entity_object_feature, axis=-2)
        miei = object_pair_similarity(
            mention_object_feature, mention_object_score, entity_object_feature, entity_object_score
        )
        return mtet, miei


class GCNLayer(nn.Module):
    """One relation-interaction layer (reference model.py:97-153).

    The bipartite relation graph is hard-coded:
      vertex u <- [(edge, neighbor)]: mt<-[(tt,et),(ti,ei)] mi<-[(it,et),(ii,ei)]
                                      et<-[(tt,mt),(it,mi)] ei<-[(ti,mt),(ii,mi)]
      edge e  <- (u, v) endpoints:    tt=(mt,et) ti=(mt,ei) it=(mi,et) ii=(mi,ei)
    """

    cfg: Config

    vertex_graph = ((0, 2), (1, 3)), ((2, 2), (3, 3)), ((0, 0), (2, 1)), ((1, 0), (3, 1))
    edge_graph = ((0, 2), (0, 3), (1, 2), (1, 3))

    @nn.compact
    def __call__(self, vertexes, edges):
        cfg = self.cfg
        C = cfg.num_candidates_model
        D = cfg.gcn_embed_dim
        vector = cfg.gcn_edge_feature == "vector"
        vact = get_activation(cfg.gcn_vertex_activation)
        eact = get_activation(cfg.gcn_edge_activation)

        # per-edge ablation mask (model.py:122)
        edges = [e * m for e, m in zip(edges, cfg.gcn_edge_enabled)]

        # candidate padding (parallel/mesh.pad_candidates_to shards a prime C
        # over the model axis): fake candidates' edges are zeroed every layer
        # so they contribute nothing to the cross-candidate means below, and
        # the mean divides by the REAL count — exactly the unpadded math
        Cp = vertexes[2].shape[1]
        if Cp > C:
            cmask = (jnp.arange(Cp) < C).astype(edges[0].dtype)
            cm = cmask[None, :, None] if vector else cmask[None, :]
            edges = [e * cm for e in edges]

        w_h = Linear(D, name="w_h")
        layer_norm = LayerNorm(name="layer_norm")  # shared by all 4 updates

        def conv_vertex(e, v):
            # scalar edges broadcast to D (model.py:139-146)
            ef = e if vector else e[..., None]
            if v.ndim == 3:  # mention <- entity: average message over candidates
                return jnp.sum(ef * v, axis=1) / C
            return ef * v[:, None, :]  # entity <- mention: broadcast

        # Pallas full-layer fusion (scalar edges): ALL 4 vertex updates + the
        # 4 folded dynamic edge updates in one kernel, so et/ei read HBM once
        # per layer (ops/pallas/gcn_layer.py; grads via its custom VJP whose
        # backward is the XLA math below)
        dynamic_scalar = cfg.gcn_edge_type == "dynamic" and not vector
        if dynamic_scalar:
            ku = self.param("w_u_kernel", torch_linear_kernel_init, (D, D))
            bu = self.param("w_u_bias", torch_linear_bias_init(D), (D,))
            kv = self.param("w_v_kernel", torch_linear_kernel_init, (D, D))
            bv = self.param("w_v_bias", torch_linear_bias_init(D), (D,))
        use_layer_fused = (
            cfg.use_pallas
            and not vector
            and Cp == C  # the kernel's candidate mean assumes no padding
            and jax.default_backend() == "tpu"
            and not self.is_initializing()
            and cfg.gcn_vertex_activation in ("gelu", "relu", "tanh", "sigmoid")
            and cfg.gcn_edge_activation in ("sigmoid", "tanh", "relu", "identity")
        )
        if use_layer_fused:
            from drin_tpu.ops.pallas.gcn_layer import fused_gcn_layer_ad

            dt = vertexes[2].dtype
            wh_p = self.variables["params"]["w_h"]["Dense_0"]
            ln_p = self.variables["params"]["layer_norm"]
            return fused_gcn_layer_ad(
                vertexes, edges,
                wh_p["kernel"].astype(dt), wh_p["bias"].astype(dt),
                ln_p["scale"].astype(dt), ln_p["bias"].astype(dt),
                *((ku.astype(dt), bu.astype(dt), kv.astype(dt), bv.astype(dt))
                  if dynamic_scalar else (None, None, None, None)),
                vact=cfg.gcn_vertex_activation, eact=cfg.gcn_edge_activation,
                dynamic=dynamic_scalar, block_b=cfg.pallas_block_b,
            )

        aggs = []
        for u, neighbors in zip(vertexes, self.vertex_graph):
            agg = u
            for ei_, vi in neighbors:
                agg = agg + conv_vertex(edges[ei_], vertexes[vi])
            aggs.append(agg)
        if _STACK_VERTEX_UPDATES:
            # one matmul+LN for all 4 vertex updates (W_h/LN are shared and
            # row-wise, so stacking the aggregates along rows is exact)
            Cp_ = aggs[2].shape[1]
            big = jnp.concatenate(
                [aggs[0][:, None], aggs[1][:, None], aggs[2], aggs[3]], axis=1)
            h = vact(layer_norm(w_h(big)))
            new_vertexes = [h[:, 0], h[:, 1], h[:, 2 : 2 + Cp_], h[:, 2 + Cp_ :]]
        else:
            new_vertexes = [vact(layer_norm(w_h(a))) for a in aggs]

        if cfg.gcn_edge_type == "dynamic":
            # edge updates read the OLD (masked-edge, pre-update) vertexes
            # (model.py:130-134)
            new_edges = []
            if vector:
                w_u = Linear(D // 2, name="w_u")
                w_v = Linear(D // 2, name="w_v")
                w_m = Linear(D, name="w_m")
                for e, (ui, vi) in zip(edges, self.edge_graph):
                    u, v = vertexes[ui], vertexes[vi]
                    fu = w_u(u)[:, None, :]  # [B,1,D'] broadcast over candidates
                    conv = jnp.concatenate(
                        [jnp.broadcast_to(fu, (*v.shape[:2], fu.shape[-1])), w_v(v)], axis=-1
                    )
                    new_edges.append(eact(w_m(conv + e)))
            else:
                # scalar edges: conv = mean_D(w_u(u) ⊙ w_v(v)).  Since u is a
                # [B, D] mention vertex and v a [B, C, D] entity vertex, fold
                # algebraically:  with a = u·Ku + bu,
                #   mean(a ⊙ (v·Kv + bv)) = ((a·Kvᵀ)·v + a·bv) / D
                # — one [B, D] projection + a dot instead of a full
                # [B, C, D] x [D, D] matmul per edge (~30x fewer FLOPs,
                # bit-compatible up to float reassociation).
                # (ku/bu/kv/bv were declared above, shared with the fused path)
                proj = {}
                for ui in (0, 1):  # the two mention vertices
                    a = vertexes[ui] @ ku + bu  # [B, D]
                    proj[ui] = (a @ kv.T, a @ bv)  # ([B, D], [B])
                for e, (ui, vi) in zip(edges, self.edge_graph):
                    p, s = proj[ui]
                    v = vertexes[vi]
                    conv = (jnp.einsum("bd,bcd->bc", p, v) + s[:, None]) / D
                    new_edges.append(eact(conv + e))
        else:
            new_edges = edges
        return new_vertexes, new_edges


class DRIN(nn.Module):
    """Full DRIN forward (reference Model, model.py:156-209).

    Input: the 14-tensor batch (DrinBatch minus the answer).
    Output: cosine scores [B, C]."""

    cfg: Config

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        cfg = self.cfg
        (
            mention_text_feature,
            mention_text_mask,
            mention_start_pos,
            mention_end_pos,
            mention_image_feature,
            mention_object_feature,
            mention_object_score,
            entity_text_feature,
            entity_text_mask,
            entity_image_feature,
            entity_object_feature,
            entity_object_score,
            miet_similarity,
            mtei_similarity,
        ) = batch
        vertexes = VertexEncoder(cfg, name="vertex_encoder")(
            mention_text_feature,
            mention_text_mask,
            mention_start_pos,
            mention_end_pos,
            mention_image_feature,
            entity_text_feature,
            entity_text_mask,
            entity_image_feature,
            deterministic,
        )
        mtet, miei = EdgeEncoder(cfg, name="edge_encoder")(
            mention_text_feature,
            mention_start_pos,
            mention_end_pos,
            mention_object_feature,
            mention_object_score,
            entity_text_feature,
            entity_object_feature,
            entity_object_score,
        )
        # edge order (tt, ti, it, ii); CLIP logits scaled by 1/100
        # (model.py:201-204)
        edges = [mtet, mtei_similarity / 100.0, miet_similarity / 100.0, miei]
        if cfg.gcn_edge_feature == "vector":
            edges = [jnp.broadcast_to(e[..., None], (*e.shape, cfg.gcn_embed_dim)) for e in edges]
        for i in range(cfg.num_gcn_layers):
            vertexes, edges = GCNLayer(cfg, name=f"gcn_{i}")(vertexes, edges)
        mention, entity = vertexes[0], vertexes[2]
        mention = jnp.broadcast_to(mention[:, None, :], entity.shape)
        # slice away padded fake candidates (pad_candidates_to): downstream
        # loss/metrics always see the reference's [B, C] score contract
        return cosine_similarity(mention, entity)[:, : cfg.num_candidates_model]
