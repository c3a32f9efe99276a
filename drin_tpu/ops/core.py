# -*- coding: utf-8 -*-
"""Core vectorized ops.

Every per-sample Python loop in the reference's hot path has a closed-form
batched equivalent here (the whole point of the TPU rebuild — the reference
shapes are static, SURVEY §3.2):

  * ``span_mean``       <- Avg.avg loop over batch rows (ghmfc.py:54-60)
  * ``token_span_mean`` <- per-candidate entity pooling loops (ghmfc.py:245-249)
  * ``object_pair_similarity`` <- EdgeEncoder 3x1 object double loop
    (drin/model.py:84-92)
  * ``cosine_similarity``      <- torch.nn.CosineSimilarity semantics
  * ``topk_mask``              <- threshold-vs-kth-largest mask (utils.py:63-65)

All functions are jit/vmap/grad-safe (static shapes, no data-dependent
control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# These ops are small reductions on the hot path of *parity-sensitive*
# numerics (span means, edge weights).  Full f32 accumulation costs nothing
# here and avoids XLA's relaxed default matmul precision (bf16-style passes
# on both TPU MXU and oneDNN CPU).
_HI = jax.lax.Precision.HIGHEST


def cosine_similarity(x: jax.Array, y: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    """Cosine similarity with torch.nn.CosineSimilarity numerics:
    ``dot(x, y) / max(||x||*||y||, eps)``."""
    dot = jnp.sum(x * y, axis=axis)
    nx = jnp.linalg.norm(x, axis=axis)
    ny = jnp.linalg.norm(y, axis=axis)
    return dot / jnp.maximum(nx * ny, eps)


def span_mean(seq: jax.Array, begin: jax.Array, end: jax.Array) -> jax.Array:
    """Mean of ``seq[i, begin[i]:end[i]]`` for every batch row, vectorized.

    seq: [B, L, D]; begin/end: [B] int.  Empty spans (begin >= end) AND
    spans past the window return 0 instead of NaN.  Real stores contain
    both (documented reference bug: prepare.py computes positions against
    the full tokenization while bert.py:79 truncates stored features to L,
    so a late mention's span lands outside the window — torch's empty-slice
    mean NaNs there; the masked form keeps the row finite)."""
    L = seq.shape[-2]
    pos = jnp.arange(L)
    mask = (pos[None, :] >= begin[:, None]) & (pos[None, :] < end[:, None])  # [B, L]
    maskf = mask.astype(seq.dtype)
    count = jnp.maximum(jnp.sum(maskf, axis=-1, keepdims=True), 1.0)
    return jnp.einsum("bl,bld->bd", maskf, seq, precision=_HI) / count


def token_span_mean(features: jax.Array, num_tokens: jax.Array, lo: int = 1, hi_offset: int = 1) -> jax.Array:
    """Mean over token positions ``lo : num_tokens - hi_offset`` along axis -2.

    Vectorizes the reference's per-(sample x candidate) entity pooling loop
    (ghmfc.py:245-249): features [..., Le, D], num_tokens broadcastable to
    features.shape[:-2]."""
    Le = features.shape[-2]
    pos = jnp.arange(Le)
    shape = (1,) * (features.ndim - 2) + (Le,)
    pos = pos.reshape(shape)
    hi = (num_tokens - hi_offset)[..., None]
    mask = ((pos >= lo) & (pos < hi)).astype(features.dtype)  # [..., Le]
    count = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1.0)
    return jnp.einsum("...l,...ld->...d", mask, features, precision=_HI) / count


def token_span_max(features: jax.Array, num_tokens: jax.Array, lo: int = 1,
                   hi_offset: int = 1) -> jax.Array:
    """Max over token positions ``lo : num_tokens - hi_offset`` along axis -2
    (the max-pooling twin of :func:`token_span_mean`, reference
    ghmfc.py:230-235, :245-249).

    Empty spans pool to 0 — the reference would crash on them (torch .max of
    an empty tensor); they only arise from zero-padded fake candidates
    (mesh.pad_candidates_to), whose contributions the models mask out."""
    Le = features.shape[-2]
    pos = jnp.arange(Le)
    shape = (1,) * (features.ndim - 2) + (Le,)
    pos = pos.reshape(shape)
    hi = (num_tokens - hi_offset)[..., None]
    mask = ((pos >= lo) & (pos < hi))[..., None]  # [..., Le, 1]
    neg = jnp.finfo(features.dtype).min
    out = jnp.max(jnp.where(mask, features, neg), axis=-2)
    empty = ~jnp.any(mask, axis=-2)
    return jnp.where(empty, 0.0, out)


def object_pair_similarity(
    mention_obj: jax.Array,  # [B, Tm, D]
    mention_score: jax.Array,  # [B, Tm]
    entity_obj: jax.Array,  # [B, C, Te, D]
    entity_score: jax.Array,  # [B, C, Te]
    eps: float = 1e-9,
) -> jax.Array:
    """Score-weighted average of pairwise object cosine similarities.

    Closed form of the reference's Tm x Te Python double loop
    (drin/model.py:84-92): for each (mention object i, entity object j) pair,
    weight cos(m_i, e_j) by mention_score_i * entity_score_j, then divide by
    the summed weights (+eps).  Output: [B, C]."""
    # normalize with torch-CosineSimilarity clamping semantics on the product
    mdot = jnp.einsum("bid,bcjd->bcij", mention_obj, entity_obj, precision=_HI)  # [B,C,Tm,Te]
    mn = jnp.linalg.norm(mention_obj, axis=-1)  # [B, Tm]
    en = jnp.linalg.norm(entity_obj, axis=-1)  # [B, C, Te]
    denom = jnp.maximum(mn[:, None, :, None] * en[:, :, None, :], 1e-8)
    sim = mdot / denom  # [B, C, Tm, Te]
    w = mention_score[:, None, :, None] * entity_score[:, :, None, :]  # [B, C, Tm, Te]
    num = jnp.sum(sim * w, axis=(-1, -2))
    den = jnp.sum(w, axis=(-1, -2))
    return num / (den + eps)


def unzip_entities(zipped: jax.Array, sep_idx: jax.Array, num_candidates: int,
                   pooling: str = "avg") -> jax.Array:
    """Split zipped-sentence BERT features back into per-candidate vectors.

    Closed form of the reference's B x S x E triple Python loop
    (ghmfc.py:263-277): candidate k of sentence j spans token positions
    ``[prev_sep + 1, sep_jk)`` (position 0 is CLS; spans start at 1).

    zipped [B, S, L, D], sep_idx [B, S, E] -> [B, num_candidates, D].
    Zero-width spans (padding seps) pool to 0 instead of NaN."""
    B, S, L, D = zipped.shape
    sep_idx = jnp.asarray(sep_idx, jnp.int32)
    E = sep_idx.shape[-1]
    pos = jnp.arange(L).reshape(1, 1, 1, L)
    lo = jnp.concatenate([jnp.ones((B, S, 1), jnp.int32), sep_idx[..., :-1] + 1], axis=-1)
    mask = (pos >= lo[..., None]) & (pos < sep_idx[..., None])  # [B, S, E, L]
    if pooling == "avg":
        m = mask.astype(zipped.dtype)
        count = jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)
        pooled = jnp.einsum("bsel,bsld->bsed", m, zipped, precision=_HI) / count
    else:  # max; zero-width spans pool to 0 (see docstring)
        neg = jnp.finfo(zipped.dtype).min
        pooled = jnp.max(jnp.where(mask[..., None], zipped[:, :, None], neg), axis=-2)
        pooled = jnp.where(~jnp.any(mask, axis=-1)[..., None], 0.0, pooled)
    return pooled.reshape(B, S * E, D)[:, :num_candidates]


def topk_mask(scores: jax.Array, k: int) -> jax.Array:
    """Boolean mask of entries >= the k-th largest per row (ties included),
    matching the reference metric's threshold construction (utils.py:63-65)."""
    kth = jax.lax.top_k(scores, k)[0][..., -1:]
    return scores >= kth
