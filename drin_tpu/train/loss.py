# -*- coding: utf-8 -*-
"""Losses — vectorized forms of the reference's (``common/utils.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _strip_answer_column(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """The model scores C = num_candidates_data + 1 candidates (the appended
    gold answer, args.py:101); losses/metrics drop that extra column when
    present (utils.py:36-37, :61-62)."""
    if y_pred.shape[1] != y_true.shape[1]:
        y_pred = y_pred[:, :-1]
    return y_pred


def triplet_loss(y_true: jax.Array, y_pred: jax.Array, margin: float,
                 valid: jax.Array | None = None) -> jax.Array:
    """Margin ranking loss with in-batch negatives, exactly as the reference
    computes it (utils.py:26-43) but without the Python loop over batch rows:

    for every sample i, hinge(positive_i - score + margin) is averaged over
    the WHOLE batch's negated candidate matrix (all samples' candidates act
    as negatives), then averaged over i.

    y_true: one-hot [B, Cd] (all-zero row = answer absent -> positive_i = 0).
    y_pred: similarity scores [B, Cd] or [B, Cd + 1].
    valid:  optional [B] 0/1 mask for padded rows (static-shape ragged
            batches); padded rows contribute neither positives nor negatives,
            reproducing the reference's true ragged-batch loss.
    """
    y_pred = _strip_answer_column(y_true, y_pred)
    neg = -y_pred  # reference negates scores (utils.py:38)
    positive = jnp.sum(neg * y_true, axis=-1)  # [B]
    # [B_i, B_j, Cd]: hinge of sample i's positive against every score
    hinge = jnp.maximum(positive[:, None, None] - neg[None, :, :] + margin, 0.0)
    if valid is None:
        return jnp.mean(jnp.mean(hinge, axis=(1, 2)))
    w = valid[:, None, None] * valid[None, :, None]  # [B, B, 1]
    Cd = y_pred.shape[1]
    per_i = jnp.sum(hinge * w, axis=(1, 2)) / jnp.maximum(jnp.sum(valid) * Cd, 1.0)
    return jnp.sum(per_i) / jnp.maximum(jnp.sum(valid), 1.0)


def binary_loss(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """BCE over cosine scores mapped [1,-1] -> [0,1] (utils.py:15-23; dead
    code in the reference but kept for surface parity)."""
    y_pred = _strip_answer_column(y_true, y_pred)
    p = (1.0 - y_pred) * 0.5
    p = jnp.clip(p, 1e-12, None)
    q = jnp.clip(1.0 - p, 1e-12, None)
    loss = y_true * jnp.log(p) + (1.0 - y_true) * jnp.log(q)
    return -jnp.sum(loss) / y_true.shape[0]
