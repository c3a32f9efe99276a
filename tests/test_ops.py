# -*- coding: utf-8 -*-
"""Vectorized ops vs straightforward per-sample numpy references.

Each numpy oracle below re-states the reference's loop semantics
(ghmfc.py:54-60 span average; model.py:84-92 object pairs; utils.py:63-65
top-k mask) independently, so these tests pin the vectorization, not the
loops' code."""

import numpy as np
import jax.numpy as jnp

from drin_tpu.ops.core import (
    cosine_similarity,
    object_pair_similarity,
    span_mean,
    token_span_mean,
    topk_mask,
)


def test_cosine_similarity_matches_definition(rng):
    x = rng.standard_normal((4, 7)).astype(np.float32)
    y = rng.standard_normal((4, 7)).astype(np.float32)
    got = np.asarray(cosine_similarity(jnp.asarray(x), jnp.asarray(y)))
    want = (x * y).sum(-1) / np.maximum(
        np.linalg.norm(x, axis=-1) * np.linalg.norm(y, axis=-1), 1e-8
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cosine_similarity_zero_vector_is_finite():
    x = jnp.zeros((2, 4))
    y = jnp.ones((2, 4))
    out = np.asarray(cosine_similarity(x, y))
    assert np.all(np.isfinite(out)) and np.all(out == 0)


def test_span_mean(rng):
    B, L, D = 5, 11, 3
    seq = rng.standard_normal((B, L, D)).astype(np.float32)
    begin = np.array([0, 1, 3, 5, 2])
    end = np.array([2, 4, 4, 11, 3])
    got = np.asarray(span_mean(jnp.asarray(seq), jnp.asarray(begin), jnp.asarray(end)))
    for i in range(B):
        np.testing.assert_allclose(got[i], seq[i, begin[i] : end[i]].mean(0), rtol=2e-5, atol=1e-6)


def test_token_span_mean_matches_per_candidate_loop(rng):
    # entity pooling over tokens 1 .. n-1 per candidate (ghmfc.py:245-249)
    B, C, Le, D = 2, 3, 9, 4
    feat = rng.standard_normal((B, C, Le, D)).astype(np.float32)
    n = rng.integers(3, Le, size=(B, C))
    got = np.asarray(token_span_mean(jnp.asarray(feat), jnp.asarray(n)))
    for i in range(B):
        for j in range(C):
            np.testing.assert_allclose(
                got[i, j], feat[i, j, 1 : n[i, j] - 1].mean(0), rtol=2e-5, atol=1e-6
            )


def test_object_pair_similarity_matches_double_loop(rng):
    # weighted pairwise cosine, numpy double loop oracle (model.py:84-92)
    B, C, Tm, Te, D = 3, 4, 3, 1, 6
    mo = rng.standard_normal((B, Tm, D)).astype(np.float32)
    ms = rng.uniform(0, 1, (B, Tm)).astype(np.float32)
    eo = rng.standard_normal((B, C, Te, D)).astype(np.float32)
    es = rng.uniform(0, 1, (B, C, Te)).astype(np.float32)
    got = np.asarray(object_pair_similarity(jnp.asarray(mo), jnp.asarray(ms), jnp.asarray(eo), jnp.asarray(es)))
    sim = np.zeros((B, C), np.float32)
    tot = np.zeros((B, C), np.float32)
    for i in range(Tm):
        for j in range(Te):
            a, b = mo[:, None, i], eo[:, :, j]
            cs = (a * b).sum(-1) / np.maximum(
                np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-8
            )
            w = ms[:, None, i] * es[:, :, j]
            sim += cs * w
            tot += w
    np.testing.assert_allclose(got, sim / (tot + 1e-9), rtol=1e-5, atol=1e-6)


def test_object_pair_similarity_zero_scores_finite():
    # padded objects have score 0 (resnet.py:117-118): denominator guard
    B, C, Tm, Te, D = 2, 3, 3, 1, 4
    out = np.asarray(
        object_pair_similarity(
            jnp.ones((B, Tm, D)), jnp.zeros((B, Tm)), jnp.ones((B, C, Te, D)), jnp.zeros((B, C, Te))
        )
    )
    assert np.all(np.isfinite(out))


def test_topk_mask_threshold_semantics(rng):
    scores = np.array([[0.9, 0.5, 0.5, 0.1], [0.2, 0.3, 0.4, 0.5]], np.float32)
    m = np.asarray(topk_mask(jnp.asarray(scores), 2))
    # ties at the k-th value are ALL included (utils.py:63-65)
    np.testing.assert_array_equal(m, [[True, True, True, False], [False, False, True, True]])


def test_update_rank_equals_mask(rng):
    """metrics.update's sort-free rank formulation must equal the reference's
    sort-based mask math (utils.py:60-66) on every corner: ties at the k-th
    value, the stripped answer column, all-zero one-hot rows, valid masks."""
    from drin_tpu.train import metrics as M

    B, C = 16, 7
    for trial in range(6):
        r = np.random.default_rng(trial)
        scores = r.standard_normal((B, C + 1)).astype(np.float32)
        if trial % 2:  # force score ties incl. at the gold position
            scores = np.round(scores * 2) / 2
        gold = r.integers(0, C + 1, B)  # C means "answer absent" -> zero row
        y_true = np.zeros((B, C), np.float32)
        y_true[gold < C, gold[gold < C]] = 1.0
        valid = (r.uniform(size=B) > 0.2).astype(np.float32)
        topk = (1, 3, 5)
        got = M.update(M.init_state(topk), jnp.asarray(scores), jnp.asarray(y_true),
                       topk, jnp.asarray(valid))
        # oracle: the reference's mask math, answer column stripped
        yp = scores[:, :-1]
        for k in topk:
            kth = np.sort(yp, axis=-1)[:, -k]
            mask = yp >= kth[:, None]
            want = float(np.sum(y_true * mask * valid[:, None]))
            assert float(got[f"correct_{k}"]) == want, (trial, k)
        assert float(got["total"]) == float(valid.sum())


def test_update_nan_rows_count_as_miss():
    """A NaN anywhere in a score row must count as a MISS for every k: the
    plain rank comparison would see s_gold = NaN (NaN*0), every `>` compare
    False, and silently report the row as a hit for all k — a NaN-poisoned
    run would show ~100% accuracy instead of collapsing.  torch.topk sorts
    NaN first (NaN candidates outrank gold), so miss is also the
    reference's direction."""
    from drin_tpu.train import metrics as M

    scores = np.array([[0.9, 0.1, np.nan, 0.5],     # NaN candidate
                       [np.nan, np.nan, np.nan, np.nan],  # fully poisoned
                       [0.9, 0.8, 0.2, 0.1]],        # healthy: gold ranks 2nd
                      np.float32)
    y_true = np.zeros((3, 4), np.float32)
    y_true[0, 1] = y_true[1, 0] = y_true[2, 1] = 1.0
    topk = (1, 2, 4)
    got = M.update(M.init_state(topk), jnp.asarray(scores), jnp.asarray(y_true), topk)
    assert float(got["correct_1"]) == 0.0
    assert float(got["correct_2"]) == 1.0   # only the healthy row
    assert float(got["correct_4"]) == 1.0
    assert float(got["total"]) == 3.0


def test_span_ops_empty_and_out_of_window_spans():
    """Real stores contain spans the fixtures' generators avoid: EMPTY
    (mention tokenizes to zero tokens) and OUT-OF-WINDOW (reference
    prepare.py computes positions against the 512-token tokenization while
    bert.py:79 truncates stored features to L=128, so start/end can land
    past the window).  The reference NaNs on them (mean of an empty torch
    slice) — a documented bug; our masked forms must return finite zeros
    so one bad row cannot poison a batch."""
    from drin_tpu.ops.core import span_mean

    rng = np.random.default_rng(8)
    B, L, D = 4, 6, 3
    seq = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    begin = jnp.asarray([2, 3, L + 5, 0])   # row1 empty, row2 out-of-window
    end = jnp.asarray([4, 3, L + 7, L])     # row3 full-window
    out = np.asarray(span_mean(seq, begin, end))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0], np.asarray(seq)[0, 2:4].mean(0), rtol=1e-6)
    np.testing.assert_array_equal(out[1], 0.0)  # empty span
    np.testing.assert_array_equal(out[2], 0.0)  # past the window
    np.testing.assert_allclose(out[3], np.asarray(seq)[3].mean(0), rtol=1e-6)
